"""Tests for the full-lane-store dual-tone FSK kernel (fsk_tile_bits_batch)
and its batched orchestration (fsk_dual_bits_rows_batch).

The round-2 fused FSK kernel lost to XLA because its (blk, spr=16) uint8
stores serialize in Mosaic; this retry reshapes the margins in VMEM to
(blk*spr/128, 128) full-lane tiles. These tests pin the kernel (interpreter
mode) bitwise to the XLA einsum path, for f32 and int16 rows, and the
end-to-end decode through the batch surface.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_modem_radio_tpu.framing import crc32, pack_frame, parse_frames
from audio_modem_radio_tpu.modem import SAMPLE_RATE
from audio_modem_radio_tpu.ops.fsk import (
    _fsk_geometry,
    _samples_per_bit,
    fsk_dual_bits_rows_batch,
    fsk_dual_rows_batch_plan,
    fsk_modulate,
)
from audio_modem_radio_tpu.parallel.batch import _overlap_rows


BAUD, MARK, SPACE = 1200.0, 1200.0, 2200.0


def _rows_batch(n_captures=2, seed=0, dtype=np.float32, r_target=256):
    rng = np.random.default_rng(seed)
    spb = _samples_per_bit(SAMPLE_RATE, BAUD)
    spr, row, ov = _fsk_geometry(spb)
    payload = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
    framed = pack_frame("f.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(fsk_modulate(framed, BAUD, MARK, SPACE, SAMPLE_RATE), np.float32)
    n = r_target * row
    batch = 0.01 * rng.normal(size=(n_captures, n)).astype(np.float32)
    for i in range(n_captures):
        # different leading offsets so the winning timing offset differs
        off = (i * spb) // 3 + i
        batch[i, off : off + len(wave)] += wave[: n - off]
    shaped = _overlap_rows(batch, r_target, row, ov, dtype=dtype)
    return shaped, payload, spr


@pytest.mark.parametrize("dtype", [np.float32, np.int16])
def test_fsk_tile_kernel_matches_xla(dtype):
    """Kernel (interpret) bits == XLA einsum bits on the same rows, bitwise,
    including int16 rows (the VMEM cast is exact, decisions scale-invariant)."""
    shaped, _payload, spr = _rows_batch(dtype=dtype)
    x = jnp.asarray(shaped)
    bits_k = np.asarray(
        fsk_dual_bits_rows_batch(x, BAUD, MARK, SPACE, SAMPLE_RATE, kernel=True)
    )
    bits_x = np.asarray(
        fsk_dual_bits_rows_batch(x, BAUD, MARK, SPACE, SAMPLE_RATE, kernel=False)
    )
    assert bits_k.shape == bits_x.shape
    assert np.array_equal(bits_k, bits_x)


def test_fsk_tile_kernel_int16_equals_f32_on_quantized():
    """int16 rows == f32 rows holding the same quantized values, bitwise."""
    shaped_i, _p, _spr = _rows_batch(dtype=np.int16, seed=3)
    shaped_f = shaped_i.astype(np.float32)
    bits_i = np.asarray(
        fsk_dual_bits_rows_batch(
            jnp.asarray(shaped_i), BAUD, MARK, SPACE, SAMPLE_RATE, kernel=True
        )
    )
    bits_f = np.asarray(
        fsk_dual_bits_rows_batch(
            jnp.asarray(shaped_f), BAUD, MARK, SPACE, SAMPLE_RATE, kernel=True
        )
    )
    assert np.array_equal(bits_i, bits_f)


@pytest.mark.parametrize("dtype", [np.float32, np.int16])
def test_fsk_tile_kernel_e2e_frame(dtype):
    """Bits from the kernel path parse back to the transmitted frame."""
    from audio_modem_radio_tpu.ops.common import find_bit_pattern, pack_bits_from
    from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN

    shaped, payload, _spr = _rows_batch(dtype=dtype, seed=5)
    bits = fsk_dual_bits_rows_batch(
        jnp.asarray(shaped), BAUD, MARK, SPACE, SAMPLE_RATE, kernel=True
    )

    def sync_pack(bb):
        start, found = find_bit_pattern(bb, MAGIC_BIT_PATTERN)
        packed, n_valid = pack_bits_from(bb, start)
        return packed, n_valid, found

    packed, n_valid, found = jax.vmap(sync_pack)(bits)
    assert bool(np.asarray(found).all())
    for i in range(shaped.shape[0]):
        raw = np.asarray(packed[i])[: int(n_valid[i])].tobytes()
        frames = parse_frames(raw)
        assert frames and frames[0].data == payload


def test_fsk_dual_rows_batch_plan_geometries():
    spb = _samples_per_bit(SAMPLE_RATE, 1200.0)  # spr=16
    assert fsk_dual_rows_batch_plan(spb, 256) == 256
    assert fsk_dual_rows_batch_plan(spb, 512) == 256
    assert fsk_dual_rows_batch_plan(spb, 100) is None  # not a block multiple
    spb_ft8 = _samples_per_bit(SAMPLE_RATE, 50.0)  # spr=1 -> too narrow
    assert fsk_dual_rows_batch_plan(spb_ft8, 256) is None


def test_fsk_dual_rows_batch_plan_rejects_non_dividing_spr():
    """The kernel's lane redistribution is a bijection only when spr divides
    128; MSK@1000 Bd (spb=96 -> spr=12) must stay on the XLA einsum path."""
    spb = _samples_per_bit(SAMPLE_RATE, 1000.0)  # MSK alias geometry
    spr, _row, _ov = _fsk_geometry(spb)
    assert spr == 12 and 128 % spr != 0  # the geometry this guards against
    assert fsk_dual_rows_batch_plan(spb, 256) is None


def test_fsk_tile_kernel_wrapper_rejects_non_dividing_spr():
    from audio_modem_radio_tpu.ops.pallas_kernels import fsk_tile_bits_batch

    x = jnp.zeros((1, 256, 1280), jnp.float32)
    w = jnp.zeros((8, 1280, 48), jnp.float32)
    with pytest.raises(ValueError, match="divide 128"):
        fsk_tile_bits_batch(
            x, w, jnp.zeros((1,), jnp.int32), rows_per_capture=256, spr=12,
            block_rows=256, interpret=True,
        )


def test_fsk_tile_kernel_matches_xla_spr8():
    """Equality at a second dividing geometry (spb=128 -> spr=8, g=16)."""
    baud = SAMPLE_RATE / 128.0  # spb=128 -> unit=1, spr=8
    spb = _samples_per_bit(SAMPLE_RATE, baud)
    spr, row, ov = _fsk_geometry(spb)
    assert spr == 8
    assert fsk_dual_rows_batch_plan(spb, 256) == 256
    rng = np.random.default_rng(11)
    payload = rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
    framed = pack_frame("h.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(fsk_modulate(framed, baud, MARK, SPACE, SAMPLE_RATE), np.float32)
    n = 256 * row
    batch = 0.01 * rng.normal(size=(2, n)).astype(np.float32)
    for i in range(2):
        off = i * 37
        batch[i, off : off + len(wave)] += wave[: n - off]
    shaped = _overlap_rows(batch, 256, row, ov, dtype=np.float32)
    x = jnp.asarray(shaped)
    bits_k = np.asarray(
        fsk_dual_bits_rows_batch(x, baud, MARK, SPACE, SAMPLE_RATE, kernel=True)
    )
    bits_x = np.asarray(
        fsk_dual_bits_rows_batch(x, baud, MARK, SPACE, SAMPLE_RATE, kernel=False)
    )
    assert np.array_equal(bits_k, bits_x)


def test_fsk_batch_surface_still_decodes():
    """decode_sample_batch FSK1200 end to end (CPU: XLA fallback path, rows
    unpadded) — the integration must not regress the plain surface."""
    from audio_modem_radio_tpu.parallel.batch import decode_sample_batch

    rng = np.random.default_rng(9)
    payload = rng.integers(0, 256, 400, dtype=np.uint8).tobytes()
    framed = pack_frame("g.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(fsk_modulate(framed, BAUD, MARK, SPACE, SAMPLE_RATE), np.float32)
    n = 1 << int(np.ceil(np.log2(len(wave))))
    batch = np.zeros((2, n), np.float32)
    batch[:, : len(wave)] = wave
    raws = decode_sample_batch(batch, "FSK1200", 1200)
    for raw in raws:
        frames = parse_frames(raw)
        assert frames and frames[0].data == payload
