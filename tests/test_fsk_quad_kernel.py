"""Tests for the fused mid-separation FSK matched-filter kernel
(fsk_quad_margin_batch) and its batched orchestration
(fsk_quad_bits_rows_batch): analytic FIR + per-bit tone quadrature
correlation + noncoherent energy margin in one Pallas kernel, bit decision in
XLA on the per-bit margin stream. FSK19200 (8000/16000 Hz @ 19200 Bd, the
mid-separation config: 0.417 cycles/bit) throughout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN, crc32, pack_frame, parse_frames
from audio_modem_radio_tpu.modem import SAMPLE_RATE
from audio_modem_radio_tpu.ops.fsk import (
    _fir_frontend_plan,
    _fsk_disc_kernel_plan,
    _samples_per_bit,
    _separation_cycles,
    fsk_demod_bits,
    fsk_modulate,
    fsk_quad_bits_rows_batch,
    fsk_quad_row_shape,
)
from audio_modem_radio_tpu.parallel.batch import _overlap_rows

BAUD, MARK, SPACE = 19200.0, 8000.0, 16000.0


def _capture(n, seed=0, payload_len=600):
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, payload_len, dtype=np.uint8).tobytes()
    framed = pack_frame("q.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(fsk_modulate(framed, BAUD, MARK, SPACE, SAMPLE_RATE), np.float32)
    sig = np.zeros(n, np.float32)
    sig[: min(n, len(wave))] = wave[:n]
    return sig, payload


def _quad_rows(batch, dtype=np.float32):
    r, rowl, ov, lead = fsk_quad_row_shape(batch.shape[1], BAUD, MARK, SPACE, SAMPLE_RATE)
    return _overlap_rows(batch, r, rowl, ov, lead=lead, dtype=dtype)


def test_quad_plan_fsk19200():
    sep = _separation_cycles(BAUD, MARK, SPACE, SAMPLE_RATE)
    assert 0.4 <= sep < 0.8
    spb = _samples_per_bit(SAMPLE_RATE, BAUD)
    _lo, _hi, dec, taps = _fir_frontend_plan(BAUD, MARK, SPACE, SAMPLE_RATE)
    assert dec == 1
    plan = _fsk_disc_kernel_plan(spb, dec, taps)
    assert plan is not None
    assert plan["spr2"] % 128 == 0  # quad kernel lane-slice requirement
    assert plan["row2"] % 128 == 0 and plan["row2"] % spb == 0
    shape = fsk_quad_row_shape(1 << 17, BAUD, MARK, SPACE, SAMPLE_RATE)
    assert shape is not None and shape[1] == 128 and shape[1] + shape[2] == plan["c_pad"]


@pytest.mark.parametrize("dtype", [np.float32, np.int16])
def test_quad_kernel_matches_fallback(dtype):
    """Kernel (interpret) bits == the XLA fallback bits over the signal span
    (capture-tail pad bits may differ: the kernel's clamped final lookahead
    block and the fallback's zero pad see different garbage)."""
    n = 1 << 17
    sig0, _ = _capture(n, seed=1)
    sig1, _ = _capture(n, seed=2, payload_len=500)
    batch = np.stack([sig0, np.roll(sig1, 3)])  # different timing offsets
    rows = _quad_rows(batch, dtype=dtype)
    bits_k = np.asarray(
        fsk_quad_bits_rows_batch(jnp.asarray(rows), BAUD, MARK, SPACE, SAMPLE_RATE, kernel=True)
    )
    bits_x = np.asarray(
        fsk_quad_bits_rows_batch(jnp.asarray(rows), BAUD, MARK, SPACE, SAMPLE_RATE, kernel=False)
    )
    assert bits_k.shape == bits_x.shape
    spb = _samples_per_bit(SAMPLE_RATE, BAUD)
    n_sig = n // spb - 2
    assert np.array_equal(bits_k[:, :n_sig], bits_x[:, :n_sig])


def test_quad_path_matches_legacy_bits():
    """New-layout bits == fsk_demod_bits (matmul frontend, no MLSE) over the
    signal span — same FIR front end and quadrature detector; the row
    blocking and template time origin differ, so compare decisions."""
    n = 1 << 17
    sig, _ = _capture(n, seed=3)
    rows = _quad_rows(sig[None, :])
    bits_new = np.asarray(
        fsk_quad_bits_rows_batch(jnp.asarray(rows), BAUD, MARK, SPACE, SAMPLE_RATE, kernel=False)
    )[0]
    bits_old = np.asarray(
        fsk_demod_bits(jnp.asarray(sig), BAUD, MARK, SPACE, SAMPLE_RATE, mlse=False)[0]
    )
    spb = _samples_per_bit(SAMPLE_RATE, BAUD)
    n_sig = n // spb - 2
    mism = np.mean(bits_new[:n_sig] != bits_old[:n_sig])
    assert mism < 1e-3  # clean capture: decisions agree except at pad edges


@pytest.mark.parametrize("dtype", [np.float32, np.int16])
def test_quad_kernel_e2e_frame(dtype):
    from audio_modem_radio_tpu.ops.common import find_bit_pattern, pack_bits_from

    n = 1 << 17
    sig, payload = _capture(n, seed=5)
    rows = _quad_rows(np.stack([sig, sig]), dtype=dtype)
    bits = fsk_quad_bits_rows_batch(
        jnp.asarray(rows), BAUD, MARK, SPACE, SAMPLE_RATE, kernel=True
    )

    def sync_pack(bb):
        start, found = find_bit_pattern(bb, MAGIC_BIT_PATTERN)
        packed, n_valid = pack_bits_from(bb, start)
        return packed, n_valid, found

    packed, n_valid, found = jax.vmap(sync_pack)(bits)
    assert bool(np.asarray(found).all())
    for i in range(2):
        raw = np.asarray(packed[i])[: int(n_valid[i])].tobytes()
        frames = parse_frames(raw)
        assert frames and frames[0].data == payload


def test_quad_noisy_parity_with_legacy():
    """At 15 dB the new path's decisions track the legacy path's on the same
    noisy capture (identical detector; blocking/time-origin differences only
    flip noise-marginal bits)."""
    n = 1 << 17
    sig, _ = _capture(n, seed=7, payload_len=2000)
    rng = np.random.default_rng(99)
    snr = 10 ** (15 / 10)
    noise = rng.normal(0, np.sqrt(np.mean(sig**2) / snr), n).astype(np.float32)
    noisy = sig + noise
    rows = _quad_rows(noisy[None, :])
    bits_new = np.asarray(
        fsk_quad_bits_rows_batch(jnp.asarray(rows), BAUD, MARK, SPACE, SAMPLE_RATE, kernel=False)
    )[0]
    bits_old = np.asarray(
        fsk_demod_bits(jnp.asarray(noisy), BAUD, MARK, SPACE, SAMPLE_RATE, mlse=False)[0]
    )
    spb = _samples_per_bit(SAMPLE_RATE, BAUD)
    n_sig = n // spb - 2
    mism = np.mean(bits_new[:n_sig] != bits_old[:n_sig])
    assert mism < 5e-3


def test_quad_batch_surface_decodes():
    """decode_sample_batch FSK19200 still decodes (CPU: legacy flat/fir rows,
    the fused layout only engages on the TPU backend)."""
    from audio_modem_radio_tpu.parallel.batch import decode_sample_batch

    n = 1 << 16
    sig, payload = _capture(n, seed=11, payload_len=300)
    batch = np.stack([sig, sig])
    raws = decode_sample_batch(batch, "FSK19200", 19200)
    for raw in raws:
        frames = parse_frames(raw)
        assert frames and frames[0].data == payload
