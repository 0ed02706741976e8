"""Tests for the fused projection+derotate+decide Pallas kernel and its
batched orchestration (psk_decision_streams_batch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_modem_radio_tpu.framing import crc32, pack_frame, parse_frames
from audio_modem_radio_tpu.modem import modulate


def _make_batch(mode, rate, n_captures=2, seed=0):
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, 1024, dtype=np.uint8).tobytes()
    framed = pack_frame("k.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(modulate(mode, framed, rate), np.float32)
    n = 1 << int(np.ceil(np.log2(len(wave))))
    batch = np.zeros((n_captures, n), np.float32)
    batch[:, : len(wave)] = wave
    return batch, payload


@pytest.mark.parametrize("n_psk", [2, 4])
def test_decide_kernel_interpret_matches_xla(n_psk, rng):
    """psk_project_decide_batch (interpreter mode) == XLA decide path."""
    from audio_modem_radio_tpu.ops.psk import (
        _BLOCK_SYM,
        _batch_pass1,
        _blocked_templates,
        _decide_streams,
        _samples_per_symbol,
        derotate,
    )
    from audio_modem_radio_tpu.ops.pallas_kernels import psk_project_decide_batch

    baud, carrier, sr = 9600.0, 3000.0, 96000
    spsym = _samples_per_symbol(sr, baud)
    mode = "QPSK" if n_psk == 4 else "BPSK"
    batch, _ = _make_batch(mode, int(baud), n_captures=2, seed=n_psk)
    b, n = batch.shape
    n_frames = n // spsym
    samples = jnp.asarray(batch)
    x3d, r, best, theta = _batch_pass1(
        samples, None, b, n_frames, spsym, carrier, sr, 8, 0
    )
    W8 = jnp.asarray(_blocked_templates(spsym, carrier, sr, 8))
    rot = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)

    hi_k, lo_k = psk_project_decide_batch(
        x3d, W8, best, rot, rows_per_capture=r, n_psk=n_psk, block_rows=256,
        interpret=True,
    )
    hi_k = np.asarray(hi_k.reshape(b, -1))
    lo_k = np.asarray(lo_k.reshape(b, -1))

    # XLA reference: einsum projection + differential + derotate + decide.
    row = _BLOCK_SYM * spsym
    ov = W8.shape[1] - row
    x_next = jnp.concatenate([x3d[:, 1:, :ov], jnp.zeros((b, 1, ov), jnp.float32)], axis=1)
    xov = jnp.concatenate([x3d, x_next], axis=2)
    out = jnp.einsum("brc,bck->brk", xov, W8[best])
    re_f = out[:, :, :_BLOCK_SYM].reshape(b, -1)
    im_f = out[:, :, _BLOCK_SYM:].reshape(b, -1)
    d_re = re_f[:, 1:] * re_f[:, :-1] + im_f[:, 1:] * im_f[:, :-1]
    d_im = im_f[:, 1:] * re_f[:, :-1] - re_f[:, 1:] * im_f[:, :-1]
    d_re, d_im = derotate(d_re, d_im, theta)
    hi_x, lo_x = jax.vmap(lambda a, c: _decide_streams(a, c, n_psk))(d_re, d_im)
    hi_x, lo_x = np.asarray(hi_x), np.asarray(lo_x)

    # Compare the signal region (the capture tail is pad garbage in both,
    # and the XLA stream is one diff shorter by construction). Decisions at
    # near-zero differentials (pad boundary) may tie-break differently;
    # restrict to the modulated span.
    n_sym_sig = n // spsym - 2
    assert np.array_equal(hi_k[:, :n_sym_sig], hi_x[:, :n_sym_sig])
    assert np.array_equal(lo_k[:, :n_sym_sig], lo_x[:, :n_sym_sig])


def test_decide_kernel_psk8_sectors_match_xla(rng):
    """The n_psk=8 decide-kernel branch (round 5) == XLA projection +
    derotate + psk8_sector_stream, on the modulated span, for identical
    (best, rot) inputs — the fused front half of the D8PSK batch path."""
    from audio_modem_radio_tpu.ops.psk import (
        _BLOCK_SYM,
        _batch_pass1,
        _blocked_templates,
        _samples_per_symbol,
        derotate,
        psk8_sector_stream,
    )
    from audio_modem_radio_tpu.ops.pallas_kernels import psk_project_decide_batch

    baud, carrier, sr = 9600.0, 12000.0, 96000
    spsym = _samples_per_symbol(sr, baud)
    batch, _ = _make_batch("8PSK", int(baud), n_captures=2, seed=8)
    batch[1] = np.roll(batch[1], 5)  # distinct winning offsets per capture
    b, n = batch.shape
    samples = jnp.asarray(batch)
    x3d, r, best, theta = _batch_pass1(
        samples, None, b, n // spsym, spsym, carrier, sr, 8, 0, n_psk=8
    )
    W8 = jnp.asarray(_blocked_templates(spsym, carrier, sr, 8))
    rot = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)

    sec_k = np.asarray(
        psk_project_decide_batch(
            x3d, W8, best, rot, rows_per_capture=r, n_psk=8, block_rows=256,
            interpret=True,
        ).reshape(b, -1)
    )

    row = _BLOCK_SYM * spsym
    ov = W8.shape[1] - row
    x_next = jnp.concatenate([x3d[:, 1:, :ov], jnp.zeros((b, 1, ov), jnp.float32)], axis=1)
    xov = jnp.concatenate([x3d, x_next], axis=2)
    out = jnp.einsum("brc,bck->brk", xov, W8[best])
    re_f = out[:, :, :_BLOCK_SYM].reshape(b, -1)
    im_f = out[:, :, _BLOCK_SYM:].reshape(b, -1)
    d_re = re_f[:, 1:] * re_f[:, :-1] + im_f[:, 1:] * im_f[:, :-1]
    d_im = im_f[:, 1:] * re_f[:, :-1] - re_f[:, 1:] * im_f[:, :-1]
    d_re, d_im = derotate(d_re, d_im, theta)
    sec_x = np.asarray(psk8_sector_stream(d_re, d_im))

    n_sym_sig = n // spsym - 2
    assert np.array_equal(sec_k[:, :n_sym_sig], sec_x[:, :n_sym_sig])


def test_psk8_sector_rows_batch_cpu_fallback_decodes(rng):
    """psk8_sector_rows_batch's staged fallback feeds the sync tail to a
    bit-exact decode (the CPU production path is unchanged by round 5)."""
    from audio_modem_radio_tpu.ops.psk import (
        psk8_sector_rows_batch,
        psk8_sync_and_pack_rotations,
    )
    from audio_modem_radio_tpu.framing import (
        MAGIC_BIT_PATTERN,
        MAGIC_BIT_PATTERN2,
    )

    batch, payload = _make_batch("8PSK", 9600, n_captures=2, seed=3)
    sec = psk8_sector_rows_batch(jnp.asarray(batch), 9600.0, 12000.0, 96000)
    for i in range(2):
        packed, n_valid, found = psk8_sync_and_pack_rotations(
            sec[i], MAGIC_BIT_PATTERN, MAGIC_BIT_PATTERN2
        )
        assert bool(found)
        raw = np.asarray(packed)[: int(n_valid) // 8].tobytes()
        frames = parse_frames(raw)
        assert frames and frames[0].data == payload


@pytest.mark.parametrize("n_psk", [2, 4])
def test_decide_kernel_succ_variant_bitwise_equal(n_psk):
    """The successor-column body == the roll body, bitwise (same template
    rows, same dot accumulation — see _blocked_templates_succ)."""
    from audio_modem_radio_tpu.ops.psk import (
        _batch_pass1,
        _blocked_templates,
        _blocked_templates_succ,
        _samples_per_symbol,
    )
    from audio_modem_radio_tpu.ops.pallas_kernels import psk_project_decide_batch

    baud, carrier, sr = 9600.0, 3000.0, 96000
    spsym = _samples_per_symbol(sr, baud)
    mode = "QPSK" if n_psk == 4 else "BPSK"
    batch, _ = _make_batch(mode, int(baud), n_captures=2, seed=11 + n_psk)
    # Shift one capture so the winning timing offsets differ across captures.
    batch[1] = np.roll(batch[1], 7)
    b, n = batch.shape
    samples = jnp.asarray(batch)
    x3d, r, best, theta = _batch_pass1(
        samples, None, b, n // spsym, spsym, carrier, sr, 8, 0
    )
    rot = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)
    W = jnp.asarray(_blocked_templates(spsym, carrier, sr, 8))
    Ws = jnp.asarray(_blocked_templates_succ(spsym, carrier, sr, 8))
    assert np.array_equal(np.asarray(Ws[:, :, :256]), np.asarray(W))

    hi_r, lo_r = psk_project_decide_batch(
        x3d, W, best, rot, rows_per_capture=r, n_psk=n_psk, interpret=True
    )
    hi_s, lo_s = psk_project_decide_batch(
        x3d, Ws, best, rot, rows_per_capture=r, n_psk=n_psk, interpret=True,
        variant="succ",
    )
    assert np.array_equal(np.asarray(hi_r), np.asarray(hi_s))
    if n_psk == 4:
        assert np.array_equal(np.asarray(lo_r), np.asarray(lo_s))
    else:
        # DBPSK's imaginary differential is ~0 at every symbol (the data
        # lives on the real axis), so ``lo`` is the sign of rounding noise;
        # the succ variant's two-dot split associates the row-straddling
        # lanes' accumulation differently (1 ulp), legitimately flipping
        # those meaningless signs. Assert the mismatches are confined to
        # near-zero d_im positions of the roll variant's own float stream.
        from audio_modem_radio_tpu.ops.pallas_kernels import psk_project_diff_batch
        from audio_modem_radio_tpu.ops.psk import derotate

        d_re, d_im = psk_project_diff_batch(x3d, W, best, rows_per_capture=r, interpret=True)
        d_re, d_im = derotate(
            d_re.reshape(len(batch), -1), d_im.reshape(len(batch), -1), theta
        )
        d_re, d_im = np.asarray(d_re), np.asarray(d_im)
        mism = (np.asarray(lo_r) != np.asarray(lo_s)).reshape(len(batch), -1)
        tiny = np.abs(d_im) <= 1e-4 * np.median(np.abs(d_re[d_re != 0]))
        assert np.all(tiny[mism])


def test_decide_kernel_int16_rows_bitwise_equal():
    """int16 input rows (cast to f32 in VMEM) == the same values as float32
    rows, bitwise: the pipeline is scale-invariant and an int16 cast to f32
    is exact, so only the HBM read width changes."""
    from audio_modem_radio_tpu.ops.psk import (
        _batch_pass1,
        _blocked_templates,
        _samples_per_symbol,
    )
    from audio_modem_radio_tpu.ops.pallas_kernels import psk_project_decide_batch

    baud, carrier, sr = 9600.0, 3000.0, 96000
    spsym = _samples_per_symbol(sr, baud)
    batch, _ = _make_batch("QPSK", 9600, n_captures=2, seed=21)
    q = np.clip(np.round(batch * 32768.0), -32768, 32767).astype(np.int16)
    f = q.astype(np.float32)  # exactly the values the kernel's cast produces

    b, n = batch.shape
    x3f = jnp.asarray(f)
    # pass-1 on the int16 rows (the scoring windows cast internally)
    r0 = -(-(n // spsym) // 128)
    r = max(256, -(-r0 // 256) * 256)
    row = 128 * spsym
    pad = np.zeros((b, r * row), np.float32)
    pad[:, : min(n, r * row)] = f[:, : r * row]
    x3d_f = jnp.asarray(pad.reshape(b, r, row))
    x3d_i = jnp.asarray(
        np.clip(np.round(pad), -32768, 32767).astype(np.int16).reshape(b, r, row)
    )
    _x, r_, best, theta = _batch_pass1(None, x3d_i, b, r * 128, spsym, carrier, sr, 8, r)
    rot = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)
    W = jnp.asarray(_blocked_templates(spsym, carrier, sr, 8))

    hi_f, lo_f = psk_project_decide_batch(
        x3d_f, W, best, rot, rows_per_capture=r, n_psk=4, interpret=True
    )
    hi_i, lo_i = psk_project_decide_batch(
        x3d_i, W, best, rot, rows_per_capture=r, n_psk=4, interpret=True
    )
    assert np.array_equal(np.asarray(hi_f), np.asarray(hi_i))
    assert np.array_equal(np.asarray(lo_f), np.asarray(lo_i))


def test_int8_rows_e2e_decode():
    """decode_sample_batch with the opt-in tpu.int8_rows: host shaping emits
    int8 rows, pass-1 + the decide path cast in place, and the frame still
    round-trips — the ~-50 dB quantization noise is far below the decision
    margins on a clean capture."""
    from audio_modem_radio_tpu.config import CONFIG
    from audio_modem_radio_tpu.framing import parse_frames
    from audio_modem_radio_tpu.parallel.batch import decode_sample_batch, host_shape_batch

    batch, payload = _make_batch("QPSK", 9600, n_captures=2, seed=34)
    old8 = CONFIG.get("tpu.int8_rows", False)
    CONFIG.set("tpu.int8_rows", True)
    try:
        shaped = host_shape_batch(batch, "QPSK", 9600)
        assert shaped.dtype == np.int8 and shaped.ndim == 3
        raws = decode_sample_batch(batch, "QPSK", 9600)
    finally:
        CONFIG.set("tpu.int8_rows", old8)
    for raw in raws:
        frames = parse_frames(raw)
        assert frames and frames[0].data == payload


def test_decide_kernel_int8_rows_bitwise_equal():
    """int8 input rows == float32 rows holding the same quantized values,
    bitwise, through the decide kernel (interpreter): the int8->i32->f32
    VMEM cast is exact, so only the HBM read width changes."""
    from audio_modem_radio_tpu.ops.psk import (
        _batch_pass1,
        _blocked_templates,
        _samples_per_symbol,
    )
    from audio_modem_radio_tpu.ops.pallas_kernels import psk_project_decide_batch

    baud, carrier, sr = 9600.0, 3000.0, 96000
    spsym = _samples_per_symbol(sr, baud)
    batch, _ = _make_batch("QPSK", 9600, n_captures=2, seed=22)
    q = np.clip(np.round(batch * 128.0), -128, 127).astype(np.int8)
    f = q.astype(np.float32)

    b, n = batch.shape
    r0 = -(-(n // spsym) // 128)
    r = max(256, -(-r0 // 256) * 256)
    row = 128 * spsym
    pad = np.zeros((b, r * row), np.float32)
    pad[:, : min(n, r * row)] = f[:, : r * row]
    x3d_f = jnp.asarray(pad.reshape(b, r, row))
    x3d_i = jnp.asarray(
        np.clip(np.round(pad), -128, 127).astype(np.int8).reshape(b, r, row)
    )
    _x, r_, best, theta = _batch_pass1(None, x3d_i, b, r * 128, spsym, carrier, sr, 8, r)
    rot = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)
    W = jnp.asarray(_blocked_templates(spsym, carrier, sr, 8))

    hi_f, lo_f = psk_project_decide_batch(
        x3d_f, W, best, rot, rows_per_capture=r, n_psk=4, interpret=True
    )
    hi_i, lo_i = psk_project_decide_batch(
        x3d_i, W, best, rot, rows_per_capture=r, n_psk=4, interpret=True
    )
    assert np.array_equal(np.asarray(hi_f), np.asarray(hi_i))
    assert np.array_equal(np.asarray(lo_f), np.asarray(lo_i))


def test_int16_rows_e2e_decode(monkeypatch):
    """decode_sample_batch with tpu.int16_rows forced on (CPU XLA path):
    the int16 rows flow through host shaping, pass-1 and the fallback
    einsum, and the frame round-trips."""
    from audio_modem_radio_tpu.config import CONFIG
    from audio_modem_radio_tpu.framing import parse_frames
    from audio_modem_radio_tpu.parallel.batch import decode_sample_batch, host_shape_batch

    batch, payload = _make_batch("QPSK", 9600, n_captures=2, seed=33)
    old = CONFIG.get("tpu.int16_rows", None)
    CONFIG.set("tpu.int16_rows", True)
    try:
        shaped = host_shape_batch(batch, "QPSK", 9600)
        assert shaped.dtype == np.int16 and shaped.ndim == 3
        raws = decode_sample_batch(batch, "QPSK", 9600)
    finally:
        CONFIG.set("tpu.int16_rows", old)
    for raw in raws:
        frames = parse_frames(raw)
        assert frames and frames[0].data == payload


@pytest.mark.parametrize("cfo", [True, False])
def test_decision_streams_batch_decodes(cfo):
    """decode via psk_decision_streams_batch end to end (XLA path on CPU)."""
    from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN
    from audio_modem_radio_tpu.ops.common import (
        dibit_sync_and_pack,
        dibit_sync_and_pack_rotations,
    )
    from audio_modem_radio_tpu.ops.psk import psk_decision_streams_batch

    batch, payload = _make_batch("QPSK", 9600, n_captures=3, seed=7)
    hi, lo = psk_decision_streams_batch(jnp.asarray(batch), 9600.0, 3000.0, 96000, 4, cfo)
    sync = dibit_sync_and_pack_rotations if cfo else dibit_sync_and_pack
    packed, n_valid, found = jax.vmap(lambda h, l: sync(h, l, MAGIC_BIT_PATTERN))(hi, lo)
    assert bool(np.asarray(found).all())
    for i in range(batch.shape[0]):
        raw = np.asarray(packed[i])[: int(n_valid[i])].tobytes()
        frames = parse_frames(raw)
        assert frames and frames[0].data == payload
