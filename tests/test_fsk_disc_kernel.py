"""Tests for the fused FSK discriminator kernel (fsk_disc_sums_batch) and
its batched orchestration (fsk_disc_bits_rows_batch): FIR front end + phasor
product + fractional boxcar in one Pallas kernel, atan2/equalizer/decision in
XLA on the per-bit stream. FSK9600 (1200/2200 Hz @ 9600 Bd, the discriminator
config) throughout."""

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
    fsk_demod_bits,
    fsk_disc_bits_rows_batch,
    fsk_disc_row_shape,
    fsk_modulate,
)
from audio_modem_radio_tpu.parallel.batch import _overlap_rows

BAUD, MARK, SPACE = 9600.0, 1200.0, 2200.0


def _capture(n, seed=0, payload_len=600):
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, payload_len, dtype=np.uint8).tobytes()
    framed = pack_frame("d.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(fsk_modulate(framed, BAUD, MARK, SPACE, SAMPLE_RATE), np.float32)
    sig = np.zeros(n, np.float32)
    sig[: min(n, len(wave))] = wave[:n]
    return sig, payload


def _disc_rows(batch, dtype=np.float32):
    r, rowl, ov, lead = fsk_disc_row_shape(batch.shape[1], BAUD, MARK, SPACE, SAMPLE_RATE)
    return _overlap_rows(batch, r, rowl, ov, lead=lead, dtype=dtype)


def test_disc_plan_fsk9600():
    spb = _samples_per_bit(SAMPLE_RATE, BAUD)
    _lo, _hi, dec, taps = _fir_frontend_plan(BAUD, MARK, SPACE, SAMPLE_RATE)
    plan = _fsk_disc_kernel_plan(spb, dec, taps)
    assert plan is not None
    assert plan["row2"] % 128 == 0
    assert plan["row2"] * plan["dec"] % spb == 0
    assert plan["fb"] % 16 == 0  # int16 block tiling
    assert plan["c_pad"] % 128 == 0 and plan["c_pad"] >= plan["c"]


@pytest.mark.parametrize("dtype", [np.float32, np.int16])
def test_disc_kernel_matches_fallback(dtype):
    """Kernel (interpret) bits == the XLA fallback bits over the signal span
    (capture-tail pad bits may differ: the kernel's final lookahead block and
    the fallback's zero pad see different garbage)."""
    n = 1 << 18
    sig0, _ = _capture(n, seed=1)
    sig1, _ = _capture(n, seed=2, payload_len=500)
    batch = np.stack([sig0, np.roll(sig1, 7)])  # different timing offsets
    rows = _disc_rows(batch, dtype=dtype)
    bits_k = np.asarray(
        fsk_disc_bits_rows_batch(jnp.asarray(rows), BAUD, MARK, SPACE, SAMPLE_RATE, kernel=True)
    )
    bits_x = np.asarray(
        fsk_disc_bits_rows_batch(jnp.asarray(rows), BAUD, MARK, SPACE, SAMPLE_RATE, kernel=False)
    )
    assert bits_k.shape == bits_x.shape
    spb = _samples_per_bit(SAMPLE_RATE, BAUD)
    n_sig = n // spb - 2
    assert np.array_equal(bits_k[:, :n_sig], bits_x[:, :n_sig])


def test_disc_path_matches_legacy_bits():
    """New-layout bits == fsk_demod_bits (matmul frontend, no MLSE) over the
    signal span — same templates, same calibration, different row blocking."""
    n = 1 << 18
    sig, _ = _capture(n, seed=3)
    rows = _disc_rows(sig[None, :])
    bits_new = np.asarray(
        fsk_disc_bits_rows_batch(jnp.asarray(rows), BAUD, MARK, SPACE, SAMPLE_RATE, kernel=False)
    )[0]
    bits_old = np.asarray(
        fsk_demod_bits(jnp.asarray(sig), BAUD, MARK, SPACE, SAMPLE_RATE, mlse=False)[0]
    )
    spb = _samples_per_bit(SAMPLE_RATE, BAUD)
    n_sig = n // spb - 2
    assert np.array_equal(bits_new[:n_sig], bits_old[:n_sig])


@pytest.mark.parametrize("dtype", [np.float32, np.int16])
def test_disc_kernel_e2e_frame(dtype):
    from audio_modem_radio_tpu.ops.common import find_bit_pattern, pack_bits_from

    n = 1 << 18
    sig, payload = _capture(n, seed=5)
    rows = _disc_rows(np.stack([sig, sig]), dtype=dtype)
    bits = fsk_disc_bits_rows_batch(
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


def test_disc_noisy_parity_with_legacy():
    """At 15 dB the new path's BER tracks the legacy path's on the same
    noisy capture (identical front end + calibration; row blocking and the
    pass-1 window rows differ, so allow a small relative band)."""
    n = 1 << 18
    sig, _ = _capture(n, seed=7, payload_len=2000)
    rng = np.random.default_rng(99)
    snr = 10 ** (15 / 10)
    noise = rng.normal(0, np.sqrt(np.mean(sig**2) / snr), n).astype(np.float32)
    noisy = sig + noise
    rows = _disc_rows(noisy[None, :])
    bits_new = np.asarray(
        fsk_disc_bits_rows_batch(jnp.asarray(rows), BAUD, MARK, SPACE, SAMPLE_RATE, kernel=False)
    )[0]
    bits_old = np.asarray(
        fsk_demod_bits(jnp.asarray(noisy), BAUD, MARK, SPACE, SAMPLE_RATE, mlse=False)[0]
    )
    spb = _samples_per_bit(SAMPLE_RATE, BAUD)
    n_sig = n // spb - 2
    mism = np.mean(bits_new[:n_sig] != bits_old[:n_sig])
    assert mism < 5e-3  # decisions agree except at noise-marginal bits


def test_disc_batch_surface_decodes():
    """decode_sample_batch FSK9600 still decodes (CPU: legacy 637-col rows,
    the fused layout only engages on the TPU backend)."""
    from audio_modem_radio_tpu.parallel.batch import decode_sample_batch

    n = 1 << 17
    sig, payload = _capture(n, seed=11, payload_len=300)
    batch = np.stack([sig, sig])
    raws = decode_sample_batch(batch, "FSK9600", 9600)
    for raw in raws:
        frames = parse_frames(raw)
        assert frames and frames[0].data == payload
