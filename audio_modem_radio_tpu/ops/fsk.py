"""Continuous-phase FSK: TPU-native modulation and demodulation.

Wire-compatible with the reference CPFSK definition
(/root/reference/modem.py:270-341): ``0xAA AA AA AA`` byte preamble, MSB-first
bits, one sine tone per bit (mark=1, space=0) with a running phase accumulator
for spectral continuity, output scaled by 0.9, and magic-pattern byte
alignment on receive.

TPU-first architecture:

* **Modulation** — the per-bit starting phase is accumulated on the host in
  exact integer units of ``1/sample_rate`` cycles (tone frequencies are
  integers, so ``freq*samples_per_bit mod sample_rate`` is exact — no float
  drift across millions of bits, unlike a float accumulator). The waveform is
  one ``(n_bits, 4) @ (4, samples_per_bit)`` matmul: each bit contributes
  ``(cosφ, sinφ)`` against precomputed (sin, cos) basis rows of its tone.
* **Demodulation** — two strategies, chosen statically from the configuration:

  - *Dual-tone matched filter* when the tones are separated by >=0.4 cycles
    per bit window: band-limited analytic signal, then per-bit complex
    correlation against mark/space tones for every timing offset — a single
    matmul; the bit decision compares energies. This is the optimal
    noncoherent FSK detector, strictly better than the reference's
    Butterworth-envelope comparison (modem.py:306-315).
  - *Frequency discriminator* when the tones are too close for one-bit-window
    correlation to separate (e.g. the reference's FSK9600 configuration:
    1200/2200 Hz tones at 9600 baud — which crashes the reference demodulator
    outright because its bandpass edge goes negative): instantaneous
    frequency from the analytic signal's phase increments, averaged per bit
    window, thresholded at the tone midpoint.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import analytic_bandpass, bit_sync_and_pack, bytes_to_bits, frame_signal

FSK_PREAMBLE = b"\xAA\xAA\xAA\xAA"


def _samples_per_bit(sample_rate: int, baud: float) -> int:
    # round(), matching the reference (modem.py:272).
    return int(round(sample_rate / baud))


@functools.lru_cache(maxsize=64)
def _tone_basis(spb: int, mark: float, space: float, sample_rate: int) -> np.ndarray:
    """(4, spb): rows = sin/cos of mark tone, sin/cos of space tone."""
    t = np.arange(spb, dtype=np.float64) / sample_rate
    wm, ws = 2 * np.pi * mark * t, 2 * np.pi * space * t
    return np.stack([np.sin(wm), np.cos(wm), np.sin(ws), np.cos(ws)]).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("spb", "mark", "space", "sample_rate"))
def _synthesize(coeff: jnp.ndarray, spb: int, mark: float, space: float, sample_rate: int) -> jnp.ndarray:
    """(n_bits, 4) coefficient rows -> waveform (n_bits*spb,), scaled by 0.9."""
    basis = jnp.asarray(_tone_basis(spb, mark, space, sample_rate))
    return (coeff @ basis).reshape(-1) * jnp.float32(0.9)


def fsk_modulate(
    data_bytes: bytes,
    baud: float = 1200,
    mark_freq: float = 1200.0,
    space_freq: float = 2200.0,
    samp_rate: int = 96000,
) -> np.ndarray:
    """CPFSK with exact continuous phase across bit boundaries.

    A one-byte ``0xAA`` postamble is appended after the payload: the receive
    chain's spectral front end has an edge transient at end-of-signal, and the
    postamble keeps it off the final payload bit. Frame parsers (ours and the
    reference's) ignore bytes past the frame payload, so this is transparent
    on the wire.
    """
    spb = _samples_per_bit(samp_rate, baud)
    bits = bytes_to_bits(FSK_PREAMBLE + data_bytes + b"\xAA").astype(np.int64)

    # Phase advance per bit in integer 1/samp_rate-cycle units (exact for
    # integer tone frequencies; non-integer ones fall back to rounding, which
    # deviates by < 0.5 sample-cycle per bit).
    inc_mark = int(round(mark_freq * spb)) % samp_rate
    inc_space = int(round(space_freq * spb)) % samp_rate
    incs = np.where(bits == 1, inc_mark, inc_space)
    phase_units = np.concatenate([[0], np.cumsum(incs[:-1])]) % samp_rate
    phi = 2 * np.pi * phase_units / samp_rate

    cphi, sphi = np.cos(phi), np.sin(phi)
    is_mark = bits == 1
    # sin(w_tone*t + phi) = sin(w t)cos(phi) + cos(w t)sin(phi), routed to the
    # tone selected by the bit.
    coeff = np.stack(
        [cphi * is_mark, sphi * is_mark, cphi * ~is_mark, sphi * ~is_mark], axis=1
    ).astype(np.float32)
    out = _synthesize(jnp.asarray(coeff), spb, float(mark_freq), float(space_freq), int(samp_rate))
    return np.asarray(out)


# --- demodulation -------------------------------------------------------------

def _separation_cycles(baud: float, mark: float, space: float, sample_rate: int) -> float:
    return abs(mark - space) * _samples_per_bit(sample_rate, baud) / sample_rate


@functools.lru_cache(maxsize=64)
def _fsk_templates(spb: int, mark: float, space: float, sample_rate: int, n_offsets: int) -> np.ndarray:
    """(2*spb, 2*n_offsets) complex: conj mark/space tones at shifted windows."""
    t = np.arange(2 * spb, dtype=np.float64)
    tones = [np.exp(-2j * np.pi * f * t / sample_rate) for f in (mark, space)]
    T = np.zeros((2 * spb, 2 * n_offsets), dtype=np.complex128)
    for i in range(n_offsets):
        o = i * spb // n_offsets
        for j, tone in enumerate(tones):
            T[o : o + spb, 2 * i + j] = tone[o : o + spb]
    return T.astype(np.complex64)


_EQ_TAPS = 5  # calibrated discriminator equalizer length (per-bit taps)


def _np_analytic_freq(wave: np.ndarray, band_lo: float, band_hi: float, sr: int) -> np.ndarray:
    """Host-side (numpy) analytic-signal instantaneous frequency, for calibration."""
    spec = np.fft.fft(wave.astype(np.float64))
    freqs = np.fft.fftfreq(len(wave), d=1.0 / sr)
    spec *= 2.0 * ((freqs >= band_lo) & (freqs <= band_hi))
    z = np.fft.ifft(spec)
    return np.angle(z[1:] * np.conj(z[:-1])) * sr / (2 * np.pi)


@functools.lru_cache(maxsize=64)
def _discriminator_calibration(
    spb: int, baud: float, mark: float, space: float, sample_rate: int,
    band_lo: float, band_hi: float, core_lo: int, core_hi: int,
) -> np.ndarray:
    """Fit a per-bit FIR equalizer mapping measured mean frequencies to tones.

    Close-tone CPFSK (modulation index << 1) suffers inter-symbol interference
    through the analytic transform: a bit's measured mean frequency is biased
    by its neighbors. This one-time, per-configuration calibration synthesizes
    a known pseudo-random bit sequence, measures it through the exact receive
    front end, and least-squares fits ``_EQ_TAPS`` taps + bias that undo the
    bias. Returns (taps..., bias) as float32.
    """
    from .common import bytes_to_bits

    rng = np.random.default_rng(0xFB9C)
    train = rng.integers(0, 256, 400, dtype=np.uint8).tobytes()
    bits = bytes_to_bits(FSK_PREAMBLE + train).astype(np.float64)

    # Pure-numpy CPFSK synthesis (identical math to fsk_modulate, kept out of
    # the jit path because this runs during tracing).
    inc = np.where(
        bits == 1, int(round(mark * spb)) % sample_rate, int(round(space * spb)) % sample_rate
    )
    phase0 = np.concatenate([[0], np.cumsum(inc[:-1])]) % sample_rate
    t = np.arange(spb, dtype=np.float64) / sample_rate
    tones = np.where(bits[:, None] == 1, mark, space)
    wave = 0.9 * np.sin(
        2 * np.pi * (tones * t[None, :] + phase0[:, None] / sample_rate)
    ).reshape(-1)
    f_true = np.where(bits == 1, mark, space)
    freq = _np_analytic_freq(wave, band_lo, band_hi, sample_rate)
    n_bits = len(bits)
    means = np.empty(n_bits)
    for k in range(n_bits):
        w = freq[k * spb + core_lo : k * spb + core_hi]
        means[k] = w.mean() if len(w) else (mark + space) / 2
    pad = _EQ_TAPS // 2
    fm = np.pad(means, pad, mode="edge")
    A = np.stack(
        [fm[j : j + n_bits] for j in range(_EQ_TAPS)] + [np.ones(n_bits)], axis=1
    )
    coef, *_ = np.linalg.lstsq(A, f_true, rcond=None)
    return coef.astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=("baud", "mark", "space", "sample_rate", "n_offsets"),
)
def fsk_demod_bits(
    samples: jnp.ndarray,
    baud: float,
    mark: float,
    space: float,
    sample_rate: int,
    n_offsets: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Demodulate CPFSK to a bit array; returns ``(bits, best_offset_score)``."""
    spb = _samples_per_bit(sample_rate, baud)
    n = samples.shape[-1]
    n_bits = n // spb
    if n_bits < 2:
        raise ValueError("signal shorter than two bit periods")

    lo_f, hi_f = min(mark, space), max(mark, space)
    band_lo = max(lo_f - baud, 10.0)
    band_hi = min(hi_f + baud, sample_rate / 2 - 10.0)
    z = analytic_bandpass(samples, band_lo, band_hi, sample_rate)

    if _separation_cycles(baud, mark, space, sample_rate) >= 0.4:
        frames = frame_signal(z, 2 * spb, spb, n_bits)
        T = jnp.asarray(_fsk_templates(spb, float(mark), float(space), sample_rate, n_offsets))
        e = jnp.abs(frames @ T).reshape(n_bits, n_offsets, 2)  # (.., [mark, space])
        margin = e[:, :, 0] - e[:, :, 1]
        score = jnp.sum(jnp.abs(margin), axis=0)
        best = jnp.argmax(score)
        bits = (jnp.take(margin, best, axis=1) > 0).astype(jnp.uint8)
        return bits, score[best]

    # Discriminator path: per-sample instantaneous frequency, averaged over
    # the *central* 60% of each bit window at each timing offset — the outer
    # samples carry keying transitions and, at the signal edges, the Gibbs
    # transient of the brick-wall band limit.
    dphase = jnp.angle(z[1:] * jnp.conj(z[:-1]))  # rad/sample
    freq = dphase * (sample_rate / (2 * jnp.pi))
    frames = frame_signal(freq, 2 * spb, spb, n_bits)
    box = np.zeros((2 * spb, n_offsets), dtype=np.float32)
    core_lo, core_hi = max(1, int(spb * 0.2)), max(2, int(np.ceil(spb * 0.8)))
    for i in range(n_offsets):
        o = i * spb // n_offsets
        box[o + core_lo : o + core_hi, i] = 1.0 / (core_hi - core_lo)
    mean_freq = frames @ jnp.asarray(box)  # (n_bits, n_offsets)

    # Undo neighbor-bit ISI with the statically calibrated per-config equalizer.
    coef = _discriminator_calibration(
        spb, float(baud), float(mark), float(space), sample_rate,
        float(band_lo), float(band_hi), core_lo, core_hi,
    )
    pad = _EQ_TAPS // 2
    fm = jnp.concatenate(
        [jnp.repeat(mean_freq[:1], pad, axis=0), mean_freq, jnp.repeat(mean_freq[-1:], pad, axis=0)]
    )
    eq = jnp.full_like(mean_freq, float(coef[-1]))
    for j in range(_EQ_TAPS):
        eq = eq + float(coef[j]) * fm[j : j + mean_freq.shape[0]]

    mid = (mark + space) / 2.0
    score = jnp.sum(jnp.abs(eq - mid), axis=0)
    best = jnp.argmax(score)
    f = jnp.take(eq, best, axis=1)
    bits = (jnp.abs(f - mark) < jnp.abs(f - space)).astype(jnp.uint8)
    return bits, score[best]


def fsk_demodulate(
    samples: np.ndarray,
    baud: float = 1200,
    mark_freq: float = 1200.0,
    space_freq: float = 2200.0,
    samp_rate: int = 96000,
) -> bytes:
    """CPFSK receive chain: bits -> magic-aligned bytes."""
    from ..framing import MAGIC_BIT_PATTERN

    bits, _ = fsk_demod_bits(
        jnp.asarray(samples, jnp.float32),
        float(baud),
        float(mark_freq),
        float(space_freq),
        int(samp_rate),
    )
    packed, n_valid, _found = bit_sync_and_pack(bits, MAGIC_BIT_PATTERN)
    return bytes(np.asarray(packed)[: int(n_valid)])


def fsk_high_speed_modulate(data_bytes: bytes, baud: float = 19200, samp_rate: int = 96000) -> np.ndarray:
    """High-rate FSK: 8/16 kHz tones at 19200 baud (reference modem.py:351-352)."""
    return fsk_modulate(data_bytes, baud, 8000.0, 16000.0, samp_rate)


def fsk_high_speed_demodulate(samples: np.ndarray, baud: float = 19200, samp_rate: int = 96000) -> bytes:
    return fsk_demodulate(samples, baud, 8000.0, 16000.0, samp_rate)
