"""Shared DSP primitives for the TPU modem: bit packing, frame sync, spectra.

These are the building blocks of every demodulator in this package. Design
notes (vs the reference implementation they functionally replace):

* Bit/byte conversion is array math (``unpackbits``/matmul) rather than python
  string formatting (/root/reference/modem.py:30,111-133).
* Frame-sync ("find the FBPC magic in the bit stream") is a vectorized
  pattern correlation + argmax instead of ``str.find`` — ``bit_sync_and_pack``
  returns the packed bytes for the first sync hypothesis plus the offset-0
  fallback the reference also applies (modem.py:116-133).
* The analytic band-limited signal (``analytic_bandpass``) replaces the
  reference's Butterworth band-pass -> complex mix -> Butterworth low-pass
  chain (modem.py:73-88) with a single FFT pass: zero out negative
  frequencies and everything outside the pass band. This is a zero-phase
  brick-wall filter — the linear-phase analog of the reference's ``filtfilt``
  use — and it makes the subsequent downconversion exactly image-free, so no
  separate low-pass is needed.

Everything here is shape-static and jit/vmap-friendly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# MSB-first weights for a byte.
_BYTE_WEIGHTS = np.array([128, 64, 32, 16, 8, 4, 2, 1], dtype=np.int32)


# --- host-side bit utilities --------------------------------------------------

def bytes_to_bits(data: bytes) -> np.ndarray:
    """bytes -> uint8 bit array, MSB first (matches the reference bit order)."""
    return np.unpackbits(np.frombuffer(data, dtype=np.uint8))


def bits_to_bytes(bits: np.ndarray) -> bytes:
    """uint8/int bit array (MSB first) -> bytes; truncates trailing partial byte."""
    bits = np.asarray(bits, dtype=np.uint8)
    n = (len(bits) // 8) * 8
    return np.packbits(bits[:n]).tobytes()


# --- device-side sync + packing ----------------------------------------------

@functools.partial(jax.jit, static_argnames=("pattern",))
def find_bit_pattern(bits: jnp.ndarray, pattern: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First index where the literal bit ``pattern`` occurs in ``bits``.

    Returns ``(index, found)``; ``index`` is 0 when not found (the caller's
    fallback is to pack from offset 0, mirroring the reference's behavior).
    """
    pat = jnp.asarray([1 if c == "1" else -1 for c in pattern], dtype=jnp.float32)
    x = bits.astype(jnp.float32) * 2.0 - 1.0
    # corr[i] = sum_t x[i+t] * pat[t]; == len(pattern) iff exact match.
    corr = jnp.convolve(x, pat[::-1], mode="valid")
    match = corr >= (len(pattern) - 0.5)
    idx = jnp.arange(match.shape[0], dtype=jnp.int32)
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    first = jnp.min(jnp.where(match, idx, big))
    found = jnp.any(match)
    return jnp.where(found, first, 0).astype(jnp.int32), found


@jax.jit
def pack_bits_from(bits: jnp.ndarray, start: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack ``bits[start:]`` MSB-first into bytes (static output shape).

    Returns ``(packed, n_valid)`` where ``packed`` has ``len(bits)//8`` entries
    and only the first ``n_valid`` are meaningful. Out-of-range positions are
    zero-filled.
    """
    n_bits = bits.shape[0]
    max_bytes = n_bits // 8
    pos = start + jnp.arange(max_bytes * 8, dtype=jnp.int32)
    valid = pos < n_bits
    gathered = jnp.where(valid, bits[jnp.clip(pos, 0, n_bits - 1)], 0)
    packed = gathered.reshape(max_bytes, 8).astype(jnp.int32) @ jnp.asarray(_BYTE_WEIGHTS)
    n_valid = (n_bits - start) // 8
    return packed.astype(jnp.uint8), n_valid


def bit_sync_and_pack(bits: jnp.ndarray, pattern: str) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Align the bit stream on ``pattern`` and pack to bytes.

    Falls back to offset 0 when the pattern is absent, like the reference
    demodulators (modem.py:130-133). Returns ``(bytes, n_valid, found)``.
    """
    start, found = find_bit_pattern(bits, pattern)
    packed, n_valid = pack_bits_from(bits, start)
    return packed, n_valid, found


# --- spectral front end -------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("low_hz", "high_hz", "sample_rate"))
def analytic_bandpass(
    samples: jnp.ndarray,
    low_hz: float,
    high_hz: float,
    sample_rate: int,
) -> jnp.ndarray:
    """Band-limited analytic signal via one FFT round trip.

    Keeps only positive frequencies in ``[low_hz, high_hz]`` (doubled, so the
    magnitude matches the envelope of the real input) and returns the complex
    time-domain signal. ``angle`` / magnitude of this are exactly the
    instantaneous phase/envelope within the band.
    """
    n = samples.shape[-1]
    spectrum = jnp.fft.fft(samples.astype(jnp.float32))
    freqs = np.fft.fftfreq(n, d=1.0 / sample_rate)  # static, host-computed
    band = ((freqs >= max(low_hz, 0.0)) & (freqs <= high_hz)).astype(np.complex64) * 2.0
    # Don't double DC / Nyquist if they fall inside the band.
    if low_hz <= 0.0:
        band[0] = 1.0
    return jnp.fft.ifft(spectrum * jnp.asarray(band))


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int, n_frames: int) -> jnp.ndarray:
    """Overlapping frames ``x[k*hop : k*hop+frame_len]`` as a (n_frames, frame_len) matrix.

    Implemented as two contiguous reshapes + concat when ``frame_len == 2*hop``
    (the common case here), falling back to a strided gather otherwise.
    """
    n = x.shape[-1]
    if frame_len == 2 * hop:
        need = (n_frames + 1) * hop
        xp = jnp.pad(x, (0, max(0, need - n)))
        a = xp[: n_frames * hop].reshape(n_frames, hop)
        b = xp[hop : hop + n_frames * hop].reshape(n_frames, hop)
        return jnp.concatenate([a, b], axis=1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    xp = jnp.pad(x, (0, max(0, int(idx.max()) + 1 - n)))
    return xp[idx]
