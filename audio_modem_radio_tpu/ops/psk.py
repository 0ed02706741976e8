"""Differential BPSK / QPSK: TPU-native modulation and demodulation.

Wire-compatible with the reference's DBPSK/DQPSK signal definitions
(/root/reference/modem.py:28-266): MSB-first bits, the same preambles
(``[1,0]*40`` for DBPSK, ``[0,0]*30+[1,1]*10`` dibits for DQPSK), differential
phase encoding (Gray map 00->0, 01->+90°, 11->180°, 10->-90° for DQPSK), sine
carrier with a 10% linear ramp envelope per symbol, and magic-pattern byte
alignment on receive.

TPU-first architecture (not a translation of the reference's loops):

* **Modulation** — per-symbol phases are exact integer *quarter-turns*
  accumulated on the host (no float drift over millions of symbols); the
  waveform is a single ``(n_symbols, 2) @ (2, samples_per_symbol)`` matmul of
  ``(cos φ, sin φ)`` rows against precomputed carrier basis functions, instead
  of a Python loop synthesizing each symbol.
* **Demodulation** — the whole receive front end (the reference's bandpass
  filtfilt -> mix -> lowpass filtfilt -> stride-sample chain) collapses into a
  single real matmul: overlapping 2-symbol sample frames times a dual-basis
  template matrix that least-squares-projects each window onto its symbol
  subspace, for *all timing-offset hypotheses at once*; differential
  detection, offset selection, and Gray de-mapping are vectorized elementwise
  ops. See ``_offset_templates`` for why this is exact at any carrier/baud
  ratio where the reference receiver is not.

The reference samples a *single* baseband point per symbol; correlating over
the full symbol window is the matched filter for this waveform, so noise
performance is at least as good at identical configurations.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import bit_sync_and_pack, bytes_to_bits, frame_signal

# Exact unit-circle table for quarter-turn phases: cos/sin of k*pi/2.
_QT_COS = np.array([1.0, 0.0, -1.0, 0.0], dtype=np.float64)
_QT_SIN = np.array([0.0, 1.0, 0.0, -1.0], dtype=np.float64)

# DQPSK Gray map: dibit (hi, lo) -> phase delta in quarter turns.
_DIBIT_TO_QT = {(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}
# Inverse map used on receive: quantized quarter-turn -> (hi, lo).
_QT_TO_DIBIT = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], dtype=np.uint8)

BPSK_PREAMBLE_BITS = [1, 0] * 40
QPSK_PREAMBLE_BITS = [0, 0] * 30 + [1, 1] * 10


def _samples_per_symbol(sample_rate: int, baud: float) -> int:
    # int() truncation, matching the reference (modem.py:36) so symbol
    # boundaries line up sample-exactly across implementations.
    return int(sample_rate / baud)


@functools.lru_cache(maxsize=64)
def _carrier_basis(spsym: int, carrier: float, sample_rate: int) -> np.ndarray:
    """(2, spsym) rows = (sin, cos) of the carrier over one symbol, ramped.

    The 10% linear ramp envelope matches the reference's anti-click windowing
    (modem.py:58-63).
    """
    t = np.arange(spsym, dtype=np.float64) / sample_rate
    env = np.ones(spsym)
    ramp = int(spsym * 0.1)
    if ramp > 0:
        env[:ramp] = np.linspace(0, 1, ramp)
        env[-ramp:] = np.linspace(1, 0, ramp)
    w = 2 * np.pi * carrier * t
    return np.stack([np.sin(w) * env, np.cos(w) * env]).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("spsym", "carrier", "sample_rate"))
def _synthesize(phase_qt: jnp.ndarray, spsym: int, carrier: float, sample_rate: int) -> jnp.ndarray:
    """Quarter-turn phase indices (n_sym,) -> waveform (n_sym*spsym,).

    sin(w + φ) = sin(w)cos(φ) + cos(w)sin(φ): a (n_sym, 2) @ (2, spsym) matmul.
    """
    basis = jnp.asarray(_carrier_basis(spsym, carrier, sample_rate))
    cs = jnp.stack(
        [jnp.asarray(_QT_COS, jnp.float32)[phase_qt], jnp.asarray(_QT_SIN, jnp.float32)[phase_qt]],
        axis=1,
    )
    return (cs @ basis).reshape(-1)


def bpsk_modulate(
    data_bytes: bytes, baud: float = 1200, carrier: float = 3000.0, samp_rate: int = 96000
) -> np.ndarray:
    """DBPSK: 1 = invert phase, 0 = keep phase; ``[1,0]*40`` preamble."""
    bits = np.concatenate(
        [np.asarray(BPSK_PREAMBLE_BITS, np.uint8), bytes_to_bits(data_bytes)]
    ).astype(np.int64)
    # Differential: phase after bit k is (number of ones so far) half turns.
    half_turns = np.cumsum(bits) % 2
    phase_qt = (half_turns * 2).astype(np.int32)  # 0 or 2 quarter-turns
    spsym = _samples_per_symbol(samp_rate, baud)
    out = _synthesize(jnp.asarray(phase_qt), spsym, float(carrier), int(samp_rate))
    return np.asarray(out)


def qpsk_modulate(
    data_bytes: bytes, baud: float = 1200, carrier: float = 3000.0, samp_rate: int = 96000
) -> np.ndarray:
    """DQPSK with Gray-coded phase deltas and the reference preamble."""
    bits = np.concatenate(
        [np.asarray(QPSK_PREAMBLE_BITS, np.uint8), bytes_to_bits(data_bytes)]
    )
    if len(bits) % 2:
        bits = np.concatenate([bits, np.zeros(1, np.uint8)])
    hi, lo = bits[0::2].astype(np.int64), bits[1::2].astype(np.int64)
    # Gray map as arithmetic on (hi, lo): 00->0, 01->1, 11->2, 10->3 quarter turns.
    deltas = hi * 3 + lo * (1 - 2 * hi)
    phase_qt = (np.cumsum(deltas) % 4).astype(np.int32)
    spsym = _samples_per_symbol(samp_rate, baud)
    out = _synthesize(jnp.asarray(phase_qt), spsym, float(carrier), int(samp_rate))
    return np.asarray(out)


# --- demodulation -------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _offset_templates(spsym: int, carrier: float, sample_rate: int, n_offsets: int) -> np.ndarray:
    """(2*spsym, 2*n_offsets) real templates: per-offset dual basis of the symbol subspace.

    Every transmitted symbol is exactly ``cos(φ)·b1 + sin(φ)·b2`` with
    ``b1 = sin(wt)·env`` and ``b2 = cos(wt)·env`` (the modulator restarts the
    carrier at each symbol, like the reference, modem.py:37,54). Recovering
    ``(cos φ, sin φ)`` is therefore a least-squares projection onto that 2-D
    subspace: columns ``2i`` / ``2i+1`` hold the Gram-inverse dual basis
    ``G⁻¹·[b1 b2]ᵀ`` for the window starting ``i*spsym//n_offsets`` samples
    into a 2-symbol frame. This is exact for *any* carrier/baud ratio — unlike
    plain quadrature correlation, which breaks when the symbol holds fewer
    than ~1 carrier cycle (and unlike the reference's global-LO mixing, which
    adds a spurious ``2π·frac(carrier/baud)`` rotation to every differential
    angle whenever carrier/baud is not an integer — the defect behind its own
    logged QPSK self-decode failure). A window offset only rotates the
    recovered phasor by a constant, which differential detection cancels.
    """
    t = np.arange(2 * spsym, dtype=np.float64)
    w = 2 * np.pi * carrier * t / sample_rate
    env = np.ones(spsym)
    ramp = int(spsym * 0.1)
    if ramp > 0:
        env[:ramp] = np.linspace(0, 1, ramp)
        env[-ramp:] = np.linspace(1, 0, ramp)
    T = np.zeros((2 * spsym, 2 * n_offsets), dtype=np.float64)
    for i in range(n_offsets):
        o = i * spsym // n_offsets
        B = np.stack([np.sin(w[o : o + spsym]) * env, np.cos(w[o : o + spsym]) * env], axis=1)
        G = B.T @ B + 1e-9 * np.eye(2)
        T[o : o + spsym, 2 * i : 2 * i + 2] = B @ np.linalg.inv(G)  # (spsym, 2)
    return T.astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("baud", "carrier", "sample_rate", "n_psk", "n_offsets")
)
def psk_demod_bits(
    samples: jnp.ndarray,
    baud: float,
    carrier: float,
    sample_rate: int,
    n_psk: int,
    n_offsets: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Demodulate D(B/Q)PSK to a bit array; returns ``(bits, best_offset_score)``.

    ``samples`` is a fixed-length (N,) float array (zero-pad to a bucket for
    batching). Output bits: ``n_frames-1`` for BPSK, ``2*(n_frames-1)`` for
    QPSK, where ``n_frames = N//spsym - 1``.
    """
    spsym = _samples_per_symbol(sample_rate, baud)
    n = samples.shape[-1]
    # One frame per symbol slot; frame_signal zero-pads the final 2-symbol
    # window so the last symbol's correlation is still computed.
    n_frames = n // spsym
    if n_frames < 2:
        raise ValueError("signal shorter than two symbols")

    frames = frame_signal(samples.astype(jnp.float32), 2 * spsym, spsym, n_frames)
    T = jnp.asarray(_offset_templates(spsym, float(carrier), sample_rate, n_offsets))
    proj = (frames @ T).reshape(n_frames, n_offsets, 2)
    sym = jax.lax.complex(proj[..., 0], proj[..., 1])  # e^{jφ} per offset hypothesis

    diff = sym[1:] * jnp.conj(sym[:-1])  # (n_frames-1, n_offsets)
    score = jnp.sum(jnp.abs(diff), axis=0)
    best = jnp.argmax(score)
    d = jnp.take(diff, best, axis=1)

    if n_psk == 2:
        bits = (jnp.real(d) < 0).astype(jnp.uint8)
    else:
        ang = jnp.angle(d)  # (-pi, pi]
        q = jnp.mod(jnp.floor((ang + jnp.pi / 4) / (jnp.pi / 2)), 4).astype(jnp.int32)
        bits = jnp.asarray(_QT_TO_DIBIT)[q].reshape(-1)
    return bits, score[best]


def _demod_to_bytes(samples: np.ndarray, baud, carrier, samp_rate, n_psk, pattern) -> bytes:
    from ..framing import MAGIC_BIT_PATTERN

    bits, _ = psk_demod_bits(
        jnp.asarray(samples, jnp.float32), float(baud), float(carrier), int(samp_rate), n_psk
    )
    packed, n_valid, _found = bit_sync_and_pack(bits, pattern or MAGIC_BIT_PATTERN)
    return bytes(np.asarray(packed)[: int(n_valid)])


def bpsk_demodulate(
    samples: np.ndarray, baud: float = 1200, carrier: float = 3000.0, samp_rate: int = 96000
) -> bytes:
    """DBPSK receive chain: bits -> magic-aligned bytes."""
    return _demod_to_bytes(samples, baud, carrier, samp_rate, 2, None)


def qpsk_demodulate(
    samples: np.ndarray, baud: float = 1200, carrier: float = 3000.0, samp_rate: int = 96000
) -> bytes:
    """DQPSK receive chain: dibits -> magic-aligned bytes."""
    return _demod_to_bytes(samples, baud, carrier, samp_rate, 4, None)
