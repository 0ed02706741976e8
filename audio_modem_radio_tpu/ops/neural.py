"""NEURAL mode: learned-codebook modulation as a first-class wire mode.

The reference gestures at ML-assisted modulation with a torch file that
contains no network (/root/reference/neural_modem.py); its mode recommender
nonetheless knows a "NEURAL" profile. Here NEURAL is a real mode: the
committed codebook (trained by models/train_neural.py — an autoencoder over
an AWGN channel) maps each byte to a 16-dimensional unit-power codeword of
8 complex baseband chips, which ride a 24 kHz carrier.

TPU-first design: modulation is a gather + one matmul against the carrier
basis; demodulation is downconversion (elementwise), per-chip box integration
(a reshape + mean), and ONE ``(n_sym, 16) @ (16, 256)`` matmul + argmax —
maximum-likelihood nearest-codeword detection (all codewords have equal norm,
so correlation argmax == Euclidean argmin, and detection is scale-invariant).
Frame sync is a matched-filter correlation against the known 32-symbol
preamble waveform via FFT, yielding both timing and carrier phase.

Wire format: [32-symbol preamble | framed bytes, 1 byte = 1 symbol]. At
``symbol_rate`` symbols/s the payload rate is ``symbol_rate`` bytes/s —
faster than every classical mode here at equal baud.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 96000
CARRIER = 24000.0  # fs/4: the double-frequency image alternates sign per
# sample, so box integration over an even-length chip cancels it exactly.
CHIPS_PER_SYMBOL = 8
PREAMBLE_LEN = 32

_CODEBOOK_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "models", "data", "neural_codebook.npz"
)


@functools.lru_cache(maxsize=1)
def _codebook() -> np.ndarray:
    """(256, 16) float32 learned codebook: [I(0..7) | Q(0..7)] per symbol."""
    if os.path.exists(_CODEBOOK_PATH):
        with np.load(_CODEBOOK_PATH) as z:
            cb = np.asarray(z["codebook"], np.float32)
    else:
        # Zip-safe load (zipapp / wheel-in-zip): read via importlib.resources.
        import io
        from importlib import resources

        blob = (
            resources.files("audio_modem_radio_tpu.models")
            .joinpath("data/neural_codebook.npz")
            .read_bytes()
        )
        with np.load(io.BytesIO(blob)) as z:
            cb = np.asarray(z["codebook"], np.float32)
    assert cb.shape == (256, 2 * CHIPS_PER_SYMBOL), cb.shape
    return cb


@functools.lru_cache(maxsize=1)
def _preamble_symbols() -> np.ndarray:
    """Fixed pseudo-random preamble symbols (part of the wire format)."""
    return np.random.default_rng(0xFBFC).integers(0, 256, PREAMBLE_LEN, dtype=np.uint8)


def _chip_len(symbol_rate: int) -> int:
    """Samples per chip; even so the fs/2 image cancels under box integration."""
    raw = max(2, round(SAMPLE_RATE / (symbol_rate * CHIPS_PER_SYMBOL)))
    return raw + (raw % 2)


def _bucket(n: int) -> int:
    b = 256
    while b < n:
        b <<= 1
    return b


def _synth(symbols, codebook, chip_len: int) -> np.ndarray:
    """(n_sym,) byte symbols -> real waveform (n_sym * 8 * chip_len,).

    Pure numpy ON PURPOSE: modulation is not a hot path, and the jitted
    version of this program left the axon TPU backend in a state where the
    NEXT dispatched program (any complex-exponential multiply) failed with
    UNIMPLEMENTED — a backend bug none of the sub-ops (gather, repeat,
    trig) reproduce alone. Host synthesis sidesteps it and keeps
    modulate->demodulate usable in one process on the real chip.
    """
    cw = np.asarray(codebook)[np.asarray(symbols)]  # (n, 16)
    i_chips = cw[:, :CHIPS_PER_SYMBOL].reshape(-1)
    q_chips = cw[:, CHIPS_PER_SYMBOL:].reshape(-1)
    i_t = np.repeat(i_chips, chip_len)
    q_t = np.repeat(q_chips, chip_len)
    n = np.arange(i_t.shape[0], dtype=np.float64)
    w = 2 * np.pi * (CARRIER / SAMPLE_RATE) * n
    return (i_t * np.cos(w) - q_t * np.sin(w)).astype(np.float32)


def neural_mode_modulate(
    framed: bytes, symbol_rate: int = 1200, samp_rate: int = SAMPLE_RATE
) -> np.ndarray:
    """framed bytes -> NEURAL waveform (float32, peak 0.9)."""
    assert samp_rate == SAMPLE_RATE, "NEURAL mode is defined at 96 kHz"
    chip_len = _chip_len(symbol_rate)
    symbols = np.concatenate(
        [_preamble_symbols(), np.frombuffer(framed, np.uint8)]
    ).astype(np.int32)
    n_sym = len(symbols)
    padded = np.pad(symbols, (0, _bucket(n_sym) - n_sym))
    wave = _synth(padded, _codebook(), chip_len)  # host-only: no device traffic
    wave = wave[: n_sym * CHIPS_PER_SYMBOL * chip_len]
    peak = float(np.max(np.abs(wave))) or 1.0
    return (wave * (0.9 / peak)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _preamble_baseband(chip_len: int) -> np.ndarray:
    """Complex baseband template of the preamble (chips zero-order-held)."""
    cw = _codebook()[_preamble_symbols()]
    chips = (cw[:, :CHIPS_PER_SYMBOL] + 1j * cw[:, CHIPS_PER_SYMBOL:]).reshape(-1)
    return np.repeat(chips, chip_len).astype(np.complex64)


@functools.partial(jax.jit, static_argnames=("chip_len", "n_fft"))
def _demod(
    x: jnp.ndarray, codebook: jnp.ndarray, pre_bb: jnp.ndarray, chip_len: int, n_fft: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Padded samples -> (symbols per position, correlation peak index)."""
    n = jnp.arange(x.shape[0])
    z = x * jnp.exp(-2j * jnp.pi * (CARRIER / SAMPLE_RATE) * n)

    # Matched-filter timing sync: corr[k] = sum_i z[k+i] conj(pre_bb[i]).
    zf = jnp.fft.fft(z, n_fft)
    pf = jnp.fft.fft(pre_bb, n_fft)
    corr = jnp.fft.ifft(zf * jnp.conj(pf))[: x.shape[0]]
    k0 = jnp.argmax(jnp.abs(corr))
    phase = corr[k0] / (jnp.abs(corr[k0]) + 1e-12)

    # Align signal start to index 0, undo the channel/carrier phase.
    # NOT jnp.roll: a traced shift lowers to a while-loop (PERF.md rule 6)
    # and dynamic roll on complex64 hit an UNIMPLEMENTED TPU backend error;
    # concat + dynamic-slice per component is supported and ~5x cheaper.
    def _rot(v):
        doubled = jnp.concatenate([v, v])
        return jax.lax.dynamic_slice(doubled, (k0,), (v.shape[0],))

    z = (_rot(jnp.real(z)) + 1j * _rot(jnp.imag(z))) * jnp.conj(phase)

    spsym = CHIPS_PER_SYMBOL * chip_len
    max_sym = x.shape[0] // spsym
    chips = z[: max_sym * spsym].reshape(max_sym, CHIPS_PER_SYMBOL, chip_len).mean(-1)
    rx = jnp.concatenate([chips.real, chips.imag], axis=-1)  # (max_sym, 16)
    scores = rx @ codebook.T  # ML nearest-codeword: the MXU does detection
    return jnp.argmax(scores, axis=-1).astype(jnp.uint8), k0


def _demod_np(
    x: np.ndarray, codebook: np.ndarray, pre_bb: np.ndarray, chip_len: int, n_fft: int
) -> np.ndarray:
    """Host (numpy) mirror of :func:`_demod` — same math, same results."""
    n = np.arange(len(x), dtype=np.float64)
    z = x * np.exp(-2j * np.pi * (CARRIER / SAMPLE_RATE) * n)
    corr = np.fft.ifft(np.fft.fft(z, n_fft) * np.conj(np.fft.fft(pre_bb, n_fft)))[: len(x)]
    k0 = int(np.argmax(np.abs(corr)))
    phase = corr[k0] / (abs(corr[k0]) + 1e-12)
    z = np.roll(z, -k0) * np.conj(phase)
    spsym = CHIPS_PER_SYMBOL * chip_len
    max_sym = len(x) // spsym
    chips = z[: max_sym * spsym].reshape(max_sym, CHIPS_PER_SYMBOL, chip_len).mean(-1)
    rx = np.concatenate([chips.real, chips.imag], axis=-1)
    return np.argmax(rx @ codebook.T, axis=-1).astype(np.uint8)


def neural_mode_demodulate(
    samples: np.ndarray, symbol_rate: int = 1200, samp_rate: int = SAMPLE_RATE
) -> bytes:
    """NEURAL waveform -> byte stream (preamble stripped; parser finds FBPC).

    On the real TPU backend the single-capture path runs the numpy mirror
    of the demod: the jitted composite (big complex-FFT correlation +
    alignment + codebook matmul) intermittently raised UNIMPLEMENTED on the
    axon backend and could leave the device tunnel wedged for the whole
    process — a backend bug none of the constituent ops reproduce alone.
    CPU (tests, headless tools) keeps the jitted path; NEURAL throughput is
    codebook-matmul-bound either way and this path is not the batch hot
    loop.
    """
    assert samp_rate == SAMPLE_RATE, "NEURAL mode is defined at 96 kHz"
    chip_len = _chip_len(symbol_rate)
    spsym = CHIPS_PER_SYMBOL * chip_len
    x = np.asarray(samples, np.float32)
    if len(x) < (PREAMBLE_LEN + 1) * spsym:
        return b""
    n_pad = _bucket(len(x))
    x = np.pad(x, (0, n_pad - len(x)))
    pre_bb = _preamble_baseband(chip_len)
    n_fft = 1 << int(np.ceil(np.log2(n_pad + len(pre_bb))))
    if jax.default_backend() != "cpu":
        symbols = _demod_np(x, _codebook(), pre_bb, chip_len, n_fft)
        return bytes(symbols[PREAMBLE_LEN:])
    symbols, _k0 = _demod(
        jnp.asarray(x), jnp.asarray(_codebook()), jnp.asarray(pre_bb), chip_len, n_fft
    )
    return bytes(np.asarray(symbols)[PREAMBLE_LEN:])
