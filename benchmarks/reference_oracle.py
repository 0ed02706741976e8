"""Offline oracle: the reference's scipy receive chains, for BER parity runs.

These reimplement — vectorized, in numpy/scipy — the exact signal-processing
recipe of the reference's demodulators so the parity harness (ber_parity.py)
can run BOTH receivers over the same noisy captures and prove ours decodes at
least as well. Behavior sources (algorithms, constants, decision rules):

* DBPSK: /root/reference/modem.py:68-135 — Butterworth-4 bandpass
  carrier±baud, complex downconversion, Butterworth-4 LPF at baud, symbol
  sampling at stride ``fs/baud`` starting one symbol in, differential
  detection sign(Re{s[n]·conj(s[n-1])}), magic-prefix bit sync with
  offset-0 fallback.
* DQPSK: /root/reference/modem.py:189-266 — bandpass carrier±1.5·baud, LPF
  at baud, sampling offset half a symbol, differential angle quantized into
  four π/2 sectors rotated by π/4, Gray map 00/01/11/10.
* CPFSK: /root/reference/modem.py:298-341 — Butterworth-3 bandpasses at
  mark/space ±baud, Hilbert envelopes, per-sample energy comparison,
  majority vote over a ±¼-bit window at bit centers, magic sync.

This is an oracle for benchmarks only — nothing in the package imports it.
The TPU receivers live in audio_modem_radio_tpu/ops/ and share no code or
structure with this file.
"""

from __future__ import annotations

import numpy as np
from scipy import signal

MAGIC_BITS = np.unpackbits(np.frombuffer(b"FB", np.uint8))  # first 16 bits of FBPC


def _bits_to_bytes_synced(bits: np.ndarray) -> bytes:
    """Magic-prefix alignment then byte packing (reference modem.py:111-133).

    Searches the decoded bit stream for the first 16 bits of the FBPC magic;
    packs bytes from there, or from offset 0 if the magic never appears (the
    frame parser re-scans for magic at the byte level anyway).
    """
    bits = np.asarray(bits, np.uint8)
    start = 0
    if len(bits) >= 16:
        windows = np.lib.stride_tricks.sliding_window_view(bits, 16)
        hits = np.nonzero((windows == MAGIC_BITS).all(axis=1))[0]
        if len(hits):
            start = int(hits[0])
    usable = bits[start:]
    usable = usable[: len(usable) - (len(usable) % 8)]
    if len(usable) == 0:
        return b""
    return np.packbits(usable).tobytes()


def bpsk_demodulate_ref(
    samples: np.ndarray, baud: float = 1200, carrier: float = 3000.0, samp_rate: int = 96000
) -> bytes:
    """Reference DBPSK receiver (modem.py:68-135), vectorized."""
    spsym = int(samp_rate / baud)
    nyq = samp_rate / 2
    lo_c = max(0.01, (carrier - baud) / nyq)
    hi_c = min(0.99, (carrier + baud) / nyq)
    b, a = signal.butter(4, [lo_c, hi_c], btype="band")
    filtered = signal.filtfilt(b, a, np.asarray(samples, np.float64))

    t = np.arange(len(filtered)) / samp_rate
    baseband = filtered * np.exp(-2j * np.pi * carrier * t)
    b_lp, a_lp = signal.butter(4, baud / nyq, btype="low")
    baseband = signal.filtfilt(b_lp, a_lp, baseband)

    symbols = baseband[spsym::spsym]
    if len(symbols) < 2:
        return b""
    diffs = symbols[1:] * np.conj(symbols[:-1])
    bits = (np.real(diffs) < 0).astype(np.uint8)
    return _bits_to_bytes_synced(bits)


def qpsk_demodulate_ref(
    samples: np.ndarray, baud: float = 1200, carrier: float = 3000.0, samp_rate: int = 96000
) -> bytes:
    """Reference DQPSK receiver (modem.py:189-266), vectorized."""
    spsym = int(samp_rate / baud)
    nyq = samp_rate / 2
    lo_c = max(0.01, (carrier - 1.5 * baud) / nyq)
    hi_c = min(0.99, (carrier + 1.5 * baud) / nyq)
    b, a = signal.butter(4, [lo_c, hi_c], btype="band")
    filtered = signal.filtfilt(b, a, np.asarray(samples, np.float64))

    t = np.arange(len(filtered)) / samp_rate
    baseband = filtered * np.exp(-2j * np.pi * carrier * t)
    b_lp, a_lp = signal.butter(4, baud / nyq, btype="low")
    baseband = signal.filtfilt(b_lp, a_lp, baseband)

    symbols = baseband[spsym // 2 :: spsym]
    if len(symbols) < 2:
        return b""
    ang = np.angle(symbols[1:] * np.conj(symbols[:-1]))
    ang = np.where(ang < 0, ang + 2 * np.pi, ang)
    # Sector index 0..3 for centers 0, π/2, π, 3π/2 (boundaries at odd π/4).
    sector = np.floor((ang + np.pi / 4) / (np.pi / 2)).astype(np.int64) % 4
    gray = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], np.uint8)
    bits = gray[sector].reshape(-1)
    return _bits_to_bytes_synced(bits)


def fsk_demodulate_ref(
    samples: np.ndarray,
    baud: float = 1200,
    mark_freq: float = 1200.0,
    space_freq: float = 2200.0,
    samp_rate: int = 96000,
) -> bytes:
    """Reference CPFSK receiver (modem.py:298-341), vectorized."""
    spb = int(samp_rate / baud)
    nyq = samp_rate / 2
    x = np.asarray(samples, np.float64)

    def envelope(freq: float) -> np.ndarray:
        # The reference does NOT clamp these edges (modem.py:306) and raises
        # ValueError when freq - baud <= 0 — e.g. FSK1200's own default
        # mark=1200 at 1200 Bd. Clamp like its BPSK chain does (modem.py:76)
        # so the oracle can run at all; this only helps the reference.
        lo_e = max(0.01, (freq - baud) / nyq)
        hi_e = min(0.99, (freq + baud) / nyq)
        b, a = signal.butter(3, [lo_e, hi_e], btype="band")
        return np.abs(signal.hilbert(signal.filtfilt(b, a, x)))

    hard = (envelope(mark_freq) > envelope(space_freq)).astype(np.int64)

    centers = np.arange(spb // 2, len(hard), spb)
    quarter = spb // 4
    # Majority vote over the ±¼-bit window around each bit center.
    csum = np.concatenate([[0], np.cumsum(hard)])
    lo_i = np.maximum(centers - quarter, 0)
    hi_i = np.minimum(centers + quarter, len(hard))
    counts = csum[hi_i] - csum[lo_i]
    widths = np.maximum(hi_i - lo_i, 1)
    bits = (counts * 2 > widths).astype(np.uint8)
    return _bits_to_bytes_synced(bits)


RECEIVERS = {
    "BPSK": bpsk_demodulate_ref,
    "QPSK": qpsk_demodulate_ref,
    "FSK1200": lambda s, baud=1200, samp_rate=96000: fsk_demodulate_ref(
        s, baud, 1200.0, 2200.0, samp_rate
    ),
}
