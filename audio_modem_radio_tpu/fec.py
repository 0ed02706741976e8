"""Forward error correction: parity-triplet code and K=7 convolutional + Viterbi.

The reference declares FEC capability but never uses it: ``fec_enabled`` is
read by nobody, its "Reed-Solomon" is a per-2-byte XOR parity scheme, and its
Viterbi "decoder" just keeps every second bit (/root/reference/fec.py). This
module provides:

* :class:`ReedSolomonFEC` — wire-compatible with the reference's parity-triplet
  format (byte pairs + XOR parity, 0xFF pad for odd length, CRC32 trailer,
  ``0x3F`` substitution on parity mismatch; fec.py:11-69), vectorized.
* :class:`ConvolutionalEncoder` — genuine rate-1/2, K=7, polynomials
  G1=0o171 / G2=0o133 with 6-bit zero flush (fec.py:77-100), bit-for-bit
  compatible with the reference encoder including its low-bits trailing-byte
  packing quirk, implemented as array ops.
* :class:`ViterbiDecoder` — a *real* Viterbi decoder for that code, written as
  a JAX ``lax.scan`` over the 64-state trellis with vectorized
  add-compare-select, hard or soft inputs, and a device-side traceback scan.

Pipeline integration (our design; the reference had none): the encoder can wrap
the compressed payload in a tagged FEC container (``FECP``/``FECV`` + encoded
bytes) before framing. On receive, intact frames unwrap transparently, and
frames whose payload CRC *failed* can still be recovered by FEC-decoding the
damaged payload — see :func:`unwrap_fec` / ``decoder.save_decoded_files``.
"""

from __future__ import annotations

import functools
import struct
import zlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TAG_PARITY = b"FECP"
TAG_VITERBI = b"FECV"

G1 = 0o171  # 0b1111001
G2 = 0o133  # 0b1011011
K = 7
N_STATES = 1 << (K - 1)  # 64
FLUSH_BITS = K - 1  # 6


# --- parity-triplet code (reference "ReedSolomonFEC" wire format) -------------

class ReedSolomonFEC:
    """Parity-triplet code, wire-compatible with the reference (fec.py:7-69).

    Not actual Reed-Solomon — the name is kept for API parity. Each byte pair
    (a, b) transmits as (a, b, a^b); odd-length input pads with 0xFF; a CRC32
    of the original data trails the stream. On decode, a corrupted triplet is
    detected (not correctable: one parity can't locate the error) and the
    second byte is replaced by ``0x3F`` exactly as the reference does.
    """

    def __init__(self, nsym: int = 32):
        self.nsym = nsym

    def encode(self, data: bytes) -> bytes:
        arr = np.frombuffer(data, dtype=np.uint8)
        if len(arr) % 2:
            arr = np.concatenate([arr, np.asarray([0xFF], np.uint8)])
            # Reference packs the odd final byte as (byte, 0xFF) WITHOUT a
            # parity byte (fec.py:25-26); mirror that exactly.
            pairs = arr[:-2].reshape(-1, 2)
            tail = arr[-2:]
        else:
            pairs = arr.reshape(-1, 2)
            tail = np.empty(0, np.uint8)
        triplets = np.column_stack([pairs, pairs[:, 0] ^ pairs[:, 1]])
        out = np.concatenate([triplets.reshape(-1), tail])
        crc = zlib.crc32(data) & 0xFFFFFFFF
        return out.tobytes() + struct.pack("<I", crc)

    def decode(self, data: bytes) -> bytes:
        if len(data) < 4:
            return data
        crc_expected = struct.unpack("<I", data[-4:])[0]
        body = np.frombuffer(data[:-4], dtype=np.uint8)
        n_triplets = len(body) // 3
        trip = body[: n_triplets * 3].reshape(-1, 3)
        rest = body[n_triplets * 3 :]
        bad = (trip[:, 0] ^ trip[:, 1]) != trip[:, 2]
        out_pairs = trip[:, :2].copy()
        out_pairs[bad, 1] = 0x3F  # '?' substitution, like the reference
        decoded = np.concatenate([out_pairs.reshape(-1), rest]).tobytes()
        self.last_crc_ok = (zlib.crc32(decoded) & 0xFFFFFFFF) == crc_expected
        if not self.last_crc_ok and decoded.endswith(b"\xff"):
            # Odd-length input carries an 0xFF pad byte the stream format
            # cannot distinguish from data; the CRC trailer can.
            stripped = decoded[:-1]
            if (zlib.crc32(stripped) & 0xFFFFFFFF) == crc_expected:
                self.last_crc_ok = True
                return stripped
        return decoded


# --- convolutional encoder ----------------------------------------------------

def _popcount_parity(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    count = np.zeros_like(x)
    for _ in range(K):
        count ^= x & 1
        x >>= 1
    return count.astype(np.uint8)


def _pack_bits_ref_style(bits: np.ndarray) -> bytes:
    """MSB-first byte packing; a trailing partial byte keeps its bits in the
    LOW positions (quirk of the reference's bit loop, fec.py:103-109)."""
    n_full = (len(bits) // 8) * 8
    out = np.packbits(bits[:n_full]).tobytes()
    rem = bits[n_full:]
    if len(rem):
        val = 0
        for b in rem:
            val = (val << 1) | int(b)
        out += bytes([val])
    return out


def _unpack_bits_ref_style(data: bytes, n_bits: int) -> np.ndarray:
    """Inverse of :func:`_pack_bits_ref_style` for a known bit count."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n_full_bytes = n_bits // 8
    bits = np.unpackbits(arr[:n_full_bytes])
    rem = n_bits - n_full_bytes * 8
    if rem:
        last = int(arr[n_full_bytes])
        tail = [(last >> (rem - 1 - i)) & 1 for i in range(rem)]
        bits = np.concatenate([bits, np.asarray(tail, np.uint8)])
    return bits


class ConvolutionalEncoder:
    """Rate-1/2, K=7 convolutional encoder (G1=0o171, G2=0o133, zero flush)."""

    def __init__(self, constraint_length: int = K):
        self.constraint_length = constraint_length
        self.g1, self.g2 = G1, G2

    def encode_bits(self, bits: np.ndarray) -> np.ndarray:
        """(T,) input bits -> (T+6, 2) output bit pairs, including flush.

        ``parity(reg & G)`` is the XOR of the register bits at G's set tap
        positions, so each output stream is <= K shifted-array XORs — no
        (T, K) register window is ever materialized (the windowed form
        dominated multi-MB header-recovery re-encodes at ~5 s/2 MB;
        decoder.py rung 2).
        """
        bits = np.concatenate([bits.astype(np.uint8), np.zeros(FLUSH_BITS, np.uint8)])
        # Register after consuming bit t holds bits [t-6..t], newest in LSB:
        # register bit p is the input bit from p steps back.
        padded = np.concatenate([np.zeros(K - 1, np.uint8), bits])
        T = len(bits)

        def taps_xor(g: int) -> np.ndarray:
            acc = np.zeros(T, np.uint8)
            for p in range(K):
                if (g >> p) & 1:
                    acc ^= padded[K - 1 - p : K - 1 - p + T]
            return acc

        return np.stack([taps_xor(G1), taps_xor(G2)], axis=1)

    def encode(self, data: bytes) -> bytes:
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        pairs = self.encode_bits(bits)
        return _pack_bits_ref_style(pairs.reshape(-1))


# --- Viterbi decoder (JAX trellis scan) ---------------------------------------

@functools.lru_cache(maxsize=1)
def _trellis_tables() -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Predecessor indices and expected output pairs for each new state.

    For new state s: input bit b = s & 1; predecessors p0 = s >> 1 and
    p1 = (s >> 1) | 32; the transition register is (p << 1) | b.
    """
    s = np.arange(N_STATES)
    b = s & 1
    p0 = s >> 1
    p1 = p0 | (N_STATES >> 1)
    reg0 = (p0 << 1) | b
    reg1 = (p1 << 1) | b
    exp0 = np.stack([_popcount_parity(reg0 & G1), _popcount_parity(reg0 & G2)], axis=1)
    exp1 = np.stack([_popcount_parity(reg1 & G1), _popcount_parity(reg1 & G2)], axis=1)
    return p0.astype(np.int32), p1.astype(np.int32), exp0.astype(np.float32), exp1.astype(np.float32)


# Block-parallel Viterbi geometry: blocks of CORE trellis steps decode
# independently (vmapped) with OV-step warmup/cooldown on each side; K=7
# survivor paths merge within ~5K steps, so 512 is a deep safety margin.
_VIT_CORE = 1 << 13
_VIT_OV = 512


def _viterbi_block(pairs: jnp.ndarray, pm0: jnp.ndarray, from_best_end: bool) -> jnp.ndarray:
    """One sequential Viterbi pass: (T, 2) pairs + start metrics -> (T,) bits."""
    p0, p1, exp0, exp1 = (jnp.asarray(t) for t in _trellis_tables())

    def step(pm, r):
        bm0 = jnp.abs(r[None, :] - exp0).sum(axis=1)  # (64,)
        bm1 = jnp.abs(r[None, :] - exp1).sum(axis=1)
        cand0 = pm[p0] + bm0
        cand1 = pm[p1] + bm1
        choose1 = cand1 < cand0
        pm_new = jnp.where(choose1, cand1, cand0)
        pm_new = pm_new - pm_new.min()  # normalize to keep metrics bounded
        return pm_new, choose1

    pm, decisions = jax.lax.scan(step, pm0, pairs.astype(jnp.float32))

    def back(state, choice_t):
        bit = state & 1
        pred = jnp.where(choice_t[state], (state >> 1) | (N_STATES >> 1), state >> 1)
        return pred, bit

    end_state = jnp.argmin(pm).astype(jnp.int32) if from_best_end else jnp.int32(0)
    _, bits_rev = jax.lax.scan(back, end_state, decisions, reverse=True)
    return bits_rev.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("known_boundaries",))
def viterbi_decode_bits(
    pairs: jnp.ndarray, known_boundaries: bool = True
) -> jnp.ndarray:
    """Maximum-likelihood decode of (T, 2) received bit pairs -> (T,) bits.

    ``pairs`` may be hard bits {0,1} or soft values in [0,1]; the branch
    metric is the L1 distance to each transition's expected output. The
    forward pass is a ``lax.scan`` of vectorized add-compare-select over all
    64 states; the traceback is a reverse scan over the stored decisions.

    ``known_boundaries=True`` assumes the encoder starts and (after flushing)
    ends in state 0 — the framed-container case. ``False`` uses a uniform
    start metric and tracebacks from the best end state, for decoding a
    coded segment embedded mid-stream (stream FEC): the Viterbi
    self-synchronizes within a few constraint lengths on each side.

    Long streams (> ~9k steps — e.g. stream-FEC captures, where T is the
    whole capture's bit count) run BLOCK-PARALLEL: overlapping blocks decode
    independently under ``vmap`` (warmup/cooldown of ``_VIT_OV`` steps on
    each side, uninformative 0.5 padding outside the stream) and only the
    converged cores are kept — the scan length drops from T to
    ``_VIT_CORE + 2*_VIT_OV`` regardless of capture size.
    """
    T = pairs.shape[0]
    if T <= _VIT_CORE + 2 * _VIT_OV:
        big = jnp.float32(1e9)
        if known_boundaries:
            pm0 = jnp.full((N_STATES,), big).at[0].set(0.0)
        else:
            pm0 = jnp.zeros((N_STATES,))
        return _viterbi_block(pairs, pm0, from_best_end=not known_boundaries)

    core, ov = _VIT_CORE, _VIT_OV
    n_blocks = -(-T // core)
    # 0.5 is the uninformative soft value: every branch metric equals 1, so
    # pad steps leave path ordering unchanged (all paths gain equally).
    padded = jnp.pad(
        pairs.astype(jnp.float32),
        ((ov, n_blocks * core - T + ov), (0, 0)),
        constant_values=0.5,
    )
    # One gather builds every overlapping block — an unrolled dynamic-slice
    # loop traced O(n_blocks) ops, which made multi-Mbit captures (hundreds
    # of blocks; a 5-minute QPSK@9600 stream is ~350) slow to even trace.
    idx = np.arange(core + 2 * ov)[None, :] + core * np.arange(n_blocks)[:, None]
    blocks = padded[jnp.asarray(idx)]  # (n_blocks, core+2ov, 2)
    pm0 = jnp.zeros((N_STATES,))
    bits_blocks = jax.vmap(lambda p: _viterbi_block(p, pm0, from_best_end=True))(blocks)
    return bits_blocks[:, ov : ov + core].reshape(-1)[:T]


class ViterbiDecoder:
    """True Viterbi decoder for the K=7 rate-1/2 code above."""

    def __init__(self, constraint_length: int = K):
        self.constraint_length = constraint_length
        self.g1, self.g2 = G1, G2

    def decode_pairs(self, pairs: np.ndarray) -> np.ndarray:
        """(T, 2) bit pairs (hard or soft) -> (T - 6,) data bits.

        Long inputs route through the native C++ ACS sweep when available
        (native.viterbi_decode_pairs) — one exact full-length pass, >100x
        the 64-state JAX trellis scan on multi-Mbit spans (the scan leaves
        the accelerator idle at 64 lanes; this is what lets the
        header-recovery span cap sit at 4 MB, decoder.py). Short inputs
        keep the already-jitted JAX path; both implement the identical
        metric/tiebreak, so the seam is placement, not behavior.
        """
        if pairs.shape[0] > _VIT_CORE + 2 * _VIT_OV:
            from . import native

            decoded_n = native.viterbi_decode_pairs(
                np.asarray(pairs), known_boundaries=True
            )
            if decoded_n is not None:
                return decoded_n[: max(0, len(decoded_n) - FLUSH_BITS)]
        decoded = np.asarray(viterbi_decode_bits(jnp.asarray(pairs, jnp.float32)))
        return decoded[: max(0, len(decoded) - FLUSH_BITS)]

    def decode(self, data: bytes, n_data_bytes: Optional[int] = None) -> bytes:
        """Decode a byte stream produced by :meth:`ConvolutionalEncoder.encode`.

        The encoded stream for n data bytes is exactly 2n+2 bytes
        (16n+12 bits); ``n_data_bytes`` overrides the inferred length when the
        stream was truncated or padded in transit.
        """
        if n_data_bytes is None:
            n_data_bytes = max(0, (len(data) - 2) // 2)
        n_bits = 16 * n_data_bytes + 2 * FLUSH_BITS
        if len(data) * 8 < n_bits:
            n_data_bytes = max(0, (len(data) * 8 - 2 * FLUSH_BITS) // 16)
            n_bits = 16 * n_data_bytes + 2 * FLUSH_BITS
        pairs = _unpack_bits_ref_style(data, n_bits).reshape(-1, 2)
        bits = self.decode_pairs(pairs)[: n_data_bytes * 8]
        return np.packbits(bits).tobytes()


# --- pipeline container layer -------------------------------------------------

def wrap_fec(payload: bytes, fec_type: str) -> bytes:
    """Wrap a payload in a tagged FEC container ('reed_solomon'|'convolutional')."""
    if fec_type == "convolutional":
        return TAG_VITERBI + ConvolutionalEncoder().encode(payload)
    return TAG_PARITY + ReedSolomonFEC().encode(payload)


def unwrap_fec(blob: bytes) -> Optional[bytes]:
    """Decode a tagged FEC container; None if the tag is absent."""
    if blob.startswith(TAG_VITERBI):
        return ViterbiDecoder().decode(blob[4:])
    if blob.startswith(TAG_PARITY):
        return ReedSolomonFEC().decode(blob[4:])
    return None


# --- stream-level FEC -----------------------------------------------------------

def stream_fec_encode(framed: bytes) -> bytes:
    """Convolutionally encode an ENTIRE framed transmission (rate 1/2).

    Unlike the payload container (wrap_fec), this protects the frame header,
    magic, and CRCs too — the payload-only container leaves ~30 header bytes
    unprotected, and at low SNR those kill half the otherwise-recoverable
    frames. The coded stream carries no plaintext magic, so receivers must
    know stream FEC is in use (an explicit config, like mode/rate).
    """
    bits = np.unpackbits(np.frombuffer(framed, np.uint8))
    pairs = ConvolutionalEncoder().encode_bits(bits)  # (T+6, 2)
    # A plaintext sync magic leads the coded stream: the demodulators'
    # magic-pattern sync then locks HERE and hands back a byte-aligned
    # stream. Without it, the sync can false-fire on random coded bits
    # (p ~ n/2^16 per capture, 8x under the rotation retry) and truncate
    # everything before the spurious match.
    return b"FBPC" + np.packbits(pairs.reshape(-1)).tobytes()


def stream_fec_decode(raw: bytes, max_bits: Optional[int] = None) -> bytes:
    """Viterbi-decode a demodulated byte stream that carries stream FEC.

    The demodulator's magic sync cannot fire on a coded stream (no plaintext
    magic), so ``raw`` is the offset-0 packing of the received bits. The
    code-symbol pairing phase is unknown (one bit of ambiguity); both phases
    are decoded with free boundaries (the Viterbi self-synchronizes past any
    leading garbage) and the phase whose output contains the frame magic
    wins. Returns the decoded byte stream for the ordinary frame parser.

    ``max_bits`` optionally caps the decoded span per segment; the default is
    UNBOUNDED — the block-parallel Viterbi's scan length is independent of
    capture size, so a 5-minute 96 kHz capture (~5.8 Mbit of coded stream)
    decodes whole. (Earlier rounds capped at 2^22 bits, silently truncating
    exactly the long transmissions stream FEC exists to protect.)
    """
    # The coded stream leads with a plaintext sync magic per transmission
    # (see encode). A capture can hold SEVERAL back-to-back transmissions
    # (e.g. multi-part recordings), so decode each marker-delimited segment
    # independently and concatenate — running the Viterbi across a segment
    # boundary would corrupt the next frame's head during resync. (A random
    # plaintext 'FBPC' inside coded bytes would split a segment; at
    # ~len/2^32 per capture that is negligible.)
    marks = []
    j = raw.find(b"FBPC")
    while j >= 0:
        marks.append(j)
        j = raw.find(b"FBPC", j + 4)
    if len(marks) > 1 or (len(marks) == 1 and marks[0] > 0):
        out = b""
        bounds = marks + [len(raw)]
        for a, b in zip(marks, bounds[1:]):
            out += _stream_fec_decode_segment(raw[a + 4 : b], max_bits)
        return out
    if marks:
        raw = raw[4:]
    return _stream_fec_decode_segment(raw, max_bits)


def stream_fec_decode_soft(soft_bits: np.ndarray, max_bits: Optional[int] = None) -> bytes:
    """Soft-decision stream FEC decode from a [0,1] soft bit stream.

    ~2 dB better than hard decisions at the same SNR (the Viterbi's L1
    branch metric uses the confidence directly). The stream is located by
    hard-thresholding a copy and finding the plaintext sync magic at the bit
    level; the SOFT values from there feed the decoder. Single-segment: the
    decoder's hard byte path remains the multi-segment workhorse, with this
    as the low-SNR escalation.
    """
    soft = np.asarray(soft_bits, np.float32)
    if max_bits is not None:
        soft = soft[:max_bits]
    hard = (soft > 0.5).astype(np.uint8)
    magic = np.unpackbits(np.frombuffer(b"FBPC", np.uint8))
    start = 0
    if len(hard) > len(magic):
        win = np.lib.stride_tricks.sliding_window_view(hard, len(magic))
        hits = np.nonzero((win == magic).all(axis=1))[0]
        if len(hits):
            start = int(hits[0]) + len(magic)  # skip the plaintext sync
    return _decode_bit_stream(soft[start:], max_bits)


def _stream_fec_decode_segment(raw: bytes, max_bits: Optional[int]) -> bytes:
    """Viterbi-decode one coded segment (both pair phases, bit-aligned)."""
    if max_bits is not None:
        raw = raw[: max_bits // 8]
    bits = np.unpackbits(np.frombuffer(raw, np.uint8))
    return _decode_bit_stream(bits, max_bits)


def _decode_bit_stream(bits: np.ndarray, max_bits: Optional[int]) -> bytes:
    """Shared hard/soft segment decoder: both pair phases, free boundaries,
    bit-level frame-magic alignment in the decoded output."""
    magic = np.unpackbits(np.frombuffer(b"FBPC", np.uint8))
    best = b""
    for phase in (0, 1):
        usable = bits[phase:]
        usable = usable[: (len(usable) // 2) * 2]
        if len(usable) < 64:
            continue
        pairs = jnp.asarray(usable.reshape(-1, 2), jnp.float32)
        decoded = np.asarray(viterbi_decode_bits(pairs, known_boundaries=False))
        # The frame can sit at ANY bit offset of the decoded stream (leading
        # channel garbage shifts it); align on the magic at the bit level.
        start = 0
        if len(decoded) >= len(magic):
            win = np.lib.stride_tricks.sliding_window_view(decoded, len(magic))
            hits = np.nonzero((win == magic).all(axis=1))[0]
            if len(hits):
                start = int(hits[0])
        aligned = decoded[start:]
        out = np.packbits(aligned[: (len(aligned) // 8) * 8]).tobytes()
        if out.startswith(b"FBPC"):
            return out
        if phase == 0:
            best = out
    return best
