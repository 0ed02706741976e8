"""Fused relabel+pack Pallas kernel vs the XLA relabel_shift_pack path.

The kernel applies the sync shift only mod 8 bits (the parser's magic scan
absorbs the byte-granular remainder), so its byte stream equals the XLA
stream offset by s // 8 bytes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_modem_radio_tpu.ops.common import relabel_shift_pack
from audio_modem_radio_tpu.ops.pallas_kernels import relabel_pack_batch


@pytest.mark.parametrize("seed", [0, 1])
def test_relabel_pack_matches_xla(seed, rng):
    b, r = 3, 256  # (B, rows) -> 256*128 dibits per capture
    m = r * 128
    rng = np.random.default_rng(seed)
    hi = rng.integers(0, 2, (b, r, 128), dtype=np.uint8)
    lo = rng.integers(0, 2, (b, r, 128), dtype=np.uint8)
    # Exercise every dibit shift, both parities, all rotations.
    s = np.asarray([seed * 7 + 1, 8 + 2 * seed, 1027], np.int32)
    ksel = np.asarray([seed, (seed + 1) % 4, 3], np.int32)

    packed = np.asarray(
        relabel_pack_batch(
            jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(s), jnp.asarray(ksel),
            rows_per_capture=r, interpret=True,
        )
    )  # (b, r*32)

    for i in range(b):
        ref, n_valid = relabel_shift_pack(
            jnp.asarray(hi[i].reshape(-1)), jnp.asarray(lo[i].reshape(-1)),
            jnp.asarray(s[i]), jnp.asarray(ksel[i]),
        )
        ref = np.asarray(ref)[: int(n_valid)]
        off = int(s[i]) // 8
        got = packed[i][off : off + len(ref)]
        # The last byte of the kernel stream may read past the capture
        # (clamped next-block); compare the overlap minus one byte of slack.
        L = min(len(ref), len(got)) - 1
        assert L > 1000
        assert np.array_equal(got[:L], ref[:L]), f"capture {i}"


@pytest.mark.parametrize("hyp", [0, 1, 2, 3])
def test_bpsk_match_and_pack(hyp, rng):
    """BPSK family: matcher finds the winning hypothesis and the select+pack
    kernel byte stream equals pack_bits_from on the recovered stream."""
    from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN
    from audio_modem_radio_tpu.ops.common import pack_bits_from
    from audio_modem_radio_tpu.ops.pallas_kernels import (
        bit_select_pack_batch, rotation_match_batch,
    )

    r = 256
    m = r * 128
    rng = np.random.default_rng(40 + hyp)
    true_bits = rng.integers(0, 2, m, dtype=np.uint8)
    start = 1000 + hyp * 3  # embed the magic at a known position
    pat = np.asarray([int(c) for c in MAGIC_BIT_PATTERN], np.uint8)
    true_bits[start : start + len(pat)] = pat
    # Build (re, im) so that hypothesis `hyp` recovers true_bits.
    other = rng.integers(0, 2, m, dtype=np.uint8)
    stream = true_bits if hyp < 2 else true_bits ^ 1
    re = stream if hyp % 2 == 0 else other
    im = stream if hyp % 2 == 1 else other
    # Kill accidental magic in the decoy stream (and its complement).
    for p in (pat, pat ^ 1):
        win = np.lib.stride_tricks.sliding_window_view(other, len(p))
        for idx in np.nonzero((win == p).all(axis=1))[0]:
            other[idx] ^= 1

    first, found = rotation_match_batch(
        jnp.asarray(re.reshape(1, r, 128)), jnp.asarray(im.reshape(1, r, 128)),
        MAGIC_BIT_PATTERN, r, family="bpsk", interpret=True,
    )
    assert bool(np.asarray(found)[0, hyp])
    assert int(np.asarray(first)[0, hyp]) == start

    packed = bit_select_pack_batch(
        jnp.asarray(re.reshape(1, r, 128)), jnp.asarray(im.reshape(1, r, 128)),
        jnp.asarray([start], np.int32), jnp.asarray([hyp], np.int32),
        rows_per_capture=r, interpret=True,
    )
    ref, n_valid = pack_bits_from(jnp.asarray(true_bits), jnp.asarray(start))
    ref = np.asarray(ref)[: int(n_valid)]
    got = np.asarray(packed[0])[start // 8 :]
    L = min(len(ref), len(got)) - 1
    assert L > 1000 and np.array_equal(got[:L], ref[:L])


@pytest.mark.parametrize("mode,n_psk", [("QPSK", 4), ("BPSK", 2)])
@pytest.mark.parametrize("cfo_retry", [True, False])
@pytest.mark.parametrize("pack_variant", ["shift", "weights"])
def test_production_kernel_sync_tail_wiring(mode, n_psk, cfo_retry, pack_variant, rng):
    """The EXACT production kernel-branch wiring (matcher -> ksel/s
    derivation -> fused pack kernel), executed in interpret mode — the
    backend gate otherwise keeps this code TPU-only and out of CI."""
    from audio_modem_radio_tpu.framing import crc32, pack_frame, parse_frames
    from audio_modem_radio_tpu.modem import modulate
    from audio_modem_radio_tpu.ops.psk import psk_decision_streams_batch
    from audio_modem_radio_tpu.parallel.batch import (
        psk2_kernel_sync_tail, psk4_kernel_sync_tail,
    )

    rng = np.random.default_rng(17)
    payload = rng.integers(0, 256, 1500, dtype=np.uint8).tobytes()
    framed = pack_frame("w.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(modulate(mode, framed, 9600), np.float32)
    n = 1 << int(np.ceil(np.log2(len(wave))))
    batch = np.zeros((2, n), np.float32)
    batch[:, : len(wave)] = wave

    hi, lo = psk_decision_streams_batch(
        jnp.asarray(batch), 9600.0, 3000.0, 96000, n_psk, cfo_retry
    )
    target = -(-hi.shape[1] // (128 * 256)) * (128 * 256)
    if target != hi.shape[1]:
        hi = jnp.pad(hi, ((0, 0), (0, target - hi.shape[1])))
        lo = jnp.pad(lo, ((0, 0), (0, target - lo.shape[1])))
    tail = psk4_kernel_sync_tail if n_psk == 4 else psk2_kernel_sync_tail
    packed, n_valid, found = tail(
        hi, lo, cfo_retry, interpret=True, pack_variant=pack_variant
    )
    assert bool(np.asarray(found).all())
    for i in range(2):
        raw = np.asarray(packed[i])[: int(n_valid[i])].tobytes()
        frames = parse_frames(raw)
        assert frames and frames[0].data == payload


@pytest.mark.parametrize("mode,n_sub", [("OFDM4", 4), ("OFDM8", 8)])
def test_ofdm_kernel_sync_tail_wiring(mode, n_sub, rng):
    """Round 3: OFDM dual dibit streams through the SAME Pallas sync tail as
    DQPSK (matcher + fused relabel/pack), interpret mode — including the
    zero-pad up to the kernels' 128*256 dibit granularity that the production
    branch applies."""
    from audio_modem_radio_tpu.framing import crc32, pack_frame, parse_frames
    from audio_modem_radio_tpu.modem import modulate
    from audio_modem_radio_tpu.ops.ofdm import ofdm_decision_streams_batch
    from audio_modem_radio_tpu.parallel.batch import psk4_kernel_sync_tail

    rng = np.random.default_rng(23)
    payload = rng.integers(0, 256, 1200, dtype=np.uint8).tobytes()
    framed = pack_frame("o.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(modulate(mode, framed, 9600), np.float32)
    n = 1 << int(np.ceil(np.log2(len(wave))))
    batch = np.zeros((2, n), np.float32)
    batch[:, : len(wave)] = wave

    hi, lo = ofdm_decision_streams_batch(
        jnp.asarray(batch), 9600.0, 12000.0, n_sub, 96000
    )
    pad = (-hi.shape[1]) % (128 * 256)
    if pad:
        hi = jnp.pad(hi, ((0, 0), (0, pad)))
        lo = jnp.pad(lo, ((0, 0), (0, pad)))
    packed, n_valid, found = psk4_kernel_sync_tail(hi, lo, True, interpret=True)
    assert bool(np.asarray(found).all())
    for i in range(2):
        raw = np.asarray(packed[i])[: int(n_valid[i])].tobytes()
        frames = parse_frames(raw)
        assert frames and frames[0].data == payload


def test_fsk_batch_matches_vmap(rng):
    """fsk_demod_bits_batch (XLA fallback) == vmapped single-capture bits,
    and the Pallas kernel (interpret) == the XLA pass-2."""
    from audio_modem_radio_tpu.framing import crc32, pack_frame
    from audio_modem_radio_tpu.modem import modulate
    from audio_modem_radio_tpu.ops.fsk import (
        _fsk_blocked_templates, _fsk_geometry, _samples_per_bit,
        fsk_demod_bits, fsk_demod_bits_batch,
    )
    from audio_modem_radio_tpu.ops.pallas_kernels import fsk_project_bits_batch

    rng = np.random.default_rng(3)
    payload = rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
    framed = pack_frame("f.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(modulate("FSK1200", framed, 1200), np.float32)
    n = (len(wave) // 1280 + 2) * 1280
    batch = np.zeros((2, n), np.float32)
    batch[0, : len(wave)] = wave
    batch[1, 777 : 777 + len(wave)] = wave  # shifted capture

    bits_b = np.asarray(fsk_demod_bits_batch(jnp.asarray(batch), 1200.0, 1200.0, 2200.0, 96000))
    bits_v = np.asarray(
        jax.vmap(
            lambda x: fsk_demod_bits(x, 1200.0, 1200.0, 2200.0, 96000, mlse=False)[0]
        )(jnp.asarray(batch))
    )
    n_sig = len(wave) // _samples_per_bit(96000, 1200)
    assert np.array_equal(bits_b[0, :n_sig], bits_v[0, :n_sig])
    assert np.mean(bits_b[1, : bits_v.shape[1]] != bits_v[1]) < 0.01  # offset grid differs at pad tail

    # Kernel (interpret) vs the XLA einsum pass-2 inside the batch path.
    spb = _samples_per_bit(96000, 1200)
    spr, row, ov = _fsk_geometry(spb)
    n_bits = n // spb
    r = max(256, -(-(-(-n_bits // spr)) // 256) * 256)
    x3d = jnp.pad(
        jnp.asarray(batch[:, : n_bits * spb]), ((0, 0), (0, r * row - n_bits * spb))
    ).reshape(2, r, row)
    W = jnp.asarray(_fsk_blocked_templates(spb, 1200.0, 2200.0, 96000, 8))
    best = jnp.zeros((2,), jnp.int32)
    bits_k = np.asarray(
        fsk_project_bits_batch(x3d, W, best, rows_per_capture=r, spr=spr, interpret=True)
    )
    x_next = jnp.concatenate([x3d[:, 1:, :ov], jnp.zeros((2, 1, ov), jnp.float32)], axis=1)
    xov = jnp.concatenate([x3d, x_next], axis=2)
    pj2 = jnp.einsum("brc,bck->brk", xov, W[best]).reshape(2, r, 4, spr)
    margin = (pj2[:, :, 0] ** 2 + pj2[:, :, 1] ** 2) - (pj2[:, :, 2] ** 2 + pj2[:, :, 3] ** 2)
    bits_x = np.asarray((margin > 0).astype(jnp.uint8).reshape(2, r * spr))
    sig = n_bits - spr  # last row's overlap tail differs only in pad garbage
    assert np.array_equal(bits_k[:, :sig], bits_x[:, :sig])


def test_fsk_batch_e2e_decode(tmp_path, rng):
    """decode_wav_batch FSK1200 through the batched path round-trips."""
    from audio_modem_radio_tpu.assembly import AssemblyRegistry
    from audio_modem_radio_tpu.encoder import encode_file
    from audio_modem_radio_tpu.parallel.batch import decode_wav_batch

    rng = np.random.default_rng(8)
    payload = rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()
    src = tmp_path / "x.bin"
    src.write_bytes(payload)
    wav = encode_file(str(src), mode="FSK1200", symbol_rate=1200)
    reg = AssemblyRegistry()
    res = decode_wav_batch([wav], "FSK1200", 1200, recv_dir=str(tmp_path / "recv"), registry=reg)
    saved = [p for r in res for p in r]
    assert saved and open(saved[0], "rb").read() == payload


def test_relabel_pack_decodes_frame(rng):
    """End-to-end: decision lanes -> match -> kernel pack -> parse."""
    from audio_modem_radio_tpu.framing import (
        MAGIC_BIT_PATTERN, crc32, pack_frame, parse_frames,
    )
    from audio_modem_radio_tpu.modem import modulate
    from audio_modem_radio_tpu.ops.psk import psk_decision_streams_batch

    rng = np.random.default_rng(5)
    payload = rng.integers(0, 256, 2048, dtype=np.uint8).tobytes()
    framed = pack_frame("k.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(modulate("QPSK", framed, 9600), np.float32)
    n = 1 << int(np.ceil(np.log2(len(wave))))
    batch = np.zeros((2, n), np.float32)
    batch[:, : len(wave)] = wave

    hi, lo = psk_decision_streams_batch(jnp.asarray(batch), 9600.0, 3000.0, 96000, 4, True)
    b = hi.shape[0]
    n_dib = hi.shape[1]
    target = -(-n_dib // (128 * 256)) * (128 * 256)
    if target != n_dib:
        hi = jnp.pad(hi, ((0, 0), (0, target - n_dib)))
        lo = jnp.pad(lo, ((0, 0), (0, target - n_dib)))
    r_dib = target // 128
    # Reference sync for (s, ksel): the XLA rotation matcher.
    from audio_modem_radio_tpu.ops.common import dibit_sync_and_pack_rotations

    _, _, found = jax.vmap(
        lambda h, l: dibit_sync_and_pack_rotations(h, l, MAGIC_BIT_PATTERN)
    )(hi, lo)
    assert bool(np.asarray(found).all())
    # Recompute (s, ksel) the way the production matcher tail does.
    from audio_modem_radio_tpu.ops.common import _rotate_dibit_pattern, find_bit_pattern

    ss, ks = [], []
    for i in range(b):
        got = None
        for k in range(4):
            pat = _rotate_dibit_pattern(MAGIC_BIT_PATTERN, k)
            inter = np.empty(2 * hi.shape[1], np.uint8)
            inter[0::2] = np.asarray(hi[i])
            inter[1::2] = np.asarray(lo[i])
            idx, fnd = find_bit_pattern(jnp.asarray(inter), pat)
            if bool(fnd):
                got = (int(idx), k)
                break
        assert got is not None
        ss.append(got[0])
        ks.append(got[1])

    packed = relabel_pack_batch(
        hi.reshape(b, r_dib, 128), lo.reshape(b, r_dib, 128),
        jnp.asarray(ss, jnp.int32), jnp.asarray(ks, jnp.int32),
        rows_per_capture=r_dib, interpret=True,
    )
    for i in range(b):
        raw = np.asarray(packed[i]).tobytes()
        frames = parse_frames(raw)
        assert frames and frames[0].data == payload

@pytest.mark.parametrize("placement", ["tier1", "tier2", "late"])
def test_psk4_tiered_prefix_equals_full(placement, rng, monkeypatch):
    """With r_dib large enough for two prefix tiers (256 and r/8 rows), a
    magic landing in each region — and past both — still yields exactly the
    full scan's (s, ksel, found)."""
    import audio_modem_radio_tpu.parallel.batch as batch_mod
    from audio_modem_radio_tpu.parallel.batch import psk4_kernel_sync_tail

    b, r = 2, 4096  # tiers: [256, 512]
    m = r * 128
    rng = np.random.default_rng(7 + len(placement))
    hi = np.zeros((b, m), dtype=np.uint8)
    lo = np.zeros((b, m), dtype=np.uint8)
    t1, t2 = 256 * 128, 512 * 128
    pos = {"tier1": 100, "tier2": t1 + 50, "late": t2 + 1234}[placement]
    for i in range(b):
        _embed_qpsk_magic(hi[i], lo[i], pos + i)

    hj, lj = jnp.asarray(hi), jnp.asarray(lo)
    got = psk4_kernel_sync_tail(hj, lj, True, interpret=True)
    monkeypatch.setattr(batch_mod, "_MATCH_BLOCK_ROWS", 1 << 20)  # full scan
    ref = psk4_kernel_sync_tail(hj, lj, True, interpret=True)
    for g, r_ in zip(got, ref):
        assert np.array_equal(np.asarray(g), np.asarray(r_))
    assert bool(np.asarray(got[2]).all())


# --- shifted-weights pack variant (round 3) -------------------------------------


def test_relabel_pack_weights_variant_bitwise_equal(rng):
    """variant="weights" (per-shift pack tables via the scalar-prefetch
    index_map) == variant="shift" (lane-rolled stream variants), bitwise,
    across every (bit shift, rotation) combination. Byte sums are exact
    power-of-two sums < 256, so equality is guaranteed, not probabilistic."""
    b, r = 32, 256
    rng = np.random.default_rng(99)
    hi = rng.integers(0, 2, (b, r, 128), dtype=np.uint8)
    lo = rng.integers(0, 2, (b, r, 128), dtype=np.uint8)
    # All 8 bit shifts x all 4 rotations.
    s = np.asarray([(i % 8) + 8 * (i // 8) for i in range(b)], np.int32)
    ksel = np.asarray([i // 8 for i in range(b)], np.int32)

    a = relabel_pack_batch(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(s), jnp.asarray(ksel),
        rows_per_capture=r, interpret=True,
    )
    w = relabel_pack_batch(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(s), jnp.asarray(ksel),
        rows_per_capture=r, interpret=True, variant="weights",
    )
    assert np.array_equal(np.asarray(a), np.asarray(w))


def test_bit_select_pack_weights_variant_bitwise_equal(rng):
    from audio_modem_radio_tpu.ops.pallas_kernels import bit_select_pack_batch

    b, r = 32, 256
    rng = np.random.default_rng(98)
    re = rng.integers(0, 2, (b, r, 128), dtype=np.uint8)
    im = rng.integers(0, 2, (b, r, 128), dtype=np.uint8)
    # All 8 bit shifts x all 4 hypotheses (re/im x inverted).
    s = np.asarray([i % 8 for i in range(b)], np.int32)
    ksel = np.asarray([i // 8 for i in range(b)], np.int32)

    a = bit_select_pack_batch(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(s), jnp.asarray(ksel),
        rows_per_capture=r, interpret=True,
    )
    w = bit_select_pack_batch(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(s), jnp.asarray(ksel),
        rows_per_capture=r, interpret=True, variant="weights",
    )
    assert np.array_equal(np.asarray(a), np.asarray(w))


# --- prefix-scan escalation (round 3) -----------------------------------------


def _embed_qpsk_magic(hi, lo, t0):
    """Write the validated magic (pattern + follow-up) at even-parity dibit
    position t0 for the k=0 hypothesis: hi[t]=p[2t], lo[t]=p[2t+1]."""
    from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN, MAGIC_BIT_PATTERN2

    p = [int(c) for c in MAGIC_BIT_PATTERN + MAGIC_BIT_PATTERN2]
    for t in range(len(p) // 2):
        hi[t0 + t] = p[2 * t]
        lo[t0 + t] = p[2 * t + 1]


@pytest.mark.parametrize("placement", ["early", "late", "mixed", "absent"])
def test_psk4_prefix_scan_equals_full(placement, rng, monkeypatch):
    """The prefix-scan accept rule guarantees (s, ksel, found) equality with
    the full scan for ANY input; late/absent magics force the escalation
    branch. Compared against the same tail with the prefix disabled."""
    import audio_modem_radio_tpu.parallel.batch as batch_mod
    from audio_modem_radio_tpu.parallel.batch import psk4_kernel_sync_tail

    b, r = 2, 512  # r_pre = 256 -> prefix enabled (2 * r_pre <= r)
    m = r * 128
    rng = np.random.default_rng(hash(placement) % 2**31)
    hi = rng.integers(0, 2, (b, m), dtype=np.uint8)
    lo = rng.integers(0, 2, (b, m), dtype=np.uint8)
    prefix_dibits = 256 * 128
    if placement == "early":
        for i in range(b):
            _embed_qpsk_magic(hi[i], lo[i], 10 + 3 * i)
    elif placement == "late":
        # No k=0 match can exist in an all-zero prefix (the magic has 1s).
        hi[:, :prefix_dibits] = 0
        lo[:, :prefix_dibits] = 0
        for i in range(b):
            _embed_qpsk_magic(hi[i], lo[i], prefix_dibits + 1000 + i)
    elif placement == "mixed":
        _embed_qpsk_magic(hi[0], lo[0], 17)
        hi[1, :prefix_dibits] = 0
        lo[1, :prefix_dibits] = 0
        _embed_qpsk_magic(hi[1], lo[1], prefix_dibits + 555)
    else:  # absent: nothing embedded; zero prefix keeps hit=False
        hi[:, :prefix_dibits] = 0
        lo[:, :prefix_dibits] = 0

    hj, lj = jnp.asarray(hi), jnp.asarray(lo)
    got = psk4_kernel_sync_tail(hj, lj, True, interpret=True)
    monkeypatch.setattr(batch_mod, "_MATCH_BLOCK_ROWS", 1 << 20)  # disable prefix
    ref = psk4_kernel_sync_tail(hj, lj, True, interpret=True)
    for g, r_ in zip(got, ref):
        assert np.array_equal(np.asarray(g), np.asarray(r_))
    if placement in ("early", "late", "mixed"):
        assert bool(np.asarray(got[2]).all())


@pytest.mark.parametrize("placement", ["early", "late", "mixed", "absent"])
def test_psk2_prefix_scan_equals_full(placement, rng, monkeypatch):
    from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN, MAGIC_BIT_PATTERN2
    import audio_modem_radio_tpu.parallel.batch as batch_mod
    from audio_modem_radio_tpu.parallel.batch import psk2_kernel_sync_tail

    b, r = 2, 512
    m = r * 128
    rng = np.random.default_rng(hash(placement) % 2**31)
    re = rng.integers(0, 2, (b, m), dtype=np.uint8)
    im = rng.integers(0, 2, (b, m), dtype=np.uint8)
    pat = np.asarray([int(c) for c in MAGIC_BIT_PATTERN + MAGIC_BIT_PATTERN2], np.uint8)
    prefix_bits = 256 * 128
    if placement == "early":
        for i in range(b):
            re[i, 20 + i : 20 + i + len(pat)] = pat
    elif placement == "late":
        re[:, :prefix_bits] = 0
        im[:, :prefix_bits] = 0
        for i in range(b):
            re[i, prefix_bits + 777 + i : prefix_bits + 777 + i + len(pat)] = pat
    elif placement == "mixed":
        re[0, 31 : 31 + len(pat)] = pat
        re[1, :prefix_bits] = 0
        im[1, :prefix_bits] = 0
        re[1, prefix_bits + 99 : prefix_bits + 99 + len(pat)] = pat
    else:  # absent: zero prefix keeps hit=False; nothing embedded anywhere
        re[:, :prefix_bits] = 0
        im[:, :prefix_bits] = 0

    rj, ij = jnp.asarray(re), jnp.asarray(im)
    got = psk2_kernel_sync_tail(rj, ij, True, interpret=True)
    monkeypatch.setattr(batch_mod, "_MATCH_BLOCK_ROWS", 1 << 20)
    ref = psk2_kernel_sync_tail(rj, ij, True, interpret=True)
    for g, r_ in zip(got, ref):
        assert np.array_equal(np.asarray(g), np.asarray(r_))
    if placement in ("early", "late", "mixed"):
        assert bool(np.asarray(got[2]).all())
