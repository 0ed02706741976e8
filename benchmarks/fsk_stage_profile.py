"""Stage-level profile of the FSK9600 discriminator path on the live backend.

Times each stage of the close-tone (discriminator) receive chain separately,
plus the fused end-to-end program, with pipelined dispatch (device-resident
input, 4-deep in-flight — the PERF.md methodology). Stage numbers are upper
bounds (XLA fuses across stages inside the real program); the fused number is
the truth. Prints one JSON object.

Usage: python benchmarks/fsk_stage_profile.py [--batch 64] [--samples 23]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu through jax.config: the axon tunnel plugin
# ignores the env var, and a wedged tunnel hangs any backend probe.
from audio_modem_radio_tpu.utils.jaxenv import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()
def _pipelined(fn, *args, reps: int = 8, inflight: int = 1) -> float:
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    outs = []
    t0 = time.perf_counter()
    for _ in range(reps):
        outs.append(fn(*args))
        if len(outs) > inflight:
            jax.block_until_ready(outs.pop(0))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--samples", type=int, default=23, help="log2 samples/capture")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import audio_modem_radio_tpu.ops.fsk as F
    from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN, crc32, pack_frame
    from audio_modem_radio_tpu.ops.common import (
        analytic_bandpass,
        find_bit_pattern,
        pack_bits_from,
    )

    baud, mark, space = 9600, 1200.0, 2200.0
    sr = 96000
    b, n = args.batch, 1 << args.samples
    spb = F._samples_per_bit(sr, baud)
    n_bits = n // spb

    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 8192, dtype=np.uint8).tobytes()
    framed = pack_frame("bench.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(F.fsk_modulate(framed, baud, mark, space), np.float32)
    sig = np.tile(wave, int(np.ceil(n / len(wave))))[:n]
    # Stage on device, tile on-chip (the tunnel moves ~4 MB/s).
    sig_dev = jax.device_put(jnp.asarray(sig))
    x = jax.jit(lambda s: jnp.broadcast_to(s, (b, n)) + 0.0)(sig_dev)
    jax.block_until_ready(x)

    band_lo, band_hi = 10.0, min(2200.0 + baud, sr / 2 - 10.0)
    dec = F._discriminator_decimation(spb, band_hi, sr)
    n_fft = 1 << (n - 1).bit_length()
    nd = n_fft // dec
    res = {"dec": dec, "batch": b, "log2n": args.samples}

    def report(name, fn, *fargs):
        jfn = jax.jit(fn)
        dt = _pipelined(jfn, *fargs, reps=args.reps)
        res[name] = round(dt * 1e3, 2)
        res[name + "_gsps"] = round(b * n / dt / 1e9, 2)
        print(name, res[name], "ms", res[name + "_gsps"], "GS/s", flush=True)
        return jfn(*fargs)

    # 1. full fused pipeline (what production runs, mlse off)
    def full(xx):
        def one(s):
            bits, _ = F.fsk_demod_bits(s, float(baud), mark, space, sr, mlse=False)
            start, found = find_bit_pattern(bits, MAGIC_BIT_PATTERN)
            packed, n_valid = pack_bits_from(bits, start)
            return packed, n_valid, found

        return jax.vmap(one)(xx)

    report("full_pipeline", full, x)

    # 2. front end: analytic_bandpass with decimation (rfft + mask + ifft)
    z = report(
        "analytic_bandpass",
        lambda xx: analytic_bandpass(xx, band_lo, band_hi, sr, decimate=dec),
        x,
    )

    # 2a. rfft alone / 2b. ifft alone
    report("rfft", lambda xx: jnp.fft.rfft(xx), x)
    spec = jax.jit(lambda xx: jnp.fft.rfft(xx)[..., :nd])(x)
    jax.block_until_ready(spec)
    report("ifft_nd", lambda s: jnp.fft.ifft(s), spec)

    # 3. phasor products
    def phasor(zz):
        zr, zi = jnp.real(zz).astype(jnp.float32), jnp.imag(zz).astype(jnp.float32)
        p_re = zr[..., 1:] * zr[..., :-1] + zi[..., 1:] * zi[..., :-1]
        p_im = zi[..., 1:] * zr[..., :-1] - zr[..., 1:] * zi[..., :-1]
        return p_re, p_im

    p_re, p_im = report("phasor", phasor, z)

    # 4. rows + boxcar matmuls + atan2 + equalizer + bits (both passes)
    spr_d, row_d, ov_d = F._fsk_geometry_dec(spb, dec)
    r_d = -(-n_bits // spr_d)
    Wb = jnp.asarray(F._fsk_boxcar_templates_dec(spb, 8, dec))
    coef = F._discriminator_calibration(
        spb, float(baud), mark, space, sr, band_lo, band_hi, dec=dec
    )

    def backend(pr_pi):
        pr1, pi1 = pr_pi
        n_used_d = min(int(pr1.shape[-1]), -(-(n_bits * spb) // dec))

        def one(p_r, p_i):
            pr = F._rows_with_overlap(p_r, n_used_d, r_d, row_d, ov_d)
            pi = F._rows_with_overlap(p_i, n_used_d, r_d, row_d, ov_d)
            wr = min(32, r_d)
            starts = sorted({0, max(0, r_d // 2 - wr // 2), max(0, r_d - wr)})
            mid = (mark + space) / 2.0
            scale = sr / dec / (2 * jnp.pi)
            Wb_all = Wb.transpose(1, 0, 2).reshape(row_d + ov_d, -1)
            wins_r = jnp.concatenate([pr[s : s + wr] for s in starts], axis=0) @ Wb_all
            wins_i = jnp.concatenate([pi[s : s + wr] for s in starts], axis=0) @ Wb_all
            f_win = jnp.arctan2(wins_i, wins_r) * scale
            score = jnp.sum(jnp.abs(f_win - mid).reshape(-1, 8, spr_d), axis=(0, 2))
            best = jnp.argmax(score)
            sr_sum = pr @ Wb[best]
            si_sum = pi @ Wb[best]
            f = (jnp.arctan2(si_sum, sr_sum) * scale).reshape(-1)
            pad = F._EQ_TAPS // 2
            fm = jnp.concatenate([jnp.repeat(f[:1], pad), f, jnp.repeat(f[-1:], pad)])
            eq = jnp.full_like(f, float(coef[-1]))
            for j in range(F._EQ_TAPS):
                eq = eq + float(coef[j]) * fm[j : j + f.shape[0]]
            return (jnp.abs(eq - mark) < jnp.abs(eq - space)).astype(jnp.uint8)[:n_bits]

        return jax.vmap(one)(pr1, pi1)

    bits = report("rows_boxcar_eq", backend, (p_re, p_im))

    # 5. sync/pack tail
    def tail(bb):
        def one(bits1):
            start, found = find_bit_pattern(bits1, MAGIC_BIT_PATTERN)
            packed, n_valid = pack_bits_from(bits1, start)
            return packed, n_valid, found

        return jax.vmap(one)(bb)

    report("sync_pack", tail, bits)

    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
