"""A/B: bf16 MXU inputs in the fused NEURAL extraction kernel (round 5).

The post-fusion stage profile (neural_stage_profile.json, VERDICT r4 #8)
puts 85% of the NEURAL pipeline in the extraction kernel, and the kernel's
cost is MXU-dominated by the block-diagonal codebook scorer (~5.6 ms of the
12.1 ms at f32; the layout pays an inherent 16x K=8-padding waste, so the
only remaining lever is the MXU rate term). bf16 inputs double the v5e MXU
rate. This harness:

  1. asserts SYMBOL-EXACT agreement between the f32 and bf16 kernels on a
     clean modulated capture AND one at 10 dB full-band SNR (argmax margins
     are codeword-separation sized, far above bf16's ~8-bit mantissa), and
  2. times extraction-kernel-only and the full demod_td_batch both ways,
     back-to-back.

Adoption rule printed at the end: adopt only if symbols match everywhere
and the full pipeline is faster.

Usage: python benchmarks/neural_bf16_ab.py [--batch 16] [--samples 22]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_modem_radio_tpu.utils.jaxenv import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--samples", type=int, default=22)
    ap.add_argument("--argmax", default="dot", choices=("dot", "loop"),
                    help="argmax kernel variant to measure bf16 against "
                         "(default: the production 'dot'; 'loop' reproduces "
                         "the original round-5 A/B, neural_bf16_ab.json)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from _timing import timed
    from audio_modem_radio_tpu.ops import neural as nn
    from audio_modem_radio_tpu.ops.pallas_kernels import neural_extract_batch

    B, N = args.batch, 1 << args.samples
    chip_len = nn._chip_len(9600)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 4096, dtype=np.uint8)
    wave = np.asarray(nn.neural_mode_modulate(payload.tobytes(), 9600), np.float32)
    sig = np.tile(wave, int(np.ceil(N / len(wave))))[:N]
    p = float(np.mean(sig**2))
    noisy = (sig + rng.normal(0, np.sqrt(p / 10), len(sig))).astype(np.float32)

    res = {"config": {"batch": B, "n_samples": N, "chip_len": chip_len,
                      "argmax": args.argmax}}

    # --- symbol-exactness gate (clean + 10 dB), full production path ------
    sym_equal = True
    for name, s_np in (("clean", sig), ("snr10", noisy)):
        x = jax.jit(lambda o: jnp.tile(o[None], (B, 1)))(jnp.asarray(s_np))
        a = np.asarray(nn.demod_td_batch(x, chip_len, kernel=True))
        b_ = np.asarray(
            nn.demod_td_batch(x, chip_len, kernel=True, kernel_bf16=True)
        )
        eq = bool(np.array_equal(a, b_))
        res[f"symbols_equal_{name}"] = eq
        sym_equal &= eq
        print(f"symbols_equal[{name}]: {eq}", flush=True)

    # --- timing, back-to-back --------------------------------------------
    n_pad = -(-N // 128) * 128
    r3 = n_pad // 128
    cpr = 128 // chip_len
    spr = cpr // nn.CHIPS_PER_SYMBOL
    cb_b = jnp.asarray(nn._codebook_blocked(chip_len))
    x = jax.jit(lambda o: jnp.tile(o[None], (B, 1)))(jnp.asarray(sig))
    _ = np.asarray(x[0, :2])

    def extract(v, bf16):
        k0 = jnp.zeros((v.shape[0],), jnp.int32) + 77
        pr = jnp.ones((v.shape[0],), jnp.float32)
        pi = jnp.zeros((v.shape[0],), jnp.float32)
        chip_tab = nn._chip_shift_table(chip_len, 1.0 + 0.0 * v[0, 0])
        return neural_extract_batch(
            v.reshape(v.shape[0] * r3, 128), chip_tab, cb_b,
            jnp.stack([pr, pi], axis=1), k0,
            rows_per_capture=r3, spr=spr, bf16=bf16, argmax=args.argmax,
        )

    for name, fn in (
        ("extract_f32", jax.jit(lambda v: extract(v, False))),
        ("extract_bf16", jax.jit(lambda v: extract(v, True))),
        ("full_f32", jax.jit(lambda v: nn.demod_td_batch(v, chip_len, kernel=True))),
        ("full_bf16", jax.jit(
            lambda v: nn.demod_td_batch(v, chip_len, kernel=True, kernel_bf16=True))),
    ):
        t = timed(fn, x)
        res[name] = {"ms": round(t * 1e3, 2), "gsps": round(B * N / t / 1e9, 2)}
        print(f"{name:14s} {res[name]['ms']:8.2f} ms  {res[name]['gsps']:6.2f} GS/s",
              flush=True)

    res["adopt"] = bool(
        sym_equal and res["full_bf16"]["ms"] < res["full_f32"]["ms"]
    )
    print("adopt:", res["adopt"])
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
