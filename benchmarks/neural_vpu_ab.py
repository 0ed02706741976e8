"""A/B: VPU-residue restructurings in the fused NEURAL extraction kernel.

The post-fusion profile (neural_stage_profile.json) called the kernel
VPU-bound: the 16-group first-max argmax (multi-pass (nrow, 256) lane
reductions) and the symbol-compaction selection dots (cpk=16 matmuls at
M=32, mostly-idle MXU) are the residue. Two independent reformulations:

- compaction="stack": ONE full-size (nrow, nrow) @ (nrow, 128) selection
  dot; bit-exact vs the loop (one nonzero product term per output lane).
- argmax="dot": one-hot the per-group max and extract index + tie count
  with one bf16 (nrow,256)@(256,128) dot per group (indices <= 255 and
  0/1 one-hots are bf16-exact; f32 accumulation). Exact multi-way ties
  gate to symbol 0 (identical to the loop on all-zero rows, where the
  loop's first-max also lands on 0).

Measures all four combinations back-to-back on the extraction kernel and
asserts symbol equality of every variant against the production loop/loop
on a clean capture. Adoption rule: symbols equal AND faster.

Usage: python benchmarks/neural_vpu_ab.py [--batch 16] [--samples 22]
"""

from __future__ import annotations

import argparse
import itertools
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

    res = {"config": {"batch": B, "n_samples": N, "chip_len": chip_len}}

    n_pad = -(-N // 128) * 128
    r3 = n_pad // 128
    cpr = 128 // chip_len
    spr = cpr // nn.CHIPS_PER_SYMBOL
    cb_b = jnp.asarray(nn._codebook_blocked(chip_len))
    x = jax.jit(lambda o: jnp.tile(o[None], (B, 1)))(jnp.asarray(sig))
    _ = np.asarray(x[0, :2])

    def extract(v, compaction, argmax):
        k0 = jnp.zeros((v.shape[0],), jnp.int32) + 77
        pr = jnp.ones((v.shape[0],), jnp.float32)
        pi = jnp.zeros((v.shape[0],), jnp.float32)
        chip_tab = nn._chip_shift_table(chip_len, 1.0 + 0.0 * v[0, 0])
        return neural_extract_batch(
            v.reshape(v.shape[0] * r3, 128), chip_tab, cb_b,
            jnp.stack([pr, pi], axis=1), k0,
            rows_per_capture=r3, spr=spr, compaction=compaction, argmax=argmax,
        )

    combos = list(itertools.product(("loop", "stack"), ("loop", "dot")))
    fns = {
        (c, a): jax.jit(lambda v, c=c, a=a: extract(v, c, a)) for c, a in combos
    }
    base = np.asarray(fns[("loop", "loop")](x))
    all_equal = True
    for key in combos[1:]:
        eq = bool(np.array_equal(base, np.asarray(fns[key](x))))
        res[f"symbols_equal_{key[0]}_{key[1]}"] = eq
        all_equal &= eq
        print(f"symbols_equal[{key}]: {eq}", flush=True)

    best = None
    for key in combos:
        t = timed(fns[key], x)
        row = {"ms": round(t * 1e3, 2), "gsps": round(B * N / t / 1e9, 2)}
        res[f"extract_{key[0]}_{key[1]}"] = row
        print(f"compaction={key[0]:5s} argmax={key[1]:4s}  "
              f"{row['ms']:8.2f} ms  {row['gsps']:6.2f} GS/s", flush=True)
        if best is None or row["ms"] < best[1]["ms"]:
            best = (key, row)

    res["best"] = {"compaction": best[0][0], "argmax": best[0][1], **best[1]}
    res["adopt"] = bool(all_equal and best[0] != ("loop", "loop"))
    print("best:", res["best"], "adopt:", res["adopt"])
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
