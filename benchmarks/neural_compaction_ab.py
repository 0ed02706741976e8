"""A/B: single stacked selection dot vs cpk tiny-M dots in the NEURAL
extraction kernel's symbol compaction (round 5, final session).

The post-fusion profile (neural_stage_profile.json) called the kernel
VPU-bound, with the 16-group argmax and the symbol-compaction selection
dots as the residue. The compaction loop issues cpk=16 matmuls with M=32 —
a shape that wastes most of the 128x128 MXU — plus 16 iota-compare P
builds. The "stack" variant stacks all 16 selection matrices into ONE
full-size (nrow, nrow) @ (nrow, 128) dot and keeps only the cheap
roll/mask epilogue per chunk. The reformulation is BIT-EXACT (each output
lane has exactly one nonzero product term), so adoption needs only the
timing; symbol equality is still asserted as a sanity gate.

Usage: python benchmarks/neural_compaction_ab.py [--batch 16] [--samples 22]
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

    def extract(v, compaction):
        k0 = jnp.zeros((v.shape[0],), jnp.int32) + 77
        pr = jnp.ones((v.shape[0],), jnp.float32)
        pi = jnp.zeros((v.shape[0],), jnp.float32)
        chip_tab = nn._chip_shift_table(chip_len, 1.0 + 0.0 * v[0, 0])
        return neural_extract_batch(
            v.reshape(v.shape[0] * r3, 128), chip_tab, cb_b,
            jnp.stack([pr, pi], axis=1), k0,
            rows_per_capture=r3, spr=spr, compaction=compaction,
        )

    loop_fn = jax.jit(lambda v: extract(v, "loop"))
    stack_fn = jax.jit(lambda v: extract(v, "stack"))

    a = np.asarray(loop_fn(x))
    b_ = np.asarray(stack_fn(x))
    res["symbols_equal"] = bool(np.array_equal(a, b_))
    print("symbols_equal:", res["symbols_equal"], flush=True)

    for name, fn in (("extract_loop", loop_fn), ("extract_stack", stack_fn)):
        t = timed(fn, x)
        res[name] = {"ms": round(t * 1e3, 2), "gsps": round(B * N / t / 1e9, 2)}
        print(f"{name:14s} {res[name]['ms']:8.2f} ms  {res[name]['gsps']:6.2f} GS/s",
              flush=True)

    res["adopt"] = bool(
        res["symbols_equal"]
        and res["extract_stack"]["ms"] < res["extract_loop"]["ms"]
    )
    print("adopt:", res["adopt"])
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
