"""A/B: decide-kernel body variants — roll overlap vs successor columns.

The fused decide kernel is VPU-bound (34.8 GS/s alone vs a ~170 GS/s HBM
read floor, profile_decode.py), and its VPU time is layout work: the
(blk+8, ROW) extended-tile concat+roll, the (blk, ROW+OV) lane concat of
the overlap view, and the concat+roll+iota/where successor patching of both
projection streams. The "succ" variant (ops.psk._blocked_templates_succ +
pallas_kernels._project_diff_body_succ) deletes all three: the template
carries 128 successor column pairs so the differential is slices of ONE
matmul output, and the overlap contribution is a second small (OV-column)
dot. Bit-identical decisions (tests/test_decide_kernel.py).

Times, at the headline geometry (QPSK@9600, batch 64 x 2^24):
  1. the decide kernel alone, each variant;
  2. the full production pipeline (demod_pack_batch), each variant.

Usage: python benchmarks/psk_decide_variant_ab.py [--batch 64] [--samples 24]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--samples", type=int, default=24, help="log2 samples/capture")
    ap.add_argument("--baud", type=int, default=9600)
    ap.add_argument("--mode", default="QPSK")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from _timing import timed
    from audio_modem_radio_tpu.framing import crc32, pack_frame
    from audio_modem_radio_tpu.modem import modulate
    from audio_modem_radio_tpu.ops.pallas_kernels import psk_project_decide_batch
    from audio_modem_radio_tpu.ops.psk import (
        _batch_pass1,
        _blocked_templates,
        _blocked_templates_succ,
        _samples_per_symbol,
        blocked_row_shape,
    )
    from audio_modem_radio_tpu.parallel.batch import demod_pack_batch

    B, N, baud = args.batch, 1 << args.samples, args.baud
    sr = 96000
    n_psk = 4 if args.mode in ("QPSK", "8PSK", "APSK16") else 2
    carrier = 3000.0
    spsym = _samples_per_symbol(sr, baud)

    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 16384, dtype=np.uint8).tobytes()
    framed = pack_frame("p.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(modulate(args.mode, framed, baud), np.float32)
    sig = np.tile(wave, int(np.ceil(N / len(wave))))[:N]

    r, row = blocked_row_shape(N, baud, sr)
    shaped = np.zeros((B, r * row), np.float32)
    shaped[:, : min(N, r * row)] = sig[: r * row]
    # Stage the big batch on device by tiling the single capture (the tunnel
    # moves ~4 MB/s; shipping 4 GB from the host adds ~18 min — PERF.md).
    one = jnp.asarray(shaped[0].reshape(r, row))
    x3d = jax.jit(lambda o: jnp.tile(o[None], (B, 1, 1)))(one)

    total = B * N
    print(f"backend={jax.default_backend()}  {args.mode}@{baud}, {B} x 2^{args.samples}")

    # Shared pass 1 (timing offset + rotation estimate).
    _x3d, r1, best, theta = _batch_pass1(None, x3d, B, r * 128, spsym, carrier, sr, 8, r)
    rot = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)
    W = jnp.asarray(_blocked_templates(spsym, carrier, sr, 8))
    Ws = jnp.asarray(_blocked_templates_succ(spsym, carrier, sr, 8))

    interp = jax.default_backend() != "tpu"  # CPU wiring smoke runs interpret
    results = {}
    for variant, w in (("roll", W), ("succ", Ws)):
        f = jax.jit(
            lambda x, w=w, v=variant: psk_project_decide_batch(
                x, w, best, rot, rows_per_capture=r, n_psk=n_psk, variant=v,
                interpret=interp,
            )
        )
        t = timed(f, x3d)
        results[f"decide_{variant}_gsps"] = total / t / 1e9
        print(f"decide kernel [{variant}]: {t * 1e3:8.1f} ms  ({total / t / 1e9:5.1f} GS/s)")

    for dv in ("roll", "succ"):
        for pv in ("shift", "weights"):
            f = jax.jit(
                lambda x, dv=dv, pv=pv: demod_pack_batch(
                    x, args.mode, baud, cfo_retry=True, psk_variant=dv, pack_variant=pv
                )
            )
            t = timed(f, x3d)
            results[f"pipeline_{dv}_{pv}_gsps"] = total / t / 1e9
            print(
                f"full pipeline [{dv}+{pv}]: {t * 1e3:8.1f} ms"
                f"  ({total / t / 1e9:5.1f} GS/s)"
            )

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
