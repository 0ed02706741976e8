"""A/B: fused-decide D8PSK front half (round 5) vs the round-4 staged path.

Same session, back-to-back (the only comparison the tunnel makes
trustworthy — PERF.md reproducibility note):

  A (new, production): demod_pack_batch — pass 1 + ONE fused
     projection+differential+derotate+sector kernel (int16 rows) + the
     Pallas sector-matcher sync tail.
  B (round 4 wiring, reconstructed): float psk_demod_streams_batch front
     end + windowed 8th-power derotation + elementwise sectors + the same
     Pallas sync tail, on the same f32 rows.

Also asserts both paths find sync on every capture and that the packed
byte streams parse to the same frame payload, so the speedup can't be a
wrong-answer artifact.

Usage: python benchmarks/psk8_fused_ab.py [--batch 64] [--samples 22]
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
    ap.add_argument("--samples", type=int, default=22)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from _timing import timed
    from honest import _signal
    from audio_modem_radio_tpu.framing import parse_frames
    from audio_modem_radio_tpu.ops import psk
    from audio_modem_radio_tpu.parallel.batch import (
        _MATCH_BLOCK_ROWS,
        demod_pack_batch,
        host_shape_batch,
        psk8_kernel_sync_tail,
    )

    B, N = args.batch, 1 << args.samples
    BAUD, CARRIER, SR = 9600, 12000.0, 96000
    sig = _signal("8PSK", BAUD, N)

    def stage(one_np):
        xd = jnp.asarray(one_np)
        x = jax.jit(lambda o: jnp.broadcast_to(o[None], (B,) + o.shape) + 0)(xd)
        _ = np.asarray(x[(0,) * (x.ndim - 1) + (slice(0, 2),)])
        return x

    # A: production rows (int16 on TPU since round 5).
    x_a = stage(host_shape_batch(sig[None], "8PSK", BAUD)[0])
    # B: the round-4 f32 rows (the staged float front end's input format;
    # undo the int16 scaling host_shape_batch applies on TPU since round 5).
    rows = host_shape_batch(sig[None], "8PSK", BAUD)[0]
    x_b = stage(
        np.ascontiguousarray(rows.astype(np.float32) / 32768.0)
        if rows.dtype == np.int16
        else np.ascontiguousarray(rows.astype(np.float32))
    )

    full_new = jax.jit(lambda v: demod_pack_batch(v, "8PSK", BAUD, cfo_retry=True))

    def _staged(v):
        d_re, d_im = psk.psk_demod_streams_batch(v, float(BAUD), CARRIER, SR, n_psk=8)
        theta = psk.estimate_common_rotation_windows(d_re, d_im, n_psk=8)
        d_re, d_im = psk.derotate(d_re, d_im, theta)
        sec = psk.psk8_sector_stream(d_re, d_im)
        grain = 128 * _MATCH_BLOCK_ROWS
        m_pad = -(-sec.shape[1] // grain) * grain
        sec_p = jnp.pad(sec, ((0, 0), (0, m_pad - sec.shape[1])))
        return psk8_kernel_sync_tail(sec_p, True)

    full_staged = jax.jit(_staged)

    res = {"config": {"batch": B, "n_samples": N, "baud": BAUD}}
    outs = {}
    for name, fn, arg in (("fused_r5", full_new, x_a), ("staged_r4", full_staged, x_b)):
        out = fn(arg)
        packed = np.asarray(out[0][0])
        n_valid = int(np.asarray(out[1][0]))
        found = bool(np.asarray(out[2]).all())
        frames = parse_frames(packed[: n_valid // 8].tobytes())
        outs[name] = frames[0].data if frames else None
        sec_per = timed(fn, arg)
        res[name] = {
            "ms": round(sec_per * 1e3, 3),
            "gsps": round(B * N / sec_per / 1e9, 2),
            "found_all": found,
            "parsed": bool(frames),
        }
        print(f"{name:10s} {res[name]['ms']:8.2f} ms  {res[name]['gsps']:7.2f} GS/s  "
              f"found={found} parsed={bool(frames)}", flush=True)

    res["payload_equal"] = outs["fused_r5"] is not None and (
        outs["fused_r5"] == outs["staged_r4"]
    )
    print("payload_equal:", res["payload_equal"])
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
