"""Stage profile of the batched D8PSK receive on device.

Times, under the value-fetch discipline (benchmarks/_timing.py):
(a) the float differential front end (psk_demod_streams_batch, n_psk=8),
(b) front end + windowed 8th-power derotation + sector decisions,
(c) the vmapped sector-space rotation sync + pack alone (precomputed sec),
(d) the full production pipeline (demod_pack_batch).
Prints ms/batch and GS/s per stage so the next optimization targets the
real cost (the mode runs 14.1 GS/s where QPSK's fused tail runs 141).

Usage: python benchmarks/psk8_stage_profile.py [--batch 64] [--samples 22]
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
    from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN, MAGIC_BIT_PATTERN2
    from audio_modem_radio_tpu.ops import psk
    from audio_modem_radio_tpu.parallel.batch import demod_pack_batch, host_shape_batch

    B, N = args.batch, 1 << args.samples
    BAUD, CARRIER, SR = 9600, 12000.0, 96000
    sig = _signal("8PSK", BAUD, N)
    one = host_shape_batch(sig[None], "8PSK", BAUD)[0]
    xd = jnp.asarray(one)
    x = jax.jit(lambda o: jnp.broadcast_to(o[None], (B,) + o.shape) + 0)(xd)
    _ = np.asarray(x[(0,) * (x.ndim - 1) + (slice(0, 2),)])

    front = jax.jit(
        lambda v: psk.psk_demod_streams_batch(v, float(BAUD), CARRIER, SR, n_psk=8)
    )

    def _sector(v):
        d_re, d_im = psk.psk_demod_streams_batch(v, float(BAUD), CARRIER, SR, n_psk=8)
        theta = psk.estimate_common_rotation_windows(d_re, d_im, n_psk=8)
        d_re, d_im = psk.derotate(d_re, d_im, theta)
        return psk.psk8_sector_stream(d_re, d_im)

    sector = jax.jit(_sector)
    sec = sector(x)
    _ = np.asarray(sec[0, :2])

    sync = jax.jit(
        lambda s: jax.vmap(
            lambda q: psk.psk8_sync_and_pack_rotations(
                q, MAGIC_BIT_PATTERN, MAGIC_BIT_PATTERN2
            )
        )(s)
    )
    full = jax.jit(lambda v: demod_pack_batch(v, "8PSK", BAUD, cfo_retry=True))

    res = {}
    for name, fn, arg in (
        ("front", front, x),
        ("front+sector", sector, x),
        ("sync_only", sync, sec),
        ("full", full, x),
    ):
        sec_per = timed(fn, arg)
        res[name] = {
            "ms": round(sec_per * 1e3, 3),
            "gsps": round(B * N / sec_per / 1e9, 2),
        }
        print(f"{name:14s} {res[name]['ms']:9.2f} ms  {res[name]['gsps']:8.2f} GS/s", flush=True)

    res["config"] = {"batch": B, "n_samples": N, "baud": BAUD}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
