"""Per-stage decode-pipeline profiler (the reusable tool PERF.md numbers
come from — VERDICT r1 noted it lived only in commit history).

Times each stage of the batched PSK decode on the current JAX backend, plus
the fused end-to-end program, with pipelined dispatch (the sustained-
throughput methodology bench.py uses). Stage timings are indicative — XLA
fuses stages inside the real program, so they are upper bounds; the fused
number is the truth.

Usage::

    python benchmarks/profile_decode.py [--batch 16] [--samples 23]
        [--baud 9600] [--mode QPSK] [--reps 8]

(--samples is log2 of samples per capture.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu through jax.config: the axon tunnel plugin
# ignores the env var, and a wedged tunnel hangs any backend probe.
from audio_modem_radio_tpu.utils.jaxenv import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def _pipelined(fn, *args, reps: int = 8) -> float:
    """Honest per-dispatch seconds (value-fetch synced slope; _timing.py —
    block_until_ready does NOT sync over the axon tunnel, PERF.md)."""
    from _timing import timed

    return timed(fn, *args, reps=reps)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--samples", type=int, default=23, help="log2 samples/capture")
    ap.add_argument("--baud", type=int, default=9600)
    ap.add_argument("--mode", default="QPSK")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN, crc32, pack_frame
    from audio_modem_radio_tpu.modem import modulate
    from audio_modem_radio_tpu.ops.common import (
        dibit_sync_and_pack,
        dibit_sync_and_pack_rotations,
    )
    from audio_modem_radio_tpu.ops.psk import (
        blocked_row_shape,
        derotate,
        estimate_common_rotation_windows,
        psk_demod_streams_batch,
        qpsk_gray_streams,
    )
    from audio_modem_radio_tpu.parallel.batch import demod_pack_batch

    B, N, baud = args.batch, 1 << args.samples, args.baud
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 16384, dtype=np.uint8).tobytes()
    framed = pack_frame("p.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(modulate(args.mode, framed, baud), np.float32)
    sig = np.tile(wave, int(np.ceil(N / len(wave))))[:N]

    shape = blocked_row_shape(N, baud, 96000)
    if shape is None:
        print("config has no blocked fast path; profiling flat layout")
        x = jnp.asarray(np.broadcast_to(sig, (B, N)).copy())
    else:
        r, row = shape
        shaped = np.zeros((B, r * row), np.float32)
        shaped[:, : min(N, r * row)] = sig[: r * row]
        x = jnp.asarray(shaped.reshape(B, r, row))

    total = B * N
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    print(f"workload: {args.mode}@{baud}Bd, batch {B} x 2^{args.samples} samples\n")

    # DMA-floor probe: one full HBM read of the input, no compute to speak
    # of. The fused pipeline can't beat this; the gap to it says whether the
    # decide kernel is DMA-bound (chase layouts/dtypes) or VPU-bound (chase
    # in-kernel work).
    f_floor = jax.jit(lambda x: jnp.sum(x, axis=tuple(range(1, x.ndim))))
    t = _pipelined(f_floor, x, reps=args.reps)
    print(f"HBM read floor (sum):       {t * 1e3:8.1f} ms  ({total / t / 1e9:5.1f} GS/s)")

    from audio_modem_radio_tpu.ops.psk import psk_decision_streams_batch

    f_decide = jax.jit(
        lambda x: psk_decision_streams_batch(x, float(baud), 3000.0, 96000, cfo=True)
    )
    t = _pipelined(f_decide, x, reps=args.reps)
    print(f"fused decide kernel alone:  {t * 1e3:8.1f} ms  ({total / t / 1e9:5.1f} GS/s)")

    f_streams = jax.jit(lambda x: psk_demod_streams_batch(x, float(baud), 3000.0, 96000))
    t = _pipelined(f_streams, x, reps=args.reps)
    print(f"streams (projection+diff):  {t * 1e3:8.1f} ms  ({total / t / 1e9:5.1f} GS/s)")
    d_re, d_im = f_streams(x)

    f_rot = jax.jit(lambda a, b: derotate(a, b, estimate_common_rotation_windows(a, b)))
    t = _pipelined(f_rot, d_re, d_im, reps=args.reps)
    print(f"derotate + CFO estimate:    {t * 1e3:8.1f} ms   (standalone; fuses in prod)")

    f_gray = jax.jit(lambda a, b: jax.vmap(qpsk_gray_streams)(a, b))
    t = _pipelined(f_gray, d_re, d_im, reps=args.reps)
    print(f"gray decision streams:      {t * 1e3:8.1f} ms   (standalone; fuses in prod)")
    hi, lo = f_gray(d_re, d_im)

    f_s1 = jax.jit(
        lambda h, l: jax.vmap(lambda a, b: dibit_sync_and_pack(a, b, MAGIC_BIT_PATTERN))(h, l)
    )
    t = _pipelined(f_s1, hi, lo, reps=args.reps)
    print(f"sync+pack (k0 only):        {t * 1e3:8.1f} ms")

    f_s4 = jax.jit(
        lambda h, l: jax.vmap(
            lambda a, b: dibit_sync_and_pack_rotations(a, b, MAGIC_BIT_PATTERN)
        )(h, l)
    )
    t = _pipelined(f_s4, hi, lo, reps=args.reps)
    print(f"sync+pack (XLA 8-hyp):      {t * 1e3:8.1f} ms")

    for flag, label in ((False, "fused pipeline, cfo off "), (True, "fused pipeline, DEFAULT ")):
        t = _pipelined(
            lambda x: demod_pack_batch(x, args.mode, baud, cfo_retry=flag), x, reps=args.reps
        )
        print(f"{label}:   {t * 1e3:8.1f} ms  ({total / t / 1e9:5.1f} GS/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
