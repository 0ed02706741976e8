"""Per-mode batched decode throughput on the live backend.

Measures ``demod_pack_batch`` (the production batched receive program) at
scale with pipelined dispatch and device-resident input — the bench.py
methodology: ship one capture, tile the batch on-chip, keep a bounded number
of dispatches in flight, best of 2 rounds. Prints one JSON object per mode.

Usage:
  python benchmarks/mode_throughput.py --modes OFDM4,OFDM8,NEURAL \
      [--batch 32] [--samples 23] [--reps 6] [--inflight 2]
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
RATES = {  # symbol_rate per mode for the headline configs
    "OFDM4": 9600,
    "OFDM8": 9600,
    "NEURAL": 9600,
    "QPSK": 9600,
    "BPSK": 9600,
    "FSK1200": 1200,
    "FSK9600": 9600,
    "FSK19200": 19200,
    "HELLSCHREIBER": 0,
}


def _make_signal(mode: str, rate: int, n_samples: int) -> np.ndarray:
    from audio_modem_radio_tpu.framing import crc32, pack_frame
    from audio_modem_radio_tpu.modem import modulate
    from audio_modem_radio_tpu.ops.hell import hellschreiber_modulate

    rng = np.random.default_rng(0)
    if mode in ("HELLSCHREIBER", "FELD_HELL", "SLOW_HELL"):
        wave = np.asarray(hellschreiber_modulate("THROUGHPUT BENCH 0123456789" * 4), np.float32)
    else:
        payload = rng.integers(0, 256, 16384, dtype=np.uint8).tobytes()
        framed = pack_frame("bench.bin", payload, 0, 1, len(payload), crc32(payload))
        wave = np.asarray(modulate(mode, framed, rate), np.float32)
    reps = int(np.ceil(n_samples / len(wave)))
    return np.tile(wave, reps)[:n_samples]


def bench_mode(mode: str, batch: int, n_samples: int, reps: int, inflight: int) -> dict:
    import jax
    import jax.numpy as jnp

    from audio_modem_radio_tpu.parallel.batch import demod_pack_batch, resolve_demod_plan

    rate = RATES.get(mode, 9600)
    sig = _make_signal(mode, rate, n_samples)
    kind, params = resolve_demod_plan(mode, rate)

    x = None
    if kind in ("psk2", "psk4"):
        from audio_modem_radio_tpu.ops.psk import blocked_row_shape

        shape = blocked_row_shape(n_samples, params[0], 96000)
        if shape is not None:
            r, row = shape
            keep = min(n_samples, r * row)
            one = jnp.concatenate(
                [jnp.asarray(sig[:keep]), jnp.zeros(r * row - keep, jnp.float32)]
            )
            x = jnp.broadcast_to(one, (batch, r * row)).reshape(batch, r, row)
    if x is None:
        one = jnp.asarray(sig)
        x = jnp.broadcast_to(one, (batch, n_samples))
    x = jax.block_until_ready(x + 0)  # materialize on device

    out = demod_pack_batch(x, mode, rate)  # compile + warm
    _ = np.asarray(out[1][:2])  # value fetch = true sync (benchmarks/_timing.py)

    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = demod_pack_batch(x, mode, rate)
        _ = np.asarray(o[1][:2])  # ordered execution -> syncs all reps
        dt = (time.perf_counter() - t0) / reps
        best = max(best, batch * n_samples / dt / 1e9)
    return {
        "mode": mode,
        "gsamples_per_sec": round(best, 2),
        "batch": batch,
        "log2_samples": int(np.log2(n_samples)),
        "device": str(jax.devices()[0]),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="OFDM4,OFDM8,NEURAL")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--samples", type=int, default=23, help="log2 samples/capture")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--inflight", type=int, default=2)
    args = ap.parse_args()
    for mode in args.modes.split(","):
        print(json.dumps(bench_mode(mode.strip(), args.batch, 1 << args.samples, args.reps, args.inflight)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
