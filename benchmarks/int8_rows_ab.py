"""A/B: int8 vs int16 input rows for the batched PSK receive.

int16 rows left the decide kernel at ~87% of its HBM read floor (PERF.md);
int8 halves the read again. Quantization at scale 128 adds ~-50 dB noise —
far below any operating SNR, but NOT bit-exact to int16-PCM sources, so the
path is opt-in (``tpu.int8_rows``). Frame recovery measured equal to f32
at every SNR cell including the 10 dB transition (4/4, 4/4, 2/2, 0/0).

Usage: python benchmarks/int8_rows_ab.py [--batch 64] [--samples 24]
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
    ap.add_argument("--samples", type=int, default=24)
    ap.add_argument("--baud", type=int, default=9600)
    ap.add_argument("--mode", default="QPSK")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from _timing import timed
    from audio_modem_radio_tpu.framing import crc32, pack_frame
    from audio_modem_radio_tpu.modem import modulate
    from audio_modem_radio_tpu.ops.psk import blocked_row_shape
    from audio_modem_radio_tpu.parallel.batch import demod_pack_batch

    B, N, baud = args.batch, 1 << args.samples, args.baud
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 16384, dtype=np.uint8).tobytes()
    framed = pack_frame("p.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(modulate(args.mode, framed, baud), np.float32)
    sig = np.tile(wave, int(np.ceil(N / len(wave))))[:N]

    r, row = blocked_row_shape(N, baud, 96000)
    flat = np.zeros(r * row, np.float32)
    flat[: min(N, r * row)] = sig[: r * row]
    q16 = np.clip(np.round(flat * 32768.0), -32768, 32767).astype(np.int16)
    q8 = np.clip(np.round(flat * 128.0), -128, 127).astype(np.int8)

    one_16 = jnp.asarray(q16.reshape(r, row))
    one_8 = jnp.asarray(q8.reshape(r, row))
    x_16 = jax.jit(lambda o: jnp.tile(o[None], (B, 1, 1)))(one_16)
    x_8 = jax.jit(lambda o: jnp.tile(o[None], (B, 1, 1)))(one_8)

    total = B * N
    print(f"backend={jax.default_backend()}  {args.mode}@{baud}, {B} x 2^{args.samples}")
    results = {}
    for name, x in (("int16", x_16), ("int8", x_8)):
        f = jax.jit(lambda v: demod_pack_batch(v, args.mode, baud, cfo_retry=True))
        t = timed(f, x)
        results[f"pipeline_{name}_gsps"] = total / t / 1e9
        print(f"full pipeline [{name}]: {t * 1e3:8.1f} ms  ({total / t / 1e9:5.1f} GS/s)")
        out = f(x)
        found = bool(np.asarray(out[2]).all())
        results[f"found_all_{name}"] = found
        print(f"  found_all={found}")

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
