"""Stage-level timing of the batched OFDM receive path on the live backend.

Breaks demod_pack_batch('OFDM4') into its constituent jitted programs and
times each with the pipelined methodology, so optimization work targets the
measured bottleneck instead of a guess. Prints one JSON object per stage.

Usage: python benchmarks/ofdm_stage_profile.py [--batch 32] [--samples 23]
"""

from __future__ import annotations

import argparse
import functools
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
from _timing import timed  # noqa: E402  (honest value-fetch slope timing)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--samples", type=int, default=23)
    ap.add_argument("--n-sub", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN, MAGIC_BIT_PATTERN2, crc32, pack_frame
    from audio_modem_radio_tpu.modem import modulate
    from audio_modem_radio_tpu.ops.common import dibit_sync_and_pack_rotations
    from audio_modem_radio_tpu.ops.ofdm import (
        _ofdm_blocked_dual,
        _ofdm_rows_per_block,
        _symbol_samples,
        ofdm_demod_bits,
    )
    from audio_modem_radio_tpu.parallel.batch import demod_pack_batch

    B, N = args.batch, 1 << args.samples
    mode = "OFDM4" if args.n_sub == 4 else "OFDM8"
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 16384, dtype=np.uint8).tobytes()
    framed = pack_frame("bench.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(modulate(mode, framed, 9600), np.float32)
    sig = np.tile(wave, int(np.ceil(N / len(wave))))[:N]
    x = jnp.broadcast_to(jnp.asarray(sig), (B, N))
    x = jax.block_until_ready(x + 0)
    gsps = lambda dt: round(B * N / dt / 1e9, 2)

    # 1. full production path
    dt = timed(lambda v: demod_pack_batch(v, mode, 9600), x)
    print(json.dumps({"stage": "full demod_pack_batch", "ms": round(dt * 1e3, 2), "gsps": gsps(dt)}), flush=True)

    # 2. vmapped ofdm_demod_bits only (bits out, incl. interleave)
    bits_fn = jax.jit(jax.vmap(lambda v: ofdm_demod_bits(v, 9600.0, 12000.0, args.n_sub, 96000)[0]))
    dt = timed(bits_fn, x)
    print(json.dumps({"stage": "vmap ofdm_demod_bits", "ms": round(dt * 1e3, 2), "gsps": gsps(dt)}), flush=True)
    bits = jax.block_until_ready(bits_fn(x))

    # 3. XLA dibit rotation sync tail only (on the demod's bit output)
    tail = jax.jit(
        jax.vmap(lambda bb: dibit_sync_and_pack_rotations(bb[0::2], bb[1::2], MAGIC_BIT_PATTERN, MAGIC_BIT_PATTERN2))
    )
    dt = timed(tail, bits)
    print(json.dumps({"stage": "XLA dibit sync tail", "ms": round(dt * 1e3, 2), "gsps": gsps(dt)}), flush=True)

    # 4. pass-2 blocked projection matmul alone
    S = _symbol_samples(96000, 9600, args.n_sub)
    L = _ofdm_rows_per_block(S)
    n_sym = N // S
    r = -(-n_sym // L)
    W = jnp.asarray(_ofdm_blocked_dual(S, 12000.0, args.n_sub, 96000, L))
    xm = jax.block_until_ready(jnp.zeros((B, r, L * S), jnp.float32) + 1.0)
    mm = jax.jit(lambda v: v @ W)
    dt = timed(mm, xm)
    print(json.dumps({"stage": "pass2 blocked matmul", "ms": round(dt * 1e3, 2), "gsps": gsps(dt)}), flush=True)

    # 5. interleave cost probe: stack+reshape vs returning dual streams
    K = args.n_sub
    n_d = (n_sym - 1) * K
    hi = jax.block_until_ready(jnp.zeros((B, n_d), jnp.uint8) + 1)
    lo = hi
    inter = jax.jit(lambda h, l: jnp.stack([h, l], axis=2).reshape(B, -1))
    dt = timed(inter, hi, lo)
    print(json.dumps({"stage": "bit interleave (stack+reshape)", "ms": round(dt * 1e3, 2), "gsps": gsps(dt)}), flush=True)

    # 6. deinterleave (the batch.py strided slices)
    deinter = jax.jit(lambda bb: (bb[:, 0::2], bb[:, 1::2]))
    dt = timed(deinter, bits)
    print(json.dumps({"stage": "bit deinterleave (strided slice)", "ms": round(dt * 1e3, 2), "gsps": gsps(dt)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
