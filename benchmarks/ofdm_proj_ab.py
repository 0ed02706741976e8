"""A/B the OFDM pass-2 projection formulations on the live backend.

The projection computes, per S-sample symbol, 2K inner products against the
dual basis. The blocked dense (r, L*S) @ (L*S, 2*L*K) matmul keeps lanes wide
but burns L x redundant FLOPs on the zero off-blocks. Candidates measured
here (all produce the same per-symbol phasors up to layout):

  dense-L32 / L16 / L8   block-diagonal dense matmul at varying block size
  bf16-L32 / bf16-L16    same with bf16 operands, f32 accumulation
  conv                   lax.conv_general_dilated, stride S, 2K features
  narrow                 (n_sym*L', S) @ (S, 2K) direct narrow-lane matmul
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
from _timing import timed  # noqa: E402  (honest value-fetch slope timing)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--samples", type=int, default=23)
    ap.add_argument("--n-sub", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from audio_modem_radio_tpu.ops.ofdm import (
        _ofdm_basis,
        _ofdm_blocked_dual,
        _symbol_samples,
    )

    B, N, K = args.batch, 1 << args.samples, args.n_sub
    S = _symbol_samples(96000, 9600, K)
    n_sym = N // S
    gsps = lambda dt: round(B * N / dt / 1e9, 2)

    Bb = _ofdm_basis(S, 12000.0, K, 96000).astype(np.float64)
    G = Bb @ Bb.T + 1e-9 * np.eye(2 * K)
    D = np.linalg.solve(G, Bb).astype(np.float32)  # (2K, S)

    y = jax.block_until_ready(jnp.zeros((B, n_sym * S), jnp.float32) + 0.5)

    for L in (32, 16, 8):
        r = n_sym // L
        W = jnp.asarray(_ofdm_blocked_dual(S, 12000.0, K, 96000, L))
        f = jax.jit(lambda v, W=W, r=r, L=L: v.reshape(B, r, L * S) @ W)
        dt = timed(f, y)
        print(json.dumps({"variant": f"dense-L{L}", "ms": round(dt * 1e3, 2), "gsps": gsps(dt)}), flush=True)
        fb = jax.jit(
            lambda v, W=W.astype(jnp.bfloat16), r=r, L=L: lax.dot_general(
                v.reshape(B, r, L * S).astype(jnp.bfloat16), W,
                (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
        )
        dt = timed(fb, y)
        print(json.dumps({"variant": f"bf16-L{L}", "ms": round(dt * 1e3, 2), "gsps": gsps(dt)}), flush=True)

    # conv: (B, 1, N) * (2K, 1, S), stride S -> (B, 2K, n_sym)
    k = jnp.asarray(D[:, None, :])
    conv = jax.jit(
        lambda v: lax.conv_general_dilated(
            v[:, None, :], k, (S,), "VALID", dimension_numbers=("NCH", "OIH", "NCH")
        )
    )
    dt = timed(conv, y)
    print(json.dumps({"variant": "conv-NCH", "ms": round(dt * 1e3, 2), "gsps": gsps(dt)}), flush=True)

    # conv feature-last: (B, N, 1) * (S, 1, 2K) -> (B, n_sym, 2K)
    k2 = jnp.asarray(D.T[:, None, :])
    conv2 = jax.jit(
        lambda v: lax.conv_general_dilated(
            v[:, :, None], k2, (S,), "VALID", dimension_numbers=("NHC", "HIO", "NHC")
        )
    )
    dt = timed(conv2, y)
    print(json.dumps({"variant": "conv-NHC", "ms": round(dt * 1e3, 2), "gsps": gsps(dt)}), flush=True)

    # narrow: (B, n_sym, S) @ (S, 2K)
    Dt = jnp.asarray(D.T)
    narrow = jax.jit(lambda v: v.reshape(B, n_sym, S) @ Dt)
    dt = timed(narrow, y)
    print(json.dumps({"variant": "narrow", "ms": round(dt * 1e3, 2), "gsps": gsps(dt)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
