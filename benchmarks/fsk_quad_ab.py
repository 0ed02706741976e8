"""A/B: FSK19200 mid-separation — vmapped XLA pipeline vs the fused kernel.

Incumbent: host FIR windows -> analytic_fir_dec_rows matmul -> overlapped
row relayout -> quadrature einsums -> energy margins (the round-3 production
path). Challenger: ONE Pallas kernel (analytic FIR + per-bit quadrature
correlation + noncoherent margin; f32 or int16 rows cast in VMEM), bit
decision in XLA on the 4 B/bit margin stream.

Usage: python benchmarks/fsk_quad_ab.py [--batch 64] [--samples 23]
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
    ap.add_argument("--samples", type=int, default=23)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from _timing import timed
    from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN, crc32, pack_frame
    from audio_modem_radio_tpu.modem import SAMPLE_RATE
    from audio_modem_radio_tpu.ops.common import find_bit_pattern, pack_bits_from
    from audio_modem_radio_tpu.ops.fsk import (
        fsk_demod_bits,
        fsk_fir_row_shape,
        fsk_modulate,
        fsk_quad_bits_rows_batch,
        fsk_quad_row_shape,
    )

    B, N = args.batch, 1 << args.samples
    baud, mark, space = 19200.0, 8000.0, 16000.0

    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 16384, dtype=np.uint8).tobytes()
    framed = pack_frame("p.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(fsk_modulate(framed, baud, mark, space, SAMPLE_RATE), np.float32)
    sig = np.tile(wave, int(np.ceil(N / len(wave))))[:N]

    def overlap_one(r, rowl, ov, lead, dtype):
        flat = np.zeros((r + 1) * rowl, np.float32)
        keep = min(N, r * rowl + ov - lead)
        flat[lead : lead + keep] = sig[:keep]
        out = np.empty((r, rowl + ov), np.float32)
        out[:, :rowl] = flat[: r * rowl].reshape(r, rowl)
        out[:, rowl:] = flat[rowl : (r + 1) * rowl].reshape(r, rowl)[:, :ov]
        if dtype == np.int16:
            return np.clip(np.round(out * 32768.0), -32768, 32767).astype(np.int16)
        return out

    rl = fsk_fir_row_shape(N, baud, mark, space, SAMPLE_RATE)
    rq = fsk_quad_row_shape(N, baud, mark, space, SAMPLE_RATE)
    one_leg = jnp.asarray(overlap_one(*rl, np.float32))
    one_f = jnp.asarray(overlap_one(*rq, np.float32))
    one_i = jnp.asarray(overlap_one(*rq, np.int16))
    x_leg = jax.jit(lambda o: jnp.tile(o[None], (B, 1, 1)))(one_leg)
    x_f = jax.jit(lambda o: jnp.tile(o[None], (B, 1, 1)))(one_f)
    x_i = jax.jit(lambda o: jnp.tile(o[None], (B, 1, 1)))(one_i)

    def sync_tail(bits):
        def sync_pack(bb):
            start, found = find_bit_pattern(bb, MAGIC_BIT_PATTERN)
            packed, n_valid = pack_bits_from(bb, start)
            return packed, n_valid, found

        return jax.vmap(sync_pack)(bits)

    def legacy(x):
        bits = jax.vmap(
            lambda v: fsk_demod_bits(v, baud, mark, space, SAMPLE_RATE, mlse=False)[0]
        )(x)
        return sync_tail(bits)

    def fused(x):
        bits = fsk_quad_bits_rows_batch(x, baud, mark, space, SAMPLE_RATE)
        return sync_tail(bits)

    total = B * N
    print(f"backend={jax.default_backend()}  FSK19200, {B} x 2^{args.samples}")
    results = {}
    for name, fn, x in (
        ("legacy_xla", legacy, x_leg),
        ("fused_f32", fused, x_f),
        ("fused_i16", fused, x_i),
    ):
        f = jax.jit(fn)
        t = timed(f, x)
        results[f"{name}_gsps"] = total / t / 1e9
        out = f(x)
        found = bool(np.asarray(out[2]).all())
        results[f"{name}_found_all"] = found
        print(f"{name:>11}: {t * 1e3:8.1f} ms  ({total / t / 1e9:5.1f} GS/s)  found_all={found}")

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
