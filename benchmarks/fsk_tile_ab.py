"""A/B: dual-tone FSK batched receive — XLA einsum vs the tile-store kernel.

The round-2 fused FSK kernel lost to XLA (10.5 vs 13.0 GS/s) because its
(blk, spr=16) uint8 stores serialize in Mosaic. This retry stores
(blk*spr/128, 128) full-lane tiles (the margins reshape in VMEM) and takes
pre-overlapped host rows, optionally int16 (VMEM cast — an int16 XLA einsum
would materialize the convert). Three arms, back-to-back so tunnel drift
cancels: XLA f32 (the incumbent), kernel f32, kernel int16.

Usage: python benchmarks/fsk_tile_ab.py [--batch 64] [--samples 23]
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
        _fsk_geometry,
        _samples_per_bit,
        fsk_dual_bits_rows_batch,
        fsk_modulate,
    )

    B, N = args.batch, 1 << args.samples
    baud, mark, space = 1200.0, 1200.0, 2200.0
    spb = _samples_per_bit(SAMPLE_RATE, baud)
    spr, row, ov = _fsk_geometry(spb)

    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 16384, dtype=np.uint8).tobytes()
    framed = pack_frame("p.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(fsk_modulate(framed, baud, mark, space, SAMPLE_RATE), np.float32)
    sig = np.tile(wave, int(np.ceil(N / len(wave))))[:N]

    r = -(-(N // spb) // spr)
    r = -(-r // 256) * 256
    flat = np.zeros(r * row + ov, np.float32)
    keep = min(N, r * row + ov)
    flat[:keep] = sig[:keep]
    one_f = np.empty((r, row + ov), np.float32)
    one_f[:, :row] = flat[: r * row].reshape(r, row)
    one_f[:, row:] = np.lib.stride_tricks.sliding_window_view(
        flat[row : r * row + ov], ov
    )[::row][:r]
    one_i = np.clip(np.round(one_f * 32768.0), -32768, 32767).astype(np.int16)

    of = jnp.asarray(one_f)
    oi = jnp.asarray(one_i)
    x_f = jax.jit(lambda o: jnp.tile(o[None], (B, 1, 1)))(of)
    x_i = jax.jit(lambda o: jnp.tile(o[None], (B, 1, 1)))(oi)

    def pipeline(x, use_kernel):
        bits = fsk_dual_bits_rows_batch(
            x, baud, mark, space, SAMPLE_RATE, kernel=use_kernel
        )

        def sync_pack(bb):
            start, found = find_bit_pattern(bb, MAGIC_BIT_PATTERN)
            packed, n_valid = pack_bits_from(bb, start)
            return packed, n_valid, found

        return jax.vmap(sync_pack)(bits)

    total = B * N
    print(f"backend={jax.default_backend()}  FSK1200, {B} x 2^{args.samples}, r={r}")
    results = {}
    arms = [("xla_f32", x_f, False), ("kernel_f32", x_f, True), ("kernel_i16", x_i, True)]
    for name, x, use_kernel in arms:
        f = jax.jit(lambda v, k=use_kernel: pipeline(v, k))
        t = timed(f, x)
        results[f"{name}_gsps"] = total / t / 1e9
        out = f(x)
        found = bool(np.asarray(out[2]).all())
        results[f"{name}_found_all"] = found
        print(f"{name:>12}: {t * 1e3:8.1f} ms  ({total / t / 1e9:5.1f} GS/s)  found_all={found}")

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
