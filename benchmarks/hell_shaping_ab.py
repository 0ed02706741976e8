"""A/B: HELLSCHREIBER batch — flat (B, N) device reshape vs host pre-shaped
(B, n_pix, spp) pixel windows (f32 view and int16 quantized).

The flat path reshapes the whole multi-GB batch on device (a tiled-layout
relayout, PERF.md rule 4); the pre-shaped path ships windows the host built
for free and fuses cast+square into the energy reduction.

Usage: python benchmarks/hell_shaping_ab.py [--batch 32] [--samples 22]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--samples", type=int, default=22)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from _timing import timed
    from audio_modem_radio_tpu.ops.hell import hell_demod_text_batch, hellschreiber_modulate

    B, N = args.batch, 1 << args.samples
    spp = int(round(96000 / 122.5))
    text = "".join(chr(c) for c in np.random.default_rng(0).integers(33, 127, 512))
    wave = np.asarray(hellschreiber_modulate(text), np.float32)
    sig = np.tile(wave, int(np.ceil(N / len(wave))))[:N]
    n_pix = N // spp
    view = sig[: n_pix * spp].reshape(n_pix, spp)

    one_flat = jnp.asarray(sig)
    one_f = jnp.asarray(view)
    one_i = jnp.asarray(
        np.clip(np.round(view * 32768.0), -32768, 32767).astype(np.int16)
    )
    x_flat = jax.jit(lambda o: jnp.tile(o[None], (B, 1)))(one_flat)
    x_f = jax.jit(lambda o: jnp.tile(o[None], (B, 1, 1)))(one_f)
    x_i = jax.jit(lambda o: jnp.tile(o[None], (B, 1, 1)))(one_i)

    total = B * N
    print(f"backend={jax.default_backend()}  HELLSCHREIBER, {B} x 2^{args.samples}")
    results = {}
    for name, x in (("flat_f32", x_flat), ("rows_f32", x_f), ("rows_i16", x_i)):
        f = jax.jit(lambda v: hell_demod_text_batch(v, spp))
        t = timed(f, x)
        out = f(x)
        n_chars = int(np.asarray(out[1])[0])
        k = min(n_chars, 50)
        got = "".join(chr(c) for c in np.asarray(out[0])[0, :k])
        # The capture tiles a truncated transmission, so only require the
        # decoded prefix to match (the tail may end mid-glyph).
        ok = bool(np.asarray(out[2]).all()) and k >= 20 and got == text[:k]
        results[f"{name}_gsps"] = total / t / 1e9
        results[f"{name}_ok"] = ok
        print(f"{name:>9}: {t * 1e3:8.1f} ms  ({total / t / 1e9:5.1f} GS/s)  ok={ok}")

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
