"""Stage profile of the batched NEURAL demod (demod_td_batch) on device.

Times, under the value-fetch discipline: (a) _td_prep downconversion alone,
(b) the prefix matched-filter sync, (c) chip extraction + codebook scoring
alone (fixed k0), (d) the full production pipeline. Prints ms/batch and
GS/s for each so the next optimization targets the real cost.

Usage: python benchmarks/neural_stage_profile.py [--batch 16] [--samples 22]
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--samples", type=int, default=22)
    ap.add_argument("--argmax", default="dot", choices=("dot", "loop"),
                    help="extraction-kernel argmax variant (default: the "
                         "production 'dot' adopted in round 5; 'loop' "
                         "reproduces the committed neural_stage_profile.json)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from _timing import timed
    from audio_modem_radio_tpu.ops import neural as nn

    B, N = args.batch, 1 << args.samples
    chip_len = nn._chip_len(9600)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 4096, dtype=np.uint8)
    wave = np.asarray(nn.neural_mode_modulate(payload.tobytes(), 9600), np.float32)
    sig = np.tile(wave, int(np.ceil(N / len(wave))))[:N]
    x = jax.jit(lambda o: jnp.tile(o[None], (B, 1)))(jnp.asarray(sig))

    corr_t = jnp.asarray(nn._corr_table(chip_len))
    cb_b = jnp.asarray(nn._codebook_blocked(chip_len))
    P = corr_t.shape[0] - 128

    def prep(v):
        zr, zi = jax.vmap(nn._td_prep)(v)
        return zr[:, ::4097] + zi[:, ::4097]

    def prefix(v):
        zr, zi = jax.vmap(nn._td_prep)(v)
        r3 = zr.shape[1] // 128
        r_pre = max(1, r3 // 8)

        def one(a, b):
            cre, cim = nn._td_corr(a, b, corr_t, r_pre)
            k0, pr, pi, pk = nn._td_peak(cre, cim)
            return k0, pk

        k0, pk = jax.vmap(one)(zr, zi)
        return k0 + (pk > 0)

    def extract(v):
        chip_tab = nn._chip_shift_table(chip_len, 1.0 + 0.0 * v[0, 0])
        zr, zi = jax.vmap(nn._td_prep)(v)
        k0 = jnp.zeros((v.shape[0],), jnp.int32) + 777

        def one(a, b, k):
            return nn._td_extract(
                a, b, k, jnp.float32(1.0), jnp.float32(0.0), cb_b, chip_tab
            )

        return jax.vmap(one)(zr, zi, k0)

    def full_xla(v):
        return nn.demod_td_batch(v, chip_len, kernel=False)

    def full_kernel(v):
        return nn.demod_td_batch(v, chip_len, kernel=True)

    # Kernel-path stage isolation (VERDICT r4 next #8): the production TPU
    # path downconverts only the sync prefix span and runs extraction as
    # ONE Pallas kernel — time each piece so the 6.29 GS/s full-pipeline
    # number decomposes into sync vs extraction vs dispatch.
    from audio_modem_radio_tpu.ops.pallas_kernels import neural_extract_batch

    n_pad = -(-N // 128) * 128
    r3 = n_pad // 128
    r_pre = max(1, r3 // 8)
    nb = P // 128
    cpr = 128 // chip_len
    spr = cpr // nn.CHIPS_PER_SYMBOL
    pre_span = min(n_pad, (r_pre + nb + 1) * 128)
    e_tab = jnp.asarray(nn._energy_table(P))
    e_pre = nn._preamble_energy(chip_len)

    def prefix_sync_kernelpath(v):
        zp_r, zp_i = jax.vmap(nn._td_prep)(v[:, :pre_span])

        def one(a, b):
            cre, cim = nn._td_corr(a, b, corr_t, r_pre)
            k0, pr, pi, pk = nn._td_peak(cre, cim)
            e2 = nn._td_corr_rows(a * a + b * b, r_pre, nb) @ e_tab
            ew = e2.reshape(-1)[k0]
            return k0, pr, pi, pk / (e_pre * ew + 1e-12)

        k0, pr, pi, rho = jax.vmap(one)(zp_r, zp_i)
        return k0 + (rho > 0)

    def extract_kernel(v):
        k0 = jnp.zeros((v.shape[0],), jnp.int32) + 77
        pr = jnp.ones((v.shape[0],), jnp.float32)
        pi = jnp.zeros((v.shape[0],), jnp.float32)
        chip_tab = nn._chip_shift_table(chip_len, 1.0 + 0.0 * v[0, 0])
        return neural_extract_batch(
            v.reshape(v.shape[0] * r3, 128),
            chip_tab,
            cb_b,
            jnp.stack([pr, pi], axis=1),
            k0,
            rows_per_capture=r3,
            spr=spr,
            interpret=jax.default_backend() != "tpu",
            argmax=args.argmax,
        )

    total = B * N
    print(f"backend={jax.default_backend()}  NEURAL, {B} x 2^{args.samples}, chip_len={chip_len}")
    results = {}
    for name, fn in (
        ("prep", prep),
        ("prefix_sync", prefix),
        ("extract", extract),
        ("prefix_sync_kernelpath", prefix_sync_kernelpath),
        ("extract_kernel", extract_kernel),
        ("full_xla", full_xla),
        ("full_kernel", full_kernel),
    ):
        f = jax.jit(fn)
        t = timed(f, x)
        results[f"{name}_ms"] = t * 1e3
        results[f"{name}_gsps"] = total / t / 1e9
        print(f"{name:>12}: {t * 1e3:8.1f} ms  ({total / t / 1e9:5.2f} GS/s)")

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
