"""A/B: FFT front end vs decimating-FIR-matmul front end, FSK9600 discriminator.

Compares on the live backend, at production scale, with pipelined dispatch
(bench.py methodology: submit all reps, drain at the end, best of 2 rounds):

  fft      analytic_bandpass(x, decimate=D)      — rfft + mask + ifft(N/D)
  matmul   analytic_bandpass_fir_dec(x, ..., D)  — one (r, R) @ (R, 2L) matmul

plus the FULL discriminator pipeline end-to-end under each front end
(front end -> phasor -> boxcar matmuls -> equalizer -> bits -> sync/pack).
Prints one JSON object.

Usage: python benchmarks/fsk_fir_dec_ab.py [--batch 64] [--samples 23]
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
def _pipelined(fn, *args, reps: int = 8, rounds: int = 2, inflight: int = 1) -> float:
    """Best-of-rounds mean seconds per call, <=inflight dispatches in flight
    (stage outputs can be GB-scale; a full 8-deep queue OOMs the chip)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = []
        for _ in range(reps):
            outs.append(fn(*args))
            if len(outs) > inflight:
                jax.block_until_ready(outs.pop(0))
        for o in outs:
            jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--samples", type=int, default=23, help="log2 samples/capture")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--baud", type=int, default=9600)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import audio_modem_radio_tpu.ops.fsk as F
    from audio_modem_radio_tpu.framing import crc32, pack_frame
    from audio_modem_radio_tpu.ops.common import (
        analytic_bandpass,
        analytic_bandpass_fir_dec,
    )

    baud = args.baud
    mark, space = (8000.0, 16000.0) if baud >= 19200 else (1200.0, 2200.0)
    sr = 96000
    b, n = args.batch, 1 << args.samples
    spb = F._samples_per_bit(sr, baud)

    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 8192, dtype=np.uint8).tobytes()
    framed = pack_frame("bench.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(F.fsk_modulate(framed, baud, mark, space), np.float32)
    sig = np.tile(wave, int(np.ceil(n / len(wave))))[:n]
    sig_dev = jax.device_put(jnp.asarray(sig))
    x = jax.jit(lambda s: jnp.broadcast_to(s, (b, n)) + 0.0)(sig_dev)
    jax.block_until_ready(x)

    band_lo = max(min(mark, space) - baud, 10.0)
    band_hi = min(max(mark, space) + baud, sr / 2 - 10.0)
    dec = F._discriminator_decimation(spb, band_hi, sr)
    res = {"dec": dec, "batch": b, "log2n": args.samples, "baud": baud}

    def report(name, fn, *fargs, keep=False):
        jfn = jax.jit(fn)
        try:
            dt = _pipelined(jfn, *fargs, reps=args.reps)
        except Exception as e:  # RESOURCE_EXHAUSTED on big-output stages
            res[name + "_error"] = type(e).__name__
            print(name, "ERROR", type(e).__name__, flush=True)
            return None
        res[name + "_ms"] = round(dt * 1e3, 2)
        res[name + "_gsps"] = round(b * n / dt / 1e9, 2)
        print(name, res[name + "_ms"], "ms", res[name + "_gsps"], "GS/s", flush=True)
        return jfn(*fargs) if keep else None

    # Full pipeline under each front end (mlse off — production batch config).
    def full(fe):
        def one(s):
            bits, _ = F.fsk_demod_bits(
                s, float(baud), mark, space, sr, mlse=False, frontend=fe
            )
            from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN
            from audio_modem_radio_tpu.ops.common import (
                find_bit_pattern,
                pack_bits_from,
            )

            start, found = find_bit_pattern(bits, MAGIC_BIT_PATTERN)
            packed, n_valid = pack_bits_from(bits, start)
            return packed, n_valid, found

        return lambda xx: jax.vmap(one)(xx)

    out_mm = report("full_matmul", full("matmul"), x, keep=True)
    bits_mm = np.asarray(jax.device_get(out_mm[0][0])) if out_mm is not None else None
    found_mm = bool(np.asarray(out_mm[2]).all()) if out_mm is not None else None
    del out_mm
    out_fft = report("full_fft", full("fft"), x, keep=True)
    if out_fft is not None and bits_mm is not None:
        bits_fft = np.asarray(jax.device_get(out_fft[0][0]))
        res["decoded_bytes_equal"] = bool(np.array_equal(bits_mm, bits_fft))
        res["sync_found_all"] = found_mm
    del out_fft

    # Front ends in isolation (best-effort: big outputs can OOM the queue).
    report(
        "fe_matmul",
        lambda xx: analytic_bandpass_fir_dec(xx, band_lo, band_hi, sr, dec),
        x,
    )
    report(
        "fe_fft", lambda xx: analytic_bandpass(xx, band_lo, band_hi, sr, decimate=dec), x
    )

    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
