"""Benchmark: batched demodulation throughput (Msamples/s/chip) vs reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Workload: the BASELINE.json headline config — batched DQPSK @ 9600 Bd, 96 kHz
capture — through the fused demod+sync+pack program (the same code path the
decode pipeline uses), on whatever accelerator JAX finds (one TPU chip under
the driver). The baseline divisor is the *reference's own receive algorithm*
(Butterworth filtfilt band-pass -> complex mix -> filtfilt low-pass -> stride
sampling -> differential angle quantization, /root/reference/modem.py:189-241)
implemented with scipy and timed on this host's CPU over the same signal.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _make_signal(n_samples: int, baud: int = 9600) -> np.ndarray:
    """A real QPSK transmission (framed random payload), tiled to n_samples."""
    from audio_modem_radio_tpu.framing import crc32, pack_frame
    from audio_modem_radio_tpu.modem import modulate

    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 16384, dtype=np.uint8).tobytes()
    framed = pack_frame("bench.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(modulate("QPSK", framed, baud), np.float32)
    reps = int(np.ceil(n_samples / len(wave)))
    return np.tile(wave, reps)[:n_samples]


def _bench_tpu(batch: int, n_samples: int, baud: int, reps: int = 8, cfo_retry: bool = True) -> float:
    """Msamples/s through the fused batched demod on the default device.

    Uses the production decode layout: captures pre-shaped into blocked rows
    on the host (what decode_sample_batch does), one fused jitted program for
    demod + frame sync + byte packing on device.
    """
    import jax
    import jax.numpy as jnp

    from audio_modem_radio_tpu.ops.psk import blocked_row_shape
    from audio_modem_radio_tpu.parallel.batch import demod_pack_batch

    sig = _make_signal(n_samples, baud)
    r, row = blocked_row_shape(n_samples, baud, 96000)
    keep = min(n_samples, r * row)
    # Stage ON DEVICE: ship the 64 MB signal once and tile it to the 4 GB
    # batch on-chip — the tunnel link moves ~4 MB/s, so transferring the
    # full batch from the host would take ~18 minutes.
    # int16 rows, the production default on TPU (host_shape_batch's auto
    # path): halves the h2d ship AND the DMA-bound decide kernel's HBM read.
    q = np.clip(np.round(sig[:keep] * 32768.0), -32768, 32767).astype(np.int16)
    sig_dev = jnp.asarray(q)
    one = jnp.concatenate([sig_dev, jnp.zeros(r * row - keep, jnp.int16)])
    x = jax.device_put(jnp.broadcast_to(one, (batch, r * row)).reshape(batch, r, row))
    x = jax.block_until_ready(x + 0)  # materialize the tiled batch

    out = demod_pack_batch(x, "QPSK", baud, cfo_retry=cfo_retry)  # compile + warm
    _ = np.asarray(out[1][:2])  # value fetch = true sync (see below)

    # Pipelined (sustained) throughput: keep dispatches in flight and drain
    # at the end — JAX's async dispatch overlaps the ~30 ms tunnel round trip
    # with device execution, exactly as the production batch driver does.
    # SYNC DISCIPLINE: jax.block_until_ready does NOT wait for execution on
    # the axon tunnel (measured round 3: an 8-rep matmul loop "finished" at
    # 5,559 TFLOP/s on a ~200 TFLOP/s chip). A host fetch of any output value
    # IS a true sync, and programs execute in dispatch order, so fetching a
    # tiny slice of the LAST output syncs every rep. Validated against a
    # forced serial data-dependent chain: 36.0 (chained) vs 35.3 ms/rep
    # (pipelined+fetch) at this config — benchmarks/honest.py.
    # Best of 2 rounds: transient host/tunnel contention only ever SLOWS a
    # round (one contended run read 25% low), so the max is the honest
    # sustained-throughput estimate.
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        out = None
        for _i in range(reps):
            out = demod_pack_batch(x, "QPSK", baud, cfo_retry=cfo_retry)
        _ = np.asarray(out[1][:2])
        dt = (time.perf_counter() - t0) / reps
        best = max(best, batch * n_samples / dt / 1e6)
    return best


def _bench_reference_cpu(n_samples: int, baud: int, trials: int = 3) -> float:
    """Msamples/s of the reference's QPSK receive chain (scipy, this host).

    Best of ``trials``: the bench host is shared, and a single timing under
    contention once read 21x slow, inflating vs_baseline nonsensically."""
    return max(_bench_reference_cpu_once(n_samples, baud) for _ in range(trials))


def _bench_reference_cpu_once(n_samples: int, baud: int) -> float:
    from scipy import signal as sig

    sr = 96000
    carrier = 3000.0
    x = _make_signal(n_samples, baud).astype(np.float64)
    spsym = int(sr / baud)

    t0 = time.perf_counter()
    nyq = sr / 2
    b, a = sig.butter(4, [max(0.01, (carrier - baud * 1.5) / nyq), min(0.99, (carrier + baud * 1.5) / nyq)], btype="band")
    filtered = sig.filtfilt(b, a, x)
    t = np.arange(len(filtered)) / sr
    baseband = filtered * np.exp(-2j * np.pi * carrier * t)
    b_lp, a_lp = sig.butter(4, baud / nyq, btype="low")
    baseband = sig.filtfilt(b_lp, a_lp, baseband)
    symbols = baseband[spsym // 2 :: spsym]
    diff = symbols[1:] * np.conj(symbols[:-1])
    ang = np.mod(np.angle(diff) + 2 * np.pi, 2 * np.pi)
    _bits = np.floor((ang + np.pi / 4) / (np.pi / 2)).astype(np.int32) % 4
    dt = time.perf_counter() - t0
    return n_samples / dt / 1e6


def _device_alive(timeout_s: float = 900.0) -> bool:
    """True when a trivial device op completes within ``timeout_s``.

    The axon tunnel can wedge INDEFINITELY (observed round 3 after an
    UNIMPLEMENTED-composite dispatch: every subsequent dispatch, and even
    backend init, blocked for hours). The probe runs in a daemon thread —
    a stuck C call can't be interrupted, but the main thread can still
    report and exit instead of hanging the driver.
    """
    import threading

    ok: list = []

    def probe() -> None:
        import jax
        import jax.numpy as jnp

        np.asarray(jnp.arange(4.0) * 2)
        ok.append(True)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main() -> None:
    import sys

    if "--smoke" in sys.argv:
        # On-chip Pallas kernel smoke: run every kernel non-interpreted on a
        # small shape and verify against the XLA / interpreter references;
        # writes KERNEL_SMOKE.json (VERDICT r2 #10). Exit code reflects it.
        from benchmarks.kernel_smoke import main as smoke_main

        raise SystemExit(smoke_main())

    if not _device_alive():
        import os

        print(json.dumps({
            "metric": "demod_msamples_per_sec_chip",
            "value": 0.0,
            "unit": "Msamples/s",
            "vs_baseline": 0.0,
            "error": "device unreachable: trivial dispatch did not complete in 900 s (wedged axon tunnel?)",
        }))
        os._exit(2)  # a daemon thread is stuck in the backend; exit hard

    baud = 9600
    # Large per-dispatch workload: the TPU tunnel has ~30 ms per-call
    # latency, so throughput must be measured against >>30 ms of real work.
    batch, n_samples = 64, 1 << 24  # 1.07 Gsamples (4 GB) per step

    # Headline = the production DEFAULT pipeline, which since round 2
    # includes CFO robustness (blind derotation + quarter-turn sync retry).
    value = _bench_tpu(batch, n_samples, baud)
    # Equal-capability comparison point vs earlier rounds (which had no CFO
    # machinery): the same pipeline with cfo_retry off.
    value_fast = _bench_tpu(batch, n_samples, baud, reps=8, cfo_retry=False)
    baseline = _bench_reference_cpu(1 << 21, baud)

    import jax

    result = {
        "metric": "demod_msamples_per_sec_chip",
        "value": round(value, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(value / baseline, 2),
        "baseline_cpu_msamples_per_sec": round(baseline, 2),
        "config": f"QPSK@{baud}Bd 96kHz, batch={batch}x{n_samples}, cfo_retry=on (default)",
        "msamples_per_sec_cfo_off": round(value_fast, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
