"""A/B microbench: FSK analytic front end — overlap-save FIR vs whole-capture FFT.

Measures the full fused demod+sync+pack program (the production batched path)
end to end on the default device, for the discriminator config (FSK9600) and
the mid-separation matched-filter config (FSK19200). Prints one JSON line.
"""

from __future__ import annotations

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
def _make_signal(n_samples: int, baud: int, mark: float, space: float) -> np.ndarray:
    from audio_modem_radio_tpu.framing import crc32, pack_frame
    from audio_modem_radio_tpu.ops.fsk import fsk_modulate

    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 8192, dtype=np.uint8).tobytes()
    framed = pack_frame("bench.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(fsk_modulate(framed, baud, mark, space), np.float32)
    reps = int(np.ceil(n_samples / len(wave)))
    return np.tile(wave, reps)[:n_samples]


def bench(batch: int, n_samples: int, baud: int, mark: float, space: float,
          fir: bool, reps: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN
    from audio_modem_radio_tpu.ops.common import find_bit_pattern, pack_bits_from
    from audio_modem_radio_tpu.ops.fsk import fsk_demod_bits

    sig = _make_signal(n_samples, baud, mark, space)
    x = jnp.asarray(np.broadcast_to(sig, (batch, n_samples)).copy())

    @functools.partial(jax.jit, static_argnames=("fir",))
    def prog(samples, fir):
        def one(s):
            bits, _ = fsk_demod_bits(
                s, float(baud), mark, space, 96000, mlse=False, frontend="fir" if fir else "fft"
            )
            start, found = find_bit_pattern(bits, MAGIC_BIT_PATTERN)
            packed, n_valid = pack_bits_from(bits, start)
            return packed, n_valid, found

        return jax.vmap(one)(samples)

    out = prog(x, fir)
    jax.block_until_ready(out)
    # Verify sync found in every capture (decode sanity, not just speed).
    assert bool(np.asarray(out[2]).all()), "lost frame sync"
    t0 = time.perf_counter()
    outs = [prog(x, fir) for _ in range(reps)]
    for o in outs:
        jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / reps
    return batch * n_samples / dt / 1e6


def main() -> None:
    res = {}
    for name, (baud, mark, space, batch, n) in {
        "FSK9600": (9600, 1200.0, 2200.0, 16, 1 << 23),
        "FSK19200": (19200, 8000.0, 16000.0, 16, 1 << 23),
    }.items():
        for fir in (True, False):
            key = f"{name}_{'fir' if fir else 'fft'}"
            t0 = time.perf_counter()
            res[key] = round(bench(batch, n, baud, mark, space, fir), 1)
            print(f"{key}: {res[key]} Ms/s (wall {time.perf_counter()-t0:.0f}s)", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
