"""A/B microbench: FSK9600 discriminator decimation factor (1 vs 2 vs 4).

The decimated analytic front end (analytic_bandpass decimate=D) shrinks the
inverse FFT and all downstream phasor/boxcar work by D, exactly. This
measures the fused demod+sync program end to end per factor. Prints JSON.
"""

from __future__ import annotations

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
def main() -> None:
    import jax
    import jax.numpy as jnp

    import audio_modem_radio_tpu.ops.fsk as F
    from audio_modem_radio_tpu.framing import MAGIC_BIT_PATTERN, crc32, pack_frame
    from audio_modem_radio_tpu.ops.common import find_bit_pattern, pack_bits_from

    baud, mark, space = 9600, 1200.0, 2200.0
    batch, n = 16, 1 << 23
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 8192, dtype=np.uint8).tobytes()
    framed = pack_frame("bench.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(F.fsk_modulate(framed, baud, mark, space), np.float32)
    sig = np.tile(wave, int(np.ceil(n / len(wave))))[:n]
    x = jnp.asarray(np.broadcast_to(sig, (batch, n)).copy())

    def make_prog():
        def one(s):
            bits, _ = F.fsk_demod_bits(s, float(baud), mark, space, 96000, mlse=False)
            start, found = find_bit_pattern(bits, MAGIC_BIT_PATTERN)
            packed, n_valid = pack_bits_from(bits, start)
            return packed, n_valid, found

        return jax.jit(lambda ss: jax.vmap(one)(ss))

    res = {}
    orig = F._discriminator_decimation
    for d in (1, 2, 4):
        F._discriminator_decimation = lambda spb, bh, sr, dd=d: dd
        jax.clear_caches()
        prog = make_prog()
        out = prog(x)
        jax.block_until_ready(out)
        assert bool(np.asarray(out[2]).all()), f"dec={d}: lost frame sync"
        t0 = time.perf_counter()
        outs = [prog(x) for _ in range(3)]
        for o in outs:
            jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / 3
        res[f"dec{d}"] = round(batch * n / dt / 1e6, 1)
        print(f"dec={d}: {res[f'dec{d}']} Ms/s", flush=True)
    F._discriminator_decimation = orig
    print(json.dumps(res))


if __name__ == "__main__":
    main()
