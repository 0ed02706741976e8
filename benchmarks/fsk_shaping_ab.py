"""A/B microbench: dual-tone FSK — host-shaped overlapped rows vs device reshape.

Measures the fused demod+sync+pack program for FSK1200 with the capture rows
pre-overlapped on the host ((B, r, row+ov) input) against the flat (B, N)
input whose overlap build runs on device. Prints one JSON line.
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

    from audio_modem_radio_tpu.framing import crc32, pack_frame
    from audio_modem_radio_tpu.ops.fsk import fsk_blocked_row_shape, fsk_modulate
    from audio_modem_radio_tpu.parallel.batch import demod_pack_batch

    baud, mark, space = 1200, 1200.0, 2200.0
    batch, n = 16, 1 << 23
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 8192, dtype=np.uint8).tobytes()
    framed = pack_frame("bench.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(fsk_modulate(framed, baud, mark, space), np.float32)
    sig = np.tile(wave, int(np.ceil(n / len(wave))))[:n]
    flat = np.broadcast_to(sig, (batch, n)).copy()

    r, row, ov = fsk_blocked_row_shape(n, baud, mark, space, 96000)
    padded = np.zeros((batch, (r + 1) * row), np.float32)
    keep = min(n, r * row + ov)
    padded[:, :keep] = flat[:, :keep]
    shaped = np.empty((batch, r, row + ov), np.float32)
    shaped[:, :, :row] = padded[:, : r * row].reshape(batch, r, row)
    shaped[:, :, row:] = padded[:, row : (r + 1) * row].reshape(batch, r, row)[:, :, :ov]

    res = {}
    for name, x_np in (("host_shaped", shaped), ("device_shaped", flat)):
        x = jnp.asarray(x_np)
        out = demod_pack_batch(x, "FSK1200", baud)
        jax.block_until_ready(out)
        assert bool(np.asarray(out[2]).all()), f"{name}: lost frame sync"
        t0 = time.perf_counter()
        outs = [demod_pack_batch(x, "FSK1200", baud) for _ in range(3)]
        for o in outs:
            jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / 3
        res[name] = round(batch * n / dt / 1e6, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
