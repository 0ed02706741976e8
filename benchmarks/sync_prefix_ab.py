"""A/B the prefix-scan sync tail (parallel/batch.py) against the full scan.

The prefix scan runs the VPU-bound rotation matcher over the first ~1/8 of
rows and escalates under lax.cond when any capture misses hypothesis k=0
there (see psk4_kernel_sync_tail). On clean batches — the headline
workload — the matcher cost should drop ~7x. This bench measures both
variants at the PERF.md operating points using the honest value-fetch
discipline, by monkeypatching the `_MATCH_BLOCK_ROWS` granularity huge so
`2 * r_pre <= r_dib` fails and the tails compile the full-scan-only path.

Usage: python benchmarks/sync_prefix_ab.py [--modes QPSK,BPSK,OFDM4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu through jax.config: the axon tunnel plugin
# ignores the env var, and a wedged tunnel hangs any backend probe.
from audio_modem_radio_tpu.utils.jaxenv import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()
from honest import CONFIGS, measure  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="QPSK,BPSK,OFDM4")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "sync_prefix_ab.json"),
    )
    args = ap.parse_args()

    import audio_modem_radio_tpu.parallel.batch as batch_mod

    rows = []
    for mode in args.modes.split(","):
        rate, batch, log2n, kwargs = CONFIGS[mode]
        on = measure(mode, rate, batch, 1 << log2n, **kwargs)
        saved = batch_mod._MATCH_BLOCK_ROWS
        batch_mod._MATCH_BLOCK_ROWS = 1 << 20  # prefix disabled -> full scan
        try:
            off = measure(mode, rate, batch, 1 << log2n, **kwargs)
        finally:
            batch_mod._MATCH_BLOCK_ROWS = saved
        row = {
            "mode": mode,
            "gsps_prefix": on["gsps"],
            "gsps_full": off["gsps"],
            "ms_prefix": on["ms_slope"],
            "ms_full": off["ms_slope"],
            "found_all": on["found_all"] and off["found_all"],
        }
        print(json.dumps(row))
        rows.append(row)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
