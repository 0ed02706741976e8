"""Shared honest device timing for the benchmark scripts.

``jax.block_until_ready`` does NOT wait for device execution over the axon
tunnel (measured round 3: an 8-rep matmul loop "finished" at 5,559 TFLOP/s
on a ~200 TFLOP/s chip), so any timing drained with it alone reads the
dispatch pipeline, not the device. A host fetch of any output value IS a
true sync, and programs execute in dispatch order, so fetching a tiny slice
of the LAST dispatched output transitively syncs every rep. Validated
against a forced serial data-dependent chain at the headline QPSK config:
chained 36.0 ms/rep vs pipelined+fetch 35.3 ms/rep (benchmarks/honest.py).

``timed`` reports the incremental per-rep slope between 2 and 8 reps, which
cancels the fixed fetch RTT (~30 ms) and any residual warmup.
"""

from __future__ import annotations

import time

import numpy as np


def _fetch(out) -> None:
    """Host-fetch a tiny slice of one output leaf: a TRUE execution sync."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple([0] * (leaf.ndim - 1)) + (slice(0, 2),) if leaf.ndim else ()
    np.asarray(leaf[idx] if leaf.ndim else leaf)


def timed(fn, *args, reps: int = 8, rounds: int = 2) -> float:
    """Honest seconds per dispatch of ``fn(*args)`` (slope between 2 and
    ``reps`` pipelined reps, best of ``rounds``; value-fetch synced)."""
    out = fn(*args)
    _fetch(out)  # compile + warm, true sync

    def run(n: int) -> float:
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        _fetch(o)
        return time.perf_counter() - t0

    t2 = min(run(2) for _ in range(rounds))
    t8 = min(run(reps) for _ in range(rounds))
    return max((t8 - t2) / (reps - 2), 1e-9)
