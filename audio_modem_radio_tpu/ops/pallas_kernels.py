"""Pallas TPU kernels for the demodulation hot path.

``psk_project_diff`` fuses the dominant stages of PSK receive — overlap
construction, the blocked least-squares symbol projection (an MXU matmul
against a block-diagonal template), and the differential product — into one
kernel, so neither the overlapped sample rows nor the (re, im) projection
streams ever exist in HBM. Layout follows the package-wide rule: 128 symbols
per (128*spsym)-lane row, symbol index on the lane axis.

Grid: one program per row-block. Each program loads its (BLK_R, ROW) sample
tile plus the first rows of the *next* tile (the last symbol of each row
needs OV lanes of the following row, and the tile's last differential needs
the next tile's first symbol), assembles the overlap in VMEM, runs the
projection matmul, and writes the (BLK_R, 128) differential re/im tiles.

Measured on a v5e chip this runs at HBM bandwidth; the identical math as XLA
ops pays >100x in relayouts (lane-axis concats and (n, small) paddings).

On non-TPU backends the kernel runs in interpreter mode (slow but exact),
which is how the CPU test suite validates it against the XLA reference path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_SYM = 128  # symbols per lane row (matches ops.psk)


def _kernel(x_ref, xn_ref, w_ref, dre_ref, dim_ref):
    """One row-block: overlap build + projection matmul + differential."""
    x = x_ref[:]  # (blk, ROW)
    blk = x.shape[0]
    ov = w_ref.shape[0] - x.shape[1]

    # Rows r+1 for every row in the tile: roll the (blk+8)-row extended tile
    # up by one and keep the first blk rows.
    ext_rows = jnp.concatenate([x, xn_ref[:]], axis=0)  # (blk+8, ROW)
    nxt_rows = pltpu.roll(ext_rows, ext_rows.shape[0] - 1, axis=0)[:blk]
    xov = jnp.concatenate([x, nxt_rows[:, :ov]], axis=1)  # (blk, ROW+OV)

    # (blk, ROW+OV) @ (ROW+OV, 256) -> (blk, 256); cols [re x128 | im x128].
    out = jnp.dot(xov, w_ref[:], preferred_element_type=jnp.float32)
    # The next tile's first row, projected (for the cross-tile differential).
    xov_n = jnp.concatenate([xn_ref[0:1], xn_ref[1:2, :ov]], axis=1)
    nxt = jnp.dot(xov_n, w_ref[:], preferred_element_type=jnp.float32)  # (1, 256)

    re = out[:, :_BLOCK_SYM]
    im = out[:, _BLOCK_SYM:]

    def successor(v, v_next_row):
        """s_{k+1} in row-major (blk, 128) order, all 2-D ops (Mosaic can't
        flatten a 2-D vector): lane-roll left by one, then patch lane 127
        with the next row's lane 0."""
        ext = jnp.concatenate([v, v_next_row], axis=0)  # (blk+1, 128)
        rolled = pltpu.roll(ext, _BLOCK_SYM - 1, axis=1)[:blk]  # (r, c+1 mod 128)
        up = pltpu.roll(ext, ext.shape[0] - 1, axis=0)[:blk]  # row r+1
        lane = jax.lax.broadcasted_iota(jnp.int32, (blk, _BLOCK_SYM), 1)
        return jnp.where(lane == _BLOCK_SYM - 1, up[:, 0:1], rolled)

    r0, i0 = re, im
    r1 = successor(re, nxt[:, :_BLOCK_SYM])
    i1 = successor(im, nxt[:, _BLOCK_SYM:])
    dre_ref[:] = r1 * r0 + i1 * i0
    dim_ref[:] = i1 * r0 - r1 * i0


def _kernel_batched(best_ref, x_ref, xn_ref, w_ref, dre_ref, dim_ref):
    """Batched variant: identical math; W arrives pre-selected per capture
    via the scalar-prefetch index_map (best_ref is consumed there)."""
    del best_ref
    _kernel(x_ref, xn_ref, w_ref.at[0], dre_ref, dim_ref)


@functools.partial(jax.jit, static_argnames=("rows_per_capture", "block_rows", "interpret"))
def psk_project_diff_batch(
    x3d: jnp.ndarray,
    w_all: jnp.ndarray,
    best: jnp.ndarray,
    rows_per_capture: int,
    block_rows: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-batch fused projection+differential in ONE kernel launch.

    vmapping the single-capture kernel costs thousands of tiny grid steps
    (grid-iteration overhead dominated the runtime); here the batch is
    flattened to (B*R, ROW) rows and a single grid covers it, with each
    program's template selected by its capture's winning timing offset via
    scalar prefetch.

    Args:
      x3d: (B, R, ROW) sample rows per capture (R = rows_per_capture,
        multiple of block_rows; zero-pad rows at each capture's tail).
      w_all: (n_offsets, ROW+OV, 256) stacked templates.
      best: (B,) int32 winning offset per capture.
    Returns (d_re, d_im) of shape (B, R, 128). Entries at capture tails
    (pad rows / the final no-successor slot) are garbage, as in the XLA path.
    """
    b, r, row = x3d.shape
    if r != rows_per_capture or r % block_rows:
        raise ValueError("rows_per_capture mismatch or not a multiple of block_rows")
    c = w_all.shape[1]
    steps_per_capture = r // block_rows
    grid = (b * steps_per_capture,)
    x2d = x3d.reshape(b * r, row)
    # The final program's "next rows" block is clamped to the last in-bounds
    # window instead of padding the (huge) input: its diffs land in the
    # capture's zero-pad tail, which is garbage either way. Saves a full-array
    # pad copy that profiled at ~17% of the whole pipeline.
    last_block8 = b * r // 8 - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, row), lambda i, best_ref: (i, 0)),
            pl.BlockSpec(
                (8, row),
                lambda i, best_ref: (
                    jnp.minimum(i * (block_rows // 8) + block_rows // 8, last_block8),
                    0,
                ),
            ),
            pl.BlockSpec(
                (1, c, 2 * _BLOCK_SYM),
                lambda i, best_ref, spc=steps_per_capture: (best_ref[i // spc], 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, _BLOCK_SYM), lambda i, best_ref: (i, 0)),
            pl.BlockSpec((block_rows, _BLOCK_SYM), lambda i, best_ref: (i, 0)),
        ],
    )
    dre, dim = pl.pallas_call(
        _kernel_batched,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * r, _BLOCK_SYM), jnp.float32),
            jax.ShapeDtypeStruct((b * r, _BLOCK_SYM), jnp.float32),
        ],
        interpret=interpret,
    )(best.astype(jnp.int32), x2d, x2d, w_all)
    return dre.reshape(b, r, _BLOCK_SYM), dim.reshape(b, r, _BLOCK_SYM)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def psk_project_diff(
    x2d: jnp.ndarray, w: jnp.ndarray, block_rows: int = 64, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused overlap + projection + differential detection.

    Args:
      x2d: (R, ROW) contiguous sample rows, 128 symbols per row (NO overlap
        columns — the kernel assembles them in VMEM). R must be a multiple of
        ``block_rows``.
      w: (ROW+OV, 256) block-diagonal dual-basis template for the chosen
        timing offset, columns [re x 128 | im x 128]. OV <= ROW.
      block_rows: rows per kernel program, multiple of 8.
      interpret: run in Pallas interpreter mode (for CPU tests).

    Returns ``(d_re, d_im)``, each (R, 128): differential products in
    flattened row-major symbol order; the final entry is meaningless (no
    successor symbol) and callers ignore it like the XLA path does.
    """
    r, row = x2d.shape
    c = w.shape[0]
    if r % block_rows:
        raise ValueError(f"rows {r} not a multiple of block_rows {block_rows}")
    if block_rows % 8:
        raise ValueError("block_rows must be a multiple of 8")
    if not row >= c - row >= 0:
        raise ValueError(f"overlap {c - row} must be within one row ({row})")
    grid = (r // block_rows,)
    # Zero rows appended so the last program's "next rows" load stays in bounds.
    xpad = jnp.concatenate([x2d, jnp.zeros((8, row), x2d.dtype)], axis=0)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, row), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # 8-row window starting at the next tile's first row (block units
            # of 8 rows).
            pl.BlockSpec(
                (8, row),
                lambda i: (i * (block_rows // 8) + block_rows // 8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c, 2 * _BLOCK_SYM), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, _BLOCK_SYM), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, _BLOCK_SYM), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, _BLOCK_SYM), jnp.float32),
            jax.ShapeDtypeStruct((r, _BLOCK_SYM), jnp.float32),
        ],
        interpret=interpret,
    )(xpad, xpad, w)
