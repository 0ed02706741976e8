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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_SYM = 128  # symbols per lane row (matches ops.psk)


def _to_f32(v: jnp.ndarray) -> jnp.ndarray:
    """VMEM-side cast to f32. int16 input rows halve the kernel's HBM read
    (the decide kernel runs at the f32 DMA floor — PERF.md); Mosaic has no
    direct i16->f32, so integers route through i32."""
    if jnp.issubdtype(v.dtype, jnp.integer):
        return v.astype(jnp.int32).astype(jnp.float32)
    return v


def _look_rows(dtype) -> int:
    """Sublane count of the next-rows lookahead block: narrow dtypes have
    taller minimal tiles ((16, 128) for 16-bit, (32, 128) for 8-bit), so an
    8-row block would be illegal for them."""
    return {1: 32, 2: 16}.get(jnp.dtype(dtype).itemsize, 8)


def _project_diff_body(x_ref, xn_ref, w2d) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared tile math: overlap build + projection matmul + differential.

    Returns the (blk, 128) differential (d_re, d_im) tiles in registers/VMEM.
    """
    x = _to_f32(x_ref[:])  # (blk, ROW)
    blk = x.shape[0]
    ov = w2d.shape[0] - x.shape[1]

    xn = _to_f32(xn_ref[:])
    # Next-row HEADS (rows r+1, first OV lanes) for every row in the tile:
    # build the extended column only OV lanes wide and roll it up by one.
    # (The first formulation concatenated + rolled the full (blk+LOOK, ROW)
    # tile and then used ov/ROW of it — 10x the sublane-roll work at the
    # 9600-baud geometry.)
    ext_h = jnp.concatenate([x[:, :ov], xn[:, :ov]], axis=0)  # (blk+LOOK, OV)
    nxt_h = pltpu.roll(ext_h, ext_h.shape[0] - 1, axis=0)[:blk]
    xov = jnp.concatenate([x, nxt_h], axis=1)  # (blk, ROW+OV)

    # (blk, ROW+OV) @ (ROW+OV, 256) -> (blk, 256); cols [re x128 | im x128].
    # The template dtype drives the matmul precision: bf16 templates run the
    # MXU at 4x the f32 rate with f32 accumulation. Differential SIGN
    # decisions tolerate the ~8-bit input mantissa easily — audio channels
    # sit far below the ~58 dB effective SNR of a bf16 projection.
    xov = xov.astype(w2d.dtype)
    out = jnp.dot(xov, w2d, preferred_element_type=jnp.float32)
    # The next tile's first row, projected (for the cross-tile differential).
    if jnp.issubdtype(x_ref.dtype, jnp.integer):
        # A row-1 slice of the CAST tile carries a {1,0} sublane-offset
        # layout Mosaic cannot lane-concatenate ("result/input offset
        # mismatch on non-concat dimension") — realign row 1 to sublane 0
        # with a roll before slicing. The f32 branch below keeps the raw ref
        # slices the measured production kernel uses.
        xn1 = pltpu.roll(xn, xn.shape[0] - 1, axis=0)[0:1, :ov]
        xov_n = jnp.concatenate([xn[0:1], xn1], axis=1).astype(w2d.dtype)
    else:
        xov_n = jnp.concatenate([xn_ref[0:1], xn_ref[1:2, :ov]], axis=1).astype(w2d.dtype)
    nxt = jnp.dot(xov_n, w2d, preferred_element_type=jnp.float32)  # (1, 256)

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
    return r1 * r0 + i1 * i0, i1 * r0 - r1 * i0


def _kernel(x_ref, xn_ref, w_ref, dre_ref, dim_ref):
    """One row-block: overlap build + projection matmul + differential."""
    dre, dim = _project_diff_body(x_ref, xn_ref, w_ref[:])
    dre_ref[:] = dre
    dim_ref[:] = dim


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
    look = _look_rows(x3d.dtype)
    last_look = b * r // look - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, row), lambda i, best_ref: (i, 0)),
            pl.BlockSpec(
                (look, row),
                lambda i, best_ref, lk=look: (
                    jnp.minimum(i * (block_rows // lk) + block_rows // lk, last_look),
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
    look = _look_rows(x2d.dtype)
    # Zero rows appended so the last program's "next rows" load stays in bounds.
    xpad = jnp.concatenate([x2d, jnp.zeros((look, row), x2d.dtype)], axis=0)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, row), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # lookahead window starting at the next tile's first row (block
            # units of `look` rows).
            pl.BlockSpec(
                (look, row),
                lambda i, lk=look: (i * (block_rows // lk) + block_rows // lk, 0),
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


def _project_diff_body_succ(x_ref, xn_ref, w2d) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Successor-column tile math: the differential from ONE matmul's slices.

    ``w2d`` is a 4*_BLOCK_SYM-wide template (see
    ``ops.psk._blocked_templates_succ``): columns [re | im | re_succ |
    im_succ]. The roll-based body pays three VPU relayouts per tile — the
    (blk+8, ROW) extended-tile concat+roll for the next rows, the (blk,
    ROW+OV) lane concat of the overlap view, and the concat+roll+iota/where
    successor patching of both projection streams. Here the only lane work
    left is the (blk+8, OV) next-row-head build; the overlap contribution is
    a second small dot (OV columns) and the successor symbols are matmul
    output columns. Bitwise identical to :func:`_project_diff_body` (same
    template rows, same dot accumulation).
    """
    x = _to_f32(x_ref[:])  # (blk, ROW)
    blk, row = x.shape
    ov = w2d.shape[0] - row

    # Next-row heads, built only OV lanes wide (the roll body builds the full
    # ROW-wide extended tile).
    ext_h = jnp.concatenate([x[:, :ov], _to_f32(xn_ref[:, :ov])], axis=0)
    nxt_h = pltpu.roll(ext_h, ext_h.shape[0] - 1, axis=0)[:blk]  # (blk, OV)

    out = jnp.dot(x.astype(w2d.dtype), w2d[:row], preferred_element_type=jnp.float32)
    out = out + jnp.dot(
        nxt_h.astype(w2d.dtype), w2d[row:], preferred_element_type=jnp.float32
    )  # (blk, 512)

    r0 = out[:, 0 * _BLOCK_SYM : 1 * _BLOCK_SYM]
    i0 = out[:, 1 * _BLOCK_SYM : 2 * _BLOCK_SYM]
    r1 = out[:, 2 * _BLOCK_SYM : 3 * _BLOCK_SYM]
    i1 = out[:, 3 * _BLOCK_SYM : 4 * _BLOCK_SYM]
    return r1 * r0 + i1 * i0, i1 * r0 - r1 * i0


def _kernel_decide(
    best_ref, rot_ref, x_ref, xn_ref, w_ref, hi_ref, lo_ref=None, *,
    steps_per_capture, n_psk, variant="roll",
):
    """Projection + differential + per-capture derotation + bit decision.

    Emits uint8 decision lanes directly — the float differential streams
    never reach HBM (4x fewer output bytes than the float kernel, and the
    separate derotate and Gray-decision passes disappear). ``rot_ref`` holds
    (cosθ, sinθ) per capture from the pass-1 blind CFO estimate; the
    identity rotation makes this the plain (cfo-off) pipeline.

    ``n_psk=8`` (round 5) emits the π/4-sector stream (uint8 0..7, ONE
    output lane) — the input format of the D8PSK Pallas sync tail
    (parallel.batch.psk8_kernel_sync_tail) — replacing the float-stream
    front end + XLA windowed derotation + elementwise sector pass that
    round-trip ~9 B/symbol through HBM (psk8_stage_profile.json r4: the
    front half of the 8PSK pipeline ran at 78 GS/s where QPSK's fused
    decide runs 141).
    """
    del best_ref  # consumed by the template index_map
    if variant == "succ":
        dre, dim = _project_diff_body_succ(x_ref, xn_ref[:], w_ref[0])
    else:
        dre, dim = _project_diff_body(x_ref, xn_ref, w_ref[0])
    cap = pl.program_id(0) // steps_per_capture
    c = rot_ref[cap, 0]
    s = rot_ref[cap, 1]
    dr = dre * c + dim * s
    di = dim * c - dre * s
    if n_psk == 8:
        # Nearest k·π/4 sector, boundaries at 22.5°+k·45° (ops.psk.
        # psk8_sector_stream math verbatim): axis sector when one component
        # dominates by > tan(67.5°), diagonal otherwise. Float selects
        # throughout (bool-valued where lowers to an i8->i1 truncation
        # Mosaic rejects); one f32->i32->u8 cast at the store.
        t = float(np.tan(np.pi / 8))
        ax, bx = jnp.abs(dr), jnp.abs(di)
        diag = (bx > t * ax) & (ax > t * bx)
        k_axis = jnp.where(
            ax >= bx,
            jnp.where(dr >= 0, 0.0, 4.0),
            jnp.where(di >= 0, 2.0, 6.0),
        )
        k_diag = jnp.where(
            di >= 0,
            jnp.where(dr >= 0, 1.0, 3.0),
            jnp.where(dr >= 0, 7.0, 5.0),
        )
        sec = jnp.where(diag, k_diag, k_axis)
        hi_ref[:] = sec.astype(jnp.int32).astype(jnp.uint8)
    elif n_psk == 4:
        # Gray sectors, boundaries at odd 45 degrees: sign/compare only.
        # Select FLOATS, not bools — a bool-valued where lowers to an
        # i8->i1 vector truncation Mosaic rejects.
        swap = jnp.abs(di) > jnp.abs(dr)
        neg = (jnp.where(swap, di, dr) < 0).astype(jnp.uint8)
        hi_ref[:] = neg
        lo_ref[:] = neg ^ swap.astype(jnp.uint8)
    else:
        hi_ref[:] = (dr < 0).astype(jnp.uint8)
        lo_ref[:] = (di < 0).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_capture", "n_psk", "block_rows", "interpret", "variant"),
)
def psk_project_decide_batch(
    x3d: jnp.ndarray,
    w_all: jnp.ndarray,
    best: jnp.ndarray,
    rot: jnp.ndarray,
    rows_per_capture: int,
    n_psk: int = 4,
    block_rows: int = 256,
    interpret: bool = False,
    variant: str = "roll",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-batch fused projection+differential+derotate+decide kernel.

    Like :func:`psk_project_diff_batch` but the outputs are uint8 decision
    streams: Gray (hi, lo) dibit lanes for ``n_psk=4``, sign bits of the
    (re, im) differential for ``n_psk=2``.

    Args:
      x3d: (B, R, ROW) sample rows (R = rows_per_capture, multiple of
        block_rows).
      w_all: (n_offsets, ROW+OV, 256) stacked templates for
        ``variant="roll"``; (n_offsets, ROW+OV, 512) successor-column
        templates (``ops.psk._blocked_templates_succ``) for
        ``variant="succ"``, which trades a second (cheap, MXU) dot for the
        roll body's three per-tile VPU relayouts.
      best: (B,) int32 winning timing offset per capture.
      rot: (B, 2) float32 per-capture (cosθ, sinθ) derotation.
    Returns (hi, lo) uint8 of shape (B, R, 128) for ``n_psk`` 2/4, or ONE
    uint8 (B, R, 128) π/4-sector array for ``n_psk=8``; capture-tail
    entries are garbage (pad rows), which sync/parse ignores.
    """
    b, r, row = x3d.shape
    if r != rows_per_capture or r % block_rows:
        raise ValueError("rows_per_capture mismatch or not a multiple of block_rows")
    w_width = 4 * _BLOCK_SYM if variant == "succ" else 2 * _BLOCK_SYM
    if w_all.shape[2] != w_width:
        raise ValueError(
            f"template width {w_all.shape[2]} does not match variant {variant!r}"
        )
    c = w_all.shape[1]
    steps_per_capture = r // block_rows
    grid = (b * steps_per_capture,)
    x2d = x3d.reshape(b * r, row)
    look = _look_rows(x3d.dtype)
    last_look = b * r // look - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, row), lambda i, best_ref, rot_ref: (i, 0)),
            pl.BlockSpec(
                (look, row),
                lambda i, best_ref, rot_ref, lk=look: (
                    jnp.minimum(i * (block_rows // lk) + block_rows // lk, last_look),
                    0,
                ),
            ),
            pl.BlockSpec(
                (1, c, w_width),
                lambda i, best_ref, rot_ref, spc=steps_per_capture: (
                    best_ref[i // spc],
                    0,
                    0,
                ),
            ),
        ],
        out_specs=(
            # n_psk=8 emits ONE uint8 sector lane; 2/4 emit (hi, lo) lanes.
            [pl.BlockSpec((block_rows, _BLOCK_SYM), lambda i, best_ref, rot_ref: (i, 0))]
            * (1 if n_psk == 8 else 2)
        ),
    )
    kern = functools.partial(
        _kernel_decide, steps_per_capture=steps_per_capture, n_psk=n_psk, variant=variant
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * r, _BLOCK_SYM), jnp.uint8)
        ] * (1 if n_psk == 8 else 2),
        interpret=interpret,
    )(best.astype(jnp.int32), rot.astype(jnp.float32), x2d, x2d, w_all)
    if n_psk == 8:
        return out[0].reshape(b, r, _BLOCK_SYM)
    hi, lo = out
    return hi.reshape(b, r, _BLOCK_SYM), lo.reshape(b, r, _BLOCK_SYM)


# --- fused dual-tone FSK projection + decision ---------------------------------

def _kernel_fsk_decide(best_ref, x_ref, xn_ref, w_ref, bits_ref, *, spr):
    """Overlap build + tone-energy projection + mark/space decision.

    One read of the sample rows; the (blk, row+ov) overlap view, the
    (row+ov, 4*spr) projection matmul and the energy compare all stay in
    VMEM — the XLA path materialized the overlap rows AND re-read them for
    the matmul (~12.5 B/sample of HBM traffic for a 4-MAC/sample
    projection; this kernel reads the 4 B/sample once).
    """
    del best_ref  # consumed by the template index_map
    x = x_ref[:]
    blk = x.shape[0]
    w2d = w_ref[0]
    row = x.shape[1]
    ov = w2d.shape[0] - row
    ext_rows = jnp.concatenate([x, xn_ref[:]], axis=0)
    nxt_rows = pltpu.roll(ext_rows, ext_rows.shape[0] - 1, axis=0)[:blk]
    # Two dots instead of building the (blk, row+ov) overlap view: the
    # lane-dim concat forces a full-tile relayout per step that costs more
    # than the small second matmul.
    pj = jnp.dot(x, w2d[:row], preferred_element_type=jnp.float32)
    pj = pj + jnp.dot(nxt_rows[:, :ov], w2d[row:], preferred_element_type=jnp.float32)
    em = pj[:, 0 * spr : 1 * spr] ** 2 + pj[:, 1 * spr : 2 * spr] ** 2
    es = pj[:, 2 * spr : 3 * spr] ** 2 + pj[:, 3 * spr : 4 * spr] ** 2
    bits_ref[:] = (em > es).astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("rows_per_capture", "spr", "block_rows", "interpret")
)
def fsk_project_bits_batch(
    x3d: jnp.ndarray,
    w_all: jnp.ndarray,
    best: jnp.ndarray,
    rows_per_capture: int,
    spr: int,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-batch fused dual-tone FSK demod (pass 2).

    Args:
      x3d: (B, R, row) sample rows (R = rows_per_capture, multiple of
        block_rows; zero-pad tails).
      w_all: (n_offsets, row+ov, 4*spr) stacked tone-quadrature templates.
      best: (B,) int32 winning timing offset per capture.
    Returns uint8 bits of shape (B, R*spr); capture-tail entries are pad
    garbage the sync/parse stage ignores.
    """
    b, r, row = x3d.shape
    if r != rows_per_capture or r % block_rows:
        raise ValueError("rows_per_capture mismatch or not a multiple of block_rows")
    c = w_all.shape[1]
    grid = (b * r // block_rows,)
    x2d = x3d.reshape(b * r, row)
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
                (1, c, w_all.shape[2]),
                lambda i, best_ref, spc=r // block_rows: (best_ref[i // spc], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((block_rows, spr), lambda i, best_ref: (i, 0)),
    )
    kern = functools.partial(_kernel_fsk_decide, spr=spr)
    bits = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * r, spr), jnp.uint8),
        interpret=interpret,
    )(best.astype(jnp.int32), x2d, x2d, w_all)
    return bits.reshape(b, r * spr)


def _kernel_fsk_tile(best_ref, x_ref, w_ref, bits_ref, *, spr):
    """Tone-energy projection + decision with FULL-LANE bit stores.

    Retry of ``_kernel_fsk_decide``'s negative result: its (blk, spr=16)
    uint8 stores mask 112/128 lanes and pack sublanes 4:1 — a serialized
    path in Mosaic (PERF.md round 2). Here the (blk, spr) margins are
    reshaped IN VMEM to (blk*spr/128, 128) row-major-equivalent tiles, so
    the store is full-lane uint8 tiles ((32, 128) = the minimal u8 tile at
    blk=256, spr=16). Input rows arrive pre-overlapped from host shaping
    (row+ov columns), so there is no next-block patching either; integer
    rows cast to f32 in VMEM (halving the HBM read, like the PSK decide
    kernel).
    """
    del best_ref  # consumed by the template index_map
    x = _to_f32(x_ref[:])  # (blk, row+ov)
    blk = x.shape[0]
    w2d = w_ref[0]  # (row+ov, 4*spr)
    pj = jnp.dot(x, w2d, preferred_element_type=jnp.float32)
    em = pj[:, 0 * spr : 1 * spr] ** 2 + pj[:, 1 * spr : 2 * spr] ** 2
    es = pj[:, 2 * spr : 3 * spr] ** 2 + pj[:, 3 * spr : 4 * spr] ** 2
    margin = em - es  # (blk, spr)
    # Sublane->lane redistribution: out[j, l] = margin[g*j + l//spr, l%spr]
    # (g = 128//spr groups per output row). Mosaic rejects the direct
    # (blk, spr) -> (blk*spr/128, 128) shape cast ("unsupported shape
    # cast"), so the relayout runs as g pairs of tiny selection matmuls on
    # the MXU: P_t picks rows g*j+t, Q_t places their spr margins into
    # lanes [spr*t, spr*t+spr). ~7% of the main dot's MACs at spr=16.
    g = 128 // spr
    out_rows = blk * spr // 128
    col = jax.lax.broadcasted_iota(jnp.int32, (out_rows, blk), 1)
    orow = jax.lax.broadcasted_iota(jnp.int32, (out_rows, blk), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (spr, 128), 1)
    srow = jax.lax.broadcasted_iota(jnp.int32, (spr, 128), 0)
    acc = jnp.zeros((out_rows, 128), jnp.float32)
    for t in range(g):
        P = (col == g * orow + t).astype(jnp.float32)  # (out_rows, blk)
        sel = jnp.dot(P, margin, preferred_element_type=jnp.float32)
        Q = (lane == spr * t + srow).astype(jnp.float32)  # (spr, 128)
        acc = acc + jnp.dot(sel, Q, preferred_element_type=jnp.float32)
    bits_ref[:] = (acc > 0).astype(jnp.int32).astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("rows_per_capture", "spr", "block_rows", "interpret")
)
def fsk_tile_bits_batch(
    x3d: jnp.ndarray,
    w_all: jnp.ndarray,
    best: jnp.ndarray,
    rows_per_capture: int,
    spr: int,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-batch fused dual-tone FSK demod over PRE-OVERLAPPED rows.

    Args:
      x3d: (B, R, row+ov) host-overlapped sample rows (float32 or int16 —
        integer rows cast in VMEM; see ``host_shape_batch``), R a multiple
        of block_rows.
      w_all: (n_offsets, row+ov, 4*spr) stacked tone-quadrature templates.
      best: (B,) int32 winning timing offset per capture.
    Returns uint8 bits of shape (B, R*spr); capture-tail entries are pad
    garbage the sync/parse stage ignores.
    """
    b, r, c = x3d.shape
    if r != rows_per_capture or r % block_rows:
        raise ValueError("rows_per_capture mismatch or not a multiple of block_rows")
    if 128 % spr:
        raise ValueError(
            "the lane redistribution requires spr to divide 128 "
            "(out[j, l] = margin[g*j + l//spr, l%spr] with g = 128//spr)"
        )
    if (block_rows * spr) % 128 or (block_rows * spr) // 128 < 8:
        raise ValueError("block_rows*spr must be a multiple of 128 (>= 8 sublanes)")
    if w_all.shape[1] != c:
        raise ValueError("template rows must match the overlapped row length")
    grid = (b * r // block_rows,)
    x2d = x3d.reshape(b * r, c)
    out_sub = block_rows * spr // 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i, best_ref: (i, 0)),
            pl.BlockSpec(
                (1, c, w_all.shape[2]),
                lambda i, best_ref, spc=r // block_rows: (best_ref[i // spc], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((out_sub, 128), lambda i, best_ref: (i, 0)),
    )
    kern = functools.partial(_kernel_fsk_tile, spr=spr)
    bits = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * r * spr // 128, 128), jnp.uint8),
        interpret=interpret,
    )(best.astype(jnp.int32), x2d, w_all)
    return bits.reshape(b, r * spr)


def _fir_analytic(ext: jnp.ndarray, wf: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FIR input rows (m, c_pad) -> analytic stream tiles (zr, zi), (m, 128).

    ``wf`` is either the dense (c_pad, 256) decimating analytic-FIR template
    ([re lanes | im lanes]) or its banded (n_g, width, 2*cols_pg) form: the
    dense template is ~60% zeros at dec=4 (column m's taps span rows
    [dec*m, dec*m+taps) only), so group g computes output columns
    [g*cols_pg, (g+1)*cols_pg) (re and im) from the 128-aligned input slice
    [stride*g, stride*g+width) — same sums, 2.5x fewer MACs at FSK9600.
    """
    if wf.ndim == 3:
        n_g, width, two_cols = wf.shape
        stride = (ext.shape[1] - width) // (n_g - 1)
        cols_pg = two_cols // 2
        zs = [
            jnp.dot(
                ext[:, stride * g : stride * g + width],
                wf[g],
                preferred_element_type=jnp.float32,
            )
            for g in range(n_g)
        ]
        zr = jnp.concatenate([z[:, :cols_pg] for z in zs], axis=1)
        zi = jnp.concatenate([z[:, cols_pg:] for z in zs], axis=1)
        return zr, zi
    z2 = jnp.dot(ext, wf, preferred_element_type=jnp.float32)  # (m, 256)
    return z2[:, :128], z2[:, 128:]


def _redistribute_rows(p: jnp.ndarray, nrow2: int, row2: int, ov2: int) -> jnp.ndarray:
    """(FB+2, 128) flat-stream tiles -> (nrow2, row2+ov2) overlapped rows.

    Out row j = p tiles [rows_pb*j, rows_pb*j + cat) lane-concatenated (the
    direct reshape is an unsupported Mosaic shape cast). CHUNKED in groups
    of 16 output rows so the selection-dot cost stays LINEAR in nrow2 (a
    single (nrow2, m) selection is quadratic: m ~ rows_pb*nrow2).
    """
    rows_pb = row2 // 128
    cat = (row2 + ov2) // 128
    chunk = min(16, nrow2)
    mc = rows_pb * chunk + 2  # p rows feeding one chunk (+2 spill)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, mc), 1)
    orow = jax.lax.broadcasted_iota(jnp.int32, (chunk, mc), 0)
    chunks = []
    for q in range(nrow2 // chunk):
        base = rows_pb * chunk * q
        pq = p[base : base + mc]
        parts = []
        for t in range(cat):
            P = (col == rows_pb * orow + t).astype(jnp.float32)
            parts.append(jnp.dot(P, pq, preferred_element_type=jnp.float32))
        chunks.append(jnp.concatenate(parts, axis=1))
    return jnp.concatenate(chunks, axis=0)  # (nrow2, row2+ov2)


def _kernel_fsk_disc(best_ref, x_ref, xn_ref, wf_ref, wb_ref, sr_ref, si_ref,
                     *, nrow2, row2, ov2, spr2):
    """Fused FSK discriminator: FIR front end + phasor product + fractional
    boxcar, per grid step — the per-bit vector-frequency sums are the ONLY
    full-stream output (8 B/bit vs the ~350 B/bit the XLA pipeline streams
    through HBM between its stages). atan2 + the calibrated equalizer +
    decisions run in XLA on that tiny stream.

    Per step: FB = nrow2*row2/128 FIR input rows (+2 lookahead) project
    through the dense decimating-FIR template (one MXU dot), the analytic
    stream differentiates into per-sample phasors (flat shift-by-one via
    lane rolls), the (FB+2, 128) phasor tiles redistribute into
    (nrow2, row2+ov2) boxcar rows (tiny selection dots + lane concat), and
    the per-offset boxcar template (scalar-prefetch selected) folds them to
    per-bit sums.
    """
    del best_ref
    x = _to_f32(x_ref[:])        # (FB, c_pad)
    xn = _to_f32(xn_ref[:])      # (look, c_pad)
    ext = jnp.concatenate([x, xn[:2]], axis=0)  # (FB+2, c_pad)
    m = ext.shape[0]
    zr, zi = _fir_analytic(ext, wf_ref[:])

    # p[n] = z[n+1] * conj(z[n]) over the flat row-major stream.
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)

    def shift1(v):
        same = pltpu.roll(v, 127, axis=1)
        nxt = pltpu.roll(v, m - 1, axis=0)
        return jnp.where(lane < 127, same, pltpu.roll(nxt, 127, axis=1))

    z1r, z1i = shift1(zr), shift1(zi)
    pr = z1r * zr + z1i * zi     # (FB+2, 128)
    pi = z1i * zr - z1r * zi

    wb = wb_ref[0]               # (row2+ov2, spr2)
    rp = _redistribute_rows(pr, nrow2, row2, ov2)
    ip = _redistribute_rows(pi, nrow2, row2, ov2)
    sr_ref[:] = jnp.dot(rp, wb, preferred_element_type=jnp.float32)
    si_ref[:] = jnp.dot(ip, wb, preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_capture", "nrow2", "row2", "ov2", "spr2", "interpret"),
)
def fsk_disc_sums_batch(
    x3d: jnp.ndarray,
    w_fir: jnp.ndarray,
    w_box: jnp.ndarray,
    best: jnp.ndarray,
    rows_per_capture: int,
    nrow2: int,
    row2: int,
    ov2: int,
    spr2: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-batch fused FSK discriminator front half.

    Args:
      x3d: (B, R, c_pad) host-overlapped FIR input windows (float32/int16;
        c_pad = the 128-padded ``128*dec + taps - dec``), R a multiple of
        FB = nrow2*row2/128.
      w_fir: (c_pad, 256) decimating analytic-FIR template.
      w_box: (n_offsets, row2+ov2, spr2) boxcar templates.
      best: (B,) int32 winning timing offset per capture.
    Returns per-bit vector sums (sr, si), each (B, R*128//row2 * spr2).
    Capture-tail entries are pad garbage.
    """
    b, r, c = x3d.shape
    fb = nrow2 * row2 // 128
    if r != rows_per_capture or r % fb:
        raise ValueError("rows_per_capture mismatch or not a multiple of FB")
    if c % 128:
        raise ValueError("c_pad must be 128-aligned")
    if w_fir.ndim == 2 and w_fir.shape != (c, 256):
        raise ValueError("dense FIR template must be (c_pad, 256)")
    if row2 % 128 or (row2 + ov2) % 128:
        raise ValueError("row2 and row2+ov2 must be 128-aligned")
    grid = (b * r // fb,)
    x2d = x3d.reshape(b * r, c)
    look = _look_rows(x3d.dtype)
    last_look = b * r // look - 1
    r2 = r * 128 // row2  # boxcar rows per capture
    wf_spec = (
        pl.BlockSpec(w_fir.shape, lambda i, best_ref: (0, 0, 0))
        if w_fir.ndim == 3
        else pl.BlockSpec((c, 256), lambda i, best_ref: (0, 0))
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((fb, c), lambda i, best_ref: (i, 0)),
            pl.BlockSpec(
                (look, c),
                lambda i, best_ref, lpb=fb // look: (
                    jnp.minimum((i + 1) * lpb, last_look),
                    0,
                ),
            ),
            wf_spec,
            pl.BlockSpec(
                (1, row2 + ov2, spr2),
                lambda i, best_ref, spc=r // fb: (best_ref[i // spc], 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((nrow2, spr2), lambda i, best_ref: (i, 0)),
            pl.BlockSpec((nrow2, spr2), lambda i, best_ref: (i, 0)),
        ],
    )
    kern = functools.partial(
        _kernel_fsk_disc, nrow2=nrow2, row2=row2, ov2=ov2, spr2=spr2
    )
    sr, si = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * r2, spr2), jnp.float32),
            jax.ShapeDtypeStruct((b * r2, spr2), jnp.float32),
        ],
        interpret=interpret,
    )(best.astype(jnp.int32), x2d, x2d, w_fir, w_box)
    return sr.reshape(b, r2 * spr2), si.reshape(b, r2 * spr2)


def _kernel_fsk_quad(best_ref, x_ref, xn_ref, wf_ref, wq_ref, out_ref,
                     *, nrow2, row2, ov2, spr2):
    """Fused mid-separation FSK matched filter: analytic FIR + per-bit tone
    quadrature correlation + noncoherent energy margin, per grid step — the
    per-bit mark-space margin is the ONLY full-stream output (4 B/bit).

    Same skeleton as :func:`_kernel_fsk_disc` minus the phasor product: the
    analytic tiles redistribute directly into boxcar rows, project against
    the per-offset quadrature template ([cos_m | sin_m | cos_s | sin_s]
    column groups of spr2, so spr2 must be 128-aligned for the lane slices),
    and combine as E_tone = |sum z e^{-jwt}|^2 per tone.
    """
    del best_ref
    x = _to_f32(x_ref[:])        # (FB, c_pad)
    xn = _to_f32(xn_ref[:])      # (look, c_pad)
    ext = jnp.concatenate([x, xn[:2]], axis=0)  # (FB+2, c_pad)
    zr, zi = _fir_analytic(ext, wf_ref[:])
    rz = _redistribute_rows(zr, nrow2, row2, ov2)
    ri = _redistribute_rows(zi, nrow2, row2, ov2)
    wq = wq_ref[0]               # (row2+ov2, 4*spr2)
    M = jnp.dot(rz, wq, preferred_element_type=jnp.float32)
    N = jnp.dot(ri, wq, preferred_element_type=jnp.float32)
    s = spr2
    u_m = M[:, :s] + N[:, s : 2 * s]
    v_m = N[:, :s] - M[:, s : 2 * s]
    u_s = M[:, 2 * s : 3 * s] + N[:, 3 * s :]
    v_s = N[:, 2 * s : 3 * s] - M[:, 3 * s :]
    out_ref[:] = u_m * u_m + v_m * v_m - u_s * u_s - v_s * v_s


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_capture", "nrow2", "row2", "ov2", "spr2", "interpret"),
)
def fsk_quad_margin_batch(
    x3d: jnp.ndarray,
    w_fir: jnp.ndarray,
    w_quad: jnp.ndarray,
    best: jnp.ndarray,
    rows_per_capture: int,
    nrow2: int,
    row2: int,
    ov2: int,
    spr2: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-batch fused mid-separation FSK matched filter.

    Args:
      x3d: (B, R, c_pad) host-overlapped FIR input windows (float32/int16),
        R a multiple of FB = nrow2*row2/128.
      w_fir: (c_pad, 256) analytic-FIR template (dec=1 for this family).
      w_quad: (n_offsets, row2+ov2, 4*spr2) tone-quadrature templates.
      best: (B,) int32 winning timing offset per capture.
    Returns the per-bit mark-space energy margin, (B, R*128//row2 * spr2)
    float32 (bit = margin > 0). Capture-tail entries are pad garbage.
    """
    b, r, c = x3d.shape
    fb = nrow2 * row2 // 128
    if r != rows_per_capture or r % fb:
        raise ValueError("rows_per_capture mismatch or not a multiple of FB")
    if c % 128 or spr2 % 128:
        raise ValueError("c_pad and spr2 must be 128-aligned")
    if w_fir.ndim == 2 and w_fir.shape != (c, 256):
        raise ValueError("dense FIR template must be (c_pad, 256)")
    if row2 % 128 or (row2 + ov2) % 128:
        raise ValueError("row2 and row2+ov2 must be 128-aligned")
    grid = (b * r // fb,)
    x2d = x3d.reshape(b * r, c)
    look = _look_rows(x3d.dtype)
    last_look = b * r // look - 1
    r2 = r * 128 // row2
    wf_spec = (
        pl.BlockSpec(w_fir.shape, lambda i, best_ref: (0, 0, 0))
        if w_fir.ndim == 3
        else pl.BlockSpec((c, 256), lambda i, best_ref: (0, 0))
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((fb, c), lambda i, best_ref: (i, 0)),
            pl.BlockSpec(
                (look, c),
                lambda i, best_ref, lpb=fb // look: (
                    jnp.minimum((i + 1) * lpb, last_look),
                    0,
                ),
            ),
            wf_spec,
            pl.BlockSpec(
                (1, row2 + ov2, 4 * spr2),
                lambda i, best_ref, spc=r // fb: (best_ref[i // spc], 0, 0),
            ),
        ],
        out_specs=[pl.BlockSpec((nrow2, spr2), lambda i, best_ref: (i, 0))],
    )
    kern = functools.partial(
        _kernel_fsk_quad, nrow2=nrow2, row2=row2, ov2=ov2, spr2=spr2
    )
    (margin,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b * r2, spr2), jnp.float32)],
        interpret=interpret,
    )(best.astype(jnp.int32), x2d, x2d, w_fir, w_quad)
    return margin.reshape(b, r2 * spr2)


# --- fused NEURAL chip extraction + codebook detection --------------------------

def _kernel_neural_extract(
    s_ref, ph_ref, x_ref, xn_ref, ct_ref, cb_ref, out_ref, *, nrow, spr, spc,
    bf16=False, compaction="loop", argmax="loop",
):
    """Fused learned-modem demod body: fs/4 downconversion + two-tile chip
    windows + per-offset chip projection + channel-phase unrotation +
    block-diagonal codebook scoring + per-symbol argmax — the uint8 symbol
    stream (1 B per 16 samples) is the ONLY output. The XLA pipeline
    materialized every stage between (the (rows, 512) windows, the
    (rows, spr*256) scores ~ 16 B/sample); extraction was 95% of the NEURAL
    batch (benchmarks/neural_stage_profile.json).

    Rows are UNROTATED (symbols aligned to sample 0): a whole-tile shift of
    q = k0//128 rows is an integral number of symbols (128 = 8 symbols at
    chip_len 2), so the caller rolls the symbol stream by q*spr afterwards
    instead of the capture rows before — no traced-offset row slice in the
    hot path. The in-row offset s = k0%128 selects the chip projection
    table per capture via scalar prefetch.
    """
    x = _to_f32(x_ref[:])        # (nrow, 128)
    xn = _to_f32(xn_ref[:])      # (look, 128)
    ext = jnp.concatenate([x, xn[:1]], axis=0)  # (nrow+1, 128)
    m = ext.shape[0]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    mod4 = lane1 % 4
    mr = jnp.where(mod4 == 0, 1.0, jnp.where(mod4 == 2, -1.0, 0.0))
    mi = jnp.where(mod4 == 1, -1.0, jnp.where(mod4 == 3, 1.0, 0.0))
    zr = ext * mr                # fs/4 downconversion, sign masks
    zi = ext * mi

    def nxt(v):  # row j+1 (the final row reads the clamped lookahead)
        return pltpu.roll(v, m - 1, axis=0)

    # Window pair x chip projection as FOUR dots against the table's row
    # blocks ([zr_j | zr_j+1 | zi_j | zi_j+1] @ ct): a lane-concat of rolled
    # tiles carries a sublane-offset layout Mosaic's concatenate rejects
    # (the PERF.md {1,0}-layout trap); dot operands relayout cleanly.
    # bf16 matmul inputs (opt-in): the kernel is MXU-bound on the codebook
    # scorer (~5.6 ms of the 12.1 ms extraction at f32 — the block-diagonal
    # layout pays an inherent 16x K-padding waste, so halving the MXU rate
    # term is the only lever left); bf16 doubles the MXU rate on v5e. The
    # ~8-bit mantissa loss sits on SCORES whose argmax margins are set by
    # codeword separation — symbol-exactness is pinned by test + the A/B
    # harness refuses to adopt a run whose symbols differ (PERF.md r5).
    mxu = jnp.bfloat16 if bf16 else jnp.float32
    ct = ct_ref[0].astype(mxu)   # (512, 128)
    chips = (
        jnp.dot(zr[:nrow].astype(mxu), ct[:128], preferred_element_type=jnp.float32)
        + jnp.dot(nxt(zr)[:nrow].astype(mxu), ct[128:256], preferred_element_type=jnp.float32)
        + jnp.dot(zi[:nrow].astype(mxu), ct[256:384], preferred_element_type=jnp.float32)
        + jnp.dot(nxt(zi)[:nrow].astype(mxu), ct[384:512], preferred_element_type=jnp.float32)
    )

    # Channel-phase unrotation as a (128, 128) block-rotation matmul built
    # from the per-capture phasor scalars: [cr|ci] -> [a cr + b ci | a ci - b cr].
    cap = pl.program_id(0) // spc
    a = ph_ref[cap, 0]
    b_ = ph_ref[cap, 1]
    half = chips.shape[1] // 2
    i2 = jax.lax.broadcasted_iota(jnp.int32, (chips.shape[1],) * 2, 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (chips.shape[1],) * 2, 1)
    eye = (i2 == j2).astype(jnp.float32)
    kk = (i2 == j2 + half).astype(jnp.float32) - (i2 + half == j2).astype(jnp.float32)
    chips = jnp.dot(chips, a * eye + b_ * kk, preferred_element_type=jnp.float32)

    scores = jnp.dot(
        chips.astype(mxu), cb_ref[:].astype(mxu),
        preferred_element_type=jnp.float32,
    )
    if argmax == "dot":
        # Index extraction as MXU work: per group, one-hot the max and dot
        # against a (256, 128) index/count matrix — lane g accumulates the
        # winning codeword INDEX, lane spr+g the number of maxima. The
        # VPU's where(lane2)/min reduction passes become one bf16 matmul
        # (one-hot and indices <= 255 are bf16-exact; f32 accumulation).
        # Tie semantics differ from the loop's first-max ONLY on exact
        # multi-way score ties between distinct codewords: the count gate
        # maps those to symbol 0 — identical on all-zero (padded/silence)
        # rows, where every score ties at 0 and the loop also yields 0.
        mxu2 = jnp.bfloat16
        r256 = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
        l128 = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
        agg = jnp.zeros((nrow, 128), jnp.float32)
        for g in range(spr):
            sc = scores[:, 256 * g : 256 * (g + 1)]
            mx = jnp.max(sc, axis=1, keepdims=True)
            oh = (sc >= mx).astype(mxu2)
            bg = (
                jnp.where(l128 == g, r256.astype(jnp.float32), 0.0)
                + jnp.where(l128 == spr + g, 1.0, 0.0)
            ).astype(mxu2)
            agg = agg + jnp.dot(oh, bg, preferred_element_type=jnp.float32)
        cnt_l = pltpu.roll(agg, 128 - spr, axis=1)  # lane g <- count_g
        sym8 = jnp.where((lane1 < spr) & (cnt_l == 1.0), agg, 0.0)
    else:
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (nrow, 256), 1)
        sym8 = jnp.zeros((nrow, 128), jnp.float32)
        for g in range(spr):  # first-max argmax per 256-lane codeword group
            sc = scores[:, 256 * g : 256 * (g + 1)]
            mx = jnp.max(sc, axis=1, keepdims=True)
            idx = jnp.min(jnp.where(sc >= mx, lane2, 256), axis=1, keepdims=True)
            sym8 = sym8 + jnp.where(lane1 == g, idx.astype(jnp.float32), 0.0)

    # Compact (nrow, spr used lanes) -> (nrow//cpk, 128) symbol tiles:
    # out[jj, t*spr + g] = sym8[cpk*jj + t, g].
    cpk = 128 // spr
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (nrow // cpk, 128), 1)
    if compaction == "stack":
        # One FULL-SIZE (nrow, nrow) @ (nrow, 128) selection dot instead of
        # cpk M=32 dots: chunk t of the product rows is exactly P_t @ sym8
        # (row q selects sym8 row cpk*(q % (nrow//cpk)) + q//(nrow//cpk)).
        # Bit-exact vs the loop (each output lane has exactly ONE nonzero
        # product term) — but measured SLOWER on chip
        # (neural_compaction_ab.json / neural_vpu_ab.json), kept opt-in.
        orows = nrow // cpk
        qi = jax.lax.broadcasted_iota(jnp.int32, (nrow, nrow), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (nrow, nrow), 1)
        Ps = (ci == cpk * (qi % orows) + qi // orows).astype(jnp.float32)
        out_big = jnp.dot(Ps, sym8, preferred_element_type=jnp.float32)
        parts = [
            jax.lax.slice(out_big, (t * orows, 0), ((t + 1) * orows, 128))
            for t in range(cpk)
        ]
    else:
        col = jax.lax.broadcasted_iota(jnp.int32, (nrow // cpk, nrow), 1)
        orow = jax.lax.broadcasted_iota(jnp.int32, (nrow // cpk, nrow), 0)
        parts = [
            jnp.dot(
                (col == cpk * orow + t).astype(jnp.float32), sym8,
                preferred_element_type=jnp.float32,
            )
            for t in range(cpk)
        ]
    acc = jnp.zeros((nrow // cpk, 128), jnp.float32)
    for t, part in enumerate(parts):
        rolled = pltpu.roll(part, t * spr, axis=1)
        keep = (lane_o >= t * spr) & (lane_o < t * spr + spr)
        acc = acc + jnp.where(keep, rolled, 0.0)
    out_ref[:] = acc.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "rows_per_capture", "spr", "nrow", "interpret", "bf16", "compaction",
        "argmax",
    ),
)
def neural_extract_batch(
    x2d: jnp.ndarray,
    chip_table: jnp.ndarray,
    codebook_blocked: jnp.ndarray,
    phasors: jnp.ndarray,
    s: jnp.ndarray,
    rows_per_capture: int,
    spr: int,
    nrow: int = 512,
    interpret: bool = False,
    bf16: bool = False,
    compaction: str = "loop",
    argmax: str = "loop",
) -> jnp.ndarray:
    """Whole-batch fused NEURAL symbol extraction.

    Args:
      x2d: (B*r3, 128) padded capture rows (float32/int16).
      chip_table: (128, 512, 2*cpr) per-offset chip projections
        (``_chip_shift_table``); 2*cpr must be 128 (chip_len 2).
      codebook_blocked: (128, spr*256) block-diagonal scorer.
      phasors: (B, 2) float32 per-capture channel (re, im) unit phasor.
      s: (B,) int32 in-row sample offset (k0 % 128).
      rows_per_capture: r3, a multiple of ``nrow``.
    Returns (B, r3 * spr) uint8 symbols on the UNROTATED grid — roll left
    by (k0 // 128) * spr per capture to align symbol 0 to the preamble.
    """
    br, w = x2d.shape
    if w != 128 or br % rows_per_capture:
        raise ValueError("x2d must be (B*r3, 128)")
    b = br // rows_per_capture
    if rows_per_capture % nrow:
        raise ValueError("rows_per_capture must be a multiple of nrow")
    if chip_table.shape[2] != 128 or codebook_blocked.shape != (128, spr * 256):
        raise ValueError("kernel requires 2*cpr == 128 (chip_len 2)")
    if nrow % (128 // spr) or (nrow // (128 // spr)) % 32:
        raise ValueError("nrow must give >= 32-sublane uint8 output tiles")
    spc = rows_per_capture // nrow
    grid = (b * spc,)
    look = _look_rows(x2d.dtype)
    last_look = br // look - 1
    cpk = 128 // spr
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nrow, 128), lambda i, s_ref, ph_ref: (i, 0)),
            pl.BlockSpec(
                (look, 128),
                lambda i, s_ref, ph_ref, lpb=nrow // look: (
                    jnp.minimum((i + 1) * lpb, last_look),
                    0,
                ),
            ),
            pl.BlockSpec(
                (1, 512, 128),
                lambda i, s_ref, ph_ref, spc=spc: (s_ref[i // spc], 0, 0),
            ),
            pl.BlockSpec((128, spr * 256), lambda i, s_ref, ph_ref: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nrow // cpk, 128), lambda i, s_ref, ph_ref: (i, 0)),
        ],
    )
    kern = functools.partial(
        _kernel_neural_extract, nrow=nrow, spr=spr, spc=spc, bf16=bf16,
        compaction=compaction, argmax=argmax,
    )
    (sym,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((br // cpk, 128), jnp.uint8),
        ],
        interpret=interpret,
    )(
        s.astype(jnp.int32),
        phasors.astype(jnp.float32),
        x2d,
        x2d,
        chip_table,
        codebook_blocked,
    )
    return sym.reshape(b, rows_per_capture * spr)


# --- fused relabel + byte pack -------------------------------------------------

def _shift_flat(v: jnp.ndarray, vn: jnp.ndarray, k: int, blk: int) -> jnp.ndarray:
    """Element at flat row-major index +k (static k, 0 <= k <= 128): 2-D ops
    only — lane-roll within the row, patched with the next row's head."""
    if k == 0:
        return v[:blk]
    ext = jnp.concatenate([v, vn], axis=0)
    rolled_same = pltpu.roll(ext, _BLOCK_SYM - k, axis=1)
    nxt = pltpu.roll(ext, ext.shape[0] - 1, axis=0)
    rolled_next = pltpu.roll(nxt, _BLOCK_SYM - k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (blk, _BLOCK_SYM), 1)
    return jnp.where(lane < _BLOCK_SYM - k, rolled_same[:blk], rolled_next[:blk])


def _select_shift(v, vn, d, blk, max_k):
    """shift_flat(v, k=d) for a TRACED scalar d in [0, max_k]: compute the
    static variants and select — VMEM-resident VPU work, no HBM traffic."""
    out = _shift_flat(v, vn, 0, blk)
    for k in range(1, max_k + 1):
        out = jnp.where(d == k, _shift_flat(v, vn, k, blk), out)
    return out


def _kernel_relabel_pack(
    sc_ref, hi_ref, hin_ref, lo_ref, lon_ref, wa_ref, wb_ref, out_ref,
    *, steps_per_capture
):
    """Rotation relabel + sub-byte alignment + byte pack, one VMEM pass.

    ``sc_ref`` rows are (ksel, dibit_shift 0..3, parity) per capture. The
    byte-granular part of the sync shift is NOT applied — the frame parser
    scans for the magic anyway, so only the mod-8 bit alignment matters and
    that is exactly 2*dibit_shift + parity. Avoiding the byte-granular shift
    is what removes every dynamic full-stream copy from the sync tail.
    """
    blk = out_ref.shape[0]
    cap = pl.program_id(0) // steps_per_capture
    k = sc_ref[cap, 0]
    d = sc_ref[cap, 1]
    parity = sc_ref[cap, 2]

    def relab(h8, l8):
        h = h8.astype(jnp.int32)
        l = l8.astype(jnp.int32)
        s2 = (2 * h + (h ^ l) + 4 - k) & 3  # inverse Gray, rotate back
        rh = (s2 >= 2).astype(jnp.float32)
        rl = ((s2 == 1) | (s2 == 2)).astype(jnp.float32)
        return rh, rl

    rh, rl = relab(hi_ref[:], lo_ref[:])
    rh_n, rl_n = relab(hin_ref[:], lon_ref[:])
    rh_d = _select_shift(rh, rh_n, d, blk, 3)
    rl_d = _select_shift(rl, rl_n, d, blk, 3)
    rh_d1 = _select_shift(rh, rh_n, d + 1, blk, 4)
    pf = parity.astype(jnp.float32)
    a = pf * rl_d + (1.0 - pf) * rh_d
    b = pf * rh_d1 + (1.0 - pf) * rl_d
    acc = jnp.dot(a, wa_ref[:], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(b, wb_ref[:], preferred_element_type=jnp.float32)
    # Mosaic has no f32->u8 cast; go through i32 (sums are exact, < 256).
    out_ref[:] = acc.astype(jnp.int32).astype(jnp.uint8)


def _kernel_relabel_pack_w(
    sc_ref, hi_ref, hin_ref, lo_ref, lon_ref, wa_ref, wb_ref, waw_ref, wbw_ref,
    out_ref, *, steps_per_capture
):
    """Shifted-weights relabel+pack: the mod-8 sync shift lives in the pack
    WEIGHTS, not the stream.

    The "shift" kernel builds 11 lane-rolled stream variants per tile
    (select_shift over d and d+1 for three streams) — all VPU relayout work.
    Here the shifted byte assembly is algebra: out_byte[c] = Σ_i
    bits[8c+s8+i]·2^(7-i) with bits[2t]=rh[t], bits[2t+1]=rl[t], so the byte
    is ONE matmul of the unshifted (rh, rl) against per-s8 weight tables
    (+ a wrap matmul against the next-row streams for the last byte's
    spill). The tables are selected per capture by the scalar-prefetch
    index_map — zero in-kernel select cost. Byte sums are sums of distinct
    powers of two (< 256, exact in f32 at any accumulation order), so the
    output is bitwise equal to the shift kernel's.
    """
    blk = out_ref.shape[0]
    cap = pl.program_id(0) // steps_per_capture
    k = sc_ref[cap, 0]

    def relab(h8, l8):
        h = h8.astype(jnp.int32)
        l = l8.astype(jnp.int32)
        s2 = (2 * h + (h ^ l) + 4 - k) & 3  # inverse Gray, rotate back
        rh = (s2 >= 2).astype(jnp.float32)
        rl = ((s2 == 1) | (s2 == 2)).astype(jnp.float32)
        return rh, rl

    rh, rl = relab(hi_ref[:], lo_ref[:])
    rh_n8, rl_n8 = relab(hin_ref[:], lon_ref[:])
    exth = jnp.concatenate([rh, rh_n8], axis=0)
    extl = jnp.concatenate([rl, rl_n8], axis=0)
    rhn = pltpu.roll(exth, exth.shape[0] - 1, axis=0)[:blk]  # row r+1 streams
    rln = pltpu.roll(extl, extl.shape[0] - 1, axis=0)[:blk]
    acc = jnp.dot(rh, wa_ref[0], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(rl, wb_ref[0], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(rhn, waw_ref[0], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(rln, wbw_ref[0], preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(jnp.int32).astype(jnp.uint8)


@functools.lru_cache(maxsize=2)
def _shifted_pack_weights_qpsk() -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(8, 128, 32) weight tables for the shifted-weights relabel+pack.

    For bit shift s8 (= 2*dibit_shift + parity), byte c of a 128-dibit row
    sums flat bits 8c+s8 .. 8c+s8+7 MSB-first; even flat positions read rh,
    odd read rl. Positions past lane 255 (the last byte's spill) land in the
    wrap tables, applied to the NEXT row's streams.
    """
    wa = np.zeros((8, 128, 32), np.float32)
    wb = np.zeros((8, 128, 32), np.float32)
    waw = np.zeros((8, 128, 32), np.float32)
    wbw = np.zeros((8, 128, 32), np.float32)
    for s8 in range(8):
        for c in range(32):
            for i in range(8):
                p = 8 * c + s8 + i
                t, odd = divmod(p, 2)
                w = float(1 << (7 - i))
                if t < 128:
                    (wb if odd else wa)[s8, t, c] += w
                else:
                    (wbw if odd else waw)[s8, t - 128, c] += w
    return wa, wb, waw, wbw


@functools.lru_cache(maxsize=2)
def _pack_weights() -> Tuple[np.ndarray, np.ndarray]:
    """(128, 32) byte-assembly weights: byte c sums dibit lanes 4c..4c+3."""
    wa = np.zeros((128, 32), np.float32)
    wb = np.zeros((128, 32), np.float32)
    for j in range(128):
        wa[j, j // 4] = (128, 32, 8, 2)[j % 4]
        wb[j, j // 4] = (64, 16, 4, 1)[j % 4]
    return wa, wb


# Sync-tail pack kernel generation: "shift" (lane-rolled stream variants) or
# "weights" (per-shift pack weight tables selected by the scalar-prefetch
# index_map — bitwise-equal output, no in-kernel stream shifting). Measured
# on v5e (64 x 2^24, benchmarks/psk_decide_variant_ab.py): weights wins 48%
# end-to-end on DBPSK (18.0 -> 12.2 ms; the shift kernel built 16 rolled
# stream variants per tile) and ~3% on DQPSK (12.6 -> 12.2 ms).
PACK_KERNEL_VARIANT = "weights"


@functools.partial(
    jax.jit, static_argnames=("rows_per_capture", "block_rows", "interpret", "variant")
)
def relabel_pack_batch(
    hi3: jnp.ndarray,
    lo3: jnp.ndarray,
    s: jnp.ndarray,
    ksel: jnp.ndarray,
    rows_per_capture: int,
    block_rows: int = 256,
    interpret: bool = False,
    variant: str = "shift",
) -> jnp.ndarray:
    """Whole-batch fused rotation-relabel + byte pack (Pallas).

    Replaces ``vmap(relabel_shift_pack)``: instead of relabel passes, two
    dynamic full-stream shift copies and two pack matmuls in XLA, ONE kernel
    reads the uint8 dibit lanes and writes packed bytes. The sync shift is
    applied only mod 8 bits (static lane rolls selected by a per-capture
    scalar); the byte-granular remainder is left to the frame parser's magic
    scan, so the frame starts at byte ``s // 8`` of the returned stream
    (callers that previously assumed byte 0 must not — both the Python and
    native parsers scan).

    Args:
      hi3, lo3: (B, R, 128) uint8 dibit lanes (R = rows_per_capture,
        multiple of block_rows).
      s: (B,) int32 winning bit offset from the rotation match.
      ksel: (B,) int32 winning rotation.
    Returns packed uint8 of shape (B, R*32); the last byte of each capture
    may read into the next capture's head (harmless tail garbage).
    """
    b, r, _ = hi3.shape
    if r != rows_per_capture or r % block_rows:
        raise ValueError("rows_per_capture mismatch or not a multiple of block_rows")
    steps_per_capture = r // block_rows
    grid = (b * steps_per_capture,)
    hi2 = hi3.reshape(b * r, _BLOCK_SYM)
    lo2 = lo3.reshape(b * r, _BLOCK_SYM)
    last_block32 = b * r // 32 - 1

    stream_specs = [
        pl.BlockSpec((block_rows, _BLOCK_SYM), lambda i, sc: (i, 0)),
        pl.BlockSpec(
            (32, _BLOCK_SYM),
            lambda i, sc: (
                jnp.minimum(i * (block_rows // 32) + block_rows // 32, last_block32),
                0,
            ),
        ),
        pl.BlockSpec((block_rows, _BLOCK_SYM), lambda i, sc: (i, 0)),
        pl.BlockSpec(
            (32, _BLOCK_SYM),
            lambda i, sc: (
                jnp.minimum(i * (block_rows // 32) + block_rows // 32, last_block32),
                0,
            ),
        ),
    ]
    if variant == "weights":
        scal = jnp.stack([ksel.astype(jnp.int32), s & 7], axis=1).astype(jnp.int32)
        wa, wb, waw, wbw = _shifted_pack_weights_qpsk()
        spc = steps_per_capture
        wspec = pl.BlockSpec((1, 128, 32), lambda i, sc, spc=spc: (sc[i // spc, 1], 0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=stream_specs + [wspec, wspec, wspec, wspec],
            out_specs=pl.BlockSpec((block_rows, 32), lambda i, sc: (i, 0)),
        )
        kern = functools.partial(
            _kernel_relabel_pack_w, steps_per_capture=steps_per_capture
        )
        packed = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b * r, 32), jnp.uint8),
            interpret=interpret,
        )(
            scal, hi2, hi2, lo2, lo2,
            jnp.asarray(wa), jnp.asarray(wb), jnp.asarray(waw), jnp.asarray(wbw),
        )
        return packed.reshape(b, r * 32)

    scal = jnp.stack(
        [ksel.astype(jnp.int32), (s >> 1) & 3, s & 1], axis=1
    ).astype(jnp.int32)
    wa, wb = _pack_weights()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=stream_specs + [
            pl.BlockSpec((128, 32), lambda i, sc: (0, 0)),
            pl.BlockSpec((128, 32), lambda i, sc: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, 32), lambda i, sc: (i, 0)),
    )
    kern = functools.partial(_kernel_relabel_pack, steps_per_capture=steps_per_capture)
    packed = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * r, 32), jnp.uint8),
        interpret=interpret,
    )(scal, hi2, hi2, lo2, lo2, jnp.asarray(wa), jnp.asarray(wb))
    return packed.reshape(b, r * 32)


def _kernel_bit_select_pack(
    sc_ref, re_ref, ren_ref, im_ref, imn_ref, wp_ref, out_ref, *, steps_per_capture
):
    """DBPSK tail: stream select (re/im) + complement + mod-8 bit alignment
    + byte pack in one VMEM pass. ``sc_ref`` rows are (ksel, bit_shift 0..7)
    per capture; ksel follows bpsk_match_conditions order (0=re, 1=im,
    2=re inverted, 3=im inverted)."""
    blk = out_ref.shape[0]
    cap = pl.program_id(0) // steps_per_capture
    ksel = sc_ref[cap, 0]
    d = sc_ref[cap, 1]
    use_im = (ksel & 1).astype(jnp.float32)
    inv = (ksel >= 2).astype(jnp.float32)
    # Mosaic has no u8->f32 cast; go through i32.
    to_f = lambda v: v.astype(jnp.int32).astype(jnp.float32)
    re_d = _select_shift(to_f(re_ref[:]), to_f(ren_ref[:]), d, blk, 7)
    im_d = _select_shift(to_f(im_ref[:]), to_f(imn_ref[:]), d, blk, 7)
    v = use_im * im_d + (1.0 - use_im) * re_d
    v = inv + (1.0 - 2.0 * inv) * v  # complement when inverted hypothesis won
    acc = jnp.dot(v, wp_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(jnp.int32).astype(jnp.uint8)


def _kernel_bit_select_pack_w(
    sc_ref, re_ref, ren_ref, im_ref, imn_ref, wp_ref, wpw_ref, out_ref,
    *, steps_per_capture
):
    """Shifted-weights DBPSK tail: stream select + complement + byte pack
    with the mod-8 shift folded into per-shift weight tables (the "shift"
    kernel builds 16 lane-rolled stream variants per tile). Complement
    commutes with packing — every byte's weights sum to 255, so the inverted
    hypothesis is 255 - acc. Bitwise equal to the shift kernel (exact
    power-of-two sums)."""
    blk = out_ref.shape[0]
    cap = pl.program_id(0) // steps_per_capture
    ksel = sc_ref[cap, 0]
    use_im = (ksel & 1).astype(jnp.float32)
    inv = (ksel >= 2).astype(jnp.float32)
    to_f = lambda v: v.astype(jnp.int32).astype(jnp.float32)
    v = use_im * to_f(im_ref[:]) + (1.0 - use_im) * to_f(re_ref[:])
    vn8 = use_im * to_f(imn_ref[:]) + (1.0 - use_im) * to_f(ren_ref[:])
    ext = jnp.concatenate([v, vn8], axis=0)
    vn = pltpu.roll(ext, ext.shape[0] - 1, axis=0)[:blk]  # row r+1 stream
    acc = jnp.dot(v, wp_ref[0], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(vn, wpw_ref[0], preferred_element_type=jnp.float32)
    acc = inv * (255.0 - acc) + (1.0 - inv) * acc
    out_ref[:] = acc.astype(jnp.int32).astype(jnp.uint8)


@functools.lru_cache(maxsize=2)
def _shifted_pack_weights_bpsk() -> Tuple[np.ndarray, np.ndarray]:
    """(8, 128, 16) MSB-first byte-assembly weights per bit shift d, plus the
    wrap tables for the last byte's spill into the next row."""
    wp = np.zeros((8, 128, 16), np.float32)
    wpw = np.zeros((8, 128, 16), np.float32)
    for d in range(8):
        for c in range(16):
            for i in range(8):
                p = 8 * c + d + i
                w = float(1 << (7 - i))
                if p < 128:
                    wp[d, p, c] += w
                else:
                    wpw[d, p - 128, c] += w
    return wp, wpw


@functools.lru_cache(maxsize=2)
def _bit_pack_weights() -> np.ndarray:
    """(128, 16) MSB-first byte-assembly weights: byte c sums bit lanes
    8c..8c+7."""
    wp = np.zeros((128, 16), np.float32)
    for j in range(128):
        wp[j, j // 8] = 1 << (7 - j % 8)
    return wp


@functools.partial(
    jax.jit, static_argnames=("rows_per_capture", "block_rows", "interpret", "variant")
)
def bit_select_pack_batch(
    re3: jnp.ndarray,
    im3: jnp.ndarray,
    s: jnp.ndarray,
    ksel: jnp.ndarray,
    rows_per_capture: int,
    block_rows: int = 256,
    interpret: bool = False,
    variant: str = "shift",
) -> jnp.ndarray:
    """Whole-batch fused DBPSK stream-select + complement + byte pack.

    The BPSK analog of :func:`relabel_pack_batch`: the winning hypothesis
    picks the re or im bit stream (possibly complemented), the sync shift is
    applied mod 8 bits in-VMEM (static rolls selected by a prefetched
    scalar), and bytes are assembled by one (128, 16) weight matmul. The
    frame starts at byte ``s // 8`` of the returned stream — the parsers'
    magic scan absorbs the byte-granular offset.

    Args:
      re3, im3: (B, R, 128) uint8 bit streams (sign bits of the re/im
        differential).
      s: (B,) int32 winning bit offset; ksel: (B,) int32 hypothesis index
        in bpsk_match_conditions order.
    Returns packed uint8 of shape (B, R*16).
    """
    b, r, _ = re3.shape
    if r != rows_per_capture or r % block_rows:
        raise ValueError("rows_per_capture mismatch or not a multiple of block_rows")
    steps_per_capture = r // block_rows
    grid = (b * steps_per_capture,)
    re2 = re3.reshape(b * r, _BLOCK_SYM)
    im2 = im3.reshape(b * r, _BLOCK_SYM)
    scal = jnp.stack([ksel.astype(jnp.int32), s & 7], axis=1).astype(jnp.int32)
    last_block32 = b * r // 32 - 1

    stream_specs = [
        pl.BlockSpec((block_rows, _BLOCK_SYM), lambda i, sc: (i, 0)),
        pl.BlockSpec(
            (32, _BLOCK_SYM),
            lambda i, sc: (
                jnp.minimum(i * (block_rows // 32) + block_rows // 32, last_block32),
                0,
            ),
        ),
        pl.BlockSpec((block_rows, _BLOCK_SYM), lambda i, sc: (i, 0)),
        pl.BlockSpec(
            (32, _BLOCK_SYM),
            lambda i, sc: (
                jnp.minimum(i * (block_rows // 32) + block_rows // 32, last_block32),
                0,
            ),
        ),
    ]
    if variant == "weights":
        wp, wpw = _shifted_pack_weights_bpsk()
        spc = steps_per_capture
        wspec = pl.BlockSpec((1, 128, 16), lambda i, sc, spc=spc: (sc[i // spc, 1], 0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=stream_specs + [wspec, wspec],
            out_specs=pl.BlockSpec((block_rows, 16), lambda i, sc: (i, 0)),
        )
        kern = functools.partial(
            _kernel_bit_select_pack_w, steps_per_capture=steps_per_capture
        )
        packed = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b * r, 16), jnp.uint8),
            interpret=interpret,
        )(scal, re2, re2, im2, im2, jnp.asarray(wp), jnp.asarray(wpw))
        return packed.reshape(b, r * 16)

    wp = _bit_pack_weights()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=stream_specs + [pl.BlockSpec((128, 16), lambda i, sc: (0, 0))],
        out_specs=pl.BlockSpec((block_rows, 16), lambda i, sc: (i, 0)),
    )
    kern = functools.partial(_kernel_bit_select_pack, steps_per_capture=steps_per_capture)
    packed = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * r, 16), jnp.uint8),
        interpret=interpret,
    )(scal, re2, re2, im2, im2, jnp.asarray(wp))
    return packed.reshape(b, r * 16)


# --- fused rotation-hypothesis magic match -------------------------------------

def rotation_match_conditions(pattern: str):
    """All 8 (rotation x bit-parity) magic hypotheses as uniform conditions.

    Under a residual CFO rotation k·π/2 the received Gray dibit relabels as
    (hi', lo') = k=0:(hi,lo) k=1:(~lo,hi) k=2:(~hi,~lo) k=3:(lo,~hi); matching
    the pattern in the relabeled stream at even/odd bit offsets therefore
    reduces, for every hypothesis, to an AND of 16 conditions of the single
    form ``(hi|lo)[t+offset] == bit``. Returns ``cond[h] = tuple of
    (is_hi, offset, bitval)`` for h = 4*parity + k, plus the max offset.
    """
    p = [1 if c == "1" else 0 for c in pattern]
    n_dib = len(p) // 2
    # (hi'==b, lo'==b) translated to conditions on the raw streams, per k.
    def tr(k, is_hi_prime, b):
        if k == 0:
            return (is_hi_prime, b)
        if k == 1:  # hi' = ~lo, lo' = hi
            return (not is_hi_prime, 1 - b) if is_hi_prime else (True, b)
        if k == 2:  # hi' = ~hi, lo' = ~lo
            return (is_hi_prime, 1 - b)
        return (not is_hi_prime, b) if is_hi_prime else (True, 1 - b)  # k=3

    conds = []
    for parity in (0, 1):
        for k in range(4):
            c = []
            for t in range(n_dib):
                if parity == 0:  # even: (hi'_t, lo'_t) == (p_2t, p_2t+1)
                    sh, bh = tr(k, True, p[2 * t])
                    sl, bl = tr(k, False, p[2 * t + 1])
                    c.append((sh, t, bh))
                    c.append((sl, t, bl))
                else:  # odd: (lo'_t, hi'_{t+1}) == (p_2t, p_2t+1)
                    sl, bl = tr(k, False, p[2 * t])
                    sh, bh = tr(k, True, p[2 * t + 1])
                    c.append((sl, t, bl))
                    c.append((sh, t + 1, bh))
            conds.append(tuple(c))
    return tuple(conds), n_dib


def bpsk_match_conditions(pattern: str):
    """The 4 DBPSK magic hypotheses as uniform (is_hi, offset, bitval) conds.

    A k·π/2 differential rotation maps the BPSK decision streams as: k=0 the
    real-axis bits, k=2 their complement, k=1/3 the imag-axis bits and their
    complement. Matching order mirrors ops.common.bit_sync_and_pack_rotations:
    h = [re+pat, im+pat, re+inv, im+inv]; positions are BIT indices in the
    matched stream (``hi``/``lo`` here are the re/im bit streams).
    """
    p = [1 if c == "1" else 0 for c in pattern]
    conds = []
    for inv in (0, 1):
        for is_hi in (True, False):
            conds.append(tuple((is_hi, t, p[t] ^ inv) for t in range(len(p))))
    return tuple(conds), len(p)


def _rotmatch_kernel(h_ref, hn_ref, l_ref, ln_ref, out_ref, *, conds, blk, n_exact, tol):
    """Per-tile first-match position for all 8 rotation/parity hypotheses.

    One pass over the (blk, 128) hi/lo dibit tiles: builds the 9 lane-shifted
    views once, then each hypothesis is an int accumulation (sum of XOR
    mismatches) -> position min. Replaces ~128 XLA slice-compare passes with
    a single VMEM-resident sweep — the whole CFO robustness tax lives here.
    """
    i = pl.program_id(0)
    # i32 matching math: Mosaic rejects i8 vector adds and pltpu.roll
    # requires 32-bit data, so narrower accumulators don't lower here.
    hi = h_ref[:].astype(jnp.int32)
    lo = l_ref[:].astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (blk, _BLOCK_SYM), 1)

    def shifted(v, vn, j):
        """Value at dibit position +j (lane +j, wrapping into the next row,
        whose head comes from the 8-row lookahead block)."""
        if j == 0:
            return v
        ext = jnp.concatenate([v, vn], axis=0)  # (blk+8, 128)
        nxt = pltpu.roll(ext, ext.shape[0] - 1, axis=0)[:blk]  # row r+1
        same_r = pltpu.roll(v, _BLOCK_SYM - j, axis=1)
        nxt_r = pltpu.roll(nxt, _BLOCK_SYM - j, axis=1)
        return jnp.where(lane >= _BLOCK_SYM - j, nxt_r, same_r)

    hn = hn_ref[:].astype(jnp.int32)
    ln = ln_ref[:].astype(jnp.int32)
    max_off = max(off for c in conds for (_s, off, _b) in c)
    hs = [shifted(hi, hn, j) for j in range(max_off + 1)]
    ls = [shifted(lo, ln, j) for j in range(max_off + 1)]

    pos = (
        (i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, _BLOCK_SYM), 0)) * _BLOCK_SYM
        + lane
    )
    big = jnp.int32(2**30)
    firsts = []
    for c in conds:
        # First n_exact conditions must ALL hold; the rest (the tolerant
        # follow-up validation) may miss up to ``tol`` — false 16-bit
        # matches on random data would otherwise relabel whole captures.
        acc1 = jnp.zeros((blk, _BLOCK_SYM), jnp.int32)
        acc2 = jnp.zeros((blk, _BLOCK_SYM), jnp.int32)
        for idx, (is_hi, off, bit) in enumerate(c):
            src = hs[off] if is_hi else ls[off]
            if idx < n_exact:
                acc1 = acc1 + (src ^ bit)
            else:
                acc2 = acc2 + (src ^ bit)
        good = (acc1 == 0) & (acc2 <= tol)
        firsts.append(jnp.min(jnp.where(good, pos, big)))
    out_ref[0] = jnp.stack([jnp.full((_BLOCK_SYM,), f, jnp.int32) for f in firsts])


@functools.partial(
    jax.jit,
    static_argnames=(
        "pattern", "rows_per_capture", "block_rows", "interpret", "family",
        "pattern2", "tol",
    ),
)
def rotation_match_batch(
    hi: jnp.ndarray,
    lo: jnp.ndarray,
    pattern: str,
    rows_per_capture: int,
    block_rows: int = 256,
    interpret: bool = False,
    family: str = "qpsk",
    pattern2: str = "",
    tol: int = 3,
):
    """(B, R, 128) uint8 streams -> per-capture (first_pos, found) for every
    magic hypothesis: shape (B, 8) for ``family="qpsk"`` (rotation x parity,
    positions in dibits) or (B, 4) for ``family="bpsk"`` (re/im x inverted,
    positions in bits; ``hi``/``lo`` are the re/im bit streams).

    Tiles never straddle captures (R % block_rows == 0); windows reading past
    a capture's end only see its zero-pad tail, whose positions are larger
    than any true match, so the per-capture min is unaffected.
    """
    b, r, w = hi.shape
    if w != _BLOCK_SYM or r != rows_per_capture or r % block_rows:
        raise ValueError(f"bad shapes {hi.shape} for rows_per_capture={rows_per_capture}")
    if family == "qpsk":
        conds, _n_pat = rotation_match_conditions(pattern + pattern2)
        n_exact = len(pattern)  # 2 conds per dibit = len(pattern) entries
    else:
        conds, _n_pat = bpsk_match_conditions(pattern + pattern2)
        n_exact = len(pattern)
    n_hyp = len(conds)
    h2d = hi.reshape(b * r, w)
    l2d = lo.reshape(b * r, w)
    steps = (b * r) // block_rows
    last_block8 = b * r // 8 - 1

    kern = functools.partial(
        _rotmatch_kernel, conds=conds, blk=block_rows, n_exact=n_exact, tol=tol
    )
    out = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, w),
                lambda i: (jnp.minimum(i * (block_rows // 8) + block_rows // 8, last_block8), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, w),
                lambda i: (jnp.minimum(i * (block_rows // 8) + block_rows // 8, last_block8), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, n_hyp, _BLOCK_SYM), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((steps, n_hyp, _BLOCK_SYM), jnp.int32),
        interpret=interpret,
    )(h2d, h2d, l2d, l2d)

    first_all = out[:, :, 0].reshape(b, steps // b, n_hyp)
    first = jnp.min(first_all, axis=1)  # (B, n_hyp) global position per capture
    # Positions are global over the flattened batch; make them capture-local.
    base = (jnp.arange(b) * r * _BLOCK_SYM)[:, None]
    local = first - base
    # The last tile's lookahead block reads the NEXT capture's head (and the
    # final capture's wraps onto itself), so windows starting in the last
    # n_pat+1 entries can false-match across the boundary. The XLA matcher
    # scans only L = m - (n_pat+1) positions; enforce the same bound here.
    limit = r * _BLOCK_SYM - (_n_pat + 1)
    found = (first < 2**30) & (local < limit)
    return jnp.where(found, local, 0), found


# --- fused D8PSK sector-rotation magic match -----------------------------------

def psk8_match_conditions(pattern: str, pattern2: str = ""):
    """The 8 D8PSK π/4-rotation magic hypotheses as uniform plane conditions.

    The received SECTOR under a channel rotation of k·π/4 is (true + k) % 8;
    matching the frame magic in rotation-k sector space reduces to per-bit
    conditions on the THREE Gray bit planes of the received sector: with raw
    sector planes (b2, b1, b0), the Gray bits are g2 = b2, g1 = b2^b1,
    g0 = b1^b0 — derived ONCE in the kernel so every condition is a
    single-plane lookup across all 8 hypotheses. Returns
    ``conds[k] = tuple of (gray_plane, symbol_offset, bitval, exact)`` where
    ``gray_plane`` indexes (g2, g1, g0); ``exact`` marks bits inside
    ``pattern`` (must all match), the rest count toward the tolerance like
    the dibit matcher's validation region. Trailing bits of a partial final
    tribit are dropped — sector granularity, exactly like
    ops.psk._psk8_expected_sectors.
    """
    from .psk import _GRAY8_INV

    both = pattern + pattern2
    n_sym = len(both) // 3
    n_exact_bits = len(pattern)
    conds = []
    for k in range(8):
        c = []
        for j in range(n_sym):
            tri = (
                int(both[3 * j]) * 4 + int(both[3 * j + 1]) * 2 + int(both[3 * j + 2])
            )
            e = (int(_GRAY8_INV[tri]) + k) % 8  # expected RECEIVED sector
            ge = e ^ (e >> 1)
            for t, gb in enumerate(((ge >> 2) & 1, (ge >> 1) & 1, ge & 1)):
                c.append((t, j, gb, (3 * j + t) < n_exact_bits))
        conds.append(tuple(c))
    return tuple(conds), n_sym


def _sector_match_kernel(p2_ref, p2n_ref, out_ref, *, conds, blk, tol):
    """Per-tile first-match SYMBOL position for all 8 rotation hypotheses.

    One pass over the (blk, 128) RAW SECTOR tiles: extracts the (b2, b1, b0)
    bit planes in VMEM (an XLA plane build cost ~4 ms/batch on v5e — 40% of
    the whole tail), derives the three GRAY planes once (g2 = b2,
    g1 = b2^b1, g0 = b1^b0 — so the 8 hypotheses never recompute a
    two-plane XOR), builds the lane-shifted views, then every hypothesis is
    an int accumulation of XOR mismatches -> position min. Replaces the
    ~8x36 XLA slice-compare passes of ops.psk.psk8_sync_and_pack_rotations
    — the D8PSK CFO robustness tax.
    """
    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (blk, _BLOCK_SYM), 1)
    sec = p2_ref[:].astype(jnp.int32)
    secn = p2n_ref[:].astype(jnp.int32)
    max_off = max(off for c in conds for (_p, off, _b, _e) in c)

    def shifted_views(v, vn):
        views = [v]
        ext = jnp.concatenate([v, vn], axis=0)  # (blk+8, 128)
        nxt = pltpu.roll(ext, ext.shape[0] - 1, axis=0)[:blk]  # row r+1
        for j in range(1, max_off + 1):
            same_r = pltpu.roll(v, _BLOCK_SYM - j, axis=1)
            nxt_r = pltpu.roll(nxt, _BLOCK_SYM - j, axis=1)
            views.append(jnp.where(lane >= _BLOCK_SYM - j, nxt_r, same_r))
        return views

    v2 = shifted_views((sec >> 2) & 1, (secn >> 2) & 1)
    v1 = shifted_views((sec >> 1) & 1, (secn >> 1) & 1)
    v0 = shifted_views(sec & 1, secn & 1)
    gs = [
        v2,
        [a ^ b for a, b in zip(v2, v1)],
        [a ^ b for a, b in zip(v1, v0)],
    ]

    pos = (
        (i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, _BLOCK_SYM), 0))
        * _BLOCK_SYM
        + lane
    )
    big = jnp.int32(2**30)
    firsts = []
    for c in conds:
        acc1 = jnp.zeros((blk, _BLOCK_SYM), jnp.int32)
        acc2 = jnp.zeros((blk, _BLOCK_SYM), jnp.int32)
        for gplane, off, bit, exact in c:
            src = gs[gplane][off]
            if exact:
                acc1 = acc1 + (src ^ bit)
            else:
                acc2 = acc2 + (src ^ bit)
        good = (acc1 == 0) & (acc2 <= tol)
        firsts.append(jnp.min(jnp.where(good, pos, big)))
    out_ref[0] = jnp.stack([jnp.full((_BLOCK_SYM,), f, jnp.int32) for f in firsts])


@functools.partial(
    jax.jit,
    static_argnames=(
        "pattern", "rows_per_capture", "block_rows", "interpret", "pattern2", "tol",
    ),
)
def sector_match_batch(
    sec3: jnp.ndarray,
    pattern: str,
    rows_per_capture: int,
    block_rows: int = 256,
    interpret: bool = False,
    pattern2: str = "",
    tol: int = 3,
):
    """(B, R, 128) uint8 RAW SECTOR rows -> per-capture (first_pos, found)
    for the 8 D8PSK rotation hypotheses, positions in SYMBOLS (tribits).

    The dual of :func:`rotation_match_batch` for 3-bit sectors; bit planes
    are extracted inside the kernel (feeding pre-built planes cost an extra
    ~4 ms XLA pass per batch). Tiles never straddle captures
    (R % block_rows == 0); zero-pad tails cannot match the exact region
    (the magic's tribits hit 5 distinct sector values under any single
    rotation) and the end-of-capture limit below rejects
    boundary-straddling windows, mirroring the XLA matcher's scan bound.
    """
    b, r, w = sec3.shape
    if w != _BLOCK_SYM or r != rows_per_capture or r % block_rows:
        raise ValueError(f"bad shapes {sec3.shape} for rows_per_capture={rows_per_capture}")
    conds, n_sym = psk8_match_conditions(pattern, pattern2)
    n_hyp = len(conds)
    sec2d = sec3.reshape(b * r, w)
    steps = (b * r) // block_rows
    last_block8 = b * r // 8 - 1

    look = pl.BlockSpec(
        (8, w),
        lambda i: (jnp.minimum(i * (block_rows // 8) + block_rows // 8, last_block8), 0),
        memory_space=pltpu.VMEM,
    )
    main = pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(_sector_match_kernel, conds=conds, blk=block_rows, tol=tol)
    out = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[main, look],
        out_specs=pl.BlockSpec((1, n_hyp, _BLOCK_SYM), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((steps, n_hyp, _BLOCK_SYM), jnp.int32),
        interpret=interpret,
    )(sec2d, sec2d)

    first_all = out[:, :, 0].reshape(b, steps // b, n_hyp)
    first = jnp.min(first_all, axis=1)  # (B, n_hyp) global symbol position
    base = (jnp.arange(b) * r * _BLOCK_SYM)[:, None]
    local = first - base
    limit = r * _BLOCK_SYM - (n_sym + 1)
    found = (first < 2**30) & (local < limit)
    return jnp.where(found, local, 0), found


@functools.lru_cache(maxsize=1)
def _psk8_shifted_pack_weights() -> Tuple[np.ndarray, np.ndarray]:
    """(8, 3, 128, 48) main + wrap weight tables for the D8PSK sector pack.

    For symbol shift r8 (0..7), byte c of a 128-symbol row sums flat Gray
    bits 8c + 3·r8 + i (i = 0..7) MSB-first, where flat bit p = 3t + q reads
    Gray plane q of symbol t. 128 symbols = 384 bits = exactly 48 bytes per
    row; positions past symbol 127 (the shifted last bytes' spill, ≤ 7
    symbols) land in the wrap tables, applied to the NEXT row's planes. Byte
    sums are sums of distinct powers of two (< 256, exact in f32), so the
    output is bitwise equal to the XLA reference pack.
    """
    w = np.zeros((8, 3, 128, 48), np.float32)
    ww = np.zeros((8, 3, 128, 48), np.float32)
    for r8 in range(8):
        for c in range(48):
            for i in range(8):
                p = 8 * c + 3 * r8 + i
                t, q = divmod(p, 3)
                v = float(1 << (7 - i))
                if t < 128:
                    w[r8, q, t, c] += v
                else:
                    ww[r8, q, t - 128, c] += v
    return w, ww


def _kernel_psk8_relabel_pack(
    sc_ref, sec_ref, secn_ref, w_ref, ww_ref, out_ref, *, steps_per_capture
):
    """Fused D8PSK relabel + mod-8 shift + Gray + byte pack (one VMEM pass).

    Per tile: true sector = (rx + 8 − k) & 7 (k from scalar prefetch), Gray
    planes elementwise, then SIX (blk, 128) @ (128, 48) matmuls against the
    per-capture r8-selected weight tables (three planes × main + next-row
    wrap). The XLA reference path (ops.psk.psk8_relabel_pack_batch) pays
    ~5.9 ms/batch in plane builds, an 8-way masked select, and the einsum;
    this kernel reads the uint8 sectors once and writes packed bytes.
    """
    blk = out_ref.shape[0]
    cap = pl.program_id(0) // steps_per_capture
    k = sc_ref[cap, 0]

    def gray_planes(s8):
        t = (s8.astype(jnp.int32) + 8 - k) & 7
        g = t ^ (t >> 1)
        return (
            ((g >> 2) & 1).astype(jnp.float32),
            ((g >> 1) & 1).astype(jnp.float32),
            (g & 1).astype(jnp.float32),
        )

    gs = gray_planes(sec_ref[:])
    gn8 = gray_planes(secn_ref[:])
    acc = jnp.zeros((blk, out_ref.shape[1]), jnp.float32)
    for q in range(3):
        ext = jnp.concatenate([gs[q], gn8[q]], axis=0)
        nxt = pltpu.roll(ext, ext.shape[0] - 1, axis=0)[:blk]  # row r+1 plane
        acc = acc + jnp.dot(gs[q], w_ref[0, q], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(nxt, ww_ref[0, q], preferred_element_type=jnp.float32)
    # Mosaic has no f32->u8 cast; go through i32 (sums are exact, < 256).
    out_ref[:] = acc.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("rows_per_capture", "block_rows", "interpret")
)
def psk8_relabel_pack_rows(
    sec3: jnp.ndarray,
    ksel: jnp.ndarray,
    r8: jnp.ndarray,
    rows_per_capture: int,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-batch fused D8PSK relabel + byte pack (Pallas).

    Args:
      sec3: (B, R, 128) uint8 received sector rows (R = rows_per_capture,
        multiple of block_rows).
      ksel: (B,) int32 winning rotation hypothesis.
      r8: (B,) int32 sync shift in symbols, already reduced mod 8 (the
        whole-byte remainder is the parsers' magic scan's job — the QPSK
        relabel+pack kernel's exact contract).
    Returns packed uint8 of shape (B, R*48); the final bytes of each capture
    may read the next capture's head (harmless tail garbage past n_valid).
    """
    b, r, w = sec3.shape
    if w != _BLOCK_SYM or r != rows_per_capture or r % block_rows:
        raise ValueError(f"bad shapes {sec3.shape} for rows_per_capture={rows_per_capture}")
    steps_per_capture = r // block_rows
    grid = (b * steps_per_capture,)
    sec2d = sec3.reshape(b * r, w)
    last_block8 = b * r // 8 - 1
    scal = jnp.stack([ksel.astype(jnp.int32), r8.astype(jnp.int32)], axis=1)
    wmain, wwrap = _psk8_shifted_pack_weights()
    spc = steps_per_capture
    wspec = pl.BlockSpec((1, 3, 128, 48), lambda i, sc, spc=spc: (sc[i // spc, 1], 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, w), lambda i, sc: (i, 0)),
            pl.BlockSpec(
                (8, w),
                lambda i, sc: (
                    jnp.minimum(i * (block_rows // 8) + block_rows // 8, last_block8),
                    0,
                ),
            ),
            wspec,
            wspec,
        ],
        out_specs=pl.BlockSpec((block_rows, 48), lambda i, sc: (i, 0)),
    )
    kern = functools.partial(_kernel_psk8_relabel_pack, steps_per_capture=spc)
    packed = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * r, 48), jnp.uint8),
        interpret=interpret,
    )(scal, sec2d, sec2d, jnp.asarray(wmain), jnp.asarray(wwrap))
    return packed.reshape(b, r * 48)
