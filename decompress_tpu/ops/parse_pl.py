"""Pallas mark-path: the DEFLATE parse's pointer-doubling walk as a
Mosaic kernel.

The parse marks the positions visited by iterating a strictly
increasing jump array ``g`` from 0 (the take/defer walk — the TPU
replacement for the reference encoder's sequential emit loop,
de.ml:2708-2897).  The XLA hybrid (`lz77._mark_path_hybrid`) pays
~2*C full-domain gather passes plus a long block scan — measured
~91 ms/MB of the level-6 analyze budget, twice (round A + round B).

Here the doubling is block-LOCAL by construction: a jump clipped to
its 128-position row stays inside that row, so every gather is a
native 128-wide lane gather (`jnp.take_along_axis(x, i, axis=1)` ->
`tpu.dynamic_gather`, measured ~0.1 ns/lookup — PERF.md round 4)
instead of a ~7 ns XLA gather element.  Three stages:

  1. kernel A: per-row doubling -> exit table J7[r, e] = first walk
     value >= row end when entering row r at offset e (7 lane gathers
     per row tile);
  2. a tiny XLA `lax.scan` threads the walk across the P/128 rows per
     segment (the only sequential dependence — one 1-element gather
     per row instead of the hybrid's P/2^C steps);
  3. kernel B: recompute the 7 within-row doubling levels and resolve
     each position's entry top-down (the `_mark_path` refinement,
     levels 6..0) — on_path = (entry == index).

Bit-identical to `_mark_path(g, levels)` (the hybrid-vs-full
equivalence argument applies unchanged: stage 1+2 are the hybrid with
C=7, stage 3 is the same top-down refinement with all levels < 7
row-local)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128
#: rows per grid tile (sublane dim of every vector op in the kernels)
R_BLOCK = 8
#: within-row doubling levels: 2^7 = LANES steps always escape a row
ROW_LEVELS = 7


def _row_exits(g, rowbase, lane, upto: int):
    """Doubling levels ex[0..upto] for a (RB, 128) tile of g.

    ex[k][i] = walk value after 2^k steps from i, clipped to the end
    of i's level-k block (all blocks k <= 7 are within the row, so the
    gather is a native per-row lane gather)."""
    ex = [g]
    for k in range(1, upto + 1):
        prev = ex[-1]
        end_k = rowbase + (((lane >> k) + 1) << k)
        idx = jnp.clip(prev - rowbase, 0, LANES - 1)
        stepped = jnp.take_along_axis(prev, idx, axis=1)
        ex.append(jnp.where(prev >= end_k, prev, stepped))
    return ex


def _mk_rowbase(rows_per_seg: int, r_block: int):
    def rowbase_for(step):
        fr = step * r_block + jax.lax.broadcasted_iota(
            jnp.int32, (r_block, LANES), 0)
        return (fr % rows_per_seg) * LANES

    return rowbase_for


def _exit_kernel(rows_per_seg: int, r_block: int):
    rowbase_for = _mk_rowbase(rows_per_seg, r_block)

    def kernel(g_ref, out_ref):
        rowbase = rowbase_for(pl.program_id(0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (r_block, LANES), 1)
        ex = _row_exits(g_ref[...], rowbase, lane, ROW_LEVELS)
        out_ref[...] = ex[ROW_LEVELS]

    return kernel


def _refine_kernel(rows_per_seg: int, r_block: int):
    rowbase_for = _mk_rowbase(rows_per_seg, r_block)

    def kernel(g_ref, entry_ref, out_ref):
        rowbase = rowbase_for(pl.program_id(0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (r_block, LANES), 1)
        ex = _row_exits(g_ref[...], rowbase, lane, ROW_LEVELS - 1)
        entry = entry_ref[...]
        for k in range(ROW_LEVELS - 1, -1, -1):
            blk = lane >> k
            is_right = (blk & 1) == 1
            mid = rowbase + (blk << k)
            idx = jnp.clip(entry - rowbase, 0, LANES - 1)
            stepped = jnp.take_along_axis(ex[k], idx, axis=1)
            entry = jnp.where(is_right & (entry < mid), stepped, entry)
        out_ref[...] = (entry == rowbase + lane).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def mark_path_pl(g2: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched `_mark_path`: g2 int32[B, P] (P = 2^k >= 128, jumps in
    (i, P]) -> bool[B, P] of positions visited iterating from 0."""
    b, p = g2.shape
    assert p % LANES == 0 and p >= LANES
    rows_per_seg = p // LANES
    rows = b * rows_per_seg
    rb = min(R_BLOCK, rows_per_seg)
    # pad rows so the grid tiles evenly; pad rows escape immediately
    pad = (-rows) % rb
    g_rows = g2.reshape(rows, LANES)
    if pad:
        g_rows = jnp.concatenate(
            [g_rows, jnp.full((pad, LANES), p, jnp.int32)])
    grid = ((rows + pad) // rb,)

    j7 = pl.pallas_call(
        _exit_kernel(rows_per_seg, rb),
        grid=grid,
        in_specs=[pl.BlockSpec((rb, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rb, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows + pad, LANES), jnp.int32),
        interpret=interpret,
    )(g_rows)

    # ---- coarse walk across rows (XLA): w starts at 0 and hops one
    # row-exit at a time; entries[r] = walk value entering row r ------
    j7f = j7[:rows].reshape(b, p)

    def step(w, r):
        in_row = w < (r + 1) * LANES
        idx = r * LANES + jnp.clip(w - r * LANES, 0, LANES - 1)
        nxt = jax.vmap(lambda jrow, i: jrow[i])(j7f, idx)
        return jnp.where(in_row, nxt, w), w

    # carry derives from g2 so it inherits varying manual axes under
    # shard_map (cf. the probe-scan carry)
    _, entries = jax.lax.scan(
        step, g2[:, 0] * 0, jnp.arange(rows_per_seg, dtype=jnp.int32))
    # entries: [rows_per_seg, B] -> broadcast each row's entry to lanes
    entry_rows = jnp.broadcast_to(
        entries.T.reshape(rows, 1), (rows, LANES)).astype(jnp.int32)
    if pad:
        entry_rows = jnp.concatenate(
            [entry_rows, jnp.zeros((pad, LANES), jnp.int32)])

    on = pl.pallas_call(
        _refine_kernel(rows_per_seg, rb),
        grid=grid,
        in_specs=[pl.BlockSpec((rb, LANES), lambda i: (i, 0)),
                  pl.BlockSpec((rb, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rb, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows + pad, LANES), jnp.int32),
        interpret=interpret,
    )(g_rows, entry_rows)
    return (on[:rows] != 0).reshape(b, p)
