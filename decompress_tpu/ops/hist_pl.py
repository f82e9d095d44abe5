"""Pallas symbol histograms: the parse-summary scatters in-kernel.

`_summarize_one`'s literal/length and distance histograms are XLA
scatter-adds over the full domain (~141 M elem/s on this chip — two
full-T passes per analyze round, PERF.md).  In a Mosaic kernel the
histogram is a per-bin masked reduction instead: for each of the
286 + 30 bins, compare the tile's symbols against the bin index and
accumulate the per-lane counts into a VMEM-resident output block that
stays pinned across the segment's grid steps (the block index map
repeats per segment, so Pallas flushes it once per segment).  286
vector compares per 1024-element tile ≈ ~2-3 ms/MB — 5x under the
scatter pair.

Bin layout: the lit/len histogram (symbol 0..285, EOB excluded by the
caller's emit mask semantics — identical to `_summarize_one`) and the
match-distance histogram (codes 0..29) are emitted per segment as
[B, 286] / [B, 30] after a lane reduction in XLA (tiny).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .cost_pl import (LANES, R_BLOCK, _grids, _ilog2, _seg_map, _to_rows,
                      MIN_MATCH)

NLIT = 286
NDIST = 30
#: padded sublane heights for the output blocks
NLIT_P = 288
NDIST_P = 32


def _hist_kernel(rb, bps):
    def kernel(onp_ref, ism_ref, len_ref, dist_ref, lit_ref,
               out_lit_ref, out_dist_ref):
        g = pl.program_id(0)

        @pl.when(g % bps == 0)
        def _init():
            out_lit_ref[...] = jnp.zeros((NLIT_P, LANES), jnp.int32)
            out_dist_ref[...] = jnp.zeros((NDIST_P, LANES), jnp.int32)

        onp = onp_ref[...] != 0
        ism = ism_ref[...] != 0
        length = len_ref[...]
        # length -> code index (codes.length_code_parts, integer form)
        l = jnp.clip(length - MIN_MATCH, 0, 255)
        small = l < 8
        top = l >= 255
        e = jnp.maximum(_ilog2(jnp.maximum(l, 1)) - 2, 0)
        e = jnp.where(small | top, 0, e)
        lcode = jnp.where(small, l,
                          jnp.where(top, 28, 4 + 4 * e + ((l >> e) & 3)))
        sym = jnp.where(ism, 257 + lcode, lit_ref[...])
        emit = onp.astype(jnp.int32)

        # distance -> code index (codes.dist_code_parts)
        m = jnp.clip(dist_ref[...] - 1, 0, (1 << 15) - 1)
        dsmall = m < 4
        de_ = jnp.where(dsmall, 0,
                        jnp.maximum(_ilog2(jnp.maximum(m, 1)) - 1, 0))
        dsym = jnp.where(dsmall, m, 2 + 2 * de_ + ((m >> de_) & 1))
        msk = ism.astype(jnp.int32)

        def lit_bin(s, _):
            row = jnp.sum(jnp.where(sym == s, emit, 0), axis=0,
                          keepdims=True)
            out_lit_ref[pl.ds(s, 1), :] += row
            return _

        jax.lax.fori_loop(0, NLIT, lit_bin, 0)

        def dist_bin(s, _):
            row = jnp.sum(jnp.where(dsym == s, msk, 0), axis=0,
                          keepdims=True)
            out_dist_ref[pl.ds(s, 1), :] += row
            return _

        jax.lax.fori_loop(0, NDIST, dist_bin, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def histograms_pl(on_path, is_match, length, dist, lit,
                  interpret: bool = False):
    """(hist_lit int32[B, 286], hist_dist int32[B, 30]) — the
    `_summarize_one` histograms (EOB not counted), batched.

    on_path/is_match bool or int [B, T]; length/dist/lit int32[B, T]
    (lit = payload byte values; masked positions don't count because
    on_path/is_match gate the increments)."""
    b, t = length.shape
    rps, rp_pad, rb, bps = _grids(b, t)
    rows = b * rp_pad
    tile = pl.BlockSpec((rb, LANES), lambda g: (g, 0))

    def rows32(a):
        # pad rows carry on_path == is_match == 0, so they count nothing
        return _to_rows(a, b, t, rp_pad)

    hl, hd = pl.pallas_call(
        _hist_kernel(rb, bps),
        grid=(rows // rb,),
        in_specs=[tile] * 5,
        out_specs=[
            pl.BlockSpec((NLIT_P, LANES), _seg_map(bps)),
            pl.BlockSpec((NDIST_P, LANES), _seg_map(bps)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * NLIT_P, LANES), jnp.int32),
            jax.ShapeDtypeStruct((b * NDIST_P, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(rows32(on_path), rows32(is_match), rows32(length), rows32(dist),
      rows32(lit))
    hl = hl.reshape(b, NLIT_P, LANES)[:, :NLIT, :].sum(axis=2)
    hd = hd.reshape(b, NDIST_P, LANES)[:, :NDIST, :].sum(axis=2)
    return hl, hd
