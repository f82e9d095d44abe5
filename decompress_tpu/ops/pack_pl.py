"""Pallas pack slot-builder: per-position DEFLATE slot codes in-kernel.

The pack stage's remaining gathers are the two per-SEGMENT canonical
code tables (packed ``code<<4 | len``, [B, 286] and [B, 30]) — per-row
small-table lookups, i.e. lane-gather select-trees (the round-4 escape,
PERF.md; ops/inflate_pl.py is the original).  The length/distance code
arithmetic (ops/codes.py, elementwise) rides along in the same kernel,
so the XLA pack graph shrinks to the offset cumsum + word assembly
(ops/bitpack.pack_slot_planes).

Replaces, at the perf level, the reference encoder's symbol-by-symbol
Huffman emission (de.ml:2708-2897) together with the bit packer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .cost_pl import (LANES, R_BLOCK, _from_rows, _grids, _ilog2,
                      _pad_table_rows, _seg_id, _seltree, _to_rows,
                      _whole_map, MIN_MATCH)

#: lit/len packed-table width (286 -> 3 lane blocks)
LT_PAD = 384
#: dist packed-table width (30 -> 1 lane block)
DT_PAD = 128


def slot_sel_for(arr) -> str:
    """Resolve the pack slot-build kernel for ``arr``'s device (the
    per-array-device discipline of lz77.mark_sel_for).  Override with
    DECOMPRESS_TPU_PACK_KERNEL={auto,pl,xla,pl-interpret}."""
    import os

    v = os.environ.get("DECOMPRESS_TPU_PACK_KERNEL", "auto")
    if v in ("pl", "xla", "pl-interpret"):
        return v
    if v in ("0", "off"):
        return "xla"
    try:
        plat = next(iter(arr.devices())).platform
    except Exception:
        return "xla"
    return "pl" if plat in ("tpu", "axon") else "xla"


def _slots_kernel(rb, bps):
    def kernel(onp_ref, ism_ref, len_ref, dist_ref, lit_ref, lt_ref, dt_ref,
               v01_ref, n01_ref, v23_ref, n23_ref):
        onp = onp_ref[...] != 0
        ism = ism_ref[...] != 0
        length = len_ref[...]
        dist = dist_ref[...]

        # length side (codes.length_code_parts, integer-only)
        l = jnp.clip(length - MIN_MATCH, 0, 255)
        small = l < 8
        top = l >= 255
        e = jnp.maximum(_ilog2(jnp.maximum(l, 1)) - 2, 0)
        e = jnp.where(small | top, 0, e)
        lcode = jnp.where(small, l,
                          jnp.where(top, 28, 4 + 4 * e + ((l >> e) & 3)))
        lval = l & ((1 << e) - 1)
        sym = jnp.where(ism, 257 + lcode, lit_ref[...])
        cb0 = _seltree(lt_ref[...], _seg_id(bps), sym,
                       LT_PAD // LANES, rb)
        n0 = jnp.where(onp, cb0 & 15, 0)
        v01_ref[...] = (cb0 >> 4) | (lval << n0)
        n01_ref[...] = n0 + jnp.where(ism, e, 0)

        # distance side (codes.dist_code_parts)
        m = jnp.clip(dist - 1, 0, (1 << 15) - 1)
        dsmall = m < 4
        de_ = jnp.where(dsmall, 0,
                        jnp.maximum(_ilog2(jnp.maximum(m, 1)) - 1, 0))
        dsym = jnp.where(dsmall, m, 2 + 2 * de_ + ((m >> de_) & 1))
        dval = m & ((1 << de_) - 1)
        cb2 = _seltree(dt_ref[...], _seg_id(bps), jnp.clip(dsym, 0, 29),
                       DT_PAD // LANES, rb)
        n2 = jnp.where(ism, cb2 & 15, 0)
        v23_ref[...] = (cb2 >> 4) | (dval << n2)
        n23_ref[...] = n2 + jnp.where(ism, de_, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def build_slots_pl(on_path, is_match, length, dist, sym_lit,
                   lit_cb, dist_cb, interpret: bool = False):
    """(v01, n01, v23, n23) int32[B, T] from per-position parse results
    and per-segment packed code tables (code<<4 | len).

    Matches the XLA slot arithmetic of de._get_pack_jit bit-for-bit
    (non-emitting lanes carry the same don't-care values; their nbits
    are 0, so the packer ignores them)."""
    b, t = length.shape
    rps, rp_pad, rb, bps = _grids(b, t)
    rows = b * rp_pad
    lt = _pad_table_rows(
        jnp.zeros((b, LT_PAD), jnp.int32).at[:, :lit_cb.shape[1]].set(
            lit_cb.astype(jnp.int32)), rb)
    dt = _pad_table_rows(
        jnp.zeros((b, DT_PAD), jnp.int32).at[:, :dist_cb.shape[1]].set(
            dist_cb.astype(jnp.int32)), rb)
    tile = pl.BlockSpec((rb, LANES), lambda g: (g, 0))

    def rows32(a):
        return _to_rows(a, b, t, rp_pad)

    outs = pl.pallas_call(
        _slots_kernel(rb, bps),
        grid=(rows // rb,),
        in_specs=[tile, tile, tile, tile, tile,
                  pl.BlockSpec((lt.shape[0], LT_PAD), _whole_map),
                  pl.BlockSpec((dt.shape[0], DT_PAD), _whole_map)],
        out_specs=[tile, tile, tile, tile],
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)] * 4,
        interpret=interpret,
    )(rows32(on_path), rows32(is_match), rows32(length), rows32(dist),
      rows32(sym_lit), lt, dt)
    return tuple(_from_rows(o, b, t, rp_pad) for o in outs)
