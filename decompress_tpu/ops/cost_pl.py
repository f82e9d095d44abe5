"""Pallas round-B cost kernels: the exact-bit-cost re-parse in-kernel.

Round B of the two-round analysis (ops/lz77.py `lz77_parse_cost`, the
TPU replacement for the reference encoder's cost-model block decisions,
de.ml:3620-3692, applied to the parse itself) re-evaluates every
candidate with exact bit costs.  Its XLA form pays four full-domain
gather passes per position — lcost[lit], pref[pos+len], and the two
match-cost table lookups — at the ~7 ns/element XLA gather wall
(PERF.md).  All four are *small-table or row-local* lookups, exactly
the shape `tpu.dynamic_gather` resolves at 0.09-0.35 ns inside a
Mosaic kernel (the round-4 escape; ops/inflate_pl.py is the original):

* the cost tables are 286/30 entries per SEGMENT — a 3-block (or
  1-block) lane-gather select-tree with the segment's table staged per
  grid row;
* ``pref[pos + len]`` reaches at most 385 positions past the row start
  (len <= 258), so a 512-wide per-row slab of the literal-cost prefix
  sum turns it into a 4-block select-tree — the mark-path kernel's
  "clip spans to rows" trick (ops/parse_pl.py);
* the length/dist code arithmetic is elementwise (ops/codes.py), with
  floor-log2 computed by a compare-chain instead of the float exponent
  trick (integer-only kernel).

Everything is int32: code lengths are integers (the float32 cost tables
of the XLA path hold exact small ints), so gains and comparisons are
bit-identical to the float form.

Two kernels because the literal-cost prefix sum needs a global cumsum
between them:

  K1 `litbits_pl`:  lit -> lcost[lit]           (one lookup per byte)
  XLA:              pref = cumsum(litbits); 512-wide row slabs
  K2 `gain_pl`:     candidate (+ optional hot-stride lane) gains,
                    merged winner, per-position gain for lazy deferral
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128
R_BLOCK = 8
#: lit/len cost table padded width (286 -> 3 lane blocks)
LC_PAD = 384
#: dist cost table padded width (30 -> 1 lane block)
DC_PAD = 128
#: pref slab width: lane + len <= 127 + 258 + 1 < 512
SLAB_W = 512
#: "no match" gain sentinel (the XLA path's -1e9, int-domain)
NEG_GAIN = -(1 << 29)
MIN_MATCH = 3


def _seg_map(bps):
    """Per-segment block index map: lax.div instead of `//` — the
    floor-division lowering (sign-corrected select) is rejected by
    Pallas block-spec index maps on the Mosaic path."""
    def m(g, _b=bps):
        return (jax.lax.div(g, _b), 0)

    return m


def _whole_map(g):
    """Index map for a table input that stays fully resident: Mosaic
    requires block sublane dims divisible by 8 OR equal to the array
    dim, so per-segment (1, W) table blocks are illegal — instead the
    whole [B, W] table rides as one block (a few KB) and kernels slice
    their segment's row dynamically."""
    return (0, 0)


def _seg_id(bps):
    """The current grid step's segment index."""
    return jax.lax.div(pl.program_id(0), bps)


def _seltree(tab, sid, idx, nblocks, rb):
    """out[r, j] = tab[sid, idx[r, j]] for a fully-resident (TB,
    nblocks*128) table block.  The segment row replicates to the tile
    via an axis-0 dynamic_gather (8-row sublane gathers are supported
    on this target; broadcasting a (1,128) slice to (8,128) is a
    Mosaic layout ICE — probed on chip, round 5), then each 128-block
    resolves with a native lane gather + where chain.

    Mosaic's gather lowering requires the index rows to EQUAL the
    table rows, so callers pad the table to ``max(B, rb)`` rows
    (:func:`_pad_table_rows`) and the gather output slices back down
    to the tile's ``rb`` rows — tail batches with B < R_BLOCK hit
    this (the bench e2e's 65th segment, B=1)."""
    lo = idx & (LANES - 1)
    hi = idx >> 7
    ridx = jnp.full((tab.shape[0], LANES), sid, jnp.int32)
    v = None
    for k in range(nblocks):
        blk = tab[:, LANES * k:LANES * (k + 1)]
        row = jnp.take_along_axis(blk, ridx, axis=0)[:rb]
        g = jnp.take_along_axis(row, lo, axis=1)
        v = g if v is None else jnp.where(hi == k, g, v)
    return v


def _pad_table_rows(tab: jnp.ndarray, rb: int) -> jnp.ndarray:
    """Zero-pad a per-segment table's row count to max(B, rb) so the
    in-kernel segment-row gather is shape-legal under Mosaic (see
    :func:`_seltree`); sid only ever addresses the first B rows."""
    b = tab.shape[0]
    if b >= rb:
        return tab
    return jnp.concatenate(
        [tab, jnp.zeros((rb - b,) + tab.shape[1:], tab.dtype)], axis=0)


def _slab_lookup(slab, idx, rb):
    """out[r, j] = slab[r, idx[r, j]] over a (rb, SLAB_W) row slab."""
    lo = idx & (LANES - 1)
    hi = idx >> 7
    v = None
    for k in range(SLAB_W // LANES):
        g = jnp.take_along_axis(slab[:, LANES * k:LANES * (k + 1)],
                                lo, axis=1)
        v = g if v is None else jnp.where(hi == k, g, v)
    return v


def _ilog2(x):
    """floor(log2(x)) for int32 x in [1, 2^15] by compare-chain
    (integer-only analogue of codes._floor_log2's float-exponent trick)."""
    e = jnp.zeros_like(x)
    for k in range(1, 16):
        e = e + (x >= (1 << k)).astype(jnp.int32)
    return e


def _len_cost_parts(length):
    """(257+code, extra_bits) for match lengths — codes.length_code_parts
    in integer ops (extra VALUE not needed for costs)."""
    l = jnp.clip(length - MIN_MATCH, 0, 255)
    small = l < 8
    top = l >= 255
    e = jnp.maximum(_ilog2(jnp.maximum(l, 1)) - 2, 0)
    e = jnp.where(small | top, 0, e)
    code = jnp.where(small, l, jnp.where(top, 28, 4 + 4 * e + ((l >> e) & 3)))
    return 257 + code, e


def _dist_cost_parts(dist):
    """(code, extra_bits) for distances — codes.dist_code_parts."""
    m = jnp.clip(dist - 1, 0, (1 << 15) - 1)
    small = m < 4
    e = jnp.where(small, 0,
                  jnp.maximum(_ilog2(jnp.maximum(m, 1)) - 1, 0))
    code = jnp.where(small, m, 2 + 2 * e + ((m >> e) & 1))
    return code, e


def _litbits_kernel(rb, bps):
    def kernel(lit_ref, lc_ref, out_ref):
        out_ref[...] = _seltree(lc_ref[...], _seg_id(bps), lit_ref[...],
                                LC_PAD // LANES, rb)

    return kernel


def _gain_kernel(rb, bps, with_hot: bool):
    def kernel(*refs):
        if with_hot:
            (len_ref, dist_ref, hlen_ref, hdist_ref, slab_ref, lc_ref,
             dc_ref, olen_ref, odist_ref, ogain_ref) = refs
        else:
            (len_ref, dist_ref, slab_ref, lc_ref, dc_ref,
             olen_ref, odist_ref, ogain_ref) = refs
        lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
        slab = slab_ref[...]
        lc = lc_ref[...]
        dc = dc_ref[...]
        sid = _seg_id(bps)
        p0 = slab[:, :LANES]  # pref at own position

        def gain_of(ln, dst):
            lsym, lex = _len_cost_parts(ln)
            dsym, dex = _dist_cost_parts(dst)
            cost = (_seltree(lc, sid, jnp.clip(lsym, 0, 285),
                             LC_PAD // LANES, rb)
                    + lex
                    + _seltree(dc, sid, jnp.clip(dsym, 0, 29),
                               DC_PAD // LANES, rb)
                    + dex)
            span = _slab_lookup(slab, lane + ln, rb) - p0
            return jnp.where(ln >= MIN_MATCH, span - cost,
                             jnp.int32(NEG_GAIN))

        ln0 = len_ref[...]
        d0 = dist_ref[...]
        g0 = gain_of(ln0, d0)
        if with_hot:
            lnh = hlen_ref[...]
            dh = hdist_ref[...]
            gh = gain_of(lnh, dh)
            better = gh > g0
            ln0 = jnp.where(better, lnh, ln0)
            d0 = jnp.where(better, dh, d0)
            g0 = jnp.where(better, gh, g0)
        olen_ref[...] = ln0
        odist_ref[...] = d0
        ogain_ref[...] = g0

    return kernel


def _grids(b, seg_len):
    """Row geometry with per-segment padding: the production
    SEGMENT_SIZE (130560 -> 1020 rows) is not a multiple of R_BLOCK, so
    each segment's rows pad up to ``rp_pad`` dead rows (zeros in, don't
    care out) to keep (R_BLOCK, 128) tiles and a uniform blocks-per-
    segment table index map."""
    assert seg_len % LANES == 0
    rps = seg_len // LANES
    rb = min(R_BLOCK, rps)
    rp_pad = -(-rps // rb) * rb
    return rps, rp_pad, rb, rp_pad // rb


def _to_rows(a, b, t, rp_pad):
    """[B, T] (any int/bool dtype) -> int32[B*rp_pad, 128] with zero
    pad rows appended per segment."""
    rps = t // LANES
    r = a.astype(jnp.int32).reshape(b, rps, LANES)
    if rp_pad != rps:
        r = jnp.concatenate(
            [r, jnp.zeros((b, rp_pad - rps, LANES), jnp.int32)], axis=1)
    return r.reshape(b * rp_pad, LANES)


def _from_rows(o, b, t, rp_pad):
    """Inverse of :func:`_to_rows` (drops the pad rows)."""
    rps = t // LANES
    return o.reshape(b, rp_pad, LANES)[:, :rps, :].reshape(b, t)


@functools.partial(jax.jit, static_argnames=("interpret",))
def litbits_pl(lit: jnp.ndarray, lcost: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """litbits[b, i] = lcost[b, lit[b, i]] — K1.

    lit int32[B, T] (byte values), lcost int32[B, 286]."""
    b, t = lit.shape
    rps, rp_pad, rb, bps = _grids(b, t)
    rows = b * rp_pad
    lc_pad = _pad_table_rows(
        jnp.zeros((b, LC_PAD), jnp.int32).at[:, :lcost.shape[1]].set(
            lcost.astype(jnp.int32)), rb)
    out = pl.pallas_call(
        _litbits_kernel(rb, bps),
        grid=(rows // rb,),
        in_specs=[
            pl.BlockSpec((rb, LANES), lambda g: (g, 0)),
            pl.BlockSpec((lc_pad.shape[0], LC_PAD), _whole_map),
        ],
        out_specs=pl.BlockSpec((rb, LANES), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(_to_rows(lit, b, t, rp_pad), lc_pad)
    return _from_rows(out, b, t, rp_pad)


@jax.jit
def _pref_slab(litbits: jnp.ndarray) -> jnp.ndarray:
    """Per-row 512-wide slabs of the EXCLUSIVE literal-bit prefix sum:
    slab[b*rps + r, j] = pref[b, min(r*128 + j, T)] where
    pref[b, i] = sum(litbits[b, :i])."""
    b, t = litbits.shape
    pe = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), jnp.cumsum(litbits, axis=1)], axis=1)
    pad = jnp.broadcast_to(pe[:, -1:], (b, SLAB_W - 1))
    pe_ext = jnp.concatenate([pe, pad], axis=1)  # [B, T + 512]
    rps, rp_pad, rb, bps = _grids(b, t)
    parts = [
        pe_ext[:, k * LANES:k * LANES + t].reshape(b, rps, LANES)
        for k in range(SLAB_W // LANES)
    ]
    slab = jnp.concatenate(parts, axis=2)          # [B, rps, 512]
    if rp_pad != rps:
        slab = jnp.concatenate(
            [slab, jnp.zeros((b, rp_pad - rps, SLAB_W), jnp.int32)], axis=1)
    return slab.reshape(b * rp_pad, SLAB_W)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gain_pl(length, dist, hot_len, hot_d, slab, lcost, dcost,
            interpret: bool = False):
    """K2: merged (length, dist, gain) per position.

    length/dist int32[B, T] round-A candidates (pre-masked by the
    caller: validity, window clamp); hot_len/hot_d the hot-stride lane
    (or None); slab from :func:`_pref_slab`; lcost int32[B, 286],
    dcost int32[B, 30]."""
    b, t = length.shape
    rps, rp_pad, rb, bps = _grids(b, t)
    rows = b * rp_pad
    with_hot = hot_len is not None
    lc_pad = _pad_table_rows(
        jnp.zeros((b, LC_PAD), jnp.int32).at[:, :lcost.shape[1]].set(
            lcost.astype(jnp.int32)), rb)
    dc_pad = _pad_table_rows(
        jnp.zeros((b, DC_PAD), jnp.int32).at[:, :dcost.shape[1]].set(
            dcost.astype(jnp.int32)), rb)

    tile = pl.BlockSpec((rb, LANES), lambda g: (g, 0))
    ins = [_to_rows(length, b, t, rp_pad), _to_rows(dist, b, t, rp_pad)]
    specs = [tile, tile]
    if with_hot:
        ins += [_to_rows(hot_len, b, t, rp_pad),
                _to_rows(hot_d, b, t, rp_pad)]
        specs += [tile, tile]
    ins += [slab, lc_pad, dc_pad]
    specs += [
        pl.BlockSpec((rb, SLAB_W), lambda g: (g, 0)),
        pl.BlockSpec((lc_pad.shape[0], LC_PAD), _whole_map),
        pl.BlockSpec((dc_pad.shape[0], DC_PAD), _whole_map),
    ]
    olen, odist, ogain = pl.pallas_call(
        _gain_kernel(rb, bps, with_hot),
        grid=(rows // rb,),
        in_specs=specs,
        out_specs=[tile, tile, tile],
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)] * 3,
        interpret=interpret,
    )(*ins)
    return tuple(_from_rows(o, b, t, rp_pad) for o in (olen, odist, ogain))


def supported(seg_len: int, batch: int | None = None) -> bool:
    """The kernels need 128-lane rows (segments pad their row count to
    the block multiple internally) and, when ``batch`` is given, at
    most R_BLOCK segments per dispatch: the in-kernel segment-row
    gather is an axis-0 sublane gather, and sublane gathers of more
    than 8 rows ICE Mosaic on this target (CLAUDE.md) — batches padded
    BELOW R_BLOCK are handled by :func:`_pad_table_rows`, batches
    above it (DECOMPRESS_TPU_BATCH > 8) fall back to the XLA path."""
    if batch is not None and batch > R_BLOCK:
        return False
    return seg_len % LANES == 0
