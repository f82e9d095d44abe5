"""End-to-end device compression steps (no host round-trips).

``fixed_deflate_segments`` runs match-finding, parsing and entropy
emission for a batch of segments entirely on device using the fixed
Huffman trees (RFC 1951 §3.2.6) — one jittable function, the
framework's "flagship forward step".  The dynamic-tree pipeline adds a
host tree-build between the same two device stages (de.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import huffman, tables
from . import bitpack, codes, lz77


@functools.cache
def _fixed_code_arrays():
    lit_len = tables.FIXED_LIT_LENGTHS
    dist_len = tables.FIXED_DIST_LENGTHS
    lit_code = huffman.canonical_codes(lit_len)
    dist_code = huffman.canonical_codes(dist_len)
    return (
        lit_code[: tables.NUM_LIT_SYMS].astype(np.uint32),
        lit_len[: tables.NUM_LIT_SYMS].astype(np.int32),
        dist_code[: tables.NUM_DIST_SYMS].astype(np.uint32),
        dist_len[: tables.NUM_DIST_SYMS].astype(np.int32),
    )


@functools.partial(jax.jit, static_argnames=("level", "seg_len", "out_words"))
def fixed_deflate_segments(
    data: jnp.ndarray,       # uint8[B, HIST + seg_len]
    n_valid: jnp.ndarray,    # int32[B]
    hist_len: jnp.ndarray,   # int32[B]
    bfinal: jnp.ndarray,     # int32[B] — 1 where this segment ends its stream
    *,
    level: int = 6,
    seg_len: int = 1 << 17,
    out_words: int | None = None,
):
    """Whole fixed-Huffman DEFLATE blocks on device.

    Returns (words uint32[B, out_words], total_bits int32[B]).  The
    bitstreams are standard single-block fixed-Huffman DEFLATE bodies.
    """
    if out_words is None:
        out_words = (10 * seg_len) // 32 + 64
    # force_exact: this function is fully jitted, so it cannot run the
    # host-side fingerprint-verification retry that lz77.analyze does;
    # the exact linear extension keeps its output unconditionally correct
    res = lz77.lz77_analyze(
        data, n_valid, hist_len, level=level, seg_len=seg_len, force_exact=True
    )
    lit_code, lit_len, dist_code, dist_len = _fixed_code_arrays()

    # packed (code<<4 | len) fixed tables: one gathered element per slot
    lit_cb_j = jnp.asarray((lit_code.astype(np.int32) << 4) | lit_len)
    dist_cb_j = jnp.asarray((dist_code.astype(np.int32) << 4) | dist_len)

    on_path, is_match = res["on_path"], res["is_match"]
    length, dist = res["length"], res["dist"]
    sym_lit = data[:, lz77.HIST :].astype(jnp.int32)

    # elementwise code arithmetic (ops/codes.py) — no map gathers
    lcode, lex, lval = codes.length_code_parts(length)
    sym = jnp.where(is_match, 257 + lcode, sym_lit)
    dsym, dex, dval = codes.dist_code_parts(dist)
    cb0 = lit_cb_j[sym]
    v0 = (cb0 >> 4).astype(jnp.uint32)
    n0 = jnp.where(on_path, cb0 & 15, 0)
    v1 = lval.astype(jnp.uint32)
    n1 = jnp.where(is_match, lex, 0)
    cb2 = dist_cb_j[dsym]
    v2 = (cb2 >> 4).astype(jnp.uint32)
    n2 = jnp.where(is_match, cb2 & 15, 0)
    v3 = dval.astype(jnp.uint32)
    n3 = jnp.where(is_match, dex, 0)
    v01 = v0 | (v1 << n0.astype(jnp.uint32))
    v23 = v2 | (v3 << n2.astype(jnp.uint32))

    b = data.shape[0]
    vals = jnp.stack([v01, v23], axis=2).reshape(b, -1)
    nbs = jnp.stack([n0 + n1, n2 + n3], axis=2).reshape(b, -1)

    # header (BFINAL, BTYPE=01) and trailing EOB
    hdr_vals = jnp.concatenate(
        [bfinal[:, None].astype(jnp.uint32), jnp.full((b, 1), 1, jnp.uint32)], axis=1
    )
    hdr_bits = jnp.broadcast_to(jnp.array([1, 2], jnp.int32), (b, 2))
    eob_vals = jnp.full((b, 1), int(lit_code[tables.EOB]), jnp.uint32)
    eob_bits = jnp.full((b, 1), int(lit_len[tables.EOB]), jnp.int32)

    all_vals = jnp.concatenate([hdr_vals, vals, eob_vals], axis=1)
    all_nbs = jnp.concatenate([hdr_bits, nbs, eob_bits], axis=1)
    return bitpack.pack_bits_device(all_vals, all_nbs, out_words)
