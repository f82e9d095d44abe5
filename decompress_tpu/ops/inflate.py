"""Device batch inflate: member-parallel DEFLATE decoding.

The reference's inflate is a byte-serial state machine (`De.Inf` hot
loop, de.ml:1054–1261).  Bit-serial decode of a *foreign* stream is
inherently sequential (SURVEY §7 "hard parts"), so the TPU design
splits the problem:

* foreign / streaming input → the native C++ state machine
  (native/tpuz.cpp), byte-serial but resumable;
* **our own archives** → member-parallel device decode: the sharded
  compressor records member byte offsets in a standard gzip FEXTRA
  index, so every member's single DEFLATE block can be decoded
  *simultaneously*, lockstep across the batch:

  1. hosts parse the tiny per-member block headers and build the
     two-level decode tables (the same construction as core/huffman);
  2. a device ``while_loop`` decodes one symbol per member per
     iteration — table lookups are gathers into per-member table rows,
     bit extraction is pure arithmetic on a 64-bit peek window;
  3. LZ77 expansion is the literal-scatter + copy-resolution scheme:
     every output byte's *source* position is computed vectorized
     (interval cover + modular overlap arithmetic), then copy-of-copy
     chains are resolved by pointer-jumping rounds until all bytes are
     literal-rooted (typical nesting depth is tiny).

Symbol throughput scales with batch size: the loop iteration count is
the *maximum* command count over members, so wider batches decode more
bytes for the same number of lockstep steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import bitstream, huffman, tables

MAX_TABLE = 2048      # per-member packed decode-table row (root 10 + subs)
DIST_TABLE = 512      # root 8 + subs
ROOT_LIT = 10
ROOT_DIST = 8


class NotParallelizable(ValueError):
    """Stream shape the device decoder doesn't cover (multi-block
    members etc.) — callers fall back to the serial native path."""


def prepare_member(body: np.ndarray):
    """Host: parse one member's DEFLATE header; the body must be a
    single (final) fixed or dynamic block.  Returns (lit_table,
    dist_table, start_bit) or raises NotParallelizable.
    """
    from .. import de

    r = bitstream.BitReader(body)
    bfinal = r.read(1)
    btype = r.read(2)
    if btype == 0:
        # stored member: a chain of stored chunks is pure byte slices —
        # resolved on host, no device work needed
        out = bytearray()
        while True:
            r.align_to_byte()
            ln = int.from_bytes(r.read_bytes(2).tobytes(), "little")
            nlen = int.from_bytes(r.read_bytes(2).tobytes(), "little")
            if ln != (nlen ^ 0xFFFF):
                raise de.MalformedError("invalid complement of length")
            out += r.read_bytes(ln).tobytes()
            if bfinal:
                return ("stored", bytes(out))
            bfinal = r.read(1)
            if r.read(2) != 0:
                raise NotParallelizable("mixed block kinds in member")
    if not bfinal or btype not in (1, 2):
        raise NotParallelizable("not a single fixed/dynamic block")
    if btype == 1:
        lit_lens = tables.FIXED_LIT_LENGTHS
        dist_lens = tables.FIXED_DIST_LENGTHS
    else:
        lit_lens, dist_lens = de._parse_dynamic_lengths(r)
    # build at the kernel's peek widths (ROOT_LIT/ROOT_DIST), which may
    # differ from the host decoders' root sizes
    try:
        lit_dt = huffman.build_decode_table(lit_lens, ROOT_LIT)
        dist_dt = huffman.build_decode_table(dist_lens, ROOT_DIST,
                                             allow_incomplete=True)
    except huffman.InvalidTree as e:
        raise de.MalformedError("invalid dictionary") from e
    lit = np.full(MAX_TABLE, huffman.ENTRY_INVALID, np.int32)
    if lit_dt.table.size > MAX_TABLE:
        raise NotParallelizable("lit table too large")
    lit[: lit_dt.table.size] = lit_dt.table
    dist = np.full(DIST_TABLE, huffman.ENTRY_INVALID, np.int32)
    if dist_dt.table.size > DIST_TABLE:
        raise NotParallelizable("dist table too large")
    dist[: dist_dt.table.size] = dist_dt.table
    # start bit position of the symbol section
    start_bit = (r.pos * 8) - r.nbits
    return ("huff", lit, dist, start_bit)


@functools.partial(jax.jit, static_argnames=("max_cmds",))
def decode_symbols(words, start_bits, lit_tabs, dist_tabs, max_cmds: int):
    """Lockstep symbol decode across B members.

    words: uint32[B, W]; start_bits: int32[B]; lit_tabs: int32[B, MAX_TABLE];
    dist_tabs: int32[B, DIST_TABLE].
    Returns (kinds int8[B, max_cmds] (0 lit, 1 copy, 2 end), values
    int32[B, max_cmds] (literal byte or length), dists int32[B, max_cmds],
    ok bool[B]).
    """
    b = words.shape[0]
    lbase = jnp.asarray(tables.LENGTH_BASE)
    lextra = jnp.asarray(tables.LENGTH_EXTRA)
    dbase = jnp.asarray(tables.DIST_BASE)
    dextra = jnp.asarray(tables.DIST_EXTRA)

    def resolve(tabs, root_bits, peek):
        idx = (peek & ((1 << root_bits) - 1)).astype(jnp.int32)
        e = jnp.take_along_axis(tabs, idx[:, None], axis=1)[:, 0]
        is_link = (e >> 28) == huffman.F_LINK
        sub_bits = (e >> 16) & 0xFFF
        sub_idx = (e & 0xFFFF) + (
            (peek >> root_bits).astype(jnp.int32) & ((1 << sub_bits) - 1)
        )
        e2 = jnp.take_along_axis(tabs, jnp.minimum(sub_idx, MAX_TABLE - 1)[:, None], axis=1)[:, 0]
        e = jnp.where(is_link, e2, e)
        sym = e & 0xFFFF
        nbits = (e >> 16) & 0xFFF
        bad = (e >> 28) != huffman.F_SYMBOL
        return sym, nbits, bad

    def substep(state):
        i, bitpos, done, bad, kinds, values, dists = state
        widx = (bitpos >> 5).astype(jnp.int32)
        r = (bitpos & 31).astype(jnp.uint32)
        lo = jnp.take_along_axis(words, widx[:, None], axis=1)[:, 0]
        w1 = jnp.take_along_axis(words, (widx + 1)[:, None], axis=1)[:, 0]
        w2 = jnp.take_along_axis(words, (widx + 2)[:, None], axis=1)[:, 0]
        p0 = jnp.where(r == 0, lo, (lo >> r) | (w1 << ((32 - r) & 31)))
        p1 = jnp.where(r == 0, w1, (w1 >> r) | (w2 << ((32 - r) & 31)))

        sym, nb, bad1 = resolve(lit_tabs, ROOT_LIT, p0)
        consumed = nb
        # length symbol path
        lsym = jnp.clip(sym - 257, 0, 28)
        leb = lextra[lsym]
        lext = (p0 >> consumed.astype(jnp.uint32)) & ((jnp.uint32(1) << leb.astype(jnp.uint32)) - 1)
        length = lbase[lsym] + lext.astype(jnp.int32)
        consumed_len = consumed + leb
        # distance symbol from the remaining bits (may cross into p1)
        rem = (p0 >> consumed_len.astype(jnp.uint32)) | jnp.where(
            consumed_len == 0, jnp.uint32(0), p1 << ((32 - consumed_len).astype(jnp.uint32) & 31)
        )
        dsym, dnb, bad2 = resolve(dist_tabs, ROOT_DIST, rem)
        deb = dextra[jnp.clip(dsym, 0, 29)]
        dext = (rem >> dnb.astype(jnp.uint32)) & ((jnp.uint32(1) << deb.astype(jnp.uint32)) - 1)
        dist = dbase[jnp.clip(dsym, 0, 29)] + dext.astype(jnp.int32)

        is_lit = sym < 256
        is_end = sym == 256
        is_copy = sym > 256
        total = jnp.where(
            is_copy, consumed_len + dnb + deb, consumed
        )
        kind = jnp.where(is_end, 2, jnp.where(is_copy, 1, 0)).astype(jnp.int8)
        value = jnp.where(is_copy, length, sym)

        new_bad = bad | (~done & (bad1 | (is_copy & (bad2 | (dsym > 29))) | (sym > 285)))
        write = ~done & ~new_bad
        kinds = kinds.at[:, i].set(jnp.where(write, kind, kinds[:, i]))
        values = values.at[:, i].set(jnp.where(write, value, values[:, i]))
        dists = dists.at[:, i].set(jnp.where(write, dist, dists[:, i]))
        bitpos = jnp.where(write, bitpos + total, bitpos)
        done = done | is_end | new_bad
        return i + 1, bitpos, done, new_bad, kinds, values, dists

    def step(state):
        # four symbols per loop iteration: the while_loop's per-step op
        # issue cost dominates at small batch, so unrolling amortizes it
        return substep(substep(substep(substep(state))))

    def cond(state):
        i, _, done, _, _, _, _ = state
        return (i < max_cmds - 3) & ~jnp.all(done)

    kinds0 = jnp.full((b, max_cmds), 2, jnp.int8)
    values0 = jnp.zeros((b, max_cmds), jnp.int32)
    dists0 = jnp.zeros((b, max_cmds), jnp.int32)
    init = (
        jnp.int32(0), start_bits.astype(jnp.int32),
        jnp.zeros(b, bool), jnp.zeros(b, bool),
        kinds0, values0, dists0,
    )
    i, bitpos, done, bad, kinds, values, dists = jax.lax.while_loop(cond, step, init)
    return kinds, values, dists, done & ~bad


@functools.partial(jax.jit, static_argnames=("out_len", "max_rounds"))
def expand_commands(kinds, values, dists, out_len: int, max_rounds: int | None = None):
    """LZ77 expansion: commands -> bytes, member-parallel.

    For every output byte, compute its *source*: literals root the
    chains; copy bytes point at ``opos - dist + ((j - opos) % dist)``
    (modular arithmetic realises overlapping-copy semantics).  Pointer
    jumping resolves copy-of-copy chains in log(depth) rounds.
    Returns (payload uint8[B, out_len], lengths int32[B]).
    """
    if max_rounds is None:
        # chains are < out_len deep; doubling needs log2 rounds
        max_rounds = max(4, out_len.bit_length() + 1)
    b, m = kinds.shape
    is_lit = kinds == 0
    is_copy = kinds == 1
    clen = jnp.where(is_copy, values, jnp.where(is_lit, 1, 0))
    opos = jnp.cumsum(clen, axis=1) - clen  # output offset of each cmd
    total = opos[:, -1] + clen[:, -1]

    def one(is_lit, is_copy, values, dists, clen, opos, total):
        j = jnp.arange(out_len, dtype=jnp.int32)
        # literal scatter: value byte -> its output position
        lit_pos = jnp.where(is_lit, opos, out_len)  # drop non-literals
        lit_val = jnp.where(is_lit, values, 0)
        out_lit = jnp.zeros(out_len + 1, jnp.int32).at[lit_pos].add(lit_val, mode="drop")[:out_len]
        has_lit = jnp.zeros(out_len + 1, jnp.int32).at[lit_pos].add(
            jnp.where(is_lit, 1, 0), mode="drop")[:out_len] > 0
        # copy cover: scatter each copy's cmd index at its start, then
        # cummax gives the covering copy for every position
        marker = jnp.full(out_len, -1, jnp.int32).at[
            jnp.where(is_copy, opos, out_len)
        ].max(jnp.where(is_copy, jnp.arange(m), -1), mode="drop")
        cov = jax.lax.cummax(marker)
        safe_cov = jnp.maximum(cov, 0)
        c_opos = opos[safe_cov]
        c_len = clen[safe_cov]
        c_dist = dists[safe_cov]
        covered = (cov >= 0) & (j < c_opos + c_len) & is_copy[safe_cov] & (j < total)
        k = j - c_opos
        src = c_opos - c_dist + (k % jnp.maximum(c_dist, 1))
        src = jnp.where(covered, src, j)  # literals/self point at self
        src = jnp.clip(src, 0, out_len - 1)

        # pointer jumping until literal-rooted
        def jump_cond(state):
            rounds, cur, changed = state
            return (rounds < max_rounds) & changed

        def jump_body(state):
            rounds, cur, _ = state
            nxt = cur[cur]
            return rounds + 1, nxt, jnp.any(nxt != cur)

        _, root, _ = jax.lax.while_loop(
            jump_cond, jump_body, (jnp.int32(0), src, jnp.bool_(True))
        )
        out = out_lit[root].astype(jnp.uint8)
        return out, total

    return jax.vmap(one)(is_lit, is_copy, values, dists, clen, opos, total)
