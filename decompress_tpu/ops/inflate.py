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
  2. a device ``while_loop`` decodes whole commands lockstep across
     members from a carried 64-bit bit-window (16-bit conditional
     refills); table lookups are gathers into per-member table rows;
  3. LZ77 expansion: by default the used command prefixes are
     ragged-compacted on device (gather-only) and expanded by the
     native C++ runtime at memcpy speed; the fully-on-device
     alternative (literal scatter + interval-cover source computation
     + pointer-jumping copy resolution) serves device-resident
     pipelines and toolchain-less hosts.

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
def decode_symbols(words, start_bits, lit_tabs, dist_tabs, max_cmds: int,
                   stop_counts=None, row_members=None):
    """Lockstep symbol decode across B members (or member *chunks*).

    words: uint32[B, W]; start_bits: int32[B]; lit_tabs: int32[B, MAX_TABLE];
    dist_tabs: int32[B, DIST_TABLE]; stop_counts: optional int32[B] —
    a row is done after decoding that many commands even without an
    end-of-block symbol (the split-indexed decode: chunks of one
    member's symbol stream decoded as independent rows; 0 = EOB only).
    With row_members (int32[B]), words/lit_tabs/dist_tabs are
    *per-member* arrays indexed on device — several chunk rows share a
    member without duplicating the upload across the host link.
    Returns (kinds int8[B, max_cmds] (0 lit, 1 copy, 2 end), values
    int32[B, max_cmds] (literal byte or length), dists int32[B, max_cmds],
    ok bool[B]).

    Each member carries a 64-bit bit-window (two uint32 lanes) refilled
    one word at a time, so a whole command (lit+extra+dist+extra,
    <= 48 bits) decodes per iteration from register arithmetic with two
    conditional word gathers and four table gathers.
    """
    if row_members is not None:
        words = words[row_members]
        lit_tabs = lit_tabs[row_members]
        dist_tabs = dist_tabs[row_members]
    b, wmax = words.shape
    lbase = jnp.asarray(tables.LENGTH_BASE)
    lextra = jnp.asarray(tables.LENGTH_EXTRA)
    dbase = jnp.asarray(tables.DIST_BASE)
    dextra = jnp.asarray(tables.DIST_EXTRA)
    u32 = jnp.uint32

    def gather_word(widx):
        return jnp.take_along_axis(
            words, jnp.minimum(widx, wmax - 1)[:, None], axis=1)[:, 0]

    def refill16(hidx, hlo, hhi, bits):
        """Insert one 16-bit halfword when fewer than 48 bits are
        buffered.  Halfword granularity is what makes the >=48-bit
        invariant compatible with the 64-bit window: a refill is needed
        whenever bits < 48 and 16 more always fit (48 + 16 = 64)."""
        need = bits < 48
        w = jnp.where(need, gather_word(hidx >> 1), u32(0))
        h16 = (w >> ((hidx & 1).astype(u32) * u32(16))) & u32(0xFFFF)
        sh = jnp.clip(bits, 0, 48).astype(u32)
        lo_add = jnp.where(sh < 32, h16 << (sh & u32(31)), u32(0))
        hi_add = jnp.where(
            sh < 32,
            jnp.where(sh == 0, u32(0), h16 >> ((u32(32) - sh) & u32(31))),
            h16 << ((sh - u32(32)) & u32(31)),
        )
        return (
            jnp.where(need, hidx + 1, hidx),
            hlo | lo_add,
            hhi | hi_add,
            jnp.where(need, bits + 16, bits),
        )

    def consume(hlo, hhi, bits, n):
        nu = n.astype(u32)
        lo = jnp.where(
            nu == 0, hlo,
            (hlo >> nu) | (hhi << ((u32(32) - nu) & u32(31))),
        )
        return lo, hhi >> nu, bits - n

    def resolve(tabs, root_bits, peek):
        idx = (peek & u32((1 << root_bits) - 1)).astype(jnp.int32)
        e = jnp.take_along_axis(tabs, idx[:, None], axis=1)[:, 0]
        is_link = (e >> 28) == huffman.F_LINK
        sub_bits = (e >> 16) & 0xFFF
        sub_idx = (e & 0xFFFF) + (
            (peek >> root_bits).astype(jnp.int32) & ((1 << sub_bits) - 1)
        )
        e2 = jnp.take_along_axis(
            tabs, jnp.minimum(sub_idx, tabs.shape[1] - 1)[:, None], axis=1)[:, 0]
        e = jnp.where(is_link, e2, e)
        return e & 0xFFFF, (e >> 16) & 0xFFF, (e >> 28) != huffman.F_SYMBOL

    def substep(state):
        i, widx, hlo, hhi, bits, done, bad, cmds = state
        # three conditional 16-bit refills guarantee >= 48 buffered bits
        widx, hlo, hhi, bits = refill16(widx, hlo, hhi, bits)
        widx, hlo, hhi, bits = refill16(widx, hlo, hhi, bits)
        widx, hlo, hhi, bits = refill16(widx, hlo, hhi, bits)

        sym, nb, bad1 = resolve(lit_tabs, ROOT_LIT, hlo)
        lsym = jnp.clip(sym - 257, 0, 28)
        leb = lextra[lsym]
        lext = (hlo >> nb.astype(u32)) & ((u32(1) << leb.astype(u32)) - u32(1))
        length = lbase[lsym] + lext.astype(jnp.int32)
        is_lit = sym < 256
        is_end = sym == 256
        is_copy = sym > 256
        c1 = jnp.where(is_copy, nb + leb, nb)
        hlo2, hhi2, bits2 = consume(hlo, hhi, bits, c1)

        dsym, dnb, bad2 = resolve(dist_tabs, ROOT_DIST, hlo2)
        deb = dextra[jnp.clip(dsym, 0, 29)]
        dext = (hlo2 >> dnb.astype(u32)) & ((u32(1) << deb.astype(u32)) - u32(1))
        dist = dbase[jnp.clip(dsym, 0, 29)] + dext.astype(jnp.int32)
        c2 = jnp.where(is_copy, dnb + deb, 0)
        hlo3, hhi3, bits3 = consume(hlo2, hhi2, bits2, c2)

        kind = jnp.where(is_end, 2, jnp.where(is_copy, 1, 0))
        value = jnp.where(is_copy, length, sym)
        new_bad = bad | (~done & (bad1 | (is_copy & (bad2 | (dsym > 29))) | (sym > 285)))
        write = ~done & ~new_bad
        if stop_counts is not None:
            # count-stopped rows: a mid-chunk end-of-block is malformed
            new_bad = new_bad | (write & is_end & (stop_counts > 0))
        # single packed row write: kind<<26 | dist<<10 | value
        packed = (kind << 26) | (jnp.where(is_copy, dist, 0) << 10) | value
        # each row is written exactly once (at iteration i); non-writing
        # members record the end marker
        packed = jnp.where(write, packed, 2 << 26)
        cmds = cmds.at[i].set(packed)
        keep = ~write
        widx = jnp.where(keep, state[1], widx)
        hlo3 = jnp.where(keep, hlo, hlo3)
        hhi3 = jnp.where(keep, hhi, hhi3)
        bits3 = jnp.where(keep, bits, bits3)
        done = done | is_end | new_bad
        if stop_counts is not None:
            done = done | ((stop_counts > 0) & (i + 1 >= stop_counts))
        return i + 1, widx, hlo3, hhi3, bits3, done, new_bad, cmds

    def step(state):
        # four symbols per loop iteration amortize the while_loop's
        # per-step issue cost
        return substep(substep(substep(substep(state))))

    def cond(state):
        i, _, _, _, _, done, _, _ = state
        return (i < max_cmds - 3) & ~jnp.all(done)

    # prime each member's window at its start bit (halfword cursor)
    widx0 = (start_bits >> 5).astype(jnp.int32)
    hlo0 = gather_word(widx0)
    hhi0 = jnp.take_along_axis(
        words, jnp.minimum(widx0 + 1, wmax - 1)[:, None], axis=1)[:, 0]
    drop = (start_bits & 31).astype(jnp.int32)
    hlo0, hhi0, bits0 = consume(hlo0, hhi0, jnp.full(b, 64, jnp.int32), drop)
    widx0 = (widx0 + 2) * 2  # halfword index

    cmds0 = jnp.full((max_cmds, b), 2 << 26, jnp.int32)  # row-major: one
    # contiguous row write per symbol keeps the while-loop carry in place
    init = (
        jnp.int32(0), widx0, hlo0, hhi0, bits0,
        jnp.zeros(b, bool), jnp.zeros(b, bool),
        cmds0,
    )
    out = jax.lax.while_loop(cond, step, init)
    _, _, _, _, _, done, bad, cmds = out
    cmds = cmds.T
    kinds = (cmds >> 26).astype(jnp.int8)
    values = cmds & 0x3FF
    dists = (cmds >> 10) & 0xFFFF
    ok = done & ~bad
    return kinds, values, dists, ok


@functools.partial(jax.jit, static_argnames=("max_cmds",))
def decode_symbols_packed(words, start_bits, lit_tabs, dist_tabs, max_cmds: int):
    """Like :func:`decode_symbols` but returns the packed [B, max_cmds]
    command words directly (for host-side expansion) plus ok flags."""
    kinds, values, dists, ok = decode_symbols(
        words, start_bits, lit_tabs, dist_tabs, max_cmds
    )
    packed = (kinds.astype(jnp.int32) << 26) | (dists << 10) | values
    return packed, ok


@functools.partial(jax.jit, static_argnames=("out_size",))
def compact_commands(packed, ncmds, out_size: int):
    """Ragged device-side compaction: concatenate each member's first
    ncmds[b] packed commands into one flat buffer (gather-only), so the
    host fetches ~sum(ncmds) words instead of the padded matrix."""
    b, m = packed.shape
    offsets = jnp.cumsum(ncmds)  # inclusive
    starts = offsets - ncmds
    j = jnp.arange(out_size, dtype=jnp.int32)
    member = jnp.searchsorted(offsets, j, side="right").astype(jnp.int32)
    member = jnp.minimum(member, b - 1)
    idx = jnp.clip(j - starts[member], 0, m - 1)
    flat = packed[member, idx]
    return jnp.where(j < offsets[-1], flat, 2 << 26)


@functools.partial(jax.jit, static_argnames=())
def command_counts(kinds):
    """Commands per member including the end marker."""
    return jnp.argmax(kinds == 2, axis=1).astype(jnp.int32) + 1


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
