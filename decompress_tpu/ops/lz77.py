"""Device LZ77 match finder + fully parallel parse.

TPU-native re-design of the reference's hash-chain matcher
(`De.Lz77`, de.ml:4013–4515: hash4 de.ml:4055–4071, `longest_match`
de.ml:4110–4174, lazy matching de.ml:4351–4410) and of `De.Def.Ns`'s
libdeflate-style matchfinder (de.ml:3111–3124, 3775–3826).  Nothing is
byte-serial here:

* **hash4 of every position at once** — one vectorized multiply/shift
  (the reference computes the same hash one byte at a time).
* **candidates via sorted buckets** — sorting ``(hash, pos)`` makes each
  position's K most recent same-hash predecessors its K sorted
  neighbours: the exact candidate set of a depth-K hash chain, found
  with shifts instead of pointer chasing.
* **small-distance candidates via associative scans** — run lengths of
  ``data[i] == data[i-d]`` for d ∈ {1,2,3,4} give exact (up-to-258)
  lengths for RLE-like matches with no gathers (the analogue of the
  reference's `fill2` dist-1 fast path, de.ml:186–205).
* **greedy+lazy parse by a gather-only segment-tree walk** — the parse
  "which positions emit a command" is the orbit of a strictly
  increasing jump function; we mark it in O(log n) rounds of pure
  gathers (exit/entry tables over power-of-two blocks), with no
  scatters and no sequential walk.

The 32 KiB history prefix of each segment carries cross-segment match
context (window parity with the reference's sliding window,
de.ml:4268–4342) while keeping segments embarrassingly parallel: the
history is just earlier bytes of the original input.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import tables

HIST = 32768          # history prefix per segment (DEFLATE window)
MIN_MATCH = 3
MAX_MATCH = 258
TOO_FAR = 4096        # don't take length-3 matches farther than this (de.ml:4054)
HASH_BITS = 15


@dataclass(frozen=True)
class LevelConfig:
    """Per-level tuning, the analogue of de.ml:4021–4049's configuration."""

    k_candidates: int   # sorted-bucket candidates (hash-chain depth)
    probe_words: int    # 4-byte words compared per candidate before ranking
    lazy: bool          # one-step lazy matching
    ext_rounds: int     # max 8-byte extension rounds for the winner


LEVELS: dict[int, LevelConfig] = {
    1: LevelConfig(2, 2, False, 4),
    2: LevelConfig(4, 2, False, 8),
    3: LevelConfig(4, 3, False, 16),
    4: LevelConfig(8, 4, True, 32),
    5: LevelConfig(8, 4, True, 32),
    6: LevelConfig(8, 4, True, 32),
    7: LevelConfig(16, 4, True, 32),
    8: LevelConfig(16, 6, True, 32),
    9: LevelConfig(24, 6, True, 32),
}


def _ceil_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _u32_words(b: jnp.ndarray) -> jnp.ndarray:
    """4-byte little-endian word starting at every position (wraps at end;
    the wrap region is masked out by validity clamps downstream)."""
    b = b.astype(jnp.uint32)
    return (
        b
        | jnp.roll(b, -1) << 8
        | jnp.roll(b, -2) << 16
        | jnp.roll(b, -3) << 24
    )


def _prefix_bytes_equal(x: jnp.ndarray) -> jnp.ndarray:
    """Number of equal low-order bytes given xor of two 4-byte words (0..4)."""
    return (
        (x == 0).astype(jnp.int32) * 4
        + ((x != 0) & ((x & 0xFF) == 0)).astype(jnp.int32)
        + ((x != 0) & ((x & 0xFFFF) == 0)).astype(jnp.int32)
        + ((x != 0) & ((x & 0xFFFFFF) == 0)).astype(jnp.int32)
    )


def _run_length_scan(eq: jnp.ndarray) -> jnp.ndarray:
    """r[i] = length of the run of True starting at i (capped naturally).

    Computed as a reversed associative scan with the "count trailing
    ones" combiner.
    """
    x = eq.astype(jnp.int32)[::-1]

    # monoid: (trailing-ones count, is-all-ones); combine(left, right) is
    # the concatenation left·right
    def combine(a, b):
        run_a, full_a = a
        run_b, full_b = b
        return run_b + jnp.where(full_b, run_a, 0), full_a & full_b

    run, _ = jax.lax.associative_scan(combine, (x, x == 1))
    return run[::-1]


def _match_candidates(data_u8, valid_lo, valid_hi, cfg: LevelConfig):
    """Best match (length, dist) at every position of one segment.

    data_u8: uint8[T]; valid data occupies [valid_lo, valid_hi).
    Returns (length int32[T], dist int32[T]) with length < MIN_MATCH
    where no acceptable match exists.
    """
    t = data_u8.shape[0]
    pos = jnp.arange(t, dtype=jnp.int32)
    w = _u32_words(data_u8)

    h = ((w * jnp.uint32(2654435761)) >> jnp.uint32(32 - HASH_BITS)).astype(jnp.int32)

    # ---- sorted-bucket candidates (depth-K hash chain equivalent) ----
    sh, sp = jax.lax.sort((h, pos), num_keys=2)
    cands = []
    for k in range(cfg.k_candidates):
        prev_p = jnp.concatenate([jnp.full(k + 1, -1, jnp.int32), sp[: t - k - 1]])
        prev_h = jnp.concatenate([jnp.full(k + 1, -1, jnp.int32), sh[: t - k - 1]])
        cands.append(jnp.where(prev_h == sh, prev_p, -1))
    cand_sorted = jnp.stack(cands, axis=1)  # [T, K] in rank space
    inv = jnp.zeros(t, jnp.int32).at[sp].set(pos, unique_indices=True)
    cand = cand_sorted[inv]  # [T, K] in position space

    dist = pos[:, None] - cand
    ok = (
        (cand >= 0)
        & (dist <= tables.WINDOW_SIZE)
        & (cand >= valid_lo)
        & (cand < valid_hi)
        & (pos[:, None] < valid_hi)
    )

    # ---- probe first 4*probe_words bytes of each candidate ----
    probe_len = jnp.zeros(cand.shape, jnp.int32)
    alive = ok
    safe_cand = jnp.maximum(cand, 0)
    for j in range(cfg.probe_words):
        gj = w[jnp.minimum(safe_cand + 4 * j, t - 1)]
        wj = jnp.roll(w, -4 * j)[:, None] if j else w[:, None]
        eq = _prefix_bytes_equal(gj ^ jnp.broadcast_to(wj, gj.shape))
        probe_len = probe_len + jnp.where(alive, eq, 0)
        alive = alive & (eq == 4)

    # best candidate: longest probe, then nearest
    score = (probe_len << 17) - dist
    score = jnp.where(ok, score, jnp.int32(-(1 << 30)))
    best_k = jnp.argmax(score, axis=1)
    blen = jnp.take_along_axis(probe_len, best_k[:, None], axis=1)[:, 0]
    bcand = jnp.take_along_axis(cand, best_k[:, None], axis=1)[:, 0]
    bok = jnp.take_along_axis(ok, best_k[:, None], axis=1)[:, 0]
    bdist = pos - bcand

    # ---- extend the winner in 8-byte rounds (while any lane continues) ----
    probe_bytes = 4 * cfg.probe_words

    def ext_cond(state):
        rnd, _, alive_mask = state
        return (rnd < cfg.ext_rounds) & jnp.any(alive_mask)

    def ext_body(state):
        rnd, length, alive_mask = state
        off = probe_bytes + rnd * 8
        added = jnp.zeros(t, jnp.int32)
        a2 = alive_mask
        for half in range(2):
            o = off + 4 * half
            gj = w[jnp.minimum(jnp.maximum(bcand, 0) + o, t - 1)]
            wj = w[jnp.minimum(pos + o, t - 1)]
            eq = _prefix_bytes_equal(gj ^ wj)
            added = added + jnp.where(a2, eq, 0)
            a2 = a2 & (eq == 4)
        return rnd + 1, length + added, a2

    alive0 = bok & (blen == probe_bytes)
    _, full_len, _ = jax.lax.while_loop(
        ext_cond, ext_body, (jnp.int32(0), blen, alive0)
    )
    length = jnp.where(bok, full_len, 0)

    # ---- exact small-distance (RLE-ish) candidates via scans ----
    for d in (1, 2, 3, 4):
        eq_d = data_u8 == jnp.roll(data_u8, d)
        run = _run_length_scan(eq_d)
        src_ok = (pos - d >= valid_lo) & (pos < valid_hi)
        len_d = jnp.where(src_ok, jnp.minimum(run, MAX_MATCH), 0)
        better = (len_d > length) | ((len_d == length) & (d < bdist))
        bdist = jnp.where(better, d, bdist)
        length = jnp.where(better, len_d, length)

    # clamp to data end and legality
    length = jnp.minimum(length, MAX_MATCH)
    length = jnp.minimum(length, jnp.maximum(valid_hi - pos, 0))
    too_far = (length == MIN_MATCH) & (bdist > TOO_FAR)
    length = jnp.where(too_far, 0, length)
    length = jnp.where(length >= MIN_MATCH, length, 0)
    return length, bdist


def _mark_path(g: jnp.ndarray, start: int, levels: int) -> jnp.ndarray:
    """Positions visited by iterating the strictly increasing jump ``g``
    from ``start``: gather-only exit/entry tables over 2^k blocks.

    g: int32[P] with P = 2^levels and start <= g[i] < P for i >= start.
    Returns bool[P].
    """
    p = g.shape[0]
    idx = jnp.arange(p, dtype=jnp.int32)
    exits = [g]
    for k in range(1, levels + 1):
        prev = exits[-1]
        end_k = ((idx >> k) + 1) << k
        e1 = prev
        exits.append(jnp.where(e1 >= end_k, e1, prev[jnp.minimum(e1, p - 1)]))
    # top-down entry values: first walk value >= start of i's level-k block
    entry = jnp.full(p, start, jnp.int32)
    for k in range(levels - 1, -1, -1):
        blk = idx >> k
        is_right = (blk & 1) == 1
        mid = blk << k  # start of i's own level-k block
        stepped = exits[k][jnp.minimum(entry, p - 1)]
        entry = jnp.where(is_right & (entry < mid), stepped, entry)
    return entry == idx


@functools.partial(jax.jit, static_argnames=("level", "seg_len"))
def lz77_analyze(data, n_valid, hist_len, *, level: int, seg_len: int):
    """Match-find + parse a batch of segments.

    data: uint8[B, HIST + seg_len] — 32 KiB history prefix then payload
      (zero padded); n_valid: int32[B] payload bytes; hist_len: int32[B]
      valid history bytes.
    Returns per-position arrays over the payload ([B, seg_len]):
      on_path (emit a command here), is_match, length, dist, and
      histograms hist_lit[B, 286] (EOB not included), hist_dist[B, 30].
    """
    cfg = LEVELS[level]
    t = HIST + seg_len
    p = _ceil_pow2(t + MAX_MATCH + 1)
    levels = p.bit_length() - 1

    def one(seg, n, hl):
        valid_lo = HIST - hl
        valid_hi = HIST + n
        length, dist = _match_candidates(seg, valid_lo, valid_hi, cfg)

        posn = jnp.arange(t, dtype=jnp.int32)
        in_payload = (posn >= HIST) & (posn < valid_hi)
        length = jnp.where(in_payload, length, 0)

        if cfg.lazy:
            nxt_len = jnp.concatenate([length[1:], jnp.zeros(1, jnp.int32)])
            defer = nxt_len > length
        else:
            defer = jnp.zeros(t, bool)
        take = (length >= MIN_MATCH) & ~defer

        step = jnp.where(take, length, 1)
        g = jnp.minimum(jnp.arange(p, dtype=jnp.int32) + 1, p - 1)
        g = g.at[:t].set(jnp.minimum(posn + step, p - 1))
        on_path_full = _mark_path(g, HIST, levels)

        on_path = on_path_full[HIST : HIST + seg_len] & (
            jnp.arange(seg_len, dtype=jnp.int32) < n
        )
        is_match = on_path & take[HIST:t]
        mlen = jnp.where(is_match, length[HIST:t], 0)
        mdist = jnp.where(is_match, dist[HIST:t], 0)

        lcode = jnp.asarray(tables.LENGTH_CODE_MAP)[
            jnp.clip(mlen - MIN_MATCH, 0, 255)
        ]
        lit = seg[HIST:t].astype(jnp.int32)
        sym = jnp.where(is_match, 257 + lcode, lit)
        emit = on_path.astype(jnp.int32)
        hist_lit = jnp.zeros(286, jnp.int32).at[sym].add(emit, mode="drop")
        dmap = jnp.asarray(tables.DIST_CODE_MAP)
        dsym = jnp.where(
            mdist <= 256,
            dmap[jnp.clip(mdist - 1, 0, 255)],
            dmap[jnp.clip(256 + ((mdist - 1) >> 7), 0, 511)],
        )
        hist_dist = (
            jnp.zeros(30, jnp.int32)
            .at[dsym]
            .add(is_match.astype(jnp.int32), mode="drop")
        )
        return dict(
            on_path=on_path,
            is_match=is_match,
            length=mlen,
            dist=mdist,
            hist_lit=hist_lit,
            hist_dist=hist_dist,
        )

    return jax.vmap(one)(data, n_valid, hist_len)
