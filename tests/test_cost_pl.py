"""Pallas round-B cost kernels (ops/cost_pl.py) vs the XLA gather path.

The pl path must be BIT-IDENTICAL to the XLA path: same take/length/
dist decisions, same histograms, same exact flags.  Runs the kernels in
interpret mode (Mosaic lowering is covered on-chip; cf.
tests/test_inflate_pl.py's discipline)."""

import numpy as np
import pytest

import jax.numpy as jnp

from decompress_tpu.ops import cost_pl, lz77


def _mk_batch(seed, b, seg_len, hist=0):
    rng = np.random.default_rng(seed)
    parts = []
    for i in range(b):
        # compressible text-ish data with repeats and strides
        words = rng.integers(97, 123, size=64, dtype=np.uint8)
        chunks = []
        while sum(len(c) for c in chunks) < hist + seg_len:
            w = words[rng.integers(0, 64, 8)]
            chunks.append(np.tile(w, rng.integers(1, 6)))
        parts.append(np.concatenate(chunks)[: hist + seg_len])
    return np.stack(parts)


@pytest.mark.parametrize("seg_len,mine", [(4096, False), (8192, True)])
def test_parse_cost_pl_matches_xla(seg_len, mine):
    b = 2
    data = jnp.asarray(_mk_batch(7, b, seg_len))
    n_valid = jnp.asarray(
        np.array([seg_len, seg_len - 173], np.int32))
    hist_len = jnp.zeros(b, jnp.int32)

    res = lz77.lz77_analyze(data, n_valid, hist_len, level=6,
                            seg_len=seg_len, hist=0)
    lc, dc = lz77._cost_tables_host(np.asarray(res["hist_lit"]),
                                    np.asarray(res["hist_dist"]))
    hot = None
    if mine:
        hot_np = lz77._hot_dists_host(np.asarray(res["dist_counts"]))
        hot = jnp.asarray(hot_np)  # may be all zeros; lane must cope

    kw = dict(seg_len=seg_len, hist=0, lazy=True, window_bits=15)
    a = lz77.lz77_parse_cost(
        data, res["cand_length"], res["cand_dist"], n_valid,
        jnp.asarray(lc), jnp.asarray(dc), hist_len, hot,
        cost_sel="xla", **kw)
    p = lz77.lz77_parse_cost(
        data, res["cand_length"], res["cand_dist"], n_valid,
        jnp.asarray(lc), jnp.asarray(dc), hist_len, hot,
        cost_sel="pl-interpret", **kw)
    for k in ("on_path", "is_match", "length", "dist", "hist_lit",
              "hist_dist", "exact"):
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(p[k]), err_msg=k)


@pytest.mark.parametrize("b,seed", [(2, 3), (1, 11)])
def test_litbits_and_gain_primitives(b, seed):
    """b=2 is the regular small-batch case; b=1 is the tail-batch
    (B < R_BLOCK) case where the per-segment tables pad to R_BLOCK
    rows so the in-kernel segment-row gather is shape-legal under
    Mosaic (the bench e2e's 65th segment hit this)."""
    rng = np.random.default_rng(seed)
    t = 1024
    lit = jnp.asarray(rng.integers(0, 256, (b, t), dtype=np.int64)
                      .astype(np.int32))
    lcost = jnp.asarray(rng.integers(1, 15, (b, 286), dtype=np.int64)
                        .astype(np.int32))
    lb = cost_pl.litbits_pl(lit, lcost, interpret=True)
    ref = np.take_along_axis(np.asarray(lcost), np.asarray(lit), axis=1)
    np.testing.assert_array_equal(np.asarray(lb), ref)

    # slab lookup: span must equal the exclusive prefix-sum difference
    slab = cost_pl._pref_slab(lb)
    pref = np.concatenate(
        [np.zeros((b, 1), np.int32), np.cumsum(np.asarray(lb), axis=1)],
        axis=1)
    ln = rng.integers(0, 259, (b, t)).astype(np.int32)
    dist = rng.integers(1, 1 << 15, (b, t)).astype(np.int32)
    dcost = jnp.asarray(rng.integers(1, 15, (b, 30), dtype=np.int64)
                        .astype(np.int32))
    mlen, mdist, gain = cost_pl.gain_pl(
        jnp.asarray(ln), jnp.asarray(dist), None, None, slab, lcost, dcost,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(mlen), ln)
    np.testing.assert_array_equal(np.asarray(mdist), dist)
    # reference gain in numpy
    from decompress_tpu.ops import codes

    lsym, lex, _ = (np.asarray(x) for x in codes.length_code_parts(
        jnp.asarray(ln)))
    dsym, dex, _ = (np.asarray(x) for x in codes.dist_code_parts(
        jnp.asarray(dist)))
    cost = (np.take_along_axis(np.asarray(lcost),
                               np.clip(257 + lsym, 0, 285), axis=1)
            + lex
            + np.take_along_axis(np.asarray(dcost),
                                 np.clip(dsym, 0, 29), axis=1)
            + dex)
    pos = np.arange(t)[None, :]
    span = (np.take_along_axis(pref, np.minimum(pos + ln, t), axis=1)
            - np.take_along_axis(pref, pos, axis=1))
    ref_gain = np.where(ln >= 3, span - cost, cost_pl.NEG_GAIN)
    np.testing.assert_array_equal(np.asarray(gain), ref_gain)
