"""Pallas histogram kernel (ops/hist_pl.py) vs the scatter reference."""

import numpy as np

import jax.numpy as jnp

from decompress_tpu.ops import codes, hist_pl


def test_histograms_pl_matches_scatter():
    rng = np.random.default_rng(5)
    b, t = 3, 4096
    lit = rng.integers(0, 256, (b, t)).astype(np.int32)
    on_path = rng.random((b, t)) < 0.4
    is_match = on_path & (rng.random((b, t)) < 0.5)
    length = np.where(is_match, rng.integers(3, 259, (b, t)), 0).astype(
        np.int32)
    dist = np.where(is_match, rng.integers(1, 1 << 15, (b, t)), 0).astype(
        np.int32)

    hl, hd = hist_pl.histograms_pl(
        jnp.asarray(on_path), jnp.asarray(is_match), jnp.asarray(length),
        jnp.asarray(dist), jnp.asarray(lit), interpret=True)

    lcode = np.asarray(codes.length_code(jnp.asarray(length)))
    sym = np.where(is_match, 257 + lcode, lit)
    dsym = np.asarray(codes.dist_code(jnp.asarray(dist)))
    ref_l = np.zeros((b, 286), np.int32)
    ref_d = np.zeros((b, 30), np.int32)
    for i in range(b):
        np.add.at(ref_l[i], sym[i][on_path[i]], 1)
        np.add.at(ref_d[i], dsym[i][is_match[i]], 1)
    np.testing.assert_array_equal(np.asarray(hl), ref_l)
    np.testing.assert_array_equal(np.asarray(hd), ref_d)
