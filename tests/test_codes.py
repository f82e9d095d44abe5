"""Elementwise code arithmetic (ops/codes.py) vs the RFC 1951 tables.

The device kernels compute length/distance code indices, extra-bit
counts and extra-bit values arithmetically (no table gathers); these
tests pin them to the table maps over the ENTIRE input domain.
"""

import jax.numpy as jnp
import numpy as np

from decompress_tpu.core import tables
from decompress_tpu.ops import codes


def test_length_code_parts_exhaustive():
    lengths = np.arange(3, 259, dtype=np.int32)
    code, extra, val = codes.length_code_parts(jnp.asarray(lengths))
    code, extra, val = np.asarray(code), np.asarray(extra), np.asarray(val)
    want_code = tables.LENGTH_CODE_MAP[lengths - 3]
    np.testing.assert_array_equal(code, want_code)
    np.testing.assert_array_equal(extra, tables.LENGTH_EXTRA[want_code])
    np.testing.assert_array_equal(val, lengths - tables.LENGTH_BASE[want_code])


def test_dist_code_parts_exhaustive():
    dists = np.arange(1, 32769, dtype=np.int32)
    code, extra, val = codes.dist_code_parts(jnp.asarray(dists))
    code, extra, val = np.asarray(code), np.asarray(extra), np.asarray(val)
    m = dists - 1
    want_code = np.where(
        m < 256, tables.DIST_CODE_MAP[np.minimum(m, 255)],
        tables.DIST_CODE_MAP[256 + (m >> 7)],
    )
    np.testing.assert_array_equal(code, want_code)
    np.testing.assert_array_equal(extra, tables.DIST_EXTRA[want_code])
    np.testing.assert_array_equal(val, dists - tables.DIST_BASE[want_code])


def test_out_of_range_lanes_are_benign():
    # masked lanes carry length 0 / dist 0; the arithmetic must stay
    # in-range (no negative shifts, zero extra value) rather than trap
    code, extra, val = codes.length_code_parts(jnp.asarray([0, 1, 2, 300]))
    assert np.asarray(code).min() >= 0 and np.asarray(code).max() <= 28
    assert np.asarray(extra).min() >= 0
    assert np.asarray(val)[:3].max() == 0
    code, extra, val = codes.dist_code_parts(jnp.asarray([0, 40000]))
    assert np.asarray(code).min() >= 0 and np.asarray(code).max() <= 29
