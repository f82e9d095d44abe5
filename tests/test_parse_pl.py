"""Pallas mark-path kernel == the XLA hybrid walk, bit-identical.

The kernel (ops/parse_pl.py) is the hybrid with C=7: per-row doubling
exits, a row-hop scan, and the top-down entry refinement — these tests
drive it in interpreter mode (no TPU needed) against `_mark_path` /
`_mark_path_hybrid` on adversarial jump arrays.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from decompress_tpu.ops import lz77, parse_pl  # noqa: E402


def _random_jumps(rng, b, p, seg_len):
    """Jump arrays the parse actually produces: g[i] = i + step,
    step in {1} or [3, 258], clipped to p; tail positions step 1."""
    step = np.ones((b, p), np.int64)
    take = rng.random((b, seg_len)) < 0.3
    ln = rng.integers(3, 259, size=(b, seg_len))
    step[:, :seg_len] = np.where(take, ln, 1)
    g = np.minimum(np.arange(p)[None, :] + step, p)
    return jnp.asarray(g.astype(np.int32))


@pytest.mark.parametrize("p,seg_len,b", [(4096, 4096, 3), (8192, 7777, 2),
                                         (1024, 1000, 1)])
def test_mark_path_pl_matches_hybrid(p, seg_len, b):
    rng = np.random.default_rng(p + b)
    g2 = _random_jumps(rng, b, p, seg_len)
    levels = p.bit_length() - 1
    want = np.asarray(jax.vmap(lambda g: lz77._mark_path(g, levels))(g2))
    got = np.asarray(parse_pl.mark_path_pl(g2, interpret=True))
    assert np.array_equal(got, want)


def test_mark_path_pl_all_literals_and_all_jumps():
    p = 2048
    # all-literal: every position on path
    g = jnp.minimum(jnp.arange(p, dtype=jnp.int32)[None, :] + 1, p)
    got = np.asarray(parse_pl.mark_path_pl(g, interpret=True))[0]
    assert got.all()
    # max-jumps: position k*258 on path only
    g = jnp.minimum(jnp.arange(p, dtype=jnp.int32)[None, :] + 258, p)
    got = np.asarray(parse_pl.mark_path_pl(g, interpret=True))[0]
    want = np.zeros(p, bool)
    want[np.arange(0, p, 258)] = True
    assert np.array_equal(got, want)


def test_analyze_pl_interpret_matches_xla():
    seg_len = 4096
    corpus = __import__("pathlib").Path(__file__).parent / "corpus"
    raw = (corpus / "book1").read_bytes()[: 2 * seg_len]
    data = np.zeros((2, seg_len), np.uint8)
    data[0] = np.frombuffer(raw[:seg_len], np.uint8)
    data[1] = np.frombuffer(raw[seg_len:], np.uint8)
    d = jnp.asarray(data)
    nv = jnp.asarray(np.array([seg_len, seg_len - 7], np.int32))
    hl = jnp.asarray(np.zeros(2, np.int32))
    a = lz77.lz77_analyze(d, nv, hl, level=6, seg_len=seg_len, hist=0,
                          mark_sel="xla")
    b = lz77.lz77_analyze(d, nv, hl, level=6, seg_len=seg_len, hist=0,
                          mark_sel="pl-interpret")
    for k in ("on_path", "is_match", "length", "dist", "hist_lit",
              "hist_dist"):
        assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k
