"""Pallas pack slot-builder (ops/pack_pl.py) vs the XLA slot path —
whole-pack bit identity through de._pack_segments (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from decompress_tpu import de
from decompress_tpu.ops import lz77


def test_pack_slots_pl_matches_xla():
    seg = 4096
    b = 2
    rng = np.random.default_rng(11)
    words = rng.integers(97, 111, size=48, dtype=np.uint8)
    raw = np.concatenate([
        np.tile(words[rng.integers(0, 48, 6)], 40) for _ in range(200)
    ])[: b * seg].reshape(b, seg)
    data = jnp.asarray(raw)
    n_valid = jnp.asarray(np.array([seg, seg - 99], np.int32))
    hist_len = jnp.zeros(b, jnp.int32)

    res = lz77.lz77_analyze(data, n_valid, hist_len, level=6,
                            seg_len=seg, hist=0)
    hist_lit = np.asarray(res["hist_lit"])
    hist_dist = np.asarray(res["hist_dist"])
    finals = np.ones(b, bool)
    (hv, hb), tabs, kinds = de.plan_blocks(
        hist_lit, hist_dist, np.asarray(n_valid), finals)
    out_words = (9 * seg) // 32 + 2 * de._HDR_PAD
    tab_dev = [jnp.asarray(t) for t in (hv, hb, *tabs)]

    pack = de._get_pack_jit()

    def run(sel):
        return pack(
            res["on_path"], res["is_match"], res["length"], res["dist"],
            data, *tab_dev, out_words=out_words,
            n_splits=8, split_stride=64, split_bits=2048, slot_sel=sel)

    (w_a, t_a), sp_a = run("xla")
    (w_p, t_p), sp_p = run("pl-interpret")
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_p))
    np.testing.assert_array_equal(np.asarray(w_a), np.asarray(w_p))
    for x, y in zip(sp_a, sp_p):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
