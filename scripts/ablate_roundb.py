"""Attribute round B (analyze2_finish) cost: exact-retry firing?
hot-stride mining? the re-parse itself?

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_roundb.py
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax.numpy as jnp

from decompress_tpu import de
from decompress_tpu.ops import lz77

LEVEL = 6


def timed(fn, label, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{label:<52} {med*1e3:8.1f} ms", flush=True)
    return med


def main():
    seg = de.SEGMENT_SIZE
    b = de.MAX_DEVICE_BATCH
    corpus = pathlib.Path(__file__).parent.parent / "tests" / "corpus"
    raw = b"".join(p.read_bytes() for p in sorted(corpus.iterdir()))
    raw = (raw * 2)[: b * seg]
    data = np.frombuffer(raw, np.uint8).reshape(b, seg)
    d = jnp.asarray(data)
    nv = jnp.asarray(np.full(b, seg, np.int32))
    hl = jnp.asarray(np.zeros(b, np.int32))
    mb = b * seg / 1e6

    res = lz77.lz77_analyze(d, nv, hl, level=LEVEL, seg_len=seg, hist=0)
    exact_a = np.asarray(res["exact"])
    print("round A exact flags:", exact_a)

    lit_cost, dist_cost = lz77._cost_tables_host(
        np.asarray(res["hist_lit"]), np.asarray(res["hist_dist"]))
    lc = jnp.asarray(lit_cost)
    dc = jnp.asarray(dist_cost)
    hot_np = lz77._hot_dists_host(np.asarray(res["dist_counts"]))
    print("hot dists:", hot_np[:2])
    hot = jnp.asarray(hot_np)
    cl, cd = res["cand_length"], res["cand_dist"]

    def pc(hot_arg):
        r2 = lz77.lz77_parse_cost(d, cl, cd, nv, lc, dc, hl, hot_arg,
                                  seg_len=seg, hist=0, lazy=True)
        return np.asarray(r2["exact"])

    t_hot = timed(lambda: pc(hot), "parse_cost WITH hot mining")
    t_no = timed(lambda: pc(None), "parse_cost hot=None")
    ex2 = pc(hot)
    print("round B exact flags:", ex2)
    if not ex2.all():
        print("!! round B exact-retry FIRES every call: force_exact "
              "analyze + second parse_cost ride on top")
        tx = timed(lambda: np.asarray(
            lz77.lz77_analyze(d, nv, hl, level=LEVEL, seg_len=seg,
                              force_exact=True, hist=0)["exact"]),
            "force_exact analyze (the retry's first half)")
        print(f"retry path total ~= {(tx + t_hot)*1e3:.0f} ms")
    print(f"\nper MB: hot {t_hot/mb*1e3:.1f}  nohot {t_no/mb*1e3:.1f} ms/MB")


if __name__ == "__main__":
    main()
