"""Focused A/B of the round-5 kernel selectors on chip.

Times, on staged device data (median of 3, one scalar fetched):
  - lz77_parse_cost with cost_sel = xla vs pl
  - the pack jit with slot_sel = xla vs pl
  - lz77_analyze with DECOMPRESS_TPU_DESCENT = compact vs rec
    (trace-time knob: both variants trace in this process via env set
    before each first call — fresh level slots avoid stale jit reuse)

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_kernels.py
"""
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from decompress_tpu import de
    from decompress_tpu.ops import lz77
    from decompress_tpu.parallel import sharded

    seg = de.SEGMENT_SIZE
    b = de.MAX_DEVICE_BATCH
    corpus = pathlib.Path(__file__).parent.parent / "tests" / "corpus"
    raw = b"".join(p.read_bytes() for p in sorted(corpus.iterdir()))
    raw = (raw * 2)[: b * seg]
    mb = b * seg / 1e6
    data = np.frombuffer(raw, np.uint8).reshape(b, seg)
    d = jnp.asarray(data)
    nv = jnp.asarray(np.full(b, seg, np.int32))
    hl = jnp.asarray(np.zeros(b, np.int32))
    sel = lz77.mark_sel_for(d)
    print(f"# mark_sel={sel}", flush=True)

    def timed(fn, label, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{label:<46} {med*1e3:8.1f} ms  {med/mb*1e3:8.1f} ms/MB",
              flush=True)
        return med

    # --- round A: descent rec vs compact (trace-time env knob) --------
    for mode in ("compact", "rec"):
        os.environ["DECOMPRESS_TPU_DESCENT"] = mode
        jax.clear_caches()

        def run_a():
            r = lz77.lz77_analyze(d, nv, hl, level=6, seg_len=seg,
                                  hist=0, mark_sel=sel)
            return int(jnp.sum(r["on_path"]) + jnp.sum(r["length"])
                       + jnp.sum(r["hist_lit"]))

        timed(run_a, f"analyze A (descent={mode})")
    os.environ.pop("DECOMPRESS_TPU_DESCENT", None)

    # --- round B: cost_sel xla vs pl ----------------------------------
    res = lz77.lz77_analyze(d, nv, hl, level=6, seg_len=seg, hist=0,
                            mark_sel=sel)
    lc_np, dc_np = lz77._cost_tables_host(
        np.asarray(res["hist_lit"]), np.asarray(res["hist_dist"]))
    hot_np = lz77._hot_dists_host(np.asarray(res["dist_counts"]))
    hot = jnp.asarray(hot_np) if hot_np.any() else None
    lc, dc = jnp.asarray(lc_np), jnp.asarray(dc_np)
    cl, cd = res["cand_length"], res["cand_dist"]

    sums = {}
    for csel in ("xla", "pl"):
        def run_b(_c=csel):
            r2 = lz77.lz77_parse_cost(
                d, cl, cd, nv, lc, dc, hl, hot,
                seg_len=seg, hist=0, mark_sel=sel, cost_sel=_c)
            return int(jnp.sum(r2["on_path"]) + jnp.sum(r2["length"])
                       + jnp.sum(r2["dist"]))

        timed(run_b, f"parse_cost B (cost_sel={csel}, hot={hot is not None})")
        sums[csel] = run_b()
    print(f"# B checksums equal: {sums['xla'] == sums['pl']}", flush=True)

    # --- pack: slot_sel xla vs pl --------------------------------------
    hist_lit = np.asarray(res["hist_lit"])
    hist_dist = np.asarray(res["hist_dist"])
    finals = np.ones(b, bool)
    hdr, tabs, kinds = de.plan_blocks(hist_lit, hist_dist,
                                      np.full(b, seg, np.int32), finals,
                                      pad_to=b)
    out_words = (9 * seg) // 32 + 2 * de._HDR_PAD
    tab_dev = [jnp.asarray(t) for t in (hdr[0], hdr[1], *tabs)]
    pack = de._get_pack_jit()
    psums = {}
    for ssel in ("xla", "pl"):
        def run_p(_s=ssel):
            (w, totals), sp = pack(
                res["on_path"], res["is_match"], res["length"], res["dist"],
                d, *tab_dev, out_words=out_words,
                n_splits=sharded.N_SPLITS, split_stride=sharded.SPLIT_STRIDE,
                split_bits=sharded.SPLIT_BITS, slot_sel=_s)
            return int(jnp.sum(totals))

        timed(run_p, f"pack (slot_sel={ssel})")
        psums[ssel] = run_p()
    print(f"# pack totals equal: {psums['xla'] == psums['pl']}", flush=True)


if __name__ == "__main__":
    main()
