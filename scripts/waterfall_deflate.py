"""Deflate end-to-end waterfall: kernel -> +pack -> +host -> +tunnel.

Attributes every ms/MB of the production compress path (the round-3
verdict's item 5): the analyze kernel, the pack kernel (with
sub-ablations via DECOMPRESS_TPU_PACK_ABLATE), the host tree build,
and the tunnel terms (upload, fetch, dispatch floors).  All device
stages time a *second* dispatch on staged device arrays, fetching one
scalar (block_until_ready is a no-op through the tunnel).

    python scripts/waterfall_deflate.py [--level 6] [--mb 1]

Reference for the stage split: the reference's encoder interleaves
match-finding and bit emission in one loop (de.ml:2708-2897); our
pipeline stages them as analyze -> host plan -> pack (SURVEY §3).
"""
import argparse
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def fetch(x):
    return np.asarray(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-e2e", action="store_true")
    args = ap.parse_args()

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
    # production shape: hist-free members (sharded.py:99)
    data = np.frombuffer(raw, np.uint8).reshape(b, seg)
    n_valid = np.full(b, seg, np.int32)
    hist_len = np.zeros(b, np.int32)

    def timed(fn, label, reps=args.reps):
        fn()  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{label:<44} {med*1e3:8.1f} ms  {med/mb*1e3:8.1f} ms/MB",
              flush=True)
        return med

    # --- tunnel terms -------------------------------------------------
    t_up = timed(lambda: fetch(jnp.asarray(data)[0, :8]),
                 "upload 1MB batch + touch")
    t_disp = timed(lambda: fetch(jnp.asarray(np.zeros(8, np.int32))),
                   "dispatch floor (tiny transfer)")

    # --- analyze kernel ------------------------------------------------
    d = jnp.asarray(data)
    nv = jnp.asarray(n_valid)
    hl = jnp.asarray(hist_len)
    sel = lz77.mark_sel_for(d)
    print(f"# mark_sel={sel}", flush=True)

    @jax.jit
    def run_analyze(dd, nn, hh):
        r = lz77.lz77_analyze(dd, nn, hh, level=args.level, seg_len=seg,
                              hist=0, mark_sel=sel)
        return (jnp.sum(r["on_path"]) + jnp.sum(r["length"])
                + jnp.sum(r["dist"]) + jnp.sum(r["hist_lit"])
                + jnp.sum(r["hist_dist"]))

    t_an = timed(lambda: int(run_analyze(d, nv, hl)), "analyze kernel")

    # --- two-round finish (level>=5 runs round B too) -------------------
    res0 = lz77.analyze2_start(d, nv, hl, level=args.level, seg_len=seg,
                               hist=0)
    fetch(res0["hist_lit"])

    def full_finish():
        r = lz77.analyze2_finish(res0, d, nv, hl, level=args.level,
                                 seg_len=seg, hist=0)
        return fetch(r["hist_lit"])

    t_fin = timed(full_finish, "analyze2_finish (round B + fetch hists)")

    res = lz77.analyze2_finish(res0, d, nv, hl, level=args.level,
                               seg_len=seg, hist=0)
    hist_lit = np.asarray(res["hist_lit"])
    hist_dist = np.asarray(res["hist_dist"])

    # --- host tree build -------------------------------------------------
    final_flags = np.ones(b, bool)

    def host_plan():
        return de.plan_blocks(hist_lit, hist_dist, n_valid, final_flags,
                              pad_to=b)

    t_host = timed(host_plan, "host plan_blocks (tree build + headers)")
    hdr, tabs, kinds = host_plan()

    # --- pack kernel -----------------------------------------------------
    out_words = (9 * seg) // 32 + 2 * de._HDR_PAD
    tab_dev = [jnp.asarray(t) for t in (hdr[0], hdr[1], *tabs)]

    def run_pack():
        pk = de._pack_segments(
            res, d, *tab_dev, out_words,
            n_splits=sharded.N_SPLITS, split_stride=sharded.SPLIT_STRIDE,
            split_bits=sharded.SPLIT_BITS)
        (words, totals), sp = pk
        return fetch(totals)

    t_pack = timed(run_pack, "pack kernel (splits incl., fetch totals)")

    def run_pack_nosplit():
        words, totals = de._pack_segments(res, d, *tab_dev, out_words,
                                          n_splits=0)
        return fetch(totals)

    t_pack0 = timed(run_pack_nosplit, "pack kernel (n_splits=0)")

    # --- full pipeline as-run (tunnel) -----------------------------------
    # The full A -> B -> plan -> pack path exactly as de.py's driver
    # runs it.  Through the tunnel this is SLOWER than the stage sum:
    # the mid-pipeline host exchanges (hist fetch for cost tables, ~10
    # small table uploads) each pay a ~15-25 ms round-trip that a PCIe
    # host doesn't (measured ~350 vs ~225 ms/MB stage-sum).
    def full_pipeline():
        r0 = lz77.analyze2_start(d, nv, hl, level=args.level, seg_len=seg,
                                 hist=0)
        r = lz77.analyze2_finish(r0, d, nv, hl, level=args.level,
                                 seg_len=seg, hist=0)
        hlit = np.asarray(r["hist_lit"])
        hdist = np.asarray(r["hist_dist"])
        hdr_, tabs_, kinds_ = de.plan_blocks(hlit, hdist, n_valid,
                                             final_flags, pad_to=b)
        td = [jnp.asarray(t) for t in (hdr_[0], hdr_[1], *tabs_)]
        pk = de._pack_segments(
            r, d, *td, out_words, n_splits=sharded.N_SPLITS,
            split_stride=sharded.SPLIT_STRIDE, split_bits=sharded.SPLIT_BITS)
        (w_, totals_), _sp_ = pk
        return fetch(totals_)

    t_pipe = timed(full_pipeline, "full pipeline as-run (tunnel exchanges)")

    # --- fetch of packed words ------------------------------------------
    pk = de._pack_segments(
        res, d, *tab_dev, out_words, n_splits=sharded.N_SPLITS,
        split_stride=sharded.SPLIT_STRIDE, split_bits=sharded.SPLIT_BITS)
    (words, totals), _sp = pk
    cap = (int(np.asarray(totals).max()) + 31) // 32 + 1
    t_fetch = timed(lambda: fetch(words[:, :cap]), "fetch packed words")

    # --- full e2e ---------------------------------------------------------
    if not args.skip_e2e:
        blob = raw
        t0 = time.time()
        arch = sharded.sharded_gzip_compress(blob, args.level)
        print(f"{'e2e sharded_gzip_compress (warm?)':<44} "
              f"{(time.time()-t0)*1e3:8.1f} ms", flush=True)
        t_e2e = timed(lambda: sharded.sharded_gzip_compress(blob, args.level),
                      "e2e sharded_gzip_compress", reps=1)
    else:
        t_e2e = 0.0

    print("\n--- waterfall (ms/MB) ---")
    for k, v in [("upload", t_up), ("analyze", t_an),
                 ("roundB+hist fetch", t_fin), ("host plan", t_host),
                 ("pack (with splits)", t_pack),
                 ("pack (no splits)", t_pack0),
                 ("pipeline as-run (tunnel)", t_pipe),
                 ("fetch words", t_fetch), ("dispatch floor", t_disp),
                 ("e2e", t_e2e)]:
        print(f"{k:<22} {v/mb*1e3:8.1f}")


if __name__ == "__main__":
    main()
