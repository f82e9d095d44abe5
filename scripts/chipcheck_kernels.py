"""Chip equivalence check of the round-5 Mosaic kernels at PRODUCTION
shapes — the committable artifact the round-4 verdict asked for
(item 6): every claim of "bit-identical on chip" should be auditable
from a committed log, not prose.

Runs, on the real device, each Pallas kernel against its XLA reference
on the production segment geometry (B=MAX_DEVICE_BATCH segments of
SEGMENT_SIZE) with corpus-derived data, and prints PASS/FAIL per
kernel plus timings:

  - cost_pl.litbits_pl / _pref_slab / gain_pl  vs the XLA gather form
  - hist_pl.histograms_pl                      vs the scatter form
  - pack_pl.build_slots_pl                     vs the XLA slot code
  - parse_pl.mark_path_pl                      vs _mark_path_hybrid
  - full lz77_parse_cost cost_sel=pl vs xla    (end-to-end round B)

    PYTHONPATH=/root/repo:/root/.axon_site python \
        scripts/chipcheck_kernels.py | tee CHIPCHECK_r05.log
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from decompress_tpu import de
    from decompress_tpu.ops import codes, cost_pl, hist_pl, lz77, pack_pl
    from decompress_tpu.ops import parse_pl

    seg = de.SEGMENT_SIZE
    b = de.MAX_DEVICE_BATCH
    corpus = pathlib.Path(__file__).parent.parent / "tests" / "corpus"
    raw = b"".join(p.read_bytes() for p in sorted(corpus.iterdir()))
    raw = (raw * 2)[: b * seg]
    d = jnp.asarray(np.frombuffer(raw, np.uint8).reshape(b, seg))
    nv = jnp.asarray(np.full(b, seg, np.int32))
    hl0 = jnp.asarray(np.zeros(b, np.int32))
    print(f"# device={jax.devices()} B={b} seg={seg}", flush=True)

    fails = 0

    def check(name, got, want):
        nonlocal fails
        ok = np.array_equal(np.asarray(got), np.asarray(want))
        print(f"{name:<46} {'PASS' if ok else 'FAIL'}", flush=True)
        if not ok:
            fails += 1

    res = lz77.lz77_analyze(d, nv, hl0, level=6, seg_len=seg, hist=0,
                            mark_sel=lz77.mark_sel_for(d))
    lc_np, dc_np = lz77._cost_tables_host(
        np.asarray(res["hist_lit"]), np.asarray(res["hist_dist"]))
    lc, dc = jnp.asarray(lc_np), jnp.asarray(dc_np)
    lci = lc.astype(jnp.int32)
    dci = dc.astype(jnp.int32)

    # --- litbits ------------------------------------------------------
    lit = d.astype(jnp.int32)
    t0 = time.time()
    lb = cost_pl.litbits_pl(lit, lci)
    lb_np = np.asarray(lb)
    print(f"# litbits_pl compile+run {time.time()-t0:.1f}s", flush=True)
    check("litbits_pl == lcost[lit]",
          lb_np, np.take_along_axis(lc_np.astype(np.int32),
                                    np.asarray(lit), axis=1))

    # --- gain ---------------------------------------------------------
    slab = cost_pl._pref_slab(lb)
    mlen = res["cand_length"]
    mdist = res["cand_dist"]
    t0 = time.time()
    gl, gd, gg = cost_pl.gain_pl(mlen, mdist, None, None, slab, lci, dci)
    gg_np = np.asarray(gg)
    print(f"# gain_pl compile+run {time.time()-t0:.1f}s", flush=True)
    # XLA reference for the gain
    pref = np.concatenate(
        [np.zeros((b, 1), np.int64),
         np.cumsum(lb_np.astype(np.int64), axis=1)], axis=1)
    ln_np = np.asarray(mlen)
    dst_np = np.asarray(mdist)
    lsym, lex, _ = (np.asarray(x) for x in codes.length_code_parts(mlen))
    dsym, dex, _ = (np.asarray(x) for x in codes.dist_code_parts(mdist))
    cost = (np.take_along_axis(lc_np.astype(np.int64),
                               np.clip(257 + lsym, 0, 285), axis=1)
            + lex
            + np.take_along_axis(dc_np.astype(np.int64),
                                 np.clip(dsym, 0, 29), axis=1) + dex)
    pos = np.arange(seg)[None, :]
    span = (np.take_along_axis(pref, np.minimum(pos + ln_np, seg), axis=1)
            - np.take_along_axis(pref, pos, axis=1))
    ref_gain = np.where(ln_np >= 3, span - cost, cost_pl.NEG_GAIN)
    check("gain_pl == exact bit gains", gg_np, ref_gain)
    check("gain_pl passthrough len/dist",
          np.stack([np.asarray(gl), np.asarray(gd)]),
          np.stack([ln_np, dst_np]))

    # --- hist ---------------------------------------------------------
    t0 = time.time()
    hlz, hdz = hist_pl.histograms_pl(res["on_path"], res["is_match"],
                                     res["length"], res["dist"], lit)
    hlz_np = np.asarray(hlz)
    print(f"# histograms_pl compile+run {time.time()-t0:.1f}s", flush=True)
    check("histograms_pl == analyze hists (lit)",
          hlz_np, np.asarray(res["hist_lit"]))
    check("histograms_pl == analyze hists (dist)",
          np.asarray(hdz), np.asarray(res["hist_dist"]))

    # --- pack slots ---------------------------------------------------
    hist_lit = np.asarray(res["hist_lit"])
    hist_dist = np.asarray(res["hist_dist"])
    hdr, tabs, kinds = de.plan_blocks(hist_lit, hist_dist,
                                      np.full(b, seg, np.int32),
                                      np.ones(b, bool), pad_to=b)
    lcod, lbit, dcod, dbit, ev, eb = (jnp.asarray(t) for t in tabs)
    lit_cb = (lcod.astype(jnp.int32) << 4) | lbit
    dist_cb = (dcod.astype(jnp.int32) << 4) | dbit
    t0 = time.time()
    v01, n01, v23, n23 = pack_pl.build_slots_pl(
        res["on_path"], res["is_match"], res["length"], res["dist"],
        d, lit_cb, dist_cb)
    v01_np = np.asarray(v01)
    print(f"# build_slots_pl compile+run {time.time()-t0:.1f}s", flush=True)
    # XLA reference slots
    lcode, lex2, lval = (np.asarray(x) for x in
                         codes.length_code_parts(res["length"]))
    sym = np.where(np.asarray(res["is_match"]), 257 + lcode,
                   np.asarray(d).astype(np.int32))
    dsym2, dex2, dval = (np.asarray(x) for x in
                         codes.dist_code_parts(res["dist"]))
    cb0 = np.take_along_axis(np.asarray(lit_cb), sym, axis=1)
    n0 = np.where(np.asarray(res["on_path"]), cb0 & 15, 0)
    rv01 = (cb0 >> 4) | (lval << n0)
    rn01 = n0 + np.where(np.asarray(res["is_match"]), lex2, 0)
    cb2 = np.take_along_axis(np.asarray(dist_cb),
                             np.clip(dsym2, 0, 29), axis=1)
    n2 = np.where(np.asarray(res["is_match"]), cb2 & 15, 0)
    rv23 = (cb2 >> 4) | (dval << n2)
    rn23 = n2 + np.where(np.asarray(res["is_match"]), dex2, 0)
    check("build_slots_pl v01/n01", np.stack([v01_np, np.asarray(n01)]),
          np.stack([rv01, rn01]))
    check("build_slots_pl v23/n23",
          np.stack([np.asarray(v23), np.asarray(n23)]),
          np.stack([rv23, rn23]))

    # --- mark path ----------------------------------------------------
    take = res["is_match"]
    plen = res["length"]
    p = 1
    while p < seg:
        p *= 2
    levels = p.bit_length() - 1
    on_pl = jax.jit(
        lambda t_, l_: lz77._mark_batched(t_, l_, seg, p, levels, "pl"))(
            take, plen)
    on_x = jax.jit(
        lambda t_, l_: lz77._mark_batched(t_, l_, seg, p, levels, "xla"))(
            take, plen)
    check("mark_path_pl == hybrid", on_pl, on_x)

    # --- end-to-end round B -------------------------------------------
    outs = {}
    for csel in ("xla", "pl"):
        r2 = lz77.lz77_parse_cost(
            d, res["cand_length"], res["cand_dist"], nv, lc, dc, hl0, None,
            seg_len=seg, hist=0, mark_sel=lz77.mark_sel_for(d),
            cost_sel=csel)
        outs[csel] = {k: np.asarray(v) for k, v in r2.items()}
    for k in ("on_path", "is_match", "length", "dist", "hist_lit",
              "hist_dist", "exact"):
        check(f"parse_cost pl == xla [{k}]", outs["pl"][k], outs["xla"][k])

    # --- tail batch (B=1 < R_BLOCK): Mosaic shape-legality ------------
    # The e2e driver pads trailing batches to pow2 sizes below
    # MAX_DEVICE_BATCH; the per-segment tables then have fewer rows
    # than the (R_BLOCK, 128) tile and must pad (cost_pl._pad_table_rows)
    # for the in-kernel segment-row gather to lower.  Round-5 bench e2e
    # found this; prove the fix on chip.
    d1, nv1, hl1 = d[:1], nv[:1], hl0[:1]
    res1 = lz77.lz77_analyze(d1, nv1, hl1, level=6, seg_len=seg, hist=0,
                             mark_sel=lz77.mark_sel_for(d1))
    lc1_np, dc1_np = lz77._cost_tables_host(
        np.asarray(res1["hist_lit"]), np.asarray(res1["hist_dist"]))
    t0 = time.time()
    lb1 = cost_pl.litbits_pl(d1.astype(jnp.int32),
                             jnp.asarray(lc1_np).astype(jnp.int32))
    lb1_np = np.asarray(lb1)
    print(f"# litbits_pl B=1 compile+run {time.time()-t0:.1f}s", flush=True)
    check("litbits_pl B=1 tail batch", lb1_np,
          np.take_along_axis(lc1_np.astype(np.int32),
                             np.asarray(d1).astype(np.int32), axis=1))
    outs1 = {}
    for csel in ("xla", "pl"):
        r21 = lz77.lz77_parse_cost(
            d1, res1["cand_length"], res1["cand_dist"], nv1,
            jnp.asarray(lc1_np), jnp.asarray(dc1_np), hl1, None,
            seg_len=seg, hist=0, mark_sel=lz77.mark_sel_for(d1),
            cost_sel=csel)
        outs1[csel] = {k: np.asarray(v) for k, v in r21.items()}
    for k in ("on_path", "is_match", "length", "dist"):
        check(f"parse_cost B=1 pl == xla [{k}]",
              outs1["pl"][k], outs1["xla"][k])
    hdr1, tabs1, _k1 = de.plan_blocks(
        np.asarray(res1["hist_lit"]), np.asarray(res1["hist_dist"]),
        np.full(1, seg, np.int32), np.ones(1, bool), pad_to=1)
    lcod1, lbit1, dcod1, dbit1, _ev1, _eb1 = (jnp.asarray(t) for t in tabs1)
    v011, n011, v231, n231 = pack_pl.build_slots_pl(
        res1["on_path"], res1["is_match"], res1["length"], res1["dist"],
        d1, (lcod1.astype(jnp.int32) << 4) | lbit1,
        (dcod1.astype(jnp.int32) << 4) | dbit1)
    lcode1, lex1, lval1 = (np.asarray(x) for x in
                           codes.length_code_parts(res1["length"]))
    sym1 = np.where(np.asarray(res1["is_match"]), 257 + lcode1,
                    np.asarray(d1).astype(np.int32))
    lit_cb1 = np.asarray((lcod1.astype(jnp.int32) << 4) | lbit1)
    cb01 = np.take_along_axis(lit_cb1, sym1, axis=1)
    n01r = np.where(np.asarray(res1["on_path"]), cb01 & 15, 0)
    check("build_slots_pl B=1 v01/n01",
          np.stack([np.asarray(v011), np.asarray(n011)]),
          np.stack([(cb01 >> 4) | (lval1 << n01r),
                    n01r + np.where(np.asarray(res1["is_match"]),
                                    lex1, 0)]))

    print(f"# RESULT: {'ALL PASS' if fails == 0 else f'{fails} FAILURES'}",
          flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
