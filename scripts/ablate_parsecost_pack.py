"""Piecewise chip attribution of round B (lz77_parse_cost) and the
pack jit — the two stages whose totals exceed their known gather/scan
budgets after the round-5 kernels.

Times each sub-graph as its own jit on staged device arrays (median of
3, one scalar fetched; ~25 ms dispatch floor rides every row — the
DELTAS between rows are the signal).

    PYTHONPATH=/root/repo:/root/.axon_site python \
        scripts/ablate_parsecost_pack.py
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
    from decompress_tpu.ops import bitpack, cost_pl, hist_pl, lz77, pack_pl
    from decompress_tpu.parallel import sharded

    seg = de.SEGMENT_SIZE
    b = de.MAX_DEVICE_BATCH
    corpus = pathlib.Path(__file__).parent.parent / "tests" / "corpus"
    raw = b"".join(p.read_bytes() for p in sorted(corpus.iterdir()))
    raw = (raw * 2)[: b * seg]
    mb = b * seg / 1e6
    d = jnp.asarray(np.frombuffer(raw, np.uint8).reshape(b, seg))
    nv = jnp.asarray(np.full(b, seg, np.int32))
    hl = jnp.asarray(np.zeros(b, np.int32))
    sel = lz77.mark_sel_for(d)

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

    res = lz77.lz77_analyze(d, nv, hl, level=6, seg_len=seg, hist=0,
                            mark_sel=sel)
    lc_np, dc_np = lz77._cost_tables_host(
        np.asarray(res["hist_lit"]), np.asarray(res["hist_dist"]))
    lc, dc = jnp.asarray(lc_np), jnp.asarray(dc_np)
    cl = jax.device_put(res["cand_length"])
    cd = jax.device_put(res["cand_dist"])
    onp = jax.device_put(res["on_path"])
    ism = jax.device_put(res["is_match"])
    mlen = jax.device_put(res["length"])
    mdist = jax.device_put(res["dist"])

    p = 1
    while p < seg:
        p *= 2
    levels = p.bit_length() - 1

    # ---- round-B pieces ----------------------------------------------
    @jax.jit
    def jit_gain(dd, cl_, cd_, nv_, lc_, dc_):
        pay = jnp.arange(seg, dtype=jnp.int32)[None, :]
        length = jnp.where(pay < nv_[:, None], cl_, 0)
        length = jnp.where(cd_ <= 32768, length, 0)
        lit = dd.astype(jnp.int32)
        litbits = cost_pl.litbits_pl(lit, lc_.astype(jnp.int32))
        slab = cost_pl._pref_slab(litbits)
        ln, dst, gain = cost_pl.gain_pl(length, cd_, None, None, slab,
                                        lc_.astype(jnp.int32),
                                        dc_.astype(jnp.int32))
        nxt = jnp.concatenate(
            [gain[:, 1:], jnp.full((b, 1), cost_pl.NEG_GAIN, jnp.int32)],
            axis=1)
        defer = nxt - litbits > gain
        take = (ln >= 3) & (gain > 0) & ~defer
        return (jnp.sum(take) + jnp.sum(ln) + jnp.sum(dst))

    timed(lambda: int(jit_gain(d, cl, cd, nv, lc, dc)),
          "B: gain path only (litbits+slab+gain+defer)")

    take = (mlen >= 3)  # stand-in take/len arrays with realistic density

    @jax.jit
    def jit_mark(t_, l_):
        on = lz77._mark_batched(t_, l_, seg, p, levels, sel)
        return jnp.sum(on)

    timed(lambda: int(jit_mark(ism, mlen)), "B: mark only")

    @jax.jit
    def jit_summarize(dd, nv_, t_, l_, dst_, onf):
        out = lz77._summarize_batch(dd, nv_, t_, l_, dst_, onf, seg, 0, sel)
        return (jnp.sum(out["hist_lit"]) + jnp.sum(out["is_match"])
                + jnp.sum(out["exact"]))

    onf = jax.jit(
        lambda t_, l_: lz77._mark_batched(t_, l_, seg, p, levels, sel)
    )(ism, mlen)
    onf = jax.device_put(onf)
    timed(lambda: int(jit_summarize(d, nv, ism, mlen, mdist, onf)),
          "B: summarize only (verify + hist kernel)")

    @jax.jit
    def jit_verify_only(dd, nv_, t_, l_, dst_, onf_):
        def one(seg_, opf, take_r, plen_r, dist_r, n):
            pay_idx = jnp.arange(seg, dtype=jnp.int32)
            on_path = opf[:seg] & (pay_idx < n)
            is_match = on_path & take_r
            ml = jnp.where(is_match, plen_r, 0)
            md = jnp.where(is_match, dist_r, 0)
            return lz77._verify_matches(seg_, on_path, is_match, ml, md,
                                        seg, n, hist=0)

        return jnp.sum(jax.vmap(one)(dd, onf_, t_, l_, dst_, nv_))

    timed(lambda: int(jit_verify_only(d, nv, ism, mlen, mdist, onf)),
          "B: verify only")

    # ---- pack pieces --------------------------------------------------
    hist_lit = np.asarray(res["hist_lit"])
    hist_dist = np.asarray(res["hist_dist"])
    finals = np.ones(b, bool)
    hdr, tabs, kinds = de.plan_blocks(hist_lit, hist_dist,
                                      np.full(b, seg, np.int32), finals,
                                      pad_to=b)
    out_words = (9 * seg) // 32 + 2 * de._HDR_PAD
    hv, hb = jnp.asarray(hdr[0]), jnp.asarray(hdr[1])
    lcod, lbit, dcod, dbit, ev, eb = (jnp.asarray(t) for t in tabs)

    @jax.jit
    def jit_slots(onp_, ism_, l_, dst_, dd):
        lit_cb = (lcod.astype(jnp.int32) << 4) | lbit
        dist_cb = (dcod.astype(jnp.int32) << 4) | dbit
        v01, n01, v23, n23 = pack_pl.build_slots_pl(
            onp_, ism_, l_, dst_, dd, lit_cb, dist_cb)
        return jnp.sum(n01) + jnp.sum(n23) + jnp.sum(v01) + jnp.sum(v23)

    timed(lambda: int(jit_slots(onp, ism, mlen, mdist, d)),
          "pack: slot kernel only")

    lit_cb = (lcod.astype(jnp.int32) << 4) | lbit
    dist_cb = (dcod.astype(jnp.int32) << 4) | dbit
    v01, n01, v23, n23 = jax.jit(pack_pl.build_slots_pl)(
        onp, ism, mlen, mdist, d, lit_cb, dist_cb)
    v01, n01, v23, n23 = (jax.device_put(x) for x in (v01, n01, v23, n23))

    @jax.jit
    def jit_planes(v0, n0, v1, n1):
        w, tot, off0, pb = bitpack.pack_slot_planes(
            v0.astype(jnp.uint32), n0, v1.astype(jnp.uint32), n1,
            hv.astype(jnp.uint32), hb, ev.astype(jnp.uint32), eb, out_words)
        return jnp.sum(tot) + jnp.sum(w[:, ::512].astype(jnp.uint32))

    timed(lambda: int(jit_planes(v01, n01, v23, n23)),
          "pack: plane words only")

    @jax.jit
    def jit_cumsums(n0, n1):
        pb = n0 + n1
        base = jnp.cumsum(pb, axis=1)
        return jnp.sum(base[:, -1])

    timed(lambda: int(jit_cumsums(n01, n23)), "pack: one cumsum pair")

    # plane words WITHOUT the scatter-min (gathers replaced by slices)
    @jax.jit
    def jit_planes_noscat(v0, n0, v1, n1):
        def one(v0_, n0_, v1_, n1_):
            pbits = n0_ + n1_
            base = jnp.cumsum(pbits) - pbits
            lo0 = (v0_.astype(jnp.uint32)
                   << (base & 31).astype(jnp.uint32))
            el = jnp.cumsum(lo0)
            return el[-1]

        return jnp.sum(jax.vmap(one)(v0, n0, v1, n1))

    timed(lambda: int(jit_planes_noscat(v01, n01, v23, n23)),
          "pack: cumsum+shift only (no scatter/gather)")


if __name__ == "__main__":
    main()
