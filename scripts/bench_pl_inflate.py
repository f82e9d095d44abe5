"""Chip bench: Pallas decode kernel vs the XLA decode_symbols kernel.

Builds (once, on CPU; cached in /tmp) a sharded gzip archive with
bit-dense split points (stride 256 commands -> ~114 splits per 128 KiB
member, so each member nearly fills one 128-lane kernel row), then
times both kernels kernel-resident on the chip and cross-checks their
command streams.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pl_inflate.py \
      [MB] [--stride N] [--window W] [--level L] [--interpret]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def make_archive(size_mb: int, stride: int, level: int,
                 split_bits: int = 0) -> bytes:
    cache = pathlib.Path(
        f"/tmp/pl_arch_{size_mb}mb_s{stride}_b{split_bits}_l{level}.gz")
    if cache.exists():
        return cache.read_bytes()
    # compress in a CPU-forced subprocess so this process's jax stays
    # on the chip
    import os
    import subprocess

    prog = f"""
import pathlib, sys, time
sys.path.insert(0, {str(pathlib.Path(__file__).parent.parent)!r})
corpus = pathlib.Path({str(pathlib.Path(__file__).parent.parent)!r}) / "tests" / "corpus"
base = b"".join(p.read_bytes() for p in sorted(corpus.iterdir()))
reps = max(1, -(-({size_mb} << 20) // len(base)))
data = (base * reps)[: {size_mb} << 20]
from decompress_tpu.parallel import sharded
sharded.SPLIT_STRIDE = {stride}
sharded.SPLIT_BITS = {split_bits}
sharded.N_SPLITS = 250
t0 = time.time()
arch = sharded.sharded_gzip_compress(data, {level})
print(f"compress (cpu): {{time.time()-t0:.1f}}s, {{len(arch)}} bytes",
      file=sys.stderr)
pathlib.Path({str(cache)!r}).write_bytes(arch)
"""
    env = dict(os.environ, DECOMPRESS_TPU_PLATFORM="cpu")
    subprocess.run([sys.executable, "-c", prog], check=True, env=env)
    return cache.read_bytes()


def spans_for(buf, mw, sb, rm, nrows):
    """Per-lane bit spans (next split start or member body end)."""
    from decompress_tpu import gz as _gz
    from decompress_tpu.ops import inflate as iops
    from decompress_tpu.parallel import sharded

    sizes, _, _ = sharded._read_index_ex(buf)
    body_bits = {}
    off = 0
    hidx = 0
    for s in sizes:
        mem = buf[off:off + s]
        off += s
        body = mem[_gz._header_end(mem):-8]
        try:
            kind = iops.prepare_member(body)[0]
        except iops.NotParallelizable:
            kind = "skip"
        if kind == "huff":
            body_bits[hidx] = body.size * 8
            hidx += 1
    spans = np.zeros(sb.shape[0], np.int64)
    for r in range(nrows):
        nxt = sb[r + 1] if (r + 1 < nrows and rm[r + 1] == rm[r]) else None
        spans[r] = (nxt if nxt is not None else body_bits[int(rm[r])]) - sb[r]
    return spans


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mb", nargs="?", type=int, default=8)
    ap.add_argument("--stride", type=int, default=256)
    ap.add_argument("--split-bits", type=int, default=4096)
    ap.add_argument("--window", type=int, default=32)
    ap.add_argument("--level", type=int, default=6)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    arch = make_archive(args.mb, args.stride, args.level,
                        split_bits=args.split_bits)
    import jax
    import jax.numpy as jnp

    from decompress_tpu import de
    from decompress_tpu.ops import inflate as iops
    from decompress_tpu.ops import inflate_pl as ipl
    from ablate_inflate import stage

    print(f"devices: {jax.devices()}", file=sys.stderr)
    buf = de._np_u8(arch)
    mw, ll, dl, sb, sc, rm, max_cmds, nrows, tb = stage(buf)
    spans = spans_for(buf, mw, sb, rm, nrows)
    out_bytes = args.mb << 20
    print(f"rows={nrows} members={mw.shape[0]-1} wmax={mw.shape[1]} "
          f"max_cmds={max_cmds}", file=sys.stderr)

    if tb is not None:
        stride_cap = int(max(tb["max_cmds"]))
        stop_bits = sc[:nrows].astype(np.int64)  # already stop BITS
    else:
        stride_cap = int(max(
            (sc[r] for r in range(nrows) if sc[r] > 0), default=max_cmds))
        stop_bits = np.where(sc[:nrows] > 0,
                             sb[:nrows].astype(np.int64) + spans[:nrows], 0)
    max_real = stride_cap + 4

    # ---- Pallas kernel --------------------------------------------------
    t0 = time.time()
    kinds_p, values_p, dists_p, ok_p = ipl.decode_symbols_pl(
        mw, sb[:nrows], stop_bits, rm[:nrows], ll, dl, spans[:nrows],
        max_real=max_real, window=args.window, interpret=args.interpret)
    print(f"pl cold end-to-end: {time.time()-t0:.2f}s ok={ok_p.all()}",
          file=sys.stderr)
    if not ok_p.all():
        bad = np.nonzero(~ok_p)[0][:8]
        print(f"  NOT-OK rows: {bad}", file=sys.stderr)

    # kernel-resident timing: staged device arrays, fetch only ok
    t0 = time.time()
    st = ipl.stage_pl(mw, sb[:nrows], stop_bits, rm[:nrows], ll, dl,
                      spans[:nrows], max_real=max_real, window=args.window)
    int(np.asarray(st["slab"]).flat[0])  # force staging
    print(f"stage (tables+slab, cold): {time.time()-t0:.2f}s  "
          f"wl={st['wl']} rtot={st['rtot']} max_slots={st['max_slots']}",
          file=sys.stderr)
    for it in range(2):
        t0 = time.time()
        st = ipl.stage_pl(mw, sb[:nrows], stop_bits, rm[:nrows], ll, dl,
                          spans[:nrows], max_real=max_real,
                          window=args.window)
        import jax.numpy as _j
        int(_j.sum(st["slab"][0, 0]))
        print(f"stage warm[{it}]: {(time.time()-t0)*1e3:7.1f} ms",
              file=sys.stderr)
    import jax.numpy as _j

    for it in range(4):
        t0 = time.time()
        slots, okm = ipl.run_pl(st, interpret=args.interpret)
        nok = int(_j.sum(okm))
        dt = time.time() - t0
        print(f"pl kernel[{it}]: {dt*1e3:7.1f} ms  "
              f"{out_bytes/dt/1e6:7.1f} MB/s kernel-resident  nok={nok}",
              file=sys.stderr)
    # amortized: pipeline 8 dispatches, fetch once (dispatch floor /8)
    reps = 8
    t0 = time.time()
    sums = [ipl.run_pl(st, interpret=args.interpret)[1] for _ in range(reps)]
    nok = int(_j.sum(sums[-1])) + sum(int(_j.sum(s)) for s in sums[:-1])
    dt = (time.time() - t0) / reps
    print(f"pl kernel amortized(x{reps}): {dt*1e3:7.1f} ms  "
          f"{out_bytes/dt/1e6:7.1f} MB/s kernel-resident", file=sys.stderr)

    # ---- XLA kernel ------------------------------------------------------
    if not args.skip_xla:
        lt, dt_ = iops.build_fused_tables(jnp.asarray(ll), jnp.asarray(dl))
        d_mw, d_sb = jnp.asarray(mw), jnp.asarray(sb)
        d_sc, d_rm = jnp.asarray(sc), jnp.asarray(rm)
        for it in range(3):
            t0 = time.time()
            kinds_x, values_x, dists_x, ok_x = iops.decode_symbols(
                d_mw, d_sb, lt, dt_, max_cmds=max_cmds,
                stop_counts=d_sc if tb is None else None,
                stop_bits=d_sc if tb is not None else None,
                row_members=d_rm)
            n = int(jnp.sum(ok_x[:nrows]))
            dtm = time.time() - t0
            print(f"xla decode[{it}]: {dtm*1e3:7.1f} ms  "
                  f"{out_bytes/dtm/1e6:7.1f} MB/s  ok={n}/{nrows}",
                  file=sys.stderr)
        # agreement (NOP-stripped command streams)
        kx, vx, dx = (np.asarray(a) for a in (kinds_x, values_x, dists_x))

        def norm(k, v, d, r):
            outc = []
            for kk, vv, dd in zip(k[r], v[r], d[r]):
                if kk == 3:
                    continue
                if kk == 2:
                    if sc[r] == 0:
                        outc.append((2, 0, 0))
                    break
                outc.append((int(kk), int(vv), int(dd)))
                if tb is None and sc[r] > 0 and len(outc) >= sc[r]:
                    break
            return outc

        mismatch = 0
        for r in range(nrows):
            if norm(kx, vx, dx, r) != norm(kinds_p, values_p, dists_p, r):
                mismatch += 1
                if mismatch <= 3:
                    print(f"  MISMATCH row {r}", file=sys.stderr)
        print(f"agreement: {nrows - mismatch}/{nrows} rows", file=sys.stderr)


if __name__ == "__main__":
    main()
