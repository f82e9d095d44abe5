"""Kernel-resident device-inflate measurement (tunnel excluded).

Stages an archive's decode inputs once, then times build_fused_tables
and decode_symbols on chip, fetching only tiny outputs (the `ok`
vector) so the host link is out of the loop.  block_until_ready is a
no-op through the axon tunnel — timing is by scalar fetch.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_inflate.py [MB]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from decompress_tpu import gz
from decompress_tpu.ops import inflate as iops
from decompress_tpu.parallel import sharded
from decompress_tpu.parallel.sharded import _ceil_pow2_int


def stage(buf: np.ndarray):
    """Decode-input staging.  Returns (mw, lit_lens, dist_lens,
    start_bits, stops, row_members, max_cmds, nrows, tb): for legacy TS
    archives `stops` are per-row COMMAND counts (0 = to EOB); for
    compact TB archives (tb is not None) they are the next row's START
    BIT (bit-stop mode, 0 = to EOB)."""
    sizes, splits, tb = sharded._read_index_ex(buf)
    members = []
    off = 0
    for s in sizes:
        members.append(buf[off : off + s])
        off += s
    metas = []
    for mem in members:
        body_off = gz._header_end(mem)
        body = mem[body_off:-8]
        isize = int.from_bytes(mem[-4:].tobytes(), "little")
        metas.append((iops.prepare_member(body), body, isize))

    huff = [i for i, (p, *_r) in enumerate(metas) if p[0] == "huff"]
    m = len(huff)
    out_len = _ceil_pow2_int(max(metas[i][2] for i in huff))
    wmax = _ceil_pow2_int(max(metas[i][1].size for i in huff) // 4 + 4)
    stride_cap = 0
    if tb is not None:
        stride_cap = max((tb["max_cmds"][i] for i in huff), default=0)
    elif splits:
        for i in huff:
            tri = [t for t in splits[i] if t[0] > 0]
            prev = 0
            for t in tri:
                stride_cap = max(stride_cap, t[1] - prev)
                prev = t[1]
    rows, row_caps = [], []
    for i in huff:
        (_, ll, dl, start), body, isize = metas[i]
        tri = [t for t in splits[i] if t[0] > 0] if splits else []
        bits = [start] + [t[0] for t in tri]
        cmdb = [0] + [t[1] for t in tri]
        outb = [0] + [t[2] for t in tri]
        for j in range(len(bits)):
            if j + 1 < len(bits):
                stop = bits[j + 1] if tb is not None \
                    else cmdb[j + 1] - cmdb[j]
                cap = (tb["max_cmds"][i] or stride_cap or isize + 2) \
                    if tb is not None else stop
            else:
                stop = 0
                cap = isize - outb[-1] + 2
                if stride_cap:
                    cap = min(cap, stride_cap + 4)
            rows.append((i, bits[j], stop))
            row_caps.append(cap)
    nrows = len(rows)
    b_pad = _ceil_pow2_int(nrows)
    max_cmds = _ceil_pow2_int(max(iops.worst_case_slots(c) for c in row_caps) + 4)
    midx = {i: r for r, i in enumerate(huff)}
    mw = np.zeros((m + 1, wmax), np.uint32)
    lit_lens = np.zeros((m + 1, 288), np.int32)
    dist_lens = np.zeros((m + 1, 32), np.int32)
    for i in huff:
        (_, ll, dl, _), body, _ = metas[i]
        bw = np.zeros(wmax * 4, np.uint8)
        bw[: body.size] = body
        mw[midx[i]] = bw.view("<u4")
        lit_lens[midx[i]] = ll
        dist_lens[midx[i]] = dl
    start_bits = np.zeros(b_pad, np.int32)
    stop_counts = np.zeros(b_pad, np.int32)
    row_members = np.full(b_pad, m, np.int32)
    for row, (i, bit, stop) in enumerate(rows):
        start_bits[row] = bit
        stop_counts[row] = stop
        row_members[row] = midx[i]
    return (mw, lit_lens, dist_lens, start_bits, stop_counts, row_members,
            max_cmds, nrows, tb)


def main():
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    corpus = pathlib.Path(__file__).parent.parent / "tests" / "corpus"
    base = b"".join(p.read_bytes() for p in sorted(corpus.iterdir()))
    reps = max(1, -(-(size_mb << 20) // len(base)))
    data = (base * reps)[: size_mb << 20]
    print(f"devices: {jax.devices()}", file=sys.stderr)

    t0 = time.time()
    arch = sharded.sharded_gzip_compress(data, 6)
    print(f"compress: {time.time()-t0:.1f}s, {len(arch)} bytes", file=sys.stderr)

    buf = np.frombuffer(arch, np.uint8)
    (mw, ll, dl, sb, sc, rm, max_cmds, nrows, tb) = stage(buf)
    print(f"rows={nrows} max_cmds={max_cmds} members={mw.shape[0]-1} "
          f"wmax={mw.shape[1]}", file=sys.stderr)

    d_mw = jnp.asarray(mw)
    d_ll = jnp.asarray(ll)
    d_dl = jnp.asarray(dl)
    d_sb = jnp.asarray(sb)
    d_sc = jnp.asarray(sc)
    d_rm = jnp.asarray(rm)
    int(jnp.sum(d_mw))  # force uploads

    # table build
    for it in range(3):
        t0 = time.time()
        lt, dt_ = iops.build_fused_tables(d_ll, d_dl)
        s = int(jnp.sum(lt[:, 0])) + int(jnp.sum(dt_[:, 0]))
        print(f"build_fused_tables[{it}]: {time.time()-t0:.3f}s", file=sys.stderr)

    # decode kernel: fetch only `ok`
    for it in range(4):
        t0 = time.time()
        kinds, values, dists, ok = iops.decode_symbols(
            d_mw, d_sb, lt, dt_, max_cmds=max_cmds,
            stop_counts=d_sc, row_members=d_rm)
        okv = np.asarray(ok)
        el = time.time() - t0
        mbs = size_mb / el
        print(f"decode_symbols[{it}]: {el:.3f}s = {mbs:.1f} MB/s "
              f"({el/size_mb*1e3:.0f} ms/MB) ok={int(okv[:nrows].sum())}/{nrows}",
              file=sys.stderr)

    # end to end (includes tunnel)
    for it in range(2):
        t0 = time.time()
        out = sharded.sharded_gzip_decompress(buf)
        el = time.time() - t0
        assert out == data
        print(f"sharded_gzip_decompress e2e[{it}]: {el:.2f}s = "
              f"{size_mb/el:.1f} MB/s", file=sys.stderr)


if __name__ == "__main__":
    main()
