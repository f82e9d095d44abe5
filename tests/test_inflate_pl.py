"""Pallas inflate building blocks: root+subtable equivalence, and (as
they land) kernel-vs-XLA decode agreement.  Runs on CPU (conftest);
the Pallas kernel itself is exercised in interpret mode here and on
the chip by scripts/bench_pl_inflate.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from decompress_tpu.core import huffman, tables
from decompress_tpu.ops import inflate as inflate_ops
from decompress_tpu.ops import inflate_pl


def _resolve_two_level(root, sub, idx15):
    """Host reference: resolve a forward 15-bit code index through the
    root+sub tables; returns (cls, nb, xtr, pay)."""
    e = root[idx15 >> inflate_pl.SUB_BITS]
    if (e >> 24) & 7 == inflate_pl.CLS_SUB:
        e = sub[(e & 0xFFFF) + (idx15 & (inflate_pl.SUB_SLOTS - 1))]
    return ((e >> 24) & 7, (e >> 20) & 15, (e >> 16) & 15, e & 0xFFFF)


def _random_lens(rng, nsym, maxlen=15):
    """Valid canonical code lengths via the production tree builder."""
    freqs = rng.integers(0, 1000, nsym).astype(np.int64)
    freqs[rng.integers(0, nsym)] += 10000  # skew for length spread
    lens = huffman.code_lengths_from_frequencies(
        np.asarray(freqs), max_length=maxlen)
    return np.asarray(lens, np.int32)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_root_sub_matches_fused_lit(seed):
    rng = np.random.default_rng(seed)
    ll = np.zeros(288, np.int32)
    ll[:286] = _random_lens(rng, 286)
    dl = np.zeros(32, np.int32)
    dl[:30] = _random_lens(rng, 30)
    lit_tab, dist_tab = inflate_ops.build_fused_tables(
        jnp.asarray(ll)[None], jnp.asarray(dl)[None])
    lr, ls, dr, ds, ok = inflate_pl.build_row_tables(
        jnp.asarray(ll)[None], jnp.asarray(dl)[None])
    assert bool(np.asarray(ok)[0])
    lit_tab = np.asarray(lit_tab)[0]
    dist_tab = np.asarray(dist_tab)[0]
    lr, ls, dr, ds = (np.asarray(a)[0] for a in (lr, ls, dr, ds))

    idx = np.arange(32768)
    # vectorized two-level resolve (lit)
    e = lr[idx >> inflate_pl.SUB_BITS]
    is_sub = ((e >> 24) & 7) == inflate_pl.CLS_SUB
    se = ls[np.minimum((e & 0xFFFF) + (idx & 31), ls.size - 1)]
    e = np.where(is_sub, se, e)
    cls, nb, xtr, pay = (e >> 24) & 7, (e >> 20) & 15, (e >> 16) & 15, e & 0xFFFF
    # fused-table fields
    fk, fnb = lit_tab >> 15, (lit_tab >> 11) & 15
    fx, fp = (lit_tab >> 8) & 7, lit_tab & 0xFF
    # class map: fused kind 0/1/2/3 = invalid/lit/len/eob
    assert np.array_equal(cls == 0, fk == 0)
    m = fk != 0
    assert np.array_equal(cls[m], fk[m])
    assert np.array_equal(nb[m], fnb[m])
    assert np.array_equal(xtr[m], fx[m].astype(xtr.dtype))
    assert np.array_equal(pay[m], fp[m])

    # dist
    e = dr[idx >> inflate_pl.SUB_BITS]
    is_sub = ((e >> 24) & 7) == inflate_pl.CLS_SUB
    se = ds[np.minimum((e & 0xFFFF) + (idx & 31), ds.size - 1)]
    e = np.where(is_sub, se, e)
    cls, nb, xtr, pay = (e >> 24) & 7, (e >> 20) & 15, (e >> 16) & 15, e & 0xFFFF
    fv = (dist_tab >> 23) & 1
    fnb, fx, fb = (dist_tab >> 19) & 15, (dist_tab >> 15) & 15, dist_tab & 0x7FFF
    assert np.array_equal(cls != 0, fv == 1)
    m = fv == 1
    assert np.array_equal(nb[m], fnb[m])
    assert np.array_equal(xtr[m], fx[m])
    assert np.array_equal(pay[m], fb[m])


def test_root_sub_fixed_and_incomplete():
    # fixed-Huffman litlen (all lengths <= 9: pure-root tree) and a
    # one-code dist tree (incomplete: everything else invalid)
    ll = np.zeros(288, np.int32)
    ll[:] = np.asarray(tables.FIXED_LIT_LENGTHS, np.int32)
    dl = np.zeros(32, np.int32)
    dl[0] = 1
    lit_tab, dist_tab = inflate_ops.build_fused_tables(
        jnp.asarray(ll)[None], jnp.asarray(dl)[None])
    lr, ls, dr, ds, ok = inflate_pl.build_row_tables(
        jnp.asarray(ll)[None], jnp.asarray(dl)[None])
    assert bool(np.asarray(ok)[0])
    lr, dr = np.asarray(lr)[0], np.asarray(dr)[0]
    # fixed lit: no subptrs at all
    assert not (((lr >> 24) & 7) == inflate_pl.CLS_SUB).any()
    dist_tab = np.asarray(dist_tab)[0]
    idx = np.arange(32768)
    e = dr[idx >> inflate_pl.SUB_BITS]
    assert np.array_equal(((e >> 24) & 7) != 0, ((dist_tab >> 23) & 1) == 1)


def _staged_archive(payload, member_size=8192, level=6):
    import pathlib
    import sys

    from decompress_tpu import de
    from decompress_tpu.parallel import sharded_gzip_compress, sharded

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "scripts"))
    from ablate_inflate import stage

    arch = sharded_gzip_compress(payload, level, member_size=member_size)
    buf = de._np_u8(arch)
    staged = stage(buf)[:8]
    # per-lane span bits (next split start - this start, or member end)
    mw, ll, dl, sb, sc, rm, max_cmds, nrows = staged
    sizes, splits, _tb = sharded._read_index_ex(buf)
    spans = np.zeros(sb.shape[0], np.int64)
    body_bits = {}
    off = 0
    from decompress_tpu import gz as _gz
    members = []
    for s in sizes:
        members.append(buf[off:off + s])
        off += s
    hidx = 0  # stage() numbers only the huff members (stored skipped)
    for mem in members:
        body = mem[_gz._header_end(mem):-8]
        try:
            kind = inflate_ops.prepare_member(body)[0]
        except inflate_ops.NotParallelizable:
            kind = "skip"
        if kind == "huff":
            body_bits[hidx] = body.size * 8
            hidx += 1
    for r in range(nrows):
        nxt = None
        if r + 1 < nrows and rm[r + 1] == rm[r]:
            nxt = sb[r + 1]
        spans[r] = (nxt if nxt is not None else body_bits[int(rm[r])]) - sb[r]
    return staged, spans, arch


def _norm_rows(kinds, values, dists, stops, nrows):
    """Per row: the real command tuples (NOPs stripped; count-stopped
    rows truncated at stop; EOB rows up to the end marker)."""
    out = []
    for r in range(nrows):
        cmds = []
        for k, v, d in zip(kinds[r], values[r], dists[r]):
            if k == 3:
                continue
            if k == 2:
                if stops[r] == 0:
                    cmds.append((2, 0, 0))
                break
            cmds.append((int(k), int(v), int(d)))
            if stops[r] > 0 and len(cmds) >= stops[r]:
                break
        out.append(cmds)
    return out


@pytest.mark.parametrize("level", [1, 6])
def test_pl_kernel_matches_xla_interpret(level):
    import jax.numpy as jnp2

    rng = np.random.default_rng(5)
    payload = (b"the pallas decode kernel must agree with the XLA one " * 300
               + rng.integers(0, 256, 9000, np.uint8).tobytes()
               + b"\x00" * 3000)
    (mw, ll, dl, sb, sc, rm, max_cmds, nrows), spans, _ = _staged_archive(
        payload, level=level)
    lt, dt = inflate_ops.build_fused_tables(jnp.asarray(ll), jnp.asarray(dl))
    kinds_x, values_x, dists_x, ok_x = inflate_ops.decode_symbols(
        jnp.asarray(mw), jnp.asarray(sb), lt, dt, max_cmds=max_cmds,
        stop_counts=jnp.asarray(sc), row_members=jnp.asarray(rm))
    kinds_x, values_x, dists_x = (np.asarray(a) for a in
                                  (kinds_x, values_x, dists_x))
    assert bool(np.asarray(ok_x)[:nrows].all())

    max_real = int(max(
        sc[r] if sc[r] > 0 else max_cmds for r in range(nrows)))
    # bit-based stops: interior rows stop at the next split's start bit
    stop_bits = np.where(sc[:nrows] > 0,
                         sb[:nrows].astype(np.int64) + spans[:nrows], 0)
    kinds_p, values_p, dists_p, ok_p = inflate_pl.decode_symbols_pl(
        mw, sb[:nrows], stop_bits, rm[:nrows], ll, dl, spans[:nrows],
        max_real=max_real, interpret=True)
    assert ok_p[:nrows].all()
    a = _norm_rows(kinds_x, values_x, dists_x, sc, nrows)
    b = _norm_rows(kinds_p, values_p, dists_p, sc, nrows)
    assert a == b


def test_tb_index_end_to_end(monkeypatch):
    """Bit-stride archives write the compact TB subfield (u8 deltas;
    ~50 B per member instead of ~530 B) and decode byte-exact through
    BOTH kernels: the XLA lockstep kernel with bit-based stops and the
    Pallas kernel (interpret mode here)."""
    import gzip
    import os

    from decompress_tpu import de
    from decompress_tpu.parallel import sharded

    rng = np.random.default_rng(17)
    payload = (b"compact TB index round trip " * 1200
               + rng.integers(0, 256, 14000, np.uint8).tobytes()
               + bytes(6000))
    monkeypatch.setattr(sharded, "SPLIT_BITS", 4096)
    monkeypatch.setattr(sharded, "N_SPLITS", 250)
    arch = sharded.sharded_gzip_compress(payload, 6, member_size=16384)
    assert gzip.decompress(arch) == payload  # still standard gzip

    buf = de._np_u8(arch)
    sizes, splits, tb = sharded._read_index_ex(buf)
    assert tb is not None and tb["bits"] == 4096
    assert splits is not None and any(len(r) for r in splits)
    # compactness: every recorded split costs 1 byte + 4/member header
    n_splits = sum(len(r) for r in splits)
    assert n_splits >= 4

    # serial-fallback poisoning: both kernel paths must succeed alone
    monkeypatch.setattr(sharded.gz, "decompress",
                        lambda _b: (_ for _ in ()).throw(
                            AssertionError("serial fallback used")))
    monkeypatch.setenv("DECOMPRESS_TPU_INFLATE_KERNEL", "xla")
    assert sharded.sharded_gzip_decompress(buf) == payload
    assert sharded.sharded_gzip_decompress(buf, expand="device") == payload
    monkeypatch.setenv("DECOMPRESS_TPU_INFLATE_KERNEL", "pl-interpret")
    assert sharded.sharded_gzip_decompress(buf) == payload
