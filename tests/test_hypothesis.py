"""Generative fuzzing with shrinking (hypothesis).

The reference fuzzes with crowbar generators (fuzz/fuzz.ml:113–194:
random command lists validated by `check_cmds`, random buffers through
the zlib oracle both ways).  Seeded property loops (test_property.py)
replay fixed corners; hypothesis explores and SHRINKS new ones — a
failing case minimizes to a tiny reproducer.

Strategy sizes are kept small so the suite stays fast; the encoder
paths exercised are the host command encoder and the streaming Def
protocol (segment pipelines are covered by the corpus suites).
"""

import os
import zlib

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from decompress_tpu import de, lzo, streaming

#: DECOMPRESS_TPU_FUZZ_EXAMPLES scales the generative budgets for long
#: soak runs (CI default 60; the round-5 soak ran 400-1500 per property)
_N = int(os.environ.get("DECOMPRESS_TPU_FUZZ_EXAMPLES", "60"))
FAST = settings(deadline=None, max_examples=_N,
                suppress_health_check=[HealthCheck.too_slow])


def command_lists(max_len=120):
    """Valid command sequences (fuzz.ml's `apply` generator invariant:
    copies never reference before the start)."""

    @st.composite
    def cmds(draw):
        out = []
        out_len = 0
        n = draw(st.integers(1, max_len))
        for _ in range(n):
            if out_len < 1 or draw(st.booleans()):
                out.append(de.cmd_literal(draw(st.integers(0, 255))))
                out_len += 1
            else:
                off = draw(st.integers(1, min(out_len, 32768)))
                ln = draw(st.integers(3, 258))
                out.append(de.cmd_copy(off, ln))
                out_len += ln
        return out

    return cmds()


@FAST
@given(command_lists())
def test_commands_triple_equality(cmds):
    """reconstruct(cmds) == zlib(encode(cmds)) == our_inflate(encode(cmds))
    for every block kind (fuzz.ml:169–194's strategy)."""
    expect = de.reconstruct(cmds)
    for block in ("fixed", "dynamic", None):
        stream = de.encode_commands(cmds, block=block)
        d = zlib.decompressobj(-15)
        assert d.decompress(stream) == expect and d.eof
        assert de.inflate(stream) == expect


@FAST
@given(command_lists(max_len=60), st.integers(1, 7))
def test_streaming_def_protocol_fuzz(cmds, dst_size):
    """The queue-driven Def encoder with arbitrary tiny dst buffers
    produces a stream zlib accepts, for dynamic trees built from the
    commands' own frequencies."""
    from decompress_tpu.core import tables

    lits = np.zeros(287, np.int64)
    dists = np.zeros(30, np.int64)
    q = streaming.Queue(1 << 14)
    for c in cmds:
        kind, arg = de.cmd_unpack(c)
        if kind == "literal":
            lits[arg] += 1
        else:
            off, ln = arg
            lits[257 + int(tables.length_to_code(np.array([ln]))[0])] += 1
            dists[int(tables.dist_to_code(np.array([off]))[0])] += 1
        q.push_exn(c)
    lits[256] = 1
    q.end_with_eob()
    dyn = streaming.dynamic_of_frequencies(lits, dists)
    enc = streaming.Def(q)
    buf = np.zeros(dst_size, np.uint8)
    enc.dst(buf)
    out = bytearray()
    tok = enc.encode(streaming.Block("dynamic", True, dyn))
    while tok != "ok":
        assert tok == "partial", tok
        out += bytes(buf[: enc._dst_pos])
        enc.dst(buf)
        tok = enc.encode("await")
    out += bytes(buf[: enc._dst_pos])
    d = zlib.decompressobj(-15)
    assert d.decompress(bytes(out)) == de.reconstruct(cmds) and d.eof


@FAST
@given(st.binary(max_size=4096))
def test_inflate_never_lies(data):
    """Arbitrary bytes into our inflate: either a clean MalformedError,
    or an output the C oracle agrees with on the consumed prefix."""
    try:
        out, consumed = de.inflate_ex(data)
    except de.MalformedError:
        return
    d = zlib.decompressobj(-15)
    assert d.decompress(data[:consumed]) == out


@FAST
@given(st.binary(max_size=2048))
def test_zlib_header_fuzz(data):
    from decompress_tpu import zl

    try:
        out, consumed = zl.inflate_ex(data)
    except de.MalformedError:
        return
    assert zlib.decompress(bytes(data[:consumed])) == out


@FAST
@given(st.binary(max_size=4096))
def test_lzo_roundtrip_fuzz(data):
    comp = lzo.compress(data)
    assert lzo.uncompress_with_buffer(comp) == data


@FAST
@given(st.binary(max_size=2048))
def test_lzo_decoder_robust(data):
    """Arbitrary bytes into the LZO decoder: clean error or output
    (never a crash / infinite loop)."""
    try:
        lzo.uncompress_with_buffer(data)
    except (lzo.LzoError, ValueError):
        pass


@settings(deadline=None, max_examples=max(8, _N // 8),
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(st.binary(min_size=600, max_size=6000), st.sampled_from([4, 7, 10, 14]))
def test_device_decode_any_window(data, nw):
    """Member-parallel decode is byte-exact for ANY decode-window size:
    small windows exercise the NOP slot machinery, large ones the
    straight path; the serial fallback stays correct either way."""
    import numpy as np

    from decompress_tpu import de
    from decompress_tpu.ops import inflate as iops
    from decompress_tpu.parallel import (
        sharded_gzip_compress,
        sharded_gzip_decompress,
    )

    payload = data * 3  # some matches across copies
    arch = sharded_gzip_compress(payload, 6, member_size=4096)
    old = iops.NW_DEFAULT
    iops.NW_DEFAULT = nw
    try:
        assert sharded_gzip_decompress(de._np_u8(arch)) == payload
    finally:
        iops.NW_DEFAULT = old


def _corpus_pool():
    import pathlib

    corpus = pathlib.Path(__file__).parent / "corpus"
    return b"".join(p.read_bytes() for p in sorted(corpus.iterdir()))


_POOL = _corpus_pool()


@settings(deadline=None, max_examples=max(15, _N // 4),
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(st.integers(0, len(_POOL) - 20000), st.integers(500, 20000),
       st.lists(st.tuples(st.integers(0, 19999), st.integers(0, 255)),
                max_size=12),
       st.sampled_from([1, 4, 6, 9]), st.sampled_from([9, 12, 15]))
def test_matcher_corpus_mutation_fuzz(off, size, muts, level, wbits):
    """Realistic match-heavy data through the FULL matcher (fingerprint
    fast path + exact verify + trim-and-reparse): corpus slices with
    random byte mutations, random level and restricted windows, must
    round-trip through the C oracle.  st.binary's uniform bytes almost
    never exercise the candidate/descent machinery; corpus text does
    (the reference fuzzes the encoder with structured command lists,
    fuzz/fuzz.ml:113-194 — this is the data-side analogue)."""
    data = bytearray(_POOL[off:off + size])
    for pos, val in muts:
        if pos < len(data):
            data[pos] = val
    data = bytes(data)
    c = de.deflate(data, level=level, window_bits=wbits)
    d = zlib.decompressobj(-wbits)
    assert d.decompress(c) + d.flush() == data
