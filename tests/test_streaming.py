"""Streaming API tests: Await/Flush protocol, window carry-over across
segments (config 3), queue-driven encoding, Higher loops.

Parity with the reference streaming suites (test.ml byte-split resume
tests test.ml:1450–1496, Higher fuzz fuzz.ml:267–327)."""

import gzip
import io
import zlib

import numpy as np
import pytest

from decompress_tpu import de, gz, streaming, zl


def chunks(data, size):
    return [data[i : i + size] for i in range(0, len(data), size)]


@pytest.fixture(scope="module")
def payload():
    rng = np.random.default_rng(5)
    return (
        b"streaming window carry test " * 700
        + rng.integers(0, 256, 9000, np.uint8).tobytes()
        + b"streaming window carry test " * 200
    )


def test_streaming_deflate_multi_push(payload):
    enc = streaming.Deflate(level=6, segment_size=8192)
    out = b""
    for c in chunks(payload, 3000):
        out += enc.push(c)
    out += enc.finish()
    assert zlib.decompressobj(-15).decompress(out) == payload


def test_streaming_deflate_window_carry():
    """Matches must cross push/segment boundaries (carry-over window)."""
    block = bytes(np.random.default_rng(6).integers(0, 256, 4000, np.uint8))
    data = block * 6
    enc = streaming.Deflate(level=6, segment_size=4096)
    out = b""
    for c in chunks(data, 4096):
        out += enc.push(c)
    out += enc.finish()
    assert zlib.decompressobj(-15).decompress(out) == data
    assert len(out) < len(block) * 2  # later copies compress via history


def test_streaming_inflate_protocol(payload):
    comp = zlib.compress(payload, 6)[2:-4]
    inf = streaming.Inflate(o_size=4096)
    feed = chunks(comp, 997)
    out = b""
    fi = 0
    while True:
        tok = inf.decode()
        if tok == "await":
            inf.src(feed[fi] if fi < len(feed) else b"")
            fi += 1
        elif tok == "flush":
            out += inf.flush()
        elif tok == "end":
            out += inf.flush()
            break
        else:
            raise AssertionError(inf.error)
    assert out == payload


def test_streaming_inflate_malformed_token():
    inf = streaming.Inflate()
    inf.src(b"\x07")
    inf.src(b"")
    assert inf.decode() == "malformed"
    assert "invalid kind of block" in inf.error


def test_zl_streaming_roundtrip(payload):
    enc = zl.Def(level=6, segment_size=8192)
    comp = b""
    for c in chunks(payload, 5000):
        comp += enc.push(c)
    comp += enc.finish()
    assert zlib.decompress(comp) == payload

    dec = zl.Inf(o_size=4096)
    feed = chunks(comp, 1333)
    out, fi = b"", 0
    while True:
        tok = dec.decode()
        if tok == "await":
            dec.src(feed[fi] if fi < len(feed) else b"")
            fi += 1
        elif tok == "flush":
            out += dec.flush()
        elif tok == "end":
            out += dec.flush()
            break
        else:
            raise AssertionError(dec.error)
    assert out == payload


def test_zl_streaming_decodes_foreign(payload):
    comp = zlib.compress(payload, 9)
    dec = zl.Inf()
    dec.src(comp)
    dec.src(b"")
    out = b""
    while (tok := dec.decode()) != "end":
        assert tok == "flush", dec.error
        out += dec.flush()
    out += dec.flush()
    assert out == payload


def test_zl_streaming_bad_checksum(payload):
    comp = bytearray(zlib.compress(payload, 6))
    comp[-1] ^= 1
    dec = zl.Inf()
    dec.src(bytes(comp))
    dec.src(b"")
    toks = set()
    while (tok := dec.decode()) not in ("end", "malformed"):
        dec.flush()
        toks.add(tok)
    assert tok == "malformed"
    assert dec.error == "invalid checksum"


def test_gz_streaming_roundtrip_with_metadata(payload):
    enc = gz.Def(level=6, segment_size=8192, filename="s.bin", mtime=777,
                 comment="c", fhcrc=True)
    comp = b""
    for c in chunks(payload, 7000):
        comp += enc.push(c)
    comp += enc.finish()
    assert gzip.decompress(comp) == payload

    dec = gz.Inf(o_size=8192)
    dec.src(comp)
    dec.src(b"")
    out = b""
    while (tok := dec.decode()) != "end":
        assert tok == "flush", dec.error
        out += dec.flush()
    out += dec.flush()
    assert out == payload
    assert dec.filename() == "s.bin"
    assert dec.mtime() == 777
    assert dec.comment() == "c"


def test_gz_streaming_foreign(payload):
    bio = io.BytesIO()
    with gzip.GzipFile(fileobj=bio, mode="wb", filename="f") as f:
        f.write(payload)
    dec = gz.Inf()
    dec.src(bio.getvalue())
    dec.src(b"")
    out = b""
    while (tok := dec.decode()) != "end":
        assert tok == "flush", dec.error
        out += dec.flush()
    out += dec.flush()
    assert out == payload


def test_queue_protocol():
    q = streaming.Queue(64)
    q.blit(b"ab")
    q.push_exn(de.cmd_copy(2, 3))
    q.end_with_eob()
    assert q.to_list() == [
        ("literal", ord("a")), ("literal", ord("b")),
        ("copy", (2, 3)), ("end", None),
    ]
    q2 = streaming.Queue.of_list(q.to_list())
    assert q2.to_list() == q.to_list()
    assert q2.pop_exn() == ord("a")
    with pytest.raises(OverflowError):
        streaming.Queue(2).blit(b"abc")


def test_lz77_streaming_matcher():
    q = streaming.Queue(1 << 14)
    lz = streaming.Lz77(q, level=6, chunk=4096)
    data = b"abcdabcdabcd" * 300
    lz.src(data)
    lz.src(b"")
    assert lz.compress() == "end"
    cmds = [int(c) for c in q.as_array()]
    assert de.reconstruct(cmds) == data
    assert lz.checksum_value == zlib.adler32(data)
    assert lz.literals.sum() > 0 and lz.distances.sum() > 0


def test_encode_commands_roundtrip():
    """Queue-driven encoder: commands -> block -> zlib decode ==
    reconstruct (fuzz.ml:169–194 triple-equality strategy)."""
    rng = np.random.default_rng(7)
    cmds = []
    out_len = 0
    for _ in range(200):
        if out_len < 4 or rng.random() < 0.6:
            b = int(rng.integers(0, 256))
            cmds.append(de.cmd_literal(b))
            out_len += 1
        else:
            off = int(rng.integers(1, min(out_len, 32768) + 1))
            ln = int(rng.integers(3, 259))
            cmds.append(de.cmd_copy(off, ln))
            out_len += ln
    expect = de.reconstruct(cmds)
    for block in ("fixed", "dynamic", None):
        stream = de.encode_commands(cmds, block=block)
        assert zlib.decompressobj(-15).decompress(stream) == expect
        assert de.inflate(stream) == expect


def test_higher_loops(payload):
    src = io.BytesIO(payload)
    comp = io.BytesIO()
    streaming.higher_compress(lambda: src.read(4096), comp.write, level=6)
    assert zlib.decompressobj(-15).decompress(comp.getvalue()) == payload

    comp.seek(0)
    out = io.BytesIO()
    streaming.higher_uncompress(lambda: comp.read(1024), out.write)
    assert out.getvalue() == payload

    # zl / gz higher
    src = io.BytesIO(payload)
    zcomp = io.BytesIO()
    zl.higher_compress(lambda: src.read(4096), zcomp.write)
    assert zlib.decompress(zcomp.getvalue()) == payload
    zcomp.seek(0)
    zout = io.BytesIO()
    zl.higher_uncompress(lambda: zcomp.read(999), zout.write)
    assert zout.getvalue() == payload

    src = io.BytesIO(payload)
    gcomp = io.BytesIO()
    gz.higher_compress(lambda: src.read(4096), gcomp.write, filename="h")
    assert gzip.decompress(gcomp.getvalue()) == payload
    gcomp.seek(0)
    gout = io.BytesIO()
    meta = gz.higher_uncompress(lambda: gcomp.read(999), gout.write)
    assert gout.getvalue() == payload and meta.filename == "h"


def test_lz_standalone_module():
    from decompress_tpu import lz

    q = lz.Queue(1 << 14)
    data = b"standalone lz api " * 100
    lz.compress_into(q, data)
    cmds = [int(c) for c in q.as_array()]
    assert cmds[-1] == de.CMD_EOB
    assert de.reconstruct(cmds[:-1]) == data
    stream = de.encode_commands(cmds[:-1])
    assert zlib.decompressobj(-15).decompress(stream) == data


def test_reset_reuse():
    """Decoder reuse across streams (reference reset, de.ml:1512–1532,
    zl.ml:354–378, gz.ml:582–610) and multi-member gz.Inf chaining."""
    a = zlib.compress(b"first stream", 6)
    b_ = zlib.compress(b"second stream", 9)
    dec = zl.Inf()
    for comp, expect in ((a, b"first stream"), (b_, b"second stream")):
        dec.src(comp)
        dec.src(b"")
        out = b""
        while (tok := dec.decode()) != "end":
            assert tok == "flush", dec.error
            out += dec.flush()
        out += dec.flush()
        assert out == expect
        dec.reset()

    m1 = gz.compress(b"member one|", 6, segment_size=4096)
    m2 = gz.compress(b"member two", 6, segment_size=4096)
    g = gz.Inf()
    g.src(m1 + m2)
    g.src(b"")
    out = b""
    while (tok := g.decode()) != "end":
        out += g.flush()
    out += g.flush()
    assert out == b"member one|"
    g.reset()  # carries remaining input to the next member
    g.src(b"")
    out2 = b""
    while (tok := g.decode()) != "end":
        out2 += g.flush()
    out2 += g.flush()
    assert out2 == b"member two"


def test_dynamic_false_forces_fixed():
    data = b"fixed trees only " * 200
    comp = zl.deflate(data, 6, segment_size=4096, dynamic=False)
    assert zlib.decompress(comp) == data
    assert (comp[2] >> 1) & 3 == 1  # BTYPE fixed


def test_zl_streaming_preset_dictionary():
    """Streaming zdict decode across tiny chunk feeds (the DICTID bytes
    arrive split); missing dictionary stays a clean Malformed token."""
    import zlib

    from decompress_tpu import zl

    zdict = b"the quick brown fox jumps over the lazy dog " * 50
    data = b"a lazy dog and the quick brown fox; " * 300
    c = zlib.compressobj(6, zlib.DEFLATED, 15, 9, 0, zdict)
    comp = c.compress(data) + c.flush()

    dec = zl.Inf(o_size=512, zdict=zdict)
    feed = [comp[i:i + 3] for i in range(0, len(comp), 3)]
    out, fi = b"", 0
    while True:
        tok = dec.decode()
        if tok == "await":
            dec.src(feed[fi] if fi < len(feed) else b"")
            fi += 1
        elif tok == "flush":
            out += dec.flush()
        elif tok == "end":
            out += dec.flush()
            break
        else:
            raise AssertionError(dec.error)
    assert out == data

    dec = zl.Inf()
    dec.src(comp)
    dec.src(b"")
    while (t := dec.decode()) not in ("end", "malformed"):
        dec.flush()
    assert t == "malformed" and "dictionary" in dec.error


# ---------------------------------------------------------------------------
# De.Def streaming encoder protocol (de.mli:300–445; de.ml:2354–3036).
# ---------------------------------------------------------------------------


def _drive(enc, actions, dst_size=1):
    """Drive the Def protocol byte-at-a-time; `actions` yields the
    responses to "block" (and the initial action)."""
    import numpy as np

    out = bytearray()
    buf = np.zeros(dst_size, np.uint8)
    enc.dst(buf)
    tok = enc.encode(next(actions))
    while True:
        if tok == "partial":
            out += bytes(buf[: enc._dst_pos])
            enc.dst(buf)
            tok = enc.encode("await")
        elif tok == "block":
            tok = enc.encode(next(actions))
        elif tok == "ok":
            out += bytes(buf[: enc._dst_pos])
            return bytes(out)
        else:
            raise AssertionError(tok)


def test_def_byte_at_a_time_resume():
    """1-byte dst: every encode returns partial and the stream still
    assembles byte-exact (test.ml:1450–1496 analogue)."""
    import numpy as np

    data = b"resumable encoder " * 40
    q = streaming.Queue(4096)
    q.blit(data)
    q.end_with_eob()
    lits = np.zeros(287, np.int64)
    for b in data:
        lits[b] += 1
    lits[256] = 1
    dyn = streaming.dynamic_of_frequencies(lits, np.zeros(30, np.int64))
    comp = _drive(streaming.Def(q), iter([streaming.Block("dynamic", True, dyn)]))

    # same commands through a roomy dst must give identical bytes
    q2 = streaming.Queue(4096)
    q2.blit(data)
    q2.end_with_eob()
    comp2 = _drive(streaming.Def(q2),
                   iter([streaming.Block("dynamic", True, dyn)]), dst_size=1 << 16)
    assert comp == comp2
    d = zlib.decompressobj(-15)
    assert d.decompress(comp) == data and d.eof


def test_def_block_handshake():
    """A literal outside the current dynamic tree forces `Block: the
    encoder emits the EOB, returns "block", and the caller switches
    kinds mid-stream (de.ml:2851–2871)."""
    import numpy as np

    data = b"aaaaabbbbbZccc"
    q = streaming.Queue(1024)
    lits = np.zeros(287, np.int64)
    for b in b"aaaaabbbbbccc":
        lits[b] += 1
    lits[256] = 1
    dyn = streaming.dynamic_of_frequencies(lits, np.zeros(30, np.int64))
    assert dyn.lit_lengths[ord("Z")] == 0  # Z not encodable
    q.blit(data)
    q.end_with_eob()
    enc = streaming.Def(q)
    saw = []

    def actions():
        saw.append("first")
        yield streaming.Block("dynamic", False, dyn)
        saw.append("switch")
        yield streaming.Block("fixed", True)

    comp = _drive(enc, actions(), dst_size=3)
    assert saw == ["first", "switch"]
    d = zlib.decompressobj(-15)
    assert d.decompress(comp) == data and d.eof


def test_def_flat_and_forced_switch():
    """Flat blocks pin LEN from the queue at header time
    (de.ml:2674–2681); a caller-forced mid-stream switch writes the
    current block's EOB then the new header (de.ml:2899–2924)."""
    import numpy as np

    q = streaming.Queue(1024)
    q.blit(b"raw stored payload")
    q.end_with_eob()
    comp = _drive(streaming.Def(q), iter([streaming.Block("flat", True)]),
                  dst_size=2)
    d = zlib.decompressobj(-15)
    assert d.decompress(comp) == b"raw stored payload" and d.eof

    # forced switch: fixed -> fixed(last) midway through the queue
    q = streaming.Queue(1024)
    q.blit(b"first half ")
    enc = streaming.Def(q)
    buf = np.zeros(1 << 14, np.uint8)
    enc.dst(buf)
    assert enc.encode(streaming.Block("fixed", False)) == "ok"
    q.blit(b"second half")
    q.end_with_eob()
    assert enc.encode(streaming.Block("fixed", True)) == "ok"
    comp = bytes(buf[: enc._dst_pos])
    d = zlib.decompressobj(-15)
    assert d.decompress(comp) == b"first half second half" and d.eof
    assert isinstance(enc.bits_rem(), int)
    # a new block after last must be refused (de.ml:2975–2978)
    with pytest.raises(ValueError):
        enc.encode(streaming.Block("fixed", False))


def test_def_bits_rem_alignment():
    """bits_rem reports the final byte's padding (de.ml:3012–3015):
    total bit length modulo 8 must agree."""
    import numpy as np

    q = streaming.Queue(1024)
    q.blit(b"alignment probe")
    q.end_with_eob()
    enc = streaming.Def(q)
    buf = np.zeros(1 << 14, np.uint8)
    enc.dst(buf)
    with pytest.raises(ValueError):
        enc.bits_rem()  # only valid after the last EOB
    assert enc.encode(streaming.Block("fixed", True)) == "ok"
    comp = bytes(buf[: enc._dst_pos])
    rem = enc.bits_rem()
    assert 0 <= rem < 8
    # strip the zero padding: the stream's real bit length ends rem
    # bits before the byte boundary, so the top rem bits are zero
    if rem:
        assert comp[-1] >> (8 - rem) == 0


def test_block_of_frequencies_chooser():
    """Small/uniform inputs fall back to fixed; skewed inputs go
    dynamic (de.ml:2415–2449)."""
    import numpy as np

    lits = np.zeros(287, np.int64)
    lits[ord("a")] = 2
    lits[256] = 1
    assert streaming.block_of_frequencies(False, lits, np.zeros(30, np.int64)).kind == "fixed"
    lits = np.zeros(287, np.int64)
    lits[ord("a")] = 10000
    lits[ord("b")] = 5000
    lits[256] = 1
    assert streaming.block_of_frequencies(False, lits, np.zeros(30, np.int64)).kind == "dynamic"


def test_queue_ring_ops():
    q = streaming.Queue(8)
    q.blit(b"abc")
    assert len(q) == 3 and q.peek_exn() == ord("a")
    assert q.ends_with_eob() is False
    q.end_with_eob()
    assert q.ends_with_eob()
    q.rem_last_exn()
    assert not q.ends_with_eob()
    # wraparound path
    q.junk_exn(2)
    q.blit(b"defgh")
    assert [int(c) for c in q.as_array()] == [ord(x) for x in "cdefgh"]


def test_queue_engine_zl_gz():
    """zl.Def/gz.Def engine="queue" route through Lz77 -> Queue -> Def
    (the reference's consumer loop zl.ml:523–555) and stay
    oracle-decodable."""
    data = (b"queue engine " * 700) + bytes(range(256)) * 4
    enc = zl.Def(6, engine="queue")
    out = b""
    for i in range(0, len(data), 3001):
        out += enc.push(data[i : i + 3001])
    out += enc.finish()
    assert zlib.decompress(out) == data

    genc = gz.Def(6, engine="queue", filename="q")
    gout = genc.push(data) + genc.finish()
    assert gzip.decompress(gout) == data


def test_lz_host_matcher_cross_check():
    """The standalone host rolling-hash matcher (lz.py) and the device
    matcher are independent implementations; both must produce command
    streams that reconstruct byte-exactly and encode to valid DEFLATE."""
    from decompress_tpu import lz

    data = (b"cross-check the matchers " * 300
            + bytes(range(256)) * 3 + b"tail tail tail tail")
    for device in (False, True):
        q = lz.Queue(1 << 15)
        lz.compress_into(q, data, device=device)
        cmds = [int(c) for c in q.as_array()]
        assert cmds[-1] == de.CMD_EOB
        assert de.reconstruct(cmds[:-1]) == data
        stream = de.encode_commands(cmds[:-1])
        assert zlib.decompressobj(-15).decompress(stream) == data
    # streaming State protocol
    st_q = lz.Queue(1 << 15)
    state = lz.State(st_q)
    state.src(data[:1000])
    assert state.compress() == "await"
    state.src(data[1000:])
    state.src(b"")
    while state.compress() != "end":
        pass
    cmds = [int(c) for c in st_q.as_array()]
    assert de.reconstruct(cmds[:-1]) == data


def test_lz_state_window_crosses_feeds():
    """The State matcher's window carries across `src` feeds
    (lz.ml:308–352): a phrase first seen in feed 1 must be emitted as
    a COPY when it recurs in feed 2, and chunked State output must
    match one-shot compress_into on the same bytes."""
    from decompress_tpu import lz

    phrase = b"the quick brown fox jumps over the lazy dog! "
    # feed 1 ends mid-way through unique filler; feed 2 repeats the
    # phrase seen only in feed 1 — a copy requires cross-feed history
    feed1 = phrase * 4 + bytes(range(200))
    feed2 = bytes(reversed(range(200))) + phrase * 4
    q = lz.Queue(1 << 15)
    st = lz.State(q)
    st.src(feed1)
    assert st.compress() == "await"
    st.src(feed2)
    st.src(b"")
    while st.compress() != "end":
        pass
    cmds = [int(c) for c in q.as_array()]
    data = feed1 + feed2
    assert de.reconstruct(cmds[:-1]) == data
    # at least one copy in feed-2's phrase region must reach back past
    # the feed boundary
    pos = 0
    cross = False
    for c in cmds[:-1]:
        kind, arg = de.cmd_unpack(c)
        if kind == "literal":
            pos += 1
        else:
            dist, length = arg
            if pos >= len(feed1) and pos - dist < len(feed1):
                cross = True
            pos += length
    assert cross, "no copy crossed the feed boundary"
    # chunked State == one-shot on the same bytes (identical commands:
    # the matcher state is feed-boundary invariant by construction)
    one_q = lz.Queue(1 << 15)
    lz.compress_into(one_q, data)
    chunk_q = lz.Queue(1 << 15)
    st2 = lz.State(chunk_q)
    for i in range(0, len(data), 333):
        st2.src(data[i : i + 333])
    st2.src(b"")
    while st2.compress() != "end":
        pass
    assert [int(c) for c in chunk_q.as_array()] == [
        int(c) for c in one_q.as_array()
    ]


def _lz_oneshot_cmds(data: bytes):
    from decompress_tpu import lz

    q = lz.Queue(1 << 16)
    lz.compress_into(q, data)
    return [int(c) for c in q.as_array()]


def _lz_chunked_cmds(data: bytes, chunk: int):
    from decompress_tpu import lz

    q = lz.Queue(1 << 16)  # holds every command: no flush cycles
    st = lz.State(q)
    for i in range(0, len(data), chunk):
        st.src(data[i : i + chunk])
    st.src(b"")
    while st.compress() != "end":
        pass
    return [int(c) for c in q.as_array()]


def test_lz_state_pending_insert_at_feed_edge():
    """A _MAX-length match ending one byte before a feed's end clamps
    its last sparse hash insertion (k+2 past the feed); the insertion
    must be replayed on the next feed or chunked output diverges from
    one-shot (advisor finding, round 3).  Construction puts the match
    at i = end-_MAX-1 so the clamped position is exactly end-2."""
    import numpy as np

    from decompress_tpu import lz

    rng = np.random.default_rng(42)
    block = bytes(int(b) for b in rng.integers(0, 0xA0, 258))
    sep = b"\xE0\xE1\xE2\xE3\xE4"
    feed1 = block + sep + block + b"\xFF"  # second block ends at N-2
    # feed 2 recurs the boundary-straddling 3-gram (block[-1], FF, EE)
    feed2 = b"\xEE\xDD\xCC" + block[-1:] + b"\xFF\xEE" + b"\xBB\xAA"
    data = feed1 + feed2

    # white-box: the clamped insertion is actually pending after feed 1
    st = lz.State(lz.Queue(1 << 16))
    st.src(feed1)
    assert st._m.pending_ins == [len(feed1) - 2]

    one = _lz_oneshot_cmds(data)
    q = lz.Queue(1 << 16)
    st2 = lz.State(q)
    st2.src(feed1)
    st2.src(feed2)
    st2.src(b"")
    while st2.compress() != "end":
        pass
    assert [int(c) for c in q.as_array()] == one
    assert de.reconstruct(one[:-1]) == data


def test_lz_state_chunked_bitexact_stress():
    """Chunked State output is command-identical to one-shot across
    adversarial chunk sizes on small-alphabet data (dense long
    matches exercise every feed-boundary clamp path)."""
    import numpy as np

    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(600, 2600))
        data = bytes(int(b) for b in rng.integers(0, 3, n))
        one = _lz_oneshot_cmds(data)
        assert de.reconstruct(one[:-1]) == data
        for chunk in (1 + trial, 257, 258, 259, 333):
            got = _lz_chunked_cmds(data, chunk)
            assert got == one, (trial, chunk)
