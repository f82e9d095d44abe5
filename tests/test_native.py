"""Native C++ runtime (libtpuz) tests: checksums vs zlib, LZO oracle
cross-checks (the minilzo-fuzz strategy, fuzz/fuzz_lzo.ml:19–39), and
the streaming inflater vs zlib-produced streams."""

import zlib

import numpy as np
import pytest

from decompress_tpu import lzo, native

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_native_checksums_vs_zlib():
    rng = np.random.default_rng(0)
    for n in (1, 100, 5552, 5553, 70000):
        data = rng.integers(0, 256, n, np.uint8).tobytes()
        assert native.adler32(data) == zlib.adler32(data)
        assert native.crc32(data) == zlib.crc32(data)
    a = rng.integers(0, 256, 1000, np.uint8).tobytes()
    b = rng.integers(0, 256, 2345, np.uint8).tobytes()
    assert native.crc32(b, native.crc32(a)) == zlib.crc32(a + b)
    assert native.crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b)) == zlib.crc32(a + b)
    assert native.adler32_combine(zlib.adler32(a), zlib.adler32(b), len(b)) == zlib.adler32(a + b)


def test_lzo_cross_implementation(small_corpus):
    """Python compress -> C++ decompress and C++ compress -> Python
    decompress (independent implementations of the same format)."""
    for name, data in small_corpus[:2]:
        ours = lzo.compress(data)
        assert native.lzo1x_decompress(ours, len(data) + 16) == data, name
        theirs = native.lzo1x_compress(data)
        assert lzo.uncompress(theirs) == data, name
        assert len(theirs) < len(data)


def test_lzo_cross_small():
    for payload in (b"", b"a", b"abc", b"aaaa" * 100, b"xy" * 3000):
        ours = lzo.compress(payload)
        assert native.lzo1x_decompress(ours, len(payload) + 16) == payload
        theirs = native.lzo1x_compress(payload)
        assert lzo.uncompress(theirs) == payload


def test_streaming_inflate_one_shot():
    data = b"streaming inflate test " * 500
    comp = zlib.compress(data, 6)[2:-4]  # raw deflate
    inf = native.InflateStream()
    status, consumed, out = inf.run(comp, len(data) + 16)
    assert status == native.InflateStream.END
    assert out == data
    assert consumed == len(comp)


def test_streaming_inflate_byte_by_byte():
    """Await/flush protocol: feed 1 byte at a time, tiny output buffer."""
    rng = np.random.default_rng(1)
    data = (b"abcdef" * 2000) + rng.integers(0, 256, 4000, np.uint8).tobytes()
    comp = zlib.compress(data, 9)[2:-4]
    inf = native.InflateStream()
    out = bytearray()
    pos = 0
    status = native.InflateStream.AWAIT
    while status != native.InflateStream.END:
        if status == native.InflateStream.AWAIT:
            feed = comp[pos : pos + 1]
            assert pos < len(comp), "inflater wants input past EOF"
            pos += 1
        else:
            feed = b""
        status, consumed, produced = inf.run(feed, 7)  # tiny dst
        out += produced
        assert status != native.InflateStream.MALFORMED, inf.error
        if status == native.InflateStream.AWAIT:
            assert consumed == len(feed)
    assert bytes(out) == data


def test_streaming_inflate_all_strategies():
    rng = np.random.default_rng(2)
    data = (b"abcabc" * 1000) + rng.integers(0, 256, 2000, np.uint8).tobytes()
    for strategy in (zlib.Z_DEFAULT_STRATEGY, zlib.Z_FIXED, zlib.Z_RLE):
        for level in (0, 1, 6, 9):
            co = zlib.compressobj(level, zlib.DEFLATED, -15, 9, strategy)
            comp = co.compress(data) + co.flush()
            inf = native.InflateStream()
            status, consumed, out = inf.run(comp, len(data) + 16)
            assert status == native.InflateStream.END, (strategy, level, inf.error)
            assert out == data


def test_streaming_inflate_malformed():
    inf = native.InflateStream()
    status, _, _ = inf.run(b"\x07", 64)  # btype 3
    assert status == native.InflateStream.MALFORMED
    assert "invalid kind of block" in inf.error
    inf2 = native.InflateStream()
    status, _, _ = inf2.run(b"\x01\x05\x00\x05\x00", 64)
    assert status == native.InflateStream.MALFORMED
    assert "complement" in inf2.error


def test_streaming_inflate_giveback():
    """Whole unconsumed bytes are given back at END (de.ml:1459–1466)."""
    data = b"payload!" * 40
    comp = zlib.compress(data, 6)[2:-4]
    trailer = b"TRAILING"
    inf = native.InflateStream()
    status, consumed, out = inf.run(comp + trailer, len(data) + 16)
    assert status == native.InflateStream.END
    assert out == data
    assert (comp + trailer)[consumed:] == trailer


def test_streaming_inflate_preset_dictionary():
    hist = b"0123456789" * 40
    data = hist[-100:] * 3
    co = zlib.compressobj(6, zlib.DEFLATED, -15, 9, zlib.Z_DEFAULT_STRATEGY, hist)
    comp = co.compress(data) + co.flush()
    inf = native.InflateStream()
    inf.set_dictionary(hist)
    status, _, out = inf.run(comp, len(data) + 16)
    assert status == native.InflateStream.END
    assert out == data


def test_giveback_across_run_boundaries():
    """Regression: END reached with trailer bytes buffered from an
    EARLIER run() call must not underflow the consumed count; the
    buffered bytes come back via takeback()."""
    data = b"A" * 200_000
    comp = zlib.compress(data, 6)[2:-4]
    trailer = b"TRLR9876"
    inf = native.InflateStream()
    stream = comp + trailer
    out = b""
    pos = 0
    while True:
        status, consumed, produced = inf.run(stream[pos:], 65536)  # small dst
        assert consumed <= len(stream) - pos, "consumed underflow"
        pos += consumed
        out += produced
        if status == native.InflateStream.END:
            break
        assert status == native.InflateStream.FLUSH, inf.error
    assert out == data
    given_back = inf.takeback() + stream[pos:]
    assert given_back == trailer


def test_streaming_inflate_giveback_small_o():
    """zl.Inf with a small output window on a large stream (the exact
    failure shape: trailer bytes held across FLUSH boundaries)."""
    import gzip as _gzip

    from decompress_tpu import gz, zl

    data = b"A" * 200_000
    for comp, dec in ((zlib.compress(data, 6), zl.Inf(o_size=65536)),
                      (_gzip.compress(data, 6), gz.Inf(o_size=65536))):
        dec.src(comp)
        dec.src(b"")
        out = b""
        while (tok := dec.decode()) != "end":
            assert tok == "flush", dec.error
            out += dec.flush()
        out += dec.flush()
        assert out == data
