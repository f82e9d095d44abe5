"""zlib/gzip framing vs the stdlib oracles (camlzip/zpipe role,
test.ml:1846+, test/bin/simple.t)."""

import gzip
import io
import zlib

import numpy as np
import pytest

from decompress_tpu import de, gz, zl

SEG = 4096


def test_zlib_roundtrip_both_oracles():
    data = b"zlib framing test " * 300
    ours = zl.deflate(data, 6, segment_size=SEG)
    assert zlib.decompress(ours) == data          # they decode ours
    theirs = zlib.compress(data, 6)
    assert zl.inflate(theirs) == data             # we decode theirs
    assert zl.inflate(ours) == data               # self roundtrip


def test_zlib_header_fields():
    ours = zl.deflate(b"x", 6, segment_size=SEG)
    cmf, flg = ours[0], ours[1]
    assert cmf & 0x0F == 8
    assert (cmf * 256 + flg) % 31 == 0
    assert (flg >> 6) == 2  # FLEVEL for level 6


def test_zlib_malformed():
    with pytest.raises(zl.MalformedError, match="header checksum"):
        zl.inflate(b"\x78\x00" + b"\x03\x00" + b"\x00" * 4)
    good = zl.deflate(b"hello", 6, segment_size=SEG)
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    with pytest.raises(zl.MalformedError, match="checksum"):
        zl.inflate(bytes(bad))
    with pytest.raises(zl.MalformedError, match="end of input"):
        zl.inflate(good[:-2])


def test_gzip_roundtrip_both_oracles():
    data = b"gzip framing test " * 300
    ours = gz.compress(data, 6, segment_size=SEG)
    assert gzip.decompress(ours) == data
    theirs = gzip.compress(data, 6)
    assert gz.decompress(theirs) == data
    assert gz.decompress(ours) == data


def test_gzip_metadata_roundtrip():
    data = b"metadata payload"
    extra = b"AB" + (3).to_bytes(2, "little") + b"xyz" + b"CD" + (1).to_bytes(2, "little") + b"q"
    ours = gz.compress(
        data, 6, segment_size=SEG,
        filename="file.txt", comment="a comment", mtime=1234567,
        os=gz.OS.UNIX, extra=extra, fhcrc=True, text=True,
    )
    # stdlib accepts the full header
    assert gzip.decompress(ours) == data
    payload, meta = gz.decompress_ex(ours)
    assert payload == data
    assert meta.filename == "file.txt"
    assert meta.comment == "a comment"
    assert meta.mtime == 1234567
    assert meta.os == gz.OS.UNIX
    assert meta.text is True
    assert meta.extra_field(b"AB") == b"xyz"
    assert meta.extra_field(b"CD") == b"q"
    assert meta.extra_field(b"ZZ") is None
    # stdlib-produced metadata read back
    bio = io.BytesIO()
    with gzip.GzipFile(filename="n.bin", mode="wb", fileobj=bio, mtime=99) as f:
        f.write(data)
    payload, meta = gz.decompress_ex(bio.getvalue())
    assert payload == data and meta.filename == "n.bin" and meta.mtime == 99


def test_gzip_multi_member():
    a = gz.compress(b"first|", 6, segment_size=SEG)
    b_ = gz.compress(b"second", 6, segment_size=SEG)
    assert gz.decompress(a + b_) == b"first|second"
    assert gzip.decompress(a + b_) == b"first|second"


def test_gzip_malformed():
    good = gz.compress(b"hello world", 6, segment_size=SEG)
    with pytest.raises(gz.MalformedError, match="invalid header"):
        gz.decompress(b"\x1f\x8c" + good[2:])
    bad = bytearray(good)
    bad[-5] ^= 0x01  # corrupt CRC
    with pytest.raises(gz.MalformedError, match="checksum"):
        gz.decompress(bytes(bad))
    bad = bytearray(good)
    bad[-1] ^= 0x01  # corrupt ISIZE
    with pytest.raises(gz.MalformedError, match="size"):
        gz.decompress(bytes(bad))
    with pytest.raises(gz.MalformedError, match="end of input"):
        gz.decompress(good[:-3])


def test_gzip_fhcrc_detects_header_corruption():
    ours = gz.compress(b"x", 6, segment_size=SEG, filename="abc", fhcrc=True)
    bad = bytearray(ours)
    bad[10] ^= 0xFF  # flip a filename byte
    with pytest.raises(gz.MalformedError):
        gz.decompress(bytes(bad))


def test_zlib_preset_dictionary():
    """zdict parity with C zlib both directions (RFC 1950 §2.2 FDICT;
    the reference only records the flag, zl.ml:254/271)."""
    import zlib

    from decompress_tpu import zl

    zdict = b"the quick brown fox jumps over the lazy dog " * 50
    data = b"a lazy dog and the quick brown fox; " * 300 + b"tail"

    c = zlib.compressobj(6, zlib.DEFLATED, 15, 9, 0, zdict)
    comp = c.compress(data) + c.flush()
    assert zl.inflate(comp, zdict=zdict) == data

    ours = zl.deflate(data, 6, zdict=zdict)
    d = zlib.decompressobj(zdict=zdict)
    assert d.decompress(ours) == data
    # the dictionary must actually help (it seeds the match window)
    assert len(ours) < len(zl.deflate(data, 6))

    with pytest.raises(zl.MalformedError):
        zl.inflate(ours, zdict=b"wrong dictionary")
    with pytest.raises(zl.MalformedError):
        zl.inflate(ours)


def test_zlib_streaming_window_carry_multiblock():
    """BASELINE config 3: a zlib stream whose blocks reference bytes
    produced by EARLIER blocks (window carry-over) decodes correctly
    through both our one-shot and streaming decoders."""
    import zlib as _z

    from decompress_tpu import zl
    from decompress_tpu.streaming import TOKEN_AWAIT, TOKEN_END, TOKEN_FLUSH

    base = b"carry-over window material " * 200
    data = base + b"X" * 100 + base  # 2nd copy references across blocks
    c = _z.compressobj(6, _z.DEFLATED, 15)
    stream = b""
    # force multiple blocks with full flushes that keep the window
    stream += c.compress(data[:3000])
    stream += c.flush(_z.Z_FULL_FLUSH)  # window kept, block boundary
    stream += c.compress(data[3000:])
    stream += c.flush()
    assert zl.inflate(stream) == data

    inf = zl.Inf(o_size=777)
    out = bytearray()
    pos = 0
    while True:
        tok = inf.decode()
        if tok == TOKEN_AWAIT:
            chunk = stream[pos : pos + 501]
            pos += len(chunk)
            inf.src(chunk)
        elif tok == TOKEN_FLUSH:
            out += inf.flush()
        elif tok == TOKEN_END:
            out += inf.flush()
            break
        else:
            raise AssertionError(inf.error)
    assert bytes(out) == data
