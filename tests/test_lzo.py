"""LZO1X codec tests (reference suite parity: test_lzo.ml, fuzz_lzo.ml)."""

import numpy as np
import pytest

from decompress_tpu import lzo


def test_golden_literal_only_stream():
    """128 random literals + end marker (reference test_lzo_0 vector)."""
    rng = np.random.default_rng(9)
    payload = rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
    stream = bytes([0x91]) + payload + bytes([0x11, 0x00, 0x00])
    assert lzo.uncompress(stream) == payload


def test_end_marker_only():
    assert lzo.uncompress(bytes([0x11, 0x00, 0x00])) == b""
    assert lzo.compress(b"") == bytes([0x11, 0x00, 0x00])


def test_malformed():
    with pytest.raises(lzo.LzoError):
        lzo.uncompress(b"")
    with pytest.raises(lzo.LzoError):
        lzo.uncompress(bytes([0x91]))  # truncated literal run
    with pytest.raises(lzo.LzoError):
        # match referencing before start of output
        lzo.uncompress(bytes([0x12, 0x01, 0x00, 0x00]))
    with pytest.raises(lzo.LzoError):
        lzo.uncompress(bytes([0x00, 0x00, 0x11, 0x00, 0x00]))


def _roundtrip(data: bytes, level: int = 6) -> bytes:
    comp = lzo.compress(data, level=level)
    out = lzo.uncompress(comp)
    assert out == data, f"roundtrip mismatch: {len(out)} vs {len(data)}"
    return comp


def test_roundtrip_small():
    _roundtrip(b"Salut les copains!")  # reference test_lzo_1 input
    _roundtrip(b"a")
    _roundtrip(b"ab")
    _roundtrip(b"abc")
    _roundtrip(b"aaaa")
    _roundtrip(b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")


def test_roundtrip_patterns():
    _roundtrip(b"\x00" * 10000)
    _roundtrip(b"abcabcabc" * 1000)
    _roundtrip((b"x" * 239))        # long first literal run boundary
    _roundtrip((b"x" * 238))
    rng = np.random.default_rng(1)
    _roundtrip(rng.integers(0, 256, 5000, dtype=np.uint8).tobytes())
    # mixed compressible / incompressible
    _roundtrip(b"hello world " * 500 + rng.integers(0, 256, 3000, np.uint8).tobytes())


def test_roundtrip_corpus(small_corpus):
    for name, data in small_corpus:
        comp = _roundtrip(data)
        assert len(comp) < len(data), name


def test_uncompress_with_buffer():
    comp = lzo.compress(b"growable output " * 100)
    assert lzo.uncompress_with_buffer(comp) == b"growable output " * 100


def test_wrkmem_api():
    wm = lzo.make_wrkmem()
    a = lzo.compress(b"data data data", wm)
    b = lzo.compress(b"data data data", wm)
    assert a == b
