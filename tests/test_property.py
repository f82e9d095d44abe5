"""Property-based tests (the Crowbar tier, fuzz/fuzz.ml parity).

Strategies mirrored from the reference fuzzers:
- random-bytes inflate equivalence vs zlib (fuzz.ml:82–88)
- random valid command lists → encode → both decoders → triple
  equality (fuzz.ml:113–125, 169–194)
- block-transition matrix (test.ml:911–1135)
- Higher loops over randomly re-chunked streams (fuzz.ml:267–327)
- LZO bidirectional oracle checks (fuzz_lzo.ml:19–39)
"""

import zlib

import numpy as np
import pytest

from decompress_tpu import de, lzo, native, streaming

RNG = np.random.default_rng(20260816)  # deterministic seed (test.ml:2–10)


def random_cmds(rng, n_cmds, lit_bias=0.6):
    cmds, out_len = [], 0
    for _ in range(n_cmds):
        if out_len < 4 or rng.random() < lit_bias:
            cmds.append(de.cmd_literal(int(rng.integers(0, 256))))
            out_len += 1
        else:
            off = int(rng.integers(1, min(out_len, 32768) + 1))
            ln = int(rng.integers(3, 259))
            cmds.append(de.cmd_copy(off, ln))
            out_len += ln
    return cmds


def random_text(rng, n):
    """Compressible-ish data: words from a small alphabet + noise."""
    words = [bytes(rng.integers(97, 123, rng.integers(2, 9), np.uint8)) for _ in range(16)]
    out = bytearray()
    while len(out) < n:
        if rng.random() < 0.85:
            out += words[int(rng.integers(0, 16))] + b" "
        else:
            out += bytes(rng.integers(0, 256, 8, np.uint8))
    return bytes(out[:n])


def test_inflate_equivalence_random_streams():
    """Whatever zlib emits, we decode identically (host + native)."""
    for trial in range(8):
        rng = np.random.default_rng(trial)
        data = random_text(rng, int(rng.integers(1, 30000)))
        level = int(rng.integers(0, 10))
        strategy = [zlib.Z_DEFAULT_STRATEGY, zlib.Z_FIXED, zlib.Z_RLE][trial % 3]
        co = zlib.compressobj(level, zlib.DEFLATED, -15, 9, strategy)
        comp = co.compress(data) + co.flush()
        assert de.inflate(comp) == data
        inf = native.InflateStream()
        status, _, out = inf.run(comp, len(data) + 64)
        assert status == native.InflateStream.END and out == data


def test_command_list_triple_equality():
    for trial in range(6):
        rng = np.random.default_rng(100 + trial)
        cmds = random_cmds(rng, int(rng.integers(1, 400)))
        expect = de.reconstruct(cmds)
        stream = de.encode_commands(cmds, block=("fixed" if trial % 2 else "dynamic"))
        assert zlib.decompressobj(-15).decompress(stream) == expect
        assert de.inflate(stream) == expect


def test_block_transition_matrix():
    """dynamic+fixed / fixed+dynamic / dynamic+dynamic / with stored
    neighbours (reference test.ml:911–1135)."""
    rng = np.random.default_rng(7)
    a = random_cmds(rng, 120)
    b = random_cmds(rng, 80, lit_bias=0.9)
    expect_parts = [de.reconstruct(a), de.reconstruct(b)]
    for k1 in ("fixed", "dynamic"):
        for k2 in ("fixed", "dynamic"):
            stream = de.encode_blocks([(a, k1), (b, k2)])
            joined = de.reconstruct(a + b)  # copies may cross blocks? no:
            # reconstruct treats the list independently; block b's copies
            # reference only its own history here because random_cmds
            # bounds offsets by its own out_len — decode result is the
            # concatenation with b's copies resolving inside b's output.
            got = zlib.decompressobj(-15).decompress(stream)
            assert got == de.inflate(stream)
            assert got[: len(expect_parts[0])] == expect_parts[0], (k1, k2)


def test_roundtrip_rechunked_streams():
    """Higher-style loops with adversarial chunk boundaries."""
    import io

    rng = np.random.default_rng(9)
    data = random_text(rng, 40000)
    for trial in range(3):
        # random split points for both input and compressed stream
        enc = streaming.Deflate(level=6, segment_size=4096)
        comp = b""
        pos = 0
        while pos < len(data):
            step = int(rng.integers(1, 7000))
            comp += enc.push(data[pos : pos + step])
            pos += step
        comp += enc.finish()
        inf = streaming.Inflate(o_size=int(rng.integers(100, 5000)))
        out = b""
        fpos = 0
        while True:
            tok = inf.decode()
            if tok == "await":
                step = int(rng.integers(1, 900))
                inf.src(comp[fpos : fpos + step] if fpos < len(comp) else b"")
                fpos += step
            elif tok == "flush":
                out += inf.flush()
            elif tok == "end":
                out += inf.flush()
                break
            else:
                raise AssertionError(inf.error)
        assert out == data


def test_lzo_property_roundtrips():
    for trial in range(6):
        rng = np.random.default_rng(200 + trial)
        kind = trial % 3
        if kind == 0:
            data = random_text(rng, int(rng.integers(1, 20000)))
        elif kind == 1:
            data = rng.integers(0, 256, int(rng.integers(1, 8000)), np.uint8).tobytes()
        else:
            data = bytes(rng.integers(0, 4, int(rng.integers(1, 20000)), np.uint8))
        ours = lzo.compress(data)
        assert lzo.uncompress(ours) == data
        if native.available():
            assert native.lzo1x_decompress(ours, len(data) + 16) == data
            theirs = native.lzo1x_compress(data)
            assert lzo.uncompress(theirs) == data


def test_window_seeded_inflate():
    """Preset-dictionary decode parity (unsafe_set_cursor role,
    de.ml:1826)."""
    rng = np.random.default_rng(31)
    hist = random_text(rng, 2000)
    data = hist[-700:] * 2 + b"tail"
    co = zlib.compressobj(6, zlib.DEFLATED, -15, 9, zlib.Z_DEFAULT_STRATEGY, hist)
    comp = co.compress(data) + co.flush()
    assert de.inflate(comp, window=np.frombuffer(hist, np.uint8)) == data
