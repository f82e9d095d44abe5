"""One-shot DEFLATE encode/decode tests against the zlib oracle.

Parity with the reference corpus roundtrips (test_deflate.ml:19–120)
and oracle strategy (fuzz/fuzz.ml:82–88, 169–194: "their" zlib decodes
"our" output and vice versa).
"""

import zlib

import numpy as np
import pytest

from decompress_tpu import de

SEG = 4096  # small segment: fast compiles in CI; production uses 128 KiB


def _zlib_raw_inflate(comp: bytes) -> bytes:
    d = zlib.decompressobj(-15)
    out = d.decompress(comp)
    assert d.eof, "stream not terminated"
    return out


def _roundtrip(data: bytes, level: int = 6) -> bytes:
    comp = de.deflate(data, level, segment_size=SEG)
    assert _zlib_raw_inflate(comp) == data
    # our own host inflate must agree too
    assert de.inflate(comp) == data
    return comp


def test_empty_and_tiny():
    assert _zlib_raw_inflate(de.deflate(b"")) == b""
    _roundtrip(b"a")
    _roundtrip(b"abc")
    _roundtrip(b"aaaaaaaaaaaaaaaaaaaaaaaaa")


def test_stored_level0():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=200_000, dtype=np.uint8).tobytes()
    comp = de.deflate(data, 0)
    assert _zlib_raw_inflate(comp) == data
    assert len(comp) < len(data) + 5 * 4 + 10


def test_incompressible_falls_back_to_stored():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=30_000, dtype=np.uint8).tobytes()
    comp = _roundtrip(data, 6)
    # one 5-byte stored header per segment
    assert len(comp) <= len(data) + 5 * (len(data) // SEG + 2)


def test_text_levels():
    data = (b"the quick brown fox jumps over the lazy dog. " * 400)[:17000]
    for level in (1, 6, 9):
        comp = _roundtrip(data, level)
        assert len(comp) < len(data) // 4


def test_multi_segment_with_history():
    """Matches must be able to reference the previous segment."""
    rng = np.random.default_rng(2)
    block = rng.integers(0, 256, size=3000, dtype=np.uint8).tobytes()
    data = block * 5  # repeats crossing segment boundaries
    comp = _roundtrip(data, 6)
    # cross-segment matches make later copies nearly free
    assert len(comp) < len(block) + 0.2 * len(block) * 4


def test_runs_rle():
    data = b"\x00" * 50_000 + b"ab" * 10_000 + b"xyz" * 5_000
    comp = _roundtrip(data, 6)
    assert len(comp) < 600


def test_corpus_ratio_close_to_zlib(small_corpus):
    for name, data in small_corpus:
        comp = de.deflate(data, 6, segment_size=SEG)
        assert _zlib_raw_inflate(comp) == data, name
        z6 = len(zlib.compress(data, 6)) - 6
        # small segments cost some ratio; production target is <= zlib
        assert len(comp) <= z6 * 1.08, (name, len(comp), z6)


def test_inflate_foreign_streams():
    """Our inflate decodes arbitrary zlib-produced streams (all strategies)."""
    rng = np.random.default_rng(3)
    base = (b"abcabcabc" * 500) + rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
    for strategy in (zlib.Z_DEFAULT_STRATEGY, zlib.Z_FIXED, zlib.Z_RLE, zlib.Z_HUFFMAN_ONLY):
        for level in (1, 6, 9):
            co = zlib.compressobj(level, zlib.DEFLATED, -15, 9, strategy)
            comp = co.compress(base) + co.flush()
            assert de.inflate(comp) == base, (strategy, level)


def test_inflate_stored_foreign():
    co = zlib.compressobj(0, zlib.DEFLATED, -15)
    data = b"stored block payload" * 100
    comp = co.compress(data) + co.flush()
    assert de.inflate(comp) == data


def test_inflate_malformed():
    with pytest.raises(de.MalformedError, match="kind of block"):
        de.inflate(b"\x07")  # btype 3
    with pytest.raises(de.MalformedError, match="complement"):
        de.inflate(b"\x01\x05\x00\x05\x00")  # NLEN mismatch
    with pytest.raises(de.MalformedError, match="end of input"):
        de.inflate(b"\x01\x05\x00\xfa\xff\x00")  # truncated stored payload
    with pytest.raises(de.MalformedError, match="distance"):
        # fixed block, literal 'a', then a match with dist > output size
        from decompress_tpu.core import bitstream, huffman, tables
        codes = huffman.canonical_codes(tables.FIXED_LIT_LENGTHS)
        lens = tables.FIXED_LIT_LENGTHS
        dcodes = huffman.canonical_codes(tables.FIXED_DIST_LENGTHS)
        w = bitstream.BitWriter()
        w.write(1, 1); w.write(1, 2)
        w.write(int(codes[97]), int(lens[97]))
        w.write(int(codes[257]), int(lens[257]))  # length 3
        w.write(int(dcodes[20]), 5)  # dist base 1025 > 1 byte of output
        w.write(0, 9)
        w.write(int(codes[256]), int(lens[256]))
        de.inflate(w.getvalue())


def test_cmd_packing_parity():
    """De.Queue packing parity (de.ml:2245–2252)."""
    assert de.cmd_literal(0x41) == 0x41
    c = de.cmd_copy(1, 3)
    assert c == 0x2000000
    assert de.cmd_unpack(c) == ("copy", (1, 3))
    assert de.cmd_unpack(de.cmd_copy(32768, 258)) == ("copy", (32768, 258))
    assert de.cmd_unpack(de.CMD_EOB) == ("end", None)
    assert de.cmd_unpack(de.cmd_literal(200)) == ("literal", 200)


def test_segment_boundary_sizes():
    """Exact batch/segment boundary inputs exercise the tail-batch
    paths (full batch, +1, pow2 tails)."""
    rng = np.random.default_rng(99)
    base = (b"boundary case payload " * 4000)
    for n in (SEG - 1, SEG, SEG + 1, 8 * SEG, 8 * SEG + 1, 9 * SEG + 7):
        data = base[:n] if n <= len(base) else (base * (n // len(base) + 1))[:n]
        comp = de.deflate(data, 6, segment_size=SEG)
        assert _zlib_raw_inflate(comp) == data, n


def test_inflate_into_parity():
    """Inf.Ns caller-buffer signature (de.ml:1807–1822)."""
    data = b"into buffer " * 300
    comp = de.deflate(data, 6, segment_size=SEG)
    dst = np.zeros(len(data) + 16, np.uint8)
    consumed, produced = de.inflate_into(comp, dst)
    assert consumed == len(comp) and produced == len(data)
    assert dst[:produced].tobytes() == data
    small = np.zeros(10, np.uint8)
    with pytest.raises(de.MalformedError, match="output"):
        de.inflate_into(comp, small)


def test_mark_path_hybrid_equivalence():
    """Hybrid (doubling+scan) parse == full pointer-doubling == a serial
    walk, on random jump graphs of both parse-domain shapes."""
    import jax.numpy as jnp

    from decompress_tpu.ops import lz77

    rng = np.random.default_rng(7)
    for levels, c in [(13, 6), (13, 8), (10, 8), (8, 8)]:
        p = 1 << levels
        step = np.where(rng.random(p) < 0.6, rng.integers(3, 258, p), 1)
        g = np.minimum(np.arange(p) + step, p - 1).astype(np.int32)
        full = np.asarray(lz77._mark_path(jnp.asarray(g), levels))
        hyb = np.asarray(lz77._mark_path_hybrid(jnp.asarray(g), levels, c))
        truth = np.zeros(p, bool)
        i = 0
        while i < p - 1:
            truth[i] = True
            i = g[i]
        truth[p - 1] = True
        assert (full == truth).all()
        assert (hyb == truth).all()


def test_compress_bound():
    """compress_bound parity (Def.Ns, de.ml:3993–3996): output never
    exceeds the bound at any level, including incompressible input."""
    rng = np.random.default_rng(11)
    for n in (0, 1, 100, 65535, 65536, 200000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for level in (0, 1, 6, 9):
            comp = de.deflate(data, level, segment_size=SEG)
            assert len(comp) <= de.compress_bound(n, SEG), (n, level, len(comp))


def test_restricted_window_bits():
    """window_bits 8..15 (make_window ~bits parity, de.ml:331–333):
    streams decode correctly with a matching small zlib window — the
    oracle rejects distances beyond 2^bits, so success proves the
    matcher honoured the restriction."""
    from decompress_tpu import zl

    data = (b"the quick brown fox jumps over the lazy dog " * 400
            + bytes(range(256)) * 20
            + b"the quick brown fox jumps over the lazy dog " * 400)
    for bits in (8, 9, 12, 15):
        comp = de.deflate(data, 6, segment_size=SEG, window_bits=bits)
        d = zlib.decompressobj(-bits)
        out = d.decompress(comp)
        assert d.eof and out == data, bits
        zcomp = zl.deflate(data, 6, segment_size=SEG, window_bits=bits)
        assert zcomp[0] == 0x08 | ((bits - 8) << 4)
        assert zlib.decompressobj(bits).decompress(zcomp) == data
        # our own decoders accept them too
        assert de.inflate(comp) == data
        assert zl.inflate(zcomp) == data
    with pytest.raises(ValueError):
        de.deflate(data, 6, window_bits=7)


def test_strategies():
    """Z_RLE / Z_HUFFMAN_ONLY / Z_FIXED analogues (zlib strategy parity
    beyond the reference's dynamic knob)."""
    rng = np.random.default_rng(1)
    runs = b"aaaaabbbbbbcccc" * 500 + rng.integers(0, 256, 1000, np.uint8).tobytes()
    for strat in ("rle", "huffman_only", "fixed"):
        comp = de.deflate(runs, 6, segment_size=SEG, strategy=strat)
        d = zlib.decompressobj(-15)
        assert d.decompress(comp) == runs and d.eof, strat
    # rle emits only tiny distances: decodes with a 256-byte window
    comp = de.deflate(runs, 6, segment_size=SEG, strategy="rle")
    assert zlib.decompressobj(-8).decompress(comp) == runs
    # huffman_only emits no matches at all: stream has no distance syms
    comp = de.deflate(b"abcabcabc" * 200, 6, segment_size=SEG,
                      strategy="huffman_only")
    assert zlib.decompressobj(-8).decompress(comp) == b"abcabcabc" * 200
    with pytest.raises(ValueError):
        de.deflate(b"x", 6, strategy="nope")


def test_hot_stride_candidates():
    """Two-round levels mine structural match distances (e.g. image row
    strides) that the depth-K bucket search can't reach inside giant
    equal-content buckets; strided data must compress at least as well
    as zlib-9 (pic-shaped synthetic: long zero runs + a periodic row
    pattern at stride 211)."""
    rng = np.random.default_rng(4)
    row = bytes(rng.integers(0, 4, 211, dtype=np.uint8))
    data = (b"\0" * 97 + row) * 400  # period 308 (> 4, > K)
    # default segment: the whole input is one block, so the comparison
    # isn't dominated by per-segment header amortization
    comp = de.deflate(data, 9)
    assert _zlib_raw_inflate(comp) == data
    z9 = len(zlib.compress(data, 9)) - 6
    assert len(comp) <= z9 * 1.05, (len(comp), z9)
    # ablation: the same config with mining disabled must never beat
    # the mined one (since round 4, level 6's own two-round parse also
    # mines, so the old "level 9 < level 6" separation is gone — the
    # bucket search finds this stride too; the ablation pins the lane)
    from decompress_tpu.ops import lz77 as lz77_ops

    lz77_ops.LEVELS[80] = lz77_ops.LevelConfig(
        64, True, two_round=True, top2=True, hash3=True, mine=False)
    comp_nomine = de.deflate(data, 80)
    assert _zlib_raw_inflate(comp_nomine) == data
    assert len(comp) <= len(comp_nomine)
    comp6 = de.deflate(data, 6)
    assert len(comp6) <= z9 * 1.05


def test_decode_window_restriction():
    """Decode-side window negotiation (zl.ml:247–280: the inflate
    window is allocated from CINFO): a stream whose distances exceed
    the negotiated window fails with "invalid distance"."""
    from decompress_tpu.de import MalformedError

    data = b"A" * 300 + b"unique-seed-text" + b"B" * 1000 + b"unique-seed-text"
    comp = de.deflate(data, 6, segment_size=SEG)  # dist > 256 certain
    assert de.inflate(comp) == data
    for path in ("native", "python"):
        kw = {"window_bits": 8}
        if path == "python":
            got = None
            try:
                de._inflate_python(comp, **kw)
            except MalformedError as e:
                got = str(e)
        else:
            got = None
            try:
                de.inflate(comp, **kw)
            except MalformedError as e:
                got = str(e)
        assert got == "invalid distance", (path, got)
    # a small-window stream decodes under its own restriction
    comp8 = de.deflate(data, 6, segment_size=SEG, window_bits=8)
    assert de.inflate(comp8, window_bits=8) == data
    assert de._inflate_python(comp8, window_bits=8)[0] == data

    # zlib framing: CINFO too small for the stream's distances
    body = de.deflate(data, 6, segment_size=SEG)
    cmf = 0x08  # CINFO=0 -> 256-byte window
    flg = (31 - (cmf * 256) % 31) % 31
    stream = bytes([cmf, flg]) + body + zlib.adler32(data).to_bytes(4, "big")
    from decompress_tpu import zl as _zl
    with pytest.raises(MalformedError, match="invalid distance"):
        _zl.inflate(stream)
    # and a well-formed small-window zlib stream still decodes
    z8 = _zl.deflate(data, 6, segment_size=SEG, window_bits=8)
    assert _zl.inflate(z8) == data


def test_fixed_strategy_keeps_stored_blocks():
    """Z_FIXED parity: forbidding dynamic trees does not forbid stored
    blocks, so incompressible data stays within compress_bound()."""
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 40000, np.uint8).tobytes()
    comp = de.deflate(data, 6, segment_size=SEG, dynamic=False)
    assert _zlib_raw_inflate(comp) == data
    assert len(comp) <= de.compress_bound(len(data), SEG)
    # compressible data under dynamic=False still emits fixed blocks
    comp2 = de.deflate(b"hello world " * 500, 6, segment_size=SEG, dynamic=False)
    assert _zlib_raw_inflate(comp2) == b"hello world " * 500
    assert len(comp2) < len(b"hello world " * 500) // 2


def test_levels_10_12():
    """Levels 10–12 accepted (reference Ns level table de.ml:3929–3943);
    deeper search never loses to level 9 on repetitive input."""
    data = (b"abcdefgh" * 300 + bytes(range(256)) + b"abcdefgh" * 100)[:4000]
    base = len(de.deflate(data, 9, segment_size=1024))
    for lvl in (10, 12):
        comp = de.deflate(data, lvl, segment_size=1024)
        assert _zlib_raw_inflate(comp) == data
        assert len(comp) <= base + 16, (lvl, len(comp), base)
