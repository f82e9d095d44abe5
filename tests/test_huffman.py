"""Core Huffman machinery tests.

Parity targets: reference huffman golden test (test.ml:1192–1237), table
construction semantics (de.ml:523–638), canonical codes (de.ml:1910–1950).
"""

import numpy as np
import pytest

from decompress_tpu.core import bitstream, huffman, tables


def _roundtrip_codes(lengths, root_bits):
    """Every symbol's canonical code must decode back to the symbol."""
    codes = huffman.canonical_codes(lengths)
    dt = huffman.build_decode_table(np.asarray(lengths), root_bits)
    for s, (l, c) in enumerate(zip(lengths, codes)):
        if l == 0:
            continue
        # place the code in the low bits, pad the rest with ones (worst case)
        peek = int(c) | (((1 << 15) - 1) >> l << l)
        sym, nbits = huffman.decode_one(dt, peek)
        assert sym == s, f"symbol {s} decoded as {sym}"
        assert nbits == l


def test_fixed_literal_tree_rfc_golden():
    """RFC 1951 §3.2.6 fixed code assignment, exact values."""
    codes = huffman.canonical_codes(tables.FIXED_LIT_LENGTHS)
    # canonical MSB-first codes per the RFC: sym 0 -> 00110000 (0x30)
    # reversed LSB-first: 0x0C
    assert codes[0] == 0x0C
    # sym 256 -> 0000000 (7 bits) -> reversed 0
    assert codes[256] == 0
    # sym 144 -> 110010000 (0x190, 9 bits) -> reversed: 000100 11 1 -> compute
    def rev(v, n):
        return int(bin(v)[2:].zfill(n)[::-1], 2)
    assert codes[144] == rev(0x190, 9)
    assert codes[280] == rev(0xC0, 8)
    _roundtrip_codes(tables.FIXED_LIT_LENGTHS, huffman.ROOT_BITS_LENS)
    _roundtrip_codes(tables.FIXED_DIST_LENGTHS, huffman.ROOT_BITS_DISTS)


def test_lengths_from_freqs_complete_and_limited():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(2, 286))
        freqs = rng.integers(0, 1000, size=n)
        freqs[rng.integers(0, n)] = 0
        lengths = huffman.code_lengths_from_frequencies(freqs)
        assert huffman.kraft_slack(lengths) == 0
        assert lengths.max() <= 15
        assert np.all((lengths > 0) == (freqs > 0)) or np.sum(freqs > 0) < 2
        _roundtrip_codes(lengths, huffman.ROOT_BITS_LENS)


def test_overflow_redistribution_fibonacci():
    """Fibonacci frequencies force code lengths deep beyond 15."""
    n = 40
    freqs = np.zeros(n, dtype=np.int64)
    a, b = 1, 1
    for i in range(n):
        freqs[i] = a
        a, b = b, a + b
    lengths = huffman.code_lengths_from_frequencies(freqs)
    assert lengths.max() == 15
    assert huffman.kraft_slack(lengths) == 0
    # optimality sanity: weighted length no worse than a balanced tree
    assert np.sum(freqs * lengths) < np.sum(freqs) * np.ceil(np.log2(n))
    _roundtrip_codes(lengths, huffman.ROOT_BITS_LENS)


def test_degenerate_trees():
    # zero symbols
    l0 = huffman.code_lengths_from_frequencies(np.zeros(30, dtype=np.int64))
    assert huffman.kraft_slack(l0) == 0
    # one symbol: padded to two 1-bit codes
    f = np.zeros(30, dtype=np.int64)
    f[7] = 42
    l1 = huffman.code_lengths_from_frequencies(f)
    assert l1[7] == 1 and huffman.kraft_slack(l1) == 0


def test_invalid_trees_rejected():
    with pytest.raises(huffman.InvalidTree):
        huffman.build_decode_table(np.array([1, 1, 1]), 7)  # oversubscribed
    with pytest.raises(huffman.InvalidTree):
        huffman.build_decode_table(np.array([1, 0, 0, 2]), 7)  # incomplete
    # incomplete single-code distance tree is legal (de.ml:601–612)
    dt = huffman.build_decode_table(
        np.array([1, 0, 0]), 6, allow_incomplete=True
    )
    assert huffman.decode_one(dt, 0)[0] == 0
    assert huffman.decode_one(dt, 1)[0] == -1  # the missing branch


def test_two_level_table_long_codes():
    """Codes longer than root_bits go through link entries."""
    rng = np.random.default_rng(1)
    freqs = np.concatenate([[10**9, 10**8], rng.integers(1, 5, size=200)])
    lengths = huffman.code_lengths_from_frequencies(freqs)
    assert lengths.max() > huffman.ROOT_BITS_LENS  # exercise subtables
    _roundtrip_codes(lengths, huffman.ROOT_BITS_LENS)


def test_dist_and_length_code_maps():
    for d in [1, 2, 3, 4, 5, 6, 24, 25, 256, 257, 384, 385, 24576, 24577, 32768]:
        code = int(tables.dist_to_code(np.array([d]))[0])
        base = int(tables.DIST_BASE[code])
        extra = int(tables.DIST_EXTRA[code])
        assert base <= d < base + (1 << extra), d
    for l in range(3, 259):
        code = int(tables.length_to_code(np.array([l]))[0])
        base = int(tables.LENGTH_BASE[code])
        extra = int(tables.LENGTH_EXTRA[code])
        if l == 258:
            assert code == 28
        else:
            assert base <= l < base + (1 << extra), l


def test_pack_bits_vs_bitwriter():
    rng = np.random.default_rng(2)
    nbits = rng.integers(1, 17, size=1000)
    values = rng.integers(0, 1 << 16, size=1000) & ((1 << nbits) - 1)
    packed, total = bitstream.pack_bits(values, nbits)
    assert total == nbits.sum()
    w = bitstream.BitWriter()
    for v, n in zip(values, nbits):
        w.write(int(v), int(n))
    assert w.getvalue() == packed.tobytes()


def test_bitreader_roundtrip():
    rng = np.random.default_rng(3)
    nbits = rng.integers(1, 17, size=500)
    values = rng.integers(0, 1 << 16, size=500) & ((1 << nbits) - 1)
    packed, _ = bitstream.pack_bits(values, nbits)
    r = bitstream.BitReader(packed.tobytes())
    for v, n in zip(values, nbits):
        assert r.read(int(n)) == int(v)


def test_bitwriter_write_packed_unaligned():
    rng = np.random.default_rng(4)
    for lead in range(0, 9):
        nbits = rng.integers(1, 17, size=64)
        values = rng.integers(0, 1 << 16, size=64) & ((1 << nbits) - 1)
        packed, total = bitstream.pack_bits(values, nbits)
        w = bitstream.BitWriter()
        w.write((1 << lead) - 1, lead)
        w.write_packed(packed, total)
        w.write(0x2A, 7)
        ref = bitstream.BitWriter()
        ref.write((1 << lead) - 1, lead)
        for v, n in zip(values, nbits):
            ref.write(int(v), int(n))
        ref.write(0x2A, 7)
        assert w.getvalue() == ref.getvalue(), lead


def test_device_table_build_matches_host(small_corpus):
    """build_fused_tables (device scatter+cummax) must decode every
    canonical code identically to the host two-level tables, for real
    dynamic trees from corpus blocks and for randomized trees."""
    import jax.numpy as jnp
    import numpy as np

    from decompress_tpu.core import huffman, tables
    from decompress_tpu.ops import inflate as iops

    rng = np.random.default_rng(11)

    def check(lit_lens, dist_lens):
        ll = np.zeros((1, 288), np.int32)
        ll[0, : lit_lens.size] = lit_lens
        dl = np.zeros((1, 32), np.int32)
        dl[0, : dist_lens.size] = dist_lens
        lit, dist = iops.build_fused_tables(jnp.asarray(ll), jnp.asarray(dl))
        lit = np.asarray(lit)[0]
        codes = huffman.canonical_codes(np.asarray(lit_lens, np.int32))
        for sym in np.flatnonzero(lit_lens):
            if sym > 285:
                continue  # fixed-tree symbols 286/287: deliberately invalid
            l = int(lit_lens[sym])
            rev = int(codes[sym])  # bit-reversed (LSB-first) code
            # forward index = reverse of the l code bits, left-aligned
            fwd = int(f"{rev:0{l}b}"[::-1], 2) << (15 - l)
            e = lit[fwd]
            kind = e >> 15
            nb = (e >> 11) & 15
            payload = e & 0xFF
            assert nb == l, (sym, nb, l)
            if sym < 256:
                assert kind == 1 and payload == sym
            elif sym == 256:
                assert kind == 3
            else:
                assert kind == 2
                assert payload + 3 == int(tables.LENGTH_BASE[sym - 257])

    # the fixed trees
    check(tables.FIXED_LIT_LENGTHS, tables.FIXED_DIST_LENGTHS)
    # randomized valid trees from frequency draws
    for _ in range(5):
        freqs = rng.integers(0, 50, 286).astype(np.int64)
        freqs[256] = max(1, freqs[256])
        ll = huffman.code_lengths_from_frequencies(freqs)
        dfreq = rng.integers(0, 20, 30).astype(np.int64)
        dlns = huffman.code_lengths_from_frequencies(dfreq)
        dl32 = np.zeros(32, np.int32)
        dl32[:30] = dlns
        check(ll, dl32)
