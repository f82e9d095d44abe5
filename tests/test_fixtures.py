"""Frozen fuzz-regression fixtures and golden bitstreams.

The reference carries its crowbar findings as golden tests
(fuzz0–fuzz18, test/test.ml:302–783, mirrored test_ns.ml:625–1075) plus
golden valid-stream byte fixtures (test.ml:204–302).  The byte strings
below are the reference's TEST DATA (inputs/outputs transcribed from
test.ml); every valid stream is additionally validated against the C
zlib oracle in the same assertion, so a transcription slip cannot pass
silently.

Decode-side fixtures run through both our decoders (native state
machine + pure-Python); encode-side regressions (fuzz10/11/12/16/17 —
command lists that once broke the reference's dynamic tree/RLE
construction) run through our dynamic_of_frequencies + Def encoder and
must decode identically under zlib and our inflate.
"""

import zlib

import numpy as np
import pytest

from decompress_tpu import de, streaming
from decompress_tpu.core import tables
from decompress_tpu.de import MalformedError


def _inflate_both(comp: bytes) -> bytes:
    """Decode with the native machine and the Python reference decoder;
    they must agree."""
    out_native = de.inflate(comp)
    out_py, _ = de._inflate_python(comp)
    assert out_native == out_py
    return out_native


def _check_valid(comp: bytes, expect: bytes) -> None:
    # C-zlib oracle first: catches fixture transcription errors
    d = zlib.decompressobj(-15)
    assert d.decompress(comp) == expect
    assert _inflate_both(comp) == expect


def _check_malformed(comp: bytes, message: str) -> None:
    for fn in (de.inflate, lambda b: de._inflate_python(b)):
        with pytest.raises(MalformedError) as ei:
            fn(comp)
        assert str(ei.value) == message, (str(ei.value), message)


# -- golden valid streams (test.ml:204–302) --


def test_golden_fixed_empty():
    _check_valid(b"\x03\x00", b"")


def test_golden_stored():
    _check_valid(b"\x01\x01\x00\xfe\xff\x00", b"\x00")


def test_golden_length_extra():
    _check_valid(
        b"\xed\xc0\x01\x01\x00\x00\x00\x40\x20\xff\x57\x1b\x42\x2c\x4f",
        b"\x00" * 516)


def test_golden_long_distance_and_extra():
    _check_valid(
        b"\xed\xcf\xc1\xb1\x2c\x47\x10\xc4\x30\xfa\x6f\x35\x1d\x01\x82"
        b"\x59\x3d\xfb\xbe\x2e\x2a\xfc\x0f\x0c",
        b"\x00" * 518)


def test_golden_window_end():
    _check_valid(
        b"\xed\xc0\x81\x00\x00\x00\x00\x80\xa0\xfd\xa9\x17\xa9\x00\x00"
        b"\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00"
        b"\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00"
        b"\x06",
        b"\x00" * 33025)


def test_golden_flat_of_string():
    _check_valid(b"\x01\x00\x00\xff\xff", b"")


def test_golden_flat_block():
    _check_valid(b"\x01\x04\x00\xfb\xff\xde\xad\xbe\xef", b"\xde\xad\xbe\xef")


# -- decode-side fuzz regressions (test.ml:302–783) --


def test_fuzz0():
    comp = (b"{\xdc\n s\x11\x1b\xd3\\\x06\xd3w\xb0`\x8e\xc87\x9coZBo"
            b"\xa3\x88\x11\xf7\x9e\xf7\x0ce\xf1\xeasn_$\xd2\xdf\x11"
            b"\xd5\x8a\x93]\x81M\x89<\xf2\xba7\x15c\xc2\x9c\x87\xc2"
            b"\xa7-wo\x06\xc8\xc6")
    d = zlib.decompressobj(-15)
    assert d.decompress(comp) == b"\xe3\x85"
    assert _inflate_both(comp[: len(comp) - len(d.unused_data)]) == b"\xe3\x85"


def test_fuzz1():
    comp = b"\x13\xd0nO\xc8\xbdr\x14\xb0"
    _check_valid(comp, b"\x10+\x87`m\xd4\xc5")


def test_fuzz2():
    comp = b"\x93\x3a\x55\x47\x12\x80\x51\x56\x3a\x01\x00\x00"
    _check_valid(comp, b"\x1a\xca" + b"\x7e" * 54 + b"\x3a\x2c\x50")


def test_fuzz3():
    comp = b"\x93\x3a\x55\x47\x12\x3a\x51\x36\x0a\x01\x00\x00"
    _check_valid(comp, b"\x1a\xca\x7e" * 16 + b"\xc8\x76" * 130)


def test_fuzz4():
    comp = b"\x93\x3a\x55\x47\x12\x3a\x51\x56\x0a\x06\x80\x00"
    _check_valid(comp, b"\x1a\xca\x7e" * 16 + b"\xc8\x76" + b"\x75" * 6)


def test_fuzz5():
    comp = (b"\x93\x3a\x55\x01\x01\x01\x01\xe6\x01\x01\x01\x01\x01\x01"
            b"\x01\x01\x01\x01\x01\x01\x01\x00\x00")
    _check_valid(comp,
                 b"\x1a\xca" + b"\x78" * 7 + b"\x50\x50\x37" + b"\x50" * 13)


def test_fuzz6():
    comp = b"\x93\x8c\x8c\x8c\x8c\x7b\x8c\x8c\x8c\x01\x00\x00"
    _check_valid(comp, b"\x19\x59\x59\x59" + b"\x5e\xe3\x59" * 4 + b"\x5e\xe3\x33")


def test_fuzz7():
    comp = b"\x93\x3a\x55\x69\x12\x3a\x3f\x10\x08\x01\x00\x00"
    _check_valid(comp, b"\x1a\xca\x79\x34\x55\x9f\x51\x9f\x51\x9f")


def test_fuzz8():
    _check_malformed(b"\x7a\x37\x6d\x99\x13", "unexpected end of input")


def test_fuzz9():
    comp = (b"\x9b\x01\x95\xfc\x51\xd2\xed\xc8\xce\xc8\xff\x80\x00\x00"
            b"\x7f\xff\x79\x2f\xe9\x51\x88\x7b\xb8\x2f\xef\xa5\x8c\xf8"
            b"\xf1\xb6\xce\xc8\xb8\xc8\xff\x2f\x00\x7f\x88\x7b\xbc")
    _check_malformed(comp, "invalid distance")


def test_fuzz13():
    _check_valid(b"\x9b\x0e\x02\x00", b"\x97" * 5)


def test_fuzz14():
    comp = (b"\x0b\xff\x7f\x0c\x0c\x8f\xcd\x0e\x02\x21\x64\x0c\x04\x73"
            b"\xff\x80\x20\x0c\x8f\x1c\x1c\x1c\x1c\x0c\x0c\x0c\x0c\x64"
            b"\x1c\x7f\x0c\x0c\x8f\xcd\x0e\x02\x21\xff\xff\x80")
    expect = (b"\x57\xff\xc6\xff\xc6\xff\xc6\xff\xc6\x9b\x52\xc6\x9b\x52"
              b"\xc6\xc6\x9b\x52\xc6\xc6\x9b\x52\xc6\xc6\x9b\x52\xc6\xc6"
              b"\xc6\xc6" + b"\x9d\xfc" * 124 + b"\x53\x53\x53"
              + b"\x9b\x52\xc6" * 6 + b"\x9b\x52\x33"
              + b"\x5f\xc6" * 4 + b"\x9b\x52\xc6\x9b\x52\xc6\x4f\xff")
    _check_valid(comp, expect)


def test_fuzz15():
    # empty distance tree
    comp = (b"\x75\x85\xcd\x0e\x02\x21\x0c\x84\x3d\xf3\x14\x3d\xc2\x65"
            b"\x63\xb2\x0f\x64\xf8\x69\xdc\xc6\xc2\x12\x58\x12\xe4\xe9"
            b"\x5d\xa3\x28\x26\xee\xad\xc2\x65\x63\xb2\x0f\x64\xf8\x69"
            b"\xdc\xc6\xc2\x12\x58\x12\xe4\xe9\x5d\x66\xfb\xe8\x57\x57"
            b"\x18\xf3\x5b\xdd\xcb\x73")
    expect = b"\x78\x20\x5f\x74\x6c\x69\x63"
    d = zlib.decompressobj(-15)
    assert d.decompress(comp) == expect
    assert _inflate_both(comp[: len(comp) - len(d.unused_data)]) == expect


def test_fuzz18():
    comp = (b"\x75\x8f\xcd\x0e\x02\x21\x0c\x84\x3d\xf3\x14\x3d\xfc\x54"
            b"\x63\xb2\x0f\x64\xf8\x69\xdc\xc6\xc2\x12\x58\x12\xe4\xe9"
            b"\x5d\xa3\x28\x26\xee\xad\x33\xcd\xfc\x9d\x1a\x5e\x1e\xcc"
            b"\xe7\xf9\x24\x99\x40\x06\xed\x11\x4c\x56\xfb\xe8\x57\x57"
            b"\x0a\xf3\x5b\xd9\xcb\x60\xd5\xd5")
    expect = (b"\x75\x27\x5a\xfb\x64\x64\x2b\x63\x29\x67\x6e\x60\x20\x67"
              b"\x6e\x60\x20\x67\x6e\x60\x5e\x28\x20\x5d\x6e\x0a\x63\x29"
              b"\x67\x6e\x60\x20\x67\x6e\x60\x20\x67\x6e\x63\x29\x67\x6e"
              b"\x60\x20\x67\x73\x60\x69\x63")
    d = zlib.decompressobj(-15)
    assert d.decompress(comp) == expect
    assert _inflate_both(comp[: len(comp) - len(d.unused_data)]) == expect


# -- encode-side fuzz regressions: command lists that once broke the
# reference's dynamic-tree / RLE construction (test.ml fuzz10/11/12/
# 16/17, huffman_length_extra) --


def _encode_dynamic(cmds) -> bytes:
    """Encode a (kind, arg) command list in one last dynamic block whose
    trees come from the commands' own frequencies — the reference's
    `encode_dynamic` test helper."""
    lits = np.zeros(287, np.int64)
    dists = np.zeros(30, np.int64)
    q = streaming.Queue(1 << 14)
    for kind, arg in cmds:
        if kind == "literal":
            lits[arg] += 1
            q.push_exn(de.cmd_literal(arg))
        elif kind == "copy":
            off, ln = arg
            lits[257 + int(tables.length_to_code(np.array([ln]))[0])] += 1
            dists[int(tables.dist_to_code(np.array([off]))[0])] += 1
            q.push_exn(de.cmd_copy(off, ln))
    lits[256] = 1
    q.end_with_eob()
    dyn = streaming.dynamic_of_frequencies(lits, dists)
    enc = streaming.Def(q)
    buf = np.zeros(1 << 16, np.uint8)
    enc.dst(buf)
    assert enc.encode(streaming.Block("dynamic", True, dyn)) == "ok"
    return bytes(buf[: enc._dst_pos])


def _reconstruct(cmds) -> bytes:
    out = bytearray()
    for kind, arg in cmds:
        if kind == "literal":
            out.append(arg)
        elif kind == "copy":
            off, ln = arg
            for _ in range(ln):
                out.append(out[-off])
    return bytes(out)


@pytest.mark.parametrize("name,cmds", [
    # fuzz10: literal run + overlapped dist-1 copy
    ("fuzz10", [("literal", 231), ("literal", 60), ("literal", 128),
                ("copy", (1, 19))]),
    # fuzz11: copy length 130 (extra-bit length code)
    ("fuzz11", [("literal", 228), ("literal", 255), ("copy", (1, 130))]),
    # fuzz12: dist-2 copy of length 249 (two-symbol alternation)
    ("fuzz12", [("literal", 71), ("literal", 0), ("literal", 255),
                ("copy", (2, 249))]),
    # fuzz16: max-length copies at mixed distances
    ("fuzz16", [("literal", ord("@")), ("copy", (1, 212)),
                ("copy", (129, 258)), ("copy", (7, 131)),
                ("copy", (527, 208)), ("copy", (129, 258))]),
    # fuzz17: copy then trailing literals incl. NUL
    ("fuzz17", [("literal", 218), ("copy", (1, 21)), ("literal", 190),
                ("literal", 218), ("literal", 0)]),
    # huffman_length_extra: lengths 258 and 256 force the length
    # extra-bit boundary (test.ml:516–540)
    ("huffman_length_extra", [("literal", 0), ("literal", 0),
                              ("copy", (1, 258)), ("copy", (1, 256))]),
])
def test_encode_side_regressions(name, cmds):
    expect = _reconstruct(cmds)
    comp = _encode_dynamic(cmds)
    d = zlib.decompressobj(-15)
    assert d.decompress(comp) == expect and d.eof, name
    assert _inflate_both(comp) == expect


def test_fuzz11_window_bytes():
    """fuzz11's second half: re-decoding after the first 130-byte copy
    keeps window bytes consistent (test.ml:555–564)."""
    cmds = [("literal", 228), ("literal", 255), ("copy", (1, 130))]
    comp = _encode_dynamic(cmds)
    out = _inflate_both(comp)
    expect = bytes([228]) + b"\xff" * 131
    assert out == expect[: len(out)]
    assert len(out) == 132
