"""Zlib framing (RFC 1950) over raw DEFLATE.

Capability parity with the reference `Zl` module (lib/zl.ml): CMF/FLG
header with fcheck (zl.ml:509–522), big-endian Adler-32 trailer
(zl.ml:494–499), window-size negotiation on decode (the `allocate`
callback's role, zl.ml:247–280), and one-shot Ns variants
(zl.ml:382–418, 594–630).  Checksums run through our own device
kernels (ops/checksum.py), not a foreign zlib.
"""

from __future__ import annotations

import numpy as np

from . import de
from .ops import checksum


class MalformedError(de.MalformedError):
    pass


def _flevel(level: int) -> int:
    if level <= 1:
        return 0
    if level <= 5:
        return 1
    if level == 6:
        return 2
    return 3


def deflate(data, level: int = 6, *, segment_size: int | None = None) -> bytes:
    """One-shot zlib compress (Zl.Def.Ns parity, zl.ml:594–630)."""
    data = de._np_u8(data)
    cmf = 0x78  # CM=8 (deflate), CINFO=7 (32 KiB window)
    flg = _flevel(level) << 6
    rem = (cmf * 256 + flg) % 31
    if rem:
        flg += 31 - rem
    body = de.deflate(data, level, segment_size=segment_size)
    adler = checksum.adler32(data)
    return bytes([cmf, flg]) + body + adler.to_bytes(4, "big")


def inflate(data) -> bytes:
    """One-shot zlib decompress (Zl.Inf.Ns parity, zl.ml:382–418)."""
    out, _ = inflate_ex(data)
    return out


def inflate_ex(data) -> tuple[bytes, int]:
    """Decode one zlib stream; returns (payload, bytes consumed)."""
    buf = de._np_u8(data)
    if buf.size < 2:
        raise MalformedError("malformed header")
    cmf, flg = int(buf[0]), int(buf[1])
    if (cmf * 256 + flg) % 31 != 0:
        raise MalformedError("invalid header checksum")
    if cmf & 0x0F != 8:
        raise MalformedError("invalid kind of flow")
    if (cmf >> 4) > 7:
        raise MalformedError("invalid window")
    if flg & 0x20:
        raise MalformedError("unsupported preset dictionary")
    out, consumed = de.inflate_ex(buf[2:])
    tail = buf[2 + consumed :]
    if tail.size < 4:
        raise MalformedError("unexpected end of input")
    expect = int.from_bytes(tail[:4].tobytes(), "big")
    got = checksum.adler32(out)
    if got != expect:
        raise MalformedError("invalid checksum")
    return out, 2 + consumed + 4


# camlzip-style conveniences (Zl.Higher parity, zl.ml:633–667)
compress = deflate
uncompress = inflate
