"""Gzip framing (RFC 1952) over raw DEFLATE.

Capability parity with the reference `Gz` module (lib/gz.ml): full
header with FTEXT/FHCRC/FEXTRA/FNAME/FCOMMENT (gz.ml:463–492,
358–461), OS enumeration (gz.ml:158–246), CRC-32 + ISIZE trailer
(gz.ml:344–356, 715–722), metadata accessors including keyed extra
subfields (gz.ml:613–633), and multi-member streams (fresh window per
member, gz.ml:467–471) — the property the sharded compressor
(parallel/) exploits for data-parallel members.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import numpy as np

from . import de
from .ops import checksum


class MalformedError(de.MalformedError):
    pass


class OS(enum.IntEnum):
    """RFC 1952 OS field (reference os type, gz.ml:158–246)."""

    FAT = 0
    AMIGA = 1
    VMS = 2
    UNIX = 3
    VM = 4
    ATARI = 5
    HPFS = 6
    MACINTOSH = 7
    Z_SYSTEM = 8
    CPM = 9
    TOPS_20 = 10
    NTFS = 11
    QDOS = 12
    ACORN = 13
    UNKNOWN = 255

    @classmethod
    def default(cls) -> "OS":
        return cls.UNIX


@dataclass
class Metadata:
    """Per-member gzip metadata (reference gz.ml:921–987 configuration/
    metadata records)."""

    filename: str | None = None
    comment: str | None = None
    mtime: int = 0
    os: OS = OS.UNKNOWN
    extra: bytes | None = None
    text: bool = False

    def extra_field(self, key: bytes) -> bytes | None:
        """Keyed subfield lookup (reference `extra ~key`, gz.ml:613–633)."""
        if self.extra is None or len(key) != 2:
            return None
        buf = self.extra
        i = 0
        while i + 4 <= len(buf):
            si = buf[i : i + 2]
            ln = int.from_bytes(buf[i + 2 : i + 4], "little")
            if si == key:
                return buf[i + 4 : i + 4 + ln]
            i += 4 + ln
        return None


_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 0x01, 0x02, 0x04, 0x08, 0x10


def _xfl(level: int) -> int:
    if level >= 8:
        return 2
    if level <= 2:
        return 4
    return 0


def compress(
    data,
    level: int = 6,
    *,
    mtime: int = 0,
    os: OS | int = OS.default(),
    filename: str | None = None,
    comment: str | None = None,
    extra: bytes | None = None,
    fhcrc: bool = False,
    text: bool = False,
    segment_size: int | None = None,
) -> bytes:
    """One-shot gzip member (Gz.Def parity, gz.ml:636–919)."""
    arr = de._np_u8(data)
    flg = (
        (_FTEXT if text else 0)
        | (_FHCRC if fhcrc else 0)
        | (_FEXTRA if extra is not None else 0)
        | (_FNAME if filename is not None else 0)
        | (_FCOMMENT if comment is not None else 0)
    )
    head = bytearray()
    head += b"\x1f\x8b\x08"
    head.append(flg)
    head += (mtime & 0xFFFFFFFF).to_bytes(4, "little")
    head.append(_xfl(level))
    head.append(int(os))
    if extra is not None:
        head += len(extra).to_bytes(2, "little")
        head += extra
    if filename is not None:
        head += filename.encode("latin-1") + b"\x00"
    if comment is not None:
        head += comment.encode("latin-1") + b"\x00"
    if fhcrc:
        head += (checksum.crc32(bytes(head)) & 0xFFFF).to_bytes(2, "little")
    body = de.deflate(arr, level, segment_size=segment_size)
    crc = checksum.crc32(arr)
    isize = arr.size & 0xFFFFFFFF
    return bytes(head) + body + crc.to_bytes(4, "little") + isize.to_bytes(4, "little")


def _read_zero_terminated(buf: np.ndarray, pos: int) -> tuple[str, int]:
    end = pos
    n = buf.size
    while end < n and buf[end] != 0:
        end += 1
    if end >= n:
        raise MalformedError("unexpected end of input")
    return buf[pos:end].tobytes().decode("latin-1"), end + 1


def decompress_member(data) -> tuple[bytes, Metadata, int]:
    """Decode one gzip member; returns (payload, metadata, consumed)."""
    buf = de._np_u8(data)
    if buf.size < 10:
        raise MalformedError("unexpected end of input")
    if buf[0] != 0x1F or buf[1] != 0x8B:
        raise MalformedError("invalid header")
    if buf[2] != 8:
        raise MalformedError("invalid kind of flow")
    flg = int(buf[3])
    if flg & 0xE0:
        raise MalformedError("invalid flg")
    meta = Metadata(
        mtime=int.from_bytes(buf[4:8].tobytes(), "little"),
        os=OS(int(buf[9])) if int(buf[9]) in OS._value2member_map_ else OS.UNKNOWN,
        text=bool(flg & _FTEXT),
    )
    pos = 10
    if flg & _FEXTRA:
        if pos + 2 > buf.size:
            raise MalformedError("unexpected end of input")
        xlen = int.from_bytes(buf[pos : pos + 2].tobytes(), "little")
        pos += 2
        if pos + xlen > buf.size:
            raise MalformedError("unexpected end of input")
        meta.extra = buf[pos : pos + xlen].tobytes()
        pos += xlen
    if flg & _FNAME:
        meta.filename, pos = _read_zero_terminated(buf, pos)
    if flg & _FCOMMENT:
        meta.comment, pos = _read_zero_terminated(buf, pos)
    if flg & _FHCRC:
        if pos + 2 > buf.size:
            raise MalformedError("unexpected end of input")
        expect = int.from_bytes(buf[pos : pos + 2].tobytes(), "little")
        got = checksum.crc32(buf[:pos].tobytes()) & 0xFFFF
        if got != expect:
            raise MalformedError("invalid header crc")
        pos += 2
    out, consumed = de.inflate_ex(buf[pos:])
    pos += consumed
    if pos + 8 > buf.size:
        raise MalformedError("unexpected end of input")
    crc_expect = int.from_bytes(buf[pos : pos + 4].tobytes(), "little")
    isize = int.from_bytes(buf[pos + 4 : pos + 8].tobytes(), "little")
    if checksum.crc32(out) != crc_expect:
        raise MalformedError("invalid checksum")
    if (len(out) & 0xFFFFFFFF) != isize:
        raise MalformedError("invalid size")
    return out, meta, pos + 8


def decompress(data) -> bytes:
    """Decode a gzip stream, concatenating all members."""
    buf = de._np_u8(data)
    out = bytearray()
    pos = 0
    first = True
    while pos < buf.size:
        payload, _, used = decompress_member(buf[pos:])
        out += payload
        pos += used
        first = False
    if first:
        raise MalformedError("unexpected end of input")
    return bytes(out)


def decompress_ex(data) -> tuple[bytes, Metadata]:
    """First member's payload + metadata (reference accessors parity)."""
    payload, meta, _ = decompress_member(data)
    return payload, meta


uncompress = decompress
