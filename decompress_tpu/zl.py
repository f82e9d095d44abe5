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
from .gz import checksum  # host framing uses native scalar checksums


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


def deflate(data, level: int = 6, *, segment_size: int | None = None,
            dynamic: bool = True, window_bits: int = 15,
            zdict: bytes | None = None,
            strategy: str | None = None) -> bytes:
    """One-shot zlib compress (Zl.Def.Ns parity, zl.ml:594–630);
    ``dynamic=False`` forces fixed-tree blocks (zl.ml:560);
    ``window_bits`` (8..15) emits the matching CINFO and restricts
    match distances (the reference derives CINFO from the user window,
    zl.ml:509–522); ``zdict`` sets FDICT + DICTID and seeds the match
    window (RFC 1950 §2.2 — the reference records the flag only,
    zl.ml:254/271)."""
    data = de._np_u8(data)
    cmf = 0x08 | ((window_bits - 8) << 4)  # CM=8 (deflate) + CINFO
    flg = _flevel(level) << 6
    if zdict:
        flg |= 0x20
    rem = (cmf * 256 + flg) % 31
    if rem:
        flg += 31 - rem
    body = de.deflate(data, level, segment_size=segment_size, dynamic=dynamic,
                      window_bits=window_bits, dictionary=zdict,
                      strategy=strategy)
    adler = checksum.adler32(data)
    out = bytes([cmf, flg])
    if zdict:
        out += checksum.adler32(zdict).to_bytes(4, "big")
    return out + body + adler.to_bytes(4, "big")


def inflate(data, *, zdict: bytes | None = None) -> bytes:
    """One-shot zlib decompress (Zl.Inf.Ns parity, zl.ml:382–418)."""
    out, _ = inflate_ex(data, zdict=zdict)
    return out


def inflate_ex(data, *, zdict: bytes | None = None) -> tuple[bytes, int]:
    """Decode one zlib stream; returns (payload, bytes consumed).

    ``zdict`` supplies the preset dictionary for FDICT streams (RFC
    1950 §2.2); its Adler-32 is checked against the stream's DICTID."""
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
    hdr = 2
    window = None
    if flg & 0x20:
        if zdict is None:
            raise MalformedError("unsupported preset dictionary")
        if buf.size < 6:
            raise MalformedError("unexpected end of input")
        dictid = int.from_bytes(buf[2:6].tobytes(), "big")
        if dictid != checksum.adler32(zdict):
            raise MalformedError("invalid dictionary checksum")
        zd = de._np_u8(zdict)
        window = zd[-min(zd.size, 32768):]
        hdr = 6
    # array path: the Adler runs zero-copy over the decoder's buffer
    # and bytes materialize once on return
    out, consumed = de._inflate_ex_arr(buf[hdr:], window=window,
                                       window_bits=(cmf >> 4) + 8)
    tail = buf[hdr + consumed :]
    if tail.size < 4:
        raise MalformedError("unexpected end of input")
    expect = int.from_bytes(tail[:4].tobytes(), "big")
    got = checksum.adler32(out)
    if got != expect:
        raise MalformedError("invalid checksum")
    return out.tobytes(), hdr + consumed + 4


# camlzip-style conveniences (Zl.Higher parity, zl.ml:633–667)
compress = deflate
uncompress = inflate


# ---------------------------------------------------------------------------
# Streaming (Zl.Inf / Zl.Def parity, zl.ml:143–631).
# ---------------------------------------------------------------------------


class Inf:
    """Streaming zlib decoder: header check, raw inflate, Adler verify."""

    def __init__(self, o_size: int = de.io_buffer_size,
                 zdict: bytes | None = None):
        from . import streaming
        from .gz import checksum as _cks

        self._streaming = streaming
        self._native = _cks
        self.o_size = o_size
        self.zdict = zdict
        self._head = b""
        self._inf = None
        self._trailer = b""
        self._adler = 1
        self._phase = "header"
        self._eoi = False
        self.error: str | None = None

    def src(self, data) -> None:
        data = bytes(data)
        if not data:
            self._eoi = True
        if self._phase == "header":
            self._head += data
            if not data and len(self._head) < 2:
                self.error = "unexpected end of input"
                self._phase = "bad"
            return
        if self._phase == "body":
            self._inf.src(data)
            return
        self._trailer += data

    def clone(self) -> "Inf":
        """Snapshot mid-stream (reference immutable decoders,
        zl.ml:146–164): the copy resumes independently."""
        import copy

        c = copy.copy(self)
        if self._inf is not None:
            c._inf = self._inf.clone()
        return c

    def _start_body(self) -> str | None:
        cmf, flg = self._head[0], self._head[1]
        if (cmf * 256 + flg) % 31 != 0:
            return "invalid header checksum"
        if cmf & 0x0F != 8:
            return "invalid kind of flow"
        if (cmf >> 4) > 7:
            return "invalid window"
        hdr = 2
        window = None
        if flg & 0x20:
            if self.zdict is None:
                return "unsupported preset dictionary"
            if len(self._head) < 6:
                return None if not self._eoi else "unexpected end of input"
            dictid = int.from_bytes(self._head[2:6], "big")
            if dictid != checksum.adler32(self.zdict):
                return "invalid dictionary checksum"
            window = self.zdict[-32768:]
            hdr = 6
        self._inf = self._streaming.Inflate(self.o_size, window=window,
                                            window_bits=(cmf >> 4) + 8)
        rest = self._head[hdr:]
        self._head = b""
        if rest:
            self._inf.src(rest)
        return None

    def decode(self) -> str:
        from .streaming import TOKEN_AWAIT, TOKEN_END, TOKEN_FLUSH, TOKEN_MALFORMED

        if self._phase == "bad":
            return TOKEN_MALFORMED
        if self._phase == "header":
            if len(self._head) < 2:
                return TOKEN_AWAIT
            err = self._start_body()
            if err:
                self.error = err
                self._phase = "bad"
                return TOKEN_MALFORMED
            if self._inf is None:
                return TOKEN_AWAIT  # FDICT: waiting for the DICTID bytes
            self._phase = "body"
        if self._phase == "body":
            tok = self._inf.decode()
            if tok == TOKEN_MALFORMED:
                self.error = self._inf.error
                self._phase = "bad"
                return tok
            if tok != TOKEN_END:
                return tok
            self._trailer = self._inf.remaining_input() + self._trailer
            self._phase = "trailer"
        if self._phase == "trailer":
            if self._inf._out:
                return TOKEN_FLUSH  # drain output before END
            if len(self._trailer) < 4:
                if self._eoi:
                    self.error = "unexpected end of input"
                    self._phase = "bad"
                    return TOKEN_MALFORMED
                return TOKEN_AWAIT
            expect = int.from_bytes(self._trailer[:4], "big")
            if self._adler != expect:
                self.error = "invalid checksum"
                self._phase = "bad"
                return TOKEN_MALFORMED
            self._phase = "done"
        return TOKEN_END

    def flush(self) -> bytes:
        if self._inf is None:
            return b""
        out = self._inf.flush()
        self._adler = self._native.adler32(out, self._adler)
        return out

    def reset(self) -> None:
        """Reuse for a new stream (reference Zl reset, zl.ml:354–378)."""
        self.__init__(self.o_size, zdict=self.zdict)


class Def:
    """Streaming zlib encoder: CMF/FLG header, segment pipeline,
    big-endian Adler-32 trailer (zl.ml:494–522)."""

    def __init__(self, level: int = 6, segment_size: int | None = None,
                 engine: str = "segment"):
        """``engine="segment"`` batches whole segments through the
        device pipeline; ``engine="queue"`` routes through the
        Lz77 -> Queue -> Def protocol encoder (the reference's own
        consumer loop, zl.ml:523-555) with `Block re-negotiation."""
        from . import streaming
        from .gz import checksum as _cks

        self._native = _cks
        if engine == "queue":
            self._def = streaming.QueueDeflate(level)
        elif engine == "segment":
            self._def = streaming.Deflate(level, segment_size)
        else:
            raise ValueError(f"unknown engine {engine!r}")
        self._adler = 1
        cmf = 0x78
        flg = _flevel(level) << 6
        rem = (cmf * 256 + flg) % 31
        if rem:
            flg += 31 - rem
        self._pending_header = bytes([cmf, flg])

    def push(self, data) -> bytes:
        data = bytes(data)
        self._adler = self._native.adler32(data, self._adler)
        out = self._pending_header + self._def.push(data)
        self._pending_header = b""
        return out

    def finish(self) -> bytes:
        out = self._pending_header + self._def.finish()
        self._pending_header = b""
        return out + self._adler.to_bytes(4, "big")


def higher_compress(refill, flush, level: int = 6, i_size: int = de.io_buffer_size) -> None:
    """camlzip-style compress loop (Zl.Higher parity, zl.ml:633–667):
    ``refill()`` returns input chunks (b'' = EOF), ``flush(bytes)``
    consumes output."""
    enc = Def(level)
    while True:
        chunk = refill()
        if not chunk:
            break
        out = enc.push(chunk)
        if out:
            flush(out)
    flush(enc.finish())


def higher_uncompress(refill, flush, o_size: int = de.io_buffer_size) -> None:
    dec = Inf(o_size)
    while True:
        tok = dec.decode()
        if tok == "await":
            dec.src(refill())
        elif tok == "flush":
            flush(dec.flush())
        elif tok == "end":
            flush(dec.flush())
            return
        else:
            raise MalformedError(dec.error or "malformed")
