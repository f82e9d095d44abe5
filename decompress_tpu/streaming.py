"""Streaming (non-blocking) codec APIs.

The reference's defining API shape (SURVEY §1 invariant 1): every codec
is a resumable machine driven by `decode`/`encode` returning control
tokens, with the caller owning all buffers.  Python tier of the same
contract:

* :class:`Queue` — the shared command ring decoupling match finding
  from entropy coding (`De.Queue`, de.ml:2194–2328), same int packing.
* :class:`Inflate` — streaming raw-DEFLATE decoder (`De.Inf`,
  de.ml:510–1824): tokens ``"await" | "flush" | "end" | "malformed"``;
  backed by the native resumable state machine (native/tpuz.cpp).
* :class:`Deflate` — streaming raw-DEFLATE encoder (`De.Def` +
  `De.Lz77` pair): buffers input into segments, runs the device
  pipeline with 32 KiB window carry-over, emits standard blocks.
* :class:`Lz77` — streaming match finder emitting commands to a
  :class:`Queue` (`De.Lz77`, de.ml:4013–4515).

zlib/gzip streaming wrappers live in zl.py / gz.py.
"""

from __future__ import annotations

import numpy as np

from . import de
from .core import bitstream

TOKEN_AWAIT = "await"
TOKEN_FLUSH = "flush"
TOKEN_END = "end"
TOKEN_MALFORMED = "malformed"
TOKEN_OK = "ok"
TOKEN_PARTIAL = "partial"
TOKEN_BLOCK = "block"


class Queue:
    """Shared command queue (De.Queue parity, de.ml:2194–2328).

    Commands are packed ints: literal = byte, copy = ((len-3)<<16)
    | (off-1) | 0x2000000, EOB = 256 (de.ml:2245–2252).
    """

    def __init__(self, capacity: int = 4096) -> None:
        if capacity & (capacity - 1):
            raise ValueError("capacity must be a power of two")
        self.capacity = capacity
        self._buf: list[int] = []

    def is_empty(self) -> bool:
        return not self._buf

    def is_full(self) -> bool:
        return len(self._buf) >= self.capacity

    def available(self) -> int:
        return self.capacity - len(self._buf)

    def push_exn(self, cmd: int) -> None:
        if self.is_full():
            raise OverflowError("queue is full")
        self._buf.append(cmd)

    def pop_exn(self) -> int:
        if not self._buf:
            raise IndexError("queue is empty")
        return self._buf.pop(0)

    def junk_exn(self, n: int) -> None:
        if len(self._buf) < n:
            raise IndexError("queue underflow")
        del self._buf[:n]

    def blit(self, data: bytes) -> None:
        """Bulk literal insert (de.ml:2268–2284)."""
        if self.available() < len(data):
            raise OverflowError("queue is full")
        self._buf.extend(data)

    def end_with_eob(self) -> None:
        self.push_exn(de.CMD_EOB)

    def to_list(self) -> list:
        return [de.cmd_unpack(c) for c in self._buf]

    @classmethod
    def of_list(cls, cmds: list, capacity: int = 4096) -> "Queue":
        q = cls(capacity)
        for kind, arg in cmds:
            if kind == "literal":
                q.push_exn(de.cmd_literal(arg if isinstance(arg, int) else ord(arg)))
            elif kind == "copy":
                q.push_exn(de.cmd_copy(*arg))
            elif kind == "end":
                q.push_exn(de.CMD_EOB)
        return q


class Inflate:
    """Streaming raw-DEFLATE decoder with Await/Flush tokens.

    Usage mirrors `De.Inf` (de.mli:82–174)::

        inf = Inflate(o_size=65536)
        inf.src(chunk)            # provide input ('' marks end of input)
        while (tok := inf.decode()) != "end":
            if tok == "await":  inf.src(read_more())
            elif tok == "flush": out.write(inf.flush())
            else: raise ...(inf.error)
        out.write(inf.flush())
    """

    def __init__(self, o_size: int = de.io_buffer_size, window: bytes | None = None,
                 window_bits: int = 15):
        from . import native

        self._stream = native.InflateStream()
        if window_bits != 15:
            # decode-side window restriction (zl.ml:247-280 negotiates
            # the window from CINFO; too-far references are malformed)
            self._stream.set_window_bits(window_bits)
        if window:
            self._stream.set_dictionary(bytes(window))
        self.o_size = o_size
        self._pending_in = b""
        self._out = b""
        self._eoi = False
        self._done = False
        self.error: str | None = None
        self._given_back = b""

    def src(self, data) -> None:
        data = bytes(data)
        if not data:
            self._eoi = True
        self._pending_in += data

    def src_rem(self) -> int:
        return len(self._pending_in)

    def dst_rem(self) -> int:
        return self.o_size - len(self._out)

    def decode(self) -> str:
        if self.error:
            return TOKEN_MALFORMED
        while True:
            if self._done:
                return TOKEN_END
            cap = self.o_size - len(self._out)
            if cap == 0:
                return TOKEN_FLUSH
            status, consumed, produced = self._stream.run(self._pending_in, cap)
            self._pending_in = self._pending_in[consumed:]
            self._out += produced
            if status == self._stream.END:
                self._done = True
                # bytes past the stream end: any whole bytes the state
                # machine buffered from earlier feeds come first
                self._given_back = self._stream.takeback() + self._pending_in
                return TOKEN_END
            if status == self._stream.MALFORMED:
                self.error = self._stream.error
                return TOKEN_MALFORMED
            if status == self._stream.FLUSH:
                return TOKEN_FLUSH
            # AWAIT
            if self._pending_in:
                continue
            if self._eoi:
                self.error = "unexpected end of input"
                return TOKEN_MALFORMED
            return TOKEN_AWAIT

    def flush(self) -> bytes:
        out, self._out = self._out, b""
        return out

    def remaining_input(self) -> bytes:
        """Unconsumed bytes after END (whole-byte give-back,
        de.ml:1459–1466)."""
        return self._given_back

    def reset(self) -> None:
        """Reuse this decoder for a new stream (reference `reset`,
        de.ml:1512–1532: allocations are kept)."""
        self._stream.reset()
        self._pending_in = b""
        self._out = b""
        self._eoi = False
        self._done = False
        self.error = None
        self._given_back = b""

    @property
    def total_out(self) -> int:
        return self._stream.total_out


class Deflate:
    """Streaming raw-DEFLATE encoder (De.Lz77 + De.Def pair).

    ``push`` accepts input and returns any compressed bytes ready;
    ``finish`` emits the final block.  Window semantics match the
    reference's sliding window: each segment sees the previous 32 KiB.
    """

    def __init__(self, level: int = 6, segment_size: int | None = None):
        self.level = level
        self.segment = segment_size or de.SEGMENT_SIZE
        self._buf = bytearray()
        self._hist = b""
        self._w = bitstream.BitWriter()
        self._finished = False

    def push(self, data) -> bytes:
        if self._finished:
            raise ValueError("stream already finished")
        self._buf += bytes(data)
        out = b""
        # emit all full segments except we must keep at least one byte so
        # the final block (BFINAL) can close the stream at finish()
        while len(self._buf) > self.segment:
            chunk = bytes(self._buf[: self.segment])
            del self._buf[: self.segment]
            self._encode_segment(chunk, final=False)
            out += self._w.take_bytes()
        return out

    def finish(self) -> bytes:
        if self._finished:
            return b""
        self._finished = True
        if self._buf:
            self._encode_segment(bytes(self._buf), final=True)
            self._buf.clear()
        else:
            # empty final block: fixed tree, lone EOB
            from .core import huffman, tables

            codes = huffman.canonical_codes(tables.FIXED_LIT_LENGTHS)
            self._w.write(1, 1)
            self._w.write(1, 2)
            self._w.write(int(codes[tables.EOB]), int(tables.FIXED_LIT_LENGTHS[tables.EOB]))
        return self._w.getvalue()

    def _encode_segment(self, chunk: bytes, final: bool) -> None:
        if self.level == 0:
            de._emit_stored(self._w, np.frombuffer(chunk, np.uint8), final)
        else:
            de.deflate_segment_into(
                self._w, chunk, self._hist, self.level, self.segment, final
            )
        self._hist = (self._hist + chunk)[-32768:]


def higher_compress(refill, flush, level: int = 6) -> None:
    """camlzip-style raw-DEFLATE compress loop (De.Higher parity,
    de.ml:4517–4612): ``refill()`` yields input chunks (b'' = EOF),
    ``flush(bytes)`` consumes output."""
    enc = Deflate(level)
    while True:
        chunk = refill()
        if not chunk:
            break
        out = enc.push(chunk)
        if out:
            flush(out)
    flush(enc.finish())


def higher_uncompress(refill, flush, o_size: int = de.io_buffer_size) -> None:
    """camlzip-style raw-DEFLATE uncompress loop (De.Higher parity)."""
    dec = Inflate(o_size)
    while True:
        tok = dec.decode()
        if tok == TOKEN_AWAIT:
            dec.src(refill())
        elif tok == TOKEN_FLUSH:
            flush(dec.flush())
        elif tok == TOKEN_END:
            flush(dec.flush())
            return
        else:
            raise de.MalformedError(dec.error or "malformed")


def compress_to_string(data, level: int = 6) -> bytes:
    """De.Higher.to_string analogue."""
    return de.deflate(data, level)


def uncompress_of_string(data) -> bytes:
    """De.Higher.of_string analogue."""
    return de.inflate(data)


class Lz77:
    """Streaming match finder emitting commands into a :class:`Queue`
    (`De.Lz77` parity, de.ml:4013–4515).

    ``compress`` returns ``"flush"`` when the queue is too full to hold
    the next chunk's commands, ``"await"`` when out of input, ``"end"``
    after end-of-input is signalled.  The literals/distances frequency
    arrays accumulate like the reference's (de.ml:2330–2351).
    """

    def __init__(self, q: Queue, level: int = 6, chunk: int = 16384):
        self.q = q
        self.level = level
        self.chunk = chunk
        self._buf = bytearray()
        self._hist = b""
        self._eoi = False
        self._ended = False
        self.literals = np.zeros(286 + 1, dtype=np.int64)
        self.literals[256] = 1  # EOB preset (de.ml:2333–2336)
        self.distances = np.zeros(30, dtype=np.int64)
        self.checksum_value = 1  # running Adler-32 of consumed input

    def src(self, data) -> None:
        data = bytes(data)
        if not data:
            self._eoi = True
        self._buf += data

    def compress(self) -> str:
        from .gz import checksum as _cks

        while True:
            if self._ended:
                return TOKEN_END
            take = len(self._buf) if self._eoi else (len(self._buf) // self.chunk) * self.chunk
            if take == 0:
                if not self._eoi:
                    return TOKEN_AWAIT
                if self.q.available() < 1:
                    return TOKEN_FLUSH
                self.q.end_with_eob()
                self._ended = True
                return TOKEN_END
            take = min(take, self.chunk)
            if self.q.available() < take:
                # conservative pre-check (commands <= bytes) so a full
                # queue never wastes a device analysis
                return TOKEN_FLUSH
            chunk = bytes(self._buf[:take])
            cmds = de.match_commands(chunk, self._hist, self.level)
            if self.q.available() < len(cmds):
                return TOKEN_FLUSH
            for c in cmds:
                self.q.push_exn(c)
                kind, arg = de.cmd_unpack(c)
                if kind == "literal":
                    self.literals[arg] += 1
                else:
                    off, ln = arg
                    from .core import tables as _t

                    self.literals[257 + int(_t.length_to_code(np.array([ln]))[0])] += 1
                    self.distances[int(_t.dist_to_code(np.array([off]))[0])] += 1
            self.checksum_value = _cks.adler32(chunk, self.checksum_value)
            del self._buf[:take]
            self._hist = (self._hist + chunk)[-32768:]
