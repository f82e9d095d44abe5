"""Standalone LZ77 compressor package (reference `Lz`, lib/lz.ml).

The reference ships `decompress.lz` as an independent rolling-hash
matcher kept for compatibility (SURVEY §2 #14): a 3-byte rolling hash
(`update_hash` lz.ml:149–155, `insert_string` lz.ml:308–315) over a
head table, greedy emission into a `De.Queue` (levels 0–4 collapse to
one configuration, lz.ml:530–541).  This module is the same kind of
beast — a self-contained HOST matcher, deliberately not the device
kernel — so the two can cross-check each other:

* :func:`compress_into` / :class:`State` — rolling-hash greedy matcher
  (head + bounded chain walk, byte-exact extension); distinct
  algorithm and code path from ops/lz77.py.
* ``device=True`` routes through the shared device match finder
  instead (the TPU-native default elsewhere in the package).

Both emit the same Queue int packing, so `de.encode_commands` /
`streaming.Def` encode either.
"""

from __future__ import annotations

from . import de
from .streaming import Queue

__all__ = ["Queue", "State", "compress_into", "make_window"]

_MIN = 3
_MAX = 258
_WSIZE = 32768


def make_window(bits: int = 15) -> int:
    """Window size for a given bit width (make_window parity,
    de.ml:331–333); the host matcher carries no buffer state."""
    if not 8 <= bits <= 15:
        raise ValueError("window bits must be in 8..15")
    return 1 << bits


def _matcher(data: bytes, max_dist: int = _WSIZE, chain: int = 8):
    """Greedy rolling-hash matcher: yields packed Queue commands.

    Head-table + short chain walk, exact byte extension — the
    reference Lz design (single configuration; levels collapse,
    lz.ml:530–541)."""
    n = len(data)
    head: dict[int, int] = {}
    prev: dict[int, int] = {}  # pos -> previous same-hash pos
    i = 0
    while i + _MIN <= n:
        key = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
        j = head.get(key, -1)
        best_len = 0
        best_dist = 0
        depth = 0
        jj = j
        limit = min(_MAX, n - i)
        while jj >= 0 and i - jj <= max_dist and depth < chain:
            l = 0
            while l < limit and data[jj + l] == data[i + l]:
                l += 1
            if l > best_len:
                best_len = l
                best_dist = i - jj
                if l >= limit:
                    break
            jj = prev.get(jj, -1)
            depth += 1
        prev[i] = j
        head[key] = i
        if best_len >= _MIN:
            yield de.cmd_copy(best_dist, best_len)
            # insert sparse hashes inside the match (every 4th position
            # keeps the table useful at a fraction of the cost)
            for k in range(i + 1, min(i + best_len, n - _MIN + 1), 4):
                k_key = data[k] | (data[k + 1] << 8) | (data[k + 2] << 16)
                prev[k] = head.get(k_key, -1)
                head[k_key] = k
            i += best_len
        else:
            yield de.cmd_literal(data[i])
            i += 1
    while i < n:
        yield de.cmd_literal(data[i])
        i += 1


class State:
    """Streaming matcher state (`Lz.state` parity, lz.ml:316–352):
    ``src`` feeds input, ``compress`` drains commands into the queue
    with "await"/"flush"/"end" tokens."""

    def __init__(self, q: Queue, level: int = 6, *, max_dist: int = _WSIZE):
        self.q = q
        self.level = level
        self.max_dist = max_dist
        self._buf = bytearray()
        self._pending: list[int] = []
        self._eoi = False
        self._ended = False

    def src(self, data) -> None:
        data = bytes(data)
        if not data:
            self._eoi = True
        self._buf += data

    def compress(self) -> str:
        while True:
            if self._ended:
                return "end"
            if self._pending:
                while self._pending:
                    if self.q.is_full():
                        return "flush"
                    self.q.push_exn(self._pending.pop(0))
            if not self._eoi:
                # keep a MAX_MATCH tail so matches never split across feeds
                take = len(self._buf) - _MAX
                if take <= 0:
                    return "await"
                chunk = bytes(self._buf[:take])
                del self._buf[:take]
            else:
                chunk = bytes(self._buf)
                self._buf.clear()
            if chunk:
                self._pending = list(_matcher(chunk, self.max_dist))
                continue
            if self._eoi:
                if self.q.is_full():
                    return "flush"
                self.q.end_with_eob()
                self._ended = True
                return "end"


def compress_into(q: Queue, data: bytes, level: int = 6, *,
                  eob: bool = True, device: bool = False) -> None:
    """One-shot: match-find ``data`` and push commands into ``q``.

    ``device=True`` uses the shared TPU match finder (ops/lz77.py)
    instead of the host rolling-hash matcher.
    """
    data = bytes(data)
    if device:
        q.push_array(de.match_commands(data, b"", level))
    else:
        for c in _matcher(data):
            q.push_exn(c)
    if eob:
        q.end_with_eob()
