"""Standalone LZ77 compressor package (reference `Lz`, lib/lz.ml).

The reference ships `decompress.lz` as a separate rolling-hash LZ77
kept for compatibility (SURVEY §2 #14, lz.ml:1–577); its job — turn
bytes into `De.Queue` commands — is served here by the shared device
match finder through the same Queue protocol.
"""

from __future__ import annotations

from . import de
from .streaming import Lz77 as _StreamingLz77, Queue

__all__ = ["Queue", "State", "compress_into", "make_window"]

State = _StreamingLz77  # streaming matcher state (lz.ml state record parity)


def make_window(bits: int = 15) -> bytes:
    """Reusable window placeholder (de.ml:331–333 make_window parity)."""
    if not 8 <= bits <= 15:
        raise ValueError("window bits must be in 8..15")
    return b""


def compress_into(q: Queue, data: bytes, level: int = 6, *, eob: bool = True) -> None:
    """One-shot: match-find ``data`` and push commands into ``q``."""
    for c in de.match_commands(bytes(data), b"", level):
        q.push_exn(c)
    if eob:
        q.end_with_eob()
