"""Native C++ runtime (libtpuz): scalar checksums, LZO oracle, and the
resumable streaming inflater.  Built on demand with g++ (ctypes, no
pybind11 dependency)."""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "tpuz.cpp"
_SO = _DIR / "libtpuz.so"
_LOCK = threading.Lock()
_LIB = None
_LOAD_ERR: str | None = None


def _build() -> None:
    # -march=native: the lib is built on import for the host it runs on
    # (the .so is never shipped), so BMI2 variable shifts etc. are safe;
    # retried portably in case the toolchain rejects it.
    base = ["g++", "-O3", "-Wall", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)]
    try:
        subprocess.run(base[:2] + ["-march=native"] + base[2:],
                       check=True, capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(base, check=True, capture_output=True)


def _load():
    global _LIB, _LOAD_ERR
    if _LIB is not None or _LOAD_ERR is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LOAD_ERR is not None:
            return _LIB
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_SO))
        except Exception as e:  # pragma: no cover - env without g++
            _LOAD_ERR = str(e)
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.tpuz_adler32.restype = ctypes.c_uint32
        lib.tpuz_adler32.argtypes = [u8p, ctypes.c_uint64, ctypes.c_uint32]
        lib.tpuz_crc32.restype = ctypes.c_uint32
        lib.tpuz_crc32.argtypes = [u8p, ctypes.c_uint64, ctypes.c_uint32]
        lib.tpuz_crc32_combine.restype = ctypes.c_uint32
        lib.tpuz_crc32_combine.argtypes = [ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint64]
        lib.tpuz_adler32_combine.restype = ctypes.c_uint32
        lib.tpuz_adler32_combine.argtypes = [ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint64]
        lib.tpuz_lzo1x_decompress.restype = ctypes.c_int
        lib.tpuz_lzo1x_decompress.argtypes = [
            u8p, ctypes.c_uint64, u8p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64)]
        lib.tpuz_lzo1x_compress.restype = ctypes.c_int
        lib.tpuz_lzo1x_compress.argtypes = [
            u8p, ctypes.c_uint64, u8p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64)]
        lib.tpuz_inflate_new.restype = ctypes.c_void_p
        lib.tpuz_inflate_clone.restype = ctypes.c_void_p
        lib.tpuz_inflate_clone.argtypes = [ctypes.c_void_p]
        lib.tpuz_inflate_free.argtypes = [ctypes.c_void_p]
        lib.tpuz_inflate_reset.argtypes = [ctypes.c_void_p]
        lib.tpuz_inflate_error.restype = ctypes.c_char_p
        lib.tpuz_inflate_error.argtypes = [ctypes.c_void_p]
        lib.tpuz_inflate_total_out.restype = ctypes.c_uint64
        lib.tpuz_inflate_total_out.argtypes = [ctypes.c_void_p]
        lib.tpuz_inflate_set_cursor.argtypes = [ctypes.c_void_p,
                                                ctypes.c_uint64]
        lib.tpuz_inflate_cursor.restype = ctypes.c_uint64
        lib.tpuz_inflate_cursor.argtypes = [ctypes.c_void_p]
        lib.tpuz_inflate_reset_keep_window.argtypes = [ctypes.c_void_p]
        lib.tpuz_inflate_set_window_bits.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.tpuz_inflate_set_dictionary.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_uint32]
        lib.tpuz_inflate_takeback.restype = ctypes.c_int
        lib.tpuz_inflate_takeback.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int]
        lib.tpuz_expand_cmds.restype = ctypes.c_int
        lib.tpuz_expand_cmds.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64, u8p,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64)]
        lib.tpuz_inflate_run.restype = ctypes.c_int
        lib.tpuz_inflate_run.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64),
            u8p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64)]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _u8(data) -> ctypes.Array:
    b = bytes(data)
    return (ctypes.c_uint8 * len(b)).from_buffer_copy(b) if b else (ctypes.c_uint8 * 1)()


def _ro_ptr(data):
    """Zero-copy (ptr, len, owner) view of ``data`` for read-only native
    calls.  ``owner`` must be kept referenced until the call returns.

    Handles contiguous numpy uint8 arrays and bytes without copying;
    anything else goes through one ``bytes()`` materialization.
    """
    import numpy as np

    if isinstance(data, np.ndarray):
        if data.dtype != np.uint8 or not data.flags["C_CONTIGUOUS"]:
            data = np.ascontiguousarray(data, dtype=np.uint8)
        if data.size == 0:
            return (ctypes.c_uint8 * 1)(), 0, data
        ptr = ctypes.cast(data.ctypes.data, ctypes.POINTER(ctypes.c_uint8))
        return ptr, data.size, data
    b = data if isinstance(data, bytes) else bytes(data)
    if not b:
        return (ctypes.c_uint8 * 1)(), 0, b
    return (ctypes.cast(ctypes.c_char_p(b), ctypes.POINTER(ctypes.c_uint8)),
            len(b), b)


def adler32(data, value: int = 1) -> int:
    lib = _load()
    ptr, n, keep = _ro_ptr(data)
    res = lib.tpuz_adler32(ptr, n, value)
    del keep
    return res


def crc32(data, value: int = 0) -> int:
    lib = _load()
    ptr, n, keep = _ro_ptr(data)
    res = lib.tpuz_crc32(ptr, n, value)
    del keep
    return res


def crc32_combine(c1: int, c2: int, len2: int) -> int:
    return _load().tpuz_crc32_combine(c1, c2, len2)


def adler32_combine(a1: int, a2: int, len2: int) -> int:
    return _load().tpuz_adler32_combine(a1, a2, len2)


class LzoNativeError(ValueError):
    pass


def _in_ptr(b: bytes):
    if not b:
        return (ctypes.c_uint8 * 1)()
    return ctypes.cast(ctypes.c_char_p(b), ctypes.POINTER(ctypes.c_uint8))


def lzo1x_compress(data) -> bytes:
    lib = _load()
    b = bytes(data)
    cap = len(b) + len(b) // 16 + 128
    out = ctypes.create_string_buffer(cap)
    n = ctypes.c_uint64()
    rc = lib.tpuz_lzo1x_compress(
        _in_ptr(b), len(b), ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)),
        cap, ctypes.byref(n))
    if rc != 0:
        raise LzoNativeError(f"lzo1x_compress failed: {rc}")
    return ctypes.string_at(out, n.value)


def lzo1x_decompress(data, out_cap: int) -> bytes:
    lib = _load()
    b = bytes(data)
    out = ctypes.create_string_buffer(max(out_cap, 1))
    n = ctypes.c_uint64()
    rc = lib.tpuz_lzo1x_decompress(
        _in_ptr(b), len(b), ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)),
        out_cap, ctypes.byref(n))
    if rc != 0:
        raise LzoNativeError(f"lzo1x_decompress failed: {rc}")
    return ctypes.string_at(out, n.value)


def expand_cmds(cmds_u32: "object", out: "object") -> int:
    """Expand packed decoder commands (kind<<26|dist<<10|value) into a
    numpy uint8 buffer; returns produced byte count."""
    lib = _load()
    n = ctypes.c_uint64()
    rc = lib.tpuz_expand_cmds(
        ctypes.cast(cmds_u32.ctypes.data, ctypes.POINTER(ctypes.c_uint32)),
        cmds_u32.size,
        ctypes.cast(out.ctypes.data, ctypes.POINTER(ctypes.c_uint8)),
        out.size, ctypes.byref(n))
    if rc != 0:
        raise ValueError(f"expand_cmds failed: {rc}")
    return n.value


class InflateStream:
    """Resumable raw-DEFLATE inflater (native streaming state machine)."""

    AWAIT, FLUSH, END, MALFORMED = 0, 1, 2, -3

    def __init__(self) -> None:
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError(f"native library unavailable: {_LOAD_ERR}")
        self._h = self._lib.tpuz_inflate_new()

    def __del__(self) -> None:
        if getattr(self, "_h", None):
            self._lib.tpuz_inflate_free(self._h)
            self._h = None

    def reset(self) -> None:
        self._lib.tpuz_inflate_reset(self._h)

    def clone(self) -> "InflateStream":
        """Snapshot this decoder's full state (reference immutable-
        decoder parity, zl.ml:146-164): the copy resumes independently
        from the same stream position."""
        c = InflateStream.__new__(InflateStream)
        c._lib = self._lib
        c._h = self._lib.tpuz_inflate_clone(self._h)
        if not c._h:  # malloc failure returns NULL; never pass it on
            raise MemoryError("tpuz_inflate_clone failed")
        return c

    def unsafe_set_cursor(self, pos: int) -> None:
        """Position the 32 KiB window ring cursor directly (reference
        `unsafe_set_cursor`, de.ml:1826 / de.mli:669) — the git-delta
        flow's window-restore primitive."""
        self._lib.tpuz_inflate_set_cursor(self._h, int(pos))

    @property
    def cursor(self) -> int:
        return self._lib.tpuz_inflate_cursor(self._h)

    def reset_keep_window(self) -> None:
        """Reset for a NEW raw stream, keeping window bytes + cursor:
        decode a base object, reset_keep_window, decode a delta whose
        far distances resolve into the base (no dictionary copy)."""
        self._lib.tpuz_inflate_reset_keep_window(self._h)

    def set_dictionary(self, dict_bytes: bytes) -> None:
        b = bytes(dict_bytes)
        self._lib.tpuz_inflate_set_dictionary(self._h, _u8(b), len(b))

    def set_window_bits(self, wbits: int) -> None:
        """Restrict back-references to a 2^wbits window (decode side
        of the zlib CINFO negotiation, zl.ml:247-280)."""
        self._lib.tpuz_inflate_set_window_bits(self._h, int(wbits))

    @property
    def total_out(self) -> int:
        return self._lib.tpuz_inflate_total_out(self._h)

    def takeback(self) -> bytes:
        """Whole bytes buffered past the stream end that were consumed
        by earlier run() calls (call once after END)."""
        buf = (ctypes.c_uint8 * 8)()
        n = self._lib.tpuz_inflate_takeback(self._h, buf, 8)
        return bytes(buf[:n])

    @property
    def error(self) -> str:
        return self._lib.tpuz_inflate_error(self._h).decode()

    def run_into(self, src, out: "object", out_pos: int) -> tuple[int, int, int]:
        """Decode into a caller-owned numpy uint8 buffer starting at
        ``out_pos``; returns (status, consumed, produced).  ``src`` may
        be bytes or a contiguous numpy uint8 array — both are passed
        zero-copy (no per-call allocation/copy like :meth:`run`)."""
        sptr, slen, keep = _ro_ptr(src)
        base = out.ctypes.data + out_pos
        dptr = ctypes.cast(base, ctypes.POINTER(ctypes.c_uint8))
        spos = ctypes.c_uint64(0)
        dpos = ctypes.c_uint64(0)
        status = self._lib.tpuz_inflate_run(
            self._h, sptr, slen, ctypes.byref(spos), dptr,
            out.size - out_pos, ctypes.byref(dpos))
        del keep
        return status, spos.value, dpos.value

    def run(self, src: bytes, dst_cap: int) -> tuple[int, int, bytes]:
        """Feed ``src``; returns (status, consumed, produced_bytes)."""
        src = bytes(src)
        # zero-copy input view (the C side only reads), string_at output
        sptr = ctypes.cast(ctypes.c_char_p(src), ctypes.POINTER(ctypes.c_uint8)) \
            if src else (ctypes.c_uint8 * 1)()
        dbuf = getattr(self, "_dbuf", None)
        if dbuf is None or len(dbuf) < max(dst_cap, 1):
            dbuf = ctypes.create_string_buffer(max(dst_cap, 1))
            self._dbuf = dbuf
        dptr = ctypes.cast(dbuf, ctypes.POINTER(ctypes.c_uint8))
        spos = ctypes.c_uint64(0)
        dpos = ctypes.c_uint64(0)
        status = self._lib.tpuz_inflate_run(
            self._h, sptr, len(src), ctypes.byref(spos), dptr, dst_cap,
            ctypes.byref(dpos))
        return status, spos.value, ctypes.string_at(dbuf, dpos.value)
