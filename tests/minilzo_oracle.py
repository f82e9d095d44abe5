"""ctypes bindings for the vendored THIRD-PARTY minilzo-2.10 oracle.

The reference fuzzes its LZO codec against minilzo in both directions
(fuzz/fuzz_lzo.ml:19–39, stubs test/minilzo-2.10/stubs.c:9–41); this
module gives our tests the same independent oracle.  Builds the shared
library on demand with the system C compiler; returns None when no
compiler is available (tests skip).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).parent / "vendor" / "minilzo"
_SO = _DIR / "libminilzo_oracle.so"
_LIB = None
_TRIED = False

LZO1X_1_MEM_COMPRESS = 16384 * ctypes.sizeof(ctypes.c_void_p)

# lzo_uint is 64-bit (unsigned long / unsigned long long) on LP64
_lzo_uint = ctypes.c_uint64
_u8p = ctypes.POINTER(ctypes.c_uint8)


def load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not _SO.exists():
        try:
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", str(_DIR / "minilzo.c"),
                 "-o", str(_SO)],
                check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    lib = ctypes.CDLL(str(_SO))
    for name in ("lzo1x_1_compress", "lzo1x_decompress", "lzo1x_decompress_safe"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [_u8p, _lzo_uint, _u8p, ctypes.POINTER(_lzo_uint),
                       ctypes.c_void_p]
    _LIB = lib
    return _LIB


def _buf(data: bytes) -> ctypes.Array:
    return (ctypes.c_uint8 * max(len(data), 1)).from_buffer_copy(
        data if data else b"\x00")


def compress(data: bytes) -> bytes:
    """lzo1x_1_compress via minilzo (the format author's encoder)."""
    lib = load()
    assert lib is not None
    src = _buf(data)
    dst_cap = len(data) + len(data) // 16 + 64 + 3
    dst = (ctypes.c_uint8 * dst_cap)()
    dst_len = _lzo_uint(dst_cap)
    wrk = (ctypes.c_uint8 * LZO1X_1_MEM_COMPRESS)()
    r = lib.lzo1x_1_compress(src, len(data), dst, ctypes.byref(dst_len), wrk)
    assert r == 0, f"minilzo compress failed: {r}"
    return bytes(dst[: dst_len.value])


def decompress(data: bytes, out_cap: int) -> bytes:
    """lzo1x_decompress_safe via minilzo; raises ValueError on error."""
    lib = load()
    assert lib is not None
    src = _buf(data)
    dst = (ctypes.c_uint8 * max(out_cap, 1))()
    dst_len = _lzo_uint(out_cap)
    r = lib.lzo1x_decompress_safe(src, len(data), dst, ctypes.byref(dst_len),
                                  None)
    if r != 0:
        raise ValueError(f"minilzo decompress failed: {r}")
    return bytes(dst[: dst_len.value])
