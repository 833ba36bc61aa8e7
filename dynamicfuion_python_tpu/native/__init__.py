"""Native (C++) runtime components, loaded via ctypes.

``libntio.so`` — pthread-parallel zlib codec for tensor/voxel-grid
serialization (the reference's ``cpp/io`` role). Built on demand with g++;
callers fall back to pure-Python zlib when the toolchain or build is
unavailable, so the native path is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libntio.so"
_lib = None
_build_attempted = False


def build_library(force: bool = False) -> bool:
    """Compile libntio.so with g++ (returns True on success)."""
    global _build_attempted
    _build_attempted = True
    if _LIB_PATH.exists() and not force:
        return True
    src = _DIR / "ntio.cpp"
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(src),
        "-o",
        str(_LIB_PATH),
        "-lz",
        "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native codec; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        if _build_attempted or not build_library():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    u64 = ctypes.c_uint64
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ntio_compress_bound.restype = u64
    lib.ntio_compress_bound.argtypes = [u64, ctypes.c_uint32]
    lib.ntio_compress.restype = u64
    lib.ntio_compress.argtypes = [
        u8p, u64, u8p, u64, ctypes.c_int, ctypes.c_uint32, ctypes.c_int32
    ]
    lib.ntio_raw_size.restype = u64
    lib.ntio_raw_size.argtypes = [u8p, u64]
    lib.ntio_decompress.restype = u64
    lib.ntio_decompress.argtypes = [u8p, u64, u8p, u64, ctypes.c_int32]
    _lib = lib
    return lib


def compress(data: bytes, level: int = 6, chunk_size: int = 1 << 22) -> bytes | None:
    """Parallel-compress ``data``; None if the native codec is unavailable."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    cap = int(lib.ntio_compress_bound(len(data), chunk_size))
    dst = np.empty(cap, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    n = lib.ntio_compress(
        src.ctypes.data_as(u8p), len(data),
        dst.ctypes.data_as(u8p), cap, level, chunk_size, 0,
    )
    if n == 0:
        return None
    return dst[:n].tobytes()


def decompress(blob: bytes) -> bytes | None:
    import numpy as np

    lib = load()
    if lib is None:
        return None
    src = np.frombuffer(blob, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    raw = int(lib.ntio_raw_size(src.ctypes.data_as(u8p), len(blob)))
    if raw == 0:
        return None
    dst = np.empty(raw, np.uint8)
    n = lib.ntio_decompress(
        src.ctypes.data_as(u8p), len(blob), dst.ctypes.data_as(u8p), raw, 0
    )
    if n != raw:
        return None
    return dst.tobytes()
