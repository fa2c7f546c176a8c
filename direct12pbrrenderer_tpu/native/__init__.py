"""Native C++ runtime library loader (ctypes).

Builds `libmrtpu.so` on demand from the sources in this directory (g++ is
part of the baked toolchain); falls back gracefully when no compiler is
available — every native component has a pure-Python counterpart.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
_LIB: ctypes.CDLL | None = None
_TRIED = False


def load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _DIR / "libmrtpu.so"
    srcs = list(_DIR.glob("*.cpp"))
    try:
        if not so.exists() or any(s.stat().st_mtime > so.stat().st_mtime for s in srcs):
            subprocess.run(
                ["make", "-C", str(_DIR)], check=True, capture_output=True, timeout=300
            )
        _LIB = ctypes.CDLL(str(so))
        _configure(_LIB)
    except (subprocess.SubprocessError, OSError, FileNotFoundError):
        _LIB = None
    return _LIB


def _configure(lib: ctypes.CDLL) -> None:
    from ctypes import POINTER, c_float, c_int, c_int32, c_int64, c_uint8, c_uint16, c_uint64, c_void_p

    lib.bc1_decode.argtypes = [POINTER(c_uint8), c_int, c_int, POINTER(c_uint8)]
    lib.bc1_encode.argtypes = [POINTER(c_uint8), c_int, c_int, POINTER(c_uint8)]
    lib.bc6h_decode.argtypes = [POINTER(c_uint8), c_int, c_int, POINTER(c_uint16)]
    lib.bc6h_encode.argtypes = [POINTER(c_uint16), c_int, c_int, POINTER(c_uint8)]

    lib.tlsf_create.restype = c_void_p
    lib.tlsf_create.argtypes = [c_uint64, c_uint64]
    lib.tlsf_destroy.argtypes = [c_void_p]
    lib.tlsf_alloc.restype = c_int64
    lib.tlsf_alloc.argtypes = [c_void_p, c_uint64, c_uint64]
    lib.tlsf_free.restype = c_int
    lib.tlsf_free.argtypes = [c_void_p, c_uint64]
    lib.tlsf_used.restype = c_uint64
    lib.tlsf_used.argtypes = [c_void_p]
    lib.tlsf_total.restype = c_uint64
    lib.tlsf_total.argtypes = [c_void_p]

    lib.octree_create.restype = c_void_p
    lib.octree_create.argtypes = [POINTER(c_float), POINTER(c_float)]
    lib.octree_destroy.argtypes = [c_void_p]
    lib.octree_add.restype = c_int32
    lib.octree_add.argtypes = [c_void_p, POINTER(c_float), POINTER(c_float)]
    lib.octree_update.argtypes = [c_void_p, c_int32, POINTER(c_float), POINTER(c_float)]
    lib.octree_remove.argtypes = [c_void_p, c_int32]
    lib.octree_cull.restype = c_int
    lib.octree_cull.argtypes = [c_void_p, POINTER(c_float), POINTER(c_int32), c_int]
    lib.octree_node_count.restype = c_int
    lib.octree_node_count.argtypes = [c_void_p]
