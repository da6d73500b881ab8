"""Native (C++) runtime components, loaded via ctypes.

Build happens lazily on first use (g++ -O3 -shared); artifacts are cached
next to the sources. Each component has a numpy fallback so the framework
works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build_and_load(name: str) -> ctypes.CDLL:
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        so = os.path.join(_DIR, f"lib{name}.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", src, "-o", so]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        _LIBS[name] = lib
        return lib


def get_mesh_extract_lib():
    """libmesh_extract with ctypes signatures set; raises on build failure."""
    lib = _build_and_load("mesh_extract")
    c = ctypes
    lib.mesh_extract.restype = c.c_int
    lib.mesh_extract.argtypes = [
        c.POINTER(c.c_float), c.c_int64, c.c_int64, c.c_int64, c.c_float,
        c.POINTER(c.c_float), c.POINTER(c.c_float),
        c.POINTER(c.POINTER(c.c_float)), c.POINTER(c.c_int64),
        c.POINTER(c.POINTER(c.c_int32)), c.POINTER(c.c_int64),
    ]
    lib.mesh_free.restype = None
    lib.mesh_free.argtypes = [c.c_void_p]
    return lib
