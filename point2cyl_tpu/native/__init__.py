"""Native (C++) runtime components, bound via ctypes.

Built on demand with g++ and cached next to the sources; every consumer
has a pure-python fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict = {}


def _build(name: str) -> str:
    src = os.path.join(_DIR, f"{name}.cpp")
    out = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        src, "-o", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load(name: str) -> ctypes.CDLL | None:
    """Build (if needed) and load a native library; None when unavailable."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        try:
            lib = ctypes.CDLL(_build(name))
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            lib = None
        _LIBS[name] = lib
        return lib
