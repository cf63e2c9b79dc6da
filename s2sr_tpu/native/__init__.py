"""Native (C++) runtime components, loaded via ctypes.

Build: ``make -C s2sr_tpu/native`` (g++, libpng, zlib). The loader
auto-builds on first use when a toolchain is present; every consumer
has a pure-Python fallback, so the framework works without it.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libs2sr_native.so"
_lib: "Optional[ctypes.CDLL]" = None
_load_attempted = False


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it on demand; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_DIR)], capture_output=True,
                           check=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.s2sr_png_encode.restype = ctypes.c_int
        lib.s2sr_png_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib
