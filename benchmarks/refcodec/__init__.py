"""Build + bind the REFERENCE BC codec for ground-truth comparison.

The reference's block codecs (BC.cpp / BC4BC5.cpp / BC6HBC7.cpp) are
pure functions over 16 RGBA texels with no real platform dependencies —
only DirectXMath. `shim/` provides an original, minimal scalar
DirectXMath/DirectXPackedVector/DirectXTexP substitute (written here,
not copied), so the reference translation units compile unmodified on
Linux. Reference sources are copied from /root/reference into a scratch
build directory at build time and are never checked in; neither is the
resulting shared library.

This makes the quality gates in BASELINE.md directly measurable:
decode bit-exactness and encode PSNR are compared against the actual
reference codec, not a reimplementation of it. See
tests/test_refparity.py (auto-skipped when the reference tree or a
compiler is unavailable).
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF_DIR = os.environ.get("DIRECTXTEX_REFERENCE_PATH",
                          "/root/reference/DirectXTex")
_REF_TUS = ["BC.h", "BC.cpp", "BC4BC5.cpp", "BC6HBC7.cpp"]
_SO = os.path.join(tempfile.gettempdir(), "directxtex_tpu_ref_bc.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        srcs = [os.path.join(_REF_DIR, f) for f in _REF_TUS]
        shims = [os.path.join(_HERE, "shim", f) for f in
                 ("DirectXMath.h", "DirectXPackedVector.h",
                  "DirectXTexP.h", "driver.cpp")]
        if not all(os.path.exists(p) for p in srcs):
            return False
        newest = max(os.path.getmtime(p) for p in srcs + shims)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= newest:
            return True
        with tempfile.TemporaryDirectory() as bd:
            for p in srcs + shims:
                shutil.copy(p, bd)
            out = os.path.join(bd, "libref_bc.so")
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-I", bd,
                 os.path.join(bd, "BC.cpp"), os.path.join(bd, "BC4BC5.cpp"),
                 os.path.join(bd, "BC6HBC7.cpp"),
                 os.path.join(bd, "driver.cpp"), "-o", out],
                check=True, capture_output=True, timeout=300)
            shutil.move(out, _SO)
        return True
    except Exception:
        return False


def get_lib():
    """ctypes handle to the compiled reference codec, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.ref_encode.restype = ctypes.c_int
        lib.ref_encode.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_float, ctypes.c_uint32]
        lib.ref_decode.restype = ctypes.c_int
        lib.ref_decode.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


# codec ids understood by the driver
BC1, BC2, BC3, BC4U, BC5U, BC6HU, BC7 = 1, 2, 3, 4, 5, 6, 7
BC4S, BC5S, BC6HS = 14, 15, 16
_BYTES = {BC1: 8, BC4U: 8, BC4S: 8}


def encode(codec: int, blocks, threshold: float = 0.5, flags: int = 0):
    """Reference D3DXEncodeBC*: [N, 16, 4] f32 -> [N, 8|16] u8."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    px = np.ascontiguousarray(blocks, np.float32)
    n = px.shape[0]
    out = np.empty((n, _BYTES.get(codec, 16)), np.uint8)
    rc = lib.ref_encode(
        codec, px.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threshold, flags)
    if rc != 0:
        raise ValueError(f"ref_encode({codec}) failed")
    return out


def decode(codec: int, bc):
    """Reference D3DXDecodeBC*: [N, 8|16] u8 -> [N, 16, 4] f32."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    bc = np.ascontiguousarray(bc, np.uint8)
    n = bc.shape[0]
    px = np.empty((n, 16, 4), np.float32)
    rc = lib.ref_decode(
        codec, bc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        px.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"ref_decode({codec}) failed")
    return px
