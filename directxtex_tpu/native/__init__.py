"""Native host-side runtime components.

The reference's container parsing and RLE codecs are C++ (DirectXTexTGA.cpp,
DirectXTexHDR.cpp); here the byte-stream hot paths compile once from
rle_codec.cpp into a shared library bound via ctypes. Pure-Python fallbacks
in the io/ modules keep everything working if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_HERE, "rle_codec.cpp"),
         os.path.join(_HERE, "dither.cpp"),
         os.path.join(_HERE, "piz.cpp")]
_SO = os.path.join(_HERE, "librle_codec.so")

_EXR_SRC = os.path.join(_HERE, "exr_openexr.cpp")
_EXR_SO = os.path.join(_HERE, "libexr_openexr.so")

_lib = None
_tried = False
_exr_lib = None
_exr_tried = False


def _build() -> bool:
    try:
        src_mtime = max(os.path.getmtime(s) for s in _SRCS)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_mtime:
            return True
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", *_SRCS, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.tga_rle_decode.restype = ctypes.c_longlong
        lib.tga_rle_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong, ctypes.c_int]
        lib.hdr_decode_scanlines.restype = ctypes.c_int
        lib.hdr_decode_scanlines.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.hdr_encode_rle_channel.restype = ctypes.c_longlong
        lib.hdr_encode_rle_channel.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.fs_dither.restype = None
        lib.fs_dither.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.piz_huf_uncompress.restype = ctypes.c_int
        lib.piz_huf_uncompress.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_longlong]
        lib.piz_huf_compress.restype = ctypes.c_longlong
        lib.piz_huf_compress.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _build_exr() -> bool:
    """Compile the optional OpenEXR adapter shim (needs libopenexr-dev)."""
    try:
        if (os.path.exists(_EXR_SO)
                and os.path.getmtime(_EXR_SO) >= os.path.getmtime(_EXR_SRC)):
            return True
        if not os.path.isdir("/usr/include/OpenEXR"):
            return False
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", _EXR_SRC, "-o", _EXR_SO,
             "-I/usr/include/OpenEXR", "-I/usr/include/Imath",
             "-lOpenEXR", "-lIlmThread", "-lIex", "-lImath"],
            check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def get_openexr_lib():
    """The official-OpenEXR adapter shim, or None if unavailable.

    Mirrors the reference's own optional dependency: its EXR adapter
    (Auxiliary/DirectXTexEXR.cpp) is a thin RgbaInputFile/RgbaOutputFile
    bridge over this same library.
    """
    global _exr_lib, _exr_tried
    if _exr_lib is not None or _exr_tried:
        return _exr_lib
    _exr_tried = True
    if not _build_exr():
        return None
    try:
        lib = ctypes.CDLL(_EXR_SO)
        lib.exr_openexr_read_dims.restype = ctypes.c_int
        lib.exr_openexr_read_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.exr_openexr_read_half.restype = ctypes.c_int
        lib.exr_openexr_read_half.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint16)]
        lib.exr_openexr_write_half.restype = ctypes.c_longlong
        lib.exr_openexr_write_half.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_char), ctypes.c_longlong]
        _exr_lib = lib
    except OSError:
        _exr_lib = None
    return _exr_lib


def openexr_read_half(data: bytes):
    """Decode an EXR byte stream via the official library.

    Returns [H, W, 4] uint16 half bits, or None if the shim is
    unavailable. Raises ValueError on decode failure.
    """
    import numpy as np
    lib = get_openexr_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.exr_openexr_read_dims(data, len(data),
                                 ctypes.byref(w), ctypes.byref(h)) != 0:
        raise ValueError("EXR: OpenEXR could not parse the stream")
    out = np.empty((h.value, w.value, 4), np.uint16)
    if lib.exr_openexr_read_half(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))) != 0:
        raise ValueError("EXR: OpenEXR decode failed")
    return out


def openexr_write_half(halves, compression: int,
                       dwa_level: float = 0.0) -> bytes | None:
    """Encode [H, W, 4] half bits via the official library, or None."""
    import numpy as np
    lib = get_openexr_lib()
    if lib is None:
        return None
    halves = np.ascontiguousarray(halves, np.uint16)
    h, w = halves.shape[:2]
    cap = halves.nbytes * 2 + (1 << 16)
    out = ctypes.create_string_buffer(cap)
    n = lib.exr_openexr_write_half(
        halves.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        w, h, compression, dwa_level, out, cap)
    if n == 0:
        raise ValueError("EXR: OpenEXR encode failed")
    if n < 0:
        raise ValueError("EXR: OpenEXR encode overflow")
    return out.raw[:n]


def tga_rle_decode(data: bytes, count: int, bytes_pp: int):
    """Native TGA RLE decode; returns np.uint8 array or None if unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(count * bytes_pp, np.uint8)
    consumed = lib.tga_rle_decode(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        count, bytes_pp)
    if consumed < 0:
        raise ValueError("TGA: RLE data truncated")
    return out


def hdr_decode_scanlines(data: bytes, offset: int, width: int, height: int):
    """Native HDR scanline decode -> [H, W, 4] u8 RGBE, or None."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((height, width, 4), np.uint8)
    rc = lib.hdr_decode_scanlines(
        data, len(data), offset, width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError("HDR: invalid or truncated scanline data")
    return out


def hdr_encode_rle_channel(ch) -> bytes | None:
    """Native new-style RLE encode of one channel row, or None."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    ch = np.ascontiguousarray(ch, np.uint8)
    out = np.empty(len(ch) * 2 + 2, np.uint8)
    n = lib.hdr_encode_rle_channel(
        ch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(ch),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out[:n].tobytes()


def piz_huf_uncompress(data: bytes, n_raw: int):
    """Native PIZ Huffman decode -> np.uint16[n_raw], or None."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(n_raw, np.uint16)
    rc = lib.piz_huf_uncompress(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n_raw)
    if rc != 0:
        raise ValueError(f"EXR: corrupt PIZ huffman stream ({rc})")
    return out


def piz_huf_compress(raw) -> bytes | None:
    """Native PIZ Huffman encode of u16 data, or None."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint16)
    # header + packed table + worst-case body (58-bit codes + rlc chains)
    cap = 20 + (len(raw) + 65537) * 8 + 64
    out = np.empty(cap, np.uint8)
    n = lib.piz_huf_compress(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise ValueError("EXR: PIZ huffman encode overflow")
    return out[:n].tobytes()


def fs_dither(img, scale, clampzero: bool):
    """Native Floyd-Steinberg dither of one [H, W, 4] f32 image in place.
    Returns the quantized-normalized array, or None if unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    sc = np.ascontiguousarray(scale, np.float32)
    lib.fs_dither(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.shape[0], img.shape[1],
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        1 if clampzero else 0)
    return img
