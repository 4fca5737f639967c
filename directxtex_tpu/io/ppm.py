"""Portable PixMap / FloatMap codecs (Texconv/PortablePixMap.cpp).

PPM: P3 (ascii) and P6 (binary), 8/16-bit maxval -> R8G8B8A8/R16G16B16A16.
PFM: 'PF' (color) / 'Pf' (gray) float maps with sign-of-scale endianness ->
R32G32B32A32_FLOAT / R32_FLOAT.
"""

from __future__ import annotations

import numpy as np

from ..formats.dxgi import FMT
from ..texture import TexDimension, TexMetadata, Texture

__all__ = ["load_from_ppm_memory", "save_to_ppm_memory",
           "load_from_pfm_memory", "save_to_pfm_memory",
           "load_from_ppm_file", "save_to_ppm_file",
           "load_from_pfm_file", "save_to_pfm_file"]


def _read_tokens(data: bytes, count: int, pos: int):
    """Read whitespace/comment-delimited tokens (PPM header grammar)."""
    toks = []
    n = len(data)
    while len(toks) < count:
        while pos < n and data[pos:pos + 1].isspace():
            pos += 1
        if pos < n and data[pos:pos + 1] == b"#":
            eol = data.find(b"\n", pos)
            pos = n if eol < 0 else eol + 1
            continue
        start = pos
        while pos < n and not data[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("PPM: truncated header")
        toks.append(data[start:pos])
    return toks, pos


def load_from_ppm_memory(data: bytes) -> Texture:
    if data[:2] not in (b"P3", b"P6"):
        raise ValueError("PPM: bad magic (want P3 or P6)")
    ascii_mode = data[:2] == b"P3"
    toks, pos = _read_tokens(data, 3, 2)
    w, h, maxval = (int(t) for t in toks)
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        raise ValueError("PPM: invalid dimensions or maxval")
    npix = w * h
    if ascii_mode:
        vals, _ = _read_tokens(data, npix * 3, pos)
        arr = np.array([int(v) for v in vals], np.float32).reshape(h, w, 3)
    else:
        pos += 1  # single whitespace after maxval
        if maxval < 256:
            raw = np.frombuffer(data, np.uint8, npix * 3, pos)
        else:
            raw = np.frombuffer(data, ">u2", npix * 3, pos)
        arr = raw.astype(np.float32).reshape(h, w, 3)
    arr = arr / np.float32(maxval)
    rgba = np.concatenate([arr, np.ones((h, w, 1), np.float32)], -1)
    fmt = FMT.R8G8B8A8_UNORM if maxval < 256 else FMT.R16G16B16A16_UNORM
    return Texture(TexMetadata(width=w, height=h, format=fmt), [rgba[None]])


def save_to_ppm_memory(tex: Texture, mip: int = 0, item: int = 0) -> bytes:
    img = np.asarray(tex.image(mip, item))
    h, w = img.shape[:2]
    u8 = np.clip(np.round(img[..., :3] * 255.0), 0, 255).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + u8.tobytes()


def load_from_pfm_memory(data: bytes) -> Texture:
    if data[:2] not in (b"PF", b"Pf"):
        raise ValueError("PFM: bad magic (want PF or Pf)")
    color = data[:2] == b"PF"
    toks, pos = _read_tokens(data, 3, 2)
    w, h = int(toks[0]), int(toks[1])
    scale = float(toks[2])
    pos += 1
    nchan = 3 if color else 1
    dtype = "<f4" if scale < 0 else ">f4"
    raw = np.frombuffer(data, dtype, w * h * nchan, pos)
    arr = raw.astype(np.float32).reshape(h, w, nchan)
    arr = arr[::-1]  # PFM rows are bottom-up
    if abs(scale) not in (0.0, 1.0):
        arr = arr * np.float32(abs(scale))
    if color:
        rgba = np.concatenate([arr, np.ones((h, w, 1), np.float32)], -1)
        fmt = FMT.R32G32B32A32_FLOAT
    else:
        rgba = np.concatenate(
            [arr, np.zeros((h, w, 2), np.float32),
             np.ones((h, w, 1), np.float32)], -1)
        fmt = FMT.R32_FLOAT
    return Texture(TexMetadata(width=w, height=h, format=fmt), [rgba[None]])


def save_to_pfm_memory(tex: Texture, mip: int = 0, item: int = 0) -> bytes:
    img = np.asarray(tex.image(mip, item))
    h, w = img.shape[:2]
    body = img[::-1, :, :3].astype("<f4").tobytes()
    return b"PF\n%d %d\n-1.0\n" % (w, h) + body


def load_from_ppm_file(path) -> Texture:
    with open(path, "rb") as f:
        return load_from_ppm_memory(f.read())


def save_to_ppm_file(tex: Texture, path) -> None:
    with open(path, "wb") as f:
        f.write(save_to_ppm_memory(tex))


def load_from_pfm_file(path) -> Texture:
    with open(path, "rb") as f:
        return load_from_pfm_memory(f.read())


def save_to_pfm_file(tex: Texture, path) -> None:
    with open(path, "wb") as f:
        f.write(save_to_pfm_memory(tex))


def load_from_phm_memory(data: bytes) -> Texture:
    """PHM (Portable Half Map): 'PH' color / 'Ph' mono, binary half floats
    (LoadFromPortablePixMapHDR half16 path, Texconv/PortablePixMap.cpp:
    447-481; scale sign selects endianness like PFM)."""
    if data[:2] not in (b"PH", b"Ph"):
        raise ValueError("PHM: bad magic (want PH or Ph)")
    color = data[:2] == b"PH"
    toks, pos = _read_tokens(data, 3, 2)
    w, h = int(toks[0]), int(toks[1])
    scale = float(toks[2])
    pos += 1
    nchan = 3 if color else 1
    dtype = "<f2" if scale < 0 else ">f2"
    raw = np.frombuffer(data, dtype, w * h * nchan, pos)
    arr = raw.astype(np.float32).reshape(h, w, nchan)
    arr = arr[::-1]  # rows are bottom-up like PFM
    if abs(scale) not in (0.0, 1.0):
        arr = arr * np.float32(abs(scale))
    if color:
        rgba = np.concatenate([arr, np.ones((h, w, 1), np.float32)], -1)
        fmt = FMT.R16G16B16A16_FLOAT
    else:
        rgba = np.concatenate(
            [arr, np.zeros((h, w, 2), np.float32),
             np.ones((h, w, 1), np.float32)], -1)
        fmt = FMT.R16_FLOAT
    return Texture(TexMetadata(width=w, height=h, format=fmt), [rgba[None]])


def save_to_phm_memory(tex: Texture, mip: int = 0, item: int = 0) -> bytes:
    img = np.asarray(tex.image(mip, item))
    h, w = img.shape[:2]
    body = img[::-1, :, :3].astype("<f2").tobytes()
    return b"PH\n%d %d\n-1.0\n" % (w, h) + body


def load_from_phm_file(path) -> Texture:
    with open(path, "rb") as f:
        return load_from_phm_memory(f.read())


def save_to_phm_file(tex: Texture, path) -> None:
    with open(path, "wb") as f:
        f.write(save_to_phm_memory(tex))
