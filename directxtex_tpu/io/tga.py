"""TGA (Truevision) container codec.

Mirrors DirectXTexTGA.cpp: 8/16/24/32-bpp truecolor, grayscale and palettized
images, RLE decompression, right-to-left / top-to-bottom origin handling, the
TGA 2.0 footer (alpha mode + gamma metadata), the all-zero-alpha->opaque
heuristic, and an uncompressed TGA 2.0 writer (the reference writer is always
uncompressed, DirectXTexTGA.cpp:18-20).

Header/byte parsing is host-side numpy; pixel decode runs through the device
pack/unpack engine.
"""

from __future__ import annotations

import dataclasses
import enum
import struct

import numpy as np

from ..formats.dxgi import FMT, DXGIFormat
from ..formats.packing import pack_image, unpack
from ..texture import TexAlphaMode, TexDimension, TexMetadata, Texture

__all__ = [
    "TGA_FLAGS", "get_metadata_from_tga_memory", "load_from_tga_memory",
    "save_to_tga_memory", "load_from_tga_file", "save_to_tga_file",
]


class TGA_FLAGS(enum.IntFlag):
    """DirectXTex.h:282-303."""
    NONE = 0
    BGR = 0x1
    ALLOW_ALL_ZERO_ALPHA = 0x2
    IGNORE_SRGB = 0x10
    FORCE_SRGB = 0x20
    FORCE_LINEAR = 0x40
    DEFAULT_SRGB = 0x80


_FOOTER_SIG = b"TRUEVISION-XFILE.\x00"
_HEADER = struct.Struct("<BBBHHBHHHHBB")  # 18 bytes

# image types
_TGA_NO_IMAGE = 0
_TGA_COLORMAPPED = 1
_TGA_TRUECOLOR = 2
_TGA_BLACK_AND_WHITE = 3
_TGA_RLE = 8


@dataclasses.dataclass
class _TGAInfo:
    width: int
    height: int
    bpp: int
    image_type: int
    rle: bool
    right_to_left: bool
    top_down: bool
    id_length: int
    cm_first: int
    cm_length: int
    cm_size: int
    format: DXGIFormat
    alpha_bits: int


def _parse_header(data: bytes, flags: TGA_FLAGS) -> _TGAInfo:
    if len(data) < _HEADER.size:
        raise ValueError("TGA: file too small for header")
    (id_len, cm_type, img_type, cm_first, cm_len, cm_size,
     _xorg, _yorg, w, h, bpp, desc) = _HEADER.unpack_from(data, 0)

    base_type = img_type & ~_TGA_RLE
    rle = bool(img_type & _TGA_RLE)

    if base_type == _TGA_COLORMAPPED:
        if cm_type != 1 or cm_size not in (24, 32) or bpp != 8:
            raise ValueError("TGA: unsupported colormap layout")
        fmt = (FMT.B8G8R8A8_UNORM if flags & TGA_FLAGS.BGR
               else FMT.R8G8B8A8_UNORM) if cm_size == 32 else (
            FMT.B8G8R8X8_UNORM if flags & TGA_FLAGS.BGR else FMT.R8G8B8A8_UNORM)
    elif base_type == _TGA_TRUECOLOR:
        if cm_type != 0:
            raise ValueError("TGA: truecolor image with colormap")
        if bpp == 16:
            fmt = FMT.B5G5R5A1_UNORM
        elif bpp == 24:
            fmt = FMT.B8G8R8X8_UNORM if flags & TGA_FLAGS.BGR else FMT.R8G8B8A8_UNORM
        elif bpp == 32:
            fmt = FMT.B8G8R8A8_UNORM if flags & TGA_FLAGS.BGR else FMT.R8G8B8A8_UNORM
        else:
            raise ValueError(f"TGA: unsupported truecolor depth {bpp}")
    elif base_type == _TGA_BLACK_AND_WHITE:
        if bpp != 8:
            raise ValueError(f"TGA: unsupported grayscale depth {bpp}")
        fmt = FMT.R8_UNORM
    elif base_type == _TGA_NO_IMAGE:
        raise ValueError("TGA: file contains no image data")
    else:
        raise ValueError(f"TGA: unknown image type {img_type}")

    if w == 0 or h == 0:
        raise ValueError("TGA: zero-sized image")

    return _TGAInfo(
        width=w, height=h, bpp=bpp, image_type=base_type, rle=rle,
        right_to_left=bool(desc & 0x10), top_down=bool(desc & 0x20),
        id_length=id_len, cm_first=cm_first, cm_length=cm_len,
        cm_size=cm_size if base_type == _TGA_COLORMAPPED else 0,
        format=fmt, alpha_bits=desc & 0xF,
    )


def _parse_footer(data: bytes, flags: TGA_FLAGS):
    """Returns (alpha_mode, is_srgb or None) from the TGA 2.0 extension area
    (DirectXTexTGA.cpp footer handling)."""
    alpha_mode = TexAlphaMode.UNKNOWN
    srgb = None
    if len(data) >= 26 and data[-18:] == _FOOTER_SIG:
        ext_off, _dev_off = struct.unpack_from("<II", data, len(data) - 26)
        if ext_off and ext_off + 495 <= len(data):
            ext = data[ext_off:ext_off + 495]
            size = struct.unpack_from("<H", ext, 0)[0]
            if size >= 495:
                gamma_num, gamma_den = struct.unpack_from("<HH", ext, 478)
                attrs = ext[494]
                if attrs in (0, 1):
                    alpha_mode = TexAlphaMode.OPAQUE
                elif attrs == 3:
                    alpha_mode = TexAlphaMode.STRAIGHT
                elif attrs == 4:
                    alpha_mode = TexAlphaMode.PREMULTIPLIED
                if gamma_den != 0:
                    g = gamma_num / gamma_den
                    srgb = abs(g - 2.2) < 0.05
    return alpha_mode, srgb


def get_metadata_from_tga_memory(data: bytes,
                                 flags: TGA_FLAGS = TGA_FLAGS.NONE) -> TexMetadata:
    """GetMetadataFromTGAMemory (DirectXTexTGA.cpp:1888)."""
    info = _parse_header(data, TGA_FLAGS(flags))
    fmt = _apply_srgb_meta(data, info.format, TGA_FLAGS(flags))
    alpha_mode, _ = _parse_footer(data, TGA_FLAGS(flags))
    return TexMetadata(width=info.width, height=info.height,
                       format=fmt, misc_flags2=int(alpha_mode),
                       dimension=TexDimension.TEXTURE2D)


def _apply_srgb_meta(data: bytes, fmt: DXGIFormat, flags: TGA_FLAGS) -> DXGIFormat:
    from ..formats.traits import make_srgb
    if flags & TGA_FLAGS.IGNORE_SRGB:
        return fmt
    _, srgb = _parse_footer(data, flags)
    if srgb is None and (flags & TGA_FLAGS.DEFAULT_SRGB):
        srgb = True
    if srgb:
        return make_srgb(fmt)
    return fmt


def _decode_rle(data: np.ndarray, bytes_pp: int, count: int) -> np.ndarray:
    """Decode TGA RLE packets to `count` pixels of bytes_pp each.

    Uses the native C++ codec when available (directxtex_tpu.native), with
    this Python implementation as the fallback."""
    from .. import native
    fast = native.tga_rle_decode(data.tobytes(), count, bytes_pp)
    if fast is not None:
        return fast
    out = np.empty(count * bytes_pp, np.uint8)
    si = 0
    di = 0
    n = len(data)
    while di < count * bytes_pp:
        if si >= n:
            raise ValueError("TGA: RLE data truncated")
        # int() avoids numpy uint8 wraparound in the size arithmetic below
        hdr = int(data[si])
        si += 1
        run = (hdr & 0x7F) + 1
        if hdr & 0x80:  # run-length packet
            if si + bytes_pp > n:
                raise ValueError("TGA: RLE run truncated")
            px = data[si:si + bytes_pp]
            si += bytes_pp
            end = min(di + run * bytes_pp, count * bytes_pp)
            out[di:end] = np.tile(px, run)[: end - di]
            di = end
        else:  # raw packet
            nbytes = run * bytes_pp
            if si + nbytes > n:
                raise ValueError("TGA: RLE raw packet truncated")
            end = min(di + nbytes, count * bytes_pp)
            out[di:end] = data[si:si + (end - di)]
            si += nbytes
            di = end
    return out


def load_from_tga_memory(data: bytes,
                         flags: TGA_FLAGS = TGA_FLAGS.NONE) -> Texture:
    """LoadFromTGAMemory (DirectXTexTGA.cpp:2008)."""
    flags = TGA_FLAGS(flags)
    info = _parse_header(data, flags)
    offset = _HEADER.size + info.id_length

    cm_bytes = 0
    palette = None
    if info.image_type == _TGA_COLORMAPPED:
        entry_bytes = info.cm_size // 8
        cm_bytes = info.cm_length * entry_bytes
        raw_pal = np.frombuffer(data, np.uint8, cm_bytes, offset).reshape(
            info.cm_length, entry_bytes)
        # palette entries are BGR(A) on disk
        palette = np.zeros((info.cm_first + info.cm_length, 4), np.uint8)
        palette[:, 3] = 255
        palette[info.cm_first:, 0] = raw_pal[:, 2]
        palette[info.cm_first:, 1] = raw_pal[:, 1]
        palette[info.cm_first:, 2] = raw_pal[:, 0]
        if entry_bytes == 4:
            palette[info.cm_first:, 3] = raw_pal[:, 3]
    offset += cm_bytes

    npix = info.width * info.height
    bytes_pp = info.bpp // 8
    raw = np.frombuffer(data, np.uint8, len(data) - offset, offset)
    if info.rle:
        pixels = _decode_rle(raw, bytes_pp, npix)
    else:
        need = npix * bytes_pp
        if len(raw) < need:
            raise ValueError("TGA: pixel data truncated")
        pixels = raw[:need].copy()

    px = pixels.reshape(info.height, info.width, bytes_pp)
    # origin handling: default is bottom-left
    if not info.top_down:
        px = px[::-1]
    if info.right_to_left:
        px = px[:, ::-1]

    if info.image_type == _TGA_COLORMAPPED:
        rgba8 = palette[px[..., 0]]
        if not (flags & TGA_FLAGS.BGR):
            fmt_wire = FMT.R8G8B8A8_UNORM
            wire = rgba8
        else:
            fmt_wire = FMT.B8G8R8A8_UNORM
            wire = rgba8[..., [2, 1, 0, 3]]
        arr = unpack(fmt_wire, np.ascontiguousarray(wire).reshape(-1), npix)
    else:
        fmt_wire = info.format
        if info.bpp == 24:
            # expand 24bpp BGR -> 32bpp; disk order is B,G,R
            expanded = np.empty((info.height, info.width, 4), np.uint8)
            expanded[..., :3] = px
            expanded[..., 3] = 255
            if fmt_wire == FMT.R8G8B8A8_UNORM:
                # swizzle BGR -> RGB on host (cheap byte shuffle)
                expanded = expanded[..., [2, 1, 0, 3]]
                wire_fmt = FMT.R8G8B8A8_UNORM
            else:
                wire_fmt = FMT.B8G8R8X8_UNORM
            arr = unpack(wire_fmt, np.ascontiguousarray(expanded).reshape(-1), npix)
        elif info.bpp == 32:
            if fmt_wire == FMT.R8G8B8A8_UNORM:
                px = px[..., [2, 1, 0, 3]]  # disk BGRA -> RGBA
                arr = unpack(FMT.R8G8B8A8_UNORM,
                             np.ascontiguousarray(px).reshape(-1), npix)
            else:
                arr = unpack(FMT.B8G8R8A8_UNORM,
                             np.ascontiguousarray(px).reshape(-1), npix)
        else:  # 8bpp gray or 16bpp 5551 pass straight to the codec
            arr = unpack(fmt_wire, np.ascontiguousarray(px).reshape(-1), npix)

    arr = arr.reshape(info.height, info.width, 4)

    alpha_mode, _ = _parse_footer(data, flags)
    import jax.numpy as jnp
    has_alpha_bits = info.bpp in (16, 32) or (
        info.image_type == _TGA_COLORMAPPED and info.cm_size == 32)
    if has_alpha_bits and not (flags & TGA_FLAGS.ALLOW_ALL_ZERO_ALPHA):
        # all-zero-alpha -> opaque heuristic (DirectXTexTGA.cpp SetAlphaChannelToOpaque)
        all_zero = jnp.all(arr[..., 3] == 0.0)
        arr = arr.at[..., 3].set(jnp.where(all_zero, 1.0, arr[..., 3]))
        # reference marks such files opaque
    fmt = _apply_srgb_meta(data, info.format, flags)
    meta = TexMetadata(width=info.width, height=info.height, format=fmt,
                       misc_flags2=int(alpha_mode),
                       dimension=TexDimension.TEXTURE2D)
    return Texture(meta, [arr[None]])


_SUPPORTED_SAVE = {
    FMT.R8G8B8A8_UNORM: 32, FMT.R8G8B8A8_UNORM_SRGB: 32,
    FMT.B8G8R8A8_UNORM: 32, FMT.B8G8R8A8_UNORM_SRGB: 32,
    FMT.B8G8R8X8_UNORM: 24, FMT.B8G8R8X8_UNORM_SRGB: 24,
    FMT.B5G5R5A1_UNORM: 16, FMT.R8_UNORM: 8, FMT.A8_UNORM: 8,
}


def save_to_tga_memory(tex: Texture, flags: TGA_FLAGS = TGA_FLAGS.NONE,
                       mip: int = 0, item: int = 0) -> bytes:
    """SaveToTGAMemory (DirectXTexTGA.cpp:2249): uncompressed TGA 2.0."""
    flags = TGA_FLAGS(flags)
    fmt = tex.metadata.format
    if fmt not in _SUPPORTED_SAVE:
        raise ValueError(f"TGA save: unsupported format {fmt!r}")
    bpp = _SUPPORTED_SAVE[fmt]
    img = np.asarray(tex.image(mip, item))
    h, w = img.shape[:2]

    if bpp == 8:
        chan = 3 if fmt == FMT.A8_UNORM else 0
        wire = np.asarray(pack_image(FMT.R8_UNORM, np.ascontiguousarray(
            np.repeat(img[..., chan:chan + 1], 4, axis=-1))))
        px = wire.reshape(h, w, 1)
        img_type = _TGA_BLACK_AND_WHITE
        desc = 0
    elif bpp == 16:
        wire = np.asarray(pack_image(FMT.B5G5R5A1_UNORM, img))
        px = wire.reshape(h, w, 2)
        img_type = _TGA_TRUECOLOR
        desc = 1  # 1 alpha bit
    else:
        rgba = np.asarray(pack_image(FMT.R8G8B8A8_UNORM, img)).reshape(h, w, 4)
        if bpp == 24:
            px = rgba[..., [2, 1, 0]]  # disk is BGR
            desc = 0
        else:
            px = rgba[..., [2, 1, 0, 3]]  # disk is BGRA
            desc = 8  # 8 alpha bits
        img_type = _TGA_TRUECOLOR

    header = _HEADER.pack(0, 0, img_type, 0, 0, 0, 0, 0, w, h, bpp, desc | 0x20)
    body = np.ascontiguousarray(px).tobytes()  # top-down (desc bit 5 set)

    # TGA 2.0 extension area + footer
    from ..formats.traits import is_srgb
    ext = bytearray(495)
    struct.pack_into("<H", ext, 0, 495)
    srgb_out = is_srgb(fmt) or bool(flags & TGA_FLAGS.FORCE_SRGB)
    if flags & TGA_FLAGS.FORCE_LINEAR:
        srgb_out = False
    struct.pack_into("<HH", ext, 478, 22 if srgb_out else 10, 10)
    alpha_mode = tex.metadata.alpha_mode()
    if bpp in (16, 32):
        attrs = 4 if alpha_mode == TexAlphaMode.PREMULTIPLIED else 3
    else:
        attrs = 0
    ext[494] = attrs
    ext_offset = len(header) + len(body)
    footer = struct.pack("<II", ext_offset, 0) + _FOOTER_SIG

    return header + body + bytes(ext) + footer


def load_from_tga_file(path, flags: TGA_FLAGS = TGA_FLAGS.NONE) -> Texture:
    with open(path, "rb") as f:
        return load_from_tga_memory(f.read(), flags)


def save_to_tga_file(tex: Texture, path,
                     flags: TGA_FLAGS = TGA_FLAGS.NONE) -> None:
    with open(path, "wb") as f:
        f.write(save_to_tga_memory(tex, flags))
