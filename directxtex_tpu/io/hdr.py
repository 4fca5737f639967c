"""Radiance HDR (.hdr, RGBE) container codec.

Mirrors DirectXTexHDR.cpp: '#?RADIANCE'/'#?RGBE' signatures, only
FORMAT=32-bit_rle_rgbe (DirectXTexHDR.cpp:46-60), only '-Y h +X w'
orientation (:14-26), EXPOSURE tag applied on load (:175-202), adaptive
new-style RLE plus old-style run support on decode (:755-885), new-style RLE
on encode (:413+). Pixels decode to R32G32B32A32_FLOAT with
value = ldexp(mantissa + 0.5, e - 136) / exposure (:894-896).
"""

from __future__ import annotations

import numpy as np

from ..formats.dxgi import FMT
from ..texture import TexDimension, TexMetadata, Texture

__all__ = [
    "get_metadata_from_hdr_memory", "load_from_hdr_memory",
    "save_to_hdr_memory", "load_from_hdr_file", "save_to_hdr_file",
]


def _parse_header(data: bytes):
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError("HDR: missing Radiance signature")
    # scan header lines
    pos = 0
    exposure = 1.0
    found_format = False
    n = len(data)
    # find end of signature line
    while pos < n and data[pos] not in (0x0A,):
        pos += 1
    pos += 1
    while pos < n:
        eol = data.find(b"\n", pos)
        if eol < 0:
            raise ValueError("HDR: truncated header")
        line = data[pos:eol].strip()
        pos = eol + 1
        if not line:
            break  # blank line ends header
        if line.startswith(b"#"):
            continue
        if line.startswith(b"FORMAT="):
            fmtv = line[len(b"FORMAT="):].strip()
            if fmtv != b"32-bit_rle_rgbe":
                raise ValueError(f"HDR: unsupported FORMAT {fmtv!r}")
            found_format = True
        elif line.startswith(b"EXPOSURE="):
            try:
                e = float(line[len(b"EXPOSURE="):])
            except ValueError:
                e = 0.0
            if 1e-12 <= e <= 1e12:
                # strange exposure values are ignored (DirectXTexHDR.cpp:199)
                exposure *= e
    if not found_format:
        raise ValueError("HDR: FORMAT line not found")
    # resolution line
    eol = data.find(b"\n", pos)
    if eol < 0:
        raise ValueError("HDR: missing resolution line")
    res = data[pos:eol].split()
    pos = eol + 1
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError("HDR: only '-Y height +X width' orientation supported")
    height = int(res[1])
    width = int(res[3])
    if width == 0 or height == 0:
        raise ValueError("HDR: zero-sized image")
    return width, height, exposure, pos


def get_metadata_from_hdr_memory(data: bytes) -> TexMetadata:
    w, h, _, _ = _parse_header(data)
    return TexMetadata(width=w, height=h, format=FMT.R32G32B32A32_FLOAT,
                       dimension=TexDimension.TEXTURE2D)


def _decode_scanlines(data: bytes, offset: int, width: int, height: int) -> np.ndarray:
    """Decode RGBE scanlines (both RLE styles) -> [H, W, 4] uint8.

    Uses the native C++ codec when available, Python fallback otherwise."""
    from .. import native
    fast = native.hdr_decode_scanlines(bytes(data), offset, width, height)
    if fast is not None:
        return fast
    src = np.frombuffer(data, np.uint8)
    out = np.empty((height, width, 4), np.uint8)
    pos = offset
    n = len(src)
    for y in range(height):
        if pos + 4 > n:
            raise ValueError("HDR: pixel data truncated")
        c0, c1, c2, c3 = src[pos:pos + 4]
        if c0 == 2 and c1 == 2 and c2 < 128:
            # adaptive (new-style) RLE
            if ((int(c2) << 8) + int(c3)) != width:
                raise ValueError("HDR: scanline width mismatch")
            pos += 4
            for ch in range(4):
                x = 0
                while x < width:
                    if pos + 2 > n:
                        raise ValueError("HDR: RLE truncated")
                    run = int(src[pos])
                    if run > 128:
                        run &= 127
                        if x + run > width:
                            raise ValueError("HDR: RLE run overflow")
                        out[y, x:x + run, ch] = src[pos + 1]
                        pos += 2
                    else:
                        if pos + 1 + run > n or x + run > width:
                            raise ValueError("HDR: RLE literal overflow")
                        out[y, x:x + run, ch] = src[pos + 1:pos + 1 + run]
                        pos += 1 + run
                    x += run
        else:
            # flat scanline with optional old-style runs (1,1,1,count<<shift)
            x = 0
            prev = np.zeros(4, np.uint8)
            bit_shift = 0
            while x < width:
                if pos + 4 > n:
                    raise ValueError("HDR: pixel data truncated")
                px = src[pos:pos + 4]
                pos += 4
                if px[0] == 1 and px[1] == 1 and px[2] == 1:
                    if bit_shift > 24:
                        raise ValueError("HDR: invalid old-style run")
                    span = int(px[3]) << bit_shift
                    if x + span > width:
                        raise ValueError("HDR: old-style run overflow")
                    out[y, x:x + span] = prev
                    x += span
                    bit_shift += 8
                else:
                    out[y, x] = px
                    prev = px
                    bit_shift = 0
                    x += 1
    return out


def load_from_hdr_memory(data: bytes) -> Texture:
    """LoadFromHDRMemory (DirectXTexHDR.cpp:697)."""
    width, height, exposure, offset = _parse_header(data)
    rgbe = _decode_scanlines(data, offset, width, height)

    # RGBE -> float: ldexp(m + 0.5, e - 136) / exposure (DirectXTexHDR.cpp:894)
    import jax.numpy as jnp
    rgbe_j = jnp.asarray(rgbe)
    e = rgbe_j[..., 3].astype(jnp.int32)
    scale = jnp.exp2((e - 136).astype(jnp.float32)) * jnp.float32(1.0 / exposure)
    rgb = (rgbe_j[..., :3].astype(jnp.float32) + 0.5) * scale[..., None]
    arr = jnp.concatenate([rgb, jnp.ones((height, width, 1), jnp.float32)], axis=-1)

    meta = TexMetadata(width=width, height=height,
                       format=FMT.R32G32B32A32_FLOAT,
                       dimension=TexDimension.TEXTURE2D)
    return Texture(meta, [arr[None]])


def _float_to_rgbe(img: np.ndarray) -> np.ndarray:
    """[H, W, >=3] float -> [H, W, 4] uint8 RGBE (DirectXTexHDR.cpp:368-405)."""
    rgb = np.maximum(np.nan_to_num(img[..., :3].astype(np.float64)), 0.0)
    max_xyz = rgb.max(axis=-1)
    mant, exp = np.frexp(max_xyz)
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(max_xyz > 1e-32, mant * 256.0 / max_xyz, 0.0)
    codes = (rgb * scale[..., None]).astype(np.uint8)
    e = ((exp + 128) & 0xFF).astype(np.uint8)
    nonzero = codes.any(axis=-1) & (max_xyz > 1e-32)
    out = np.zeros(img.shape[:2] + (4,), np.uint8)
    out[..., :3] = np.where(nonzero[..., None], codes, 0)
    out[..., 3] = np.where(nonzero, e, 0)
    return out


def _encode_rle_channel(ch: np.ndarray) -> bytes:
    """New-style per-channel RLE: runs >= 4 become repeat packets."""
    from .. import native
    fast = native.hdr_encode_rle_channel(ch)
    if fast is not None:
        return fast
    n = len(ch)
    out = bytearray()
    # find run boundaries
    i = 0
    while i < n:
        # measure run of identical bytes
        run = 1
        while i + run < n and run < 127 and ch[i + run] == ch[i]:
            run += 1
        if run >= 4:
            out.append(0x80 | run)
            out.append(int(ch[i]))
            i += run
        else:
            # literal: collect until next run of >=4 or 128 bytes
            start = i
            i += run
            while i < n and (i - start) < 128:
                run = 1
                while i + run < n and run < 127 and ch[i + run] == ch[i]:
                    run += 1
                if run >= 4:
                    break
                i += run
            count = min(i - start, 128)
            i = start + count
            out.append(count)
            out.extend(ch[start:start + count].tobytes())
    return bytes(out)


def save_to_hdr_memory(tex: Texture, mip: int = 0, item: int = 0) -> bytes:
    """SaveToHDRMemory (DirectXTexHDR.cpp): new-style RLE writer."""
    img = np.asarray(tex.image(mip, item))
    h, w = img.shape[:2]
    rgbe = _float_to_rgbe(img)

    header = (b"#?RADIANCE\n"
              b"FORMAT=32-bit_rle_rgbe\n"
              b"\n" + f"-Y {h} +X {w}\n".encode())
    body = bytearray()
    use_rle = 8 <= w <= 32767
    for y in range(h):
        if use_rle:
            body += bytes([2, 2, (w >> 8) & 0x7F, w & 0xFF])
            for ch in range(4):
                body += _encode_rle_channel(rgbe[y, :, ch])
        else:
            body += rgbe[y].tobytes()
    return header + bytes(body)


def load_from_hdr_file(path) -> Texture:
    with open(path, "rb") as f:
        return load_from_hdr_memory(f.read())


def save_to_hdr_file(tex: Texture, path) -> None:
    with open(path, "wb") as f:
        f.write(save_to_hdr_memory(tex))
