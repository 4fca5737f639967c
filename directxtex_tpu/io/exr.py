"""OpenEXR (.exr) container codec, pure numpy.

Mirrors the reference's OpenEXR adapter (Auxiliary/DirectXTexEXR.cpp:
LoadFromEXRFile/SaveToEXRFile work through RgbaInputFile/RgbaOutputFile as
half RGBA <-> R16G16B16A16_FLOAT). This implementation reads/writes the EXR
container directly: single-part scanline images, HALF/FLOAT/UINT channels,
NONE / RLE / ZIPS / ZIP / PIZ / B44 / B44A compression for read and
write plus PXR24 read. The PIZ wavelet+Huffman codec lives in
exr_piz.py; the B44 fixed-rate block codec in exr_b44.py. DWAA/DWAB
(lossy DCT) route through the official OpenEXR library via the native
adapter shim when present (native/exr_openexr.cpp) — the same
dependency the reference's whole EXR path has — and raise otherwise.
Tiled, deep, and multi-part files are rejected like the adapter's
RgbaInputFile would.

Load returns the framework-native f32 RGBA Texture with metadata format
R16G16B16A16_FLOAT (matching Auxiliary/DirectXTexEXR.cpp:172-183); save
writes half RGBA scanlines with ZIP compression by default.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..formats.dxgi import FMT
from ..texture import TexDimension, TexMetadata, Texture

__all__ = [
    "get_metadata_from_exr_memory", "load_from_exr_memory",
    "save_to_exr_memory", "load_from_exr_file", "save_to_exr_file",
]

_MAGIC = 0x01312F76

# compression ids (OpenEXR ImfCompression.h)
_NONE, _RLE, _ZIPS, _ZIP, _PIZ, _PXR24, _B44, _B44A, _DWAA, _DWAB = range(10)
_LINES_PER_BLOCK = {_NONE: 1, _RLE: 1, _ZIPS: 1, _ZIP: 16, _PIZ: 32,
                    _PXR24: 16, _B44: 32, _B44A: 32}
# writer-supported subset (PXR24 is decode-only: it is lossy for float
# channels, and the reference's adapter never writes it; B44/B44A are
# lossy too but write-supported since our half-RGBA writer matches
# their HALF-only fast path)
_WRITE_COMPRESSIONS = (_NONE, _RLE, _ZIPS, _ZIP, _PIZ, _B44, _B44A)
_PIXEL_DTYPE = {0: np.dtype("<u4"), 1: np.dtype("<f2"), 2: np.dtype("<f4")}


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bytes(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("EXR: truncated file")
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def u32(self) -> int:
        return struct.unpack("<I", self.bytes(4))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.bytes(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.bytes(8))[0]

    def cstr(self, maxlen: int = 256) -> bytes:
        end = self.data.find(b"\0", self.pos)
        if end < 0 or end - self.pos > maxlen:
            raise ValueError("EXR: unterminated string")
        s = self.data[self.pos:end]
        self.pos = end + 1
        return s


def _parse_channels(raw: bytes):
    """chlist attribute -> [(name, pixel_type, x_samp, y_samp)]."""
    r = _Reader(raw)
    out = []
    while True:
        if r.pos >= len(raw) or raw[r.pos] == 0:
            break
        name = r.cstr().decode("latin-1")
        ptype = r.i32()
        r.bytes(4)  # pLinear + reserved
        xs = r.i32()
        ys = r.i32()
        if ptype not in _PIXEL_DTYPE:
            raise ValueError(f"EXR: bad pixel type {ptype}")
        out.append((name, ptype, xs, ys))
    return out


def _parse_header(data: bytes):
    r = _Reader(data)
    if r.u32() != _MAGIC:
        raise ValueError("EXR: bad magic")
    version = r.u32()
    if version & 0xFF != 2:
        raise ValueError(f"EXR: unsupported version {version & 0xFF}")
    if version & 0x200:
        raise ValueError("EXR: tiled images not supported")
    if version & 0x800:
        raise ValueError("EXR: deep data not supported")
    if version & 0x1000:
        raise ValueError("EXR: multi-part files not supported")

    attrs = {}
    while True:
        name = r.cstr()
        if not name:
            break
        atype = r.cstr()
        size = r.i32()
        if size < 0 or size > len(data):
            raise ValueError("EXR: bad attribute size")
        attrs[name.decode("latin-1")] = (atype.decode("latin-1"),
                                         r.bytes(size))

    for req in ("channels", "compression", "dataWindow", "lineOrder"):
        if req not in attrs:
            raise ValueError(f"EXR: missing required attribute {req}")

    channels = _parse_channels(attrs["channels"][1])
    compression = attrs["compression"][1][0]
    xmin, ymin, xmax, ymax = struct.unpack("<4i", attrs["dataWindow"][1])
    line_order = attrs["lineOrder"][1][0]
    if line_order > 1:
        raise ValueError("EXR: random line order not supported")
    width = xmax - xmin + 1
    height = ymax - ymin + 1
    if width <= 0 or height <= 0 or width > 1 << 24 or height > 1 << 24:
        raise ValueError("EXR: bad data window")
    for name, _, xs, ys in channels:
        if xs != 1 or ys != 1:
            raise ValueError(
                f"EXR: subsampled channel {name!r} not supported")
    return {
        "channels": channels, "compression": compression,
        "width": width, "height": height,
        "ymin": ymin, "line_order": line_order,
        "header_end": r.pos, "attrs": attrs,
    }


def _unpredict(buf: np.ndarray) -> np.ndarray:
    """Undo the ZIP/RLE byte predictor: running delta then de-interleave
    (OpenEXR ImfZip.cpp uncompress path)."""
    d = buf.astype(np.int64)
    d[1:] -= 128
    d = np.cumsum(d) & 0xFF
    out = np.empty_like(buf)
    half = (len(buf) + 1) // 2
    out[0::2] = d[:half].astype(np.uint8)
    out[1::2] = d[half:].astype(np.uint8)
    return out


def _predict(buf: np.ndarray) -> np.ndarray:
    """ZIP/RLE byte predictor: interleave-split then delta encode."""
    half = (len(buf) + 1) // 2
    t = np.empty_like(buf)
    t[:half] = buf[0::2]
    t[half:] = buf[1::2]
    d = t.astype(np.int16)
    d[1:] = d[1:] - d[:-1] + (128 + 256)
    return d.astype(np.uint8)


def _rle_decode(src: bytes, expected: int) -> np.ndarray:
    out = np.empty(expected, np.uint8)
    pos = 0
    i = 0
    n = len(src)
    while i < n and pos < expected:
        count = src[i]
        i += 1
        if count > 127:  # negative signed char: literal run
            run = 256 - count
            if i + run > n or pos + run > expected:
                raise ValueError("EXR: corrupt RLE data")
            out[pos:pos + run] = np.frombuffer(src, np.uint8, run, i)
            i += run
            pos += run
        else:
            run = count + 1
            if i >= n or pos + run > expected:
                raise ValueError("EXR: corrupt RLE data")
            out[pos:pos + run] = src[i]
            i += 1
            pos += run
    if pos != expected:
        raise ValueError("EXR: RLE output size mismatch")
    return out


def _rle_encode(buf: np.ndarray) -> bytes:
    out = bytearray()
    n = len(buf)
    i = 0
    while i < n:
        # find run length of identical bytes
        j = i + 1
        while j < n and j - i < 128 and buf[j] == buf[i]:
            j += 1
        if j - i >= 3:
            out.append(j - i - 1)
            out.append(int(buf[i]))
            i = j
        else:
            # literal run until next >=3 repeat or 127 bytes
            j = i
            while j < n and j - i < 127:
                if (j + 2 < n and buf[j] == buf[j + 1] == buf[j + 2]):
                    break
                j += 1
            out.append(256 - (j - i))
            out.extend(buf[i:j].tobytes())
            i = j
    return bytes(out)


def _pxr24_uncompress(raw: bytes, layout, width: int,
                      expected: int) -> np.ndarray:
    """PXR24 chunk decode (ImfPxr24Compressor semantics): zlib, then per
    (scanline, channel) byte-planes with a running 32-bit delta sum.
    layout: list of (name, pixel_type, nlines)."""
    buf = np.frombuffer(zlib.decompress(raw), np.uint8)
    out = np.empty(expected, np.uint8)
    pos = 0
    opos = 0
    ny0 = max(ny for _, _, ny in layout)
    for y in range(ny0):
        for _, pt, ny in layout:
            if y >= ny:
                continue
            n = width
            if pt == 1:  # HALF: 2 byte planes, 16-bit deltas
                if pos + 2 * n > len(buf):
                    raise ValueError("EXR: truncated PXR24 chunk")
                d = (buf[pos:pos + n].astype(np.uint64) << 8) \
                    | buf[pos + n:pos + 2 * n]
                pos += 2 * n
                px = np.cumsum(d).astype(np.uint16)
                out[opos:opos + 2 * n] = px.view(np.uint8)
                opos += 2 * n
            elif pt == 2:  # FLOAT: 3 byte planes, 24-bit deltas, <<8
                if pos + 3 * n > len(buf):
                    raise ValueError("EXR: truncated PXR24 chunk")
                d = (buf[pos:pos + n].astype(np.uint64) << 24) \
                    | (buf[pos + n:pos + 2 * n].astype(np.uint64) << 16) \
                    | (buf[pos + 2 * n:pos + 3 * n].astype(np.uint64) << 8)
                pos += 3 * n
                px = np.cumsum(d).astype(np.uint32)
                out[opos:opos + 4 * n] = px.view(np.uint8)
                opos += 4 * n
            else:  # UINT: 4 byte planes, 32-bit deltas
                if pos + 4 * n > len(buf):
                    raise ValueError("EXR: truncated PXR24 chunk")
                d = (buf[pos:pos + n].astype(np.uint64) << 24) \
                    | (buf[pos + n:pos + 2 * n].astype(np.uint64) << 16) \
                    | (buf[pos + 2 * n:pos + 3 * n].astype(np.uint64) << 8) \
                    | buf[pos + 3 * n:pos + 4 * n]
                pos += 4 * n
                px = np.cumsum(d).astype(np.uint32)
                out[opos:opos + 4 * n] = px.view(np.uint8)
                opos += 4 * n
    if opos != expected:
        raise ValueError("EXR: PXR24 chunk size mismatch")
    return out


def _piz_layout(layout):
    """(name, pixel_type, ny) -> (name, u16s_per_pixel, ny)."""
    return [(n, 1 if pt == 1 else 2, ny) for n, pt, ny in layout]


def _decompress_chunk(raw: bytes, compression: int, expected: int,
                      layout=None, width: int = 0) -> np.ndarray:
    if compression == _NONE or len(raw) >= expected:
        # OpenEXR stores chunks raw when compression didn't shrink them
        if len(raw) != expected and compression == _NONE:
            raise ValueError("EXR: bad uncompressed chunk size")
        if len(raw) == expected:
            return np.frombuffer(raw, np.uint8)
    if compression in (_ZIP, _ZIPS):
        buf = np.frombuffer(zlib.decompress(raw), np.uint8)
        if len(buf) != expected:
            raise ValueError("EXR: zip chunk size mismatch")
        return _unpredict(buf)
    if compression == _RLE:
        return _unpredict(_rle_decode(raw, expected))
    if compression == _PIZ:
        from . import exr_piz
        out = exr_piz.piz_uncompress(raw, _piz_layout(layout), width)
        if len(out) != expected:
            raise ValueError("EXR: PIZ chunk size mismatch")
        return out
    if compression == _PXR24:
        return _pxr24_uncompress(raw, layout, width, expected)
    if compression in (_B44, _B44A):
        from . import exr_b44
        return exr_b44.uncompress(raw, layout, width, expected)
    raise ValueError(f"EXR: compression {compression} not supported "
                     "(NONE/RLE/ZIPS/ZIP/PIZ/PXR24/B44/B44A only)")


def get_metadata_from_exr_memory(data: bytes) -> TexMetadata:
    """GetMetadataFromEXRFile (Auxiliary/DirectXTexEXR.cpp:112-183)."""
    h = _parse_header(bytes(data))
    return TexMetadata(
        width=h["width"], height=h["height"], depth=1, array_size=1,
        mip_levels=1, format=FMT.R16G16B16A16_FLOAT,
        dimension=TexDimension.TEXTURE2D)


def load_from_exr_memory(data: bytes) -> Texture:
    """LoadFromEXRFile semantics: decode to RGBA (half precision data,
    f32 device planes). Missing channels: G/B -> 0, A -> 1; a lone 'Y'
    channel broadcasts to RGB."""
    data = bytes(data)
    h = _parse_header(data)
    width, height = h["width"], h["height"]
    comp = h["compression"]
    if comp not in _LINES_PER_BLOCK:
        tex = _load_via_openexr(data, h)
        if tex is not None:
            return tex
        raise ValueError(f"EXR: compression {comp} not supported "
                         "(NONE/RLE/ZIPS/ZIP/PIZ/PXR24/B44/B44A natively; "
                         "DWAA/DWAB need the OpenEXR adapter shim)")
    lpb = _LINES_PER_BLOCK[comp]
    nchunks = (height + lpb - 1) // lpb

    r = _Reader(data)
    r.pos = h["header_end"]
    offsets = [r.u64() for _ in range(nchunks)]

    chans = h["channels"]  # already alphabetical per spec; trust order
    bpp_line = sum(_PIXEL_DTYPE[pt].itemsize for _, pt, _, _ in chans) * width
    planes = {name: np.zeros((height, width), np.float32)
              for name, _, _, _ in chans}

    for off in offsets:
        rr = _Reader(data)
        rr.pos = off
        y = rr.i32() - h["ymin"]
        size = rr.i32()
        if y < 0 or y >= height:
            raise ValueError("EXR: chunk scanline out of range")
        nlines = min(lpb, height - y)
        raw = rr.bytes(size)
        layout = [(name, pt, nlines) for name, pt, _, _ in chans]
        buf = _decompress_chunk(raw, comp, bpp_line * nlines,
                                layout=layout, width=width)
        pos = 0
        for line in range(nlines):
            for name, pt, _, _ in chans:
                dt = _PIXEL_DTYPE[pt]
                row = np.frombuffer(buf, dt, width, pos)
                pos += dt.itemsize * width
                if pt == 0:  # UINT -> float
                    planes[name][y + line] = row.astype(np.float32)
                else:
                    planes[name][y + line] = row.astype(np.float32)

    names = set(planes)
    if "R" in names or "G" in names or "B" in names:
        red = planes.get("R", np.zeros((height, width), np.float32))
        grn = planes.get("G", np.zeros((height, width), np.float32))
        blu = planes.get("B", np.zeros((height, width), np.float32))
    elif "Y" in names:
        red = grn = blu = planes["Y"]
    else:
        first = chans[0][0]
        red = grn = blu = planes[first]
    alpha = planes.get("A", np.ones((height, width), np.float32))
    rgba = np.stack([red, grn, blu, alpha], axis=-1)

    meta = TexMetadata(
        width=width, height=height, depth=1, array_size=1, mip_levels=1,
        format=FMT.R16G16B16A16_FLOAT, dimension=TexDimension.TEXTURE2D)
    return Texture(meta, [rgba[None]])


def _load_via_openexr(data: bytes, h) -> Texture | None:
    """Decode through the official OpenEXR library (native shim).

    The reference's whole EXR path is this adapter
    (Auxiliary/DirectXTexEXR.cpp:112-183, RgbaInputFile -> half RGBA);
    here it only backs the lossy-DCT compressions (DWAA/DWAB) that the
    pure-numpy reader does not implement. Returns None if the shim is
    unavailable.
    """
    from .. import native
    halves = native.openexr_read_half(data)
    if halves is None:
        return None
    rgba = halves.view("<f2").astype(np.float32)
    meta = TexMetadata(
        width=h["width"], height=h["height"], depth=1, array_size=1,
        mip_levels=1, format=FMT.R16G16B16A16_FLOAT,
        dimension=TexDimension.TEXTURE2D)
    return Texture(meta, [rgba[None]])


def load_from_exr_file(path) -> Texture:
    with open(path, "rb") as f:
        return load_from_exr_memory(f.read())


def _attr(name: bytes, atype: bytes, value: bytes) -> bytes:
    return name + b"\0" + atype + b"\0" + struct.pack("<i", len(value)) \
        + value


def save_to_exr_memory(tex: Texture, mip: int = 0, item: int = 0,
                       compression: int = _ZIP) -> bytes:
    """SaveToEXRFile (Auxiliary/DirectXTexEXR.cpp:320+): half RGBA
    scanlines, ZIP compression by default."""
    if compression in (_DWAA, _DWAB):
        from .. import native
        img = np.asarray(tex.levels[mip][item], np.float32)
        data = native.openexr_write_half(img.astype("<f2").view(np.uint16),
                                         compression)
        if data is None:
            raise ValueError("EXR: DWAA/DWAB save needs the OpenEXR "
                             "adapter shim")
        return data
    if compression not in _WRITE_COMPRESSIONS:
        raise ValueError("EXR: unsupported save compression")
    img = np.asarray(tex.levels[mip][item], np.float32)
    height, width = img.shape[:2]
    halves = img.astype("<f2")  # [H, W, 4]

    chan_names = ["A", "B", "G", "R"]  # alphabetical, as OpenEXR writes
    chan_src = {"A": halves[..., 3], "B": halves[..., 2],
                "G": halves[..., 1], "R": halves[..., 0]}

    chlist = b""
    for n in chan_names:
        chlist += n.encode() + b"\0" + struct.pack("<i", 1) \
            + b"\0\0\0\0" + struct.pack("<ii", 1, 1)
    chlist += b"\0"
    box = struct.pack("<4i", 0, 0, width - 1, height - 1)

    header = struct.pack("<II", _MAGIC, 2)
    header += _attr(b"channels", b"chlist", chlist)
    header += _attr(b"compression", b"compression",
                    bytes([compression]))
    header += _attr(b"dataWindow", b"box2i", box)
    header += _attr(b"displayWindow", b"box2i", box)
    header += _attr(b"lineOrder", b"lineOrder", b"\0")
    header += _attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _attr(b"screenWindowCenter", b"v2f",
                    struct.pack("<ff", 0.0, 0.0))
    header += _attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\0"

    lpb = _LINES_PER_BLOCK[compression]
    nchunks = (height + lpb - 1) // lpb
    chunks = []
    for c in range(nchunks):
        y = c * lpb
        nlines = min(lpb, height - y)
        rows = []
        for line in range(nlines):
            for n in chan_names:
                rows.append(chan_src[n][y + line].tobytes())
        raw = np.frombuffer(b"".join(rows), np.uint8)
        if compression in (_ZIP, _ZIPS):
            packed = zlib.compress(_predict(raw).tobytes())
        elif compression == _RLE:
            packed = _rle_encode(_predict(raw))
        elif compression == _PIZ:
            from . import exr_piz
            layout = [(n, 1, nlines) for n in chan_names]  # half channels
            packed = exr_piz.piz_compress(raw, layout, width)
        elif compression in (_B44, _B44A):
            from . import exr_b44
            layout = [(n, 1, nlines) for n in chan_names]
            packed = exr_b44.compress(raw, layout, width,
                                      flat_ok=compression == _B44A)
        else:
            packed = raw.tobytes()
        if len(packed) >= len(raw):
            packed = raw.tobytes()  # store raw when compression loses
        chunks.append((y, packed))

    offset_base = len(header) + 8 * nchunks
    out = bytearray(header)
    off = offset_base
    for y, packed in chunks:
        out += struct.pack("<Q", off)
        off += 8 + len(packed)
    for y, packed in chunks:
        out += struct.pack("<ii", y, len(packed))
        out += packed
    return bytes(out)


def save_to_exr_file(tex: Texture, path, **kwargs) -> None:
    with open(path, "wb") as f:
        f.write(save_to_exr_memory(tex, **kwargs))
