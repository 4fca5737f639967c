"""Compress / Decompress ops (DirectXTexCompress.cpp).

The reference iterates 4-row bands per block with optional OpenMP over a flat
block index (:72-373); here the whole subresource becomes one batched device
call: im2col to [NB, 16, 4], encode every block in parallel, reshape packed
blocks back to the DDS byte layout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..bc import bc123, bc45, bc67
from ..bc.common import blocks_to_image, image_to_blocks
from ..formats.dxgi import FMT, DXGIFormat
from ..formats import traits
from ..texture import CompressedTexture, Texture
from .convert import convert_values
from .flags import TEX_COMPRESS_FLAGS as TC
from .flags import TEX_FILTER_FLAGS as TF

__all__ = ["compress", "compress_ex", "compress_many", "decompress",
           "default_decompress_format"]


def _bc_flags(compress_flags: TC) -> int:
    """GetBCFlags (DirectXTexCompress.cpp:26): pass-through of the dither/
    uniform/BC7 mode bits (values are kept identical across enums)."""
    mask = (TC.RGB_DITHER | TC.A_DITHER | TC.DITHER | TC.UNIFORM
            | TC.BC7_USE_3SUBSETS | TC.BC7_QUICK | TC.BC7_MAXQUALITY
            | TC.BC6H_MID)
    return int(compress_flags & mask)


def _srgb_flags(compress_flags: TC) -> TF:
    """GetSRGBFlags (DirectXTexCompress.cpp:36)."""
    return TF(int(compress_flags & (TC.SRGB_IN | TC.SRGB_OUT)))


# channel-copy cflags from DetermineEncoderSettings
# (DirectXTexCompress.cpp:56-59): BC4 keeps RED (not grayscale), BC5
# keeps RED+GREEN, on the RGB->R / RGB->RG convert rules
_CHANNEL_CFLAGS = {
    "bc4u": TF.RGB_COPY_RED, "bc4s": TF.RGB_COPY_RED,
    "bc5u": TF.RGB_COPY_RED | TF.RGB_COPY_GREEN,
    "bc5s": TF.RGB_COPY_RED | TF.RGB_COPY_GREEN,
}


_ENCODERS = {
    FMT.BC1_UNORM: ("bc1", 8), FMT.BC1_UNORM_SRGB: ("bc1", 8),
    FMT.BC2_UNORM: ("bc2", 16), FMT.BC2_UNORM_SRGB: ("bc2", 16),
    FMT.BC3_UNORM: ("bc3", 16), FMT.BC3_UNORM_SRGB: ("bc3", 16),
    FMT.BC4_UNORM: ("bc4u", 8), FMT.BC4_SNORM: ("bc4s", 8),
    FMT.BC5_UNORM: ("bc5u", 16), FMT.BC5_SNORM: ("bc5s", 16),
    FMT.BC6H_UF16: ("bc6hu", 16), FMT.BC6H_SF16: ("bc6hs", 16),
    FMT.BC7_UNORM: ("bc7", 16), FMT.BC7_UNORM_SRGB: ("bc7", 16),
}


def _encode_blocks(kind: str, blocks: jnp.ndarray, threshold: float,
                   bcflags: int, opaque: bool = False,
                   alpha_weight: float = 1.0) -> jnp.ndarray:
    if kind == "bc1":
        return bc123.encode_bc1(blocks, threshold, bcflags)
    if kind == "bc2":
        return bc123.encode_bc2(blocks, bcflags)
    if kind == "bc3":
        return bc123.encode_bc3(blocks, bcflags)
    if kind == "bc4u":
        return bc45.encode_bc4u(blocks)
    if kind == "bc4s":
        return bc45.encode_bc4s(blocks)
    if kind == "bc5u":
        return bc45.encode_bc5u(blocks)
    if kind == "bc5s":
        return bc45.encode_bc5s(blocks)
    if kind == "bc6hu":
        return bc67.encode_bc6h(blocks, signed=False, flags=bcflags)
    if kind == "bc6hs":
        return bc67.encode_bc6h(blocks, signed=True, flags=bcflags)
    if kind == "bc7":
        return bc67.encode_bc7(blocks, bcflags, opaque=opaque,
                               alpha_weight=alpha_weight)
    raise AssertionError(kind)


_DECODERS = {
    FMT.BC1_UNORM: "bc1", FMT.BC1_UNORM_SRGB: "bc1", FMT.BC1_TYPELESS: "bc1",
    FMT.BC2_UNORM: "bc2", FMT.BC2_UNORM_SRGB: "bc2", FMT.BC2_TYPELESS: "bc2",
    FMT.BC3_UNORM: "bc3", FMT.BC3_UNORM_SRGB: "bc3", FMT.BC3_TYPELESS: "bc3",
    FMT.BC4_UNORM: "bc4u", FMT.BC4_SNORM: "bc4s", FMT.BC4_TYPELESS: "bc4u",
    FMT.BC5_UNORM: "bc5u", FMT.BC5_SNORM: "bc5s", FMT.BC5_TYPELESS: "bc5u",
    FMT.BC6H_UF16: "bc6hu", FMT.BC6H_SF16: "bc6hs", FMT.BC6H_TYPELESS: "bc6hu",
    FMT.BC7_UNORM: "bc7", FMT.BC7_UNORM_SRGB: "bc7", FMT.BC7_TYPELESS: "bc7",
}


def _decode_blocks(kind: str, raw: jnp.ndarray) -> jnp.ndarray:
    if kind == "bc1":
        return bc123.decode_bc1(raw)
    if kind == "bc2":
        return bc123.decode_bc2(raw)
    if kind == "bc3":
        return bc123.decode_bc3(raw)
    if kind == "bc4u":
        return bc45.decode_bc4u(raw)
    if kind == "bc4s":
        return bc45.decode_bc4s(raw)
    if kind == "bc5u":
        return bc45.decode_bc5u(raw)
    if kind == "bc5s":
        return bc45.decode_bc5s(raw)
    if kind == "bc6hu":
        return bc67.decode_bc6h(raw, signed=False)
    if kind == "bc6hs":
        return bc67.decode_bc6h(raw, signed=True)
    if kind == "bc7":
        return bc67.decode_bc7(raw)
    raise AssertionError(kind)


def default_decompress_format(bcfmt: DXGIFormat) -> DXGIFormat:
    """DefaultDecompress target map (DirectXTexCompress.cpp:377-421)."""
    m = {
        FMT.BC1_TYPELESS: FMT.R8G8B8A8_UNORM, FMT.BC1_UNORM: FMT.R8G8B8A8_UNORM,
        FMT.BC1_UNORM_SRGB: FMT.R8G8B8A8_UNORM_SRGB,
        FMT.BC2_TYPELESS: FMT.R8G8B8A8_UNORM, FMT.BC2_UNORM: FMT.R8G8B8A8_UNORM,
        FMT.BC2_UNORM_SRGB: FMT.R8G8B8A8_UNORM_SRGB,
        FMT.BC3_TYPELESS: FMT.R8G8B8A8_UNORM, FMT.BC3_UNORM: FMT.R8G8B8A8_UNORM,
        FMT.BC3_UNORM_SRGB: FMT.R8G8B8A8_UNORM_SRGB,
        FMT.BC4_TYPELESS: FMT.R8_UNORM, FMT.BC4_UNORM: FMT.R8_UNORM,
        FMT.BC4_SNORM: FMT.R8_SNORM,
        FMT.BC5_TYPELESS: FMT.R8G8_UNORM, FMT.BC5_UNORM: FMT.R8G8_UNORM,
        FMT.BC5_SNORM: FMT.R8G8_SNORM,
        FMT.BC6H_TYPELESS: FMT.R16G16B16A16_FLOAT,
        FMT.BC6H_UF16: FMT.R16G16B16A16_FLOAT,
        FMT.BC6H_SF16: FMT.R16G16B16A16_FLOAT,
        FMT.BC7_TYPELESS: FMT.R8G8B8A8_UNORM, FMT.BC7_UNORM: FMT.R8G8B8A8_UNORM,
        FMT.BC7_UNORM_SRGB: FMT.R8G8B8A8_UNORM_SRGB,
    }
    if bcfmt not in m:
        raise ValueError(f"decompress: not a BC format: {bcfmt!r}")
    return m[bcfmt]


def compress(tex: Texture, fmt: DXGIFormat,
             flags: TC = TC.DEFAULT,
             threshold: float = 0.5,
             alpha_weight: float = 1.0) -> CompressedTexture:
    """Public Compress (DirectXTexCompress.cpp:632).

    Encodes every mip/item of `tex` to BC format `fmt` in batched device
    calls. TEX_COMPRESS_PARALLEL is implied — all blocks always encode in
    parallel on the TPU. `alpha_weight` scales BC7 alpha error like the
    reference GPU encoder's CompressOptions.alphaWeight
    (DirectXTex.h:926, BC7Encode.hlsl:241).
    """
    return compress_many([tex], fmt, flags, threshold, alpha_weight)[0]


def _bucket_size(n: int) -> int:
    """Round a block count up to a coarse geometric grid so mixed-size
    batches reuse jit traces: every distinct block count is a fresh
    trace of the encode mega-kernels, and TPU compiles here run minutes
    (CLAUDE.md) — a heterogeneous library would make nearly every batch
    a persistent-cache miss. Grid = multiples of 1/8th of the count's
    power of two (>= one 256 lane tile): <= 12.5% padded work, <= 8
    traces per octave, and every exact power of two (the common 2^k
    texture sizes) maps to itself."""
    if n <= 256:
        return 256
    g = max(256, 1 << (max(n.bit_length() - 1, 0) - 3))
    return -(-n // g) * g


def compress_many(texs, fmt: DXGIFormat, flags: TC = TC.DEFAULT,
                  threshold: float = 0.5,
                  alpha_weight: float = 1.0) -> list[CompressedTexture]:
    """Batch Compress across textures: blocks from every (texture, level,
    item) concatenate into ONE encode dispatch — SURVEY §2.4's TPU-native
    texconv batch design ("many files -> one batched device call"; the
    reference batch loop runs files serially, Texconv/texconv.cpp:2034+).
    Textures need not share dimensions; blocks are flat along the block
    axis. Returns one CompressedTexture per input, in order."""
    flags = TC(flags)
    if fmt not in _ENCODERS:
        raise ValueError(f"compress: target must be a BC format, got {fmt!r}")
    kind, bpb = _ENCODERS[fmt]
    bcflags = _bc_flags(flags)
    srgb = _srgb_flags(flags)

    # IsAlphaAllOpaque-style host check specializes BC7 to skip mode 7;
    # for a batch the hint must hold for EVERY texture (mode 7 stays
    # inf-masked per-block in-kernel either way)
    opaque = kind == "bc7" and all(
        bool(jnp.all(lvl[..., 3] >= 1.0))
        for tex in texs for lvl in tex.levels)

    # blocks from every (texture, level, item) concatenate into ONE encode
    # dispatch (the reference's OpenMP flat-block-index idea,
    # DirectXTexCompress.cpp:209-373, applied across subresources): small
    # mip tails ride along with the base level instead of paying
    # per-dispatch overhead
    all_blocks = []
    tex_counts = []  # per texture: [(n_items, blocks_per_item)]
    for tex in texs:
        src_fmt = tex.metadata.format
        if traits.is_compressed(src_fmt):
            raise ValueError("compress: source is already compressed")
        counts = []
        for lvl in tex.levels:
            n, h, w, _ = lvl.shape
            vals = convert_values(lvl, src_fmt, fmt,
                                  srgb | _CHANNEL_CFLAGS.get(kind, TF(0)))
            per_item = None
            for i in range(n):
                blocks, nbh, nbw = image_to_blocks(vals[i])
                per_item = blocks.shape[0]
                all_blocks.append(blocks)
            counts.append((n, per_item))
        tex_counts.append(counts)
    cat = jnp.concatenate(all_blocks, axis=0)
    n_real = cat.shape[0]
    n_pad = _bucket_size(n_real) - n_real
    if n_pad:
        # pad with copies of the first block (valid content for every
        # codec incl. signed BC6H); results sliced off below
        cat = jnp.concatenate(
            [cat, jnp.broadcast_to(cat[:1], (n_pad,) + cat.shape[1:])])
    packed = _encode_blocks(kind, cat, threshold, bcflags, opaque,
                            alpha_weight)[:n_real]

    out = []
    off = 0
    for tex, counts in zip(texs, tex_counts):
        levels = []
        for n, per_item in counts:
            outs = []
            for i in range(n):
                outs.append(packed[off:off + per_item].reshape(-1))
                off += per_item
            levels.append(jnp.stack(outs))
        meta = tex.metadata.with_format(fmt)
        meta = dataclasses.replace(meta, mip_levels=len(levels))
        out.append(CompressedTexture(meta, levels))
    return out


def decompress(ctex: CompressedTexture,
               fmt: DXGIFormat = FMT.UNKNOWN) -> Texture:
    """Public Decompress (DirectXTexCompress.cpp:852)."""
    bcfmt = ctex.metadata.format
    # promote TYPELESS -> UNORM (DecompressBC :451)
    bcfmt = traits.make_typeless_unorm(bcfmt)
    if bcfmt == FMT.BC6H_TYPELESS:
        bcfmt = FMT.BC6H_UF16
    if bcfmt not in _DECODERS:
        raise ValueError(f"decompress: not a BC format: {bcfmt!r}")
    if fmt == FMT.UNKNOWN:
        fmt = default_decompress_format(bcfmt)
    if traits.is_compressed(fmt) or traits.is_typeless(fmt):
        raise ValueError(f"decompress: invalid target {fmt!r}")
    kind = _DECODERS[bcfmt]
    bpb = traits.bytes_per_block(bcfmt)

    meta = ctex.metadata
    # one decode dispatch across every (level, item), mirroring compress()
    raws = []
    shapes = []
    for mip in range(ctex.mip_levels):
        w, h, d = meta.mip_dims(mip)
        lvl = jnp.asarray(ctex.levels[mip])
        for i in range(lvl.shape[0]):
            raws.append(lvl[i].reshape(-1, bpb))
        shapes.append((lvl.shape[0], h, w, raws[-1].shape[0]))
    rcat = jnp.concatenate(raws, axis=0)
    n_real = rcat.shape[0]
    n_pad = _bucket_size(n_real) - n_real
    if n_pad:
        # same trace-bucketing as compress_many (decode mega-kernel
        # traces are also per-block-count)
        rcat = jnp.concatenate(
            [rcat, jnp.broadcast_to(rcat[:1], (n_pad,) + rcat.shape[1:])])
    texels = _decode_blocks(kind, rcat)[:n_real]

    levels = []
    off = 0
    for n, h, w, per_item in shapes:
        outs = []
        for i in range(n):
            img = blocks_to_image(texels[off:off + per_item], h, w)
            outs.append(convert_values(img, bcfmt, fmt, TF.DEFAULT))
            off += per_item
        levels.append(jnp.stack(outs))
    new_meta = meta.with_format(fmt)
    return Texture(new_meta, levels)


def compress_ex(tex: Texture, fmt: DXGIFormat,
                flags: TC = TC.DEFAULT, threshold: float = 0.5,
                status_callback=None,
                alpha_weight: float = 1.0) -> CompressedTexture:
    """CompressEx (DirectXTexCompress.cpp:664, CompressOptions +
    statusCallBack, DirectXTex.h:922-962): like compress(), reporting
    (done, total) between per-item device batches. A callback returning
    False aborts with TexAbortError (E_ABORT semantics)."""
    from ..utils.errors import TexAbortError

    if status_callback is None:
        return compress(tex, fmt, flags, threshold, alpha_weight)

    total = sum(int(lvl.shape[0]) for lvl in tex.levels)
    done = 0
    if status_callback(0, total) is False:
        raise TexAbortError("compress aborted by status callback")

    flags = TC(flags)
    if fmt not in _ENCODERS:
        raise ValueError(f"compress: target must be a BC format, got {fmt!r}")
    src_fmt = tex.metadata.format
    if traits.is_compressed(src_fmt):
        raise ValueError("compress: source is already compressed")
    kind, bpb = _ENCODERS[fmt]
    bcflags = _bc_flags(flags)
    srgb = _srgb_flags(flags)
    opaque = kind == "bc7" and all(
        bool(jnp.all(lvl[..., 3] >= 1.0)) for lvl in tex.levels)

    levels = []
    for lvl in tex.levels:
        vals = convert_values(lvl, src_fmt, fmt,
                              srgb | _CHANNEL_CFLAGS.get(kind, TF(0)))
        outs = []
        for i in range(lvl.shape[0]):
            blocks, _, _ = image_to_blocks(vals[i])
            outs.append(_encode_blocks(kind, blocks, threshold, bcflags,
                                       opaque, alpha_weight).reshape(-1))
            done += 1
            if status_callback(done, total) is False:
                raise TexAbortError("compress aborted by status callback")
        levels.append(jnp.stack(outs))
    meta = tex.metadata.with_format(fmt)
    meta = dataclasses.replace(meta, mip_levels=len(levels))
    return CompressedTexture(meta, levels)
