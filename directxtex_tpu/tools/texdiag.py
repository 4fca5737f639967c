"""texdiag — texture diagnostics CLI (Texdiag/texdiag.cpp).

Commands: info, analyze (per-channel min/max/mean/stddev, AnalyzeData :668),
analyzebc (BC mode/partition/rotation histograms, AnalyzeBC :790),
compare (MSE vs a second file), diff (write |a-b| image), dumpbc (print one
block's encoding), dumpdds (extract raw surfaces).

Usage: python -m directxtex_tpu.tools.texdiag <command> [options] <file> [file2]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="texdiag",
                                description=__doc__.split("\n")[0])
    p.add_argument("command", choices=["info", "analyze", "analyzebc",
                                       "compare", "diff", "dumpbc", "dumpdds"])
    p.add_argument("file", help="input file")
    p.add_argument("file2", nargs="?", help="second file (compare/diff)")
    p.add_argument("-o", "--output", default=None, help="output file (diff/dumpdds)")
    p.add_argument("-ft", "--file-type", default="png",
                   choices=["png", "dds", "tga", "hdr", "bmp", "jpg"],
                   help="dumpdds output container")
    p.add_argument("-x", type=int, default=0, help="block x (dumpbc)")
    p.add_argument("-y", type=int, default=0, help="block y (dumpbc)")
    p.add_argument("-m", "--mip", type=int, default=0, help="mip level")
    p.add_argument("-item", type=int, default=0, help="array item")
    p.add_argument("-nologo", action="store_true")
    return p


def _load(path):
    from ..io import load_texture
    return load_texture(path)


def cmd_info(args, log=print) -> int:
    from ..formats import traits
    from ..io import get_metadata_from_dds_memory
    from ..texture import CompressedTexture

    tex = _load(args.file)
    m = tex.metadata
    log(f"        file: {args.file}")
    log(f"       width: {m.width}")
    log(f"      height: {m.height}")
    log(f"       depth: {m.depth}")
    log(f"   mipLevels: {m.mip_levels if isinstance(tex, CompressedTexture) else tex.mip_levels}")
    log(f"   arraySize: {m.array_size}")
    log(f"      format: {m.format.name}")
    log(f"   dimension: {m.dimension.name}")
    log(f"     cubemap: {m.is_cubemap()}")
    log(f"  alpha mode: {m.alpha_mode().name}")
    log(f"  compressed: {traits.is_compressed(m.format)}")
    bpp = traits.bits_per_pixel(m.format)
    log(f"         bpp: {bpp}")
    return 0


def cmd_analyze(args, log=print) -> int:
    from ..ops import decompress
    from ..texture import CompressedTexture

    tex = _load(args.file)
    if isinstance(tex, CompressedTexture):
        tex = decompress(tex)
    for mip, lvl in enumerate(tex.levels):
        data = np.asarray(lvl)
        log(f"  mip {mip} [{data.shape[2]}x{data.shape[1]}]")
        for c, name in enumerate("rgba"):
            ch = data[..., c]
            log(f"    {name}: min {ch.min():.6f} max {ch.max():.6f} "
                f"mean {ch.mean():.6f} stddev {ch.std():.6f}")
        lum = (data[..., 0] * 0.2125 + data[..., 1] * 0.7154
               + data[..., 2] * 0.0721)
        log(f"    luminance: min {lum.min():.6f} max {lum.max():.6f} "
            f"mean {lum.mean():.6f} stddev {lum.std():.6f}")
    return 0


def cmd_analyzebc(args, log=print) -> int:
    from ..formats import FMT, traits
    from ..texture import CompressedTexture

    tex = _load(args.file)
    if not isinstance(tex, CompressedTexture):
        log("analyzebc requires a BC-compressed input", file=sys.stderr)
        return 1
    fmt = tex.metadata.format
    bpb = traits.bytes_per_block(fmt)
    raw = tex.level_bytes(args.mip, args.item).reshape(-1, bpb)
    log(f"  {raw.shape[0]} blocks of {fmt.name}")

    if fmt in (FMT.BC7_UNORM, FMT.BC7_UNORM_SRGB, FMT.BC7_TYPELESS):
        b0 = raw[:, 0].astype(int)
        modes = np.where(b0 == 0, 8, np.log2(b0 & -b0).astype(int))
        hist = np.bincount(modes, minlength=9)
        for m, count in enumerate(hist):
            if count:
                log(f"    mode {m}: {count} ({100 * count / len(modes):.1f}%)")
        # rotation histogram for modes 4/5
        for mode in (4, 5):
            sel = raw[modes == mode]
            if len(sel):
                words = sel[:, :4].copy().view("<u4").reshape(-1)
                rot = (words >> (mode + 1)) & 0x3
                log(f"    mode {mode} rotations: {np.bincount(rot, minlength=4).tolist()}")
    elif fmt in (FMT.BC6H_UF16, FMT.BC6H_SF16, FMT.BC6H_TYPELESS):
        b0 = raw[:, 0].astype(int)
        m2 = b0 & 0x3
        mode = np.where(m2 < 2, m2, b0 & 0x1F)
        vals, counts = np.unique(mode, return_counts=True)
        for v, count in zip(vals, counts):
            log(f"    mode {v:#04x}: {count} ({100 * count / len(mode):.1f}%)")
    elif fmt in (FMT.BC1_UNORM, FMT.BC1_UNORM_SRGB, FMT.BC1_TYPELESS):
        words = raw.view("<u2")
        three = (words[:, 0] <= words[:, 1]).sum()
        log(f"    4-color blocks: {len(raw) - three}")
        log(f"    3-color blocks (incl. transparent): {three}")
    elif fmt in (FMT.BC2_UNORM, FMT.BC2_UNORM_SRGB, FMT.BC2_TYPELESS,
                 FMT.BC3_UNORM, FMT.BC3_UNORM_SRGB, FMT.BC3_TYPELESS):
        # color half at bytes 8..15 is always 4-color; BC3 alpha adds a
        # 6- vs 8-step codec choice (AnalyzeBC, Texdiag/texdiag.cpp:790+)
        if fmt in (FMT.BC3_UNORM, FMT.BC3_UNORM_SRGB, FMT.BC3_TYPELESS):
            a0 = raw[:, 0].astype(int)
            a1 = raw[:, 1].astype(int)
            eight = (a0 > a1).sum()
            log(f"    8-step alpha blocks: {eight}")
            log(f"    6-step alpha blocks: {len(raw) - eight}")
        else:
            log(f"    explicit 4-bit alpha blocks: {len(raw)}")
    elif fmt in (FMT.BC4_UNORM, FMT.BC4_SNORM, FMT.BC4_TYPELESS,
                 FMT.BC5_UNORM, FMT.BC5_SNORM, FMT.BC5_TYPELESS):
        signed = fmt in (FMT.BC4_SNORM, FMT.BC5_SNORM)
        nch = 2 if fmt in (FMT.BC5_UNORM, FMT.BC5_SNORM,
                           FMT.BC5_TYPELESS) else 1
        for c in range(nch):
            r0 = raw[:, c * 8].astype(np.int8 if signed else np.uint8)
            r1 = raw[:, c * 8 + 1].astype(np.int8 if signed else np.uint8)
            eight = (r0.astype(int) > r1.astype(int)).sum()
            name = "red" if c == 0 else "green"
            log(f"    {name}: 8-step blocks {eight}, "
                f"6-step blocks {len(raw) - eight}")
    else:
        log("    (no per-mode statistics for this format)")
    return 0


def cmd_compare(args, log=print) -> int:
    from ..ops import compute_mse, compute_psnr, decompress
    from ..texture import CompressedTexture

    a = _load(args.file)
    b = _load(args.file2)
    if isinstance(a, CompressedTexture):
        a = decompress(a)
    if isinstance(b, CompressedTexture):
        b = decompress(b)
    ia, ib = a.to_numpy(), b.to_numpy()
    if ia.shape != ib.shape:
        log(f"ERROR: image sizes differ {ia.shape} vs {ib.shape}")
        return 1
    mse, mse_v = compute_mse(ia, ib, fmt1=a.metadata.format,
                             fmt2=b.metadata.format)
    v = np.asarray(mse_v)
    log(f"  MSE: {float(mse):.9f}")
    log(f"  per-channel: r {v[0]:.9f} g {v[1]:.9f} b {v[2]:.9f} a {v[3]:.9f}")
    log(f"  PSNR: {float(compute_psnr(ia, ib)):.2f} dB")
    return 0


def cmd_diff(args, log=print) -> int:
    from ..io import save_texture
    from ..ops import decompress
    from ..texture import CompressedTexture, Texture

    a = _load(args.file)
    b = _load(args.file2)
    if isinstance(a, CompressedTexture):
        a = decompress(a)
    if isinstance(b, CompressedTexture):
        b = decompress(b)
    d = np.abs(a.to_numpy() - b.to_numpy())
    d[..., 3] = 1.0
    out = args.output or "diff.png"
    save_texture(Texture.from_array(np.clip(d, 0, 1)), out)
    log(f"  wrote {out}")
    return 0


def cmd_dumpbc(args, log=print) -> int:
    from ..formats import traits
    from ..texture import CompressedTexture

    tex = _load(args.file)
    if not isinstance(tex, CompressedTexture):
        log("dumpbc requires a BC-compressed input")
        return 1
    fmt = tex.metadata.format
    bpb = traits.bytes_per_block(fmt)
    w, h, _ = tex.metadata.mip_dims(args.mip)
    nbw = (w + 3) // 4
    raw = tex.level_bytes(args.mip, args.item).reshape(-1, bpb)
    bi = args.y * nbw + args.x
    if bi >= len(raw):
        log("block out of range")
        return 1
    block = raw[bi]
    log(f"  block ({args.x},{args.y}) of {fmt.name}: "
        + " ".join(f"{v:02x}" for v in block))
    from ..ops.compress import _DECODERS, _decode_blocks
    texels = np.asarray(_decode_blocks(_DECODERS[fmt], block[None]))
    for row in range(4):
        log("   " + "  ".join(
            "(" + ",".join(f"{texels[0, row * 4 + c_, ch]:.3f}"
                           for ch in range(4)) + ")"
            for c_ in range(4)))
    return 0


def cmd_dumpdds(args, log=print) -> int:
    """Extract every surface of a complex DDS as its own file
    (CMD_DUMPDDS, Texdiag/texdiag.cpp:3753+). The reference rejects
    BC-compressed inputs; here they are decompressed first (superset).
    Naming follows the reference: _itemNNN/_sliceNNN + _mipNNN."""
    from ..io import save_texture
    from ..texture import CompressedTexture, Texture
    from ..ops import decompress

    tex = _load(args.file)
    if isinstance(tex, CompressedTexture):
        tex = decompress(tex)
    base = args.output or os.path.splitext(os.path.basename(args.file))[0]
    ext = args.file_type
    is_volume = tex.metadata.depth > 1
    count = 0
    for mip in range(tex.mip_levels):
        for item in range(tex.levels[mip].shape[0]):
            tag = "slice" if is_volume else "item"
            name = f"{base}_{tag}{item:03d}"
            if tex.mip_levels > 1:
                name += f"_mip{mip:03d}"
            img = tex.to_numpy(mip, item)
            if ext in ("png", "bmp", "jpg", "tga"):
                img = np.clip(img, 0, 1)
            save_texture(Texture.from_array(img.astype(np.float32)),
                         f"{name}.{ext}")
            count += 1
    log(f"  wrote {count} surfaces")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.nologo:
        print("texdiag (directxtex_tpu)")
    cmds = {"info": cmd_info, "analyze": cmd_analyze,
            "analyzebc": cmd_analyzebc, "compare": cmd_compare,
            "diff": cmd_diff, "dumpbc": cmd_dumpbc, "dumpdds": cmd_dumpdds}
    if args.command in ("compare", "diff") and not args.file2:
        print("error: command requires two files", file=sys.stderr)
        return 1
    return cmds[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
