"""texdiag — texture diagnostics CLI (Texdiag/texdiag.cpp).

Commands: info, analyze (per-channel min/max/mean/stddev, AnalyzeData :668),
analyzebc (BC mode/partition/rotation histograms, AnalyzeBC :790),
compare (MSE vs a second file), diff (write |a-b| image with optional
threshold highlight), dumpbc (print block encodings — every block, or the
one containing -targetx/-targety), dumpdds (extract raw surfaces).

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
    p.add_argument("files", nargs="*",
                   help="input files (compare/diff take exactly two; other "
                        "commands accept several, wildcards with -r)")
    p.add_argument("-r", action="store_true", dest="recursive",
                   help="treat arguments as glob patterns, search recursively")
    p.add_argument("-flist", "--file-list", dest="flist", default=None,
                   metavar="FILE",
                   help="read input file paths from a text file")
    p.add_argument("-o", "--output", default=None,
                   help="output file (diff) / base name (dumpdds)")
    p.add_argument("-ft", "--file-type", default="png",
                   choices=["png", "dds", "tga", "hdr", "bmp", "jpg"],
                   help="dumpdds output container")
    p.add_argument("-y", "--overwrite", dest="overwrite",
                   action="store_true", help="overwrite existing files")
    p.add_argument("-l", "--to-lowercase", dest="tolower",
                   action="store_true",
                   help="force output filenames to lowercase")
    p.add_argument("-targetx", "--target-x", dest="targetx", type=int,
                   default=-1, metavar="PX",
                   help="dumpbc: pixel x — dump the block containing it "
                        "(default: dump every block)")
    p.add_argument("-targety", "--target-y", dest="targety", type=int,
                   default=-1, metavar="PX", help="dumpbc: pixel y")
    p.add_argument("-t", "--threshold", type=float, default=0.25,
                   help="diff: highlight threshold")
    p.add_argument("-c", "--diff-color", dest="diffcolor", default=None,
                   metavar="RRGGBB",
                   help="diff: hex highlight color for pixels whose rgb "
                        "difference all exceed the threshold")
    p.add_argument("-m", "--mip", type=int, default=0, help="mip level")
    p.add_argument("-item", type=int, default=0, help="array item")
    p.add_argument("-badtails", "--bad-tails", dest="badtails",
                   action="store_true",
                   help="accept DDS files with truncated DXTn mip tails")
    p.add_argument("-permissive", action="store_true",
                   help="relaxed DDS header validation")
    p.add_argument("-ignoremips", "--ignore-mips", dest="ignoremips",
                   action="store_true",
                   help="ignore the DDS mip chain, load level 0 only")
    p.add_argument("-xlum", "--expand-luminance", action="store_true",
                   dest="expand_luminance",
                   help="expand legacy L8/L16/A8L8 luminance to RGB on load")
    p.add_argument("-tu", "--typeless-unorm", action="store_true",
                   dest="typeless_unorm",
                   help="treat TYPELESS input as UNORM")
    p.add_argument("-tf", "--typeless-float", action="store_true",
                   dest="typeless_float",
                   help="treat TYPELESS input as FLOAT")
    p.add_argument("-nologo", action="store_true")
    p.add_argument("-version", action="store_true",
                   help="print version and exit")
    return p


def _load(path, args=None):
    from ..formats import traits
    from ..io import DDS_FLAGS, load_texture
    kwargs = {}
    if args is not None and str(path).lower().endswith(".dds"):
        dflags = DDS_FLAGS.NONE
        if args.badtails:
            dflags |= DDS_FLAGS.BAD_DXTN_TAILS
        if args.permissive:
            dflags |= DDS_FLAGS.PERMISSIVE
        if args.ignoremips:
            dflags |= DDS_FLAGS.IGNORE_MIPS
        if args.expand_luminance:
            dflags |= DDS_FLAGS.EXPAND_LUMINANCE
        if dflags:
            kwargs["flags"] = dflags
    tex = load_texture(path, **kwargs)
    # TYPELESS promotion (-tu / -tf, texdiag.cpp loader options)
    if args is not None and traits.is_typeless(tex.metadata.format):
        if args.typeless_unorm:
            tex = tex.replace_levels(tex.levels, tex.metadata.with_format(
                traits.make_typeless_unorm(tex.metadata.format)))
        elif args.typeless_float:
            tex = tex.replace_levels(tex.levels, tex.metadata.with_format(
                traits.make_typeless_float(tex.metadata.format)))
    return tex


def cmd_info(args, log=print) -> int:
    from ..formats import traits
    from ..io import get_metadata_from_dds_memory
    from ..texture import CompressedTexture

    tex = _load(args.file, args)
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

    tex = _load(args.file, args)
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

    tex = _load(args.file, args)
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
        w0 = raw[:, :4].copy().view("<u4").reshape(-1)
        # partition histograms per partitioned mode (AnalyzeBC,
        # Texdiag/texdiag.cpp:906+): the partition field sits right after
        # the mode bits (ms_aInfo uPartitionBits, BC6HBC7.cpp:1106-1125)
        for mode, pbits in ((0, 4), (1, 6), (2, 6), (3, 6), (7, 6)):
            sel = w0[modes == mode]
            if not len(sel):
                continue
            part = (sel >> (mode + 1)) & ((1 << pbits) - 1)
            vals, counts = np.unique(part, return_counts=True)
            pretty = " ".join(f"{v}:{n}" for v, n in zip(vals, counts))
            log(f"    mode {mode} partitions: {pretty}")
        # rotation histogram for modes 4/5, index-mode split for mode 4
        for mode in (4, 5):
            sel = w0[modes == mode]
            if len(sel):
                rot = (sel >> (mode + 1)) & 0x3
                log(f"    mode {mode} rotations: "
                    f"{np.bincount(rot, minlength=4).tolist()}")
                if mode == 4:
                    im = (sel >> 7) & 0x1
                    log(f"    mode 4 index modes: "
                        f"{np.bincount(im, minlength=2).tolist()}")
    elif fmt in (FMT.BC6H_UF16, FMT.BC6H_SF16, FMT.BC6H_TYPELESS):
        b0 = raw[:, 0].astype(int)
        m2 = b0 & 0x3
        mode = np.where(m2 < 2, m2, b0 & 0x1F)
        vals, counts = np.unique(mode, return_counts=True)
        for v, count in zip(vals, counts):
            log(f"    mode {v:#04x}: {count} ({100 * count / len(mode):.1f}%)")
        # 2-region modes carry a 5-bit shape at bits 77..81
        # (ms_aDesc D_ entries, BC6HBC7.cpp:879+)
        w2 = raw[:, 8:12].copy().view("<u4").reshape(-1)
        is2 = ~np.isin(mode, (0x03, 0x07, 0x0B, 0x0F))
        sel = w2[is2]
        if len(sel):
            shape = (sel >> 13) & 0x1F
            vals, counts = np.unique(shape, return_counts=True)
            pretty = " ".join(f"{v}:{n}" for v, n in zip(vals, counts))
            log(f"    2-region shapes: {pretty}")
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

    a = _load(args.file, args)
    b = _load(args.file2, args)
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
    """|a-b| difference image; with -c, pixels whose r, g and b
    differences all reach the -t threshold are painted the highlight
    color instead (Texdiag/texdiag.cpp:1281-1305)."""
    from ..io import save_texture
    from ..ops import decompress
    from ..texture import CompressedTexture, Texture

    a = _load(args.file, args)
    b = _load(args.file2, args)
    if isinstance(a, CompressedTexture):
        a = decompress(a)
    if isinstance(b, CompressedTexture):
        b = decompress(b)
    d = np.abs(a.to_numpy() - b.to_numpy())
    d[..., 3] = 1.0
    if args.diffcolor:
        cv = int(args.diffcolor, 16)
        color = np.array([(cv >> 16 & 0xFF) / 255.0,
                          (cv >> 8 & 0xFF) / 255.0,
                          (cv & 0xFF) / 255.0, 1.0], np.float32)
        hit = (d[..., :3] >= args.threshold).all(axis=-1)
        d = np.where(hit[..., None], color, d)
    out = _out_path(args, args.output or "diff.png")
    if out is None:
        return 1
    save_texture(Texture.from_array(np.clip(d, 0, 1)
                                    .astype(np.float32)), out)
    log(f"  wrote {out}")
    return 0


def cmd_dumpbc(args, log=print) -> int:
    from ..formats import traits
    from ..texture import CompressedTexture

    tex = _load(args.file, args)
    if not isinstance(tex, CompressedTexture):
        log("dumpbc requires a BC-compressed input")
        return 1
    fmt = tex.metadata.format
    bpb = traits.bytes_per_block(fmt)
    w, h, _ = tex.metadata.mip_dims(args.mip)
    nbw, nbh = (w + 3) // 4, (h + 3) // 4
    raw = tex.level_bytes(args.mip, args.item).reshape(-1, bpb)
    from ..ops.compress import _DECODERS, _decode_blocks
    if args.targetx >= 0 or args.targety >= 0:
        # -targetx/-targety are pixel coordinates; dump the containing
        # block (DumpBCImage, Texdiag/texdiag.cpp:1504-1552)
        px = max(args.targetx, 0)
        py = max(args.targety, 0)
        if px >= w or py >= h:
            log(f"WARNING: pixel ({px},{py}) out of range for {w}x{h}")
            return 1
        picks = [(px // 4, py // 4)]
    else:
        picks = [(bx, by) for by in range(nbh) for bx in range(nbw)]
    for bx, by in picks:
        block = raw[by * nbw + bx]
        log(f"  block ({bx},{by}) of {fmt.name}: "
            + " ".join(f"{v:02x}" for v in block))
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

    tex = _load(args.file, args)
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
            out = _out_path(args, f"{name}.{ext}")
            if out is None:
                return 1
            save_texture(Texture.from_array(img.astype(np.float32)), out)
            count += 1
    log(f"  wrote {count} surfaces")
    return 0


def _out_path(args, name):
    """Apply -l lowercase and the -y overwrite guard to an output path."""
    if args.tolower:
        name = name.lower()
    if os.path.exists(name) and not args.overwrite:
        print(f"error: {name} exists (use -y to overwrite)",
              file=sys.stderr)
        return None
    return name


def main(argv=None) -> int:
    if "-version" in (argv if argv is not None else sys.argv[1:]):
        from .. import __version__
        print(f"texdiag (directxtex_tpu) {__version__}")
        return 0
    args = build_parser().parse_args(argv)
    if not args.nologo:
        print("texdiag (directxtex_tpu)")
    cmds = {"info": cmd_info, "analyze": cmd_analyze,
            "analyzebc": cmd_analyzebc, "compare": cmd_compare,
            "diff": cmd_diff, "dumpbc": cmd_dumpbc, "dumpdds": cmd_dumpdds}

    from .texconv import expand_files, read_file_list
    patterns = list(args.files)
    if args.flist:
        patterns.extend(read_file_list(args.flist))
    if args.command in ("compare", "diff"):
        if len(patterns) != 2:
            print("error: command requires two files", file=sys.stderr)
            return 1
        args.file, args.file2 = patterns
        return cmds[args.command](args)
    files = expand_files(patterns, args.recursive)
    if not files:
        print("error: no input files matched", file=sys.stderr)
        return 1
    failed = 0
    for path in files:
        if len(files) > 1:
            print(f"  --- {path}")
        args.file = path
        try:
            if cmds[args.command](args) != 0:
                failed += 1
        except Exception as e:  # keep going like the reference tool
            print(f"  FAILED {path}: {e}", file=sys.stderr)
            failed += 1
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
