"""ddsview — render any DDS to a viewable PNG (DDSView/ddsview.cpp).

The reference is a minimal D3D11 window; the TPU-native equivalent renders
the same layouts to PNG files: 2D images directly, cubemaps as a horizontal
cross (ddsview.cpp:578), arrays/volumes as grids, with mip/item selection.

Usage: python -m directxtex_tpu.tools.ddsview file.dds [-o out.png] [-m MIP]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def render_preview(tex, mip: int = 0) -> np.ndarray:
    """[H', W', 4] float preview of a (decompressed) texture level."""
    import jax.numpy as jnp

    lvl = tex.levels[mip]
    n = lvl.shape[0]
    if tex.metadata.is_cubemap() and n >= 6:
        px, nx, py, ny, pz, nz = (lvl[i] for i in range(6))
        z = jnp.zeros_like(px)
        rows = [jnp.concatenate([z, py, z, z], axis=1),
                jnp.concatenate([nx, pz, px, nz], axis=1),
                jnp.concatenate([z, ny, z, z], axis=1)]
        return np.asarray(jnp.concatenate(rows, axis=0))
    if n == 1:
        return np.asarray(lvl[0])
    # array / volume: tile into a roughly square grid
    cols = int(np.ceil(np.sqrt(n)))
    rows_n = (n + cols - 1) // cols
    h, w = lvl.shape[1:3]
    canvas = np.zeros((rows_n * h, cols * w, 4), np.float32)
    for i in range(n):
        r, c = divmod(i, cols)
        canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = np.asarray(lvl[i])
    return canvas


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ddsview",
                                description=__doc__.split("\n")[0])
    p.add_argument("file")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("-m", "--mip", type=int, default=0)
    p.add_argument("--tonemap", action="store_true",
                   help="Reinhard-tonemap HDR content for preview")
    p.add_argument("-nologo", action="store_true")
    args = p.parse_args(argv)
    if not args.nologo:
        print("ddsview (directxtex_tpu)")

    from ..io import load_texture, save_texture
    from ..ops import decompress
    from ..texture import CompressedTexture, Texture

    tex = load_texture(args.file)
    if isinstance(tex, CompressedTexture):
        tex = decompress(tex)
    if args.mip >= tex.mip_levels:
        print(f"error: mip {args.mip} out of range", file=sys.stderr)
        return 1
    img = render_preview(tex, args.mip)
    if args.tonemap:
        img = img / (1.0 + img)
        img[..., 3] = 1.0
    out = args.output or os.path.splitext(args.file)[0] + "_view.png"
    save_texture(Texture.from_array(np.clip(img, 0, 1)), out)
    print(f"  wrote {out} ({img.shape[1]}x{img.shape[0]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
