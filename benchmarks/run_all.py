"""The five BASELINE.md benchmark configs, measured on the current backend.

Prints one JSON line per config. Device-time measurement chains dependent
dispatches and subtracts one measured host round trip (same scheme as
bench.py) because block_until_ready() returns early over the TPU tunnel.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _timeit(fn, *args, n=8):
    import jax
    import jax.numpy as jnp

    # args are captured, not passed per call: the axon tunnel marshals jit
    # arguments on every dispatch (~7ms for a 67MB array), which would
    # measure the harness rather than the chip. Captured jax.Arrays stay
    # device-resident implicit parameters.
    @jax.jit
    def chained(s):
        out = fn(*args)
        acc = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(out):
            acc += jnp.sum(leaf.astype(jnp.float32)) * 1e-30
        return s + acc

    s = jnp.float32(0.0)
    float(chained(s))
    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(s))
    t0 = time.perf_counter()
    float(trivial(s))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        s = chained(s)
    float(s)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32) - np.asarray(b, np.float32)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def config1():
    """1024x1024 RGBA8 -> BC1 + full box mip chain (texconv path)."""
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc123
    from directxtex_tpu.bc.common import image_to_blocks

    size = 1024
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, size, dtype=np.float32)
    gx, gy = np.meshgrid(x, x)
    img = np.clip(np.stack([gx, gy, gx * gy, np.ones_like(gx)], -1)
                  + rng.normal(0, .02, (size, size, 4)), 0, 1).astype(np.float32)

    from directxtex_tpu.models.pipelines import mipped_compress_pipeline
    step = mipped_compress_pipeline("bc1", srgb=False)
    dt = _timeit(step, jnp.asarray(img))
    texels = size * size * 4 // 3  # full chain
    from directxtex_tpu.bc import bc123 as _b
    enc = _b.encode_bc1(jnp.asarray(image_to_blocks(jnp.asarray(img))[0]), 0.5, 0)
    dec = _b.decode_bc1(enc)
    q = _psnr(dec, image_to_blocks(jnp.asarray(img))[0])
    return {"config": "1_bc1_1024_with_mips", "mtexels_per_s": round(texels / dt / 1e6, 1),
            "psnr_db": round(q, 2)}


def config2():
    """BC3/BC4/BC5 encode + sRGB convert + premultiply over a 64-image array."""
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc123, bc45
    from directxtex_tpu.bc.common import image_to_blocks
    from directxtex_tpu.ops.colorspace import apply_srgb_to_linear

    n, size = 64, 256
    rng = np.random.default_rng(1)
    batch = rng.random((n, size, size, 4)).astype(np.float32)

    def step(b):
        lin = apply_srgb_to_linear(b)
        pm = lin.at[..., :3].mul(lin[..., 3:4])

        def enc(img):
            blocks, _, _ = image_to_blocks(img)
            return (bc123.encode_bc3(blocks, 0),
                    bc45.encode_bc4u(blocks),
                    bc45.encode_bc5u(blocks))
        import jax
        return jax.vmap(enc)(pm)

    dt = _timeit(step, jnp.asarray(batch))
    texels = n * size * size * 3  # three codecs
    return {"config": "2_bc345_srgb_pmalpha_64array",
            "mtexels_per_s": round(texels / dt / 1e6, 1)}


def config3():
    """BC7 full search, 2K (the headline; same as bench.py)."""
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc67
    from directxtex_tpu.bc.common import image_to_blocks

    size = 2048
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, size, dtype=np.float32)
    gx, gy = np.meshgrid(x, x)
    img = np.stack([gx, gx * gy, np.abs(np.sin(gx * 37) * .5 + .3),
                    np.ones_like(gx)], -1).astype(np.float32)
    img = np.clip(img + (rng.random(img.shape).astype(np.float32) - .5) * .05, 0, 1)

    def step(im):
        blocks, _, _ = image_to_blocks(im)
        return bc67.encode_bc7(blocks, opaque=True)

    dt = _timeit(step, jnp.asarray(img))
    blocks = np.asarray(image_to_blocks(jnp.asarray(img))[0])
    enc = bc67.encode_bc7(jnp.asarray(blocks[:4096]), opaque=True)
    q = _psnr(bc67.decode_bc7(enc), blocks[:4096])
    return {"config": "3_bc7_2k", "mtexels_per_s": round(size * size / dt / 1e6, 1),
            "psnr_db": round(q, 2)}


def config4():
    """HDR equirect -> 6 cubemap faces -> BC6H_UF16 (models.pipelines)."""
    import jax.numpy as jnp
    from directxtex_tpu.models.pipelines import hdr_cubemap_pipeline

    face = 512
    rng = np.random.default_rng(2)
    eq = (rng.random((face * 2, face * 4, 4)).astype(np.float32) * 4.0)
    step = hdr_cubemap_pipeline()
    dt = _timeit(step, jnp.asarray(eq), n=4)
    texels = 6 * face * face
    return {"config": "4_hdr_cubemap_bc6h",
            "mtexels_per_s": round(texels / dt / 1e6, 1)}


def config5():
    """Asset pipeline: height->normal map -> batched BC7 over a texture
    library (models.pipelines)."""
    import jax.numpy as jnp
    from directxtex_tpu.models.pipelines import asset_pipeline

    n, size = 16, 512
    rng = np.random.default_rng(3)
    lib = rng.random((n, size, size, 4)).astype(np.float32)
    step = asset_pipeline()
    dt = _timeit(step, jnp.asarray(lib), n=4)
    texels = n * size * size
    return {"config": "5_asset_pipeline_bc7",
            "mtexels_per_s": round(texels / dt / 1e6, 1)}


def main():
    _cache()
    import jax
    backend = jax.default_backend()
    for fn in (config1, config2, config3, config4, config5):
        try:
            r = fn()
        except Exception as e:  # report and continue
            r = {"config": fn.__name__, "error": f"{type(e).__name__}: {e}"}
        r["backend"] = backend
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
