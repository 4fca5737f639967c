"""Tile sweep for the BC7 single-dispatch encode kernel on the TPU."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from directxtex_tpu.bc.common import image_to_blocks
    from directxtex_tpu.bc.pallas_kernels import bc7_encode_pallas

    size = 2048
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, size, dtype=np.float32)
    gx, gy = np.meshgrid(x, x)
    img = np.stack([gx, gx * gy, np.abs(np.sin(gx * 37) * .5 + .3),
                    np.ones_like(gx)], -1).astype(np.float32)
    img += (rng.random(img.shape).astype(np.float32) - .5) * .05
    img = np.clip(img, 0, 1)
    img[..., 3] = 1.0

    blocks = image_to_blocks(jnp.asarray(img))[0]
    px_i = jnp.clip(jnp.transpose(jnp.asarray(blocks), (1, 2, 0)) * 255.0
                    + 0.01, 0.0, 255.0).astype(jnp.int32)
    modes = (1, 3, 5, 6, 4)  # opaque set

    tiles = [int(t) for t in sys.argv[1:]] or [128, 256, 512]
    for tile in tiles:
        @jax.jit
        def chained(s, t=tile):
            _, w = bc7_encode_pallas(px_i + (s * 1e-30).astype(jnp.int32),
                                     modes, tile=t)
            return jnp.sum(w, dtype=jnp.uint32).astype(jnp.float32)

        t0 = time.perf_counter()
        float(chained(jnp.float32(0)))
        print(f"tile {tile}: compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        triv = jax.jit(lambda s: s + 1.0)
        s = jnp.float32(0)
        float(triv(s))
        t0 = time.perf_counter(); float(triv(s))
        rtt = time.perf_counter() - t0
        n = 10
        s = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = chained(s)
        float(s)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / n
        print(f"tile {tile}: {size*size/dt/1e6:.1f} Mtexels/s", flush=True)


if __name__ == "__main__":
    main()
