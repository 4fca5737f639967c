"""Decompose the bench.py driver path vs the raw kernels (r5).

Measures, at 2K on the real chip: (a) the full bench step — image in,
image_to_blocks + encode_bc7 under one jit, bench.py's exact shape;
(b) encode_bc7 on prebuilt [NB, 16, 4] blocks; (c) the pallas kernels
on prebuilt lane-major planes. Measured r5: 378.6 / 381.5 / 379.1
Mt/s — XLA fuses the blockize + LDR-quantize layout transforms to
~0.1 ms, so the driver figure ≈ the kernel figure and r4's 302-vs-350
driver gap was tunnel/caching noise, not bench-path cost.
Usage: python benchmarks/profile_benchpath.py  (TPU)
"""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/benchmarks")
from profile_bc7 import _enable_compile_cache, chain_time
_enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from directxtex_tpu.bc import bc67
from directxtex_tpu.bc.common import image_to_blocks

size = 2048
rng = np.random.default_rng(0)
x = np.linspace(0, 1, size, dtype=np.float32)
gx, gy = np.meshgrid(x, x)
img = np.stack([gx, (gx * gy), np.abs(np.sin(gx * 37) * 0.5 + 0.3),
                np.ones_like(gx)], axis=-1).astype(np.float32)
img += (rng.random(img.shape).astype(np.float32) - 0.5) * 0.05
img = np.clip(img, 0, 1); img[..., 3] = 1.0
x_dev = jnp.asarray(img)
texels = size * size / 1e6

# (a) full bench step (blockize + encode), bench.py's exact shape
def step_full(s):
    blocks, _, _ = image_to_blocks(x_dev + s * 1e-30)
    out = bc67.encode_bc7(blocks, opaque=True)
    return jnp.sum(out, dtype=jnp.uint32).astype(jnp.float32)
t = chain_time(step_full, jnp.float32(0.0))
print(f"bench step (blockize+encode) {t*1e3:8.2f} ms {texels/t:8.1f} Mtex/s", flush=True)

# (b) encode_bc7 on prebuilt [NB,16,4] float blocks
blocks0, _, _ = image_to_blocks(x_dev)
blocks0 = jax.block_until_ready(blocks0)
def step_blocks(s):
    out = bc67.encode_bc7(blocks0 + s * 1e-30, opaque=True)
    return jnp.sum(out, dtype=jnp.uint32).astype(jnp.float32)
t = chain_time(step_blocks, jnp.float32(0.0))
print(f"encode_bc7 on blocks         {t*1e3:8.2f} ms {texels/t:8.1f} Mtex/s", flush=True)

# (c) pallas kernels on prebuilt lane-major int planes
px_i0 = jnp.clip(jnp.transpose(jnp.asarray(blocks0), (1, 2, 0)) * 255.0 + 0.01,
                 0.0, 255.0).astype(jnp.int32)
px_i0 = jax.block_until_ready(px_i0)
from directxtex_tpu.bc.pallas_kernels import bc7_encode_pallas, bc7_refine_pallas
def step_planes(s):
    p = px_i0 + s.astype(jnp.int32)
    _, w = bc7_encode_pallas(p, (1, 3, 5, 6, 4), m4_ims=(0,))
    w = bc7_refine_pallas(p, w, bc67.LADDER_MOMENT, modes=(1, 3, 5, 4))
    return jnp.sum(w).astype(jnp.float32)
t = chain_time(step_planes, jnp.float32(0.0))
print(f"kernels on lane-major planes {t*1e3:8.2f} ms {texels/t:8.1f} Mtex/s", flush=True)
