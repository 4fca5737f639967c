"""Shared BC codec helpers: block layout and OptimizeAlpha.

The reference processes one 4x4 block at a time (BC.h:318-343); here every
function is batched over [NB, 16, ...] arrays so millions of blocks encode in
one device call (the whole point of the rebuild — SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "image_to_blocks", "blocks_to_image", "optimize_alpha",
    "optimize_alpha_t",
]


def image_to_blocks(img: jnp.ndarray) -> tuple[jnp.ndarray, int, int]:
    """[H, W, C] -> ([NB, 16, C], nbh, nbw) with edge replication for
    partial blocks (DirectXTexCompress.cpp:159-187 semantics).

    Pixels within a block are in raster order (row-major), matching the
    reference's LoadScanline x4 ordering.
    """
    h, w, c = img.shape
    ph = (-h) % 4
    pw = (-w) % 4
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    nbh = (h + 3) // 4
    nbw = (w + 3) // 4
    blocks = img.reshape(nbh, 4, nbw, 4, c).transpose(0, 2, 1, 3, 4)
    return blocks.reshape(nbh * nbw, 16, c), nbh, nbw


def blocks_to_image(blocks: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[NB, 16, C] -> [H, W, C], cropping any partial-block padding."""
    nbh = (height + 3) // 4
    nbw = (width + 3) // 4
    c = blocks.shape[-1]
    img = blocks.reshape(nbh, nbw, 4, 4, c).transpose(0, 2, 1, 3, 4)
    img = img.reshape(nbh * 4, nbw * 4, c)
    return img[:height, :width]


def optimize_alpha_t(points: jnp.ndarray, csteps: int,
                     signed: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched OptimizeAlpha (BC.h:187-311) over lane-major [16, NB] planes.

    Newton least-squares endpoint fit for the BC3/BC4/BC5 scalar channel.
    Returns (fX, fY) each [NB] with fX <= fY (min endpoint first).
    """
    if csteps == 6:
        pC = [5/5, 4/5, 3/5, 2/5, 1/5, 0/5, 0.0, 0.0]
        pD = [0/5, 1/5, 2/5, 3/5, 4/5, 5/5, 0.0, 0.0]
    else:
        pC = [7/7, 6/7, 5/7, 4/7, 3/7, 2/7, 1/7, 0/7]
        pD = [0/7, 1/7, 2/7, 3/7, 4/7, 5/7, 6/7, 7/7]

    MIN_VALUE = -1.0 if signed else 0.0
    MAX_VALUE = 1.0

    if csteps == 8:
        fX = jnp.min(points, axis=0)
        fY = jnp.max(points, axis=0)
    else:
        # min/max excluding values at the codec boundary (BC.h:216-230)
        fX = jnp.min(jnp.where(points > MIN_VALUE, points, MAX_VALUE), axis=0)
        fY = jnp.max(jnp.where(points < MAX_VALUE, points, MIN_VALUE), axis=0)
        fY = jnp.where(fX == fY, MAX_VALUE, fY)

    fsteps = float(csteps - 1)

    def body(_, carry):
        fX, fY, done = carry
        stop_now = (fY - fX) < (1.0 / 256.0)
        active = jnp.logical_not(done | stop_now)

        scale = fsteps / jnp.where(fY - fX == 0, 1.0, fY - fX)
        fdot = (points - fX) * scale                      # [16, NB]
        # uint32_t(fDot + 0.5): round half-up
        istep_mid = jnp.floor(fdot + 0.5).astype(jnp.int32)
        if csteps == 6:
            lo = jnp.where(points <= (fX + MIN_VALUE) * 0.5, 6, 0)
            hi = jnp.where(points >= (fY + MAX_VALUE) * 0.5, 7, csteps - 1)
        else:
            lo = jnp.zeros_like(istep_mid)
            hi = jnp.full_like(istep_mid, csteps - 1)
        istep = jnp.where(fdot <= 0.0, lo,
                          jnp.where(fdot >= fsteps, hi, istep_mid))

        # the Newton moment sums close over per-pixel pC/pD planes (one
        # masked reduction each instead of a per-step loop of reductions);
        # pC/pD come from the exact table constants via index selects so
        # the arithmetic matches the reference's step values bit-for-bit
        pc = jnp.zeros_like(points)
        pd = jnp.zeros_like(points)
        for k in range(csteps):
            hit = istep == k
            pc = jnp.where(hit, jnp.float32(pC[k]), pc)
            pd = jnp.where(hit, jnp.float32(pD[k]), pd)
        step_px = pc * fX[None, :] + pd * fY[None, :]
        diff = step_px - points
        dX = jnp.sum(pc * diff, axis=0)
        dY = jnp.sum(pd * diff, axis=0)
        d2X = jnp.sum(pc * pc, axis=0)
        d2Y = jnp.sum(pd * pd, axis=0)

        nX = jnp.where(d2X > 0, fX - dX / jnp.where(d2X > 0, d2X, 1.0), fX)
        nY = jnp.where(d2Y > 0, fY - dY / jnp.where(d2Y > 0, d2Y, 1.0), fY)
        swap = nX > nY
        nX, nY = jnp.where(swap, nY, nX), jnp.where(swap, nX, nY)

        converged = (dX * dX < 1.0 / 64.0) & (dY * dY < 1.0 / 64.0)
        fX = jnp.where(active, nX, fX)
        fY = jnp.where(active, nY, fY)
        done = done | stop_now | (active & converged)
        return fX, fY, done

    # unrolled: 8 fixed Newton iterations fuse into one kernel instead of
    # paying sequential while-loop control overhead per step
    carry = (fX, fY, jnp.zeros(points.shape[1], bool))
    for i in range(8):
        carry = body(i, carry)
    fX, fY, _ = carry
    return (jnp.clip(fX, MIN_VALUE, MAX_VALUE),
            jnp.clip(fY, MIN_VALUE, MAX_VALUE))


def optimize_alpha(points: jnp.ndarray, csteps: int,
                   signed: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[NB, 16]-layout wrapper around optimize_alpha_t."""
    return optimize_alpha_t(jnp.transpose(jnp.asarray(points, jnp.float32)),
                            csteps, signed)
