"""Colorspace transforms: sRGB <-> linear and helpers.

Matches DirectXMath's XMColorSRGBToRGB / XMColorRGBToSRGB (used by the
reference's ConvertScanline, DirectXTexConvert.cpp:3172+, and the
Load/StoreScanlineLinear wrappers :2796-2950). Alpha passes through.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["srgb_to_linear", "linear_to_srgb", "apply_srgb_to_linear",
           "apply_linear_to_srgb", "GRAYSCALE"]

# g_Grayscale (DirectXTexConvert.cpp:194); used for RGB -> luminance
GRAYSCALE = (0.2125, 0.7154, 0.0721)


def srgb_to_linear(v: jnp.ndarray) -> jnp.ndarray:
    """Per-component sRGB -> linear (XMColorSRGBToRGB)."""
    v = jnp.clip(v, 0.0, 1.0)
    linear = v * (1.0 / 12.92)
    exp = jnp.power((v + 0.055) * (1.0 / 1.055), 2.4)
    return jnp.where(v < 0.04045, linear, exp)


def linear_to_srgb(v: jnp.ndarray) -> jnp.ndarray:
    """Per-component linear -> sRGB (XMColorRGBToSRGB)."""
    v = jnp.clip(v, 0.0, 1.0)
    small = v * 12.92
    big = 1.055 * jnp.power(v, 1.0 / 2.4) - 0.055
    return jnp.where(v < 0.0031308, small, big)


def apply_srgb_to_linear(rgba: jnp.ndarray) -> jnp.ndarray:
    """sRGB->linear on RGB, alpha untouched. rgba is [..., 4]."""
    return jnp.concatenate(
        [srgb_to_linear(rgba[..., :3]), rgba[..., 3:4]], axis=-1)


def apply_linear_to_srgb(rgba: jnp.ndarray) -> jnp.ndarray:
    """linear->sRGB on RGB, alpha untouched. rgba is [..., 4]."""
    return jnp.concatenate(
        [linear_to_srgb(rgba[..., :3]), rgba[..., 3:4]], axis=-1)
