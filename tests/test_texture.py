"""Texture container tests (reference: DirectXTexImage.cpp memory model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from directxtex_tpu.formats import FMT
from directxtex_tpu.texture import (
    TexAlphaMode, TexDimension, TexMetadata, Texture,
)


def test_from_array_2d():
    img = np.random.rand(16, 16, 4).astype(np.float32)
    tex = Texture.from_array(img)
    assert tex.width == 16 and tex.height == 16
    assert tex.array_size == 1 and tex.mip_levels == 1
    assert tex.levels[0].shape == (1, 16, 16, 4)
    np.testing.assert_allclose(tex.to_numpy(), img)


def test_from_array_channel_fill():
    rgb = np.random.rand(4, 8, 3).astype(np.float32)
    tex = Texture.from_array(rgb)
    out = tex.to_numpy()
    np.testing.assert_allclose(out[..., :3], rgb)
    np.testing.assert_allclose(out[..., 3], 1.0)

    r = np.random.rand(4, 8, 1).astype(np.float32)
    tex = Texture.from_array(r)
    out = tex.to_numpy()
    np.testing.assert_allclose(out[..., 0], r[..., 0])
    np.testing.assert_allclose(out[..., 1:3], 0.0)
    np.testing.assert_allclose(out[..., 3], 1.0)


def test_from_array_array_and_volume():
    batch = np.random.rand(6, 8, 8, 4).astype(np.float32)
    cube = Texture.from_array(batch, is_cube=True)
    assert cube.metadata.is_cubemap()
    assert cube.array_size == 6

    vol = Texture.from_array(batch, dimension=TexDimension.TEXTURE3D)
    assert vol.metadata.depth == 6
    assert vol.metadata.array_size == 1
    assert vol.metadata.is_volumemap()


def test_metadata_mip_dims_and_index():
    meta = TexMetadata(width=32, height=16, array_size=3, mip_levels=6)
    assert meta.mip_dims(0) == (32, 16, 1)
    assert meta.mip_dims(4) == (2, 1, 1)
    assert meta.compute_index(2, 1) == 1 * 6 + 2
    with pytest.raises(IndexError):
        meta.compute_index(6, 0)

    vol = TexMetadata(width=8, height=8, depth=4, mip_levels=4,
                      dimension=TexDimension.TEXTURE3D)
    # level sizes 4,2,1,1 -> index of (mip=2, slice=0) is 4+2
    assert vol.compute_index(2, 0, 0) == 6
    with pytest.raises(IndexError):
        vol.compute_index(1, 0, 2)


def test_alpha_mode_roundtrip():
    meta = TexMetadata(width=4).with_alpha_mode(TexAlphaMode.PREMULTIPLIED)
    assert meta.is_pm_alpha()
    assert meta.with_alpha_mode(TexAlphaMode.STRAIGHT).alpha_mode() == TexAlphaMode.STRAIGHT


def test_texture_is_pytree():
    tex = Texture.from_array(np.random.rand(8, 8, 4).astype(np.float32))
    leaves = jax.tree_util.tree_leaves(tex)
    assert len(leaves) == 1

    # jit a function over the whole Texture pytree
    @jax.jit
    def scale(t: Texture) -> Texture:
        return Texture(t.metadata, [lvl * 2.0 for lvl in t.levels])

    out = scale(tex)
    np.testing.assert_allclose(out.to_numpy(), tex.to_numpy() * 2.0, rtol=1e-6)


def test_is_alpha_all_opaque():
    opaque = Texture.from_array(np.ones((4, 4, 4), np.float32))
    assert opaque.is_alpha_all_opaque()
    arr = np.ones((4, 4, 4), np.float32)
    arr[0, 0, 3] = 0.5
    assert not Texture.from_array(arr).is_alpha_all_opaque()
    # format without alpha reports False (reference behavior)
    nochan = Texture.from_array(np.ones((4, 4, 4), np.float32), fmt=FMT.BC5_UNORM)
    assert not nochan.is_alpha_all_opaque()
