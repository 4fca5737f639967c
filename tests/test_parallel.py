"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from directxtex_tpu.bc import bc123
from directxtex_tpu.parallel import (
    make_mesh, shard_batch, sharded_compress_fn, sharded_mse,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_bc1_matches_single_device():
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    blocks = rng.random((64, 16, 4)).astype(np.float32)
    blocks[..., 3] = 1.0

    fn = sharded_compress_fn(
        lambda b: bc123.encode_bc1(b, 0.5, 0), mesh)
    sharded = shard_batch(jnp.asarray(blocks), mesh)
    out_sharded = np.asarray(fn(sharded))
    out_local = np.asarray(bc123.encode_bc1(blocks, 0.5, 0))
    np.testing.assert_array_equal(out_sharded, out_local)


def test_sharded_bc7_quick_matches_single_device():
    """The flagship codec sharded (VERDICT r3 #5): BC7 QUICK (mode-6-only,
    TEX_COMPRESS_BC7_QUICK — the graph XLA-CPU can compile in test
    budget) over the mesh must be byte-identical to the single-device
    encode. The full-scope kernel shards the same way (block axis
    data-parallel, zero collectives); its sharded compile is covered on
    hardware via benchmarks/verify_tpu.py."""
    from directxtex_tpu.bc import bc67

    mesh = make_mesh()
    rng = np.random.default_rng(3)
    blocks = rng.random((64, 16, 4)).astype(np.float32)
    blocks[..., 3] = 1.0

    def enc(b):
        return bc67.encode_bc7(b, flags=bc67._BC7_QUICK, opaque=True)

    fn = sharded_compress_fn(enc, mesh)
    sharded = shard_batch(jnp.asarray(blocks), mesh)
    out_sharded = np.asarray(fn(sharded))
    out_local = np.asarray(enc(jnp.asarray(blocks)))
    np.testing.assert_array_equal(out_sharded, out_local)


def test_sharded_bc6h_matches_single_device():
    """BC6H sharded (VERDICT r4 #5): a reduced-scope graph — the four
    1-region rows plus one 2-region precision group (shape ranking +
    shared fit included) — is what XLA-CPU can compile in test budget;
    the sharded encode must be byte-identical to the single-device
    encode. Full scope shards identically (block axis data-parallel,
    zero collectives) and runs on hardware via benchmarks/verify_tpu."""
    from directxtex_tpu.bc import bc67

    mesh = make_mesh()
    rng = np.random.default_rng(7)
    blocks = (rng.random((64, 16, 4)).astype(np.float32) * 4.0)
    blocks[..., 3] = 1.0

    def enc(b):
        return bc67.encode_bc6h(b, signed=False, rows_sel=("r1", 0))

    fn = sharded_compress_fn(enc, mesh)
    sharded = shard_batch(jnp.asarray(blocks), mesh)
    out_sharded = np.asarray(fn(sharded))
    out_local = np.asarray(enc(jnp.asarray(blocks)))
    np.testing.assert_array_equal(out_sharded, out_local)


def test_sharded_mse_psum():
    mesh = make_mesh()
    a = shard_batch(jnp.ones((16, 32)), mesh)
    b = shard_batch(jnp.full((16, 32), 0.5), mesh)
    mse = float(sharded_mse(mesh)(a, b))
    assert abs(mse - 0.25) < 1e-6


def test_graft_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)
    # single-chip entry also compiles
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    # BC7 (16 bytes/block) once bc67 landed; BC1 (8) before
    assert out.shape in ((16 * 16, 16), (16 * 16, 8))


class TestSpatial:
    """Rows-sharded huge-image path: halo exchange over the mesh
    (SURVEY.md §5 large-texture note)."""

    def _mesh(self):
        import jax
        from directxtex_tpu.parallel import make_mesh
        return make_mesh(jax.devices()[:8])

    @pytest.mark.parametrize("wrap", [True, False])
    def test_halo_exchange_rows(self, wrap):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from directxtex_tpu.parallel import halo_exchange_rows
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map

        mesh = self._mesh()
        H, W = 32, 8
        x = np.arange(H * W, dtype=np.float32).reshape(H, W)
        sh = NamedSharding(mesh, P("batch"))

        fn = jax.jit(shard_map(
            lambda v: halo_exchange_rows(v, 1, "batch", wrap=wrap),
            mesh=mesh, in_specs=P("batch"), out_specs=P("batch")))
        out = np.asarray(fn(jax.device_put(jnp.asarray(x), sh)))
        # each shard of 4 rows becomes 6: check shard 1 (rows 4..7)
        s1 = out[6:12]
        np.testing.assert_array_equal(s1[0], x[3])   # top halo
        np.testing.assert_array_equal(s1[1:5], x[4:8])
        np.testing.assert_array_equal(s1[5], x[8])   # bottom halo
        # global edges: shard 0 top halo
        top0 = out[0]
        np.testing.assert_array_equal(top0, x[-1] if wrap else x[0])
        botN = out[-1]
        np.testing.assert_array_equal(botN, x[0] if wrap else x[-1])

    @pytest.mark.parametrize("mirror_v", [False, True])
    def test_sharded_normal_map_matches_full(self, mirror_v):
        import jax
        import jax.numpy as jnp
        from directxtex_tpu.parallel import sharded_normal_map, rows_sharding

        mesh = self._mesh()
        H, W = 64, 16
        rng = np.random.default_rng(11)
        height = rng.random((H, W)).astype(np.float32)
        amp = 2.0

        # independent full-image reference (wrap via roll, clamp via pad)
        def shift(h, dy, dx):
            if mirror_v and dy:
                p = np.pad(h, ((1, 1), (0, 0)), mode="edge")
                h = p[1 + dy:p.shape[0] - 1 + dy]
            elif dy:
                h = np.roll(h, -dy, axis=0)
            if dx:
                h = np.roll(h, -dx, axis=1)
            return h
        nb = {(dy, dx): shift(height, dy, dx)
              for dy in (-1, 0, 1) for dx in (-1, 0, 1)}
        tx = ((nb[(-1, -1)] - nb[(-1, 1)]) + (nb[(0, -1)] - nb[(0, 1)])
              + (nb[(1, -1)] - nb[(1, 1)])) * (amp / 6.0)
        ty = ((nb[(-1, -1)] - nb[(1, -1)]) + (nb[(-1, 0)] - nb[(1, 0)])
              + (nb[(-1, 1)] - nb[(1, 1)])) * (amp / 6.0)
        ln = np.sqrt(tx * tx + ty * ty + 1.0)
        ref = np.stack([tx / ln, ty / ln, 1.0 / ln], -1) * 0.5 + 0.5

        fn = sharded_normal_map(mesh, amplitude=amp, mirror_v=mirror_v)
        out = np.asarray(fn(jax.device_put(
            jnp.asarray(height), rows_sharding(mesh))))
        np.testing.assert_allclose(out[..., :3], ref, atol=1e-5)
        np.testing.assert_allclose(out[..., 3], 1.0)

    def test_sharded_box_mip(self):
        import jax
        import jax.numpy as jnp
        from directxtex_tpu.parallel import sharded_box_mip, rows_sharding

        mesh = self._mesh()
        rng = np.random.default_rng(12)
        img = rng.random((32, 16, 4)).astype(np.float32)
        ref = img.reshape(16, 2, 8, 2, 4).mean(axis=(1, 3))
        fn = sharded_box_mip(mesh)
        out = np.asarray(fn(jax.device_put(jnp.asarray(img),
                                           rows_sharding(mesh))))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


class TestLibrary:
    """Whole-library batch compress sharded over the mesh."""

    def test_compress_library_end_to_end(self, tmp_path):
        from directxtex_tpu.formats import FMT
        from directxtex_tpu.io import save_texture
        from directxtex_tpu.bc import bc123
        from directxtex_tpu.parallel import compress_library, make_mesh
        from directxtex_tpu.texture import Texture

        rng = np.random.default_rng(20)
        paths = []
        imgs = []
        for i in range(10):  # not a multiple of 8: exercises padding
            img = rng.random((8, 8, 4)).astype(np.float32)
            p = str(tmp_path / f"t{i}.png")
            save_texture(Texture.from_array(img), p)
            paths.append(p)
            imgs.append(img)

        mesh = make_mesh(jax.devices()[:8])
        outs = compress_library(paths, FMT.BC1_UNORM, mesh, 8, 8)
        assert len(outs) == 1 and outs[0].shape == (10, 4, 8)
        # decoded blocks approximate the sources (sRGB-aware load means
        # values differ; compare against single-device encode instead)
        from directxtex_tpu.parallel import load_library
        batch = load_library(paths, 8, 8)
        from directxtex_tpu.bc.common import image_to_blocks
        blocks, _, _ = image_to_blocks(jnp.asarray(batch[3]))
        ref = np.asarray(bc123.encode_bc1(blocks, 0.5, 0))
        np.testing.assert_array_equal(outs[0][3], ref)

    def test_compress_library_mips(self, tmp_path):
        from directxtex_tpu.formats import FMT
        from directxtex_tpu.io import save_texture
        from directxtex_tpu.parallel import compress_library, make_mesh
        from directxtex_tpu.texture import Texture

        rng = np.random.default_rng(21)
        paths = []
        for i in range(8):
            img = rng.random((16, 16, 4)).astype(np.float32)
            p = str(tmp_path / f"m{i}.png")
            save_texture(Texture.from_array(img), p)
            paths.append(p)
        mesh = make_mesh(jax.devices()[:8])
        outs = compress_library(paths, FMT.BC1_UNORM, mesh, 16, 16,
                                mips=True)
        # 16x16 -> 5 levels (16, 8, 4, 2, 1)
        assert len(outs) == 5
        assert outs[0].shape == (8, 16, 8)
        assert outs[-1].shape == (8, 1, 8)
