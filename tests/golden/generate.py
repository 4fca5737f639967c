"""One-shot generator for the frozen golden test data in tests/golden/.

Run once, check the artifacts in, never regenerate silently:

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tests/golden/generate.py

Artifacts:
  decode_vectors.npz  -- random BC1-BC7 blocks + expected RGBA, produced by
                         the independent scalar D3D-spec decoders that live
                         in tests/test_bc*.py (NOT by the vectorized
                         implementation under test). Pins decode semantics:
                         a coupled edit to both implementations now fails.
                         Reference decode semantics: BC.h:321-330,
                         BC6HBC7.cpp:1658,2566.
  corpus.npz          -- deterministic content images (albedo, hard
                         two-region, normal map, alpha gradient, HDR probe)
                         + the per-codec PSNR measured at generation time.
  containers/*.dds/.tga/.hdr + containers.npz
                      -- byte-exact container fixtures with frozen decoded
                         pixels; pins both reader and writer.
"""

import importlib.util
import pathlib
import sys

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
TESTS = HERE.parent
REPO = TESTS.parent
sys.path.insert(0, str(REPO))


def _load_test_module(name):
    spec = importlib.util.spec_from_file_location(name, TESTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# scalar composite decoders (built on the spec decoders in the test modules)
# ---------------------------------------------------------------------------

def scalar_bc2(tb, data: bytes) -> np.ndarray:
    out = tb.ref_decode_bc1_block(data[8:], isbc1=False)
    bits = int.from_bytes(data[:8], "little")
    for p in range(16):
        out[p, 3] = np.float32((bits >> (4 * p)) & 0xF) * np.float32(1 / 15)
    return out


def scalar_bc3(tb, data: bytes) -> np.ndarray:
    out = tb.ref_decode_bc1_block(data[8:], isbc1=False)
    a0, a1 = data[0], data[1]
    f0 = np.float32(a0) * np.float32(1 / 255)
    f1 = np.float32(a1) * np.float32(1 / 255)
    pal = np.zeros(8, np.float32)
    pal[0], pal[1] = f0, f1
    if a0 > a1:
        for k in range(1, 7):
            pal[k + 1] = (f0 * np.float32(7 - k) + f1 * np.float32(k)) * np.float32(1 / 7)
    else:
        for k in range(1, 5):
            pal[k + 1] = (f0 * np.float32(5 - k) + f1 * np.float32(k)) * np.float32(1 / 5)
        pal[6], pal[7] = 0.0, 1.0
    bits = int.from_bytes(data[2:8].ljust(6, b"\0"), "little")
    for p in range(16):
        out[p, 3] = pal[(bits >> (3 * p)) & 7]
    return out


def gen_decode_vectors():
    tb = _load_test_module("test_bc")
    t6 = _load_test_module("test_bc6h")
    t7 = _load_test_module("test_bc7")

    rng = np.random.default_rng(0xD3C0DE)
    out = {}

    # BC1: 256 blocks, first 64 forced 3-color (c0 <= c1)
    b1 = rng.integers(0, 256, (256, 8), dtype=np.uint8)
    b1[:64, 2:4] = 0xFF
    out["bc1_blocks"] = b1
    out["bc1_rgba"] = np.stack(
        [tb.ref_decode_bc1_block(b.tobytes()) for b in b1])

    b2 = rng.integers(0, 256, (128, 16), dtype=np.uint8)
    out["bc2_blocks"] = b2
    out["bc2_rgba"] = np.stack([scalar_bc2(tb, b.tobytes()) for b in b2])

    b3 = rng.integers(0, 256, (128, 16), dtype=np.uint8)
    out["bc3_blocks"] = b3
    out["bc3_rgba"] = np.stack([scalar_bc3(tb, b.tobytes()) for b in b3])

    b4 = rng.integers(0, 256, (128, 8), dtype=np.uint8)
    b4[0, 0] = 0x80  # SNORM -128 clamp case
    out["bc4_blocks"] = b4
    out["bc4u_r"] = np.stack(
        [tb.ref_decode_bc4_block(b.tobytes()) for b in b4])
    out["bc4s_r"] = np.stack(
        [tb.ref_decode_bc4_block(b.tobytes(), True) for b in b4])

    b5 = rng.integers(0, 256, (64, 16), dtype=np.uint8)
    out["bc5_blocks"] = b5
    out["bc5u_r"] = np.stack(
        [tb.ref_decode_bc4_block(b[:8].tobytes()) for b in b5])
    out["bc5u_g"] = np.stack(
        [tb.ref_decode_bc4_block(b[8:].tobytes()) for b in b5])
    out["bc5s_r"] = np.stack(
        [tb.ref_decode_bc4_block(b[:8].tobytes(), True) for b in b5])
    out["bc5s_g"] = np.stack(
        [tb.ref_decode_bc4_block(b[8:].tobytes(), True) for b in b5])

    # BC6H: every mode x 16 blocks + 64 mixed random (incl. reserved modes)
    b6_list = [t6.blocks_with_mode6h(mv, 16, 600 + mv)
               for mv in t6.MODE_VALUES]
    b6_list.append(rng.integers(0, 256, (64, 16), dtype=np.uint8))
    b6 = np.concatenate(b6_list)
    out["bc6h_blocks"] = b6
    # expected stored as uint16 half bit patterns (NaN-safe exact compare)
    out["bc6h_uf_bits"] = np.stack(
        [t6.scalar_decode_bc6h(b.tobytes(), False) for b in b6]
    ).astype(np.float16).view(np.uint16)
    out["bc6h_sf_bits"] = np.stack(
        [t6.scalar_decode_bc6h(b.tobytes(), True) for b in b6]
    ).astype(np.float16).view(np.uint16)

    # BC7: every mode x 32 blocks + 64 mixed random + 4 reserved
    b7_list = [t7.blocks_with_mode(m, 32, 700 + m) for m in range(8)]
    b7_list.append(rng.integers(0, 256, (64, 16), dtype=np.uint8))
    b7_list.append(np.zeros((4, 16), np.uint8))  # reserved mode
    b7 = np.concatenate(b7_list)
    out["bc7_blocks"] = b7
    out["bc7_rgba"] = np.stack(
        [t7.scalar_decode_bc7(b.tobytes()) for b in b7])

    np.savez_compressed(HERE / "decode_vectors.npz", **out)
    print(f"decode_vectors.npz: {len(out)} arrays")


# ---------------------------------------------------------------------------
# content corpus + PSNR floors
# ---------------------------------------------------------------------------

def make_corpus():
    """Deterministic 64x64 content images spanning the cases the quality
    sensitivity notes in bc/bc67.py care about (albedo, hard two-region),
    plus normal-map, alpha-gradient, and HDR content."""
    n = 64
    x = np.linspace(0, 1, n, dtype=np.float32)
    gx, gy = np.meshgrid(x, x)
    rng = np.random.default_rng(0xC0FFEE)

    albedo = np.stack([
        0.45 + 0.25 * np.sin(gx * 11) * np.cos(gy * 7),
        0.40 + 0.20 * np.sin((gx + gy) * 9),
        0.35 + 0.30 * np.cos(gx * 5) * np.sin(gy * 13),
        np.ones_like(gx)], -1)
    albedo[..., :3] += (rng.random((n, n, 3)).astype(np.float32) - 0.5) * 0.06

    region = ((np.sin(gx * 6) + np.cos(gy * 4)) > 0.3).astype(np.float32)
    tworegion = np.stack([
        0.9 * region + 0.12 * (1 - region),
        0.15 * region + 0.75 * (1 - region),
        0.2 * region + 0.65 * (1 - region),
        np.ones_like(gx)], -1)
    tworegion[..., :3] += (rng.random((n, n, 3)).astype(np.float32) - 0.5) * 0.04

    h = np.sin(gx * 8) * np.cos(gy * 8) * 0.5
    dzx = np.gradient(h, axis=1)
    dzy = np.gradient(h, axis=0)
    nvec = np.stack([-dzx, -dzy, np.ones_like(h) * 0.05], -1)
    nvec /= np.linalg.norm(nvec, axis=-1, keepdims=True)
    normal = np.concatenate(
        [nvec * 0.5 + 0.5, np.ones((n, n, 1), np.float32)], -1)

    alphagrad = albedo.copy()
    alphagrad[..., 3] = np.clip(gy * 1.2 - 0.1, 0, 1)

    hdr = np.stack([
        np.exp(3.5 * gx) * 0.08,
        np.exp(2.5 * gy) * 0.15 + 0.02,
        (gx * gy) * 6 + 0.01,
        np.ones_like(gx)], -1)
    hdr[..., :3] *= 1 + (rng.random((n, n, 3)).astype(np.float32) - 0.5) * 0.05

    def q8(img):
        out = img.copy()
        out[..., :4] = np.round(np.clip(out[..., :4], 0, 1) * 255) / 255
        return np.clip(out, 0, 1).astype(np.float32)

    out = {
        "albedo": q8(albedo),
        "tworegion": q8(tworegion),
        "normal": q8(normal),
        "alphagrad": q8(alphagrad),
        "hdr": hdr.astype(np.float32),
    }
    out.update(make_photo_corpus())
    out.update(make_hdr_corpus(out))
    return out


def make_hdr_corpus(base):
    """HDR contents beyond the 64² synthetic gradient probe (r4):
    photographic-derived radiance maps (linearized photos under a
    ±2-stop spatial exposure sweep with a highlight boost), a sun-disk
    environment (the classic BC6H stress: a >3-decade hot spot over a
    smooth sky), and a real-content signed probe (log-centered radiance,
    bipolar). These pin the BC6H gates on more than one content
    (BC6HBC7.cpp:1817-1859 reference scope)."""
    out = {}
    for name in ("photo_china", "photo_flower"):
        if name not in base:
            continue
        rgb = base[name][..., :3].astype(np.float32)
        lin = np.power(np.maximum(rgb, 0.0), 2.2)
        n = rgb.shape[0]
        x = np.linspace(-1.0, 1.0, n, dtype=np.float32)
        gx, _ = np.meshgrid(x, x)
        exposure = np.float32(2.0) ** (2.0 * gx)      # 4-stop sweep
        lum = lin.mean(-1, keepdims=True)
        boost = 1.0 + 15.0 * np.clip(lum - 0.35, 0, 1) ** 2
        hdrp = lin * exposure[..., None] * boost * 2.0 + 1e-3
        out["hdr_" + name.split("_")[1]] = np.concatenate(
            [hdrp, np.ones((n, n, 1), np.float32)],
            -1).astype(np.float32)

    # sun-disk environment: smooth sky gradient (0.05..1.6) + a ~900x
    # hot disk with a soft halo — exercises the coarse-precision rows'
    # quantize snap and the 1-region W11+ constant-block paths
    n = 64
    x = np.linspace(0.0, 1.0, n, dtype=np.float32)
    gx, gy = np.meshgrid(x, x)
    sky_t = 1.0 - gy
    sky = np.stack([0.10 + 0.50 * sky_t,
                    0.18 + 0.75 * sky_t,
                    0.35 + 1.25 * sky_t], -1)
    d2 = (gx - 0.68) ** 2 + (gy - 0.30) ** 2
    disk = np.exp(-d2 / (2 * 0.018 ** 2)) * 900.0
    halo = np.exp(-d2 / (2 * 0.10 ** 2)) * 18.0
    sun = (disk + halo)[..., None] * np.float32([1.0, 0.92, 0.78])
    env = sky + sun
    out["hdr_sun"] = np.concatenate(
        [env, np.ones((n, n, 1), np.float32)], -1).astype(np.float32)

    # real-content signed probe: log-centered radiance of the china
    # photo (bipolar, smooth zero crossings — the BC6H_SF16 case)
    if "hdr_china" in out:
        hc = out["hdr_china"][..., :3]
        sgn = np.log2(np.maximum(hc, 1e-3))
        sgn = (sgn - np.median(sgn)) * 0.5
        out["hdr_signed"] = np.concatenate(
            [sgn, np.ones(sgn.shape[:2] + (1,), np.float32)],
            -1).astype(np.float32)
    return out


def make_photo_corpus():
    """Real photographic content at 128x128: center crops of the two CC-BY
    2.0 photos that ship with scikit-learn (sklearn/datasets/images/
    china.jpg + flower.jpg, attribution in that directory's README.txt) —
    a licence-safe source available offline. Returns {} if sklearn's
    images are not present (the frozen corpus.npz already carries them)."""
    import glob

    out = {}
    for name, fname in (("photo_china", "china.jpg"),
                        ("photo_flower", "flower.jpg")):
        hits = glob.glob("/opt/venv/lib/python3*/site-packages/sklearn/"
                         f"datasets/images/{fname}")
        if not hits:
            continue
        from PIL import Image
        img = Image.open(hits[0]).convert("RGB")
        w, h = img.size
        s = 256
        img = img.crop(((w - s) // 2, (h - s) // 2,
                        (w + s) // 2, (h + s) // 2)).resize(
                            (128, 128), Image.LANCZOS)
        rgb = np.asarray(img, np.float32) / 255.0
        rgba = np.concatenate(
            [rgb, np.ones((128, 128, 1), np.float32)], -1)
        # already u8-quantized by the decode; store as-is
        out[name] = rgba
    return out


def gen_corpus(refresh_psnr_only: bool = False):
    """refresh_psnr_only: keep the frozen content images byte-identical
    (reload them from the existing corpus.npz) and re-measure only the
    psnr_* entries — the sanctioned path when a deliberate, measured
    encoder config change shifts the frozen round-trip numbers (the
    refparity gates vs the compiled reference remain the quality bar)."""
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc123, bc45, bc67
    from directxtex_tpu.bc.common import image_to_blocks

    if refresh_psnr_only:
        old = np.load(HERE / "corpus.npz")
        corpus = {k: old[k] for k in old.files if not k.startswith("psnr_")}
        # content keys introduced since the freeze are added (derived
        # deterministically from the frozen images); existing images
        # stay byte-identical
        for k, v in make_hdr_corpus(corpus).items():
            if k not in corpus:
                corpus[k] = v
                print(f"  added new content {k}")
    else:
        corpus = make_corpus()

    def psnr(a, b, ch=4):
        m = float(np.mean((np.asarray(a)[..., :ch] - np.asarray(b)[..., :ch]) ** 2))
        return 10 * np.log10(1.0 / max(m, 1e-30))

    def log_psnr(a, b):
        a = np.maximum(np.asarray(a)[..., :3], 0) + 1e-4
        b = np.maximum(np.asarray(b)[..., :3], 0) + 1e-4
        m = float(np.mean((np.log2(a) - np.log2(b)) ** 2))
        return 10 * np.log10(36.0 / max(m, 1e-30))  # 6-stop range norm

    measured = {}

    def rt(name, img, enc, dec, ch=4, quality=psnr):
        blocks = jnp.asarray(image_to_blocks(img)[0])
        d = dec(np.asarray(enc(blocks)))
        measured[name] = quality(d, blocks) if quality is log_psnr else quality(
            np.asarray(d), np.asarray(blocks), ch)
        print(f"  {name}: {measured[name]:.2f} dB")

    for content in ("albedo", "tworegion"):
        img = corpus[content]
        rt(f"bc1_{content}", img, bc123.encode_bc1, bc123.decode_bc1, ch=3)
        rt(f"bc7_{content}", img, bc67.encode_bc7, bc67.decode_bc7)
    rt("bc2_alphagrad", corpus["alphagrad"], bc123.encode_bc2, bc123.decode_bc2)
    rt("bc3_alphagrad", corpus["alphagrad"], bc123.encode_bc3, bc123.decode_bc3)
    rt("bc7_alphagrad", corpus["alphagrad"], bc67.encode_bc7, bc67.decode_bc7)
    rt("bc4_normal", corpus["normal"], bc45.encode_bc4u, bc45.decode_bc4u, ch=1)
    rt("bc5_normal", corpus["normal"], bc45.encode_bc5u, bc45.decode_bc5u, ch=2)
    rt("bc7_normal", corpus["normal"], bc67.encode_bc7, bc67.decode_bc7)
    for content in ("photo_china", "photo_flower"):
        if content in corpus:
            rt(f"bc1_{content}", corpus[content], bc123.encode_bc1,
               bc123.decode_bc1, ch=3)
            rt(f"bc7_{content}", corpus[content], bc67.encode_bc7,
               bc67.decode_bc7)
    for content in ("hdr", "hdr_china", "hdr_flower", "hdr_sun"):
        if content not in corpus:
            continue
        rt(f"bc6h_{content}", corpus[content],
           lambda b: bc67.encode_bc6h(b, signed=False),
           lambda e: bc67.decode_bc6h(e, signed=False), quality=log_psnr)
    if "hdr_signed" in corpus:
        # signed probe is bipolar: log-PSNR is meaningless; use linear
        # PSNR against the content's own peak
        blocks = jnp.asarray(image_to_blocks(corpus["hdr_signed"])[0])
        d = np.asarray(bc67.decode_bc6h(
            np.asarray(bc67.encode_bc6h(blocks, signed=True)),
            signed=True))
        peak = float(np.abs(np.asarray(blocks)[..., :3]).max())
        m = float(np.mean(
            (d[..., :3] - np.asarray(blocks)[..., :3]) ** 2))
        measured["bc6hs_hdr_signed"] = 10 * np.log10(
            peak * peak / max(m, 1e-30))
        print(f"  bc6hs_hdr_signed: {measured['bc6hs_hdr_signed']:.2f} dB")

    if refresh_psnr_only:
        # print the old-vs-new deltas so a refresh leaves an auditable
        # record (paste into the commit message); the refparity gates vs
        # the compiled reference stay the primary quality bar.
        print("refresh deltas (old -> new):")
        for k, v in measured.items():
            key = f"psnr_{k}"
            if key in old.files:
                prev = float(old[key])
                print(f"  {k}: {prev:.3f} -> {v:.3f} ({v - prev:+.3f} dB)")
            else:
                print(f"  {k}: (new) {v:.3f}")

    data = dict(corpus)
    for k, v in measured.items():
        data[f"psnr_{k}"] = np.float32(v)
    np.savez_compressed(HERE / "corpus.npz", **data)
    print("corpus.npz written")


# ---------------------------------------------------------------------------
# container fixtures
# ---------------------------------------------------------------------------

def gen_containers():
    from directxtex_tpu import Texture
    from directxtex_tpu.formats import FMT
    from directxtex_tpu.io import dds, hdr, tga
    from directxtex_tpu.ops.compress import compress
    from directxtex_tpu.ops.mipmaps import generate_mipmaps

    cdir = HERE / "containers"
    cdir.mkdir(exist_ok=True)
    corpus = make_corpus()
    expected = {}

    img16 = corpus["albedo"][:16, :16]
    tex = Texture.from_array(img16)

    # DDS: RGBA8 with mips (legacy DX9 header)
    mt = generate_mipmaps(tex)
    (cdir / "rgba8_mips.dds").write_bytes(dds.save_to_dds_memory(mt))
    # freeze the loader's view (RGBA8 wire quantization applied)
    loaded = dds.load_from_dds_memory((cdir / "rgba8_mips.dds").read_bytes())
    for i, lvl in enumerate(loaded.levels):
        expected[f"rgba8_mips_l{i}"] = np.asarray(lvl)
    expected["rgba8_mips_nlevels"] = np.int64(len(loaded.levels))

    # DDS: BC1 compressed (fourCC DXT1 legacy header)
    ct = compress(tex, FMT.BC1_UNORM)
    (cdir / "bc1.dds").write_bytes(dds.save_to_dds_memory(ct))
    expected["bc1_payload"] = np.asarray(ct.levels[0])

    # DDS: BC7 (DX10 extended header)
    ct7 = compress(tex, FMT.BC7_UNORM)
    (cdir / "bc7_dx10.dds").write_bytes(
        dds.save_to_dds_memory(ct7, dds.DDS_FLAGS.FORCE_DX10_EXT))
    expected["bc7_payload"] = np.asarray(ct7.levels[0])

    # TGA true-color
    (cdir / "albedo.tga").write_bytes(tga.save_to_tga_memory(tex))
    expected["tga_pixels"] = img16

    # HDR: RGBE RLE (width >= 8 so new-style RLE kicks in)
    hdr_img = corpus["hdr"][:16, :32]
    htex = Texture.from_array(hdr_img, fmt=FMT.R32G32B32A32_FLOAT)
    (cdir / "probe.hdr").write_bytes(hdr.save_to_hdr_memory(htex))
    # RGBE is lossy; freeze the decoded pixels instead
    expected["hdr_pixels"] = np.asarray(
        hdr.load_from_hdr_memory((cdir / "probe.hdr").read_bytes()).levels[0])

    # EXR: PIZ-compressed half RGBA (pins the wavelet+Huffman codec bytes
    # AND the decoded pixels)
    from directxtex_tpu.io import exr
    piz_img = corpus["hdr"][:40, :24]  # > 32 rows: two PIZ chunks
    ptex = Texture.from_array(piz_img, fmt=FMT.R32G32B32A32_FLOAT)
    (cdir / "probe_piz.exr").write_bytes(
        exr.save_to_exr_memory(ptex, compression=exr._PIZ))
    expected["piz_pixels"] = np.asarray(exr.load_from_exr_memory(
        (cdir / "probe_piz.exr").read_bytes()).levels[0][0])

    np.savez_compressed(HERE / "containers.npz", **expected)
    print("containers/: fixtures written")


if __name__ == "__main__":
    if "--refresh-psnr" in sys.argv:
        gen_corpus(refresh_psnr_only=True)
    else:
        gen_decode_vectors()
        gen_corpus()
        gen_containers()
