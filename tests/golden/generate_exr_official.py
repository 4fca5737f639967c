"""One-shot generator for official-OpenEXR EXR fixtures.

Run once with libopenexr-dev present, check the artifacts in:

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
        python tests/golden/generate_exr_official.py

Artifacts (tests/golden/exr_official/):
  <comp>.exr           -- one file per Imf::Compression id (none, rle,
                          zips, zip, piz, pxr24, b44, b44a, dwaa, dwab),
                          written by the OFFICIAL OpenEXR library
                          (RgbaOutputFile via native/exr_openexr.cpp) —
                          true external-writer fixtures for the pure
                          reader in io/exr.py.
  decoded.npz          -- the official library's own decode of each file
                          (half bits, [H, W, 4] uint16). Frozen at
                          generation time so the parity tests run
                          without libOpenEXR installed.

Mirrors the reference's ground truth: its EXR adapter IS this library
(Auxiliary/DirectXTexEXR.cpp RgbaInputFile/RgbaOutputFile).
"""

import pathlib
import sys

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
REPO = HERE.parent.parent
sys.path.insert(0, str(REPO))

from directxtex_tpu import native  # noqa: E402

COMP_NAMES = ["none", "rle", "zips", "zip", "piz",
              "pxr24", "b44", "b44a", "dwaa", "dwab"]


def test_image(height=57, width=64):
    """Deterministic HDR-ish content: smooth gradient + hard two-region
    split + specular spikes + alpha ramp. Odd height exercises partial
    final chunks for every lines-per-block."""
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    r = 0.2 + 1.5 * xx / width
    g = np.where(xx + yy * 0.5 < width * 0.6, 0.05, 2.5).astype(np.float32)
    b = 0.5 + 0.4 * np.sin(yy * 0.37) * np.cos(xx * 0.21)
    rng = np.random.default_rng(1234)
    spikes = (rng.random((height, width)) > 0.99).astype(np.float32) * 38.0
    a = yy / max(height - 1, 1)
    img = np.stack([r + spikes, g, b + spikes * 0.25, a], axis=-1)
    return img.astype("<f2").view(np.uint16)


def main():
    lib = native.get_openexr_lib()
    if lib is None:
        sys.exit("libOpenEXR shim unavailable; cannot generate")
    outdir = HERE / "exr_official"
    outdir.mkdir(exist_ok=True)
    halves = test_image()
    decoded = {"source": halves}
    for comp, name in enumerate(COMP_NAMES):
        data = native.openexr_write_half(
            halves, comp, 45.0 if comp >= 8 else 0.0)
        (outdir / f"{name}.exr").write_bytes(data)
        decoded[name] = native.openexr_read_half(data)
        lossless = np.array_equal(decoded[name], halves)
        print(f"{name:6s} {len(data):6d} bytes lossless={lossless}")
    np.savez_compressed(outdir / "decoded.npz", **decoded)
    print(f"wrote {outdir}")


if __name__ == "__main__":
    main()
