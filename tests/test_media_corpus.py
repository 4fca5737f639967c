"""Optional media-corpus tests (SURVEY.md §4d).

The reference test suite loads real-world assets from an external
directory given by DIRECTXTEX_MEDIA_PATH (directxtextest, test.yml:39-40).
Mirror that: when the env var points at a directory, every supported
container file in it must load, decompress (if BC), and — for DDS —
round-trip through save/load with identical metadata. Skipped entirely
when the variable is unset, so CI without assets stays green.
"""

import os

import numpy as np
import pytest

MEDIA = os.environ.get("DIRECTXTEX_MEDIA_PATH")

pytestmark = pytest.mark.skipif(
    not (MEDIA and os.path.isdir(MEDIA)),
    reason="DIRECTXTEX_MEDIA_PATH not set")

_EXTS = (".dds", ".tga", ".hdr", ".png", ".jpg", ".jpeg", ".bmp", ".ppm",
         ".pfm", ".phm", ".exr", ".tiff", ".gif")


def _corpus():
    out = []
    for root, _, files in os.walk(MEDIA or "."):
        for f in files:
            if f.lower().endswith(_EXTS):
                out.append(os.path.join(root, f))
    return sorted(out)


@pytest.mark.parametrize("path", _corpus() or ["<none>"])
def test_media_file_loads(path, tmp_path):
    if path == "<none>":
        pytest.skip("corpus empty")
    from directxtex_tpu.io import load_texture, save_texture
    from directxtex_tpu.ops import decompress
    from directxtex_tpu.texture import CompressedTexture

    tex = load_texture(path)
    meta = tex.metadata
    assert meta.width > 0 and meta.height > 0

    if isinstance(tex, CompressedTexture):
        plain = decompress(tex)
        assert np.isfinite(plain.to_numpy()).all()

    if path.lower().endswith(".dds"):
        out = str(tmp_path / "rt.dds")
        save_texture(tex, out)
        back = load_texture(out)
        m2 = back.metadata
        assert (m2.width, m2.height, m2.array_size) == \
            (meta.width, meta.height, meta.array_size)
        assert m2.format == meta.format
