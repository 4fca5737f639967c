"""directxtex_tpu — TPU-native texture processing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
microsoft/DirectXTex: container I/O (DDS/TGA/HDR/PNG/JPEG), pixel-format
conversion across the DXGI format space, resize/mipmaps, premultiplied alpha,
normal maps, analysis ops, and BC1-BC7 block compression as batched TPU
kernels. See SURVEY.md at the repo root for the structural map of the
reference this mirrors.
"""

from .formats import DXGIFormat, FMT
from .texture import TexAlphaMode, TexDimension, TexMetadata, Texture

__version__ = "0.1.0"
