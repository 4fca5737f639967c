"""BC1-BC7 block compression codecs, batched over blocks."""

from . import bc123, bc45, bc67
from .common import blocks_to_image, image_to_blocks, optimize_alpha

__all__ = ["bc123", "bc45", "bc67", "blocks_to_image", "image_to_blocks",
           "optimize_alpha"]
