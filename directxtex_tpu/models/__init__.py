"""Flagship end-to-end pipelines (the framework's "model zoo").

Each pipeline is a jittable function over device arrays covering one of the
BASELINE.md benchmark configurations; they are what `bench.py` and
`__graft_entry__.py` drive.
"""

from .pipelines import (
    asset_pipeline, bc_encode_pipeline, hdr_cubemap_pipeline,
    mipped_compress_pipeline,
)

__all__ = ["asset_pipeline", "bc_encode_pipeline", "hdr_cubemap_pipeline",
           "mipped_compress_pipeline"]
