"""Multi-chip scale-out (SURVEY.md §2.6).

The workload is embarrassingly parallel over images/blocks: batches shard
over a 1-D device mesh with `jax.sharding`, XLA inserts no cross-chip
communication for the encode path, and only metric reductions (ComputeMSE
psum) ever touch the ICI. Multi-host input distribution rides DCN via
jax.distributed (not exercised in this container).
"""

from .sharding import (
    batch_sharding, make_mesh, replicated, shard_batch, sharded_compress_fn,
    sharded_mse,
)

__all__ = ["batch_sharding", "make_mesh", "replicated", "shard_batch",
           "sharded_compress_fn", "sharded_mse"]
