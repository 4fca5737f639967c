"""Multi-chip scale-out (SURVEY.md §2.6).

The workload is embarrassingly parallel over images/blocks: batches shard
over a 1-D device mesh with `jax.sharding`, XLA inserts no cross-chip
communication for the encode path, and only metric reductions (ComputeMSE
psum) ever touch the ICI. Multi-host input distribution rides DCN via
jax.distributed (not exercised in this container).

For single images too large for one chip, `spatial` shards the row axis
and exchanges filter-tap halo rows between neighbor shards with ppermute
(SURVEY.md §5).
"""

from .sharding import (
    batch_sharding, make_mesh, replicated, shard_batch, sharded_compress_fn,
    sharded_mse,
)
from .spatial import (
    halo_exchange_rows, rows_sharding, sharded_box_mip, sharded_normal_map,
)
from .library import compress_library, compress_library_fn, load_library

__all__ = ["batch_sharding", "make_mesh", "replicated", "shard_batch",
           "sharded_compress_fn", "sharded_mse",
           "halo_exchange_rows", "rows_sharding", "sharded_box_mip",
           "sharded_normal_map",
           "compress_library", "compress_library_fn", "load_library"]
