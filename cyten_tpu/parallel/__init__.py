"""Multi-device execution: sharding block-sparse tensors over a jax Mesh.

The reference has no distributed layer (SURVEY.md §2.9); this is the TPU-native
equivalent: sector-axis and multiplicity-axis sharding via ``jax.sharding``, with XLA
inserting the collectives (psum for contracted sharded axes, all-gathers for global
truncation decisions).
"""

from .sharding import (
    make_mesh, replicate_tensor, shard_tensor, shard_tensor_2d,
    shard_tensor_sectors, sharded_fraction,
)
from .truncation import device_truncation_masks, global_truncate
from .multihost import (
    initialize_distributed, make_global_mesh, shard_tensor_global,
)

__all__ = ['make_mesh', 'shard_tensor', 'shard_tensor_2d', 'shard_tensor_sectors',
           'sharded_fraction',
           'replicate_tensor', 'device_truncation_masks', 'global_truncate',
           'initialize_distributed', 'make_global_mesh', 'shard_tensor_global']
