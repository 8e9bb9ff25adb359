"""Sharding utilities for block-sparse tensors.

Strategy (cf. SURVEY.md §2.9 and §7): the natural parallel axes of a block-sparse
tensor are (a) the *sector* axis — different blocks on different devices — and (b) the
*multiplicity* axes of large sectors (chi >= a few k), sharded like ordinary matrix
dimensions. We implement (b) here: each dense block is placed with a
``NamedSharding`` that shards the chosen leg's axis when divisible (replicated
otherwise). Under ``jit``, XLA propagates these shardings through the per-block GEMMs
and inserts psum/all-gather collectives as needed — no hand-written communication.
"""

from __future__ import annotations

import numpy as np

__all__ = ['make_mesh', 'shard_tensor', 'replicate_tensor']


def make_mesh(n_devices: int = None, axis_name: str = 'mult'):
    """A 1D device mesh over the first `n_devices` devices."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def _put_block(block, mesh, axis: int | None, axis_name: str):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    ndim = getattr(block, 'ndim', 0)
    spec = [None] * ndim
    if axis is not None and ndim > 0:
        n = mesh.shape[axis_name]
        if block.shape[axis] % n == 0 and block.shape[axis] >= n:
            spec[axis] = axis_name
    return jax.device_put(block, NamedSharding(mesh, PartitionSpec(*spec)))


def shard_tensor(tensor, mesh, leg, axis_name: str = 'mult'):
    """Shard each block of `tensor` along the axis of the given leg (by index/label).

    Blocks whose axis is not divisible by the mesh size are replicated.
    Returns a new tensor of the same type (structure unchanged).
    """
    from ..backends.data import BlockSparseData, DenseData, DiagonalBlockData

    leg_idx = tensor.get_leg_idx(leg)
    res = tensor.copy(deep=False)
    data = tensor.data
    if isinstance(data, DenseData):
        res.data = DenseData(_put_block(data.block, mesh, leg_idx, axis_name),
                             data.dtype)
    elif isinstance(data, BlockSparseData):
        blocks = [_put_block(b, mesh, leg_idx, axis_name) for b in data.blocks]
        res.data = BlockSparseData(blocks, data.block_inds, data.dtype,
                                   is_sorted=True)
    elif isinstance(data, DiagonalBlockData):
        blocks = [_put_block(b, mesh, 0, axis_name) for b in data.blocks]
        res.data = DiagonalBlockData(blocks, data.block_inds, data.dtype,
                                     is_sorted=True)
    else:
        raise TypeError(f'cannot shard {type(data).__name__}')
    return res


def replicate_tensor(tensor, mesh):
    """Place every block fully replicated over the mesh."""
    from ..backends.data import BlockSparseData, DenseData, DiagonalBlockData

    res = tensor.copy(deep=False)
    data = tensor.data
    if isinstance(data, DenseData):
        res.data = DenseData(_put_block(data.block, mesh, None, ''), data.dtype)
    elif isinstance(data, BlockSparseData):
        blocks = [_put_block(b, mesh, None, '') for b in data.blocks]
        res.data = BlockSparseData(blocks, data.block_inds, data.dtype,
                                   is_sorted=True)
    elif isinstance(data, DiagonalBlockData):
        blocks = [_put_block(b, mesh, None, '') for b in data.blocks]
        res.data = DiagonalBlockData(blocks, data.block_inds, data.dtype,
                                     is_sorted=True)
    return res
