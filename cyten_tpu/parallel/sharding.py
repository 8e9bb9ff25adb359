"""Sharding utilities for block-sparse tensors.

Strategy (cf. SURVEY.md §2.9 and §7): the natural parallel axes of a block-sparse
tensor are (a) the *sector* axis — different blocks on different devices — and (b) the
*multiplicity* axes of large sectors (chi >= a few k), sharded like ordinary matrix
dimensions.

(b) — :func:`shard_tensor` — places each dense block with a ``NamedSharding`` that
shards the chosen leg's axis when divisible (replicated otherwise, with a warning:
replication is a silent perf cliff). Under ``jit``, XLA propagates these shardings
through the per-block GEMMs and inserts psum/all-gather collectives as needed — no
hand-written communication.

(a) — :func:`shard_tensor_sectors` — places whole blocks round-robin on the mesh
devices (the natural block-sparse tensor parallelism). On list-of-blocks storage
this is an *eager-mode* parallelism: each per-block GEMM dispatches asynchronously
to its block's device, so independent sectors compute concurrently. Under ``jit``
XLA requires all inputs on one logical mesh, so the jitted path instead relies on
(b) / the stacked-storage batch axis (see backends.stacked).
"""

from __future__ import annotations

import logging
import warnings

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ['make_mesh', 'shard_tensor', 'shard_tensor_sectors',
           'replicate_tensor']


def make_mesh(n_devices: int = None, axis_name: str = 'mult'):
    """A 1D device mesh over the first `n_devices` devices."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def _put_block(block, mesh, axis: int | None, axis_name: str,
               warn_replicated: bool = False):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    ndim = getattr(block, 'ndim', 0)
    spec = [None] * ndim
    if axis is not None and ndim > 0:
        n = mesh.shape[axis_name]
        if block.shape[axis] % n == 0 and block.shape[axis] >= n:
            spec[axis] = axis_name
        elif warn_replicated:
            logger.warning(
                'shard_tensor: block axis %d (size %d) not divisible by mesh '
                'size %d -- block is REPLICATED (pad multiplicities, e.g. '
                'pad_chi_multiple, to avoid this perf cliff)',
                axis, block.shape[axis], n)
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
        res.data = DenseData(_put_block(data.block, mesh, leg_idx, axis_name,
                                        warn_replicated=True), data.dtype)
    elif isinstance(data, BlockSparseData):
        blocks = [_put_block(b, mesh, leg_idx, axis_name, warn_replicated=True)
                  for b in data.blocks]
        res.data = BlockSparseData(blocks, data.block_inds, data.dtype,
                                   is_sorted=True)
    elif isinstance(data, DiagonalBlockData):
        blocks = [_put_block(b, mesh, 0, axis_name) for b in data.blocks]
        res.data = DiagonalBlockData(blocks, data.block_inds, data.dtype,
                                     is_sorted=True)
    else:
        raise TypeError(f'cannot shard {type(data).__name__}')
    return res


def shard_tensor_sectors(tensor, mesh=None, devices=None):
    """Sector parallelism: place block ``i`` on device ``i % n`` (round-robin).

    SURVEY §2.9 lever (i): different sectors on different devices — the natural
    "tensor parallelism" of block-sparse tensors. With list-of-blocks storage this
    accelerates *eager* execution: jax dispatches each per-block GEMM to its
    block's device asynchronously, so independent sectors run concurrently. For
    the jitted SPMD path use :func:`shard_tensor` (multiplicity axis) or the
    stacked storage batch axis instead (all inputs must share one logical mesh
    under jit).
    """
    import jax

    from ..backends.data import BlockSparseData, DiagonalBlockData

    if devices is None:
        devices = list(mesh.devices.flat) if mesh is not None else jax.devices()
    n = len(devices)
    res = tensor.copy(deep=False)
    data = tensor.data
    if isinstance(data, (BlockSparseData, DiagonalBlockData)):
        blocks = [jax.device_put(b, devices[i % n])
                  for i, b in enumerate(data.blocks)]
        res.data = type(data)(blocks, data.block_inds, data.dtype, is_sorted=True)
    else:
        raise TypeError(f'sector sharding needs block-sparse data, '
                        f'got {type(data).__name__}')
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
