"""Multi-host (multi-controller) execution over DCN.

The reference is strictly single-process (SURVEY.md §0/§2.9); this module is the
TPU-native scale-out path: the standard JAX multi-controller runtime. Every host
runs the same program; ``jax.distributed`` wires the processes into one runtime,
after which ``jax.devices()`` is *global* and a Mesh spanning hosts works exactly
like a single-host mesh — XLA routes collectives over ICI within a host/slice and
DCN across (SURVEY §2.9 third bullet).

The two things an algorithm needs:

- :func:`initialize_distributed` — one call at program start on every process.
- :func:`make_global_mesh` — a mesh over ALL processes' devices. Shardings built on
  it (e.g. :func:`~cyten_tpu.parallel.shard_tensor`) then span hosts; the global
  truncation decision (:func:`~cyten_tpu.parallel.global_truncate`) all-gathers
  across DCN without code changes.

Host-local data (numpy blocks built redundantly on every process, the normal mode
for replicated MPS/environment metadata) becomes a global array with
:func:`host_local_to_global`.

Tested by ``tests/test_multihost.py``, which spawns two real CPU processes and runs
a sharded DMRG bond-environment contraction across them.
"""

from __future__ import annotations

import numpy as np

__all__ = ['initialize_distributed', 'make_global_mesh', 'host_local_to_global',
           'process_index', 'process_count']


def initialize_distributed(coordinator_address: str = None,
                           num_processes: int = None,
                           process_id: int = None, **kwargs):
    """Join the jax multi-controller runtime (idempotent).

    On TPU pods the arguments are auto-detected from the environment; on
    CPU/manual clusters pass ``coordinator_address='host:port'``,
    ``num_processes`` and ``process_id`` explicitly.
    """
    import jax

    try:  # idempotence check WITHOUT touching the backend (jax.process_count
        # would initialize XLA, after which distributed init is rejected)
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, 'client', None) is not None:
            return
    except ImportError:  # pragma: no cover - private-module layout change
        pass
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id, **kwargs)
    except RuntimeError as e:
        if 'already initialized' not in str(e):
            raise


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def make_global_mesh(axis_name: str = 'mult', n_devices: int = None):
    """A 1D mesh over the GLOBAL device list (all processes).

    After :func:`initialize_distributed`, ``jax.devices()`` enumerates every
    process's devices; a mesh over them spans hosts. Collectives along
    ``axis_name`` then ride ICI within a host and DCN across hosts.
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def host_local_to_global(block, mesh, axis: int = None, axis_name: str = 'mult'):
    """Turn a host-local (replicated-per-process) array into a global jax.Array
    sharded along ``axis`` of the (possibly multi-host) mesh.

    Every process must pass the SAME full array (the usual case here: tensor
    blocks are built deterministically on all hosts). For `axis=None` the result
    is fully replicated.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    block = np.asarray(block)
    spec = [None] * block.ndim
    if axis is not None:
        n = mesh.shape[axis_name]
        if block.shape[axis] % n == 0 and block.shape[axis] >= n:
            spec[axis] = axis_name
    sharding = NamedSharding(mesh, PartitionSpec(*spec))
    return jax.make_array_from_callback(block.shape, sharding,
                                        lambda idx: block[idx])


def shard_tensor_global(tensor, mesh, leg, axis_name: str = 'mult'):
    """Multi-host variant of :func:`~cyten_tpu.parallel.shard_tensor`: every
    process holds the same host-side blocks; the result's blocks are global
    arrays sharded along the given leg's axis across all hosts."""
    from ..backends.data import BlockSparseData, DenseData, DiagonalBlockData

    leg_idx = tensor.get_leg_idx(leg)
    res = tensor.copy(deep=False)
    data = tensor.data
    if isinstance(data, DenseData):
        res.data = DenseData(
            host_local_to_global(data.block, mesh, leg_idx, axis_name),
            data.dtype)
    elif isinstance(data, BlockSparseData):
        blocks = [host_local_to_global(np.asarray(b), mesh, leg_idx, axis_name)
                  for b in data.blocks]
        res.data = BlockSparseData(blocks, data.block_inds, data.dtype,
                                   is_sorted=True)
    elif isinstance(data, DiagonalBlockData):
        blocks = [host_local_to_global(np.asarray(b), mesh, 0, axis_name)
                  for b in data.blocks]
        res.data = DiagonalBlockData(blocks, data.block_inds, data.dtype,
                                     is_sorted=True)
    else:
        raise TypeError(f'cannot shard {type(data).__name__}')
    return res
