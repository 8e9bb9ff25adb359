"""Checkpoint / resume for tensor-network states (orbax-backed).

The reference's persistence story is the HDF5 subsystem (SURVEY.md §5); the
TPU-native addition here is async-capable checkpointing of *device* arrays: any
pytree of cyten_tpu tensors (e.g. a SimpleMPS, DMRG environments) can be saved with
orbax while its blocks live in HBM, without a host detour through dense blocks.

Layout of a checkpoint directory:

- ``structure.h5`` — the typed-schema tree of the object (tools.hdf5_io), with every
  dense block replaced by an ``ArrayRef`` placeholder. No pickle anywhere: loading
  dispatches through the explicit type registry only (the reference warns its own
  HDF5 loading is pickle-grade unsafe, cyten/tools/hdf5_io.py:23-26 — this isn't).
- ``arrays/`` — the dense blocks, saved by orbax (async-capable, device-resident).
"""

from __future__ import annotations

import os

__all__ = ['save_checkpoint', 'load_checkpoint', 'wait_for_saves',
           'CheckpointManager']


_PENDING: list = []  # in-flight orbax AsyncCheckpointers


def save_checkpoint(path: str, obj, async_save: bool = False):
    """Save an object tree (tensors / MPS / dicts / lists) to ``path``.

    The static structure (legs, backends, labels) goes to ``structure.h5`` via the
    typed schema; the dynamic leaves (dense blocks) go through orbax's array
    handler. With ``async_save=True`` the block serialization happens in the
    background (device arrays are snapshotted immediately; the write returns before
    the files are complete) — call :func:`wait_for_saves` before relying on the
    files, e.g. before process exit.
    """
    import orbax.checkpoint as ocp

    from . import hdf5_io

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    blocks = []

    def hook(block):
        blocks.append(block)
        return {'__type__': 'ArrayRef', 'index': len(blocks) - 1}

    old = hdf5_io._BLOCK_LEAF_HOOK
    hdf5_io._BLOCK_LEAF_HOOK = hook
    try:
        tree = hdf5_io.to_tree(obj)
    finally:
        hdf5_io._BLOCK_LEAF_HOOK = old
    hdf5_io.save_tree_hdf5(tree, os.path.join(path, 'structure.h5'))
    arrays = {str(i): b for i, b in enumerate(blocks)}
    arrays_path = os.path.join(path, 'arrays')
    if async_save:
        ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        ckptr.save(arrays_path, arrays, force=True)
        _PENDING.append(ckptr)
    else:
        ocp.PyTreeCheckpointer().save(arrays_path, arrays, force=True)


def wait_for_saves():
    """Block until all in-flight ``async_save`` checkpoints are fully written."""
    while _PENDING:
        ckptr = _PENDING.pop()
        ckptr.wait_until_finished()


def load_checkpoint(path: str):
    """Inverse of :func:`save_checkpoint` (blocks restored host-side, then moved
    to each tensor's block backend)."""
    import orbax.checkpoint as ocp

    from . import hdf5_io

    path = os.path.abspath(path)
    tree = hdf5_io.load_tree_hdf5(os.path.join(path, 'structure.h5'))
    restored = ocp.PyTreeCheckpointer().restore(os.path.join(path, 'arrays'))

    old = hdf5_io._BLOCK_RESOLVE_HOOK
    hdf5_io._BLOCK_RESOLVE_HOOK = lambda i: restored[str(i)]
    try:
        return hdf5_io.from_tree(tree)
    finally:
        hdf5_io._BLOCK_RESOLVE_HOOK = old


class CheckpointManager:
    """Rolling checkpoints for iterative algorithms (DMRG sweeps etc.)."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = False):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self._steps: list[int] = []

    def save(self, step: int, obj):
        path = os.path.join(self.directory, f'step_{step:08d}')
        save_checkpoint(path, obj, async_save=self.async_save)
        self._steps.append(step)
        while len(self._steps) > self.max_to_keep:
            old = self._steps.pop(0)
            import shutil

            if self.async_save:
                wait_for_saves()  # never delete a directory mid-write
            shutil.rmtree(os.path.join(self.directory, f'step_{old:08d}'),
                          ignore_errors=True)
        return path

    def latest_step(self) -> int | None:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith('step_'):
                steps.append(int(name[5:]))
        return max(steps) if steps else None

    def restore(self, step: int = None):
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError('no checkpoints found')
        if self.async_save:
            wait_for_saves()
        return load_checkpoint(os.path.join(self.directory, f'step_{step:08d}'))
