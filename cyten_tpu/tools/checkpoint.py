"""Checkpoint / resume for tensor-network states (orbax-backed).

The reference's persistence story is the HDF5 subsystem (SURVEY.md §5); the
TPU-native addition here is async-capable checkpointing of *device* arrays: any
pytree of cyten_tpu tensors (e.g. a SimpleMPS, DMRG environments) can be saved with
orbax while its blocks live in HBM, without a host detour through dense blocks.
"""

from __future__ import annotations

import os

__all__ = ['save_checkpoint', 'load_checkpoint', 'CheckpointManager']


def _split(obj):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(obj)
    return leaves, treedef


def save_checkpoint(path: str, obj, async_save: bool = False):
    """Save a pytree of tensors (device arrays stay on device until serialization).

    The static structure (legs, backends, labels) is pickled via the typed schema;
    the dynamic leaves (blocks) go through orbax's array handler.
    """
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    leaves, treedef = _split(obj)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, 'arrays'), {str(i): leaf
                                              for i, leaf in enumerate(leaves)},
               force=True)
    import pickle

    with open(os.path.join(path, 'structure.pkl'), 'wb') as f:
        pickle.dump(treedef, f)


def load_checkpoint(path: str):
    import jax
    import orbax.checkpoint as ocp
    import pickle

    path = os.path.abspath(path)
    with open(os.path.join(path, 'structure.pkl'), 'rb') as f:
        treedef = pickle.load(f)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.join(path, 'arrays'))
    leaves = [restored[str(i)] for i in range(len(restored))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class CheckpointManager:
    """Rolling checkpoints for iterative algorithms (DMRG sweeps etc.)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)
        self._steps: list[int] = []

    def save(self, step: int, obj):
        path = os.path.join(self.directory, f'step_{step:08d}')
        save_checkpoint(path, obj)
        self._steps.append(step)
        while len(self._steps) > self.max_to_keep:
            old = self._steps.pop(0)
            import shutil

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
        return load_checkpoint(os.path.join(self.directory, f'step_{step:08d}'))
