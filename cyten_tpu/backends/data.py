"""Backend data containers, registered as JAX pytrees.

The dense blocks are dynamic pytree leaves; block indices and dtypes are static aux
data. This is the central TPU-first design decision (SURVEY.md §7.1): under ``jit``,
XLA specializes on the static block structure and traces only dense ops.
"""

from __future__ import annotations

import numpy as np

from ..dtypes import Dtype

__all__ = ['DenseData', 'BlockSparseData', 'DiagonalBlockData', 'MaskBlockData',
           'HashableArray']


class HashableArray:
    """Immutable numpy array wrapper with content-based hash/eq (for pytree aux data)."""

    __slots__ = ['arr', '_hash']

    def __init__(self, arr: np.ndarray):
        arr = np.ascontiguousarray(arr)
        arr.setflags(write=False)
        self.arr = arr
        self._hash = hash((arr.shape, arr.tobytes()))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        if not isinstance(other, HashableArray):
            return NotImplemented
        return (self.arr.shape == other.arr.shape
                and np.array_equal(self.arr, other.arr))


class DenseData:
    """Data of a tensor without symmetry: a single dense block in ``legs`` order.

    Also used (with a 1D block) for diagonal tensors and (1D bool) masks.
    """

    __slots__ = ['block', 'dtype']

    def __init__(self, block, dtype: Dtype):
        self.block = block
        self.dtype = dtype

    def tree_flatten(self):
        return (self.block,), (self.dtype,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    def __repr__(self):
        return f'DenseData(shape={getattr(self.block, "shape", "?")}, dtype={self.dtype})'


class BlockSparseData:
    """Data of an abelian-symmetric tensor: blocks + static block indices.

    ``block_inds[n, m]`` indexes ``leg.sector_decomposition`` where ``leg`` is the m-th
    space in conventional leg order (``[*codomain, *reversed(domain)]``); rows are
    ``np.lexsort(block_inds.T)``-sorted. Blocks have axes in ``legs`` order with shape
    given by the per-leg multiplicities. Missing blocks are implicit zeros.
    (Semantics per reference abelian.py:88-149; storage is jax arrays.)
    """

    __slots__ = ['blocks', 'block_inds', 'dtype']

    def __init__(self, blocks: list, block_inds: np.ndarray, dtype: Dtype,
                 is_sorted: bool = False):
        block_inds = np.asarray(block_inds, dtype=np.intp)
        if block_inds.ndim != 2:
            block_inds = block_inds.reshape((len(blocks), -1))
        if not is_sorted and len(blocks) > 1:
            perm = np.lexsort(block_inds.T)
            block_inds = block_inds[perm]
            blocks = [blocks[i] for i in perm]
        self.blocks = list(blocks)
        self.block_inds = block_inds
        self.dtype = dtype

    def tree_flatten(self):
        return tuple(self.blocks), (HashableArray(self.block_inds), self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children), aux[0].arr, aux[1], is_sorted=True)

    def __repr__(self):
        return (f'BlockSparseData(n_blocks={len(self.blocks)}, dtype={self.dtype})')


class DiagonalBlockData:
    """Abelian diagonal-tensor data: 1D blocks per sector of the leg.

    ``block_inds[n]`` indexes ``leg.sector_decomposition``; ascending.
    """

    __slots__ = ['blocks', 'block_inds', 'dtype']

    def __init__(self, blocks: list, block_inds: np.ndarray, dtype: Dtype,
                 is_sorted: bool = False):
        block_inds = np.asarray(block_inds, dtype=np.intp).reshape(-1)
        if not is_sorted and len(blocks) > 1:
            perm = np.argsort(block_inds)
            block_inds = block_inds[perm]
            blocks = [blocks[i] for i in perm]
        self.blocks = list(blocks)
        self.block_inds = block_inds
        self.dtype = dtype

    def tree_flatten(self):
        return tuple(self.blocks), (HashableArray(self.block_inds), self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children), aux[0].arr, aux[1], is_sorted=True)


class MaskBlockData:
    """Abelian mask data: 1D bool blocks.

    ``block_inds[n] = (i_codomain, i_domain)`` indexes the sector decompositions of
    the codomain and domain legs. For a projection that is ``(i_small, i_large)``;
    for an inclusion (created by ``mask_dagger``) the columns are swapped. Block n
    has length ``large_leg.multiplicities[i_large]`` and sum
    ``small_leg.multiplicities[i_small]``. Backend consumers other than
    ``mask_dagger``/``test_mask_sanity`` require projections (``_mask_as_projection``
    converts inclusions first).
    """

    __slots__ = ['blocks', 'block_inds', 'dtype']

    def __init__(self, blocks: list, block_inds: np.ndarray,
                 is_sorted: bool = False):
        block_inds = np.asarray(block_inds, dtype=np.intp).reshape((len(blocks), 2))
        if not is_sorted and len(blocks) > 1:
            perm = np.lexsort(block_inds.T)
            block_inds = block_inds[perm]
            blocks = [blocks[i] for i in perm]
        self.blocks = list(blocks)
        self.block_inds = block_inds
        self.dtype = Dtype.bool

    def tree_flatten(self):
        return tuple(self.blocks), (HashableArray(self.block_inds),)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children), aux[0].arr, is_sorted=True)


def _register_pytrees():
    try:
        from jax.tree_util import register_pytree_node
    except ImportError:  # pragma: no cover
        return
    for cls in (DenseData, BlockSparseData, DiagonalBlockData, MaskBlockData):
        register_pytree_node(
            cls,
            lambda obj: obj.tree_flatten(),
            cls.tree_unflatten,
        )


_register_pytrees()
