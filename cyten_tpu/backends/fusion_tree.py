"""Tensor backend for general fusion categories (non-abelian groups, fermions, anyons).

Role-equivalent to reference ``cyten/backends/fusion_tree_backend.py`` (storage layout
:1-78, compose :445, permute engine :2698-3034, tree mappings :3181-3630).

Storage: per coupled sector ``c`` one matrix block ``[codomain tree basis x domain tree
basis]``; ``block_inds[n] = (i, j)`` index the (co)domain sector decompositions.

TPU-first design: all tree manipulation (braids, bends, F/R/B/C symbol evaluation)
happens host-side at trace time and is compiled into static per-sector coefficient
matrices, applied on-device as dense matmuls. See ``trees.py`` for the move algebra.

Implementation lands in stage S4 of the build plan (SURVEY.md §7); this module
currently provides the class skeleton so that backend selection works.
"""

from __future__ import annotations

from ..symmetries import Symmetry
from ._backend import TensorBackend
from .data import BlockSparseData

__all__ = ['FusionTreeBackend']


class _NotImplementedYet:
    def __get__(self, obj, objtype=None):
        raise NotImplementedError(
            'FusionTreeBackend op not implemented yet (build stage S4).')


class FusionTreeBackend(TensorBackend):
    """Backend for arbitrary fusion categories. See module docstring."""

    DataCls = BlockSparseData
    can_decompose_tensors = False

    def supports_symmetry(self, symmetry: Symmetry) -> bool:
        return True

    def __getattr__(self, name):
        # abstract ops not yet implemented -> clear error instead of TypeError at init
        raise NotImplementedError(
            f'FusionTreeBackend.{name} not implemented yet (build stage S4).')


# allow instantiation despite abstract methods: the skeleton defers to __getattr__
FusionTreeBackend.__abstractmethods__ = frozenset()
