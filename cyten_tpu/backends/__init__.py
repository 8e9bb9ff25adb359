"""Symmetry (tensor) backends: block-sparse storage and operations.

Role-equivalent to reference ``cyten/backends/`` (``_backend.py``, ``no_symmetry.py``,
``abelian.py``, ``fusion_tree_backend.py``, ``backend_factory.py``).
"""

from ._backend import TensorBackend, conventional_leg_order, truncation_mask_from_S
from .no_symmetry import NoSymmetryBackend
from .abelian import AbelianBackend
from .fusion_tree import FusionTreeBackend
from .factory import get_backend
from .data import BlockSparseData, DenseData, DiagonalBlockData, MaskBlockData

# reference-parity aliases: the reference names its data classes / modules differently
# (cyten/backends/abelian.py:88 AbelianBackendData; fusion_tree_backend.py:154
# FusionTreeData; backend_factory.py). Both backends here share one block-sparse
# data layout (BlockSparseData), with 2-column block_inds in the fusion-tree case.
AbelianBackendData = BlockSparseData
FusionTreeData = BlockSparseData
from . import factory as backend_factory  # noqa: E402
from . import fusion_tree as fusion_tree_backend  # noqa: E402


def get_same_backend(*tensors, error_msg: str = 'Incompatible backends.'):
    """If all tensors share one backend, return it; raise otherwise.

    Reference: cyten/backends/backend_factory.py (get_same_backend).
    """
    if len(tensors) == 0:
        raise ValueError('Need at least one tensor')
    backend = tensors[0].backend
    if not all(t.backend is backend for t in tensors[1:]):
        raise ValueError(error_msg)
    return backend


__all__ = ['TensorBackend', 'NoSymmetryBackend', 'AbelianBackend', 'FusionTreeBackend',
           'get_backend', 'get_same_backend', 'conventional_leg_order',
           'truncation_mask_from_S', 'BlockSparseData', 'DenseData',
           'DiagonalBlockData', 'MaskBlockData', 'AbelianBackendData',
           'FusionTreeData', 'backend_factory', 'fusion_tree_backend']
