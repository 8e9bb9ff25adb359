"""Symmetry (tensor) backends: block-sparse storage and operations.

Role-equivalent to reference ``cyten/backends/`` (``_backend.py``, ``no_symmetry.py``,
``abelian.py``, ``fusion_tree_backend.py``, ``backend_factory.py``).
"""

from ._backend import TensorBackend, conventional_leg_order, truncation_mask_from_S
from .no_symmetry import NoSymmetryBackend
from .abelian import AbelianBackend
from .fusion_tree import FusionTreeBackend
from .factory import get_backend

__all__ = ['TensorBackend', 'NoSymmetryBackend', 'AbelianBackend', 'FusionTreeBackend',
           'get_backend', 'conventional_leg_order', 'truncation_mask_from_S']
