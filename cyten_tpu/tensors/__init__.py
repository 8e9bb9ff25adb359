"""Tensors: the user-facing symmetric tensor API.

Role-equivalent to reference ``cyten/tensors/`` (_tensors.py, sparse.py,
krylov_based.py, planar.py).
"""

from ._tensors import (
    ChargedTensor, DiagonalTensor, Identity, Mask, SymmetricTensor, Tensor,
)
from ._functions import *  # noqa: F401,F403
from ._functions import __all__ as _functions_all
from . import krylov_based, planar, sparse
from .planar import (
    PlanarDiagram, PlanarLinearOperator, horizontal_factorization,
    planar_combine_legs, planar_contraction, planar_eigh, planar_lq,
    planar_partial_trace, planar_permute_legs, planar_qr, planar_svd,
    planar_truncated_svd,
)
from .sparse import (
    LinearOperator, NumpyArrayLinearOperator, ProjectedLinearOperator,
    ShiftedLinearOperator, SumLinearOperator, TensorLinearOperator, gram_schmidt,
)
from .krylov_based import Arnoldi, LanczosEvolution, LanczosGroundState, lanczos

__all__ = ['Tensor', 'SymmetricTensor', 'DiagonalTensor', 'Identity', 'Mask',
           'ChargedTensor', *_functions_all,
           'PlanarDiagram', 'PlanarLinearOperator', 'planar_contraction',
           'planar_permute_legs', 'planar_combine_legs', 'planar_svd', 'planar_qr',
           'planar_lq', 'planar_eigh', 'planar_truncated_svd',
           'planar_partial_trace', 'horizontal_factorization',
           'LinearOperator', 'TensorLinearOperator', 'SumLinearOperator',
           'ShiftedLinearOperator', 'ProjectedLinearOperator',
           'NumpyArrayLinearOperator', 'gram_schmidt',
           'Arnoldi', 'LanczosGroundState', 'LanczosEvolution', 'lanczos',
           'krylov_based', 'planar', 'sparse']
