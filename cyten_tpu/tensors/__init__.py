"""Tensors: the user-facing symmetric tensor API.

Role-equivalent to reference ``cyten/tensors/`` (_tensors.py, sparse.py,
krylov_based.py, planar.py).
"""

from ._tensors import (
    ChargedTensor, DiagonalTensor, Identity, LabelledLegs, Mask, SymmetricTensor,
    Tensor, check_same_legs, get_same_device, is_valid_leg_label,
)
from ._functions import *  # noqa: F401,F403
from ._functions import __all__ as _functions_all
from . import krylov_based, planar, sparse
from .planar import (
    ContractionTree, ContractionTreeNode, PlanarDiagram, PlanarLinearOperator,
    horizontal_factorization, parse_leg_bipartition, planar_almost_equal,
    planar_combine_legs, planar_contraction, planar_decomposition, planar_eigh,
    planar_lq, planar_partial_trace, planar_permute_legs, planar_qr, planar_svd,
    planar_truncated_svd,
)
from .sparse import (
    HermitianNumpyArrayLinearOperator, LinearOperator, LinearOperatorWrapper,
    NumpyArrayLinearOperator, ProjectedLinearOperator, ShiftedLinearOperator,
    SumLinearOperator, TensorLinearOperator, gram_schmidt,
)
from .krylov_based import (
    Arnoldi, KrylovBased, LanczosEvolution, LanczosGroundState, lanczos,
    lanczos_arpack,
)
from .steady import steady_truncated_svd
from .randomized import randomized_truncated_svd
from .adaptive import adaptive_truncated_svd

__all__ = ['LabelledLegs', 'Tensor', 'SymmetricTensor', 'DiagonalTensor', 'Identity',
           'Mask', 'ChargedTensor', 'is_valid_leg_label', 'check_same_legs',
           'get_same_device', *_functions_all,
           'ContractionTree', 'ContractionTreeNode', 'PlanarDiagram',
           'PlanarLinearOperator', 'planar_contraction',
           'planar_permute_legs', 'planar_combine_legs', 'planar_decomposition',
           'planar_svd', 'planar_qr',
           'planar_lq', 'planar_eigh', 'planar_truncated_svd',
           'planar_partial_trace', 'planar_almost_equal', 'parse_leg_bipartition',
           'horizontal_factorization',
           'LinearOperator', 'LinearOperatorWrapper',
           'TensorLinearOperator', 'SumLinearOperator',
           'ShiftedLinearOperator', 'ProjectedLinearOperator',
           'NumpyArrayLinearOperator', 'HermitianNumpyArrayLinearOperator',
           'gram_schmidt',
           'Arnoldi', 'KrylovBased', 'LanczosGroundState', 'LanczosEvolution',
           'lanczos', 'lanczos_arpack',
           'steady_truncated_svd', 'randomized_truncated_svd',
           'adaptive_truncated_svd',
           'krylov_based', 'planar', 'sparse']


def __getattr__(name):
    # back-compat: tensors.compiled moved to cyten_tpu.extras.compiled
    # (CPU/GPU-only by measurement, docs/DESIGN.md §4)
    if name in ('compiled', 'CompiledContractionChain', 'GatherPlan',
                'compile_heff_chain'):
        from .. import extras

        return extras.compiled if name == 'compiled' else getattr(extras, name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
