"""Tensors: the user-facing symmetric tensor API.

Role-equivalent to reference ``cyten/tensors/`` (_tensors.py, sparse.py,
krylov_based.py, planar.py).
"""

from ._tensors import (
    ChargedTensor, DiagonalTensor, Identity, Mask, SymmetricTensor, Tensor,
)
from ._functions import *  # noqa: F401,F403
from ._functions import __all__ as _functions_all

__all__ = ['Tensor', 'SymmetricTensor', 'DiagonalTensor', 'Identity', 'Mask',
           'ChargedTensor', *_functions_all]
