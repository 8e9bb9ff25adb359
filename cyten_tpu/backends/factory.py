"""Backend selection.

Role-equivalent to reference ``cyten/backends/backend_factory.py`` (:34-80): pick the
minimal tensor backend for a symmetry (no_symmetry ⊂ abelian ⊂ fusion_tree), cache
instances per (tensor backend, block backend).
"""

from __future__ import annotations

from ..blocks import get_block_backend
from ..symmetries import Symmetry
from ._backend import TensorBackend

__all__ = ['get_backend']

_instances: dict[tuple[str, str], TensorBackend] = {}


def get_backend(symmetry: Symmetry = None, block_backend: str = None,
                symmetry_backend: str = None) -> TensorBackend:
    """Get the (cached) tensor backend appropriate for a symmetry.

    Parameters
    ----------
    symmetry
        Select the minimal symmetry backend that supports it. Defaults to no symmetry.
    block_backend : {'jax', 'numpy'}, optional
        The dense-array backend. Defaults to ``config.default_block_backend``.
    symmetry_backend : {'no_symmetry', 'abelian', 'fusion_tree'}, optional
        Override the automatic choice (must still support the symmetry).
    """
    from .no_symmetry import NoSymmetryBackend
    from .abelian import AbelianBackend
    from .fusion_tree import FusionTreeBackend

    if symmetry_backend is None:
        if symmetry is None:
            symmetry_backend = 'no_symmetry'
        elif symmetry.num_factors == 0 or all(
                type(f).__name__ == 'NoSymmetry' for f in symmetry.factors):
            symmetry_backend = 'no_symmetry'
        elif symmetry.is_abelian and symmetry.has_trivial_braid:
            symmetry_backend = 'abelian'
        else:
            symmetry_backend = 'fusion_tree'
    cls = {'no_symmetry': NoSymmetryBackend, 'abelian': AbelianBackend,
           'fusion_tree': FusionTreeBackend}[symmetry_backend]
    bb = get_block_backend(block_backend)
    key = (symmetry_backend, bb.name)
    res = _instances.get(key)
    if res is None:
        res = cls(bb)
        _instances[key] = res
    if symmetry is not None:
        assert res.supports_symmetry(symmetry), \
            f'{symmetry_backend} backend does not support {symmetry}'
    return res
