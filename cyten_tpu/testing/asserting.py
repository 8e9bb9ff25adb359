"""Assertion helpers for tests.

Role-equivalent to reference ``cyten/testing/asserting.py`` (:7-11, default
tolerances rtol=atol=1e-12).
"""

from __future__ import annotations

import numpy as np

__all__ = ['assert_tensors_almost_equal']


def assert_tensors_almost_equal(a, b, rtol: float = 1e-12, atol: float = 1e-12,
                                compare_dense: bool = True):
    """Assert two tensors are equal: structurally, and numerically via norm
    (and via the dense representation when the symmetry allows it)."""
    from ..tensors import norm

    assert a.codomain == b.codomain, f'{a.codomain} != {b.codomain}'
    assert a.domain == b.domain
    diff = norm(a - b)
    scale = max(norm(a), norm(b), 1e-30)
    assert diff <= atol + rtol * scale, f'norm difference {diff}'
    if compare_dense and a.symmetry.can_be_dropped:
        np.testing.assert_allclose(a.to_numpy(), b.to_numpy(), rtol=rtol,
                                   atol=atol)
