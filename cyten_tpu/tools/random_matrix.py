"""Random matrix ensembles.

Role-equivalent to reference ``cyten/tools/random_matrix.py`` (GOE/GUE/CUE/COE/CRE
:37-207). Used to generate test data with controlled symmetry properties.
"""

from __future__ import annotations

import numpy as np

__all__ = ['box', 'standard_normal_complex', 'GOE', 'GUE', 'CRE', 'COE', 'CUE',
           'O_close_1', 'U_close_1']


def box(size, W: float = 1., rng: np.random.Generator = None) -> np.ndarray:
    """Uniform in [-W, W]."""
    rng = rng or np.random.default_rng()
    return rng.uniform(-W, W, size=size)


def standard_normal_complex(size, rng: np.random.Generator = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    return (rng.standard_normal(size) + 1j * rng.standard_normal(size)) / np.sqrt(2)


def GOE(size, rng: np.random.Generator = None) -> np.ndarray:
    """Gaussian orthogonal ensemble: real symmetric."""
    rng = rng or np.random.default_rng()
    A = rng.standard_normal(size)
    return (A + A.T) * 0.5


def GUE(size, rng: np.random.Generator = None) -> np.ndarray:
    """Gaussian unitary ensemble: complex hermitian."""
    A = standard_normal_complex(size, rng)
    return (A + A.conj().T) * 0.5


def CRE(size, rng: np.random.Generator = None) -> np.ndarray:
    """Circular real ensemble: Haar-random orthogonal matrix."""
    rng = rng or np.random.default_rng()
    A = rng.standard_normal(size)
    Q, R = np.linalg.qr(A)
    return Q * np.sign(np.diag(R))


def CUE(size, rng: np.random.Generator = None) -> np.ndarray:
    """Circular unitary ensemble: Haar-random unitary matrix."""
    A = standard_normal_complex(size, rng)
    Q, R = np.linalg.qr(A)
    return Q * (np.diag(R) / np.abs(np.diag(R)))


def COE(size, rng: np.random.Generator = None) -> np.ndarray:
    """Circular orthogonal ensemble: U^T U for Haar-random U (symmetric unitary)."""
    U = CUE(size, rng)
    return U.T @ U


def O_close_1(size, a: float = 0.01, rng: np.random.Generator = None) -> np.ndarray:
    """Orthogonal matrix close to the identity: expm(a * antisymmetric)."""
    import scipy.linalg

    rng = rng or np.random.default_rng()
    A = rng.standard_normal(size)
    return scipy.linalg.expm(a * (A - A.T) * 0.5)


def U_close_1(size, a: float = 0.01, rng: np.random.Generator = None) -> np.ndarray:
    """Unitary matrix close to the identity: expm(i a * hermitian)."""
    import scipy.linalg

    H = GUE(size, rng)
    return scipy.linalg.expm(1j * a * H)
