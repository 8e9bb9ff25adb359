"""Native SU(N) topological data (no HDF5 files): CG, F, R, Z, pentagon/hexagon.

The reference requires precomputed data files for all of these
(cyten/symmetries/_symmetries.py:1598-1622); here they are computed on demand
by cyten_tpu/symmetries/sun_cg.py and validated axiomatically.
"""

import numpy as np
import pytest

import cyten_tpu.symmetries as sym
from cyten_tpu.symmetries.sun_cg import (
    clebsch_gordan, gt_patterns, gt_weight, irrep_dim, lowering_matrix,
    raising_matrix,
)

from test_symmetries import (
    test_f_symbols_unitary, test_hexagon_equation, test_pentagon_equation,
)


def _su3_factor():
    return sym.SUN(3).as_Symmetry()


def test_gt_basics():
    assert irrep_dim((1, 0, 0)) == 3
    assert irrep_dim((1, 1, 0)) == 3
    assert irrep_dim((2, 1, 0)) == 8
    assert irrep_dim((3, 0, 0)) == 10
    assert irrep_dim((2, 2, 0)) == 6
    assert irrep_dim((2, 1, 1, 0)) == 15  # SU(4) adjoint
    assert irrep_dim((2, 2, 0, 0)) == 20
    # commutation [E_l, F_l] = H_l with GT weights
    for lam in [(2, 1, 0), (3, 1, 0), (1, 1, 0, 0)]:
        N = len(lam)
        ws = np.array([gt_weight(p) for p in gt_patterns(lam)])
        for l in range(1, N):
            E, F = raising_matrix(lam, l), lowering_matrix(lam, l)
            H = E @ F - F @ E
            np.testing.assert_allclose(H, np.diag(ws[:, l - 1] - ws[:, l]),
                                       atol=1e-12)


def test_cg_equivariance():
    """CG tensors intertwine the lowering operators:
    (L_a x 1 + 1 x L_b) X == X L_c (the defining property)."""
    cases = [((1, 0, 0), (1, 0, 0), (1, 1, 0), 1),
             ((1, 0, 0), (1, 1, 0), (2, 1, 0), 1),
             ((2, 1, 0), (2, 1, 0), (2, 1, 0), 2),
             ((2, 1, 0), (1, 0, 0), (2, 2, 0), 1)]
    for la, lb, lc, mult in cases:
        N = len(la)
        boxes = sum(la) + sum(lb) - sum(lc)
        lc_lift = tuple(x + boxes // N for x in lc)
        X = clebsch_gordan(la, lb, lc, mult)
        for l in range(1, N):
            La = lowering_matrix(la, l)
            Lb = lowering_matrix(lb, l)
            Lc = lowering_matrix(lc_lift, l)
            lhs = np.einsum('ca,uabm->ucbm', La, X) \
                + np.einsum('db,uabm->uadm', Lb, X)
            rhs = np.einsum('uabn,nm->uabm', X, Lc)
            np.testing.assert_allclose(lhs, rhs, atol=1e-10,
                                       err_msg=f'{la}x{lb}->{lc} l={l}')


def test_su3_axioms(np_random):
    s = _su3_factor()
    test_f_symbols_unitary(s, np_random)
    test_pentagon_equation(s, np_random)
    test_hexagon_equation(s, np_random)


def test_su3_r_symbols():
    """Symmetric gauge: R diagonal +-1; 3 x 3 antisymmetric channel is -1."""
    s = _su3_factor()
    three = np.array([1, 0, 0])
    bar3 = np.array([1, 1, 0])
    six = np.array([2, 0, 0])
    r_sym = s.r_symbol(three, three, six)
    r_anti = s.r_symbol(three, three, bar3)
    assert np.allclose(r_sym, [1.0])
    assert np.allclose(r_anti, [-1.0])
    # mixed sectors: identity in this gauge
    eight = np.array([2, 1, 0])
    assert np.allclose(s.r_symbol(three, bar3, eight), [1.0])


def test_su3_frobenius_schur_and_Z():
    s = _su3_factor()
    eight = np.array([2, 1, 0])   # adjoint: real => FS = +1
    assert s.frobenius_schur(eight) == 1
    Z = s.Z_iso(eight)
    # Z is an isometry (sqrt(d) * CG to the trivial sector, orthonormal rows)
    np.testing.assert_allclose(Z @ Z.T, np.eye(8), atol=1e-10)


def test_su4_cg_smoke():
    """SU(4): fundamental x antifundamental = 1 + 15."""
    s = sym.SUN(4).as_Symmetry()
    f = np.array([1, 0, 0, 0])
    fbar = np.array([1, 1, 1, 0])
    X1 = s.fusion_tensor(f, fbar, np.array([0, 0, 0, 0]))
    X15 = s.fusion_tensor(f, fbar, np.array([2, 1, 1, 0]))
    assert X1.shape == (1, 4, 4, 1)
    assert X15.shape == (1, 4, 4, 15)
