"""Per-class behavioral pinning of every concrete symmetry.

Mirrors the reference's one-test-per-class structure
(reference tests/python_tests/test_symmetries.py:696-1429) with literature
literals: fusion tables, duals, quantum dimensions, Frobenius-Schur indicators,
topological twists, and S-matrices are written as NUMERIC LITERALS, so this
battery pins conventions independently of the axiom tests in
test_symmetries.py (pentagon/hexagon hold for either chirality; these don't).
"""

import cmath
import math

import numpy as np
import pytest

from cyten_tpu import symmetries as S
from cyten_tpu.symmetries import SymmetryError

PHI = 0.5 * (1 + math.sqrt(5))


def sec(*a):
    return np.array(a, dtype=int)


def fuse_set(sym, a, b):
    return {tuple(int(x) for x in row) for row in sym.fusion_outcomes(a, b)}


# --- groups ---------------------------------------------------------------------------


def test_no_symmetry_class():
    s = S.NoSymmetry()
    assert s.num_sectors == 1
    assert s.is_abelian and s.can_be_dropped
    assert fuse_set(s, sec(0), sec(0)) == {(0,)}
    assert float(s.qdim(sec(0))) == 1.
    assert np.array_equal(s.dual_sector(sec(0)), sec(0))


def test_u1_class():
    s = S.U1()
    assert s.num_sectors == np.inf
    assert s.is_abelian and s.can_be_dropped and s.has_trivial_braid
    assert fuse_set(s, sec(2), sec(-5)) == {(-3,)}
    assert np.array_equal(s.dual_sector(sec(7)), sec(-7))
    assert float(s.qdim(sec(3))) == 1.
    assert s.is_valid_sector(sec(-123))
    assert not s.is_valid_sector(np.array([1, 2]))  # wrong shape


@pytest.mark.parametrize('N', [2, 3, 4, 7])
def test_zn_class(N):
    s = S.ZN(N)
    assert s.num_sectors == N
    assert s.is_abelian and s.can_be_dropped
    assert fuse_set(s, sec(N - 1), sec(1)) == {(0,)}
    assert fuse_set(s, sec(1), sec(1)) == {(2 % N,)}
    assert np.array_equal(s.dual_sector(sec(1)), sec((N - 1) % N))
    assert len(s.all_sectors()) == N
    assert not s.is_valid_sector(sec(N))


def test_su2_class():
    s = S.SU2()
    # sectors are 2j
    half, one = sec(1), sec(2)
    assert fuse_set(s, half, half) == {(0,), (2,)}
    assert fuse_set(s, one, half) == {(1,), (3,)}
    assert fuse_set(s, one, one) == {(0,), (2,), (4,)}
    # qdim = 2j + 1; self-dual; FS = (-1)^{2j}; twists trivial (group reps)
    for a, d in [(0, 1), (1, 2), (2, 3), (3, 4)]:
        assert float(s.qdim(sec(a))) == d
        assert np.array_equal(s.dual_sector(sec(a)), sec(a))
        assert int(s.frobenius_schur(sec(a))) == (-1) ** a
        assert abs(complex(s.topological_twist(sec(a))) - 1.) < 1e-14
    assert not s.is_abelian
    assert s.can_be_dropped and s.has_symmetric_braid


# --- fermions -------------------------------------------------------------------------


def test_fermion_parity_class():
    s = S.FermionParity()
    assert s.num_sectors == 2
    assert fuse_set(s, sec(1), sec(1)) == {(0,)}
    # fermionic exchange: R^{11}_0 = -1; twists theta = (-1)^parity
    assert complex(s.r_symbol(sec(1), sec(1), sec(0))[0]) == -1.
    assert abs(complex(s.topological_twist(sec(0))) - 1.) < 1e-14
    assert abs(complex(s.topological_twist(sec(1))) + 1.) < 1e-14
    assert s.has_symmetric_braid and not s.has_trivial_braid


def test_fermion_number_class():
    s = S.FermionNumber()
    assert s.num_sectors == np.inf
    assert fuse_set(s, sec(2), sec(3)) == {(5,)}
    assert np.array_equal(s.dual_sector(sec(3)), sec(-3))
    # R^{mn} = (-1)^{mn}
    for m, n in [(1, 1), (1, 2), (2, 3), (3, 3)]:
        r = complex(s.r_symbol(sec(m), sec(n), sec(m + n))[0])
        assert abs(r - (-1.) ** (m * n)) < 1e-14
    # twist theta_n = (-1)^{n^2} = (-1)^n
    for n in range(-2, 3):
        assert abs(complex(s.topological_twist(sec(n))) - (-1.) ** n) < 1e-14


# --- anyons ---------------------------------------------------------------------------


def test_fibonacci_class():
    s = S.FibonacciAnyonCategory()
    vac, tau = sec(0), sec(1)
    assert fuse_set(s, tau, tau) == {(0,), (1,)}
    assert abs(float(s.qdim(tau)) - PHI) < 1e-14
    # twist theta_tau = e^{4 pi i/5}; total quantum dim D = sqrt(2 + phi)
    assert abs(complex(s.topological_twist(tau))
               - cmath.exp(4j * cmath.pi / 5)) < 1e-14
    D = math.sqrt(2 + PHI)
    expect_S = np.array([[1, PHI], [PHI, -1]]) / D
    np.testing.assert_allclose(np.asarray(s.s_matrix()), expect_S, atol=1e-13)
    assert not s.can_be_dropped


def test_ising_class():
    s = S.IsingAnyonCategory()  # nu = 1
    vac, sig, psi = sec(0), sec(1), sec(2)
    assert fuse_set(s, sig, sig) == {(0,), (2,)}
    assert fuse_set(s, sig, psi) == {(1,)}
    assert fuse_set(s, psi, psi) == {(0,)}
    assert abs(float(s.qdim(sig)) - math.sqrt(2)) < 1e-14
    assert float(s.qdim(psi)) == 1.
    # twists (1, e^{i pi/8}, -1); S = (1/2) [[1, r2, 1], [r2, 0, -r2], [1, -r2, 1]]
    assert abs(complex(s.topological_twist(sig))
               - cmath.exp(1j * cmath.pi / 8)) < 1e-14
    assert abs(complex(s.topological_twist(psi)) + 1.) < 1e-14
    r2 = math.sqrt(2)
    expect_S = 0.5 * np.array([[1, r2, 1], [r2, 0, -r2], [1, -r2, 1]])
    np.testing.assert_allclose(np.asarray(s.s_matrix()), expect_S, atol=1e-13)


def test_zn_anyon_classes():
    # ZNAnyonCategory(N, n): theta_a = exp(2 pi i n a^2 / N)
    s = S.ZNAnyonCategory(4, 1)
    for a in range(4):
        expect = cmath.exp(2j * cmath.pi * a * a / 4)
        assert abs(complex(s.topological_twist(sec(a))) - expect) < 1e-13, a
    assert fuse_set(s, sec(3), sec(2)) == {(1,)}
    # ZNAnyonCategory2(N even, n) = Z_N^{(n+1/2)}: theta_a = exp(2 pi i (n+1/2) a^2 / N)
    s2 = S.ZNAnyonCategory2(4, 1)
    for a in range(4):
        expect = cmath.exp(2j * cmath.pi * 1.5 * a * a / 4)
        assert abs(complex(s2.topological_twist(sec(a))) - expect) < 1e-13, a


def test_quantum_double_zn_class():
    # D(Z_N): sectors (a, b), theta_{(a,b)} = exp(2 pi i a b / N)
    s = S.QuantumDoubleZNAnyonCategory(3)
    assert s.num_sectors == 9
    for a in range(3):
        for b in range(3):
            expect = cmath.exp(2j * cmath.pi * a * b / 3)
            assert abs(complex(s.topological_twist(sec(a, b))) - expect) < 1e-13
    assert fuse_set(s, sec(1, 2), sec(2, 2)) == {(0, 1)}


def test_toric_code_class():
    s = S.ToricCodeCategory()
    one, e, m, f = sec(0, 0), sec(1, 0), sec(0, 1), sec(1, 1)
    # e and m are bosons, f = em is a fermion; e x m = f; e^2 = m^2 = 1
    assert abs(complex(s.topological_twist(e)) - 1.) < 1e-14
    assert abs(complex(s.topological_twist(m)) - 1.) < 1e-14
    assert abs(complex(s.topological_twist(f)) + 1.) < 1e-13
    assert fuse_set(s, e, m) == {(1, 1)}
    assert fuse_set(s, e, e) == {(0, 0)}
    assert fuse_set(s, f, f) == {(0, 0)}
    # mutual statistics: full braid of e around m = -1 (the toric-code hallmark)
    r_em = complex(s.r_symbol(e, m, f)[0])
    r_me = complex(s.r_symbol(m, e, f)[0])
    assert abs(r_em * r_me + 1.) < 1e-14


def test_su2_k_class():
    k = 4
    s = S.SU2_kAnyonCategory(k)
    assert s.num_sectors == k + 1
    # qdim_j = sin((2j+1) pi/(k+2)) / sin(pi/(k+2)); sectors labeled by 2j
    for a in range(k + 1):
        expect = math.sin((a + 1) * math.pi / (k + 2)) / math.sin(math.pi / (k + 2))
        assert abs(float(s.qdim(sec(a))) - expect) < 1e-13
    # twist theta_j = exp(2 pi i j(j+1)/(k+2)), sector label a = 2j
    for a in range(k + 1):
        jj = a / 2
        expect = cmath.exp(2j * cmath.pi * jj * (jj + 1) / (k + 2))
        assert abs(complex(s.topological_twist(sec(a))) - expect) < 1e-13, a
    # truncated fusion: outcomes capped at 2j <= k
    assert fuse_set(s, sec(2), sec(2)) == {(0,), (2,), (4,)}
    assert fuse_set(s, sec(3), sec(3)) == {(0,), (2,)}  # j1+j2+j <= k cuts j >= 2
    assert fuse_set(s, sec(4), sec(4)) == {(0,)}


def test_su3_3_class():
    s = S.SU3_3AnyonCategory()
    assert s.num_sectors == 4
    qdims = [float(s.qdim(a)) for a in s.all_sectors()]
    assert qdims == [1., 3., 1., 1.]


# --- product symmetries & error paths ---------------------------------------------------


def test_product_fusion_and_duals():
    s = S.U1() * S.ZN(3)
    a, b = sec(2, 1), sec(-1, 2)
    assert fuse_set(s, a, b) == {(1, 0)}
    assert np.array_equal(s.dual_sector(a), sec(-2, 2))
    fib_u1 = S.FibonacciAnyonCategory() * S.U1()
    t = sec(1, 0)
    assert fuse_set(fib_u1, t, t) == {(0, 0), (1, 0)}
    assert abs(float(fib_u1.qdim(t)) - PHI) < 1e-14


def test_invalid_fusion_inputs_raise():
    from cyten_tpu.config import config

    fib = S.fibonacci_anyon_category
    vac, tau = sec(0), sec(1)
    old = config.do_fusion_input_checks
    config.do_fusion_input_checks = True
    try:
        with pytest.raises(SymmetryError):
            fib.r_symbol(vac, vac, tau)  # 1 x 1 cannot fuse to tau
        with pytest.raises(SymmetryError):
            fib.f_symbol(vac, vac, vac, vac, tau, vac)  # 1 x 1 cannot fuse to tau
    finally:
        config.do_fusion_input_checks = old


def test_n_symbol_zero_for_invalid():
    fib = S.fibonacci_anyon_category
    assert fib.n_symbol(sec(0), sec(0), sec(1)) == 0
    su2 = S.SU2()
    assert su2.n_symbol(sec(1), sec(1), sec(1)) == 0  # half + half != half


@pytest.mark.parametrize('nu', [1, 3, 5, 7, 9, 11, 13, 15])
def test_ising_sixteenfold_way(nu):
    """Kitaev's 16-fold way: twist(sigma) = exp(i pi nu / 8)
    (reference test_symmetries.py:1200 parametrizes nu)."""
    c = S.IsingAnyonCategory(nu=nu)
    s = c.as_Symmetry()
    sigma = np.array([1])
    np.testing.assert_allclose(s.topological_twist(sigma),
                               np.exp(1j * np.pi * nu / 8), atol=1e-12)
    # nu and -nu are mirror images: conjugate twists
    m = S.IsingAnyonCategory(nu=16 - nu).as_Symmetry()
    np.testing.assert_allclose(m.topological_twist(sigma),
                               np.conj(s.topological_twist(sigma)), atol=1e-12)
    # quantum dimension of sigma is sqrt(2) in every grading
    np.testing.assert_allclose(s.qdim(sigma), np.sqrt(2), atol=1e-12)


def test_fibonacci_handedness_mirror():
    """Left/right Fibonacci are mirror images: conjugated R symbols
    (reference test_symmetries.py:1157 parametrizes handedness)."""
    left = S.FibonacciAnyonCategory(handedness='left').as_Symmetry()
    right = S.FibonacciAnyonCategory(handedness='right').as_Symmetry()
    tau = np.array([1])
    for c in ([0], [1]):
        r_l = left.r_symbol(tau, tau, np.array(c))
        r_r = right.r_symbol(tau, tau, np.array(c))
        np.testing.assert_allclose(r_r, np.conj(r_l), atol=1e-12)
    # F symbols are real and shared
    np.testing.assert_allclose(
        left.f_symbol(tau, tau, tau, tau, tau, tau),
        right.f_symbol(tau, tau, tau, tau, tau, tau), atol=1e-12)


def test_su2_k_handedness_mirror():
    left = S.SU2_kAnyonCategory(3, handedness='left').as_Symmetry()
    right = S.SU2_kAnyonCategory(3, handedness='right').as_Symmetry()
    half = np.array([1])
    for c in ([0], [2]):
        np.testing.assert_allclose(right.r_symbol(half, half, np.array(c)),
                                   np.conj(left.r_symbol(half, half, np.array(c))),
                                   atol=1e-12)
