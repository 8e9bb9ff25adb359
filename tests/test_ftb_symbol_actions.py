"""Literal-pinned braid actions on fusion-tree tensors.

The reference pins its permute engine with hand-computed C/B-symbol actions per
theory (reference tests/python_tests/backends/test_fusion_tree_backend.py:33-1230).
Here the same is done with literature anchors: the expected transformation
matrices are written as NUMERIC LITERALS taken from the standard Fibonacci /
Ising / SU(2) topological data (not queried from the library), so a regression
in either the symbol data or the permute engine fails these tests.

Conventions pinned (matching the library's 'left'-handed Fibonacci and nu=1
Ising, and levels semantics 'higher level = over'):

- Fibonacci: R^{tt}_1 = exp(-4 pi i/5), R^{tt}_t = exp(3 pi i/5),
  F^{ttt}_t = [[1/phi, 1/sqrt(phi)], [1/sqrt(phi), -1/phi]]   (phi golden ratio)
- Ising(nu=1): R^{ss}_1 = exp(-i pi/8), R^{ss}_psi = exp(3 i pi/8),
  R^{psi s}_s = -i, F^{sss}_s = [[1,1],[1,-1]]/sqrt(2)
- SU(2): R^{(1/2)(1/2)}_0 = -1, R^{(1/2)(1/2)}_1 = +1

The braid matrix acting on the 3-strand inner-sector basis (braiding strands
2 and 3 of ((a b)_e c)_d with strand 2 over strand 3) is

    M_d[f, e] = R^{f c}_d * [F^{a b c}_d]_{f e} * conj(R^{b c}_e)

For all-tau Fibonacci at d = tau this gives the standard sigma_2 representation
[[exp(4 pi i/5)/phi, exp(-3 pi i/5)/sqrt(phi)],
 [exp(-3 pi i/5)/sqrt(phi), -1/phi]]
(e.g. Kauffman & Lomonaco, 'Braiding operators are universal quantum gates').
"""

import cmath
import math

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import ElementarySpace, SymmetricTensor
from cyten_tpu import symmetries as sym

PHI = 0.5 * (1 + math.sqrt(5))


def _amp_map(T, inner_indexed: bool):
    """Tree-pair amplitudes as {(coupled, inner or None): scalar}."""
    out = {}
    for (X, Y), arr in T.tree_pairs():
        key_inner = int(X.inner_sectors[0][0]) if inner_indexed else None
        key = (int(X.coupled[0]), key_inner)
        val = complex(np.asarray(arr).reshape(-1)[0])
        assert key not in out
        out[key] = val
    return out


def _swap_first_two(T, over: bool):
    """Swap the first two codomain legs; ``over``: leg 0 goes over leg 1."""
    n = T.num_legs
    levels = [1, 0] + list(range(2, n)) if over else list(range(n))
    cod = [1, 0] + list(range(2, T.num_codomain_legs))
    dom = list(range(T.num_codomain_legs, n))[::-1]
    return ct.permute_legs(T, codomain=cod, domain=dom, levels=levels)


def _swap_second_third(T, over: bool):
    """Swap codomain legs 1 and 2; ``over``: leg 1 goes over leg 2."""
    n = T.num_legs
    levels = [0, 2, 1] + list(range(3, n)) if over \
        else [0, 1, 2] + list(range(3, n))
    dom = list(range(T.num_codomain_legs, n))[::-1]
    return ct.permute_legs(T, codomain=[0, 2, 1], domain=dom, levels=levels)


# --------------------------------------------------------------------------------------
# R-move (adjacent swap of the first two legs): amplitude per coupled sector
# --------------------------------------------------------------------------------------

@pytest.mark.parametrize('over', [True, False], ids=['over', 'under'])
def test_fibonacci_r_action(np_random, over):
    fib = sym.fibonacci_anyon_category
    be = ct.get_backend(fib, 'numpy')
    V = ElementarySpace(fib, [[1]], [1])          # pure tau
    W = ElementarySpace(fib, [[0], [1]], [1, 1])  # 1 + tau
    T = SymmetricTensor.from_random_normal([V, V], [W], backend=be,
                                           labels=['a', 'b', 'c'], rng=np_random)
    P = _swap_first_two(T, over=over)
    # literals: R^{tt}_1 = e^{-4 pi i/5}, R^{tt}_tau = e^{3 pi i/5}
    R = {0: cmath.exp(-4j * cmath.pi / 5), 1: cmath.exp(3j * cmath.pi / 5)}
    if not over:
        R = {k: v.conjugate() for k, v in R.items()}
    old = _amp_map(T, inner_indexed=False)
    new = _amp_map(P, inner_indexed=False)
    assert set(old) == set(new) == {(0, None), (1, None)}
    for (d, _), amp in old.items():
        assert abs(new[(d, None)] - R[d] * amp) < 1e-12


@pytest.mark.parametrize('over', [True, False], ids=['over', 'under'])
def test_ising_r_action(np_random, over):
    ising = sym.ising_anyon_category  # nu = 1
    be = ct.get_backend(ising, 'numpy')
    V = ElementarySpace(ising, [[1]], [1])               # pure sigma
    W = ElementarySpace(ising, [[0], [2]], [1, 1])       # 1 + psi
    T = SymmetricTensor.from_random_normal([V, V], [W], backend=be,
                                           labels=['a', 'b', 'c'], rng=np_random)
    P = _swap_first_two(T, over=over)
    # literals (Kitaev 16-fold way, nu=1): R^{ss}_1 = e^{-i pi/8}, R^{ss}_psi = e^{3 i pi/8}
    R = {0: cmath.exp(-1j * cmath.pi / 8), 2: cmath.exp(3j * cmath.pi / 8)}
    if not over:
        R = {k: v.conjugate() for k, v in R.items()}
    old = _amp_map(T, inner_indexed=False)
    new = _amp_map(P, inner_indexed=False)
    for (d, _), amp in old.items():
        assert abs(new[(d, None)] - R[d] * amp) < 1e-12


def test_su2_r_action(np_random):
    """Two spin-1/2 legs: swap acts by -1 in the singlet, +1 in the triplet."""
    su2 = ct.su2_symmetry
    be = ct.get_backend(su2, 'numpy')
    V = ElementarySpace(su2, [[1]], [1])          # spin 1/2 (sector label 2j)
    W = ElementarySpace(su2, [[0], [2]], [1, 1])  # spin 0 + spin 1
    T = SymmetricTensor.from_random_normal([V, V], [W], backend=be,
                                           labels=['a', 'b', 'c'], rng=np_random)
    # symmetric braid: levels are irrelevant; run both chiralities
    for over in (True, False):
        P = _swap_first_two(T, over=over)
        old = _amp_map(T, inner_indexed=False)
        new = _amp_map(P, inner_indexed=False)
        for (d, _), amp in old.items():
            expect = -amp if d == 0 else amp  # R = -1 (singlet), +1 (triplet)
            assert abs(new[(d, None)] - expect) < 1e-12


# --------------------------------------------------------------------------------------
# C-move (adjacent swap of legs 2,3 in a 3-leg codomain): mixes inner sectors
# --------------------------------------------------------------------------------------

def _apply_expected(old, M_by_d):
    """new[(d, f)] = sum_e M_d[f, e] old[(d, e)] with literal matrices M_d."""
    new = {}
    for (d, e), amp in old.items():
        M, idx = M_by_d[d]
        for f, fi in idx.items():
            new[(d, f)] = new.get((d, f), 0.) + M[fi, idx[e]] * amp
    return new


@pytest.mark.parametrize('over', [True, False], ids=['over', 'under'])
def test_fibonacci_c_action(np_random, over):
    fib = sym.fibonacci_anyon_category
    be = ct.get_backend(fib, 'numpy')
    V = ElementarySpace(fib, [[1]], [1])
    W = ElementarySpace(fib, [[0], [1]], [1, 1])
    T = SymmetricTensor.from_random_normal([V, V, V], [W], backend=be,
                                           labels=['a', 'b', 'c', 'd'],
                                           rng=np_random)
    P = _swap_second_third(T, over=over)
    # literal braid matrices on the inner-sector basis (e, f in {1, tau}):
    # d = tau: the standard Fibonacci sigma_2 representation
    M_tau = np.array([
        [cmath.exp(4j * cmath.pi / 5) / PHI,
         cmath.exp(-3j * cmath.pi / 5) / math.sqrt(PHI)],
        [cmath.exp(-3j * cmath.pi / 5) / math.sqrt(PHI),
         -1 / PHI],
    ])
    # d = 1: single tree (e = f = tau): phase R^{tt}_1 * conj(R^{tt}_tau)
    M_1 = np.array([[cmath.exp(-4j * cmath.pi / 5)
                     * cmath.exp(-3j * cmath.pi / 5)]])
    if not over:
        M_tau, M_1 = M_tau.conj().T, M_1.conj().T
    # unitarity anchor
    np.testing.assert_allclose(M_tau @ M_tau.conj().T, np.eye(2), atol=1e-14)
    old = _amp_map(T, inner_indexed=True)
    new = _amp_map(P, inner_indexed=True)
    M_by_d = {1: (M_tau, {0: 0, 1: 1}), 0: (M_1, {1: 0})}
    expect = _apply_expected(old, M_by_d)
    assert set(expect) == set(new)
    for k, v in expect.items():
        assert abs(new[k] - v) < 1e-12, (k, new[k], v)


@pytest.mark.parametrize('over', [True, False], ids=['over', 'under'])
def test_ising_c_action(np_random, over):
    ising = sym.ising_anyon_category
    be = ct.get_backend(ising, 'numpy')
    V = ElementarySpace(ising, [[1]], [1])   # pure sigma
    W = ElementarySpace(ising, [[1]], [1])   # sigma (the only fusion outcome)
    T = SymmetricTensor.from_random_normal([V, V, V], [W], backend=be,
                                           labels=['a', 'b', 'c', 'd'],
                                           rng=np_random)
    P = _swap_second_third(T, over=over)
    # literal: M_sigma = (1/sqrt2) [[e^{i pi/8}, e^{-3 i pi/8}],
    #                               [e^{-3 i pi/8}, e^{i pi/8}]]
    # from M[f,e] = R^{f s}_s F^{sss}_s[f,e] conj(R^{ss}_e), R^{psi s}_s = -i
    s2 = 1 / math.sqrt(2)
    M_sigma = s2 * np.array([
        [cmath.exp(1j * cmath.pi / 8), cmath.exp(-3j * cmath.pi / 8)],
        [cmath.exp(-3j * cmath.pi / 8), cmath.exp(1j * cmath.pi / 8)],
    ])
    if not over:
        M_sigma = M_sigma.conj().T
    np.testing.assert_allclose(M_sigma @ M_sigma.conj().T, np.eye(2), atol=1e-14)
    old = _amp_map(T, inner_indexed=True)
    new = _amp_map(P, inner_indexed=True)
    # inner sectors e in {1 (idx 0), psi (idx 2)}
    M_by_d = {1: (M_sigma, {0: 0, 2: 1})}
    expect = _apply_expected(old, M_by_d)
    assert set(expect) == set(new)
    for k, v in expect.items():
        assert abs(new[k] - v) < 1e-12, (k, new[k], v)


# --------------------------------------------------------------------------------------
# data literals: F and B symbols against the literature values
# --------------------------------------------------------------------------------------

def test_fibonacci_f_b_literals():
    fib = sym.fibonacci_anyon_category
    tau = np.array([1])
    one = np.array([0])
    # F^{ttt}_t
    F = np.array([[float(fib.f_symbol(tau, tau, tau, tau,
                                      np.array([e]), np.array([f]))[0, 0, 0, 0])
                   for f in (0, 1)] for e in (0, 1)])
    expect = np.array([[1 / PHI, 1 / math.sqrt(PHI)],
                       [1 / math.sqrt(PHI), -1 / PHI]])
    np.testing.assert_allclose(F, expect, atol=1e-14)
    # B^{tt}_c = sqrt(qdim(tau)) * conj(F^{t t t}_t[1, c]):
    # B^{tt}_1 = 1/sqrt(phi), B^{tt}_tau = 1
    assert abs(complex(fib.b_symbol(tau, tau, one)[0, 0]) - PHI ** -0.5) < 1e-14
    assert abs(complex(fib.b_symbol(tau, tau, tau)[0, 0]) - 1.) < 1e-14


def test_ising_f_r_literals():
    ising = sym.ising_anyon_category
    s, one, psi = np.array([1]), np.array([0]), np.array([2])
    s2 = 1 / math.sqrt(2)
    for e, f, val in [(one, one, s2), (one, psi, s2), (psi, one, s2),
                      (psi, psi, -s2)]:
        assert abs(complex(ising.f_symbol(s, s, s, s, e, f)[0, 0, 0, 0])
                   - val) < 1e-14
    assert abs(complex(ising.r_symbol(psi, psi, one)[0]) - (-1.)) < 1e-14
    assert abs(complex(ising.r_symbol(s, psi, s)[0]) - (-1j)) < 1e-14
