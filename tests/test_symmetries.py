"""Axiomatic tests of the symmetry layer: fusion consistency, pentagon & hexagon
equations, B-symbol normalization / snake equation, twists and quantum dimensions.

Mirrors the reference test strategy (reference: tests/python_tests/test_symmetries.py:
622-694) — the F/R data must satisfy the category axioms for *every* symmetry class.
"""

from __future__ import annotations

import numpy as np
import pytest

from cyten_tpu import symmetries as sym
from cyten_tpu.symmetries import Symmetry

pytestmark = pytest.mark.filterwarnings('ignore::UserWarning')


def _sectors_pool(s: Symmetry, np_random, max_n=6):
    if s.num_sectors == np.inf:
        # sample small sectors factor-wise
        pools = {
            'U(1)': np.arange(-2, 3)[:, None],
            'SU(2)': np.arange(0, 4)[:, None],
            'FermionNumber': np.arange(-2, 3)[:, None],
        }
        parts = []
        for f in s.factors:
            if f.group_name in pools:
                parts.append(pools[f.group_name])
            elif f.group_name.startswith('SU('):
                n = f.N
                base = [tuple([k] + [0] * (n - 1)) for k in range(3)]
                base += [(2, 1) + (0,) * (n - 2)]
                parts.append(np.array(base, dtype=int))
            else:
                parts.append(f.all_sectors())
        # cartesian product (truncated)
        out = parts[0]
        for p in parts[1:]:
            out = np.concatenate(
                [np.concatenate([np.repeat(a[None, :], len(p), 0), p], axis=1)
                 for a in out], axis=0)
        pool = out
    else:
        pool = s.all_sectors()
    if len(pool) > max_n:
        pool = pool[np_random.choice(len(pool), max_n, replace=False)]
    return pool


SYMMETRIES = {
    'NoSymmetry': sym.no_symmetry,
    'U1': sym.u1_symmetry,
    'Z4': sym.z4_symmetry,
    'Z2xZ3': sym.ZN(2) * sym.ZN(3),
    'U1xZ3': sym.U1() * sym.ZN(3),
    'SU2': sym.su2_symmetry,
    'FermionParity': sym.fermion_parity,
    'FermionNumber': sym.fermion_number,
    'Fibonacci': sym.fibonacci_anyon_category,
    # opposite gradings (reference test_symmetries.py:1157,1200,1429 parametrize
    # handedness / Kitaev's 16-fold-way nu): same axioms, conjugated braids
    'FibonacciRight': sym.FibonacciAnyonCategory(handedness='right').as_Symmetry(),
    'Ising': sym.ising_anyon_category,
    'Ising_nu5': sym.IsingAnyonCategory(nu=5).as_Symmetry(),
    'Ising_nu13': sym.IsingAnyonCategory(nu=13).as_Symmetry(),
    'SU2_k3': sym.SU2_kAnyonCategory(3).as_Symmetry(),
    'SU2_k3Right': sym.SU2_kAnyonCategory(3, handedness='right').as_Symmetry(),
    'ZNAnyon31': sym.ZNAnyonCategory(3, 1).as_Symmetry(),
    'Semion': sym.semion_category,
    'ToricCode': sym.toric_code_category,
    'DoubleSemion': sym.double_semion_category,
    'SU3_3': sym.SU3_3AnyonCategory().as_Symmetry(),
    'FibxU1': sym.FibonacciAnyonCategory() * sym.U1(),
}


@pytest.fixture(params=list(SYMMETRIES), ids=list(SYMMETRIES))
def any_symmetry(request):
    return SYMMETRIES[request.param]


def test_basic_properties(any_symmetry, np_random):
    s = any_symmetry
    pool = _sectors_pool(s, np_random)
    assert s.is_valid_sector(s.trivial_sector)
    assert s.are_valid_sectors(pool)
    for a in pool:
        abar = s.dual_sector(a)
        assert s.is_valid_sector(abar)
        # N^{a abar}_0 == 1
        assert s.n_symbol(a, abar, s.trivial_sector) == 1
        # fusion with trivial sector
        outc = s.fusion_outcomes(a, s.trivial_sector)
        assert len(outc) == 1 and np.array_equal(outc[0], a)
        # qdim positive, consistent with dual
        assert s.qdim(a) > 0
        assert abs(s.qdim(a) - s.qdim(abar)) < 1e-10
        if s.can_be_dropped:
            assert s.sector_dim(a) == int(round(s.qdim(a)))
    # dual_sectors consistency
    np.testing.assert_array_equal(s.dual_sectors(pool),
                                  np.stack([s.dual_sector(a) for a in pool]))
    # fusion dimension sum rule: sum_c N^{ab}_c d_c == d_a d_b
    for _ in range(10):
        a = pool[np_random.integers(len(pool))]
        b = pool[np_random.integers(len(pool))]
        total = sum(s.n_symbol(a, b, c) * s.qdim(c) for c in s.fusion_outcomes(a, b))
        assert abs(total - s.qdim(a) * s.qdim(b)) < 1e-8


def test_f_symbols_unitary(any_symmetry, np_random):
    """The F move is unitary: sum over (e μ ν) of F · F̄ = identity on (f κ λ)."""
    s = any_symmetry
    pool = _sectors_pool(s, np_random)
    checked = 0
    for _ in range(80):
        if checked >= 15:
            break
        a, b, c = (pool[np_random.integers(len(pool))] for _ in range(3))
        for f_ab in s.fusion_outcomes(a, b):
            for d in s.fusion_outcomes(f_ab, c):
                es = [e for e in s.fusion_outcomes(b, c) if s.can_fuse_to(a, e, d)]
                fs = [f for f in s.fusion_outcomes(a, b) if s.can_fuse_to(f, c, d)]
                # build the full F matrix [(e,μ,ν) x (f,κ,λ)]
                blocks = []
                for e in es:
                    row = []
                    for f in fs:
                        F = s.f_symbol(a, b, c, d, e, f)
                        m1, m2, m3, m4 = F.shape
                        row.append(F.reshape(m1 * m2, m3 * m4))
                    blocks.append(np.concatenate(row, axis=1))
                M = np.concatenate(blocks, axis=0)
                assert M.shape[0] == M.shape[1]
                np.testing.assert_allclose(M @ M.conj().T, np.eye(M.shape[0]),
                                           atol=1e-10)
                checked += 1


def test_pentagon_equation(any_symmetry, np_random):
    s = any_symmetry
    pool = _sectors_pool(s, np_random)
    checked = 0
    for _ in range(200):
        if checked >= 20:
            break
        a, b, c, d = (pool[np_random.integers(len(pool))] for _ in range(4))
        fs = s.fusion_outcomes(a, b)
        f = fs[np_random.integers(len(fs))]
        gs = s.fusion_outcomes(f, c)
        g = gs[np_random.integers(len(gs))]
        es = s.fusion_outcomes(g, d)
        e = es[np_random.integers(len(es))]
        js = [j for j in s.fusion_outcomes(c, d) if s.can_fuse_to(f, j, e)]
        if not js:
            continue
        j = js[np_random.integers(len(js))]
        is_ = [i for i in s.fusion_outcomes(b, j) if s.can_fuse_to(a, i, e)]
        if not is_:
            continue
        i = is_[np_random.integers(len(is_))]

        lhs = s.f_symbol(f, c, d, e, j, g)  # [γ, σ, ν, ρ]
        lhs = np.tensordot(lhs, s.f_symbol(a, b, j, e, i, f), axes=[1, 3])  # [γ,ν,ρ,δ,κ,μ]
        lhs = lhs.transpose([5, 1, 4, 2, 0, 3])  # [μ, ν, κ, ρ, γ, δ]

        rhs = np.zeros(lhs.shape, dtype=complex)
        for h in s.fusion_outcomes(b, c):
            if s.can_fuse_to(a, h, g) and s.can_fuse_to(h, d, i):
                t = s.f_symbol(a, b, c, g, h, f)  # [σ, λ, μ, ν]
                t = np.tensordot(t, s.f_symbol(a, h, d, e, i, g), axes=[1, 2])  # [σ,μ,ν,ω,κ,ρ]
                t = np.tensordot(t, s.f_symbol(b, c, d, i, j, h),
                                 axes=([0, 3], [2, 3]))  # [μ, ν, κ, ρ, γ, δ]
                rhs += t
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)
        checked += 1
    assert checked > 0


def test_hexagon_equation(any_symmetry, np_random):
    s = any_symmetry
    if s.braiding_style == sym.BraidingStyle.no_braiding:
        pytest.skip('no braiding defined')
    pool = _sectors_pool(s, np_random)
    checked = 0
    for _ in range(200):
        if checked >= 20:
            break
        a, b, c = (pool[np_random.integers(len(pool))] for _ in range(3))
        es = s.fusion_outcomes(c, a)
        e = es[np_random.integers(len(es))]
        gs = s.fusion_outcomes(c, b)
        g = gs[np_random.integers(len(gs))]
        ds = [d for d in s.fusion_outcomes(e, b) if s.can_fuse_to(a, g, d)]
        if not ds:
            continue
        d = ds[np_random.integers(len(ds))]

        for conj in (False, True):
            def R(x, y, z):
                r = np.diag(s.r_symbol(x, y, z))
                return r.conj() if conj else r

            lhs = R(c, a, e)  # [α, λ]
            lhs = np.tensordot(lhs, s.f_symbol(a, c, b, d, g, e), axes=[1, 2])  # [α,γ,ν,β]
            lhs = np.tensordot(lhs, R(c, b, g), axes=[1, 0])  # [α, ν, β, μ]
            lhs = lhs.transpose([0, 2, 3, 1])  # [α, β, μ, ν]

            rhs = np.zeros(lhs.shape, dtype=complex)
            for f in s.fusion_outcomes(a, b):
                if s.can_fuse_to(c, f, d):
                    t = s.f_symbol(c, a, b, d, f, e)  # [δ, σ, α, β]
                    t = np.tensordot(t, R(c, f, d), axes=[1, 0])  # [δ, α, β, ψ]
                    t = np.tensordot(t, s.f_symbol(a, b, c, d, g, f),
                                     axes=([0, 3], [2, 3]))  # [α, β, μ, ν]
                    rhs += t
            np.testing.assert_allclose(lhs, rhs, atol=1e-10)
        checked += 1
    assert checked > 0


def test_b_symbols(any_symmetry, np_random):
    s = any_symmetry
    pool = _sectors_pool(s, np_random)
    for _ in range(20):
        a = pool[np_random.integers(len(pool))]
        b = pool[np_random.integers(len(pool))]
        for c in s.fusion_outcomes(a, b):
            n = s.n_symbol(a, b, c)
            B = s.b_symbol(a, b, c)
            assert B.shape == (n, n)
            if not s.has_complex_topological_data:
                np.testing.assert_allclose(np.imag(np.asarray(B, complex)), 0, atol=1e-12)
            # normalization: B B† = (d_c / d_a) 1
            np.testing.assert_allclose(
                np.tensordot(B, np.conj(B), axes=[1, 1]),
                np.eye(n) * s.qdim(c) / s.qdim(a), atol=1e-10)
            # snake equation
            snake = np.tensordot(B, s.b_symbol(c, s.dual_sector(b), a), axes=[1, 1])
            np.testing.assert_allclose(snake, s.frobenius_schur(b) * np.eye(n),
                                       atol=1e-10)


def test_twists(any_symmetry, np_random):
    s = any_symmetry
    pool = _sectors_pool(s, np_random)
    for a in pool:
        t = s.topological_twist(a)
        assert abs(abs(complex(t)) - 1) < 1e-10
        # twist of dual equals twist
        t_dual = s.topological_twist(s.dual_sector(a))
        assert abs(complex(t) - complex(t_dual)) < 1e-10
        if s.has_symmetric_braid:
            assert t in (+1, -1)


def test_product_symmetry():
    s = sym.U1('a') * sym.ZN(4, 'b') * sym.FermionParity()
    assert s.num_factors == 3
    assert s.sector_ind_len == 3
    assert s.is_abelian
    assert s.braiding_style == sym.BraidingStyle.fermionic
    a = np.array([2, 3, 1])
    b = np.array([-1, 2, 1])
    c = s.fusion_outcomes(a, b)
    np.testing.assert_array_equal(c, [[1, 1, 0]])
    np.testing.assert_array_equal(s.dual_sector(a), [-2, 1, 1])
    # R symbol: fermionic sign from the parity factor
    r = s.r_symbol(a, b, s.multiple_fusion(a, b))
    assert r[0] == -1
    assert s.factor_where('b') == 1
    assert s.is_equivalent_to(sym.ZN(4) * sym.U1() * sym.FermionParity())
    assert not s.is_equivalent_to(sym.ZN(4) * sym.U1() * sym.FermionParity(),
                                  strict_ordering=True)
    # serialization roundtrip
    s2 = Symmetry.from_config(s.to_config())
    assert s2 == s


def test_sun_fusion():
    """SU(N) fusion via the Littlewood-Richardson rule against known tables."""
    su3 = sym.SUN(3)
    f3 = np.array([1, 0, 0])  # fundamental, dim 3
    adj = np.array([2, 1, 0])  # adjoint, dim 8
    assert su3.sector_dim(f3) == 3
    assert su3.sector_dim(adj) == 8
    assert su3.sector_dim(np.array([3, 0, 0])) == 10
    # 3 x 3bar = 1 + 8
    f3bar = su3.dual_sector(f3)
    np.testing.assert_array_equal(f3bar, [1, 1, 0])
    out = su3.fusion_outcomes(f3, f3bar)
    assert {tuple(c) for c in out} == {(0, 0, 0), (2, 1, 0)}
    # 8 x 8 = 1 + 8 + 8 + 10 + 10bar + 27
    out = su3.fusion_outcomes(adj, adj)
    counts = {tuple(c): su3._n_symbol(adj, adj, c) for c in out}
    assert counts[(0, 0, 0)] == 1
    assert counts[(2, 1, 0)] == 2  # 8 appears twice
    assert counts[(3, 0, 0)] == 1  # 10
    assert counts[(3, 3, 0)] == 1  # 10bar
    assert counts[(4, 2, 0)] == 1  # 27
    # dimension sum rule
    total = sum(n * su3.sector_dim(np.array(c)) for c, n in counts.items())
    assert total == 64
    # SU(4): 4 x 4bar = 1 + 15
    su4 = sym.SUN(4)
    f4 = np.array([1, 0, 0, 0])
    out = su4.fusion_outcomes(f4, su4.dual_sector(f4))
    dims = sorted(su4.sector_dim(c) for c in out)
    assert dims == [1, 15]


def test_frobenius_schur():
    su2 = sym.SU2()
    assert su2.frobenius_schur(np.array([0])) == 1
    assert su2.frobenius_schur(np.array([1])) == -1  # spin-1/2 is pseudo-real
    assert su2.frobenius_schur(np.array([2])) == 1
    ising = sym.IsingAnyonCategory(nu=1)
    assert ising.frobenius_schur(np.array([1])) == 1
    ising3 = sym.IsingAnyonCategory(nu=3)
    assert ising3.frobenius_schur(np.array([1])) == -1


def test_s_matrix():
    fib = sym.FibonacciAnyonCategory()
    S = fib.s_matrix()
    phi = (1 + np.sqrt(5)) / 2
    expected = np.array([[1, phi], [phi, -1]]) / np.sqrt(2 + phi)
    np.testing.assert_allclose(S, expected, atol=1e-10)
    # S is unitary for modular categories
    np.testing.assert_allclose(S @ S.conj().T, np.eye(2), atol=1e-10)


def test_su2_spectra():
    su2 = sym.SU2()
    # spin 1/2 x spin 1/2 = spin 0 + spin 1
    out = su2.fusion_outcomes(np.array([1]), np.array([1]))
    np.testing.assert_array_equal(out, [[0], [2]])
    # fusion tensor: singlet CG
    X = su2.fusion_tensor(np.array([1]), np.array([1]), np.array([0]))
    expected = np.zeros((1, 2, 2, 1))
    expected[0, 0, 1, 0] = -1 / np.sqrt(2)  # m = (-1/2, +1/2), Condon-Shortley
    expected[0, 1, 0, 0] = +1 / np.sqrt(2)
    np.testing.assert_allclose(X, expected, atol=1e-15)
    # completeness: sum_c X X^dag = identity
    a, b = np.array([2]), np.array([1])
    d_a, d_b = 3, 2
    total = np.zeros((d_a * d_b, d_a * d_b))
    for c in su2.fusion_outcomes(a, b):
        X = su2.fusion_tensor(a, b, c)[0].reshape(d_a * d_b, -1)
        total += X @ X.T
    np.testing.assert_allclose(total, np.eye(d_a * d_b), atol=1e-14)
