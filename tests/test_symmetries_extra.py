"""Deep per-symmetry consistency batteries ported from the reference strategy.

Complements tests/test_symmetries.py (F unitarity, pentagon/hexagon, B, twists)
with the remaining reference checks (reference tests/python_tests/test_symmetries.py:
195-694): fusion-tensor orthonormality/completeness/cup relations, the defining
properties of F/R/C/B symbols expressed through explicit fusion tensors, C-symbol
shape/unitarity, N-symbol unitor/duality structure, and specialized-vs-fallback
agreement for all derived topological data.
"""

from __future__ import annotations

import numpy as np
import pytest

from cyten_tpu import symmetries as sym
from cyten_tpu.symmetries import Symmetry
from cyten_tpu.symmetries.core import SymmetryFactor

from test_symmetries import SYMMETRIES, _sectors_pool

pytestmark = pytest.mark.filterwarnings('ignore::UserWarning')


@pytest.fixture(params=list(SYMMETRIES), ids=list(SYMMETRIES))
def any_symmetry(request):
    return SYMMETRIES[request.param]


def _sample_triplets(s: Symmetry, pool, np_random, n=10):
    """(a, b, c) with a x b -> c allowed."""
    out = []
    for _ in range(4 * n):
        if len(out) >= n:
            break
        a = pool[np_random.integers(len(pool))]
        b = pool[np_random.integers(len(pool))]
        cs = s.fusion_outcomes(a, b)
        out.append((a, b, cs[np_random.integers(len(cs))]))
    return out


def _sample_sextets(s: Symmetry, pool, np_random, n=10):
    """(a, b, c, d, e, f) valid F-symbol inputs: f in a x b, d in f x c, e in b x c,
    d in a x e (reference test_symmetries.py:103-128)."""
    out = []
    for _ in range(10 * n):
        if len(out) >= n:
            break
        a, b, c = (pool[np_random.integers(len(pool))] for _ in range(3))
        fs = s.fusion_outcomes(a, b)
        f = fs[np_random.integers(len(fs))]
        ds = s.fusion_outcomes(f, c)
        d = ds[np_random.integers(len(ds))]
        es = [e for e in s.fusion_outcomes(b, c) if s.can_fuse_to(a, e, d)]
        if not es:
            continue
        out.append((a, b, c, d, es[np_random.integers(len(es))], f))
    return out


def _sample_c_sextets(s: Symmetry, pool, np_random, n=10):
    """(a, b, c, d, e, f) valid C-symbol inputs: e in a x b, d in e x c,
    f in a x c, d in f x b (reference c_symbol convention)."""
    out = []
    for _ in range(10 * n):
        if len(out) >= n:
            break
        a, b, c = (pool[np_random.integers(len(pool))] for _ in range(3))
        es = s.fusion_outcomes(a, b)
        e = es[np_random.integers(len(es))]
        ds = s.fusion_outcomes(e, c)
        d = ds[np_random.integers(len(ds))]
        fs = [f for f in s.fusion_outcomes(a, c) if s.can_fuse_to(f, b, d)]
        if not fs:
            continue
        out.append((a, b, c, d, e, fs[np_random.integers(len(fs))]))
    return out


def test_common_sanity(any_symmetry, np_random):
    """Sector validity, unitors, duality of the N symbol.

    Reference: test_symmetries.py:225-280 (common_checks head).
    """
    s = any_symmetry
    pool = _sectors_pool(s, np_random)
    triv = s.trivial_sector
    assert triv.shape == (s.sector_ind_len,)
    assert s.is_valid_sector(triv)
    assert not s.is_valid_sector(np.zeros(s.sector_ind_len + 2, dtype=int))
    for invalid in [np.zeros((1, s.sector_ind_len), dtype=int)]:
        assert not s.is_valid_sector(invalid)
    assert s.qdim(triv) in (1, 1.0)
    assert s.num_sectors == np.inf or (
        isinstance(s.num_sectors, (int, np.integer)) and s.num_sectors > 0)
    if s.num_sectors < np.inf:
        all_sectors = s.all_sectors()
        assert all_sectors.shape == (s.num_sectors, s.sector_ind_len)
        for a in all_sectors:
            assert s.is_valid_sector(a)
    # string representations just need to run
    _ = s.sector_str(triv)
    _ = repr(s)
    _ = str(s)
    # trivial sector is its own dual
    np.testing.assert_array_equal(s.dual_sector(triv), triv)
    # left/right unitor and duality, diagonal part
    for a in pool:
        assert s.n_symbol(a, s.dual_sector(a), triv) == 1
        assert s.n_symbol(a, triv, a) == 1
        assert s.n_symbol(triv, a, a) == 1
    # off-diagonal part
    for _ in range(10):
        i, j = np_random.integers(len(pool)), np_random.integers(len(pool))
        a, b = pool[i], pool[j]
        if np.array_equal(a, b):
            continue
        if not np.array_equal(a, s.dual_sector(b)):
            assert s.n_symbol(a, s.dual_sector(b), triv) == 0
        assert s.n_symbol(a, triv, b) == 0
        assert s.n_symbol(triv, a, b) == 0
    # fusion style / braiding style constraints
    if s.is_abelian:
        for a in pool:
            for b in pool:
                assert len(s.fusion_outcomes(a, b)) == 1
    if s.braiding_style == sym.BraidingStyle.bosonic:
        for a in pool:
            np.testing.assert_allclose(s.topological_twist(a), 1)
    elif s.braiding_style == sym.BraidingStyle.fermionic:
        for a in pool:
            np.testing.assert_allclose(complex(s.topological_twist(a)) ** 2, 1)
    if s.braiding_style.value <= sym.BraidingStyle.fermionic.value:
        for a, b, c in _sample_triplets(s, pool, np_random):
            np.testing.assert_allclose(np.asarray(s.r_symbol(a, b, c)) ** 2,
                                       np.ones(s.n_symbol(a, b, c)), atol=1e-10)


def test_fusion_tensor_battery(any_symmetry, np_random):
    """Fusion tensors: shape, orthonormality, completeness, Z-iso and cup relations.

    Reference: test_symmetries.py:350-437 (check_fusion_tensor).
    """
    s = any_symmetry
    if not (s.can_be_dropped and s.has_trivial_braid):
        pytest.skip('fusion tensors only have dense arrays for Rep(G)-like symmetries')
    pool = _sectors_pool(s, np_random)
    for _ in range(6):
        a = pool[np_random.integers(len(pool))]
        b = pool[np_random.integers(len(pool))]
        d_a, d_b = s.sector_dim(a), s.sector_dim(b)
        outcomes = s.fusion_outcomes(a, b)
        completeness = np.zeros((d_a, d_b, d_a, d_b))
        for c in outcomes:
            d_c = s.sector_dim(c)
            X = s.fusion_tensor(a, b, c)
            N = s.n_symbol(a, b, c)
            assert X.shape == (N, d_a, d_b, d_c)
            Y = np.conj(X)
            # orthonormality within c
            res = np.tensordot(Y, X, [[1, 2], [1, 2]])  # [mu', m_c', mu, m_c]
            expect = (np.eye(N)[:, None, :, None]
                      * np.eye(d_c)[None, :, None, :])
            np.testing.assert_allclose(res, expect, atol=1e-10)
            completeness += np.tensordot(X, Y, [[0, 3], [0, 3]]).real
        # completeness over all c
        np.testing.assert_allclose(
            completeness,
            np.eye(d_a)[:, None, :, None] * np.eye(d_b)[None, :, None, :],
            atol=1e-10)
        # orthogonality across distinct outcomes
        for ci in range(len(outcomes)):
            for cj in range(len(outcomes)):
                if ci == cj:
                    continue
                c, d = outcomes[ci], outcomes[cj]
                res = np.tensordot(np.conj(s.fusion_tensor(a, b, c)),
                                   s.fusion_tensor(a, b, d), [[1, 2], [1, 2]])
                np.testing.assert_allclose(res, 0, atol=1e-10)
    for a in pool:
        d_a = s.sector_dim(a)
        a_bar = s.dual_sector(a)
        Z_a = s.Z_iso(a)
        Z_a_bar = s.Z_iso(a_bar)
        # Z iso unitary
        np.testing.assert_allclose(Z_a @ Z_a.conj().T, np.eye(d_a), atol=1e-10)
        np.testing.assert_allclose(Z_a.conj().T @ Z_a, np.eye(d_a), atol=1e-10)
        # defining property of Frobenius-Schur
        np.testing.assert_allclose(Z_a.T, s.frobenius_schur(a) * Z_a_bar,
                                   atol=1e-10)
        # reduction to left/right unitor with a trivial input
        X = s.fusion_tensor(a, s.trivial_sector, a)
        np.testing.assert_allclose(X, np.eye(d_a)[None, :, None, :], atol=1e-10)
        X = s.fusion_tensor(s.trivial_sector, a, a)
        np.testing.assert_allclose(X, np.eye(d_a)[None, None, :, :], atol=1e-10)
        # cup relation: Y^{a abar}_0 = Z_a^T / sqrt(d_a) = fs(a)/sqrt(d_a) Z_abar
        Y = np.conj(s.fusion_tensor(a, a_bar, s.trivial_sector))[0, :, :, 0]
        np.testing.assert_allclose(Y, Z_a.T / np.sqrt(d_a), atol=1e-10)
        np.testing.assert_allclose(
            Y, s.frobenius_schur(a) / np.sqrt(d_a) * Z_a_bar, atol=1e-10)


def test_symbols_via_fusion_tensors(any_symmetry, np_random):
    """F/R/C/B symbols vs their defining contractions of explicit fusion tensors.

    Reference: test_symmetries.py:437-525 (check_symbols_via_fusion_tensors).
    """
    s = any_symmetry
    if not (s.can_be_dropped and s.has_trivial_braid):
        pytest.skip('needs dense fusion tensors (Rep(G)-like symmetry)')
    pool = _sectors_pool(s, np_random)
    # F symbol
    for a, b, c, d, e, f in _sample_sextets(s, pool, np_random, n=6):
        res = np.conj(s.fusion_tensor(f, c, d))  # [lam, f, c, d]
        res = np.tensordot(res, np.conj(s.fusion_tensor(a, b, f)), (1, 3))
        res = np.tensordot(res, s.fusion_tensor(b, c, e), ([1, 5], [2, 1]))
        res = np.tensordot(res, s.fusion_tensor(a, e, d), ([3, 5], [1, 2]))
        res = np.transpose(res, [3, 4, 2, 0, 1, 5])  # [mu, nu, kap, lam, d, d]
        F = s.f_symbol(a, b, c, d, e, f)
        expect = F[..., None, None] * np.eye(s.sector_dim(d))[None, None, None, None]
        np.testing.assert_allclose(res, expect, atol=1e-10)
    # R symbol
    for a, b, c in _sample_triplets(s, pool, np_random, n=8):
        res = np.conj(s.fusion_tensor(b, a, c))  # [nu, b, a, c]
        res = np.tensordot(res, s.fusion_tensor(a, b, c), ([1, 2], [2, 1]))
        res = np.transpose(res, [2, 0, 1, 3])  # [mu, nu, c, c]
        R = s.r_symbol(a, b, c)
        expect = np.diag(R)[:, :, None, None] * np.eye(s.sector_dim(c))[None, None]
        np.testing.assert_allclose(res, expect, atol=1e-10)
    # C symbol
    for a, b, c, d, e, f in _sample_c_sextets(s, pool, np_random, n=6):
        res = np.conj(s.fusion_tensor(f, b, d))  # [lam, f, b, d]
        res = np.tensordot(res, np.conj(s.fusion_tensor(a, c, f)), (1, -1))
        res = np.tensordot(res, s.fusion_tensor(a, b, e), ([1, 4], [2, 1]))
        res = np.tensordot(res, s.fusion_tensor(e, c, d), ([3, 5], [2, 1]))
        res = np.transpose(res, [3, 4, 2, 0, 1, 5])
        C = s.c_symbol(a, b, c, d, e, f)
        expect = C[..., None, None] * np.eye(s.sector_dim(d))[None, None, None, None]
        np.testing.assert_allclose(res, expect, atol=1e-10)
    # B symbol
    for a, b, c in _sample_triplets(s, pool, np_random, n=8):
        bbar = s.dual_sector(b)
        res = s.fusion_tensor(a, b, c)  # [mu, a, b, c]
        res = np.tensordot(res, s.Z_iso(b), (2, 1))  # [mu, a, c, bbar]
        res = np.tensordot(res, s.fusion_tensor(c, bbar, a), ([2, 3], [1, 2]))
        res = np.transpose(res, [0, 2, 1, 3])  # [mu, nu, a, a]
        B = s.b_symbol(a, b, c)
        expect = B[:, :, None, None] * np.eye(s.sector_dim(a))[None, None]
        np.testing.assert_allclose(res, expect, atol=1e-10)


def test_c_symbols(any_symmetry, np_random):
    """C symbols: shape, reality, trivial-sector reduction, unitarity.

    Reference: test_symmetries.py:573-602 (check_C_symbols).
    """
    s = any_symmetry
    if s.braiding_style == sym.BraidingStyle.no_braiding:
        pytest.skip('no braiding defined')
    pool = _sectors_pool(s, np_random)
    triv = s.trivial_sector
    for a, b, c, d, e, f in _sample_c_sextets(s, pool, np_random, n=10):
        shape = (s.n_symbol(a, b, e), s.n_symbol(e, c, d),
                 s.n_symbol(a, c, f), s.n_symbol(f, b, d))
        C = s.c_symbol(a, b, c, d, e, f)
        assert C.shape == shape
        if not s.has_complex_topological_data:
            np.testing.assert_allclose(np.imag(np.asarray(C, complex)), 0,
                                       atol=1e-10)
        if np.array_equal(b, triv) or np.array_equal(c, triv):
            np.testing.assert_allclose(
                C, np.eye(shape[0] * shape[1]).reshape(shape), atol=1e-10)
    # unitarity in the (e mu nu) <-> (g mu' nu') pairing at fixed a, b, c, d
    checked = 0
    for _ in range(60):
        if checked >= 8:
            break
        a, b, c = (pool[np_random.integers(len(pool))] for _ in range(3))
        es_all = s.fusion_outcomes(a, b)
        e = es_all[np_random.integers(len(es_all))]
        ds = s.fusion_outcomes(e, c)
        d = ds[np_random.integers(len(ds))]
        es = [x for x in es_all if s.can_fuse_to(x, c, d)]
        fs = [f for f in s.fusion_outcomes(a, c) if s.can_fuse_to(f, b, d)]
        if not fs:
            continue
        for e1 in es:
            for e2 in es:
                shape = (s.n_symbol(a, b, e1), s.n_symbol(e1, c, d),
                         s.n_symbol(a, b, e2), s.n_symbol(e2, c, d))
                res = np.zeros(shape, dtype=complex)
                for f in fs:
                    C1 = s.c_symbol(a, b, c, d, e1, f)
                    C2 = np.conj(s.c_symbol(a, b, c, d, e2, f))
                    res += np.tensordot(C1, C2, axes=[[2, 3], [2, 3]])
                if np.array_equal(e1, e2):
                    np.testing.assert_allclose(
                        res, np.eye(shape[0] * shape[1]).reshape(shape),
                        atol=1e-10)
                else:
                    np.testing.assert_allclose(res, 0, atol=1e-10)
        checked += 1
    assert checked > 0


def test_fallbacks_match_specializations(any_symmetry, np_random):
    """Derived topological data agrees with the generic fallback derivations.

    Every concrete symmetry that overrides qdim/FS/twist/Z_iso/B/C for speed must
    agree with the category-theoretic fallback formulas on the SymmetryFactor base
    class. Reference: test_symmetries.py:297-325 (common_checks tail).
    """
    s = any_symmetry
    if s.num_factors != 1:
        pytest.skip('fallback comparison runs on single factors')
    factor = s.factors[0]
    pool = _sectors_pool(s, np_random)
    for a in pool:
        if s.can_be_dropped:
            np.testing.assert_allclose(factor.Z_iso(a), SymmetryFactor.Z_iso(factor, a),
                                       atol=1e-10, err_msg='Z_iso vs fallback')
        assert factor.frobenius_schur(a) == SymmetryFactor.frobenius_schur(factor, a)
        np.testing.assert_allclose(factor.qdim(a), SymmetryFactor.qdim(factor, a),
                                   atol=1e-10, err_msg='qdim vs fallback')
        np.testing.assert_allclose(
            complex(factor.topological_twist(a)),
            complex(SymmetryFactor.topological_twist(factor, a)),
            atol=1e-10, err_msg='twist vs fallback')
    for a, b, c in _sample_triplets(s, pool, np_random):
        np.testing.assert_allclose(factor._b_symbol(a, b, c),
                                   SymmetryFactor._b_symbol(factor, a, b, c),
                                   atol=1e-10, err_msg='B vs fallback')
    if s.braiding_style != sym.BraidingStyle.no_braiding:
        for a, b, c, d, e, f in _sample_c_sextets(s, pool, np_random, n=6):
            np.testing.assert_allclose(
                factor._c_symbol(a, b, c, d, e, f),
                SymmetryFactor._c_symbol(factor, a, b, c, d, e, f),
                atol=1e-10, err_msg='C vs fallback')


def test_f_symbol_shape_and_triviality(any_symmetry, np_random):
    """F-symbol shape, reality, and reduction to identity with a trivial input.

    Reference: test_symmetries.py:526-543 (check_F_symbols head).
    """
    s = any_symmetry
    pool = _sectors_pool(s, np_random)
    triv = s.trivial_sector
    for a, b, c, d, e, f in _sample_sextets(s, pool, np_random, n=10):
        shape = (s.n_symbol(b, c, e), s.n_symbol(a, e, d),
                 s.n_symbol(a, b, f), s.n_symbol(f, c, d))
        F = s.f_symbol(a, b, c, d, e, f)
        assert F.shape == shape
        if not s.has_complex_topological_data:
            np.testing.assert_allclose(np.imag(np.asarray(F, complex)), 0,
                                       atol=1e-10)
        if any(np.array_equal(x, triv) for x in (a, b, c)):
            np.testing.assert_allclose(
                F, np.eye(shape[0] * shape[1]).reshape(shape), atol=1e-10)
    # R triviality: exchanging with the trivial sector is the identity
    for a in pool:
        np.testing.assert_allclose(s.r_symbol(a, triv, a), 1, atol=1e-10)
        np.testing.assert_allclose(s.r_symbol(triv, a, a), 1, atol=1e-10)
