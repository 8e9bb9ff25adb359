"""Tests for fusion trees and their elementary moves."""

from __future__ import annotations

import numpy as np
import pytest

from cyten_tpu import symmetries as sym
from cyten_tpu.symmetries import FusionTree, fusion_trees

SYMS = {
    'U1': (sym.u1_symmetry, [[-1], [0], [1], [2]]),
    'SU2': (sym.su2_symmetry, [[0], [1], [2]]),
    'Fib': (sym.fibonacci_anyon_category, [[0], [1]]),
    'Ising': (sym.ising_anyon_category, [[0], [1], [2]]),
    'SU3_3': (sym.SU3_3AnyonCategory().as_Symmetry(), [[0], [1], [2], [3]]),
    'FermionParity': (sym.fermion_parity, [[0], [1]]),
}


@pytest.fixture(params=list(SYMS), ids=list(SYMS))
def symmetry_and_pool(request):
    return SYMS[request.param]


def random_setup(symmetry, pool, np_random, n_unc=None):
    if n_unc is None:
        n_unc = int(np_random.integers(2, 5))
    unc = np.array([pool[np_random.integers(len(pool))] for _ in range(n_unc)])
    are_dual = np_random.integers(2, size=n_unc).astype(bool)
    # pick a consistent coupled sector
    coupled = unc[0]
    for a in unc[1:]:
        outcomes = symmetry.fusion_outcomes(coupled, a)
        coupled = outcomes[np_random.integers(len(outcomes))]
    return unc, are_dual, coupled


def test_enumeration_and_index(symmetry_and_pool, np_random):
    symmetry, pool = symmetry_and_pool
    for _ in range(5):
        unc, are_dual, coupled = random_setup(symmetry, pool, np_random)
        it = fusion_trees(symmetry, unc, coupled, are_dual)
        trees = list(it)
        assert len(it) == len(trees)
        for i, t in enumerate(trees):
            t.test_sanity()
            assert it.index(t) == i
        # trees are distinct
        assert len(set(trees)) == len(trees)


def test_total_tree_count(symmetry_and_pool, np_random):
    """Sum over coupled sectors of (num trees * qdims) equals the product of qdims."""
    symmetry, pool = symmetry_and_pool
    for _ in range(3):
        unc, are_dual, _ = random_setup(symmetry, pool, np_random, n_unc=3)
        # collect all possible coupled sectors
        total = 0.0
        ab = symmetry.fusion_outcomes(unc[0], unc[1])
        coupleds = {}
        for x in ab:
            for c in symmetry.fusion_outcomes(x, unc[2]):
                coupleds[tuple(c)] = c
        for c in coupleds.values():
            n = len(fusion_trees(symmetry, unc, c, are_dual))
            total += n * symmetry.qdim(c)
        expect = np.prod([symmetry.qdim(a) for a in unc])
        assert abs(total - expect) < 1e-8


def test_braid_unitary(symmetry_and_pool, np_random):
    """The braid acts unitarily on the space of trees with fixed coupled sector."""
    symmetry, pool = symmetry_and_pool
    if symmetry.braiding_style == sym.BraidingStyle.no_braiding:
        pytest.skip('no braiding')
    for _ in range(5):
        unc, are_dual, coupled = random_setup(symmetry, pool, np_random)
        trees = list(fusion_trees(symmetry, unc, coupled, are_dual))
        if not trees:
            continue
        j = int(np_random.integers(len(unc) - 1))
        # braided uncoupled sectors
        unc_b = unc.copy()
        unc_b[[j, j + 1]] = unc_b[[j + 1, j]]
        dual_b = are_dual.copy()
        dual_b[[j, j + 1]] = dual_b[[j + 1, j]]
        target = fusion_trees(symmetry, unc_b, coupled, dual_b)
        n_target = len(target)
        B = np.zeros((n_target, len(trees)), dtype=complex)
        for i, t in enumerate(trees):
            for t2, c in t.braid(j, overbraid=True).items():
                B[target.index(t2), i] = c
        np.testing.assert_allclose(B.conj().T @ B, np.eye(len(trees)), atol=1e-10)
        # overbraid then underbraid = identity
        I = np.zeros((len(trees), len(trees)), dtype=complex)
        for i, t in enumerate(trees):
            for t2, c2 in t.braid(j, overbraid=True).items():
                for t3, c3 in t2.braid(j, overbraid=False).items():
                    I[fusion_trees(symmetry, unc, coupled, are_dual).index(t3), i] \
                        += c2 * c3
        np.testing.assert_allclose(I, np.eye(len(trees)), atol=1e-10)


def test_braid_yang_baxter(symmetry_and_pool, np_random):
    """b1 b2 b1 == b2 b1 b2 on three legs (Yang-Baxter)."""
    symmetry, pool = symmetry_and_pool
    if symmetry.braiding_style == sym.BraidingStyle.no_braiding:
        pytest.skip('no braiding')

    def apply_braid(vec: dict, j: int):
        out: dict = {}
        for t, c in vec.items():
            for t2, c2 in t.braid(j, overbraid=True).items():
                out[t2] = out.get(t2, 0) + c * c2
        return out

    for _ in range(4):
        unc, are_dual, coupled = random_setup(symmetry, pool, np_random, n_unc=3)
        for t0 in fusion_trees(symmetry, unc, coupled, are_dual):
            lhs = apply_braid(apply_braid(apply_braid({t0: 1}, 0), 1), 0)
            rhs = apply_braid(apply_braid(apply_braid({t0: 1}, 1), 0), 1)
            keys = set(lhs) | set(rhs)
            for k in keys:
                assert abs(lhs.get(k, 0) - rhs.get(k, 0)) < 1e-10


def test_braid_dense_oracle(np_random):
    """For group symmetries, the braid coefficients reproduce the dense swap gate."""
    su2 = sym.su2_symmetry
    unc = np.array([[1], [2], [1]])
    are_dual = np.array([False, False, False])
    j = 1
    # dense: X_tree for all trees, all coupled
    for c in [np.array([0]), np.array([2]), np.array([4])]:
        trees = list(fusion_trees(su2, unc, c, are_dual))
        if not trees:
            continue
        unc_b = unc.copy()
        unc_b[[j, j + 1]] = unc_b[[j + 1, j]]
        target = fusion_trees(su2, unc_b, c, are_dual)
        for t in trees:
            X = t.as_block()  # [m1, m2, m3, mc]
            # swap axes j, j+1 of the dense tree (bosonic swap)
            X_swapped = np.swapaxes(X, j, j + 1)
            # compare to sum of coefficients times target trees
            X_expect = np.zeros_like(X_swapped)
            for t2, coeff in t.braid(j, overbraid=True).items():
                X_expect = X_expect + coeff * t2.as_block()
            np.testing.assert_allclose(X_swapped, X_expect, atol=1e-10)


def test_bend_leg_snake(symmetry_and_pool, np_random):
    """Bending down then up is the identity on tree pairs (snake equation)."""
    symmetry, pool = symmetry_and_pool
    for _ in range(5):
        unc, are_dual, coupled = random_setup(symmetry, pool, np_random, n_unc=3)
        X_trees = list(fusion_trees(symmetry, unc, coupled, are_dual))
        Y_trees = list(fusion_trees(symmetry, unc, coupled, are_dual))
        if not X_trees:
            continue
        X, Y = X_trees[0], Y_trees[-1]
        # bend down then bend up
        acc: dict = {}
        for (X1, Y1), c1 in FusionTree.bend_leg(X, Y, bend_downward=True).items():
            for (X2, Y2), c2 in FusionTree.bend_leg(X1, Y1,
                                                    bend_downward=False).items():
                acc[(X2, Y2)] = acc.get((X2, Y2), 0) + c1 * c2
        for (X2, Y2), c in acc.items():
            if X2 == X and Y2 == Y:
                assert abs(c - 1) < 1e-10
            else:
                assert abs(c) < 1e-10


def test_insert_at_norm(symmetry_and_pool, np_random):
    """insert_at produces a normalized linear combination (isometry of F moves)."""
    symmetry, pool = symmetry_and_pool
    for _ in range(5):
        unc1, _, c1 = random_setup(symmetry, pool, np_random, n_unc=2)
        trees1 = list(fusion_trees(symmetry, unc1, c1))
        if not trees1:
            continue
        t2 = trees1[0]
        unc2 = np.array([pool[np_random.integers(len(pool))], c1])
        outcomes = symmetry.fusion_outcomes(unc2[0], unc2[1])
        c2 = outcomes[np_random.integers(len(outcomes))]
        trees2 = list(fusion_trees(symmetry, unc2, c2))
        if not trees2:
            continue
        t1 = trees2[0]
        result = t1.insert_at(1, t2)
        norm = sum(abs(v) ** 2 for v in result.values())
        assert abs(norm - 1) < 1e-10


def test_abelian_tree():
    u1 = sym.u1_symmetry
    t = FusionTree.from_abelian_symmetry(
        u1, np.array([[1], [2], [-1]]), np.array([False, True, False]))
    t.test_sanity()
    np.testing.assert_array_equal(t.coupled, [2])
    np.testing.assert_array_equal(t.inner_sectors, [[3]])
