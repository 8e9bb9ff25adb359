"""Deeper fusion-tree manipulation batteries (reference test_trees.py:94-608).

Dense oracles for braid/insert_at/outer on droppable symmetries, structural
checks of braid outputs, split/insert roundtrips, and twist inverses for the
braided theories.
"""

import numpy as np
import pytest

from cyten_tpu import symmetries as sym
from cyten_tpu.symmetries import FusionTree, fusion_trees

from test_trees import SYMS, random_setup


@pytest.fixture(params=list(SYMS), ids=list(SYMS))
def symmetry_and_pool(request):
    return SYMS[request.param]


def _random_tree(symmetry, pool, np_random, n_unc, no_dual=False):
    unc, are_dual, coupled = random_setup(symmetry, pool, np_random, n_unc=n_unc)
    if no_dual:
        are_dual = np.zeros(n_unc, dtype=bool)
    trees = list(fusion_trees(symmetry, unc, coupled, are_dual))
    if not trees:
        return None
    return trees[np_random.integers(len(trees))]


def test_braid_structure(symmetry_and_pool, np_random):
    """Braid outputs swap exactly the braided uncoupled sectors and dual flags.

    Reference: test_trees.py:101-122.
    """
    symmetry, pool = symmetry_and_pool
    if symmetry.braiding_style == sym.BraidingStyle.no_braiding:
        pytest.skip('no braiding')
    checked = 0
    for _ in range(10):
        tree = _random_tree(symmetry, pool, np_random, n_unc=4)
        if tree is None:
            continue
        for j in (0, 1, 2):
            for over in (True, False):
                out = tree.braid(j, overbraid=over)
                assert len(out) > 0
                for t, coeff in out.items():
                    t.test_sanity()
                    np.testing.assert_array_equal(t.uncoupled[j],
                                                  tree.uncoupled[j + 1])
                    np.testing.assert_array_equal(t.uncoupled[j + 1],
                                                  tree.uncoupled[j])
                    assert t.are_dual[j] == tree.are_dual[j + 1]
                    assert t.are_dual[j + 1] == tree.are_dual[j]
                    np.testing.assert_array_equal(t.coupled, tree.coupled)
        checked += 1
    assert checked > 0


def test_braid_dense_oracle_all_droppable(symmetry_and_pool, np_random):
    """Braid coefficients against the swap-gate contraction of dense trees.

    Reference: test_trees.py:124-132. Extends the single-case oracle in
    test_trees.py to every droppable symmetry, both chiralities, all positions.
    """
    symmetry, pool = symmetry_and_pool
    if not symmetry.can_be_dropped:
        pytest.skip('no dense representation')
    if symmetry.braiding_style == sym.BraidingStyle.no_braiding:
        pytest.skip('no braiding')
    checked = 0
    for _ in range(10):
        if checked >= 4:
            break
        tree = _random_tree(symmetry, pool, np_random, n_unc=4)
        if tree is None:
            continue
        tree_np = tree.as_block().astype(complex)
        J = tree.num_uncoupled
        for j in (0, 1, 2):
            swap = symmetry.swap_gate(tree.uncoupled[j], tree.uncoupled[j + 1])
            # swap axes [b, a, b*, a*]: contract (aj, aj+1) with (a*, b*)
            expect = np.tensordot(tree_np, swap, ([j, j + 1], [3, 2]))
            # [a1 .. aj-1 aj+2 .. c b a] -> restore positions j, j+1 as (b, a)
            perm = list(range(j)) + [J - 1, J] + list(range(j, J - 1))
            expect = np.transpose(expect, perm)
            for over in (True, False):
                out = tree.braid(j, overbraid=over)
                res = sum(c * t.as_block().astype(complex)
                          for t, c in out.items())
                if symmetry.has_symmetric_braid:
                    np.testing.assert_allclose(res, expect, atol=1e-10)
                else:
                    pytest.skip('swap gate is chirality-free only for '
                                'symmetric braiding')
        checked += 1
    assert checked > 0


def test_split_insert_roundtrip(symmetry_and_pool, np_random):
    """split(n) followed by insert is the identity. Reference: test_trees.py:234."""
    symmetry, pool = symmetry_and_pool
    checked = 0
    for _ in range(10):
        tree = _random_tree(symmetry, pool, np_random, n_unc=4)
        if tree is None:
            continue
        for n in (2, 3):
            t1, t2 = tree.split(n)
            t1.test_sanity()
            t2.test_sanity()
            np.testing.assert_array_equal(t1.coupled, t2.uncoupled[0])
            back = t2.insert(t1)
            back.test_sanity()
            assert back == tree
        checked += 1
    assert checked > 0


def test_insert_at_dense_oracle(symmetry_and_pool, np_random):
    """insert_at coefficients realize the dense composition of the two trees.

    Reference: test_trees.py:234-470 (manipulations battery, F-move part).
    """
    symmetry, pool = symmetry_and_pool
    if not symmetry.can_be_dropped:
        pytest.skip('no dense representation')
    checked = 0
    for _ in range(20):
        if checked >= 5:
            break
        t1 = _random_tree(symmetry, pool, np_random, n_unc=3, no_dual=True)
        if t1 is None:
            continue
        n = int(np_random.integers(t1.num_uncoupled))
        # build t2 fusing to t1.uncoupled[n]
        unc2, _, _ = random_setup(symmetry, pool, np_random, n_unc=2)
        trees2 = list(fusion_trees(symmetry, unc2, t1.uncoupled[n],
                                   np.zeros(2, bool)))
        if not trees2:
            continue
        t2 = trees2[np_random.integers(len(trees2))]
        out = t1.insert_at(n, t2)
        res = sum(c * t.as_block().astype(complex) for t, c in out.items())
        # dense composition: contract t2's coupled axis into t1's axis n
        t1_np = t1.as_block().astype(complex)  # [a1 .. aJ c]
        t2_np = t2.as_block().astype(complex)  # [b1 b2 an]
        expect = np.tensordot(t2_np, t1_np, (2, n))  # [b1 b2 a_other.. c]
        J = t1.num_uncoupled
        # restore order [a1 .. an-1 b1 b2 an+1 .. aJ c]
        perm = list(range(2, 2 + n)) + [0, 1] + list(range(2 + n, J + 2))
        expect = np.transpose(expect, perm)
        np.testing.assert_allclose(res, expect, atol=1e-10)
        checked += 1
    assert checked > 0


def test_outer_dense_oracle(symmetry_and_pool, np_random):
    """outer realizes fusing two trees' coupled sectors, per coupled channel.

    Reference: test_trees.py:234-470 (outer part).
    """
    symmetry, pool = symmetry_and_pool
    if not symmetry.can_be_dropped:
        pytest.skip('no dense representation')
    checked = 0
    for _ in range(20):
        if checked >= 4:
            break
        t1 = _random_tree(symmetry, pool, np_random, n_unc=2, no_dual=True)
        t2 = _random_tree(symmetry, pool, np_random, n_unc=2, no_dual=True)
        if t1 is None or t2 is None:
            continue
        out = t1.outer(t2)
        t1_np = t1.as_block().astype(complex)  # [a1 a2 c1]
        t2_np = t2.as_block().astype(complex)  # [b1 b2 c2]
        pair = np.tensordot(t1_np, t2_np, axes=0)  # [a1 a2 c1 b1 b2 c2]
        pair = np.transpose(pair, [0, 1, 3, 4, 2, 5])  # [a1 a2 b1 b2 c1 c2]
        for c in symmetry.fusion_outcomes(t1.coupled, t2.coupled):
            expect = 0.
            for m in range(symmetry.n_symbol(t1.coupled, t2.coupled, c)):
                X = symmetry.fusion_tensor(t1.coupled, t2.coupled, c)[m]
                expect = expect + np.tensordot(pair, X, ([4, 5], [0, 1]))
            res = sum(coeff * t.as_block().astype(complex)
                      for t, coeff in out.items()
                      if np.all(t.coupled == c))
            if isinstance(res, (int, float)) and res == 0:
                np.testing.assert_allclose(expect, 0, atol=1e-10)
            else:
                np.testing.assert_allclose(res, expect, atol=1e-10)
        checked += 1
    assert checked > 0


def test_twist_inverse(symmetry_and_pool, np_random):
    """Overtwist then undertwist on the same legs is the identity."""
    symmetry, pool = symmetry_and_pool
    if symmetry.braiding_style == sym.BraidingStyle.no_braiding:
        pytest.skip('no braiding')
    checked = 0
    for _ in range(10):
        tree = _random_tree(symmetry, pool, np_random, n_unc=3)
        if tree is None:
            continue
        for idcs in ([0], [1], [0, 1], [0, 1, 2]):
            acc: dict = {}
            for t1, c1 in tree.twist(idcs, overtwist=True).items():
                for t2, c2 in t1.twist(idcs, overtwist=False).items():
                    acc[t2] = acc.get(t2, 0) + c1 * c2
            for t, c in acc.items():
                expect = 1. if t == tree else 0.
                np.testing.assert_allclose(c, expect, atol=1e-10)
        checked += 1
    assert checked > 0


def _twist_matrix(trees, idcs, overtwist=True):
    idx = {t: i for i, t in enumerate(trees)}
    M = np.zeros((len(trees), len(trees)), complex)
    for t in trees:
        for t2, c in t.twist(idcs, overtwist).items():
            M[idx[t2], idx[t]] = c
    return M


@pytest.mark.parametrize('idcs', [[1, 2], [2, 3], [1, 3], [0, 2], [0, 1, 3],
                                  [0, 2, 3], [1, 2, 3]])
def test_general_twist_fibonacci(idcs):
    """Joint twists of mid-segments and non-contiguous leg sets (the
    reference raises NotImplementedError for both, reference
    symmetries/trees.py:1090-1099).

    Oracle: the joint twist of a leg subset is conjugate to the twist of the
    subset fused into one bundle, so its SPECTRUM is {theta_d} over the
    fusion channels d of the subset — independent of any routing convention.
    Also checks unitarity and that undertwist is the exact adjoint."""
    fib = sym.fibonacci_anyon_category
    tau = np.array([1])
    one = np.array([0])
    trees = list(fusion_trees(fib, [tau] * 4, one))
    M = _twist_matrix(trees, idcs)
    np.testing.assert_allclose(M @ M.conj().T, np.eye(len(trees)), atol=1e-10)
    np.testing.assert_allclose(_twist_matrix(trees, idcs, False), M.conj().T,
                               atol=1e-10)
    theta_tau = np.exp(4j * np.pi / 5)
    ev = {complex(np.round(v, 8)) for v in np.linalg.eigvals(M)}
    if len(idcs) == 2:  # tau x tau = 1 + tau -> {1, theta_tau}
        assert ev == {1. + 0j, complex(np.round(theta_tau, 8))}
    else:  # three of four taus with vacuum total must fuse to tau
        assert ev == {complex(np.round(theta_tau, 8))}


@pytest.mark.parametrize('idcs', [[1, 2], [1, 3], [0, 2]])
def test_general_twist_ising(idcs):
    """Same oracle on Ising sigma strands: sigma x sigma = 1 + psi gives
    twist spectrum {+1, -1}."""
    ising = sym.ising_anyon_category
    sig = np.array([1])
    vac = np.array([0])
    trees = list(fusion_trees(ising, [sig] * 4, vac))
    M = _twist_matrix(trees, idcs)
    np.testing.assert_allclose(M @ M.conj().T, np.eye(len(trees)), atol=1e-10)
    np.testing.assert_allclose(_twist_matrix(trees, idcs, False), M.conj().T,
                               atol=1e-10)
    ev = {complex(np.round(v, 8)) for v in np.linalg.eigvals(M)}
    assert ev == {1. + 0j, -1. + 0j}


def test_general_twist_reduces_to_special_cases(np_random):
    """Segment/gathered paths agree with the diagonal special cases where
    both apply (single leg; prefix via the gathered machinery)."""
    fib = sym.fibonacci_anyon_category
    tau = np.array([1])
    trees = list(fusion_trees(fib, [tau] * 4, tau))
    for tree in trees:
        # single leg via the segment machinery == diagonal single twist
        seg = tree._twist_segment(2, 3, True)
        single = tree.twist([2], True)
        assert set(seg) == set(single)
        for t in seg:
            np.testing.assert_allclose(complex(seg[t]), complex(single[t]),
                                       atol=1e-10)


@pytest.mark.parametrize('idcs', [[1, 2], [1, 3], [0, 2]])
def test_general_twist_su3_3_multiplicities(idcs):
    """General twists on the multiplicity-rich SU(3)_3 category (N(1,1->1)=2
    — the C-moves inside the block-braiding carry real multiplicity labels,
    which Fibonacci/Ising never exercise): unitary, undertwist = adjoint,
    and the spectrum is {theta_d} over the pair's fusion channels."""
    s = sym.SU3_3AnyonCategory().as_Symmetry()
    one = np.array([1])
    trees = list(fusion_trees(s, [one] * 4, one))
    assert len(trees) == 20
    M = _twist_matrix(trees, idcs)
    np.testing.assert_allclose(M @ M.conj().T, np.eye(len(trees)), atol=1e-10)
    np.testing.assert_allclose(_twist_matrix(trees, idcs, False), M.conj().T,
                               atol=1e-10)
    ev = {complex(np.round(v, 8)) for v in np.linalg.eigvals(M)}
    # 1 x 1 -> 0 + 2*1 + 2 + 3: the joint twist's spectrum is exactly the
    # twists of those channels
    expect = {complex(np.round(complex(s.topological_twist(np.array([c]))), 8))
              for c in (0, 1, 2, 3)}
    assert ev <= expect
    assert len(ev) >= 2  # distinct channels appear (SU(3)_3 twists are +-1)
