"""Tests for legs, spaces, tensor products and abelian leg pipes."""

from __future__ import annotations

import numpy as np
import pytest

from cyten_tpu import symmetries as sym
from cyten_tpu.symmetries import (
    AbelianLegPipe, ElementarySpace, TensorProduct, swap_gate, twist_gate,
)


def random_space(symmetry, np_random, max_sectors=4, max_mult=3, is_dual=None,
                 sector_pool=None):
    if sector_pool is None:
        if symmetry.num_sectors == np.inf:
            sector_pool = np.arange(-3, 4)[:, None]
            if not symmetry.are_valid_sectors(sector_pool):
                sector_pool = np.arange(0, 5)[:, None]  # e.g. SU(2)
        else:
            sector_pool = symmetry.all_sectors()
    n = np_random.integers(1, min(max_sectors, len(sector_pool)) + 1)
    idx = np_random.choice(len(sector_pool), size=n, replace=False)
    sectors = np.asarray(sector_pool)[idx]
    mults = np_random.integers(1, max_mult + 1, size=n)
    if is_dual is None:
        is_dual = bool(np_random.integers(2))
    return ElementarySpace.from_defining_sectors(symmetry, sectors, mults,
                                                 is_dual=is_dual)


def test_elementary_space_basics(np_random):
    u1 = sym.u1_symmetry
    v = ElementarySpace.from_basis(u1, [[1], [0], [1], [-1], [0]])
    v.test_sanity()
    assert v.dim == 5
    np.testing.assert_array_equal(v.defining_sectors, [[-1], [0], [1]])
    np.testing.assert_array_equal(v.multiplicities, [1, 2, 2])
    # public basis order is preserved
    np.testing.assert_array_equal(v.sectors_of_basis, [[1], [0], [1], [-1], [0]])
    # parse_index consistency
    for i in range(v.dim):
        sector_idx, _ = v.parse_index(i)
        np.testing.assert_array_equal(v.sector_decomposition[sector_idx],
                                      v.sectors_of_basis[i])
    # duality roundtrip
    w = v.dual
    w.test_sanity()
    assert w.is_dual and not v.is_dual
    assert w.dual == v
    assert v.is_isomorphic_to(v.with_opposite_duality().with_opposite_duality())
    # direct sum
    both = v.direct_sum(v)
    assert both.dim == 2 * v.dim
    np.testing.assert_array_equal(both.multiplicities, 2 * v.multiplicities)


def test_take_slice():
    u1 = sym.u1_symmetry
    v = ElementarySpace.from_basis(u1, [[1], [0], [1], [-1], [0]])
    mask = np.array([True, False, True, True, False])
    small = v.take_slice(mask)
    small.test_sanity()
    assert small.dim == 3
    np.testing.assert_array_equal(small.sectors_of_basis, [[1], [1], [-1]])


def test_su2_space():
    su2 = sym.su2_symmetry
    # spin-half: listed per state in from_basis
    v = ElementarySpace.from_basis(su2, [[1], [1]])
    assert v.dim == 2
    np.testing.assert_array_equal(v.multiplicities, [1])
    with pytest.raises(ValueError, match='whole multiplets'):
        ElementarySpace.from_basis(su2, [[1], [1], [1]])
    v2 = ElementarySpace.from_defining_sectors(su2, [[1], [0], [1]])
    assert v2.dim == 5
    np.testing.assert_array_equal(v2.multiplicities, [1, 2])


def test_tensor_product(np_random):
    for symmetry in [sym.u1_symmetry, sym.z4_symmetry, sym.su2_symmetry,
                     sym.fibonacci_anyon_category]:
        spaces = [random_space(symmetry, np_random) for _ in range(3)]
        tp = TensorProduct(spaces)
        tp.test_sanity()
        # quantum dimension is multiplicative
        expect_dim = np.prod([sp.dim for sp in spaces])
        assert abs(tp.dim - expect_dim) < 1e-8 * max(1, expect_dim)
        # dual has dual sectors
        dual = tp.dual
        got = {tuple(s) for s in dual.sector_decomposition}
        expect = {tuple(symmetry.dual_sector(s)) for s in tp.sector_decomposition}
        assert got == expect
        # permuted keeps decomposition
        perm = np_random.permutation(3)
        tp2 = tp.permuted(perm)
        np.testing.assert_array_equal(tp2.sector_decomposition, tp.sector_decomposition)


def test_abelian_leg_pipe(np_random):
    u1 = sym.u1_symmetry
    for _ in range(5):
        legs = [random_space(u1, np_random) for _ in range(np_random.integers(2, 4))]
        cstyle = bool(np_random.integers(2))
        is_dual = bool(np_random.integers(2))
        pipe = AbelianLegPipe(legs, is_dual=is_dual, combine_cstyle=cstyle)
        pipe.test_sanity()
        # pipe is isomorphic to the tensor product
        tp = TensorProduct([l.as_Space() for l in legs])
        assert pipe.as_Space().is_isomorphic_to(tp) or pipe.is_isomorphic_to(tp)
        # dual pipe roundtrip
        dd = pipe.dual.dual
        assert dd == pipe


def test_pipe_basis_perm_consistency():
    """combine then to-dense == to-dense then reshape (the defining property)."""
    u1 = sym.u1_symmetry
    v = ElementarySpace.from_basis(u1, [[1], [0], [-1]])
    w = ElementarySpace.from_basis(u1, [[0], [1]])
    pipe = AbelianLegPipe([v, w], combine_cstyle=True)
    # fused basis element (i, j) -> flat index i * w.dim + j must live in the sector
    # v_sector[i] + w_sector[j]
    sob = pipe.sectors_of_basis
    for i in range(v.dim):
        for j in range(w.dim):
            flat = i * w.dim + j
            expect = v.sectors_of_basis[i] + w.sectors_of_basis[j]
            np.testing.assert_array_equal(sob[flat], expect)


def test_swap_twist_gates():
    # fermionic swap gate gives -1 for odd x odd
    f = sym.fermion_parity
    v = ElementarySpace.from_basis(f, [[0], [1]])
    S = swap_gate(v, v)
    # index (b, a, b*, a*); state 1 is odd
    assert S[1, 1, 1, 1] == -1
    assert S[0, 1, 0, 1] == 1
    assert S[1, 0, 1, 0] == 1
    # swap squared = identity (symmetric braid)
    S2 = np.einsum('baqp,pqcd->abcd', S, S)
    eye = np.einsum('ac,bd->abcd', np.eye(2), np.eye(2))
    np.testing.assert_allclose(S2, eye, atol=1e-14)
    # twist gate
    T = twist_gate(v)
    np.testing.assert_allclose(T, np.diag([1, -1]), atol=1e-14)


def test_largest_common_subspace():
    u1 = sym.u1_symmetry
    a = ElementarySpace.from_defining_sectors(u1, [[0], [1], [2]], [2, 3, 1])
    b = ElementarySpace.from_defining_sectors(u1, [[1], [2], [3]], [1, 5, 2])
    common = ElementarySpace.from_largest_common_subspace(a, b)
    np.testing.assert_array_equal(common.defining_sectors, [[1], [2]])
    np.testing.assert_array_equal(common.multiplicities, [1, 1])
    assert common.is_subspace_of(a) and common.is_subspace_of(b)


def test_hashability(np_random):
    """Spaces are hashable static metadata (for jit aux-data)."""
    u1 = sym.u1_symmetry
    v1 = ElementarySpace.from_defining_sectors(u1, [[0], [1]], [2, 3])
    v2 = ElementarySpace.from_defining_sectors(u1, [[0], [1]], [2, 3])
    assert v1 == v2 and hash(v1) == hash(v2)
    assert hash(v1) != hash(v1.dual)
    tp1 = TensorProduct([v1, v2])
    tp2 = TensorProduct([v2, v1])
    assert hash(tp1) == hash(tp2)
    d = {v1: 'a', tp1: 'b'}
    assert d[v2] == 'a'
