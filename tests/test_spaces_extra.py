"""Extended space/leg batteries ported from the reference's test strategy.

Complements tests/test_spaces.py with the deeper invariants the reference pins
(reference tests/python_tests/test_spaces.py:15-515): duality structure,
is_subspace_of semantics, index parsing, from_basis basis_perm values,
direct-sum bookkeeping, AbelianLegPipe block_ind_map slot layout for both
combine styles, and TensorProduct decompositions vs explicit fusion.
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import symmetries as sym
from cyten_tpu.symmetries import (
    AbelianLegPipe, ElementarySpace, LegPipe, TensorProduct,
)

from test_symmetries import SYMMETRIES, _sectors_pool


@pytest.fixture(params=list(SYMMETRIES), ids=list(SYMMETRIES))
def any_symmetry(request):
    return SYMMETRIES[request.param]


def _sorted_sectors(s, np_random, n=6):
    pool = np.unique(_sectors_pool(s, np_random, max_n=n), axis=0)
    return pool[np.lexsort(pool.T)]


def test_elementary_space_duality_and_equality(any_symmetry, np_random):
    """Reference: test_spaces.py:15-50."""
    s = any_symmetry
    sectors = _sorted_sectors(s, np_random)
    mults = np_random.integers(1, 10, size=len(sectors))
    V = ElementarySpace(s, sectors, mults)
    assert V == V
    Vd = V.dual
    assert V != Vd or np.all(s.dual_sectors(sectors) == sectors)
    np.testing.assert_array_equal(Vd.defining_sectors, V.defining_sectors)
    np.testing.assert_array_equal(
        Vd.sector_decomposition[np.lexsort(Vd.sector_decomposition.T)],
        s.dual_sectors(sectors)[np.lexsort(s.dual_sectors(sectors).T)])
    np.testing.assert_array_equal(Vd.multiplicities, V.multiplicities)
    assert Vd.is_dual
    assert Vd.dual == V
    # inequality on different multiplicities
    wrong = mults.copy()
    wrong[0] += 1
    assert V != ElementarySpace(s, sectors, wrong)
    # triviality
    assert not V.is_trivial or (len(sectors) == 1 and mults[0] == 1
                                and np.all(sectors[0] == s.trivial_sector))
    triv = ElementarySpace(s, s.trivial_sector[None, :])
    assert triv.is_trivial


def test_is_subspace_of(any_symmetry, np_random):
    """Reference: test_spaces.py:59-100."""
    s = any_symmetry
    sectors = _sorted_sectors(s, np_random)
    mults = np_random.integers(2, 10, size=len(sectors))
    V = ElementarySpace(s, sectors, mults)
    assert V.is_subspace_of(V)
    smaller = ElementarySpace(s, sectors, np.maximum(mults - 1, 1))
    assert smaller.is_subspace_of(V)
    assert not V.is_subspace_of(smaller)
    if len(sectors) > 1:
        fewer = ElementarySpace(s, sectors[:1], mults[:1])
        assert fewer.is_subspace_of(V)
        assert not V.is_subspace_of(fewer)
        # one mult larger than V -> not a subspace
        mixed = mults.copy()
        mixed[-1] += 1
        mixed[0] = max(1, mixed[0] - 1)
        assert not ElementarySpace(s, sectors, mixed).is_subspace_of(V)


def test_parse_index_and_sector_lookup(any_symmetry, np_random):
    """Reference: test_spaces.py:105-125 (idx_to_sector / parse_index loops)."""
    s = any_symmetry
    sectors = _sorted_sectors(s, np_random, n=4)
    mults = np_random.integers(1, 4, size=len(sectors))
    V = ElementarySpace(s, sectors, mults)
    for i, sector in enumerate(V.sector_decomposition):
        assert V.sector_decomposition_where(sector) == i
        assert V.sector_multiplicity(sector) == V.multiplicities[i]
    if s.can_be_dropped:
        idx = 0
        for n_sector, sector in enumerate(V.sector_decomposition):
            d = s.sector_dim(sector)
            for m in range(V.multiplicities[n_sector]):
                for mu in range(d):
                    sector_idx, mult_idx = V.parse_index(idx)
                    assert sector_idx == n_sector
                    assert mult_idx == m * d + mu
                    np.testing.assert_array_equal(V.idx_to_sector(idx), sector)
                    idx += 1
        assert idx == V.dim


def test_from_basis_perm_values():
    """from_basis computes the exact internal<->public permutation.

    Reference: test_spaces.py:126-160 — hand-computed basis_perm anchors.
    """
    u1 = ct.u1_symmetry
    #                         0  1  2  3  4  5  6  7  8
    which = np.array([1, 0, 0, 1, 1, 0, 1, 1, 1])
    sectors_of_basis = np.array([[0], [1]])[which.tolist()]
    V = ElementarySpace.from_basis(u1, sectors_of_basis)
    np.testing.assert_array_equal(V.sector_decomposition, [[0], [1]])
    np.testing.assert_array_equal(V.multiplicities, [3, 6])
    np.testing.assert_array_equal(V.basis_perm, [1, 2, 5, 0, 3, 4, 6, 7, 8])
    np.testing.assert_array_equal(V.sectors_of_basis, sectors_of_basis)
    # SU(2): sectors must come in whole multiplets
    su2 = ct.su2_symmetry
    with pytest.raises(ValueError):
        ElementarySpace.from_basis(su2, np.array([0, 1, 1, 1, 2, 2, 2])[:, None])
    # spins 0, 1/2, 1 each twice, shuffled. NOTE: within a sector the internal
    # layout is STATE-major (index = state*mult + mult_idx, docs/DESIGN.md §5),
    # unlike the reference's multiplet-major layout — the expected perm differs
    # from the reference anchor accordingly.
    sob = np.array([0, 2, 2, 1, 2, 1, 2, 2, 0, 2, 1, 1])[:, None]
    W = ElementarySpace.from_basis(su2, sob)
    np.testing.assert_array_equal(W.sector_decomposition, [[0], [1], [2]])
    np.testing.assert_array_equal(W.multiplicities, [2, 2, 2])
    np.testing.assert_array_equal(W.basis_perm,
                                  [0, 8, 3, 10, 5, 11, 1, 6, 2, 7, 4, 9])


def test_direct_sum_bookkeeping(any_symmetry, np_random):
    """Reference: test_spaces.py:487-515."""
    s = any_symmetry
    sectors = _sorted_sectors(s, np_random)
    m1 = np_random.integers(1, 5, size=len(sectors))
    m2 = np_random.integers(1, 5, size=len(sectors))
    V1 = ElementarySpace(s, sectors, m1)
    V2 = ElementarySpace(s, sectors, m2)
    W = V1.direct_sum(V2)
    np.testing.assert_allclose(W.dim, V1.dim + V2.dim, rtol=1e-14)
    np.testing.assert_array_equal(W.multiplicities, m1 + m2)
    # dual spaces sum consistently
    Wd = V1.dual.direct_sum(V2.dual)
    assert Wd.is_dual
    np.testing.assert_allclose(Wd.dim, W.dim, rtol=1e-14)
    np.testing.assert_array_equal(np.sort(Wd.multiplicities),
                                  np.sort(W.multiplicities))


def test_tensor_product_decomposition(any_symmetry, np_random):
    """TensorProduct sector decomposition == explicit fusion of all pairs.

    Reference: test_spaces.py:302-388.
    """
    s = any_symmetry
    sectors = _sorted_sectors(s, np_random, n=3)
    m1 = np_random.integers(1, 3, size=len(sectors))
    m2 = np_random.integers(1, 3, size=len(sectors))
    V1 = ElementarySpace(s, sectors, m1)
    V2 = ElementarySpace(s, sectors, m2)
    tp = TensorProduct([V1, V2])
    # oracle: accumulate fusion multiplicities by hand
    expect: dict = {}
    for a, ma in zip(V1.sector_decomposition, V1.multiplicities):
        for b, mb in zip(V2.sector_decomposition, V2.multiplicities):
            for c in s.fusion_outcomes(a, b):
                n = s.n_symbol(a, b, c)
                key = tuple(int(x) for x in c)
                expect[key] = expect.get(key, 0) + n * int(ma) * int(mb)
    got = {tuple(int(x) for x in c): int(m)
           for c, m in zip(tp.sector_decomposition, tp.multiplicities)}
    assert got == expect
    # total (quantum) dimension is multiplicative
    dim_tp = sum(s.qdim(np.asarray(c)) * m for c, m in got.items())
    np.testing.assert_allclose(
        dim_tp,
        sum(s.qdim(a) * int(m) for a, m in zip(V1.sector_decomposition, m1))
        * sum(s.qdim(a) * int(m) for a, m in zip(V2.sector_decomposition, m2)),
        rtol=1e-10)


@pytest.mark.parametrize('cstyle', [True, False])
@pytest.mark.parametrize('pipe_dual', [True, False])
def test_abelian_leg_pipe_block_ind_map(cstyle, pipe_dual, np_random):
    """AbelianLegPipe bookkeeping invariants (reference test_spaces.py:390-485
    and Appendix A.3): every constituent sector combination occupies exactly
    one slot ``b_start:b_end`` inside its coupled block J, slots tile each
    block, and slot sizes are products of constituent multiplicities.
    """
    u1 = ct.u1_symmetry
    legs = [ElementarySpace(u1, [[-1], [0], [2]], np_random.integers(1, 4, 3)),
            ElementarySpace(u1, [[0], [1]], np_random.integers(1, 4, 2)).dual,
            ElementarySpace(u1, [[-2], [0], [1]], np_random.integers(1, 4, 3))]
    pipe = AbelianLegPipe(legs, is_dual=pipe_dual, combine_cstyle=cstyle)
    pipe.test_sanity()
    bim = pipe.block_ind_map
    # columns: [b_start, b_end, i_1 .. i_nlegs, J]
    assert bim.shape[1] == 2 + len(legs) + 1
    n_combinations = np.prod([l.num_sectors for l in legs])
    assert bim.shape[0] == n_combinations
    covered = {}
    for row in bim:
        b_start, b_end, *idcs, J = (int(x) for x in row)
        size = np.prod([int(l.multiplicities[i]) for l, i in zip(legs, idcs)])
        assert b_end - b_start == size
        covered.setdefault(J, []).append((b_start, b_end))
        # the fused sector of this combination is the pipe sector J
        # (sector_decomposition is in fusion-outcome terms regardless of duality)
        fused = sum(l.sector_decomposition[i][0] for l, i in zip(legs, idcs))
        assert fused == pipe.sector_decomposition[J][0]
    # slots tile each coupled block exactly
    for J, slots in covered.items():
        slots = sorted(slots)
        assert slots[0][0] == 0
        for (a1, b1), (a2, b2) in zip(slots, slots[1:]):
            assert b1 == a2, 'slots must tile without gaps/overlaps'
        assert slots[-1][1] == pipe.multiplicities[J]


def test_pipe_as_elementary_roundtrip(any_symmetry, np_random):
    """LegPipe -> ElementarySpace agrees with the TensorProduct decomposition."""
    s = any_symmetry
    sectors = _sorted_sectors(s, np_random, n=3)
    V = ElementarySpace(s, sectors, np_random.integers(1, 3, size=len(sectors)))
    backend = ct.get_backend(s, 'numpy')
    pipe = backend.make_pipe([V, V.dual], is_dual=False)
    es = pipe.as_ElementarySpace()
    tp = TensorProduct([V, V.dual])
    got = {tuple(map(int, c)): int(m)
           for c, m in zip(es.sector_decomposition, es.multiplicities)}
    expect = {tuple(map(int, c)): int(m)
              for c, m in zip(tp.sector_decomposition, tp.multiplicities)}
    assert got == expect


def test_take_slice_basis_perm(any_symmetry, np_random):
    """take_slice with a permuted basis (reference test_spaces.py:207-246).

    Pins the contract used by masks: the small leg keeps the relative public
    basis order of the large leg, and multiplets are kept/dropped as wholes.
    """
    s = any_symmetry
    if not s.can_be_dropped:
        secs = _sorted_sectors(s, np_random, n=2)
        space = ElementarySpace(s, secs, np.ones(len(secs), int))
        with pytest.raises(sym.SymmetryError):
            space.take_slice([True])
        return
    sectors = _sorted_sectors(s, np_random, n=3)
    mults = np_random.integers(1, 4, size=len(sectors))
    dim = int(np.sum([s.sector_dim(a) * m for a, m in zip(sectors, mults)]))
    basis_perm = np_random.permutation(dim)
    space = ElementarySpace(s, sectors, mults, basis_perm=basis_perm)

    # build a legal mask in internal order: keep/drop whole multiplets
    keep_states = []
    illegal = []
    for sect, mult in zip(sectors, mults):
        d = int(s.sector_dim(sect))
        keeps = np_random.choice([True, False], size=mult)
        # state-major internal layout: d blocks of length mult
        keep_states.extend(list(keeps) * d)
        bad = list(keeps) * (d - 1) + list(~keeps) if d > 1 else list(keeps)
        illegal.extend(bad)
    mask = np.array(keep_states)[space.inverse_basis_perm]
    if not mask.any():
        mask[:] = True
    small = space.take_slice(mask)
    small.test_sanity()

    # kept basis states keep their sectors, in public order
    np.testing.assert_array_equal(small.sectors_of_basis,
                                  space.sectors_of_basis[mask])
    # commuting diagram (reference spaces.py:1398-1421): public-mask then
    # small perm == large perm then internal mask
    internal_mask = mask[space.basis_perm]
    x = np.arange(space.dim)
    np.testing.assert_array_equal(x[mask][small.basis_perm],
                                  x[space.basis_perm][internal_mask])

    if any(int(s.sector_dim(a)) > 1 for a in sectors):
        illegal_mask = np.array(illegal)[space.inverse_basis_perm]
        if illegal_mask.any() and not illegal_mask.all():
            with pytest.raises(ValueError):
                space.take_slice(illegal_mask)
