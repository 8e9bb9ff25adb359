"""Amplitude-level braiding oracle: anyonic ops compared against the REFERENCE.

Anyonic tensors have no dense representation, so per-op testing cannot use the
dense-numpy oracle. Here we use the reference implementation itself: tensors are
built with identical sector-block data on both sides (``from_sector_block_func``
with a seeded generator), the same op is applied with identical arguments, and the
per-coupled-sector blocks are compared entry by entry. This pins the absolute
chirality conventions (codomain vs domain braids, bends, twists) that
convention-independent identities (R2, Yang-Baxter, link invariants) cannot see —
it is what caught the domain-braid chirality inversion fixed in
backends/tree_moves.py (see the module docstring there).

Block layouts agree because both implementations use the same storage spec
(reference fusion_tree_backend.py:1-78): one matrix per coupled sector, rows/cols
enumerated by (uncoupled sectors, tree) in fusion_trees order x multiplicities.
"""

import sys
import types

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import symmetries as sym


@pytest.fixture(scope='module')
def ref():
    try:
        if 'cyten' not in sys.modules:
            sys.path.insert(0, '/root/reference')
            core = types.ModuleType('cyten._core')
            core.add = lambda i, j: i + j
            core.__all__ = ['add']
            sys.modules['cyten._core'] = core
        import cyten

        return cyten
    except Exception as e:  # pragma: no cover
        pytest.skip(f'reference unavailable: {e}')


_THEORIES = {
    'Fibonacci': ('fibonacci_anyon_category', [[0], [1]], [1, 2]),
    'Ising': ('ising_anyon_category', [[0], [1], [2]], [2, 1, 1]),
    # SU(3)_3 has fusion multiplicity N(8,8->8) = 2: pins the multiplicity
    # label enumeration inside tree bases, which Fib/Ising cannot see
    'SU3_3': ('SU3_3', [[0], [1]], [1, 1]),
}


@pytest.fixture(params=list(_THEORIES), ids=list(_THEORIES))
def pair_setup(request, ref, np_random):
    name, sectors, mults = _THEORIES[request.param]
    if name == 'SU3_3':
        s = sym.SU3_3AnyonCategory().as_Symmetry()
        rs = ref.symmetries.Symmetry([ref.symmetries.SU3_3AnyonCategory()])
    else:
        s = getattr(sym, name)
        rs = getattr(ref, name)
    V = ct.ElementarySpace(s, sectors, mults)
    rV = ref.ElementarySpace(rs, sectors, mults)
    be = ct.get_backend(s, block_backend='numpy')
    rbe = ref.get_backend(rs, block_backend='numpy')

    def make(n_cod, n_dom, seed=0):
        def f(shape, coupled):
            r = np.random.default_rng(
                (seed, int(np.sum(np.asarray(coupled))), *shape))
            return r.standard_normal(shape) + 1j * r.standard_normal(shape)

        T = ct.SymmetricTensor.from_sector_block_func(
            f, [V] * n_cod, [V] * n_dom, backend=be)
        rT = ref.SymmetricTensor.from_sector_block_func(
            f, codomain=[rV] * n_cod, domain=[rV] * n_dom, backend=rbe)
        assert_same_blocks(T, rT)  # construction itself must agree
        return T, rT

    return make


def blocks_dict(t):
    out = {}
    for bi, b in zip(t.data.block_inds, t.data.blocks):
        c = t.codomain.sector_decomposition[bi[0]]
        out[tuple(int(x) for x in c)] = np.asarray(b)
    return out


def assert_same_blocks(mine, theirs, atol=1e-12, msg=''):
    dm, dr = blocks_dict(mine), blocks_dict(theirs)
    # zero blocks may be pruned on either side
    for k in set(dm) | set(dr):
        a = dm.get(k)
        b = dr.get(k)
        if a is None:
            assert np.allclose(b, 0, atol=atol), (msg, k)
        elif b is None:
            assert np.allclose(a, 0, atol=atol), (msg, k)
        else:
            assert a.shape == b.shape, (msg, k, a.shape, b.shape)
            np.testing.assert_allclose(a, b, atol=atol, err_msg=f'{msg} {k}')


def test_elementary_braids_vs_reference(ref, pair_setup):
    """Adjacent swaps in codomain and domain, both chiralities."""
    for lv in ([0, 1, 2], [1, 0, 2], [2, 0, 1]):
        T, rT = pair_setup(2, 1)
        mine = ct.permute_legs(T, codomain=[1, 0], domain=[2], levels=lv)
        theirs = ref.permute_legs(rT, codomain=[1, 0], domain=[2], levels=lv)
        assert_same_blocks(mine, theirs, msg=f'cod swap {lv}')
    for lv in ([0, 1, 2], [0, 2, 1], [2, 1, 0]):
        T, rT = pair_setup(1, 2)
        # domain arg in factor order; current factor order is [2, 1] -> swap
        mine = ct.permute_legs(T, codomain=[0], domain=[1, 2], levels=lv)
        theirs = ref.permute_legs(rT, codomain=[0], domain=[1, 2], levels=lv)
        assert_same_blocks(mine, theirs, msg=f'dom swap {lv}')


def test_bends_vs_reference(ref, pair_setup):
    for n_cod, n_dom, new_K in [(2, 1, 1), (2, 1, 3), (1, 2, 2), (1, 2, 0),
                                (2, 2, 4), (2, 2, 0)]:
        T, rT = pair_setup(n_cod, n_dom)
        mine = ct.bend_legs(T, num_codomain_legs=new_K)
        theirs = ref.bend_legs(rT, num_codomain_legs=new_K)
        assert_same_blocks(mine, theirs, msg=f'bend {n_cod}+{n_dom}->{new_K}')


def test_random_permutations_vs_reference(ref, pair_setup, np_random):
    """Full permute_legs with braids AND bends, random levels, bend_right."""
    T, rT = pair_setup(2, 2)
    n = 4
    for trial in range(8):
        perm = list(int(x) for x in np_random.permutation(n))
        k = int(np_random.integers(n + 1))
        levels = list(int(x) for x in np_random.permutation(n))
        cod, dom = perm[:k], perm[k:][::-1]
        mine = ct.permute_legs(T, codomain=cod, domain=dom, levels=levels,
                               bend_right=True)
        theirs = ref.permute_legs(rT, codomain=cod, domain=dom, levels=levels,
                                  bend_right=True)
        assert_same_blocks(mine, theirs, msg=f'perm {perm} k={k} lv={levels}')


def test_transpose_and_twist_vs_reference(ref, pair_setup):
    T, rT = pair_setup(2, 2)
    assert_same_blocks(ct.transpose(T), ref.transpose(rT), msg='transpose')
    assert_same_blocks(ct.dagger(T), ref.dagger(rT), msg='dagger')


def test_compose_outer_vs_reference(ref, pair_setup, request):
    T, rT = pair_setup(2, 2)
    S, rS = pair_setup(2, 1, seed=1)
    # compose: T.domain == S.codomain (identical legs by construction)
    assert_same_blocks(ct.compose(T, S), ref.compose(rT, rS), msg='compose')
    if 'SU3_3' in request.node.name:
        # DOCUMENTED DEVIATION: the reference's backend `outer` pairs the
        # codomain- and domain-side embedding multiplicities independently
        # (fusion_tree_backend.py:1604-1631 sums each side over m), which is
        # wrong for fusion multiplicity N > 1: its outer(eye, eye) != eye.
        # Ours contracts the embedding label and passes the SU(3) dense oracle
        # (test_outer_multiplicity_dense_oracle) plus the functoriality laws
        # below; the reference's own suite never runs a multiplicity-rich
        # symmetry through outer (SUN needs external data files, SU3_3 is not
        # in its tensor fixture matrix).
        eye1 = ref.SymmetricTensor.from_eye([rT.codomain.factors[0]],
                                            backend=rT.backend)
        ref_outer_eye = ref.outer(eye1, eye1)
        eye2 = ref.SymmetricTensor.from_eye(
            [rT.codomain.factors[0]] * 2, backend=rT.backend)
        assert float(ref.norm(ref_outer_eye + (-1.) * eye2)) > 1.  # ref bug
        # ours: outer(eye, eye) == eye exactly
        m_eye1 = ct.SymmetricTensor.from_eye([T.codomain.factors[0]],
                                             backend=T.backend)
        m_eye2 = ct.SymmetricTensor.from_eye([T.codomain.factors[0]] * 2,
                                             backend=T.backend)
        assert float(ct.norm(ct.outer(m_eye1, m_eye1) + (-1.) * m_eye2)) < 1e-12
        # and the monoidal interchange law: (A(x)B) o (C(x)D) = (AoC) (x) (BoD)
        A, _ = pair_setup(2, 1, seed=2)
        B, _ = pair_setup(2, 1, seed=3)
        C, _ = pair_setup(1, 2, seed=4)
        D, _ = pair_setup(1, 2, seed=5)
        lhs = ct.compose(ct.outer(A, B), ct.outer(C, D))
        rhs = ct.outer(ct.compose(A, C), ct.compose(B, D))
        assert float(ct.norm(lhs + (-1.) * rhs.set_labels(lhs.labels))) \
            < 1e-10 * float(ct.norm(lhs))
    else:
        assert_same_blocks(ct.outer(S, S), ref.outer(rS, rS), msg='outer')


def test_svd_singular_values_vs_reference(ref, pair_setup):
    """U/Vh have per-sector gauge freedom; the singular values are unique."""
    T, rT = pair_setup(2, 2)
    _, s_mine, _ = ct.svd(T)
    _, s_ref, _ = ref.svd(rT)
    dm = {tuple(map(int, s_mine.leg.sector_decomposition[int(i)])):
          np.sort(np.asarray(b)) for i, b in zip(s_mine.data.block_inds,
                                                 s_mine.data.blocks)}
    dr = {tuple(map(int, s_ref.leg.sector_decomposition[int(i[0])])):
          np.sort(np.asarray(b)) for i, b in zip(np.atleast_2d(s_ref.data.block_inds),
                                                 s_ref.data.blocks)}
    assert set(dm) == set(dr)
    for k in dm:
        np.testing.assert_allclose(dm[k], dr[k], atol=1e-12, err_msg=str(k))


def test_scale_axis_vs_reference(ref, pair_setup):
    T, rT = pair_setup(2, 2)

    def f(shape, coupled):
        r = np.random.default_rng((7, int(np.sum(np.asarray(coupled))), *shape))
        return r.standard_normal(shape)

    leg = T.codomain.factors[1]
    rleg = rT.codomain.factors[1]
    d = ct.DiagonalTensor.from_sector_block_func(f, leg, backend=T.backend)
    rd = ref.DiagonalTensor.from_sector_block_func(f, rleg, backend=rT.backend)
    for i in (0, 1, 2, 3):
        assert_same_blocks(ct.scale_axis(T, d, i), ref.scale_axis(rT, rd, i),
                           msg=f'scale_axis leg {i}')


def test_partial_trace_vs_reference(ref, pair_setup):
    """Crossing trace pairs with levels; nested pairs without."""
    T, rT = pair_setup(2, 2)
    # legs [V, V, V*, V*]: (0, 3) and (1, 2) are nested planar pairs
    v = ct.partial_trace(T, (1, 2))
    rv = ref.partial_trace(rT, (1, 2))
    assert_same_blocks(v, rv, msg='nested pair')
    s = ct.partial_trace(T, (0, 3), (1, 2))
    # the reference is more conservative and wants levels here even though the
    # nested configuration is planar (result is levels-independent)
    # (it also wants each pair's two levels adjacent): pair (0,3) -> 0,1;
    # pair (1,2) -> 2,3
    rs = ref.partial_trace(rT, (0, 3), (1, 2), levels=[0, 2, 3, 1])
    assert abs(complex(s) - complex(rs)) < 1e-12 * max(1., abs(complex(rs)))
    # crossing pairs need levels. The reference backend REFUSES them outright
    # ("use permute_legs"); ours resolves them — so compare against the
    # reference's manual route: braid to adjacency, then trace planar pairs.
    # Levels must put each pair's arc in its own height band (pair-adjacent
    # levels), otherwise the braid word is route-ambiguous.
    lv = [0, 2, 1, 3]  # pair (0,2): levels 0,1; pair (1,3): levels 2,3
    s2 = ct.partial_trace(T, (0, 2), (1, 3), levels=lv)
    # swap the two domain legs (same heights) -> the pairs become nested
    rP = ref.permute_legs(rT, codomain=[0, 1], domain=[2, 3], levels=lv)
    rs2 = ref.partial_trace(rP, (0, 3), (1, 2), levels=[0, 2, 3, 1])
    assert abs(complex(s2) - complex(rs2)) < 1e-12 * max(1., abs(complex(rs2)))
