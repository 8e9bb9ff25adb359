"""Tests for the fusion-tree backend: SU(2), fermions, anyons.

Oracles: dense numpy conversion for droppable symmetries (SU(2), U(1) forced through
the fusion-tree backend), categorical identities (rotation roundtrips, double
transpose, Yang-Baxter) for anyons, and the MPSKit.jl golden-chain energies as the
end-to-end anyonic benchmark (BASELINE.md).
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import ElementarySpace, SymmetricTensor
from cyten_tpu import fibonacci_anyon_category as fib
from cyten_tpu import su2_symmetry, u1_symmetry


@pytest.fixture(params=['u1', 'su2'])
def droppable_setup(request, np_random):
    if request.param == 'u1':
        be = ct.get_backend(u1_symmetry, symmetry_backend='fusion_tree',
                            block_backend='numpy')
        V = ElementarySpace(u1_symmetry, [[-1], [0], [1]], [1, 2, 1])
        W = ElementarySpace(u1_symmetry, [[0], [1]], [2, 1])
    else:
        be = ct.get_backend(su2_symmetry, block_backend='numpy')
        V = ElementarySpace(su2_symmetry, [[0], [1], [2]], [2, 2, 1])
        W = ElementarySpace(su2_symmetry, [[1]])
    A = SymmetricTensor.from_random_normal([V, W], [V, W], backend=be,
                                           labels=['a', 'b', 'c', 'd'], rng=np_random)
    return A


def test_roundtrip_compose_dagger(droppable_setup):
    A = droppable_setup
    A.test_sanity()
    arr = A.to_numpy()
    A2 = SymmetricTensor.from_dense_block(arr, list(A.codomain.factors),
                                          list(A.domain.factors), backend=A.backend)
    np.testing.assert_allclose(A2.to_numpy(), arr, rtol=1e-10, atol=1e-10)
    D = ct.dagger(A)
    D.test_sanity()
    np.testing.assert_allclose(D.to_numpy(), arr.conj().transpose(3, 2, 1, 0),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(ct.norm(A), np.linalg.norm(arr.reshape(-1)),
                               rtol=1e-10)


@pytest.mark.parametrize('cod', [[0, 3], [1, 0], [0, 1, 2, 3], [2], [3, 1],
                                 [1, 2, 3, 0], [3, 0, 1, 2], [3, 0], [2, 3], []])
def test_permute_vs_dense(droppable_setup, cod):
    A = droppable_setup
    arr = A.to_numpy()
    dom = [i for i in reversed(range(4)) if i not in cod]
    P = ct.permute_legs(A, codomain=cod, domain=dom)
    P.test_sanity()
    perm = list(cod) + dom[::-1]
    np.testing.assert_allclose(P.to_numpy(), arr.transpose(perm), rtol=1e-9,
                               atol=1e-9)


def test_svd_fusion_tree(droppable_setup):
    A = droppable_setup
    U, S, Vh = ct.svd(A)
    U.test_sanity(), S.test_sanity(), Vh.test_sanity()
    rec = ct.compose(ct.compose(U, S.as_SymmetricTensor()), Vh)
    assert ct.norm(rec - A) < 1e-10 * ct.norm(A)
    np.testing.assert_allclose(ct.norm(S), ct.norm(A), rtol=1e-10)


def test_anyon_identities(np_random):
    be = ct.get_backend(fib, block_backend='numpy')
    tau = ElementarySpace(fib, [[1]])
    V = ElementarySpace(fib, [[0], [1]], [2, 2])
    A = SymmetricTensor.from_random_normal([V, tau], [V, tau], backend=be,
                                           labels=['a', 'b', 'c', 'd'],
                                           rng=np_random)
    nA = ct.norm(A)
    # rotation roundtrips (planar moves incl. left bends with twists)
    R = ct.permute_legs(A, codomain=[1, 2, 3], domain=[0])
    assert abs(ct.norm(R) - nA) < 1e-12  # planar moves are isometric
    R2 = ct.permute_legs(R, codomain=[3, 0], domain=[2, 1])
    assert ct.norm(R2 - A) < 1e-12 * nA
    L = ct.permute_legs(A, codomain=[3, 0], domain=[2, 1])
    L2 = ct.permute_legs(L, codomain=[1, 2], domain=[0, 3])
    assert ct.norm(L2 - A) < 1e-12 * nA
    # double transpose
    T2 = ct.transpose(ct.transpose(A))
    assert ct.norm(T2 - A) < 1e-12 * nA
    # bend roundtrip
    B2 = ct.bend_legs(ct.bend_legs(A, num_codomain_legs=4), num_codomain_legs=2)
    assert ct.norm(B2 - A) < 1e-12 * nA
    # dagger is an antilinear isometry
    assert abs(ct.norm(ct.dagger(A)) - nA) < 1e-12


def test_fermion_backend(np_random):
    sym = ct.fermion_parity
    be = ct.get_backend(sym, block_backend='numpy')
    assert type(be).__name__ == 'FusionTreeBackend'
    V = ElementarySpace(sym, [[0], [1]], [2, 2])
    A = SymmetricTensor.from_random_normal([V, V], [V], backend=be, rng=np_random)
    A.test_sanity()
    # roundtrip through dense (fermionic tensors are droppable)
    arr = A.to_numpy()
    A2 = SymmetricTensor.from_dense_block(arr, [V, V], [V], backend=be)
    np.testing.assert_allclose(A2.to_numpy(), arr, rtol=1e-10, atol=1e-10)
    # braiding two fermionic legs gives signs: permute then permute back == id
    P = ct.permute_legs(A, codomain=[1, 0], domain=[2])
    P2 = ct.permute_legs(P, codomain=[1, 0], domain=[2])
    assert ct.norm(P2 - A) < 1e-12 * ct.norm(A)


@pytest.mark.slow
def test_golden_chain_dmrg():
    """The anyonic end-to-end benchmark: energies from MPSKit.jl (BASELINE.md)."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import GoldenChainModel

    L = 6
    m = GoldenChainModel(L=L, J=1., block_backend='numpy')
    psi = SimpleMPS.from_fusion_pairs(m.site_leg, L, backend=m.backend)
    E = DMRGEngine(psi, m, chi_max=16, eps=1e-13).run(n_sweeps=10)
    assert abs(E - m.exact_finite_gs_energy()) < 1e-9


@pytest.mark.slow
def test_su2_heisenberg_dmrg():
    from cyten_tpu.algorithms import (
        DMRGEngine, HeisenbergModel, SimpleMPS, heisenberg_exact_finite_gs_energy,
    )

    L = 8
    m = HeisenbergModel(L=L, conserve='SU2', block_backend='numpy')
    psi = SimpleMPS.from_singlet_pairs(m.site_leg, L, backend=m.backend)
    E = DMRGEngine(psi, m, chi_max=32, eps=1e-13).run(n_sweeps=8)
    assert abs(E - heisenberg_exact_finite_gs_energy(L, 1.)) < 1e-9


def test_native_partial_trace(np_random):
    """Native fusion-tree partial_trace == cap-contraction oracle (SU(2), U(1)),
    exact to machine precision; anyons without levels fall back to caps."""
    import cyten_tpu as ct
    from cyten_tpu.backends.fusion_tree import FusionTreeBackend
    from cyten_tpu.symmetries import ElementarySpace, TensorProduct
    from cyten_tpu.tensors import (
        SymmetricTensor, bend_legs, item, norm, permute_legs, tdot,
    )
    from cyten_tpu.testing.random_generation import random_tensor

    def _partial_trace_via_caps(tensor, pairs):
        # explicit cap-contraction oracle (valid for symmetric braiding)
        res = tensor
        remaining = [tuple(p) for p in pairs]
        while remaining:
            i, j = remaining.pop(0)
            V = res._as_codomain_leg(i)
            eye_t = SymmetricTensor.from_eye([V], backend=res.backend,
                                             dtype=res.dtype)
            cap = bend_legs(eye_t, num_codomain_legs=2)
            res = tdot(res, cap, [i, j], [1, 0])
            remaining = [(a - sum(x < a for x in (i, j)),
                          b - sum(x < b for x in (i, j)))
                         for a, b in remaining]
        if isinstance(res, ct.Tensor) and all(l.is_trivial for l in res.legs):
            return item(res)
        return res

    cases = [
        (ElementarySpace(ct.su2_symmetry, [[0], [1]], [2, 1]),
         ElementarySpace(ct.su2_symmetry, [[1], [2]], [1, 2])),
        (ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [2, 1, 2]),
         ElementarySpace(ct.u1_symmetry, [[0], [2]], [2, 1])),
    ]
    for a, b in cases:
        sym = a.symmetry
        be = FusionTreeBackend(ct.get_block_backend('numpy'))
        T = random_tensor([a, b], [b, a], backend=be, rng=np_random,
                          labels=['x', 'y', 'x*', 'y*'])
        for pairs in ([(0, 2)], [(1, 3)], [(0, 2), (1, 3)]):
            traced = {x for p in pairs for x in p}
            nc = TensorProduct([sp for i, sp in enumerate(T.codomain.factors)
                                if i not in traced], symmetry=sym)
            nd = TensorProduct(
                [sp for k, sp in enumerate(T.domain.factors)
                 if (T.num_legs - 1 - k) not in traced], symmetry=sym)
            data, is_scalar = T.backend.partial_trace(
                T, [tuple(p) for p in pairs], None, nc, nd)
            r_caps = _partial_trace_via_caps(T, pairs)
            if is_scalar:
                assert abs(complex(data) - complex(r_caps)) \
                    < 1e-12 * max(1., abs(complex(r_caps)))
            else:
                labels = [l for i, l in enumerate(T._labels) if i not in traced]
                r_t = SymmetricTensor(data, nc, nd, T.backend, labels)
                cod_labels = [l for i, l in enumerate(T._labels)
                              if i not in traced and i < T.num_codomain_legs]
                dom_labels = [l for i, l in enumerate(T._labels)
                              if i not in traced
                              and i >= T.num_codomain_legs][::-1]
                r_p = permute_legs(r_caps, codomain=cod_labels,
                                   domain=dom_labels)
                diff = float(norm(r_t + (-1.) * r_p.set_labels(r_t.labels)))
                assert diff < 1e-12 * max(1., float(norm(r_p)))


def test_lb_dm_chirality():
    """Direct two-convention test of the left-bend composite chirality
    (tree_moves._LB_DM; VERDICT weak #6): the same planar rotation computed via
    the short route (left bends) and the long route (right bends, forced by
    patching the direction chooser) must agree; flipping the convention must
    break the coherence."""
    import unittest.mock as mock

    import cyten_tpu.backends.tree_moves as tm

    sym = ct.fibonacci_anyon_category
    be = ct.get_backend(sym, 'numpy')
    rng = np.random.default_rng(3)
    V = ct.ElementarySpace.from_defining_sectors(sym, sym.all_sectors(), [2, 2])
    A = ct.SymmetricTensor.from_random_normal([V, V], [V, V], backend=be,
                                              rng=rng, labels=list('abcd'))

    def rot_plus1(t):
        return ct.permute_legs(t, codomain=[1, 2], domain=[0, 3])

    P_short = rot_plus1(A)  # short route: rot_signed = +1 (left bends)
    tm._cached_plan.cache_clear()
    with mock.patch.object(tm, '_rotation_direction', lambda rot, n: rot - n):
        P_long = rot_plus1(A)  # long route: rot_signed = -3
    tm._cached_plan.cache_clear()
    for b1, b2 in zip(P_short.data.blocks, P_long.data.blocks):
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-12)
    # flipping the chirality convention must break the route coherence
    with mock.patch.object(tm, '_LB_DM', True):
        P_flip = rot_plus1(A)
    tm._cached_plan.cache_clear()
    diff = max(float(np.max(np.abs(np.asarray(b1) - np.asarray(b2))))
               for b1, b2 in zip(P_flip.data.blocks, P_long.data.blocks))
    assert diff > 1e-2, 'flipped convention should NOT satisfy coherence'


def test_braid_trace_link_invariants():
    """Braid + quantum-trace machinery against exact topological invariants:
    the single-crossing blocks are the R symbols; the trace closure of the
    braid gives the (unnormalized) Hopf link invariant S~_tt = -1 for
    Fibonacci, and with the opposite closure chirality the crossing cancels
    (Reidemeister II) giving the 2-component unlink d_tau^2 = phi^2."""
    sym = ct.fibonacci_anyon_category
    be = ct.get_backend(sym, 'numpy')
    tau = np.array([1])
    phi = (1 + np.sqrt(5)) / 2
    W = ct.ElementarySpace.from_defining_sectors(sym, tau[None, :], [1])
    eye = ct.SymmetricTensor.from_eye([W, W], backend=be, labels=['a', 'b'],
                                      dtype=ct.Dtype.complex128)
    # single crossing: swap the codomain only (domain factor order kept)
    braided = ct.permute_legs(eye, codomain=[1, 0], domain=[3, 2],
                              levels=[1, 0, 2, 3])
    r_by_sector = {0: sym.r_symbol(tau, tau, np.array([0]))[0],
                   1: sym.r_symbol(tau, tau, tau)[0]}
    for (i, j), b in zip(braided.data.block_inds, braided.data.blocks):
        np.testing.assert_allclose(np.asarray(b), [[r_by_sector[int(i)]]],
                                   atol=1e-12)
    # trace closure: the closure arcs cross once; chirality picks the link
    hopf = ct.partial_trace(braided, (0, 2), (1, 3), levels=[0, 1, 2, 3])
    np.testing.assert_allclose(hopf, -1.0, atol=1e-12)
    unlink = ct.partial_trace(braided, (0, 2), (1, 3), levels=[3, 2, 1, 0])
    np.testing.assert_allclose(unlink, phi ** 2, atol=1e-12)


def test_planar_partial_trace_nested():
    """Nested / outer / wrapping trace pairs without levels (planar
    configurations) work for anyons and agree with the full trace."""
    sym = ct.fibonacci_anyon_category
    be = ct.get_backend(sym, 'numpy')
    rng = np.random.default_rng(0)
    V = ct.ElementarySpace.from_defining_sectors(sym, sym.all_sectors(), [2, 2])
    A = ct.SymmetricTensor.from_random_normal([V, V], [V, V], backend=be,
                                              rng=rng, labels=list('abcd'))
    t_nested = ct.partial_trace(A, (0, 3), (1, 2))
    np.testing.assert_allclose(t_nested, ct.trace(A), atol=1e-12)
    outer = ct.partial_trace(A, (0, 3))   # wrapping pair -> rotation route
    outer.test_sanity()
    assert outer.labels == ['b', 'c']
    np.testing.assert_allclose(ct.partial_trace(outer, (0, 1)), ct.trace(A),
                               atol=1e-12)
    # crossing pairs without levels are ambiguous -> explicit error
    from cyten_tpu.symmetries import SymmetryError

    with pytest.raises(SymmetryError, match='levels'):
        ct.partial_trace(A, (0, 2), (1, 3))


def test_partial_trace_auto_levels_wrapping_open_legs():
    """A traced pair whose loop wraps *open* legs needs braids, but the loop
    slides off every strand it crosses (Reidemeister II: both crossings share
    chirality), so the backend synthesizes canonical levels and the result is
    exact and chirality-invariant. Pin: (a) no-levels == loop-above-all ==
    loop-below-all explicit levels, (b) tracing the remaining legs afterwards
    recovers the full trace, (c) interleaved (linked) pairs still refuse."""
    from cyten_tpu.symmetries import SymmetryError

    for sym in [ct.fibonacci_anyon_category, ct.ising_anyon_category]:
        be = ct.get_backend(sym, 'numpy')
        rng = np.random.default_rng(7)
        V = ct.ElementarySpace.from_defining_sectors(
            sym, sym.all_sectors(), [2] * len(sym.all_sectors()))
        A = ct.SymmetricTensor.from_random_normal([V, V], [V, V], backend=be,
                                                  rng=rng, labels=list('abcd'))
        # pair (0, 2): the cap crosses the open strand of leg 1
        auto = ct.partial_trace(A, (0, 2))
        auto.test_sanity()
        assert auto.labels == ['b', 'd']
        over = ct.partial_trace(A, (0, 2), levels=[4, 0, 5, 1])
        under = ct.partial_trace(A, (0, 2), levels=[0, 4, 1, 5])
        for other in (over, under):
            assert ct.norm(auto - other) < 1e-12 * max(ct.norm(auto), 1.)
        # sequential tracing resolves interleaved loops as UNLINKED (the first
        # loop slides off before the second closes); must equal the explicit
        # levels computation with loop (0,2) above everything
        seq = ct.partial_trace(auto, (0, 1))
        explicit = ct.partial_trace(A, (0, 2), (1, 3), levels=[4, 0, 5, 1])
        np.testing.assert_allclose(seq, explicit, atol=1e-12)
        # the wrapping pair (0,3) crosses open strands 1,2 -> auto levels;
        # closing the remaining adjacent pair recovers the full quantum trace
        outer = ct.partial_trace(A, (0, 3))
        np.testing.assert_allclose(ct.partial_trace(outer, (0, 1)),
                                   ct.trace(A), atol=1e-12)
        # linked loops are genuinely chirality-dependent -> still refused
        with pytest.raises(SymmetryError, match='levels'):
            ct.partial_trace(A, (0, 2), (1, 3))


def test_grouped_plan_apply_equivalence(np_random):
    """The GEMM-ized plan application (stack -> batched transpose -> tree-pair
    coefficient GEMM -> scatter) reproduces the per-entry slice/scale/scatter
    path exactly, on braided and non-abelian symmetries incl. side changes."""
    from cyten_tpu.config import config
    from cyten_tpu.testing.random_generation import (
        random_ElementarySpace, random_tensor,
    )

    syms = [ct.fibonacci_anyon_category, ct.ising_anyon_category,
            ct.su2_symmetry,
            ct.fibonacci_anyon_category * ct.u1_symmetry.factors[0]]
    perms = [((0, 1, 2), (3,)), ((1, 0), (3, 2)), ((2, 0), (1, 3)),
             ((3, 1, 0), (2,)), ((0,), (1, 2, 3))]
    n_checked = 0
    for sym in syms:
        be = ct.get_backend(sym, 'numpy')
        for _ in range(3):
            try:
                legs_cod = [random_ElementarySpace(sym, np_random,
                                                   max_sectors=3, max_mult=3)
                            for _ in range(2)]
                legs_dom = [random_ElementarySpace(sym, np_random,
                                                   max_sectors=3, max_mult=3)
                            for _ in range(2)]
                T = random_tensor(legs_cod, legs_dom, backend=be, rng=np_random)
            except Exception:
                continue
            for cod_idcs, dom_idcs in perms:
                levels = None if sym.has_symmetric_braid \
                    else list(np_random.permutation(4))
                old = config.fusion_tree_grouped_apply
                try:
                    config.fusion_tree_grouped_apply = False
                    try:
                        A = ct.permute_legs(T, codomain=list(cod_idcs),
                                            domain=list(dom_idcs), levels=levels)
                    except Exception:
                        continue
                    config.fusion_tree_grouped_apply = True
                    B = ct.permute_legs(T, codomain=list(cod_idcs),
                                        domain=list(dom_idcs), levels=levels)
                    # also exercise the large-block per-entry fallback branch
                    old_max = config.fusion_tree_grouped_max_block
                    config.fusion_tree_grouped_max_block = 1
                    B2 = ct.permute_legs(T, codomain=list(cod_idcs),
                                         domain=list(dom_idcs), levels=levels)
                    config.fusion_tree_grouped_max_block = old_max
                finally:
                    config.fusion_tree_grouped_apply = old
                nA = max(float(ct.norm(A)), 1e-300)
                assert float(ct.norm(A + (-1.) * B)) < 1e-12 * nA, \
                    (sym, cod_idcs, dom_idcs)
                assert float(ct.norm(A + (-1.) * B2)) < 1e-12 * nA, \
                    (sym, cod_idcs, dom_idcs, 'fallback branch')
                n_checked += 1
    assert n_checked > 30
