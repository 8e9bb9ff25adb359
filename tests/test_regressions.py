"""Regression scenarios ported from the reference's bug-fix tests.

These encode tricky cases that once broke the reference implementation
(reference tests/python_tests/test_tensors.py: test_fixes_124 :420,
test_fixes_23 :457, test_combine_split_pr_16 :1670, test_fixes_scale_axis_bug
:2158); re-expressed against our API and oracles.
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import SymmetricTensor, TensorProduct
from cyten_tpu.symmetries import ElementarySpace
from cyten_tpu.tensors import (
    almost_equal, bend_legs, combine_legs, compose, norm, split_legs, svd,
    truncated_svd,
)


def test_from_tree_pairs_dense_oracle(np_random):
    """Tree-pair construction vs an independent dense oracle (reference PR #124).

    Dense contribution of pair (X, Y) with coefficients ``block``:
    kron(symmetry_data, block) per axis — state-major, matching our layout.
    """
    symm = ct.su2_symmetry
    backend = ct.get_backend(symm, 'numpy')
    a = ElementarySpace(symm, [[1]], [1])
    b = ElementarySpace(symm, [[1]], [1])
    c = ElementarySpace(symm, [[2]], [2])
    codomain = TensorProduct([a, b])
    domain = TensorProduct([c])

    trees = {}
    for coupled in codomain.sector_decomposition:
        for X, _, mults1, _ in codomain.iter_tree_blocks([coupled]):
            for Y, _, mults2, _ in domain.iter_tree_blocks([coupled]):
                shape = [*mults1, *reversed(mults2)]
                if len(trees) == 0 or np_random.choice([True, False]):
                    trees[X, Y] = np_random.normal(size=shape)

    T = SymmetricTensor.from_tree_pairs(trees, codomain, domain, backend=backend)
    T.test_sanity()

    T_np = T.to_numpy()
    expect = np.zeros_like(T_np)
    K = T.num_codomain_legs
    for (X, Y), block in trees.items():
        sym_data = np.tensordot(X.as_block(), np.conj(Y.as_block()), (-1, -1))
        # axes [a1..aJ, b1..bK] -> legs order [a1..aJ, bK..b1]
        sym_data = np.transpose(
            sym_data, [*range(K), *reversed(range(K, T.num_legs))])
        contribution = np.kron(sym_data, np.asarray(block))
        idcs = []
        for l, s in zip(T.codomain.factors, X.uncoupled):
            i = int(np.nonzero(np.all(
                l.sector_decomposition == np.asarray(s)[None, :], axis=1))[0][0])
            idcs.append(slice(int(l.slices[i, 0]), int(l.slices[i, 1])))
        for l, s in zip(reversed(T.domain.factors), reversed(Y.uncoupled)):
            i = int(np.nonzero(np.all(
                l.sector_decomposition == np.asarray(s)[None, :], axis=1))[0][0])
            idcs.append(slice(int(l.slices[i, 0]), int(l.slices[i, 1])))
        expect[tuple(idcs)] += contribution
    np.testing.assert_allclose(T_np, expect, atol=1e-12)


def test_zero_dense_block_many_legs():
    """Zero 6-leg SU(2) tensor survives from_dense_block (reference PR #23)."""
    sym = ct.su2_symmetry
    site = ElementarySpace(sym, [[1]])
    block = np.zeros((2,) * 6, float)
    tens = SymmetricTensor.from_dense_block(block, [site] * 3, [site] * 3,
                                            backend=ct.get_backend(sym, 'numpy'))
    tens.test_sanity()
    np.testing.assert_allclose(norm(tens), 0, atol=1e-14)


def test_combine_split_with_basis_perm_and_duals():
    """combine/split/bend with nontrivial basis_perm on dual legs of a product
    symmetry (reference PR #16)."""
    backend = ct.get_backend(ct.u1_symmetry * ct.z3_symmetry.factors[0], 'numpy')
    symmetry = ct.u1_symmetry * ct.z3_symmetry.factors[0]
    a = ElementarySpace(symmetry,
                        [[-2, 0], [-1, 0], [-2, 1], [-2, 2]],
                        [1, 2, 4, 4],
                        basis_perm=[8, 0, 7, 3, 6, 2, 4, 10, 1, 5, 9],
                        is_dual=True)
    b = ElementarySpace(symmetry, [[-3, 0], [0, 0], [-3, 1], [-3, 2]],
                        [1, 1, 1, 1], is_dual=False)
    c = ElementarySpace(symmetry, [[-4, 0], [-3, 0], [-7, 1], [-6, 1], [-3, 1]],
                        [5, 5, 5, 5, 5], is_dual=False)
    d = ElementarySpace(symmetry, [[-2, 0], [1, 0], [2, 1]], [3, 3, 2],
                        basis_perm=[6, 3, 4, 0, 7, 2, 5, 1], is_dual=True)

    rng = np.random.default_rng(16)
    T = SymmetricTensor.from_random_normal([a, b], [d, c], backend=backend,
                                           rng=rng)
    combined = combine_legs(T, [2, 3])
    combined.test_sanity()
    assert combined.codomain.factors == T.codomain.factors

    re_split = split_legs(combined, 2)
    assert almost_equal(T, re_split)

    bent = bend_legs(combined, num_domain_legs=0)
    split = split_legs(bent, 2)
    split.test_sanity()
    assert split.domain.num_factors == 0
    expect = bend_legs(T, num_domain_legs=0)
    assert almost_equal(split, expect)


@pytest.mark.parametrize('trunc', [False, 1e-14])
def test_svd_compose_scale_axis_regression(trunc):
    """U·S·Vh recomposition on the fusion-tree backend with a multi-sector
    product symmetry incl. large charges (reference scale_axis bug)."""
    from cyten_tpu.backends.fusion_tree import FusionTreeBackend

    s = ct.u1_symmetry * ct.z3_symmetry.factors[0]
    backend = FusionTreeBackend(ct.get_block_backend('numpy'))
    codomain = TensorProduct([
        ElementarySpace.from_defining_sectors(s, [[-1, 0], [-2, 2]], [2, 3],
                                              is_dual=True),
        ElementarySpace.from_defining_sectors(s, [[1, 1], [-3, 2], [0, 2]],
                                              [3, 1, 1], is_dual=True),
        ElementarySpace.from_defining_sectors(s, [[-2, 0], [0, 0], [123, 1]],
                                              [3, 1, 2], is_dual=True),
    ])
    domain = TensorProduct([
        ElementarySpace.from_defining_sectors(s, [[-2, 0]], [3]),
        ElementarySpace.from_defining_sectors(s, [[-124, 0], [-1, 1], [1, 1]],
                                              [3, 3, 3]),
        ElementarySpace.from_defining_sectors(s, [[2, 0]], [3]),
        ElementarySpace.from_defining_sectors(s, [[-2, 0], [1, 1], [123, 1]],
                                              [1, 1, 3]),
    ])
    rng = np.random.default_rng(42)
    T = SymmetricTensor.from_random_normal(codomain, domain, backend=backend,
                                           rng=rng)
    T.test_sanity()
    if trunc is False:
        U, S, Vh = svd(T)
    else:
        U, S, Vh, _, _ = truncated_svd(T, svd_min=trunc)
    U.test_sanity(), S.test_sanity(), Vh.test_sanity()
    S_Vh = compose(S, Vh)
    S_Vh.test_sanity()
    U_S = compose(U, S)
    U_S.test_sanity()
    assert almost_equal(T, compose(U, S_Vh))
    assert almost_equal(T, compose(U_S, Vh))


def test_grouped_gemm_equivalence():
    """config.use_grouped_gemm (flat-buffer emulation: padded bucketed batched
    GEMMs + segment-sum) produces identical tdot results to the unrolled
    per-pair path, on a many-small-sector U(1)xU(1) workload."""
    import sys

    import numpy as np

    sys.path.insert(0, '/root/repo')
    import cyten_tpu as ct
    from bench import build_hubbard_workload
    from cyten_tpu.algorithms.dmrg import _heff_matvec_impl
    from cyten_tpu.config import config

    sym = ct.u1_symmetry * ct.u1_symmetry.factors[0]
    backend = ct.get_backend(sym, 'jax')
    args = build_hubbard_workload(backend, chi=48)
    out1 = _heff_matvec_impl(*args)
    old_pad = config.mxu_pad_multiple
    config.use_grouped_gemm = True
    config.mxu_pad_multiple = 8
    try:
        out2 = _heff_matvec_impl(*args)
    finally:
        config.use_grouped_gemm = False
        config.mxu_pad_multiple = old_pad
    assert len(out1.data.blocks) == len(out2.data.blocks)
    for (r1, b1), (r2, b2) in zip(
            zip(out1.data.block_inds, out1.data.blocks),
            zip(out2.data.block_inds, out2.data.blocks)):
        assert tuple(r1) == tuple(r2)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                   rtol=1e-10, atol=1e-10)


def test_charged_su2_overlap_matches_norm():
    """overlap(psi, psi) == norm_squared for a CHARGED non-abelian (SU(2)
    fusion-tree) MPS: the trace closure of the charged boundary pair carries the
    categorical qdim weight, which is exactly what reproduces the dense
    (full-multiplet) inner product — no division by d_q is needed.
    (ADVICE r2 item on algorithms/mps.py overlap.)"""
    from cyten_tpu import DiagonalTensor
    from cyten_tpu.algorithms.mps import SimpleMPS
    from cyten_tpu.dtypes import Dtype
    from cyten_tpu.models.sites import SpinSite

    site = SpinSite(S=0.5, conserve='SU(2)')
    sym = site.leg.symmetry
    backend = ct.get_backend(sym, 'numpy')
    triv = ElementarySpace(sym, sym.trivial_sector[None, :])
    half = site.leg
    d = int(half.dim)
    # right-canonical charged B0: [vL(triv), p] -> [vR(j=1/2)], eye/sqrt(d)
    block0 = (np.eye(d) / np.sqrt(d)).reshape(1, d, d)
    B0 = SymmetricTensor.from_dense_block(
        block0, [triv, half], [half], backend=backend,
        labels=['vL', 'p', 'vR'], dtype=Dtype.float64)
    S0 = DiagonalTensor.from_eye(triv, backend=backend, labels=['vL', 'vL*'],
                                 dtype=Dtype.float64)
    # B1: [vL(j=1/2), p] -> [vR(j=1)] via normalized CG (right-canonical)
    one = ElementarySpace(sym, np.array([[2]]))
    cg = np.asarray(sym.factors[0].fusion_tensor(
        np.array([1]), np.array([1]), np.array([2])))[0]  # [a, b, m]
    b1 = cg / np.sqrt(np.einsum('pm,pm->', cg[0], cg[0]))
    B1 = SymmetricTensor.from_dense_block(
        b1, [half, half], [one], backend=backend,
        labels=['vL', 'p', 'vR'], dtype=Dtype.float64)
    S1 = DiagonalTensor.from_eye(half, backend=backend, labels=['vL', 'vL*'],
                                 dtype=Dtype.float64)
    psi = SimpleMPS([B0, B1], [S0, S1])
    dense = np.einsum('xpa,aqm->pqm', block0, b1)
    dense_norm = float(np.sum(np.abs(dense) ** 2))
    assert abs(dense_norm - 1.0) < 1e-12  # construction is canonical
    assert abs(psi.overlap(psi) - dense_norm) < 1e-12
    assert abs(psi.norm_squared() - dense_norm) < 1e-12


def test_non_python_complex_scalars_promote_dtype():
    """scalar_multiply / linear_combination with NON-python complex scalars
    (np.complex64, jax device scalars, jit tracers) must promote the data
    container's dtype like python ``complex`` does.

    Regression (round 4): backend ``mul`` decided the metadata dtype via
    ``isinstance(a, complex)`` — False for those scalars — while the block
    arithmetic promoted regardless. The container then claimed a real dtype
    over complex blocks, and the next metadata-trusting cast (e.g. the
    ``to_dtype`` inside ``linear_combination``) silently dropped the
    imaginary parts. Surfaced as a 4% overlap error in real-time TDVP when
    the Lanczos-evolution coefficients arrived as jax scalars.
    """
    from cyten_tpu.dtypes import Dtype, is_complex_scalar
    from cyten_tpu.tensors import scalar_multiply

    assert is_complex_scalar(1j)
    assert is_complex_scalar(np.complex128(1j))
    assert is_complex_scalar(np.complex64(1j))
    assert not is_complex_scalar(1.0)
    assert not is_complex_scalar(np.float64(2.0))

    scalars = [1j, np.complex128(1j), np.complex64(1j)]
    try:
        import jax.numpy as jnp

        scalars.append(jnp.asarray(1j))
    except ImportError:
        pass

    for sym, be in [(ct.u1_symmetry, 'numpy'), (ct.u1_symmetry, 'jax'),
                    (ct.no_symmetry, 'numpy'), (ct.su2_symmetry, 'numpy')]:
        backend = ct.get_backend(sym, be)
        if sym == ct.no_symmetry:
            leg = ElementarySpace(sym, [[0]], [5])
        else:
            leg = ElementarySpace(sym, [[0], [1]], [2, 3])
        rng = np.random.default_rng(0)
        t = SymmetricTensor.from_random_normal([leg], [leg], backend=backend,
                                               labels=['a', 'b'], rng=rng)
        n0 = float(norm(t))
        for c in scalars:
            r = scalar_multiply(c, t)
            assert r.dtype == Dtype.complex128, (sym, be, type(c), r.dtype)
            # the linear_combination cast is where imag parts used to vanish
            r2 = r + r
            assert abs(float(norm(r)) - n0) < 1e-12 * n0, (sym, be, type(c))
            assert abs(float(norm(r2)) - 2 * n0) < 1e-12 * n0, (sym, be,
                                                                type(c))


def test_eager_norm_single_fetch():
    """Eager tensor norm must aggregate on device: NO per-block ``norm``
    fetches (one ~30 ms tunnel round trip each), only ``norm_sq`` backend
    scalars summed device-side with a single final conversion (round 4,
    docs/DESIGN.md §16). Also pins the public contract: an eager ``norm``
    returns a host float and its value matches the per-block computation."""
    from cyten_tpu.dtypes import Dtype
    from cyten_tpu.tensors import scalar_multiply

    rng = np.random.default_rng(7)
    for sym, be in [(ct.u1_symmetry, 'numpy'), (ct.u1_symmetry, 'jax'),
                    (ct.su2_symmetry, 'numpy'), (ct.su2_symmetry, 'jax')]:
        backend = ct.get_backend(sym, be)
        leg = ElementarySpace(sym, [[0], [1], [2]], [2, 3, 4])
        t = SymmetricTensor.from_random_normal([leg], [leg], backend=backend,
                                               labels=['a', 'b'], rng=rng)
        bb = backend.block_backend
        calls = []
        orig = type(bb).norm

        def counting_norm(self, block, order=2):
            calls.append(order)
            return orig(self, block, order=order)

        type(bb).norm = counting_norm
        try:
            n = norm(t)
        finally:
            type(bb).norm = orig
        assert calls == [], (sym, be, 'per-block norm fetch on eager path')
        assert isinstance(n, float), (sym, be, type(n))
        expected = sum(
            float(sym.qdim(t.codomain.sector_decomposition[
                int(t.data.block_inds[k, 0])]))
            * np.sum(np.abs(np.asarray(b)) ** 2)
            for k, b in enumerate(t.data.blocks)) ** 0.5
        assert abs(n - expected) < 1e-5 * expected, (sym, be)
        # bf16 storage: reduction upcasts, value still sane
        n_bf = norm(t.to_dtype(Dtype.bfloat16))
        assert abs(n_bf - expected) < 2e-2 * expected, (sym, be)
        # and the zero-block corner
        z = scalar_multiply(0., t)
        assert float(norm(z)) == 0.


def test_bond_channel_fusion_matches_chained_tdots():
    """config.bond_channel_fusion (algorithms.dmrg._apply_bond_mixing): the
    single-pass channel-mixing matvec must equal the chained two-tdot MPO
    application to rounding, on both the U(1) chain and the U(1)xU(1)
    Hubbard (many small sectors) workloads, numpy and jax backends.
    Round-5 perf lever: +10%% on the f32 headline, 1.52x on the bare bf16
    matvec (DESIGN §17)."""
    import bench
    import cyten_tpu as ct
    from cyten_tpu.algorithms.dmrg import _heff_matvec_impl
    from cyten_tpu.config import config
    from cyten_tpu.tensors import norm

    for builder in (bench.build_workload, bench.build_hubbard_workload):
        for backend_name in ('numpy', 'jax'):
            be = ct.get_backend(bench._builder_symmetry(builder),
                                backend_name)
            LP, RP, W1, W2, th = builder(be, chi=64)
            old = config.bond_channel_fusion
            try:
                config.bond_channel_fusion = False
                ref = _heff_matvec_impl(LP, RP, W1, W2, th)
                config.bond_channel_fusion = True
                new = _heff_matvec_impl(LP, RP, W1, W2, th)
            finally:
                config.bond_channel_fusion = old
            rel = float(norm(ref + (-1.) * new)) / float(norm(ref))
            assert rel < 1e-10, (builder.__name__, backend_name, rel)
