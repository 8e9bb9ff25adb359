"""Direct coverage of tensor free functions vs the dense-numpy oracle.

Mirrors the per-op test functions of the reference tests/python_tests/test_tensors.py
that were previously only covered indirectly here.
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import DiagonalTensor, Mask, SymmetricTensor
from cyten_tpu.symmetries import ElementarySpace
from cyten_tpu.tensors import (
    add_trivial_leg, almost_equal, apply_mask, bend_legs, enlarge_leg, entropy,
    is_scalar, item, linear_combination, move_leg, partial_compose, scalar_multiply,
    scale_axis, squeeze_legs, tdot,
)


@pytest.fixture
def setup():
    leg = ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [2, 3, 2])
    be = ct.get_backend(ct.u1_symmetry, 'numpy')
    rng = np.random.default_rng(99)
    A = SymmetricTensor.from_random_normal([leg, leg], [leg], backend=be, rng=rng,
                                           labels=['a', 'b', 'c'])
    return leg, be, rng, A


def test_bend_legs(setup):
    leg, be, rng, A = setup
    d = A.to_numpy()
    B = bend_legs(A, num_codomain_legs=1)
    assert B.num_codomain_legs == 1 and B.num_domain_legs == 2
    np.testing.assert_allclose(B.to_numpy(), d, atol=1e-12)  # same legs, new split
    C = bend_legs(A, num_codomain_legs=3)
    np.testing.assert_allclose(C.to_numpy(), d, atol=1e-12)


def test_move_leg(setup):
    leg, be, rng, A = setup
    d = A.to_numpy()
    B = move_leg(A, 'a', codomain_pos=1)
    np.testing.assert_allclose(B.to_numpy(), d.transpose(1, 0, 2), atol=1e-12)
    C = move_leg(A, 'a', domain_pos=0)
    assert C.labels == ['b', 'c', 'a']
    np.testing.assert_allclose(C.to_numpy(), d.transpose(1, 2, 0), atol=1e-12)


def test_add_squeeze_trivial(setup):
    leg, be, rng, A = setup
    d = A.to_numpy()
    B = add_trivial_leg(A, legs_pos=1, label='triv')
    assert B.shape[1] == 1
    np.testing.assert_allclose(B.to_numpy()[:, 0], d, atol=1e-12)
    C = squeeze_legs(B, 'triv')
    np.testing.assert_allclose(C.to_numpy(), d, atol=1e-12)


def test_apply_mask_enlarge_leg(setup):
    leg, be, rng, A = setup
    m = Mask.from_random(leg, backend=be, rng=rng)
    bm = m.as_numpy_mask()
    if not bm.any():
        m = m.orthogonal_complement()
        bm = ~bm
    B = apply_mask(A, m, 'a')
    np.testing.assert_allclose(B.to_numpy(), A.to_numpy()[bm], atol=1e-12)
    C = enlarge_leg(B, m, 'a')
    expect = np.zeros_like(A.to_numpy())
    expect[bm] = A.to_numpy()[bm]
    np.testing.assert_allclose(C.to_numpy(), expect, atol=1e-12)


def test_scale_axis(setup):
    leg, be, rng, A = setup
    diag = DiagonalTensor.from_random_normal(leg, backend=be, rng=rng)
    B = scale_axis(A, diag, 'a')
    np.testing.assert_allclose(
        B.to_numpy(), diag.diag_numpy[:, None, None] * A.to_numpy(), atol=1e-12)


def test_scalar_linear_combination(setup):
    leg, be, rng, A = setup
    B = SymmetricTensor.from_random_normal([leg, leg], [leg], backend=be,
                                           rng=rng, labels=['a', 'b', 'c'])
    C = linear_combination(2.0, A, -0.5, B)
    np.testing.assert_allclose(C.to_numpy(), 2 * A.to_numpy() - 0.5 * B.to_numpy(),
                               atol=1e-12)
    D = scalar_multiply(3.0, A)
    np.testing.assert_allclose(D.to_numpy(), 3 * A.to_numpy(), atol=1e-12)
    assert almost_equal(D, 3.0 * A)
    assert not almost_equal(D, A)


def test_item_is_scalar(setup):
    leg, be, rng, A = setup
    s = tdot(A, A.dagger, [0, 1, 2], [2, 1, 0])
    assert is_scalar(item(s))
    assert not is_scalar(A)
    np.testing.assert_allclose(item(s), np.sum(np.abs(A.to_numpy()) ** 2),
                               atol=1e-10)


def test_partial_compose(setup):
    leg, be, rng, A = setup
    # B: leg -> leg; compose onto A's domain leg only
    B = SymmetricTensor.from_random_normal([leg], [leg], backend=be, rng=rng,
                                           labels=['x', 'y'])
    C = partial_compose(A, B, 'c')
    expect = np.einsum('abc,cy->aby', A.to_numpy(), B.to_numpy())
    np.testing.assert_allclose(C.to_numpy(), expect, atol=1e-12)


def test_entropy():
    p = np.array([0.5, 0.5])
    np.testing.assert_allclose(entropy(p), np.log(2), atol=1e-12)
    np.testing.assert_allclose(entropy(p, n=2), np.log(2), atol=1e-12)
    np.testing.assert_allclose(entropy(np.array([1.0])), 0.0, atol=1e-12)


def test_almost_equal_mixed_types(setup):
    leg, be, rng, A = setup
    diag = DiagonalTensor.from_random_normal(leg, backend=be, rng=rng)
    assert almost_equal(diag, diag.as_SymmetricTensor())


def test_outer_multiplicity_dense_oracle(np_random):
    """outer with fusion multiplicity N(8,8->8)=2: SU(3)-adjoint dense oracle.

    Regression for the embedding-multiplicity pairing in the fusion-tree
    backend's outer (FusionTree.outer_embeddings): the codomain- and
    domain-side product decompositions must contract the embedding label
    (c, m); summing each side over m independently — which is what the
    REFERENCE does (fusion_tree_backend.py:1604-1631) — double-counts the
    off-diagonal (m, m') pairs. The reference's own tests never exercise a
    multiplicity-rich symmetry through outer; our native SU(3) CG makes the
    dense oracle available."""
    import cyten_tpu as ct
    from cyten_tpu import symmetries as sym

    su3 = sym.SUN(3).as_Symmetry()
    V = ct.ElementarySpace(su3, [[2, 1, 0]], [1])  # adjoint, dim 8
    be = ct.get_backend(su3, block_backend='numpy')
    A = SymmetricTensor.from_random_normal([V, V], [V], backend=be,
                                           rng=np_random,
                                           labels=['a0', 'a1', 'a2'])
    B = SymmetricTensor.from_random_normal([V], [V, V], backend=be,
                                           rng=np_random,
                                           labels=['b0', 'b1', 'b2'])
    O = ct.outer(A, B)
    dA, dB = A.to_numpy(), B.to_numpy()
    exp = np.tensordot(dA, dB, axes=0)
    la = {l: i for i, l in enumerate(A.labels)}
    lb = {l: i for i, l in enumerate(B.labels)}
    order = [la[l] if l in la else A.num_legs + lb[l] for l in O.labels]
    np.testing.assert_allclose(O.to_numpy(), exp.transpose(order), atol=1e-12)
    # unit law in the multiplicity-rich category: outer(eye, eye) == eye
    e1 = SymmetricTensor.from_eye([V], backend=be)
    e2 = SymmetricTensor.from_eye([V, V], backend=be)
    assert float(ct.norm(ct.outer(e1, e1) + (-1.) * e2)) < 1e-12


def test_combine_to_matrix(setup):
    leg, be, rng, A = setup
    d = A.to_numpy()  # legs [a, b, c]: codomain (a, b), domain (c,)
    M = ct.combine_to_matrix(A, codomain=['a', 'b'])
    assert M.num_codomain_legs == 1 and M.num_domain_legs == 1
    assert M.shape == (d.shape[0] * d.shape[1], d.shape[2])
    np.testing.assert_allclose(ct.split_legs(M).to_numpy(), d, atol=1e-12)
    # with an explicit repartition: codomain [a], domain [b, c]
    M2 = ct.combine_to_matrix(A, codomain=['a'], domain=['b', 'c'])
    assert M2.num_codomain_legs == 1 and M2.num_domain_legs == 1
    back = ct.split_legs(M2)
    # legs order is [*codomain, *reversed(domain)] -> [a, c, b]
    assert back.labels == ['a', 'c', 'b']
    np.testing.assert_allclose(back.to_numpy(), d.transpose(0, 2, 1), atol=1e-12)


def test_zero_like_all_classes(setup):
    leg, be, rng, A = setup
    Z = ct.zero_like(A)
    assert ct.norm(Z) == 0 and Z.codomain == A.codomain and Z.domain == A.domain
    diag = DiagonalTensor.from_random_normal(leg, backend=be, rng=rng)
    Zd = ct.zero_like(diag)
    assert isinstance(Zd, DiagonalTensor) and ct.norm(Zd) == 0
    mask = Mask.from_eye(leg, True, backend=be)
    Zm = ct.zero_like(mask)
    assert isinstance(Zm, Mask) and Zm.small_leg.dim == 0
    charged = ct.ChargedTensor.from_dense_block_single_sector(
        np.array([0., 1.]), leg, np.array([1]), backend=be)  # mult-2 sector components
    Zc = ct.zero_like(charged)
    assert isinstance(Zc, ct.ChargedTensor) and ct.norm(Zc) == 0


def test_elementwise_angle_conj_cutoff(setup):
    leg, be, rng, A = setup
    vals = rng.normal(size=7) + 1j * rng.normal(size=7)
    diag = DiagonalTensor.from_diag(vals, leg, backend=be)
    np.testing.assert_allclose(np.sort(ct.angle(diag).diagonal_as_numpy()),
                               np.sort(np.angle(diag.diagonal_as_numpy())), atol=1e-12)
    np.testing.assert_allclose(ct.complex_conj(diag).diagonal_as_numpy(),
                               np.conj(diag.diagonal_as_numpy()), atol=1e-12)
    # complex_conj of a SymmetricTensor = entrywise conjugate on the DUAL legs,
    # legs in the original order, labels dualized
    C = A * (1 + 2j)
    Cc = ct.complex_conj(C)
    np.testing.assert_allclose(Cc.to_numpy(), np.conj(C.to_numpy()), atol=1e-12)
    assert Cc.labels == ['a*', 'b*', 'c*']
    assert all(Cc.get_leg_co_domain(i) == C.get_leg_co_domain(i).dual for i in range(3))
    # involution
    np.testing.assert_allclose(ct.complex_conj(Cc).to_numpy(), C.to_numpy(), atol=1e-12)
    # real_if_close drops a numerically-zero imaginary part
    R = ct.real_if_close(diag * 0 + 1.0 + 0j)
    assert not R.dtype.is_complex
    # cutoff_inverse: 1/x above cutoff, 0 below
    small = DiagonalTensor.from_diag(np.array([2., 0., 1e-20, -4., 1., 1., 1.]),
                                     leg, backend=be)
    inv = ct.cutoff_inverse(small, cutoff=1e-15).diagonal_as_numpy()
    expect = np.array([0.5, 0., 0., -0.25, 1., 1., 1.])
    np.testing.assert_allclose(np.sort(inv), np.sort(expect), atol=1e-12)


def test_truncate_singular_values_and_apply_mask(setup):
    """truncate_singular_values + svd_apply_mask == truncated_svd (U(1) and SU(2))."""
    leg, be, rng, A = setup
    U, S, Vh = ct.svd(A, new_labels=['x', 'x*'])
    mask, err, new_norm = ct.truncate_singular_values(S, chi_max=5)
    assert mask.small_leg.dim <= 5
    Ut, St, Vht = ct.svd_apply_mask(U, S, Vh, mask)
    # against truncated_svd directly
    U2, S2, Vh2, err2, renorm2 = ct.truncated_svd(A, new_labels=['x', 'x*'], chi_max=5)
    np.testing.assert_allclose(np.sort(St.diagonal_as_numpy()),
                               np.sort(S2.diagonal_as_numpy()), atol=1e-12)
    assert abs(err - err2) < 1e-12
    # kept values are the largest ones
    allS = np.sort(np.abs(S.diagonal_as_numpy()))[::-1]
    np.testing.assert_allclose(np.sort(St.diagonal_as_numpy())[::-1],
                               allS[:St.leg.dim], atol=1e-12)
    # error definition: relative — sqrt(discarded S^2 / total S^2) (U(1): qdim=1)
    np.testing.assert_allclose(
        err, np.sqrt((allS[St.leg.dim:] ** 2).sum() / (allS ** 2).sum()), atol=1e-12)


def test_truncate_singular_values_qdim_weighted():
    """SU(2): truncation counts and weights whole multiplets (qdim * S^2)."""
    su2 = ct.su2_symmetry
    be = ct.get_backend(su2, 'numpy')
    # leg with spin-0 (qdim 1) and spin-1/2 (qdim 2) sectors, 2 multiplets each
    V = ElementarySpace(su2, [[0], [1]], [2, 2])
    S_vals = {(0,): np.array([1.0, 0.3]), (1,): np.array([0.9, 0.2])}
    S = DiagonalTensor.from_sector_block_func(
        lambda shape, c: np.broadcast_to(S_vals[tuple(int(x) for x in np.atleast_1d(c))],
                                         shape).copy(),
        V, backend=be, labels=['x', 'x*'])
    mask, err, new_norm = ct.truncate_singular_values(S, chi_max=3)
    # chi_max counts kept MULTIPLETS, prioritized by marginal error qdim*S^2:
    # 0.9 (2*0.81=1.62) > 1.0 (1.0) > 0.3 (0.09) > 0.2 (2*0.04=0.08)
    # -> keep {0.9-multiplet, 1.0, 0.3}: dense dim 2 + 1 + 1 = 4
    assert int(mask.small_leg.dim) == 4
    total = 1.0 + 1.62 + 0.09 + 0.08
    np.testing.assert_allclose(err, np.sqrt(0.08 / total), atol=1e-12)
    np.testing.assert_allclose(new_norm, np.sqrt(total - 0.08), atol=1e-12)
