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
