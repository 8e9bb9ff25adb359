"""Tests for the planar contraction DSL and planar ops."""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import ElementarySpace, PlanarDiagram, SymmetricTensor
from cyten_tpu.tensors import horizontal_factorization, planar_permute_legs, tdot


@pytest.fixture
def setup(np_random):
    sym = ct.u1_symmetry
    be = ct.get_backend(sym, 'numpy')
    chi = ElementarySpace(sym, [[-1], [0], [1]], [2, 3, 2])
    p = ElementarySpace.from_basis(sym, [[1], [-1]])
    theta = SymmetricTensor.from_random_normal(
        [chi, p, p], [chi], backend=be, labels=['vL', 'p0', 'p1', 'vR'],
        rng=np_random)
    op = SymmetricTensor.from_random_normal(
        [p, p], [p, p], backend=be, labels=['p0', 'p1', 'p1*', 'p0*'],
        rng=np_random)
    return theta, op


def test_planar_diagram_expectation_value(setup):
    theta, op = setup
    diagram = PlanarDiagram(
        tensors='theta[vL, p0, p1, vR], theta_hc[vR*, p1*, p0*, vL*], '
                'op[p0, p1, p1*, p0*]',
        definition='theta:p0 @ op:p0*, theta:p1 @ op:p1*, '
                   'theta:vL @ theta_hc:vL*, theta:vR @ theta_hc:vR*, '
                   'op:p0 @ theta_hc:p0*, op:p1 @ theta_hc:p1*',
        dims=dict(chi=['vR', 'vR*', 'vL', 'vL*'],
                  d=['p0', 'p0*', 'p1', 'p1*']),
    )
    res = diagram.evaluate(theta=theta, theta_hc=ct.dagger(theta), op=op)
    expect = _dense_expectation(theta, op)
    np.testing.assert_allclose(complex(ct.item(res)), expect, rtol=1e-10,
                               atol=1e-12)


def _dense_expectation(theta, op):
    th = theta.to_numpy()
    o = op.to_numpy()  # [p0, p1, p1*, p0*]
    oth = np.einsum('abcd,LdcR->LabR', o.transpose(0, 1, 2, 3), th)
    return complex(np.sum(np.conj(th) * oth))


def test_planar_diagram_tebd_like(setup):
    theta, op = setup
    diagram = PlanarDiagram(
        tensors='theta[vL, p0, p1, vR], U[p0, p1, p1*, p0*]',
        definition='theta:p0 @ U:p0*, theta:p1 @ U:p1*, theta:vL -> vL, '
                   'theta:vR -> vR, U:p0 -> p0, U:p1 -> p1',
        dims=dict(chi=['vR', 'vL'], d=['p0', 'p0*', 'p1', 'p1*']),
    )
    res = diagram.evaluate(theta=theta, U=op)
    assert set(res.labels) == {'vL', 'vR', 'p0', 'p1'}
    # oracle via tdot
    expect = tdot(op, theta, ['p0*', 'p1*'], ['p0', 'p1'])
    np.testing.assert_allclose(
        np.linalg.norm(res.to_numpy()), np.linalg.norm(expect.to_numpy()),
        rtol=1e-10)


def test_contraction_cost(setup):
    theta, op = setup
    diagram = PlanarDiagram(
        tensors='theta[vL, p0, p1, vR], U[p0, p1, p1*, p0*]',
        definition='theta:p0 @ U:p0*, theta:p1 @ U:p1*, theta:vL -> vL, '
                   'theta:vR -> vR, U:p0 -> p0, U:p1 -> p1',
        dims=dict(chi=['vR', 'vL'], d=['p0', 'p0*', 'p1', 'p1*']),
    )
    cost = diagram.contraction_cost
    # one pairwise contraction: chi^2 d^4
    val = cost(chi=10, d=2)
    assert val == 10 ** 2 * 2 ** 4


def test_planar_permute_legs(setup):
    theta, op = setup
    arr = theta.to_numpy()
    rot = planar_permute_legs(theta, codomain=['p0', 'p1', 'vR'], domain=['vL'])
    np.testing.assert_allclose(rot.to_numpy(), arr.transpose(1, 2, 3, 0),
                               atol=1e-12)
    with pytest.raises(ValueError):
        planar_permute_legs(theta, codomain=['p1', 'p0', 'vR'], domain=['vL'])


def test_horizontal_factorization(setup):
    theta, op = setup
    L, R = horizontal_factorization(op)
    rec = tdot(L, R, ['wR'], ['wL'])
    # contract back and compare as full operators
    rec = ct.permute_legs(rec, codomain=['p0', 'p1'], domain=['p1*', 'p0*'][::-1])
    expect = ct.permute_legs(op.relabelled(['p0', 'p1', 'p1*', 'p0*']),
                             codomain=['p0', 'p1'], domain=['p0*', 'p1*'])
    assert ct.norm(rec - expect) < 1e-10 * ct.norm(expect)


def test_planar_diagram_optimal_order(setup):
    theta, op = setup
    diagram = PlanarDiagram(
        tensors='theta[vL, p0, p1, vR], theta_hc[vR*, p1*, p0*, vL*], '
                'op[p0, p1, p1*, p0*]',
        definition='theta:p0 @ op:p0*, theta:p1 @ op:p1*, '
                   'theta:vL @ theta_hc:vL*, theta:vR @ theta_hc:vR*, '
                   'op:p0 @ theta_hc:p0*, op:p1 @ theta_hc:p1*',
        dims=dict(chi=['vR', 'vR*', 'vL', 'vL*'],
                  d=['p0', 'p0*', 'p1', 'p1*']),
        order='optimal',
    )
    res = diagram.evaluate(theta=theta, theta_hc=ct.dagger(theta), op=op)
    expect = _dense_expectation(theta, op)
    np.testing.assert_allclose(complex(ct.item(res)), expect, rtol=1e-10,
                               atol=1e-12)


def test_planarity_validation():
    """Non-planar diagrams are rejected at construction (reference planar.py
    validates planarity; evaluating one would silently braid on fermions).

    The check is the Euler characteristic of the rotation system given by each
    tensor's cyclic leg order, with free pendant ends for open legs.
    """
    # interleaved self-traces (a, b, a*, b*): the classic crossing
    with pytest.raises(ValueError, match='not planar'):
        PlanarDiagram(tensors='T[a, b, ax, bx]',
                      definition='T:a @ T:ax, T:b @ T:bx')
    # nested self-traces (a, b, b*, a*) are planar
    PlanarDiagram(tensors='T[a, b, bx, ax]',
                  definition='T:a @ T:ax, T:b @ T:bx')
    # three parallel edges with the SAME cyclic order at both ends: genus 1
    with pytest.raises(ValueError, match='not planar'):
        PlanarDiagram(tensors='A[x, y, z], B[x, y, z]',
                      definition='A:x @ B:x, A:y @ B:y, A:z @ B:z')
    # opposite cyclic orders: planar
    PlanarDiagram(tensors='A[x, y, z], B[z, y, x]',
                  definition='A:x @ B:x, A:y @ B:y, A:z @ B:z')


def test_planar_permute_rejects_noncyclic(setup):
    theta, op = setup
    with pytest.raises(ValueError, match='cyclic'):
        planar_permute_legs(theta, codomain=['p0', 'vL', 'p1'], domain=['vR'])
    # cyclic rotations are fine and roundtrip
    rot = planar_permute_legs(theta, codomain=['p0', 'p1', 'vR'], domain=['vL'])
    rot.test_sanity()
    back = planar_permute_legs(rot, codomain=['vL', 'p0', 'p1'], domain=['vR'])
    assert ct.almost_equal(back, theta, rtol=1e-12, atol=1e-12)


def test_planar_ops_on_anyons(np_random):
    """Planar decompositions and traces work on anyonic tensors (no levels)."""
    from cyten_tpu.tensors import (
        planar_eigh, planar_partial_trace, planar_qr, planar_svd,
        planar_truncated_svd,
    )

    fib = ct.fibonacci_anyon_category
    be = ct.get_backend(fib, block_backend='numpy')
    V = ElementarySpace(fib, [[0], [1]], [2, 2])
    T = SymmetricTensor.from_random_normal([V, V], [V, V], backend=be,
                                           labels=['a', 'b', 'c', 'd'],
                                           rng=np_random)
    U, S, Vh = planar_svd(T)
    rec = ct.compose(ct.compose(U, S.as_SymmetricTensor()), Vh)
    assert ct.norm(rec - T) < 1e-10 * ct.norm(T)
    Ut, St, Vht, err, _ = planar_truncated_svd(T, chi_max=3)
    assert St.leg.num_sectors <= 2
    Q, R = planar_qr(T)
    assert ct.norm(ct.compose(Q, R) - T) < 1e-10 * ct.norm(T)
    # hermitian: planar_eigh reconstructs (eigh returns (eigenvalues, vectors))
    H = ct.compose(T, ct.dagger(T))
    D, W = planar_eigh(H)
    rec = ct.compose(ct.compose(W, D.as_SymmetricTensor()), ct.dagger(W))
    assert ct.norm(rec - H) < 1e-9 * ct.norm(H)
    # planar partial trace over the adjacent (b, c) pair
    M = ct.permute_legs(T, codomain=['a', 'b'], domain=['d', 'c'])
    tr1 = planar_partial_trace(M, ['b', 'c'])
    tr1.test_sanity()
    # oracle: the same trace through the nonplanar path
    tr2 = ct.partial_trace(M, ['b', 'c'])
    assert ct.norm(tr1 - tr2) < 1e-10 * max(1., ct.norm(tr1))
