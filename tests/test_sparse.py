"""Tests for the sparse LinearOperator wrappers (cf. reference test_sparse.py)."""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import SymmetricTensor
from cyten_tpu.symmetries import ElementarySpace
from cyten_tpu.tensors import (
    HermitianNumpyArrayLinearOperator, NumpyArrayLinearOperator,
    ProjectedLinearOperator, ShiftedLinearOperator, SumLinearOperator,
    TensorLinearOperator, gram_schmidt, inner, norm,
)


@pytest.fixture
def setup():
    leg = ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [2, 3, 2])
    be = ct.get_backend(ct.u1_symmetry, 'numpy')
    rng = np.random.default_rng(42)
    H = SymmetricTensor.from_random_normal([leg], [leg], backend=be, rng=rng,
                                           labels=['a', 'a*'])
    H = 0.5 * (H + H.hc)
    v = SymmetricTensor.from_random_normal([leg], [], backend=be, rng=rng,
                                           labels=['a'])
    return H, v


def test_tensor_linear_operator(setup):
    """Works here, unlike the reference's stub (reference sparse.py:89)."""
    H, v = setup
    op = TensorLinearOperator(H, which_legs=['a'])
    w = op.matvec(v)
    from cyten_tpu.tensors import tdot

    expect = tdot(H, v, 'a*', 'a').relabelled(['a'])
    np.testing.assert_allclose(w.to_numpy(), expect.to_numpy(), atol=1e-12)


def test_sum_shift_project(setup):
    H, v = setup
    op = TensorLinearOperator(H, which_legs=['a'])
    s = SumLinearOperator(op, op)
    np.testing.assert_allclose(s.matvec(v).to_numpy(), 2 * op.matvec(v).to_numpy(),
                               atol=1e-12)
    sh = ShiftedLinearOperator(op, shift=2.5)
    np.testing.assert_allclose(sh.matvec(v).to_numpy(),
                               op.matvec(v).to_numpy() + 2.5 * v.to_numpy(),
                               atol=1e-12)
    o = (1. / norm(v)) * v
    p = ProjectedLinearOperator(op, [o])
    w = p.matvec(v)
    assert abs(inner(o, w)) < 1e-10  # output orthogonal to o


def test_numpy_array_operator_eigenvectors(setup):
    H, v = setup
    op = TensorLinearOperator(H, which_legs=['a'])
    wrapped = HermitianNumpyArrayLinearOperator(op, v)
    vals, vecs = wrapped.eigenvectors(num_ev=1, which='SA')
    # compare with dense spectrum restricted to the symmetric subspace:
    # symmetric vectors live in all sectors, H dense is block diagonal
    dense = H.to_numpy()
    evals = np.linalg.eigvalsh(dense)
    np.testing.assert_allclose(vals[0], evals[0], atol=1e-8)
    w = vecs[0]
    np.testing.assert_allclose(op.matvec(w).to_numpy(), vals[0] * w.to_numpy(),
                               atol=1e-8)


def test_gram_schmidt(setup):
    H, v = setup
    rng = np.random.default_rng(7)
    be = v.backend
    leg = v.codomain.factors[0]
    vecs = [SymmetricTensor.from_random_normal([leg], [], backend=be, rng=rng,
                                               labels=['a']) for _ in range(3)]
    ortho = gram_schmidt(vecs)
    for i, a in enumerate(ortho):
        for j, b in enumerate(ortho):
            np.testing.assert_allclose(inner(a, b), float(i == j), atol=1e-12)
