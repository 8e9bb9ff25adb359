"""Constructor and scalar-operation batteries across the fixture matrix.

Reference: tests/python_tests/test_tensors.py:149 (test_SymmetricTensor) and
the scalar-ops sections — from_zero/from_eye/from_random/from_sector_* /
from_sector_projection / trivial-sector IO, dtype conversion, inner-product
axioms, dagger involution.
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import DiagonalTensor, SymmetricTensor
from cyten_tpu.dtypes import Dtype

from conftest import random_space


@pytest.fixture
def spaces(any_symmetry, np_random):
    return [random_space(any_symmetry, np_random, max_sectors=3)
            for _ in range(3)]


def test_from_zero_and_linearity(make_compatible_backend, spaces, np_random,
                                 any_symmetry):
    V, W, X = spaces
    # square layout guarantees allowed blocks for every symmetry
    Z = SymmetricTensor.from_zero([V, W], [V, W], backend=make_compatible_backend)
    Z.test_sanity()
    assert ct.norm(Z) == 0
    T = SymmetricTensor.from_random_normal([V, W], [V, W],
                                           backend=make_compatible_backend,
                                           rng=np_random)
    assert ct.norm(T) > 0
    assert ct.almost_equal(T + Z, T, rtol=1e-12, atol=1e-14)
    # scalar algebra
    assert ct.norm(2. * T - T - T) < 1e-12 * ct.norm(T)
    assert abs(ct.norm(-1. * T) - ct.norm(T)) < 1e-12 * ct.norm(T)


def test_from_eye_identity(make_compatible_backend, spaces, np_random):
    V, W, _ = spaces
    eye = SymmetricTensor.from_eye([V, W], backend=make_compatible_backend)
    eye.test_sanity()
    T = SymmetricTensor.from_random_normal([V, W], [V, W],
                                           backend=make_compatible_backend,
                                           rng=np_random)
    assert ct.almost_equal(ct.compose(eye, T), T, rtol=1e-12, atol=1e-12)
    assert ct.almost_equal(ct.compose(T, eye), T, rtol=1e-12, atol=1e-12)
    # trace of the identity is the (quantum) dimension of the product space
    tr = complex(ct.trace(eye))
    from cyten_tpu.symmetries import TensorProduct

    tp = TensorProduct([V, W])
    qdim = sum(V.symmetry.qdim(np.asarray(c)) * int(m)
               for c, m in zip(tp.sector_decomposition, tp.multiplicities))
    np.testing.assert_allclose(tr, qdim, rtol=1e-10)


def test_from_sector_block_func(make_compatible_backend, spaces, any_symmetry):
    V, W, _ = spaces
    backend = make_compatible_backend
    marker = {}

    def func(shape, coupled):
        key = tuple(int(x) for x in np.atleast_1d(coupled))
        marker[key] = shape
        return backend.block_backend.as_block(np.full(shape, 1.), Dtype.float64)

    T = SymmetricTensor.from_sector_block_func(func, [V], [V], backend=backend)
    T.test_sanity()
    assert len(marker) > 0
    # every marked sector appears in both legs' decompositions
    for key in marker:
        assert V.sector_decomposition_where(np.asarray(key)) is not None


def test_from_random_uniform_and_dtypes(make_compatible_backend, spaces,
                                        np_random, any_symmetry):
    V, W, _ = spaces
    T = SymmetricTensor.from_random_uniform([V], [W],
                                            backend=make_compatible_backend,
                                            dtype=Dtype.float64, rng=np_random)
    T.test_sanity()
    if any_symmetry.can_be_dropped:
        arr = T.to_numpy()
        assert np.all(np.abs(arr) <= 1. + 1e-12)
    # dtype conversion roundtrip
    Tc = T.to_dtype(Dtype.complex128)
    Tc.test_sanity()
    assert Tc.dtype == Dtype.complex128
    assert abs(ct.norm(Tc) - ct.norm(T)) < 1e-12 * max(1., ct.norm(T))
    Tf = Tc.to_dtype(Dtype.float64)
    assert ct.almost_equal(Tf, T, rtol=1e-12, atol=1e-14)


def test_from_sector_projection(make_compatible_backend, spaces, np_random,
                                any_symmetry):
    """P_c is an orthogonal projector summing to the identity over sectors.

    (The reference stubs this constructor; here it must work, PARITY.md.)
    """
    from cyten_tpu.symmetries import TensorProduct

    V, W, _ = spaces
    tp = TensorProduct([V, W])
    backend = make_compatible_backend
    total = None
    for c in tp.sector_decomposition:
        P = SymmetricTensor.from_sector_projection([V, W], c, backend=backend)
        P.test_sanity()
        # idempotent
        assert ct.norm(ct.compose(P, P) - P) < 1e-10 * max(1., ct.norm(P))
        total = P if total is None else total + P
    eye = SymmetricTensor.from_eye([V, W], backend=backend)
    assert ct.almost_equal(total, eye, rtol=1e-10, atol=1e-10)


def test_trivial_sector_io(make_compatible_backend, spaces, np_random,
                           any_symmetry):
    """from/to_dense_block_trivial_sector roundtrip (reference stubs these)."""
    if not any_symmetry.can_be_dropped:
        pytest.skip('needs dense representation')
    V = spaces[0]
    idx = V.sector_decomposition_where(any_symmetry.trivial_sector)
    if idx is None:
        pytest.skip('no trivial sector in this leg')
    mult = int(V.multiplicities[idx])
    vec = np_random.normal(size=mult)
    T = SymmetricTensor.from_dense_block_trivial_sector(
        vec, V, backend=make_compatible_backend)
    T.test_sanity()
    back = T.to_dense_block_trivial_sector()
    np.testing.assert_allclose(
        make_compatible_backend.block_backend.to_numpy(back), vec,
        rtol=1e-12, atol=1e-14)


def test_inner_axioms(make_compatible_backend, spaces, np_random, any_symmetry):
    V, W, X = spaces
    be = make_compatible_backend
    A = SymmetricTensor.from_random_normal([V, W], [V, W], backend=be,
                                           rng=np_random, dtype=Dtype.complex128)
    B = SymmetricTensor.from_random_normal([V, W], [V, W], backend=be,
                                           rng=np_random, dtype=Dtype.complex128)
    ab = complex(ct.inner(A, B))
    ba = complex(ct.inner(B, A))
    np.testing.assert_allclose(ab, np.conj(ba), rtol=1e-10, atol=1e-12)
    # sesquilinearity and norm compatibility
    np.testing.assert_allclose(complex(ct.inner(A, 2j * B)), 2j * ab,
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(complex(ct.inner(A, A)), ct.norm(A) ** 2,
                               rtol=1e-10)
    if any_symmetry.can_be_dropped and any_symmetry.has_symmetric_braid:
        a, b = A.to_numpy(), B.to_numpy()
        np.testing.assert_allclose(ab, np.sum(np.conj(a) * b), rtol=1e-10)


def test_dagger_involution(make_compatible_backend, spaces, np_random):
    V, W, X = spaces
    T = SymmetricTensor.from_random_normal([V, W], [V],
                                           backend=make_compatible_backend,
                                           rng=np_random, dtype=Dtype.complex128,
                                           labels=['a', 'b', 'c'])
    if ct.norm(T) == 0:
        T = SymmetricTensor.from_random_normal(
            [V, W], [V, W], backend=make_compatible_backend, rng=np_random,
            dtype=Dtype.complex128, labels=['a', 'b', 'c', 'd'])
    DD = ct.dagger(ct.dagger(T))
    DD.test_sanity()
    assert DD.labels == T.labels
    assert ct.almost_equal(DD, T, rtol=1e-12, atol=1e-14)
    # norm invariance and <A, B> = <B^dag, A^dag>*
    assert abs(ct.norm(ct.dagger(T)) - ct.norm(T)) < 1e-12 * ct.norm(T)


def test_diagonal_from_tensor_roundtrip(make_compatible_backend, spaces,
                                        np_random, any_symmetry):
    V = spaces[0]
    D = DiagonalTensor.from_random_normal(V, backend=make_compatible_backend,
                                          rng=np_random)
    T = D.as_SymmetricTensor()
    D2 = DiagonalTensor.from_tensor(T, check_offdiagonal=True)
    D2.test_sanity()
    assert ct.norm(D2 - D) < 1e-12 * max(1., ct.norm(D))
    # from_diag dense path
    if any_symmetry.can_be_dropped:
        diag = D.diag_numpy
        D3 = DiagonalTensor.from_diag(diag, V, backend=make_compatible_backend)
        np.testing.assert_allclose(D3.diag_numpy, diag, rtol=1e-10, atol=1e-12)
