"""Decomposition battery over leg configurations and new_leg_dual.

Mirrors the reference's parametrization of test_svd (test_tensors.py:3066),
test_qr_lq (:2908), test_eigh (:1932) over codomain/domain leg counts and the
duality of the new leg — our base tests (test_tensors.py:204-290) pin one
(2 <- 2) configuration with new_leg_dual=False.

All checks are backend-independent identities (reconstruction, isometry, norm
preservation), so the battery runs for anyonic symmetries too.
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import SymmetricTensor

from conftest import random_space


def _make(backend, symmetry, n_cod, n_dom, rng):
    from cyten_tpu.testing import random_tensor

    legs = [random_space(symmetry, rng, max_sectors=3, max_mult=3)
            for _ in range(n_cod + n_dom)]
    return random_tensor(legs[:n_cod], legs[n_cod:], backend=backend, rng=rng)


LEG_CONFIGS = [(1, 1), (2, 1), (1, 2), (3, 1)]


@pytest.mark.parametrize('new_leg_dual', [False, True])
@pytest.mark.parametrize('n_cod,n_dom', LEG_CONFIGS)
def test_svd_configs(n_cod, n_dom, new_leg_dual, make_compatible_backend,
                     any_symmetry, np_random):
    A = _make(make_compatible_backend, any_symmetry, n_cod, n_dom, np_random)
    if ct.norm(A) == 0:
        return  # no charge-compatible blocks for this random draw
    U, S, Vh = ct.svd(A, new_labels=['x', 'x*'], new_leg_dual=new_leg_dual)
    for t in (U, S, Vh):
        t.test_sanity()
    assert S.leg.is_dual == new_leg_dual
    USVh = ct.compose(ct.compose(U, S.as_SymmetricTensor()), Vh)
    assert ct.almost_equal(USVh, A, rtol=1e-9, atol=1e-9)
    eye = SymmetricTensor.from_eye(U.domain.factors, backend=A.backend,
                                   dtype=A.dtype)
    assert ct.almost_equal(ct.compose(ct.dagger(U), U), eye, rtol=1e-9, atol=1e-9)
    assert ct.almost_equal(ct.compose(Vh, ct.dagger(Vh)), eye, rtol=1e-9,
                           atol=1e-9)
    np.testing.assert_allclose(ct.norm(S), ct.norm(A), rtol=1e-9)
    # singular values are non-negative
    assert float(S.min()) >= -1e-14


@pytest.mark.parametrize('new_leg_dual', [False, True])
@pytest.mark.parametrize('n_cod,n_dom', LEG_CONFIGS)
def test_qr_lq_configs(n_cod, n_dom, new_leg_dual, make_compatible_backend,
                       any_symmetry, np_random):
    A = _make(make_compatible_backend, any_symmetry, n_cod, n_dom, np_random)
    if ct.norm(A) == 0:
        return
    Q, R = ct.qr(A, new_labels=['q', 'q*'], new_leg_dual=new_leg_dual)
    Q.test_sanity(), R.test_sanity()
    assert ct.almost_equal(ct.compose(Q, R), A, rtol=1e-9, atol=1e-9)
    eye = SymmetricTensor.from_eye(Q.domain.factors, backend=A.backend,
                                   dtype=A.dtype)
    assert ct.almost_equal(ct.compose(ct.dagger(Q), Q), eye, rtol=1e-9, atol=1e-9)
    L, Q2 = ct.lq(A, new_labels=['q', 'q*'], new_leg_dual=new_leg_dual)
    L.test_sanity(), Q2.test_sanity()
    assert ct.almost_equal(ct.compose(L, Q2), A, rtol=1e-9, atol=1e-9)
    assert ct.almost_equal(ct.compose(Q2, ct.dagger(Q2)), eye, rtol=1e-9,
                           atol=1e-9)


@pytest.mark.parametrize('n_legs', [1, 2])
def test_eigh_configs(n_legs, make_compatible_backend, any_symmetry, np_random):
    from cyten_tpu.testing import random_tensor

    legs = [random_space(any_symmetry, np_random, max_sectors=3, max_mult=2)
            for _ in range(n_legs)]
    A = random_tensor(legs, legs, backend=make_compatible_backend, rng=np_random)
    if ct.norm(A) == 0:
        return
    H = 0.5 * (A + ct.dagger(A))
    W, V = ct.eigh(H)
    W.test_sanity(), V.test_sanity()
    recon = ct.compose(ct.compose(V, W.as_SymmetricTensor()), ct.dagger(V))
    assert ct.almost_equal(recon, H, rtol=1e-8, atol=1e-8)
    # eigenvalues are real
    assert W.dtype.is_real
    # V unitary
    eye = SymmetricTensor.from_eye(V.domain.factors, backend=A.backend,
                                   dtype=H.dtype)
    assert ct.almost_equal(ct.compose(ct.dagger(V), V), eye, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize('n_cod,n_dom', [(1, 1), (2, 1)])
def test_truncated_svd_configs(n_cod, n_dom, make_compatible_backend,
                               any_symmetry, np_random):
    A = _make(make_compatible_backend, any_symmetry, n_cod, n_dom, np_random)
    if ct.norm(A) == 0:
        return
    U, S, Vh, err, renorm = ct.truncated_svd(A, chi_max=2)
    for t in (U, S, Vh):
        t.test_sanity()
    assert int(np.sum(S.leg.multiplicities)) <= 2
    approx = ct.compose(ct.compose(U, S.as_SymmetricTensor()), Vh)
    actual = ct.norm(approx - A) / ct.norm(A)
    np.testing.assert_allclose(actual, err, rtol=1e-7, atol=1e-12)
    assert renorm == 1.  # no normalize_to requested
    # with normalize_to: S is rescaled to the requested norm
    U2, S2, Vh2, err2, renorm2 = ct.truncated_svd(A, chi_max=2, normalize_to=1.0)
    np.testing.assert_allclose(ct.norm(S2), 1.0, rtol=1e-9)
    np.testing.assert_allclose(err2, err, rtol=1e-9, atol=1e-12)
