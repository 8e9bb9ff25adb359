"""Tensor-op tests against the dense numpy oracle.

Pattern per reference test_tensors.py: build random symmetric tensors, perform the op
symbolically, compare ``to_numpy()`` against the plain-numpy result.

Braided symmetries (reference test_tensors.py:1737,3283 and conftest.py:239-251):
- graded symmetries with a dense representation (fermions): the dense oracle for
  *braided* leg moves inserts explicit swap gates (testing/swap_gate_numpy.py);
  planar ops (compose, combine/split, decompositions) compare directly.
- anyonic symmetries (``not symmetry.can_be_dropped``): no dense oracle exists; ops
  are exercised for structure (test_sanity, leg bookkeeping) and checked through
  backend-independent identities (isometry, reconstruction, norm preservation).
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import DiagonalTensor, Mask, SymmetricTensor, TensorProduct
from cyten_tpu.symmetries import ElementarySpace
from cyten_tpu.testing import swap_gate_numpy

from conftest import braid_levels, random_space


def random_tensor(backend, codomain, domain, rng, labels=None):
    return SymmetricTensor.from_random_normal(codomain, domain, backend=backend,
                                              labels=labels, rng=rng)


def assert_close(t, arr, atol=1e-10):
    np.testing.assert_allclose(t.to_numpy(), arr, rtol=1e-10, atol=atol)


@pytest.fixture
def spaces(any_symmetry, np_random):
    return [random_space(any_symmetry, np_random) for _ in range(4)]


def test_roundtrip_and_sanity(make_compatible_backend, spaces, np_random,
                              any_symmetry):
    V, W, X, Y = spaces
    T = random_tensor(make_compatible_backend, [V, W], [X, Y], np_random,
                      labels=['a', 'b', 'c', 'd'])
    T.test_sanity()
    if not any_symmetry.can_be_dropped:
        # no dense representation; norm and copy consistency instead
        assert ct.norm(T) >= 0
        np.testing.assert_allclose(ct.inner(T, T).real, ct.norm(T) ** 2,
                                   rtol=1e-10, atol=1e-10)
        return
    arr = T.to_numpy()
    assert arr.shape == T.shape
    T2 = SymmetricTensor.from_dense_block(arr, [V, W], [X, Y],
                                          backend=make_compatible_backend)
    T2.test_sanity()
    assert_close(T2, arr)


def test_compose_tdot(make_compatible_backend, spaces, np_random, any_symmetry):
    V, W, X, Y = spaces
    A = random_tensor(make_compatible_backend, [V, W], [X, Y], np_random)
    B = random_tensor(make_compatible_backend, [X, Y], [W], np_random)
    C = ct.compose(A, B)
    C.test_sanity()
    if any_symmetry.can_be_dropped:
        a, b = A.to_numpy(), B.to_numpy()
        # A legs [V, W, Y*, X*]; A.domain factor order [X, Y] at axes (3, 2)
        c = np.tensordot(a, b, ([3, 2], [0, 1]))
        assert_close(C, c)
    else:
        # anyonic: compose against the isometry identity U^dag (U S) == S
        U, S, Vh = ct.svd(A, new_labels=['x', 'x*'])
        US = ct.compose(U, S.as_SymmetricTensor())
        UdUS = ct.compose(ct.dagger(U), US)
        assert ct.almost_equal(UdUS, S.as_SymmetricTensor(), rtol=1e-8, atol=1e-8)
    if not any_symmetry.has_symmetric_braid:
        return  # tdot below auto-permutes -> needs explicit levels for anyons
    # tdot: contract A leg 3 (X*) with B leg 0 (X)
    D = ct.tdot(A, B, [3], [0])
    D.test_sanity()
    if any_symmetry.can_be_dropped:
        a, b = A.to_numpy(), B.to_numpy()
        d = np.tensordot(a, b, ([3], [0]))  # axes [V, W, Y*, Y*b, W*b]
        assert_close(D, d)


def test_tdot_full_contraction(make_compatible_backend, spaces, np_random,
                               any_symmetry):
    V, W = spaces[:2]
    A = random_tensor(make_compatible_backend, [V], [W], np_random)
    if not any_symmetry.has_symmetric_braid:
        return  # automatic leg permutation in tdot needs levels
    B = random_tensor(make_compatible_backend, [W], [V], np_random)
    res = ct.tdot(A, B, [0, 1], [1, 0])
    if any_symmetry.can_be_dropped:
        a, b = A.to_numpy(), B.to_numpy()
        expect = np.tensordot(a, b, ([0, 1], [1, 0]))
        if isinstance(res, ct.Tensor):
            res = ct.item(res)
        np.testing.assert_allclose(res, expect.item(), rtol=1e-10, atol=1e-10)


def test_permute_dagger_transpose(make_compatible_backend, spaces, np_random,
                                  any_symmetry):
    V, W, X, Y = spaces
    A = random_tensor(make_compatible_backend, [V, W], [X, Y], np_random,
                      labels=['a', 'b', 'c', 'd'])
    can_dense = any_symmetry.can_be_dropped
    a = A.to_numpy() if can_dense else None
    levels = braid_levels(any_symmetry, 4, np_random)
    P = ct.permute_legs(A, codomain=[0, 3], domain=[1, 2], levels=levels)
    P.test_sanity()
    if can_dense:
        # dense oracle with explicit swap gates (exact for symmetric braiding)
        assert_close(P, swap_gate_numpy(a, A.legs, [0, 3, 2, 1]))
    else:
        np.testing.assert_allclose(ct.norm(P), ct.norm(A), rtol=1e-10)
    D = ct.dagger(A)
    D.test_sanity()
    assert D.labels == ['d*', 'c*', 'b*', 'a*']
    if can_dense:
        assert_close(D, a.conj().transpose(3, 2, 1, 0))
    T = ct.transpose(A)
    T.test_sanity()
    if can_dense and any_symmetry.has_trivial_braid:
        assert_close(T, a.transpose(2, 3, 0, 1))
    else:
        np.testing.assert_allclose(ct.norm(T), ct.norm(A), rtol=1e-10)
    # bend all legs up / down (planar; valid for every braiding style)
    B1 = ct.bend_legs(A, num_codomain_legs=4)
    B1.test_sanity()
    B2 = ct.bend_legs(A, num_codomain_legs=0)
    B2.test_sanity()
    if can_dense:
        assert_close(B1, a)
        assert_close(B2, a)
    else:
        # bends are Z-isomorphisms: bending back must reproduce the tensor
        R1 = ct.bend_legs(B1, num_codomain_legs=2)
        assert ct.almost_equal(R1, A, rtol=1e-10, atol=1e-10)


def test_outer_inner(make_compatible_backend, spaces, np_random, any_symmetry):
    V, W, X, Y = spaces
    A = random_tensor(make_compatible_backend, [V], [W], np_random)
    B = random_tensor(make_compatible_backend, [X], [Y], np_random)
    O = ct.outer(A, B)
    O.test_sanity()
    if any_symmetry.can_be_dropped:
        a, b = A.to_numpy(), B.to_numpy()
        # O: codomain [V, X], domain [W, Y]; legs [V, X, Y*, W*]: B's legs pass
        # A's domain leg W* -> swap-gate oracle on the interleaving permutation
        dense = np.tensordot(a, b, 0)  # axes [V, W*, X, Y*]
        legs = [A.legs[0], A.legs[1], B.legs[0], B.legs[1]]
        expect = swap_gate_numpy(dense, legs, [0, 2, 3, 1])
        assert_close(O, expect)
    # inner
    A2 = random_tensor(make_compatible_backend, [V], [W], np_random)
    expect = ct.inner(A, A2)
    if any_symmetry.can_be_dropped:
        a = A.to_numpy()
        np.testing.assert_allclose(expect, np.sum(np.conj(a) * A2.to_numpy()),
                                   rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(ct.inner(A, A).real, ct.norm(A) ** 2,
                               rtol=1e-10, atol=1e-10)


def test_combine_split_roundtrip(make_compatible_backend, spaces, np_random,
                                 any_symmetry):
    V, W, X, Y = spaces
    A = random_tensor(make_compatible_backend, [V, W], [X, Y], np_random,
                      labels=['a', 'b', 'c', 'd'])
    can_dense = any_symmetry.can_be_dropped
    a = A.to_numpy() if can_dense else None
    # combine codomain group
    C = ct.combine_legs(A, [0, 1])
    C.test_sanity()
    assert C.labels[0] == '(a.b)'
    if can_dense:
        assert_close(C, a.reshape(-1, *a.shape[2:]))
    S = ct.split_legs(C, 0)
    S.test_sanity()
    assert S.labels == ['a', 'b', 'c', 'd']
    assert ct.almost_equal(S, A, rtol=1e-10, atol=1e-10)
    # combine domain group
    C2 = ct.combine_legs(A, [2, 3])
    C2.test_sanity()
    if can_dense:
        assert_close(C2, a.reshape(*a.shape[:2], -1))
    S2 = ct.split_legs(C2)
    S2.test_sanity()
    assert ct.almost_equal(S2, A, rtol=1e-10, atol=1e-10)
    # combine both
    C3 = ct.combine_legs(A, [0, 1], [2, 3])
    C3.test_sanity()
    if can_dense:
        assert_close(C3, a.reshape(a.shape[0] * a.shape[1], -1))
    S3 = ct.split_legs(C3)
    S3.test_sanity()
    assert ct.almost_equal(S3, A, rtol=1e-10, atol=1e-10)


def test_svd(make_compatible_backend, spaces, np_random):
    V, W, X, Y = spaces
    A = random_tensor(make_compatible_backend, [V, W], [X, Y], np_random,
                      labels=['a', 'b', 'c', 'd'])
    U, S, Vh = ct.svd(A, new_labels=['x', 'x*'])
    U.test_sanity()
    S.test_sanity()
    Vh.test_sanity()
    # reconstruction
    US = ct.compose(U, S.as_SymmetricTensor())
    USVh = ct.compose(US, Vh)
    assert ct.almost_equal(USVh, A.as_SymmetricTensor(), rtol=1e-10, atol=1e-10)
    # isometry
    UdU = ct.compose(ct.dagger(U), U)
    eye = SymmetricTensor.from_eye(U.domain.factors, backend=A.backend,
                                   dtype=A.dtype)
    assert ct.almost_equal(UdU, eye, rtol=1e-10, atol=1e-10)
    VhVhd = ct.compose(Vh, ct.dagger(Vh))
    assert ct.almost_equal(VhVhd, eye, rtol=1e-10, atol=1e-10)
    # norm preserved
    np.testing.assert_allclose(ct.norm(S), ct.norm(A), rtol=1e-10)


def test_truncated_svd(make_compatible_backend, spaces, np_random):
    V, W, X, Y = spaces
    A = random_tensor(make_compatible_backend, [V, W], [X, Y], np_random)
    if ct.norm(A) == 0:
        # no charge-compatible blocks for these random spaces; make it nontrivial
        A = random_tensor(make_compatible_backend, [V, W], [W, V], np_random)
    assert ct.norm(A) > 0
    U, S, Vh, err, renorm = ct.truncated_svd(A, chi_max=3)
    U.test_sanity(), S.test_sanity(), Vh.test_sanity()
    # chi counts kept multiplets (singular values), as in the reference solver
    assert int(np.sum(S.leg.multiplicities)) <= 3
    # error estimate matches actual
    approx = ct.compose(ct.compose(U, S.as_SymmetricTensor()), Vh)
    actual_err = ct.norm(approx - A) / ct.norm(A)
    np.testing.assert_allclose(actual_err, err, rtol=1e-8, atol=1e-12)


def test_qr_lq(make_compatible_backend, spaces, np_random):
    V, W, X, Y = spaces
    A = random_tensor(make_compatible_backend, [V, W], [X, Y], np_random)
    Q, R = ct.qr(A)
    Q.test_sanity(), R.test_sanity()
    assert ct.almost_equal(ct.compose(Q, R), A, rtol=1e-10, atol=1e-10)
    QdQ = ct.compose(ct.dagger(Q), Q)
    eye = SymmetricTensor.from_eye(Q.domain.factors, backend=A.backend, dtype=A.dtype)
    assert ct.almost_equal(QdQ, eye, rtol=1e-10, atol=1e-10)
    L, Q2 = ct.lq(A)
    L.test_sanity(), Q2.test_sanity()
    assert ct.almost_equal(ct.compose(L, Q2), A, rtol=1e-10, atol=1e-10)


def test_eigh_exp(make_compatible_backend, spaces, np_random, any_symmetry):
    V, W = spaces[:2]
    A = random_tensor(make_compatible_backend, [V, W],
                      list(TensorProduct([V, W]).factors), np_random)
    H = 0.5 * (A + ct.dagger(A))
    W_, V_ = ct.eigh(H)
    W_.test_sanity(), V_.test_sanity()
    recon = ct.compose(ct.compose(V_, W_.as_SymmetricTensor()), ct.dagger(V_))
    assert ct.almost_equal(recon, H, rtol=1e-9, atol=1e-9)
    # exp
    E = ct.exp(H)
    E.test_sanity()
    if not any_symmetry.can_be_dropped:
        # exp(H) exp(-H) == id (backend-independent identity)
        E2 = ct.exp(-1. * H)
        eye = SymmetricTensor.from_eye(H.domain.factors, backend=H.backend,
                                       dtype=H.dtype, labels=H.labels[:2])
        assert ct.almost_equal(ct.compose(E, E2), eye, rtol=1e-8, atol=1e-8)
        return
    h = H.to_numpy()
    d = h.shape[0] * h.shape[1]
    # legs [V, W, W*, V*]: matrix form needs transpose of domain axes to factor order
    hm = h.transpose(0, 1, 3, 2).reshape(d, d)
    import scipy.linalg

    em = scipy.linalg.expm(hm).reshape(h.shape[0], h.shape[1], h.shape[3],
                                       h.shape[2]).transpose(0, 1, 3, 2)
    assert_close(E, em, atol=1e-9)


def test_trace_partial_trace(make_compatible_backend, spaces, np_random,
                             any_symmetry):
    V, W = spaces[:2]
    A = random_tensor(make_compatible_backend, [V, W], [V, W], np_random)
    tr = ct.trace(A)
    # trace = sum of eigenvalue-like diagonal: always defined; for anyons it is the
    # quantum trace. Cross-check trace(A) == trace(partial_trace chains).
    P = ct.partial_trace(A, (1, 2))
    P.test_sanity()
    tr2 = ct.trace(P)
    np.testing.assert_allclose(tr, tr2, rtol=1e-10, atol=1e-10)
    if not any_symmetry.can_be_dropped:
        return
    a = A.to_numpy()
    np.testing.assert_allclose(tr, np.trace(
        a.transpose(0, 1, 3, 2).reshape(a.shape[0] * a.shape[1], -1)),
        rtol=1e-10, atol=1e-10)
    # partial trace of the (W, W*) pair: legs 1 and 2
    expect = np.einsum('ijjl->il', a)
    assert_close(P, expect)


def test_diagonal(make_compatible_backend, spaces, np_random, any_symmetry):
    V = spaces[0]
    D = DiagonalTensor.from_random_normal(V, backend=make_compatible_backend,
                                          rng=np_random)
    D.test_sanity()
    # elementwise algebra (blockwise; valid for every symmetry)
    E = D * D + 2 * D - 1
    E.test_sanity()
    # comparisons -> bool -> Mask
    pos = D > 0
    assert pos.dtype == ct.Dtype.bool
    mask = Mask.from_DiagonalTensor(pos)
    mask.test_sanity()
    # scale_axis == compose with diagonal
    A = random_tensor(make_compatible_backend, [V], [V], np_random)
    AD = ct.compose(A, D)
    DA = ct.compose(D, A)
    AD.test_sanity(), DA.test_sanity()
    if not any_symmetry.can_be_dropped:
        # identity: D_inv . (A . D) recovers A on the supported multiplets
        np.testing.assert_allclose(
            ct.trace(ct.compose(AD, ct.dagger(ct.compose(AD, 0. * D + 1.)))).real,
            ct.trace(ct.compose(AD, ct.dagger(AD))).real, rtol=1e-10)
        return
    diag = D.diag_numpy
    full = D.to_dense_block()
    np.testing.assert_allclose(np.diag(diag),
                               make_compatible_backend.block_backend.to_numpy(full),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(E.diag_numpy, diag * diag + 2 * diag - 1,
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_array_equal(mask.blockmask(), diag > 0)
    np.testing.assert_allclose(AD.to_numpy(), A.to_numpy() * diag[None, :],
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(DA.to_numpy(), diag[:, None] * A.to_numpy(),
                               rtol=1e-10, atol=1e-10)


def test_mask(make_compatible_backend, spaces, np_random, any_symmetry):
    V, W = spaces[:2]
    if not any_symmetry.can_be_dropped:
        # no public dense basis: build the mask from a diagonal comparison instead
        D = DiagonalTensor.from_random_normal(V, backend=make_compatible_backend,
                                              rng=np_random)
        mask = Mask.from_DiagonalTensor(D > 0)
        mask.test_sanity()
        A = random_tensor(make_compatible_backend, [V, W], [W], np_random)
        Am = ct.apply_mask(A, mask, 0)
        Am.test_sanity()
        assert Am.codomain.factors[0] == mask.small_leg
        Ae = ct.enlarge_leg(Am, mask, 0)
        Ae.test_sanity()
        # project-enlarge-project is idempotent
        Am2 = ct.apply_mask(Ae, mask, 0)
        assert ct.almost_equal(Am2, Am, rtol=1e-10, atol=1e-10)
        return
    # keep/drop whole multiplets (required for dim > 1 sectors): build internal
    # state-major mask per sector, then map to the public basis
    internal = np.zeros(int(V.dim), dtype=bool)
    for i in range(V.num_sectors):
        d = int(V.sector_dims[i])
        m = int(V.multiplicities[i])
        keep = np_random.integers(2, size=m).astype(bool)
        internal[int(V.slices[i, 0]):int(V.slices[i, 1])] = np.tile(keep, d)
    if not internal.any():
        internal[:int(V.sector_dims[0]) * 1] = True  # keep first multiplet whole
        internal[int(V.slices[0, 0]):int(V.slices[0, 1])] = np.tile(
            np.eye(1, int(V.multiplicities[0]), dtype=bool)[0],
            int(V.sector_dims[0]))
    blockmask = internal[V.inverse_basis_perm] if V._basis_perm is not None \
        else internal
    mask = Mask.from_blockmask(blockmask, V, backend=make_compatible_backend)
    mask.test_sanity()
    np.testing.assert_array_equal(mask.blockmask(), blockmask)
    # apply to a tensor leg
    A = random_tensor(make_compatible_backend, [V, W], [W], np_random)
    a = A.to_numpy()
    Am = ct.apply_mask(A, mask, 0)
    Am.test_sanity()
    np.testing.assert_allclose(Am.to_numpy(), a[blockmask], rtol=1e-10, atol=1e-10)
    # enlarge back: zero-fill
    Ae = ct.enlarge_leg(Am, mask, 0)
    Ae.test_sanity()
    expect = np.zeros_like(a)
    expect[blockmask] = a[blockmask]
    np.testing.assert_allclose(Ae.to_numpy(), expect, rtol=1e-10, atol=1e-10)
    # boolean algebra
    mask2 = Mask.from_blockmask(~blockmask, V, backend=make_compatible_backend)
    assert not (mask & mask2).any() or int((mask & mask2).small_leg.dim) == 0
    assert (mask | mask2).all()
    # full tensor
    full = mask.as_SymmetricTensor()
    full.test_sanity()
    expect_full = np.eye(int(V.dim))[blockmask]
    np.testing.assert_allclose(full.to_numpy(), expect_full, rtol=1e-10, atol=1e-10)


def test_add_squeeze_trivial_leg(make_compatible_backend, spaces, np_random,
                                 any_symmetry):
    V, W = spaces[:2]
    A = random_tensor(make_compatible_backend, [V], [W], np_random,
                      labels=['a', 'b'])
    B = ct.add_trivial_leg(A, 1, label='triv')
    B.test_sanity()
    assert B.labels == ['a', 'triv', 'b']
    C = ct.squeeze_legs(B)
    C.test_sanity()
    assert ct.almost_equal(C, A, rtol=1e-10, atol=1e-10)
    if any_symmetry.can_be_dropped:
        a = A.to_numpy()
        np.testing.assert_allclose(B.to_numpy(), a[:, None, :], rtol=1e-10,
                                   atol=1e-10)
        np.testing.assert_allclose(C.to_numpy(), a, rtol=1e-10, atol=1e-10)


def test_norm_linearity(make_compatible_backend, spaces, np_random, any_symmetry):
    V, W = spaces[:2]
    A = random_tensor(make_compatible_backend, [V], [W], np_random)
    B = random_tensor(make_compatible_backend, [V], [W], np_random)
    C = 2 * A - 0.5 * B
    C.test_sanity()
    if any_symmetry.can_be_dropped:
        a, b = A.to_numpy(), B.to_numpy()
        np.testing.assert_allclose(C.to_numpy(), 2 * a - 0.5 * b, rtol=1e-10,
                                   atol=1e-10)
        np.testing.assert_allclose(ct.norm(A), np.linalg.norm(a.reshape(-1)),
                                   rtol=1e-10)
    else:
        # triangle inequality + exact inner-product linearity
        assert ct.norm(C) <= 2 * ct.norm(A) + 0.5 * ct.norm(B) + 1e-10
        np.testing.assert_allclose(
            ct.inner(A, C), 2 * ct.inner(A, A) - 0.5 * ct.inner(A, B),
            rtol=1e-10, atol=1e-10)


def test_eye(make_compatible_backend, spaces, np_random, any_symmetry):
    V, W = spaces[:2]
    E = SymmetricTensor.from_eye([V, W], backend=make_compatible_backend,
                                 labels=['a', 'b'])
    E.test_sanity()
    assert E.labels == ['a', 'b', 'b*', 'a*']
    # compose with eye is identity
    A = random_tensor(make_compatible_backend, [V, W], [V, W], np_random)
    A2 = ct.compose(E, A)
    assert ct.almost_equal(A2, A, rtol=1e-10, atol=1e-10)
    if any_symmetry.can_be_dropped:
        d1, d2 = int(V.dim), int(W.dim)
        expect = np.eye(d1 * d2).reshape(d1, d2, d1, d2).transpose(0, 1, 3, 2)
        np.testing.assert_allclose(E.to_numpy(), expect, rtol=1e-10, atol=1e-10)


def test_getitem(make_compatible_backend, spaces, np_random, any_symmetry):
    if not any_symmetry.can_be_dropped:
        return  # elementwise access needs a dense basis
    V, W = spaces[:2]
    A = random_tensor(make_compatible_backend, [V], [W], np_random)
    a = A.to_numpy()
    for _ in range(5):
        i = int(np_random.integers(int(V.dim)))
        j = int(np_random.integers(int(W.dim)))
        np.testing.assert_allclose(A[i, j], a[i, j], rtol=1e-10, atol=1e-12)


def test_scale_axis_braided(make_compatible_backend, spaces, np_random,
                            any_symmetry):
    """scale_axis on each leg, incl. domain legs, under every symmetry."""
    V, W = spaces[:2]
    A = random_tensor(make_compatible_backend, [V, W], [V], np_random,
                      labels=['a', 'b', 'c'])
    D = DiagonalTensor.from_random_normal(V, backend=make_compatible_backend,
                                          rng=np_random)
    for leg in [0, 2]:
        R = ct.scale_axis(A, D, leg)
        R.test_sanity()
        assert R.codomain == A.codomain and R.domain == A.domain
        if any_symmetry.can_be_dropped:
            a = A.to_numpy()
            diag = D.diag_numpy
            expect = np.swapaxes(np.swapaxes(a, leg, -1) * diag, leg, -1)
            assert_close(R, expect)


def test_jit_compose(make_compatible_backend, spaces, np_random):
    """Tensors are pytrees: jit over tensor-valued functions works."""
    import jax

    if make_compatible_backend.block_backend.name != 'jax':
        pytest.skip('jit requires jax blocks')
    V, W, X, Y = spaces
    A = random_tensor(make_compatible_backend, [V, W], [X, Y], np_random)
    B = random_tensor(make_compatible_backend, [X, Y], [W], np_random)

    @jax.jit
    def f(a, b):
        return ct.compose(a, b)

    C1 = f(A, B)
    C2 = ct.compose(A, B)
    np.testing.assert_allclose(np.asarray(ct.norm(C1)), np.asarray(ct.norm(C2)),
                               rtol=1e-10, atol=1e-10)
    # second call hits the cache
    C3 = f(A, B)
    assert ct.almost_equal(C3, C2, rtol=1e-10, atol=1e-10)


def test_charged_outer_two_charge_legs():
    """outer of two ChargedTensors combines charge legs (from_two_charge_legs)."""
    import cyten_tpu as ct
    from cyten_tpu.tensors import outer

    sym = ct.u1_symmetry
    leg = ct.ElementarySpace(sym, [[-1], [0], [1]], [1, 2, 1])
    be = ct.get_backend(sym, 'numpy')

    def random_charged(charge_sectors, prefix, seed):
        r = np.random.default_rng(seed)
        charge_leg = ct.ElementarySpace.from_defining_sectors(
            sym, charge_sectors, [1] * len(charge_sectors))
        inv = ct.SymmetricTensor.from_random_normal(
            [leg], [charge_leg, leg], backend=be, rng=r,
            labels=[[f'{prefix}c'], ['!', f'{prefix}d']])
        state = r.normal(size=(charge_leg.dim,))
        return ct.ChargedTensor(inv, state)

    for cs1, cs2 in [([[1]], [[-1]]), ([[1], [2]], [[-1], [-2]])]:
        t1 = random_charged(cs1, 'x', 5)
        t2 = random_charged(cs2, 'y', 6)
        res = outer(t1, t2)
        res.test_sanity()
        d1 = np.asarray(t1.to_dense_block())
        d2 = np.asarray(t2.to_dense_block())
        expect = np.einsum('ab,cd->acdb', d1, d2)
        np.testing.assert_allclose(np.asarray(res.to_dense_block()), expect,
                                   atol=1e-12)


def test_diagonal_accessor_parity():
    """diagonal()/diagonal_as_block/diagonal_as_numpy (reference API parity) and the
    fusion-tree dense diagonal path with the state-major layout."""
    import cyten_tpu as ct

    be = ct.get_backend(ct.su2_symmetry, 'numpy')
    leg = ct.ElementarySpace(ct.su2_symmetry, [[1]], [2])  # spin-1/2, mult 2

    def f(shape, coupled):
        return np.array([1., 2.])

    d = ct.DiagonalTensor.from_sector_block_func(f, leg, backend=be)
    dn = d.diagonal_as_numpy()
    # state-major dense layout: multiplet values repeat per sector state
    np.testing.assert_allclose(dn, [1., 2., 1., 2.])
    assert d.diagonal() is d
    d_rt = ct.DiagonalTensor.from_diag(dn, leg, backend=be)
    np.testing.assert_allclose(d_rt.diagonal_as_numpy(), dn)
    with pytest.raises(ValueError):
        ct.DiagonalTensor.from_diag(np.array([1., 2., 3., 4.]), leg, backend=be)
