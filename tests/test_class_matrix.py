"""Tensor-class matrix battery: free functions applied to every tensor class.

Mirrors the cls-parametrization of reference tests/python_tests/test_tensors.py
(test_dagger:1779, test_transpose:3491, test_linear_combination:2323,
test_scalar_multiply:2929, test_almost_equal:1255, test_compose:1729,
test_tdot:3221, test_outer:2482, test_apply_mask:1288, test_bend_legs:1369,
test_move_leg:2376, test_norm:2446, test_trace:3446, test_getitem:2060), which
runs each op over {SymmetricTensor, DiagonalTensor, Mask, ChargedTensor}
inputs — here over the full symmetry x block-backend fixture matrix.

Oracle strategy: every class-specialized fast path must agree with the generic
SymmetricTensor path (``T.as_SymmetricTensor()``), which works for *all*
symmetries including anyonic ones; when the symmetry has a dense
representation we additionally compare against plain numpy. ChargedTensor
cases without a dense charged_state mirror the reference's deselection of
invalid ChargedTensor cases (reference conftest.py:127-143).
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import ChargedTensor, DiagonalTensor, Mask, SymmetricTensor
from cyten_tpu.symmetries import ElementarySpace
from cyten_tpu.tensors import (
    almost_equal, apply_mask, bend_legs, compose, dagger, inner, linear_combination,
    move_leg, norm, outer, scalar_multiply, tdot, trace, transpose,
)

from conftest import random_space

CLASSES = ['SymmetricTensor', 'DiagonalTensor', 'Mask', 'ChargedTensor']


def _charge_leg(symmetry, rng):
    """A one-sector charge leg using a nontrivial sector if one exists."""
    nontrivial = [s for s in symmetry.all_sectors()[:6]
                  if not np.all(s == symmetry.trivial_sector)] \
        if symmetry.num_sectors < 20 else None
    if nontrivial:
        sector = nontrivial[rng.integers(len(nontrivial))]
    else:
        sector = symmetry.trivial_sector
    return ElementarySpace.from_defining_sectors(symmetry, [sector], [1])


def make(cls_name, backend, leg, rng, symmetry, second_leg=None):
    """A random tensor of the given class.

    SymmetricTensor / ChargedTensor: ``[leg] <- [second_leg or leg]``.
    DiagonalTensor: on ``leg``. Mask: projection with large_leg ``leg``.
    """
    if second_leg is None:
        second_leg = leg
    if cls_name == 'SymmetricTensor':
        from cyten_tpu.testing import random_tensor
        return random_tensor([leg], [second_leg], backend=backend, rng=rng)
    if cls_name == 'DiagonalTensor':
        return DiagonalTensor.from_random_normal(leg, backend=backend, rng=rng)
    if cls_name == 'Mask':
        m = Mask.from_random(leg, backend=backend, rng=rng)
        if m.small_leg.dim == 0:  # ensure a nonzero projection
            m = Mask.from_eye(leg, backend=backend)
        return m
    if cls_name == 'ChargedTensor':
        q = _charge_leg(symmetry, rng)
        inv = SymmetricTensor.from_random_normal(
            [leg], [q, second_leg], backend=backend, rng=rng,
            labels=[['a'], [ChargedTensor._CHARGE_LEG_LABEL, 'b']])
        if len(getattr(inv.data, 'blocks', [0])) == 0:
            # trivial charge always admits blocks for leg <- leg
            q = ElementarySpace.from_defining_sectors(
                symmetry, [symmetry.trivial_sector], [1])
            inv = SymmetricTensor.from_random_normal(
                [leg], [q, second_leg], backend=backend, rng=rng,
                labels=[['a'], [ChargedTensor._CHARGE_LEG_LABEL, 'b']])
        state = rng.normal(size=(int(q.dim),)) if symmetry.can_be_dropped else None
        return ChargedTensor(inv, state)
    raise ValueError(cls_name)


def as_sym(t):
    """Promote to the generic-path SymmetricTensor (oracle path)."""
    if isinstance(t, SymmetricTensor):
        return t
    if isinstance(t, ChargedTensor):
        return None  # no generic equivalent with hidden leg
    return t.as_SymmetricTensor()


def assert_matches_generic(res, expect, atol=1e-10):
    """res (any class) must equal expect (any class) after promotion."""
    a = res.as_SymmetricTensor() if not isinstance(res, SymmetricTensor) else res
    b = expect.as_SymmetricTensor() if not isinstance(expect, SymmetricTensor) \
        else expect
    if isinstance(res, ChargedTensor) or isinstance(expect, ChargedTensor):
        assert isinstance(res, ChargedTensor) and isinstance(expect, ChargedTensor)
        assert almost_equal(res.invariant_part, expect.invariant_part,
                            rtol=1e-8, atol=atol)
        return
    assert almost_equal(a, b.to_dtype(a.dtype) if a.dtype != b.dtype else b,
                        rtol=1e-8, atol=atol)


@pytest.fixture(params=[False, True], ids=['ket', 'bra'])
def leg(request, any_symmetry, np_random):
    # dual (bra) legs exercise the leg-order vs coupled-order index remapping
    # in the fusion-tree backend (dual_sorted vs sorted decompositions)
    return random_space(any_symmetry, np_random, max_sectors=3, max_mult=3,
                        is_dual=request.param)


# --- single-tensor ops over all classes -------------------------------------------


@pytest.mark.parametrize('cls', CLASSES)
def test_dagger_classes(cls, make_compatible_backend, leg, np_random, any_symmetry):
    T = make(cls, make_compatible_backend, leg, np_random, any_symmetry)
    D = dagger(T)
    D.test_sanity()
    if cls == 'ChargedTensor':
        DD = dagger(D)
        DD.test_sanity()
        assert almost_equal(DD.invariant_part, T.invariant_part,
                            rtol=1e-8, atol=1e-10)
        if any_symmetry.can_be_dropped:
            d = np.asarray(T.to_dense_block())
            dd = np.asarray(D.to_dense_block())
            np.testing.assert_allclose(dd, d.conj().T, rtol=1e-8, atol=1e-10)
        return
    # class fast path vs generic path
    assert_matches_generic(D, dagger(as_sym(T)))
    if any_symmetry.can_be_dropped and cls != 'Mask':
        np.testing.assert_allclose(D.to_numpy(), T.to_numpy().conj().T,
                                   rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize('cls', ['SymmetricTensor', 'DiagonalTensor', 'Mask'])
def test_transpose_classes(cls, make_compatible_backend, leg, np_random,
                           any_symmetry):
    T = make(cls, make_compatible_backend, leg, np_random, any_symmetry)
    Tt = transpose(T)
    Tt.test_sanity()
    assert_matches_generic(Tt, transpose(as_sym(T)))
    # transpose is an involution
    assert_matches_generic(transpose(Tt), as_sym(T))


@pytest.mark.parametrize('cls', ['SymmetricTensor', 'DiagonalTensor',
                                 'ChargedTensor'])
def test_linear_combination_classes(cls, make_compatible_backend, leg, np_random,
                                    any_symmetry):
    A = make(cls, make_compatible_backend, leg, np_random, any_symmetry)
    if cls == 'ChargedTensor':
        # second operand must carry the same charge leg
        B = ChargedTensor(
            SymmetricTensor.from_random_normal(
                list(A.invariant_part.codomain.factors),
                list(A.invariant_part.domain.factors),
                backend=make_compatible_backend, rng=np_random,
                labels=A.invariant_part.labels),
            A.charged_state)
    else:
        B = make(cls, make_compatible_backend, leg, np_random, any_symmetry)
    C = linear_combination(2.0, A, -0.5, B)
    C.test_sanity()
    if cls == 'ChargedTensor':
        expect = linear_combination(2.0, A.invariant_part, -0.5, B.invariant_part)
        assert almost_equal(C.invariant_part, expect, rtol=1e-8, atol=1e-10)
    else:
        assert_matches_generic(C, linear_combination(2.0, as_sym(A),
                                                     -0.5, as_sym(B)))
    D = scalar_multiply(3.0, A)
    D.test_sanity()
    E = linear_combination(1.0, D, -3.0, A)
    if cls == 'ChargedTensor':
        # anyonic charged tensors have no dense state: check the invariant part
        assert norm(E.invariant_part) < 1e-8 * max(norm(A.invariant_part), 1.0)
    else:
        assert norm(E) < 1e-8 * max(norm(A), 1.0)


@pytest.mark.parametrize('cls', ['SymmetricTensor', 'DiagonalTensor', 'Mask',
                                 'ChargedTensor'])
def test_almost_equal_classes(cls, make_compatible_backend, leg, np_random,
                              any_symmetry):
    A = make(cls, make_compatible_backend, leg, np_random, any_symmetry)
    assert almost_equal(A, A)
    if cls == 'Mask':
        comp = A.orthogonal_complement()
        if comp.small_leg != A.small_leg:
            return  # different legs: almost_equal correctly raises on these
        assert not almost_equal(A, comp)
    elif cls == 'ChargedTensor':
        B = ChargedTensor(scalar_multiply(2.0, A.invariant_part), A.charged_state)
        assert not almost_equal(A, B)
    else:
        assert not almost_equal(A, scalar_multiply(2.0, A))


@pytest.mark.parametrize('cls', ['SymmetricTensor', 'DiagonalTensor',
                                 'ChargedTensor'])
def test_norm_inner_classes(cls, make_compatible_backend, leg, np_random,
                            any_symmetry):
    A = make(cls, make_compatible_backend, leg, np_random, any_symmetry)
    if cls == 'ChargedTensor':
        if not any_symmetry.can_be_dropped:
            return  # inner/norm of charged tensors needs the dense state
        n = norm(A)
        d = np.asarray(A.to_dense_block())
        np.testing.assert_allclose(n, np.linalg.norm(d), rtol=1e-8)
        return
    n = norm(A)
    assert n >= 0
    np.testing.assert_allclose(inner(A, A).real, n ** 2, rtol=1e-8, atol=1e-10)
    n_sym = norm(as_sym(A))
    np.testing.assert_allclose(n, n_sym, rtol=1e-8)


@pytest.mark.parametrize('cls', ['SymmetricTensor', 'DiagonalTensor'])
def test_trace_classes(cls, make_compatible_backend, leg, np_random, any_symmetry):
    A = make(cls, make_compatible_backend, leg, np_random, any_symmetry)
    t = trace(A)
    t_sym = trace(as_sym(A))
    np.testing.assert_allclose(complex(t), complex(t_sym), rtol=1e-8, atol=1e-10)
    if any_symmetry.can_be_dropped:
        np.testing.assert_allclose(complex(t), np.trace(A.to_numpy()),
                                   rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize('cls', ['SymmetricTensor', 'DiagonalTensor', 'Mask',
                                 'ChargedTensor'])
def test_getitem_classes(cls, make_compatible_backend, leg, np_random,
                         any_symmetry):
    if not any_symmetry.can_be_dropped:
        return  # elementwise access needs a dense representation
    T = make(cls, make_compatible_backend, leg, np_random, any_symmetry)
    if cls == 'ChargedTensor':
        dense = np.asarray(T.to_dense_block())
    elif cls == 'Mask':
        dense = np.asarray(T.as_SymmetricTensor().to_numpy())
    else:
        dense = T.to_numpy()
    d0 = int(T.shape[0])
    d1 = int(T.shape[1])
    idx = (int(np_random.integers(d0)), int(np_random.integers(d1)))
    val = T[idx]
    np.testing.assert_allclose(complex(val), complex(dense[idx]),
                               rtol=1e-8, atol=1e-10)


# --- two-tensor ops: class x class matrix ------------------------------------------


COMPOSE_COMBOS = [
    ('SymmetricTensor', 'DiagonalTensor'), ('DiagonalTensor', 'SymmetricTensor'),
    ('DiagonalTensor', 'DiagonalTensor'), ('SymmetricTensor', 'ChargedTensor'),
    ('ChargedTensor', 'SymmetricTensor'), ('DiagonalTensor', 'ChargedTensor'),
]


@pytest.mark.parametrize('cls_A,cls_B', COMPOSE_COMBOS)
def test_compose_class_matrix(cls_A, cls_B, make_compatible_backend, leg,
                              np_random, any_symmetry):
    if (cls_A == 'ChargedTensor' or cls_B == 'ChargedTensor') \
            and not any_symmetry.has_symmetric_braid:
        return  # moving the hidden charge leg braids: needs explicit levels
    A = make(cls_A, make_compatible_backend, leg, np_random, any_symmetry)
    B = make(cls_B, make_compatible_backend, leg, np_random, any_symmetry)
    if cls_A == 'ChargedTensor' or cls_B == 'ChargedTensor':
        if cls_A == 'ChargedTensor' and cls_B == 'ChargedTensor':
            return
        C = compose(A, B)
        C.test_sanity()
        assert isinstance(C, ChargedTensor)
        if any_symmetry.can_be_dropped:
            a = np.asarray(A.to_dense_block() if cls_A == 'ChargedTensor'
                           else as_sym(A).to_numpy())
            b = np.asarray(B.to_dense_block() if cls_B == 'ChargedTensor'
                           else as_sym(B).to_numpy())
            np.testing.assert_allclose(np.asarray(C.to_dense_block()), a @ b,
                                       rtol=1e-8, atol=1e-10)
        return
    C = compose(A, B)
    C.test_sanity()
    expect = compose(as_sym(A), as_sym(B))
    assert_matches_generic(C, expect)
    if any_symmetry.can_be_dropped:
        np.testing.assert_allclose(
            np.asarray(as_sym(C).to_numpy()),
            np.asarray(as_sym(A).to_numpy()) @ np.asarray(as_sym(B).to_numpy()),
            rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize('cls_mask_side', ['left', 'right'])
def test_compose_with_mask(cls_mask_side, make_compatible_backend, leg, np_random,
                           any_symmetry):
    """compose with a projection/inclusion Mask (reference test_compose Mask rows)."""
    M = make('Mask', make_compatible_backend, leg, np_random, any_symmetry)
    if cls_mask_side == 'right':
        # compose(A, M) contracts A.domain with M.codomain = [small_leg]
        A = SymmetricTensor.from_random_normal(
            [leg], [M.codomain.factors[0]], backend=make_compatible_backend,
            rng=np_random)
        C = compose(A, M)
        C.test_sanity()
        expect = compose(A, M.as_SymmetricTensor().to_dtype(A.dtype))
        assert almost_equal(C, expect, rtol=1e-8, atol=1e-10)
    else:
        B = SymmetricTensor.from_random_normal(
            [M.domain.factors[0]], [leg], backend=make_compatible_backend,
            rng=np_random)
        C = compose(M, B)
        C.test_sanity()
        expect = compose(M.as_SymmetricTensor().to_dtype(B.dtype), B)
        assert almost_equal(C, expect, rtol=1e-8, atol=1e-10)


TDOT_COMBOS = [
    ('SymmetricTensor', 'DiagonalTensor'), ('DiagonalTensor', 'SymmetricTensor'),
    ('DiagonalTensor', 'DiagonalTensor'),
]


@pytest.mark.parametrize('cls_A,cls_B', TDOT_COMBOS)
def test_tdot_class_matrix(cls_A, cls_B, make_compatible_backend, leg, np_random,
                           any_symmetry):
    if not any_symmetry.has_symmetric_braid:
        return  # tdot auto-permutation needs explicit levels for anyons
    A = make(cls_A, make_compatible_backend, leg, np_random, any_symmetry)
    B = make(cls_B, make_compatible_backend, leg, np_random, any_symmetry)
    # both are [leg] <- [leg]: flat legs [leg, leg.dual]; contract A.1 with B.0
    C = tdot(A, B, [1], [0])
    C.test_sanity()
    expect = tdot(as_sym(A), as_sym(B), [1], [0])
    assert_matches_generic(C, expect)
    if any_symmetry.can_be_dropped:
        np.testing.assert_allclose(
            np.asarray(as_sym(C).to_numpy() if not isinstance(C, SymmetricTensor)
                       else C.to_numpy()),
            np.tensordot(as_sym(A).to_numpy(), as_sym(B).to_numpy(), ([1], [0])),
            rtol=1e-8, atol=1e-10)


OUTER_COMBOS = [
    ('SymmetricTensor', 'DiagonalTensor'), ('DiagonalTensor', 'SymmetricTensor'),
    ('DiagonalTensor', 'DiagonalTensor'),
]


@pytest.mark.parametrize('cls_A,cls_B', OUTER_COMBOS)
def test_outer_class_matrix(cls_A, cls_B, make_compatible_backend, leg, np_random,
                            any_symmetry):
    A = make(cls_A, make_compatible_backend, leg, np_random, any_symmetry)
    B = make(cls_B, make_compatible_backend, leg, np_random, any_symmetry)
    C = outer(A, B)
    C.test_sanity()
    expect = outer(as_sym(A), as_sym(B))
    assert_matches_generic(C, expect)


# --- mask application / leg moves over classes --------------------------------------


@pytest.mark.parametrize('cls', ['SymmetricTensor', 'DiagonalTensor',
                                 'ChargedTensor'])
def test_apply_mask_classes(cls, make_compatible_backend, leg, np_random,
                            any_symmetry):
    T = make(cls, make_compatible_backend, leg, np_random, any_symmetry)
    M = make('Mask', make_compatible_backend, leg, np_random, any_symmetry)
    if cls == 'DiagonalTensor':
        from cyten_tpu.tensors import apply_mask_DiagonalTensor
        R = apply_mask_DiagonalTensor(T, M)
        R.test_sanity()
        assert R.leg.dim == M.small_leg.dim
        if any_symmetry.can_be_dropped:
            bm = M.as_numpy_mask()
            np.testing.assert_allclose(R.diag_numpy, T.diag_numpy[bm],
                                       rtol=1e-8, atol=1e-10)
        return
    R = apply_mask(T, M, 0)
    R.test_sanity()
    if cls == 'ChargedTensor':
        expect_inv = apply_mask(T.invariant_part, M, 0)
        assert almost_equal(R.invariant_part, expect_inv, rtol=1e-8, atol=1e-10)
        return
    if any_symmetry.can_be_dropped:
        bm = M.as_numpy_mask()
        np.testing.assert_allclose(R.to_numpy(), T.to_numpy()[bm],
                                   rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize('cls', ['DiagonalTensor', 'Mask', 'ChargedTensor'])
def test_leg_moves_classes(cls, make_compatible_backend, leg, np_random,
                           any_symmetry):
    """bend_legs / move_leg dispatch on non-Symmetric classes
    (reference test_bend_legs:1369, test_move_leg:2376)."""
    T = make(cls, make_compatible_backend, leg, np_random, any_symmetry)
    B = bend_legs(T, num_codomain_legs=2)
    B.test_sanity()
    # the ChargedTensor charge leg is hidden: visible legs are 2+0 for all classes
    assert B.num_codomain_legs == 2 and B.num_domain_legs == 0
    if cls != 'ChargedTensor':
        expect = bend_legs(as_sym(T), num_codomain_legs=2)
        assert_matches_generic(B, expect)
    if cls == 'ChargedTensor' and not any_symmetry.has_symmetric_braid:
        return  # moving past the hidden charge leg braids: needs explicit levels
    M = move_leg(T, 0, domain_pos=0)
    M.test_sanity()
    if cls != 'ChargedTensor':
        expect = move_leg(as_sym(T), 0, domain_pos=0)
        assert_matches_generic(M, expect)


@pytest.mark.parametrize('cls', ['SymmetricTensor', 'DiagonalTensor', 'Mask'])
def test_to_from_dense_classes(cls, make_compatible_backend, leg, np_random,
                               any_symmetry):
    """Dense round trip per class (reference test_SymmetricTensor:149 et al.)."""
    if not any_symmetry.can_be_dropped:
        return
    T = make(cls, make_compatible_backend, leg, np_random, any_symmetry)
    if cls == 'Mask':
        bm = T.as_numpy_mask()
        T2 = Mask.from_blockmask(bm, T.large_leg, backend=make_compatible_backend)
        np.testing.assert_array_equal(T2.as_numpy_mask(), bm)
        return
    arr = T.to_numpy()
    T2 = SymmetricTensor.from_dense_block(arr, list(T.codomain.factors),
                                          list(T.domain.factors),
                                          backend=make_compatible_backend)
    T2.test_sanity()
    np.testing.assert_allclose(T2.to_numpy(), arr, rtol=1e-8, atol=1e-10)
