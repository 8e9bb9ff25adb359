"""Tensor ops on tensors with pipe (combined) legs.

The reference parametrizes its big op batteries over ``use_pipes`` (reference
tests/python_tests/test_tensors.py:149,1393,3491 etc.) so every op is exercised
on tensors whose legs are ``LegPipe``s. This file adds that dimension: tensors
get a pipe leg via ``combine_legs`` and the main ops run on them, checked
against dense oracles (droppable symmetries) or norm/roundtrip identities
(anyons).
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import DiagonalTensor, Mask, SymmetricTensor
from cyten_tpu.symmetries import ElementarySpace

from conftest import random_space


@pytest.fixture
def piped(make_compatible_backend, any_symmetry, np_random):
    """A tensor with a genuine pipe leg: P = combine(legs a, b) of a random T."""
    backend = make_compatible_backend
    spaces = [random_space(any_symmetry, np_random, max_sectors=3)
              for _ in range(4)]
    T = SymmetricTensor.from_random_normal(spaces[:2], spaces[2:], backend=backend,
                                           labels=['a', 'b', 'c', 'd'],
                                           rng=np_random)
    C = ct.combine_legs(T, ['a', 'b'])
    C.test_sanity()
    return T, C


def test_pipe_roundtrip_and_norm(piped):
    T, C = piped
    assert C.num_legs == 3
    pipe = C.codomain.factors[0]
    assert pipe.dim == T.codomain.factors[0].dim * T.codomain.factors[1].dim
    np.testing.assert_allclose(ct.norm(C), ct.norm(T), rtol=1e-10)
    back = ct.split_legs(C)
    assert ct.almost_equal(back, T, rtol=1e-10, atol=1e-10)


def test_pipe_dense_roundtrip(piped, any_symmetry):
    """from_dense_block accepts pipe legs and inverts to_dense_block.

    Reference: test_tensors.py:1593 (cross-backend pipe consistency).
    """
    if not (any_symmetry.can_be_dropped and any_symmetry.has_symmetric_braid):
        pytest.skip('needs a dense representation')
    T, C = piped
    arr = C.to_numpy()
    C2 = SymmetricTensor.from_dense_block(arr, list(C.codomain.factors),
                                          list(C.domain.factors),
                                          backend=C.backend, labels=C.labels)
    C2.test_sanity()
    assert ct.almost_equal(C2, C, rtol=1e-8, atol=1e-8)


def test_pipe_svd(piped):
    """SVD with a pipe leg in the codomain reconstructs the tensor."""
    T, C = piped
    U, S, Vh = ct.svd(C)
    U.test_sanity(), S.test_sanity(), Vh.test_sanity()
    rec = ct.compose(ct.compose(U, S.as_SymmetricTensor()), Vh)
    assert ct.norm(rec - C) < 1e-10 * max(1., ct.norm(C))
    np.testing.assert_allclose(ct.norm(S), ct.norm(C), rtol=1e-10)
    # splitting the reconstruction equals the original uncombined tensor
    assert ct.almost_equal(ct.split_legs(rec), T, rtol=1e-8, atol=1e-8)


def test_pipe_compose_dagger(piped):
    """trace(C ∘ C†) == |C|^2 with the contraction running over the pipe."""
    T, C = piped
    D = ct.dagger(C)
    D.test_sanity()
    prod = ct.compose(C, D)  # [pipe] <- [pipe]
    prod.test_sanity()
    tr = ct.trace(prod)
    np.testing.assert_allclose(complex(tr), ct.norm(C) ** 2, rtol=1e-8)


def test_pipe_permute_bend(piped, any_symmetry):
    """Bending the pipe leg into the domain and back is the identity."""
    T, C = piped
    M = ct.bend_legs(C, num_codomain_legs=0)
    M.test_sanity()
    np.testing.assert_allclose(ct.norm(M), ct.norm(C), rtol=1e-10)
    back = ct.bend_legs(M, num_codomain_legs=1)
    back.test_sanity()
    assert ct.almost_equal(back, C, rtol=1e-10, atol=1e-10)


def test_pipe_tdot(piped, any_symmetry):
    """tdot contracting the pipe leg against its dagger counterpart."""
    T, C = piped
    D = ct.dagger(C)
    assert D.labels[-1] == '(b*.a*)'  # dual pipe label: reversed + dualized
    res = ct.tdot(D, C, [2], [0])
    res.test_sanity()
    # oracle: full contraction of T with itself over legs a, b
    if any_symmetry.can_be_dropped and any_symmetry.has_symmetric_braid:
        arr = T.to_numpy()
        oracle = np.tensordot(arr.conj().transpose(3, 2, 1, 0),
                              arr, axes=[[2, 3], [1, 0]])
        got = res.to_numpy()
        # res legs: open D legs (c, d as codomain) then open C legs
        assert got.shape == oracle.shape
        np.testing.assert_allclose(got, oracle, rtol=1e-8, atol=1e-8)


def test_pipe_diagonal_and_mask(piped, any_symmetry):
    """DiagonalTensor / Mask living on a pipe leg (abelian pipes only: they are
    ElementarySpaces, reference spaces.py:2029-2040)."""
    T, C = piped
    pipe = C.codomain.factors[0]
    if not isinstance(pipe, ElementarySpace):
        pytest.skip('fusion-tree pipes are not ElementarySpaces')
    D = DiagonalTensor.from_random_normal(pipe, backend=C.backend)
    D.test_sanity()
    scaled = ct.scale_axis(C, D, 0)
    scaled.test_sanity()
    if any_symmetry.can_be_dropped:
        np.testing.assert_allclose(
            scaled.to_numpy(),
            D.diag_numpy[:, None, None] * C.to_numpy(), rtol=1e-8, atol=1e-8)
    mask = Mask.from_DiagonalTensor(D > 0)
    if mask.small_leg.dim == 0:
        pytest.skip('empty mask')
    projected = ct.apply_mask(C, mask, 0)
    projected.test_sanity()
    assert projected.codomain.factors[0].dim == mask.small_leg.dim
    if any_symmetry.can_be_dropped:
        keep = mask.as_numpy_mask()
        np.testing.assert_allclose(projected.to_numpy(), C.to_numpy()[keep],
                                   rtol=1e-8, atol=1e-8)


def test_pipe_in_domain(make_compatible_backend, any_symmetry, np_random):
    """Combining legs in the domain and operating on the result."""
    backend = make_compatible_backend
    spaces = [random_space(any_symmetry, np_random, max_sectors=3)
              for _ in range(4)]
    T = SymmetricTensor.from_random_normal(spaces[:2], spaces[2:], backend=backend,
                                           labels=['a', 'b', 'c', 'd'],
                                           rng=np_random)
    C = ct.combine_legs(T, ['c', 'd'])
    C.test_sanity()
    assert C.num_domain_legs == 1
    np.testing.assert_allclose(ct.norm(C), ct.norm(T), rtol=1e-10)
    back = ct.split_legs(C)
    assert ct.almost_equal(back, T, rtol=1e-10, atol=1e-10)
    # svd across (codomain | domain-pipe)
    U, S, Vh = ct.svd(C)
    rec = ct.compose(ct.compose(U, S.as_SymmetricTensor()), Vh)
    assert ct.norm(rec - C) < 1e-10 * max(1., ct.norm(C))


def test_nested_pipes(make_compatible_backend, any_symmetry, np_random):
    """Pipes of pipes: combine twice, split twice, recover the original.

    Reference: test_tensors.py test_combine_split nested cases.
    """
    backend = make_compatible_backend
    spaces = [random_space(any_symmetry, np_random, max_sectors=2)
              for _ in range(3)]
    T = SymmetricTensor.from_random_normal(spaces, [spaces[0]], backend=backend,
                                           labels=['a', 'b', 'c', 'd'],
                                           rng=np_random)
    C1 = ct.combine_legs(T, ['a', 'b'])
    C1.test_sanity()
    C2 = ct.combine_legs(C1, ['(a.b)', 'c'])
    C2.test_sanity()
    np.testing.assert_allclose(ct.norm(C2), ct.norm(T), rtol=1e-10)
    S1 = ct.split_legs(C2)
    S1.test_sanity()
    S2 = ct.split_legs(S1)
    S2.test_sanity()
    assert ct.almost_equal(S2, T, rtol=1e-10, atol=1e-10)
