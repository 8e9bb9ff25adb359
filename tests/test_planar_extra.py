"""Planar-op battery over the full symmetry fixture matrix.

Widens the planar coverage toward the reference's tests/python_tests/test_planar.py
(1328 LoC: per-op parametrized batteries for planar_{svd,qr,lq,eigh,partial_trace,
combine_legs,permute_legs}, PlanarDiagram with traces, PlanarLinearOperator).
Unlike test_planar.py (targeted U(1)/anyon scenarios), every test here runs for
every fixture-matrix symmetry, including the braided ones, using oracles that do
not need a dense representation (reconstruction, norm preservation, agreement of
independent computation paths).
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import DiagonalTensor, PlanarDiagram, SymmetricTensor
from cyten_tpu.tensors import (
    almost_equal, compose, dagger, norm, partial_trace, permute_legs, tdot,
)
from cyten_tpu.tensors.planar import (
    PlanarLinearOperator, planar_combine_legs, planar_eigh, planar_lq,
    planar_partial_trace, planar_permute_legs, planar_qr, planar_svd,
    planar_truncated_svd,
)

from conftest import random_space


@pytest.fixture
def matrix_tensor(any_symmetry, block_backend, np_random):
    """A random 2<-2 tensor [V, W] <- [V, W] (guaranteed nonzero blocks)."""
    be = ct.get_backend(any_symmetry, block_backend)
    V = random_space(any_symmetry, np_random, max_sectors=3, max_mult=3,
                     is_dual=False)
    W = random_space(any_symmetry, np_random, max_sectors=2, max_mult=3,
                     is_dual=False)
    T = SymmetricTensor.from_random_normal(
        [V, W], [V, W], backend=be, labels=['a', 'b', 'c', 'd'], rng=np_random)
    assert norm(T) > 0
    return T


def test_planar_svd_matrix(matrix_tensor):
    T = matrix_tensor
    U, S, Vh = planar_svd(T, new_labels=['k', 'k*'])
    U.test_sanity(), S.test_sanity(), Vh.test_sanity()
    rec = compose(compose(U, S.as_SymmetricTensor()), Vh)
    assert norm(rec - T) <= 1e-10 * norm(T)
    # singular values carry the full (qdim-weighted) norm
    assert abs(norm(S) - norm(T)) <= 1e-10 * norm(T)
    # U is an isometry: U† U == eye on the new leg
    eye = SymmetricTensor.from_eye([S.leg], backend=T.backend,
                                   labels=['k', 'k*'], dtype=U.dtype)
    assert almost_equal(compose(dagger(U), U), eye, rtol=1e-10, atol=1e-10)
    # Vh is a co-isometry
    eye2 = SymmetricTensor.from_eye([Vh.codomain[0]], backend=T.backend,
                                    labels=['k', 'k*'], dtype=Vh.dtype)
    assert almost_equal(compose(Vh, dagger(Vh)), eye2, rtol=1e-10, atol=1e-10)


def test_planar_qr_lq_matrix(matrix_tensor):
    T = matrix_tensor
    Q, R = planar_qr(T, new_labels=['k', 'k*'])
    Q.test_sanity(), R.test_sanity()
    assert norm(compose(Q, R) - T) <= 1e-10 * norm(T)
    eye = SymmetricTensor.from_eye([Q.domain[0]], backend=T.backend,
                                   labels=['k', 'k*'], dtype=Q.dtype)
    assert almost_equal(compose(dagger(Q), Q), eye, rtol=1e-10, atol=1e-10)
    L, Q2 = planar_lq(T, new_labels=['k', 'k*'])
    L.test_sanity(), Q2.test_sanity()
    assert norm(compose(L, Q2) - T) <= 1e-10 * norm(T)
    eye2 = SymmetricTensor.from_eye([Q2.codomain[0]], backend=T.backend,
                                    labels=['k', 'k*'], dtype=Q2.dtype)
    assert almost_equal(compose(Q2, dagger(Q2)), eye2, rtol=1e-10, atol=1e-10)


def test_planar_eigh_matrix(matrix_tensor):
    T = matrix_tensor
    H = compose(T, dagger(T))  # hermitian positive semi-definite, dom == cod
    D, W = planar_eigh(H, new_labels=['k', 'k*'], sort='m>')
    D.test_sanity(), W.test_sanity()
    rec = compose(compose(W, D.as_SymmetricTensor()), dagger(W))
    assert norm(rec - H) <= 1e-9 * max(1., norm(H))
    assert float(D.min()) >= -1e-10 * max(1., norm(H))
    eye = SymmetricTensor.from_eye([W.domain[0]], backend=T.backend,
                                   labels=['k', 'k*'], dtype=W.dtype)
    assert almost_equal(compose(dagger(W), W), eye, rtol=1e-9, atol=1e-9)


def test_planar_truncated_svd_matrix(matrix_tensor):
    T = matrix_tensor
    full_dim = min(T.codomain.dim, T.domain.dim)
    chi = max(1, int(full_dim) // 2)
    U, S, Vh, err, renorm = planar_truncated_svd(T, new_labels=['k', 'k*'],
                                                 chi_max=chi)
    assert renorm == 1.
    rec = compose(compose(U, S.as_SymmetricTensor()), Vh)
    # the reported error is the RELATIVE (qdim-weighted) reconstruction error
    assert abs(norm(rec - T) / norm(T) - err) <= 1e-8
    # and truncation respects the constraint (in total quantum dimension)
    kept = S.leg
    assert kept.dim <= T.domain.dim + 1e-12


def test_planar_combine_split_matrix(matrix_tensor):
    T = matrix_tensor
    C = planar_combine_legs(T, ['a', 'b'])
    C.test_sanity()
    back = ct.split_legs(C)
    assert almost_equal(back, T, rtol=1e-12, atol=1e-12)
    # non-contiguous groups are rejected
    with pytest.raises(AssertionError):
        planar_combine_legs(T, ['a', 'c'])
    # dense oracle where a dense representation exists
    if T.symmetry.can_be_dropped:
        d = T.to_numpy()
        np.testing.assert_allclose(
            C.to_numpy().reshape(d.shape), d, atol=1e-10)


def test_planar_partial_trace_matrix(matrix_tensor):
    T = matrix_tensor
    # [a, b] <- [d, c] with legs b, c adjacent: planar-closable pair
    M = permute_legs(T, codomain=['a', 'b'], domain=['d', 'c'])
    tr = planar_partial_trace(M, ['b', 'c'])
    tr.test_sanity()
    # oracle: independent computation through the generic partial_trace
    tr2 = partial_trace(M, ['b', 'c'])
    assert norm(tr - tr2) <= 1e-10 * max(1., norm(tr2))
    # tracing the remaining pair gives the full trace (both return scalars)
    full1 = partial_trace(tr, ['a', 'd'])
    full2 = ct.trace(M)
    assert abs(complex(full1) - complex(full2)) <= 1e-10 * max(1., abs(complex(full2)))
    if T.symmetry.can_be_dropped:
        d = M.to_numpy()  # [a, b, c, d] in legs order
        expect = np.einsum('abbd->ad', d)
        np.testing.assert_allclose(tr.to_numpy(), expect, atol=1e-10)


def test_planar_permute_cycles_matrix(matrix_tensor):
    """All cyclic rotations: single multi-step rotation == composition of
    elementary one-leg rotations (independent instruction paths), and a full
    cycle is the identity."""
    T = matrix_tensor
    n = T.num_legs
    labels = T.labels  # [a, b, c, d] with legs order codomain + reversed(domain)
    for k in range(1, n):
        rot_labels = labels[k:] + labels[:k]
        direct = planar_permute_legs(T, codomain=rot_labels[:2],
                                     domain=list(reversed(rot_labels[2:])))
        step = T
        for _ in range(k):
            cur = step.labels
            one = cur[1:] + cur[:1]
            step = planar_permute_legs(step, codomain=one[:2],
                                       domain=list(reversed(one[2:])))
        assert norm(direct - step) <= 1e-10 * max(1., norm(T)), f'k={k}'
    # full cycle returns to the start
    full = T
    for _ in range(n):
        cur = full.labels
        one = cur[1:] + cur[:1]
        full = planar_permute_legs(full, codomain=one[:2],
                                   domain=list(reversed(one[2:])))
    assert almost_equal(full, T, rtol=1e-10, atol=1e-10)


def test_planar_diagram_with_traces(any_symmetry, block_backend, np_random):
    """A diagram containing a self-trace pair (reference test_planar.py:997)."""
    be = ct.get_backend(any_symmetry, block_backend)
    V = random_space(any_symmetry, np_random, max_sectors=3, max_mult=3,
                     is_dual=False)
    W = random_space(any_symmetry, np_random, max_sectors=2, max_mult=2,
                     is_dual=False)
    # A[x, t, t*, y]: self-trace over (t, t*); then contract x--y with B
    A = SymmetricTensor.from_random_normal(
        [V, W], [V, W], backend=be, labels=['x', 't', 'tx', 'y'], rng=np_random)
    B = SymmetricTensor.from_random_normal(
        [V], [V], backend=be, labels=['y', 'x'], rng=np_random)
    diagram = PlanarDiagram(
        tensors='A[x, t, tx, y], B[y, x]',
        definition='A:t @ A:tx, A:x @ B:x, A:y @ B:y',
        dims=dict(chi=['x', 'y'], d=['t', 'tx']),
    )
    res = diagram.evaluate(A=A, B=B)
    # oracle: independent path via partial_trace + tdot
    tr = partial_trace(A, ['t', 'tx'])
    expect = ct.item(tdot(tr, B, ['x', 'y'], ['x', 'y']))
    assert abs(complex(ct.item(res)) - complex(expect)) \
        <= 1e-10 * max(1., abs(complex(expect)))


def test_partial_compose_matrix(any_symmetry, block_backend, np_random):
    """partial_compose routes planarly: works for anyons without levels
    (reference backend.partial_compose never braids, _tensors.py:5206)."""
    be = ct.get_backend(any_symmetry, block_backend)
    V = random_space(any_symmetry, np_random, max_sectors=3, max_mult=3,
                     is_dual=False)
    T = SymmetricTensor.from_random_normal(
        [V, V, V], [V], backend=be, labels=['a', 'b', 'c', 'd'], rng=np_random)
    # top: operator on the middle codomain leg; eye leaves T invariant
    eye = SymmetricTensor.from_eye([V], backend=T.backend, labels=['x', 'x*'],
                                   dtype=T.dtype)
    R = ct.partial_compose(T, eye, 'b')
    assert R.labels == ['a', 'x', 'c', 'd']
    assert norm(R - T.relabelled(['a', 'x', 'c', 'd'])) <= 1e-12 * norm(T)
    op = SymmetricTensor.from_random_normal([V], [V], backend=T.backend,
                                            labels=['x', 'x*'], rng=np_random)
    R2 = ct.partial_compose(T, op, 'b')
    if any_symmetry.can_be_dropped:
        expect = np.einsum('xb,abcd->axcd', op.to_numpy(), T.to_numpy())
        np.testing.assert_allclose(R2.to_numpy(), expect, atol=1e-10)
    # below: operator on a (dual) domain leg
    M = permute_legs(T, codomain=['a', 'b'], domain=['d', 'c'])
    Vc = M.domain.factors[1]
    eye2 = SymmetricTensor.from_eye([Vc], backend=T.backend, labels=['x', 'x*'],
                                    dtype=T.dtype)
    R3 = ct.partial_compose(M, eye2, 'c')
    assert norm(R3 - M.relabelled(['a', 'b', 'x*', 'd'])) <= 1e-12 * norm(M)
    op2 = SymmetricTensor.from_random_normal([Vc], [Vc], backend=T.backend,
                                             labels=['x', 'x*'], rng=np_random)
    R4 = ct.partial_compose(M, op2, 'c')
    if any_symmetry.can_be_dropped:
        m_ = M.to_numpy()  # legs [a, b, c, d]
        expect = np.einsum('abxd,xc->abcd', m_, op2.to_numpy())
        np.testing.assert_allclose(
            R4.to_numpy(), expect.transpose(0, 1, 2, 3), atol=1e-10)


def test_planar_linear_operator_matrix(any_symmetry, block_backend, np_random):
    """PlanarLinearOperator matvec == explicit contraction (reference :1199)."""
    be = ct.get_backend(any_symmetry, block_backend)
    V = random_space(any_symmetry, np_random, max_sectors=3, max_mult=3,
                     is_dual=False)
    op = SymmetricTensor.from_random_normal(
        [V], [V], backend=be, labels=['p', 'p*'], rng=np_random)
    vec = SymmetricTensor.from_random_normal(
        [V], [], backend=be, labels=['p'], rng=np_random)
    diagram = PlanarDiagram(
        tensors='op[p, px], vec[p]',
        definition='op:px @ vec:p, op:p -> p',
        dims=dict(d=['p', 'px']),
    )
    H = PlanarLinearOperator(diagram, {'op': op.relabelled(['p', 'px'])},
                             vec_name='vec')
    out = H.matvec(vec)
    expect = tdot(op, vec, ['p*'], ['p']).relabelled(['p'])
    assert norm(out - expect) <= 1e-10 * max(1., norm(expect))
    # linearity
    out2 = H.matvec(ct.scalar_multiply(2., vec))
    assert norm(out2 - ct.scalar_multiply(2., out)) <= 1e-10 * max(1., norm(out))


# --- planar cuts / bipartitions (reference planar.py:1465-2281, 2282) -------------

def _einsum_by_labels(arr_labels, out_labels):
    """Contract dense arrays by shared leg labels (independent numpy oracle)."""
    import string as _string

    letters = {}
    subs = []
    for _, labels in arr_labels:
        s = ''
        for l in labels:
            if l not in letters:
                letters[l] = _string.ascii_letters[len(letters)]
            s += letters[l]
        subs.append(s)
    out = ''.join(letters[l] for l in out_labels)
    return np.einsum(','.join(subs) + '->' + out,
                     *[a for a, _ in arr_labels])


@pytest.mark.parametrize('cuts', [(1, 1), (2, 1), (1, 2), (1, 0), (0, 1),
                                  (2, 0), (0, 2)])
def test_planar_svd_cuts(matrix_tensor, cuts):
    """planar_svd across a cut: sanity, norm, dense recomposition oracle."""
    T = matrix_tensor  # 2<-2, labels [a, b; c, d]
    ccut, dcut = cuts
    U, S, Vh = planar_svd(T, ccut, dcut, new_labels=['k', 'k*'])
    U.test_sanity(), S.test_sanity(), Vh.test_sanity()
    # singular values carry the full (qdim-weighted) norm
    assert abs(ct.norm(S) - norm(T)) <= 1e-10 * norm(T)
    # the left factor holds the first ccut codomain and first dcut domain legs
    left = set(T.codomain_labels[:ccut]) | set(T.domain_labels[:dcut])
    assert set(U.labels) == left | {'k'}
    assert set(Vh.labels) == (set(T.labels) - left) | {'k*'}
    if T.symmetry.can_be_dropped:
        dense = _einsum_by_labels(
            [(U.to_numpy(), U.labels),
             (S.as_SymmetricTensor().to_numpy(), ['k', 'k*']),
             (Vh.to_numpy(), Vh.labels)], T.labels)
        np.testing.assert_allclose(dense, T.to_numpy(),
                                   atol=1e-8 * max(1., norm(T)))


@pytest.mark.parametrize('which', ['qr', 'lq'])
def test_planar_qr_lq_cuts(matrix_tensor, which):
    T = matrix_tensor
    fn = planar_qr if which == 'qr' else planar_lq
    A, B = fn(T, 1, 1, new_labels=['k', 'k*'])
    A.test_sanity(), B.test_sanity()
    left = {T.codomain_labels[0], T.domain_labels[0]}
    assert set(A.labels) == left | {'k'}
    assert set(B.labels) == (set(T.labels) - left) | {'k*'}
    if T.symmetry.can_be_dropped:
        # rename B's new leg to share A's for the dense contraction
        dense = _einsum_by_labels(
            [(A.to_numpy(), ['k' if l == 'k*' else l for l in A.labels]),
             (B.to_numpy(), ['k' if l == 'k*' else l for l in B.labels])],
            T.labels)
        np.testing.assert_allclose(dense, T.to_numpy(),
                                   atol=1e-8 * max(1., norm(T)))


def test_planar_truncated_svd_cuts(matrix_tensor):
    T = matrix_tensor
    U, S, Vh, err, renorm = planar_truncated_svd(T, 1, 1,
                                                 new_labels=['k', 'k*'],
                                                 svd_min=1e-14)
    U.test_sanity(), S.test_sanity(), Vh.test_sanity()
    assert renorm == 1.
    assert err <= 1e-10
    # untruncated: same spectrum as the full planar_svd of the same cut
    _, S_full, _ = planar_svd(T, 1, 1, new_labels=['k', 'k*'])
    if T.symmetry.can_be_dropped:
        np.testing.assert_allclose(sorted(S.diag_numpy),
                                   sorted(x for x in S_full.diag_numpy
                                          if x > 1e-14), atol=1e-10)
    else:  # anyons have no dense diagonal; compare the qdim-weighted norms
        assert abs(ct.norm(S) - ct.norm(S_full)) <= 1e-10 * max(1., ct.norm(S_full))


def test_planar_eigh_cuts(matrix_tensor):
    """Eigenvalues across a rotated cut match the plain path."""
    T = matrix_tensor
    H = compose(T, dagger(T))  # hermitian, dom == cod
    D0, W0 = planar_eigh(H, new_labels=['k', 'k*'], sort='m>')
    # rotate the legs by one, then cut (1, 1) undoes the rotation internally
    n = H.num_legs
    Hrot = planar_permute_legs(H, codomain=[n - 1, 0],
                               domain=list(reversed(range(1, n - 1))))
    D1, W1 = planar_eigh(Hrot, 1, 1, new_labels=['k', 'k*'], sort='m>')
    W1.test_sanity(), D1.test_sanity()
    if H.symmetry.can_be_dropped:
        np.testing.assert_allclose(sorted(D0.diag_numpy), sorted(D1.diag_numpy),
                                   atol=1e-8 * max(1., norm(H)))
    else:  # anyons: compare the rotation-invariant spectrum through norms/trace
        assert abs(ct.norm(D0) - ct.norm(D1)) <= 1e-8 * max(1., norm(H))
        assert abs(complex(ct.trace(D0.as_SymmetricTensor())
                           - ct.trace(D1.as_SymmetricTensor()))) \
            <= 1e-8 * max(1., norm(H))


def test_planar_decomposition_rejects_trivial(matrix_tensor):
    from cyten_tpu.tensors.planar import planar_decomposition

    with pytest.raises(ValueError, match='Nothing to do'):
        planar_decomposition(matrix_tensor, 0, 0, 'svd')
    with pytest.raises(ValueError, match='Nothing to do'):
        planar_decomposition(matrix_tensor, 2, 2, 'svd')
    with pytest.raises(ValueError, match='Invalid decomposition'):
        planar_decomposition(matrix_tensor, 1, 1, 'cholesky')


def test_parse_leg_bipartition():
    from cyten_tpu.tensors.planar import parse_leg_bipartition

    legs, other = parse_leg_bipartition([1, 2], 4)
    assert legs == [1, 2] and other == [3, 0]
    # wrapping arc
    legs, other = parse_leg_bipartition([7, 8, 0, 1, 2], 9)
    assert legs == [7, 8, 0, 1, 2] and other == [3, 4, 5, 6]
    # any input order
    legs, other = parse_leg_bipartition([2, 0, 1, 8, 7], 9)
    assert legs == [7, 8, 0, 1, 2]
    with pytest.raises(ValueError, match='not contiguous'):
        parse_leg_bipartition([0, 2], 4)
    with pytest.raises(ValueError, match='proper nonempty'):
        parse_leg_bipartition([0, 1, 2, 3], 4)
    with pytest.raises(ValueError, match='duplicate'):
        parse_leg_bipartition([0, 0, 1], 4)


def test_planar_almost_equal(matrix_tensor):
    from cyten_tpu.tensors.planar import planar_almost_equal

    T = matrix_tensor
    n = T.num_legs
    rot = planar_permute_legs(T, codomain=[n - 1, 0],
                              domain=list(reversed(range(1, n - 1))))
    assert planar_almost_equal(rot, T, rtol=1e-10, atol=1e-10)
    assert planar_almost_equal(T, rot, rtol=1e-10, atol=1e-10)
    assert not planar_almost_equal(ct.scalar_multiply(1.5, rot), T)


def test_contraction_tree_node():
    from cyten_tpu.tensors.planar import ContractionTree, ContractionTreeNode

    tree = ContractionTree._from_nested((('A', 'B'), 'C'))
    root = ContractionTreeNode.from_contraction_tree(tree)
    root.test_sanity()
    leaves, num = root.get_leaves()
    assert leaves == ['A', 'B', 'C'] and num == 4
    assert not root.is_leaf
    cp = root.copy()
    cp.test_sanity()
    assert cp.left_child.parent is cp
    # pop contractions depth-first until a single value remains
    _, a, b, v1 = root.pop_contraction()
    assert (a, b, v1) == ('A', 'B', 'A @ B')
    _, a, b, v2 = root.pop_contraction()
    assert (a, b) == ('A @ B', 'C')
    assert root.is_leaf and root.value == v2
    # the copy is unaffected
    assert not cp.is_leaf
    assert 'A' in cp.show_whole_tree()
    with pytest.raises(ValueError, match='two children or a value'):
        ContractionTreeNode(None, None, None, None)
