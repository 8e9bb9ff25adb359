"""Tests for reference-API-parity members added across the tensor classes.

Covers: Tensor properties (dagger/has_pipes/num_flat_legs/num_parameters/relabel/
verify_dtype), SymmetricTensor.{from_block_func, from_sector_projection, diagonal,
to/from_dense_block_trivial_sector, from_tree_pairs}, DiagonalTensor extras, Mask
extras, ChargedTensor extras, FusionTree.{ascii_diagram, modify_vertex_labels},
hdf5 hooks, tools helpers.
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import DiagonalTensor, Mask, SymmetricTensor
from cyten_tpu.symmetries import ElementarySpace


@pytest.fixture
def u1_leg():
    return ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [2, 3, 2])


@pytest.fixture
def u1_backend():
    return ct.get_backend(ct.u1_symmetry, 'numpy')


def test_tensor_properties(u1_leg, u1_backend):
    rng = np.random.default_rng(0)
    t = SymmetricTensor.from_random_normal([u1_leg, u1_leg], [u1_leg],
                                           backend=u1_backend, rng=rng,
                                           labels=['a', 'b', 'c'])
    assert not t.has_pipes
    assert t.num_flat_legs == 3
    assert t.num_codomain_flat_legs == 2
    # num_parameters == number of free entries == total block size
    assert t.num_parameters == sum(b.size for b in t.data.blocks)
    d = t.dagger
    np.testing.assert_allclose(d.to_numpy(),
                               np.conj(np.transpose(t.to_numpy(), (2, 1, 0))))
    t2 = t.relabel({'a': 'x'})
    assert t2 is t and t.labels[0] == 'x'
    t.verify_dtype()
    # combined legs -> pipes
    from cyten_tpu.tensors import combine_legs

    tc = combine_legs(t, [0, 1])
    assert tc.has_pipes
    assert tc.num_flat_legs == 3 and tc.num_legs == 2


def test_from_block_func(u1_leg, u1_backend):
    t = SymmetricTensor.from_block_func(
        lambda shape: np.full(shape, 2.0), [u1_leg], [u1_leg], backend=u1_backend)
    for b in t.data.blocks:
        assert np.all(b == 2.0)
    t2 = SymmetricTensor.from_block_func(
        lambda size=None: np.ones(size), [u1_leg], [u1_leg], backend=u1_backend,
        shape_kw='size')
    for b in t2.data.blocks:
        assert np.all(b == 1.0)
    d = DiagonalTensor.from_block_func(lambda shape: np.full(shape, 3.0), u1_leg,
                                       backend=u1_backend)
    assert np.all(d.diag_numpy == 3.0)


def test_from_sector_projection(u1_leg, u1_backend):
    P = SymmetricTensor.from_sector_projection([u1_leg, u1_leg], [0],
                                               backend=u1_backend)
    P.test_sanity()
    # legs order lists the domain reversed: transpose to [cod1, cod2, dom1, dom2]
    dense = P.to_numpy().transpose(0, 1, 3, 2)
    # projector: P^2 == P, hermitian
    mat = dense.reshape(u1_leg.dim ** 2, u1_leg.dim ** 2)
    np.testing.assert_allclose(mat @ mat, mat, atol=1e-12)
    np.testing.assert_allclose(mat, mat.T.conj(), atol=1e-12)
    # trace = number of pairs fusing to [0]
    from cyten_tpu.symmetries import TensorProduct

    tp = TensorProduct([u1_leg, u1_leg])
    np.testing.assert_allclose(np.trace(mat), tp.sector_multiplicity(np.array([0])))
    # projectors onto all sectors sum to the identity
    total = sum(
        SymmetricTensor.from_sector_projection([u1_leg, u1_leg], c,
                                               backend=u1_backend).to_numpy()
        for c in tp.sector_decomposition)
    eye = SymmetricTensor.from_eye([u1_leg, u1_leg], backend=u1_backend).to_numpy()
    np.testing.assert_allclose(total, eye, atol=1e-12)


def _as_matrix(dense_2_2):
    """[cod1, cod2, dom2, dom1] (legs order) -> matrix [(cod1 cod2), (dom1 dom2)]."""
    d = dense_2_2.transpose(0, 1, 3, 2)
    n = d.shape[0] * d.shape[1]
    return d.reshape(n, n)


def test_sector_projection_su2():
    leg = ElementarySpace(ct.su2_symmetry, [[1]], [1])  # spin-1/2
    be = ct.get_backend(ct.su2_symmetry, 'numpy')
    # two spin-1/2: projector onto the singlet has trace 1, onto triplet trace 3
    P0 = SymmetricTensor.from_sector_projection([leg, leg], [0], backend=be)
    P2 = SymmetricTensor.from_sector_projection([leg, leg], [2], backend=be)
    m0 = _as_matrix(P0.to_numpy())
    m2 = _as_matrix(P2.to_numpy())
    np.testing.assert_allclose(np.trace(m0), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.trace(m2), 3.0, atol=1e-12)
    np.testing.assert_allclose(m0 + m2, np.eye(4), atol=1e-12)
    np.testing.assert_allclose(m0 @ m0, m0, atol=1e-12)


def test_dense_block_trivial_sector(u1_leg, u1_backend):
    vec = np.array([1., 2., 3.])  # trivial sector has mult 3
    t = SymmetricTensor.from_dense_block_trivial_sector(vec, u1_leg,
                                                        backend=u1_backend)
    t.test_sanity()
    np.testing.assert_allclose(np.asarray(t.to_dense_block_trivial_sector()), vec)
    # dense vector is supported only on the trivial-sector basis states
    dense = t.to_numpy()
    assert np.count_nonzero(dense) == 3


def test_diagonal_method(u1_leg, u1_backend):
    rng = np.random.default_rng(1)
    t = SymmetricTensor.from_random_normal([u1_leg], [u1_leg], backend=u1_backend,
                                           rng=rng)
    d = t.diagonal()
    np.testing.assert_allclose(d.diag_numpy, np.diag(t.to_numpy()), atol=1e-12)
    assert d.as_DiagonalTensor() is d
    ok = d.elementwise_almost_equal(d)
    assert ok.all()
    d2 = d + 1e-3
    assert not d.elementwise_almost_equal(d2, rtol=0, atol=1e-6).any()
    assert d.elementwise_almost_equal(d2, rtol=0, atol=1e-2).all()
    # from_diag_block alias
    d3 = DiagonalTensor.from_diag_block(d.diag_numpy, u1_leg, backend=u1_backend)
    np.testing.assert_allclose(d3.diag_numpy, d.diag_numpy)


def test_mask_extras(u1_leg, u1_backend):
    rng = np.random.default_rng(2)
    m = Mask.from_random(u1_leg, backend=u1_backend, rng=rng)
    m.test_sanity()
    bm = m.as_numpy_mask()
    assert bm.dtype == bool and bm.shape == (u1_leg.dim,)
    m2 = Mask.from_block_mask(bm, u1_leg, backend=u1_backend)
    assert (m2.as_numpy_mask() == bm).all()
    comp = m.orthogonal_complement()
    assert (comp.as_numpy_mask() == ~bm).all()
    z = Mask.from_zero(u1_leg, backend=u1_backend)
    assert z.small_leg.dim == 0
    mk = Mask.from_random(u1_leg, small_leg_dim=4, backend=u1_backend, rng=rng)
    assert mk.small_leg.dim == 4


def test_charged_extras(u1_leg, u1_backend):
    from cyten_tpu.tensors import ChargedTensor

    assert ChargedTensor.supports_symmetry(ct.u1_symmetry)
    assert not ChargedTensor.supports_symmetry(ct.fibonacci_anyon_category)
    t = ChargedTensor.from_block_func(lambda shape: np.ones(shape), [1], [u1_leg],
                                      [u1_leg], charged_state=[1.],
                                      backend=u1_backend)
    t.test_sanity()
    # single-sector round trip: mult of sector [1] is 2
    vec = np.array([0.5, -1.5])
    s = ChargedTensor.from_dense_block_single_sector(vec, u1_leg, [1],
                                                     backend=u1_backend)
    s.test_sanity()
    np.testing.assert_allclose(np.asarray(s.to_dense_block_single_sector()), vec)


def test_from_tree_pairs_roundtrip():
    leg = ElementarySpace(ct.su2_symmetry, [[0], [1], [2]], [2, 2, 1])
    be = ct.get_backend(ct.su2_symmetry, 'numpy')
    rng = np.random.default_rng(5)
    t = SymmetricTensor.from_random_normal([leg, leg], [leg], backend=be, rng=rng)
    pairs = dict(t.tree_pairs())
    assert len(pairs) > 0
    t2 = SymmetricTensor.from_tree_pairs(pairs, [leg, leg], [leg], backend=be)
    t2.test_sanity()
    np.testing.assert_allclose(t2.to_numpy(), t.to_numpy(), atol=1e-12)
    # single pair embeds in the right position
    (X, Y), coeffs = next(iter(pairs.items()))
    t3 = SymmetricTensor.from_tree_pairs({(X, Y): np.asarray(coeffs)},
                                         [leg, leg], [leg], backend=be)
    extracted = dict(t3.tree_pairs())
    np.testing.assert_allclose(np.asarray(extracted[(X, Y)]), np.asarray(coeffs),
                               atol=1e-14)
    for key, val in extracted.items():
        if key != (X, Y):
            assert np.allclose(np.asarray(val), 0)


def test_fusion_tree_ascii_and_vertex_labels():
    from cyten_tpu.symmetries.trees import FusionTree

    t = FusionTree(ct.su2_symmetry, np.array([[1], [1], [2]]), np.array([2]),
                   np.array([False, False, False]), np.array([[2]]),
                   np.array([0, 0]))
    s = t.ascii_diagram()
    assert 'J=1/2' in s and '\\' in s
    assert t.ascii_diagram(dagger=True).splitlines()[0] != s.splitlines()[0]
    t2 = t.modify_vertex_labels(0, None, None, None, np.array([0]))
    assert np.all(t2.inner_sectors[0] == [0])
    assert np.all(t.inner_sectors[0] == [2])  # copy by default
    a, b, mu, c = t.vertex_labels(0)
    assert np.all(a == [1]) and np.all(b == [1]) and np.all(c == [2])


def test_hdf5_hooks(tmp_path, u1_leg, u1_backend):
    h5py = pytest.importorskip('h5py')
    from cyten_tpu.tools.hdf5_io import Hdf5Loader, Hdf5Saver

    rng = np.random.default_rng(3)
    t = SymmetricTensor.from_random_normal([u1_leg], [u1_leg], backend=u1_backend,
                                           rng=rng)
    with h5py.File(tmp_path / 'x.h5', 'w') as f:
        sv = Hdf5Saver(f)
        t.save_hdf5(sv, f, 'tensor')
        u1_leg.save_hdf5(sv, f, 'leg')
        ct.u1_symmetry.save_hdf5(sv, f, 'sym')
        ld = Hdf5Loader(f)
        t2 = SymmetricTensor.from_hdf5(ld, f, 'tensor')
        leg2 = ElementarySpace.from_hdf5(ld, f, 'leg')
        sym2 = type(ct.u1_symmetry).from_hdf5(ld, f, 'sym')
    np.testing.assert_allclose(t2.to_numpy(), t.to_numpy())
    assert leg2 == u1_leg
    assert sym2.is_equivalent_to(ct.u1_symmetry)


def test_check_same_legs_and_device(u1_leg, u1_backend):
    from cyten_tpu.tensors import check_same_legs, get_same_device

    rng = np.random.default_rng(4)
    a = SymmetricTensor.from_random_normal([u1_leg], [u1_leg], backend=u1_backend,
                                           rng=rng, labels=['x', 'y'])
    b = SymmetricTensor.from_random_normal([u1_leg], [u1_leg], backend=u1_backend,
                                           rng=rng, labels=['x', 'y'])
    check_same_legs(a, b)  # no raise
    c = SymmetricTensor.from_random_normal([u1_leg, u1_leg], [], backend=u1_backend,
                                           rng=rng)
    with pytest.raises(ValueError):
        check_same_legs(a, c)
    assert get_same_device(a, b) == a.device


def test_compiled_contraction_chain():
    """Gather-compiled DMRG matvec == generic chain (fusion-tree layout, CPU jax)."""
    import cyten_tpu as ct
    from cyten_tpu.backends.fusion_tree import FusionTreeBackend
    from cyten_tpu.tensors import tdot, permute_legs
    from cyten_tpu.extras.compiled import compile_heff_chain

    ftb = FusionTreeBackend(ct.get_block_backend('numpy'))
    from bench import build_workload

    LP, RP, W1, W2, theta = build_workload(ftb, chi=24)
    chain = compile_heff_chain(LP, RP, W1, W2, theta)

    # reference: the generic tdot chain
    x = tdot(theta, LP, 'vL', 'vR')
    x = tdot(x, W1, ['p0', 'wR'], ['p0*', 'wL'])
    x = tdot(x, W2, ['p1', 'wR'], ['p1*', 'wL'])
    x = tdot(x, RP, ['vR', 'wR'], ['vL', 'wL'])
    x = x.relabelled({'vR*': 'vL', 'vL*': 'vR'})
    ref = permute_legs(x, codomain=['vL', 'p0', 'p1'], domain=['vR'])

    import jax.numpy as jnp

    fn = chain.bind(dtype=ct.Dtype.float64)
    out_blocks = fn([jnp.asarray(np.asarray(b)) for b in theta.data.blocks])
    ref_blocks = [np.asarray(b) for b in ref.data.blocks]
    assert len(out_blocks) == len(ref_blocks)
    for got, want in zip(out_blocks, ref_blocks):
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)
