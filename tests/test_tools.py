"""Tests for tools (io, checkpoint, math, random matrices) and testing utilities."""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import ElementarySpace, SymmetricTensor, DiagonalTensor, Mask
from cyten_tpu.tools import hdf5_io
from cyten_tpu.tools import random_matrix as rm
from cyten_tpu.tools.math import speigs, speigsh


@pytest.fixture
def u1_tensor(np_random):
    leg = ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [1, 2, 1])
    be = ct.get_backend(ct.u1_symmetry, 'numpy')
    return SymmetricTensor.from_random_normal([leg, leg], [leg], backend=be,
                                              labels=['a', 'b', 'c'],
                                              rng=np_random)


def test_hdf5_roundtrip(u1_tensor, tmp_path):
    fn = str(tmp_path / 'tensor.h5')
    hdf5_io.save(u1_tensor, fn)
    t2 = hdf5_io.load(fn)
    t2.test_sanity()
    np.testing.assert_allclose(t2.to_numpy(), u1_tensor.to_numpy(), atol=1e-14)
    assert t2.labels == u1_tensor.labels
    # pickle path
    fn2 = str(tmp_path / 'tensor.pkl')
    hdf5_io.save(u1_tensor, fn2)
    t3 = hdf5_io.load(fn2)
    np.testing.assert_allclose(t3.to_numpy(), u1_tensor.to_numpy(), atol=1e-14)


def test_hdf5_diagonal_and_mask(tmp_path, np_random):
    leg = ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [2, 3, 2])
    be = ct.get_backend(ct.u1_symmetry, 'numpy')
    D = DiagonalTensor.from_random_normal(leg, backend=be, rng=np_random)
    fn = str(tmp_path / 'diag.h5')
    hdf5_io.save(D, fn)
    D2 = hdf5_io.load(fn)
    np.testing.assert_allclose(D2.diag_numpy, D.diag_numpy, atol=1e-14)
    mask = Mask.from_blockmask(np_random.integers(2, size=7).astype(bool), leg,
                               backend=be)
    fn2 = str(tmp_path / 'mask.h5')
    hdf5_io.save(mask, fn2)
    m2 = hdf5_io.load(fn2)
    np.testing.assert_array_equal(m2.blockmask(), mask.blockmask())


def test_hdf5_misc_objects(tmp_path):
    fn = str(tmp_path / 'misc.h5')
    obj = {'a': [1, 2.5, 'x', None, True], 'b': np.arange(6).reshape(2, 3),
           'sym': ct.u1_symmetry * ct.z3_symmetry.factors[0],
           'c': complex(1, 2)}
    hdf5_io.save(obj, fn)
    obj2 = hdf5_io.load(fn)
    assert obj2['a'] == obj['a']
    np.testing.assert_array_equal(obj2['b'], obj['b'])
    assert obj2['sym'] == obj['sym']
    assert obj2['c'] == obj['c']


def test_checkpoint_roundtrip(u1_tensor, tmp_path):
    from cyten_tpu.tools.checkpoint import load_checkpoint, save_checkpoint

    path = str(tmp_path / 'ckpt')
    save_checkpoint(path, {'psi': u1_tensor, 'step': np.array(3)})
    restored = load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(restored['psi'].to_numpy()),
                               u1_tensor.to_numpy(), atol=1e-14)
    # no pickle anywhere in the checkpoint directory (typed schema + orbax only)
    import os
    for root, _, files in os.walk(path):
        assert not any(f.endswith('.pkl') for f in files)


def test_checkpoint_async_mps(tmp_path):
    """async_save actually writes (after wait) and SimpleMPS round-trips whole."""
    from cyten_tpu.algorithms.models import TFIModel
    from cyten_tpu.algorithms.mps import SimpleMPS
    from cyten_tpu.tools.checkpoint import (
        load_checkpoint, save_checkpoint, wait_for_saves,
    )

    model = TFIModel(L=4, J=1., g=1.5, conserve='parity', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * 4,
                                       backend=model.backend)
    path = str(tmp_path / 'ckpt_mps')
    save_checkpoint(path, psi, async_save=True)
    wait_for_saves()
    restored = load_checkpoint(path)
    assert isinstance(restored, SimpleMPS)
    assert restored.L == psi.L and restored.bc == psi.bc
    for B1, B2 in zip(psi.Bs, restored.Bs):
        np.testing.assert_allclose(np.asarray(B2.to_numpy()), B1.to_numpy(),
                                   atol=1e-14)


def test_speigs(np_random):
    A = rm.GUE((10, 10), np_random)
    w, v = speigsh(A, k=3, which='SA')
    w_full = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(sorted(w), w_full[:3], atol=1e-10)
    # dense fallback for k close to dim
    w2, v2 = speigsh(A, k=9, which='SA')
    np.testing.assert_allclose(sorted(w2), w_full[:9], atol=1e-10)


def test_random_matrix_ensembles(np_random):
    H = rm.GOE((8, 8), np_random)
    np.testing.assert_allclose(H, H.T)
    H = rm.GUE((8, 8), np_random)
    np.testing.assert_allclose(H, H.conj().T)
    for U in [rm.CUE((8, 8), np_random), rm.CRE((8, 8), np_random),
              rm.COE((8, 8), np_random), rm.U_close_1((8, 8), rng=np_random),
              rm.O_close_1((8, 8), rng=np_random)]:
        np.testing.assert_allclose(U @ U.conj().T, np.eye(8), atol=1e-12)


def test_random_generation(np_random):
    from cyten_tpu.testing import random_ElementarySpace, random_tensor, \
        randomly_drop_blocks

    sym = ct.u1_symmetry
    be = ct.get_backend(sym, 'numpy')
    V = random_ElementarySpace(sym, np_random)
    V.test_sanity()
    t = random_tensor([V, V], [V], backend=be, rng=np_random)
    assert len(t.data.blocks) > 0
    t2 = randomly_drop_blocks(t, 0.5, np_random)
    assert 1 <= len(t2.data.blocks) <= len(t.data.blocks)


def test_swap_gate_oracle_fermions(np_random):
    """Fermionic permute_legs must match the dense swap-gate oracle (incl. signs)."""
    from cyten_tpu.testing import swap_gate_numpy

    sym = ct.fermion_parity
    be = ct.get_backend(sym, 'numpy')
    V = ElementarySpace(sym, [[0], [1]], [2, 2])
    A = SymmetricTensor.from_random_normal([V, V, V], [], backend=be,
                                           rng=np_random)
    arr = A.to_numpy()
    P = ct.permute_legs(A, codomain=[1, 0, 2], domain=[])
    expect = swap_gate_numpy(arr, A.legs, [1, 0, 2])
    np.testing.assert_allclose(P.to_numpy(), expect, atol=1e-12)
    P2 = ct.permute_legs(A, codomain=[2, 0, 1], domain=[])
    expect2 = swap_gate_numpy(arr, A.legs, [2, 0, 1])
    np.testing.assert_allclose(P2.to_numpy(), expect2, atol=1e-12)


def test_profiling():
    import cyten_tpu as ct
    from cyten_tpu.tools.profiling import OpProfile, annotate, profile_op

    be = ct.get_backend(ct.u1_symmetry, 'numpy')
    leg = ct.ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [4, 8, 4])
    rng = np.random.default_rng(0)
    a = ct.SymmetricTensor.from_random_normal([leg], [leg], backend=be, rng=rng)
    from cyten_tpu.tools.flops import compose_flops

    fl = compose_flops(a, a)
    assert fl > 0
    with annotate('compose'):
        prof = profile_op(ct.compose, a, a, flops=fl, n_iter=2)
    assert isinstance(prof, OpProfile)
    assert prof.wall_seconds > 0
    assert prof.tflops_per_sec > 0
    assert 'TFLOP/s' in repr(prof)


def test_hdf5_reference_named_entry_points(u1_tensor, tmp_path):
    """save_to_hdf5/load_from_hdf5 on open groups (reference hdf5_io.py:1242/1270),
    including auto-detection of reference-format files."""
    import h5py

    from cyten_tpu.tools import (
        Hdf5ImportError, load_from_hdf5, save_to_hdf5,
    )
    from cyten_tpu.tensors import almost_equal

    fn = tmp_path / 'group_api.h5'
    with h5py.File(fn, 'w') as f:
        save_to_hdf5(f, u1_tensor, '/tensor')
        save_to_hdf5(f, {'chi': 32, 'name': 'run'}, '/meta')
    with h5py.File(fn, 'r') as f:
        back = load_from_hdf5(f, '/tensor')
        assert almost_equal(back, u1_tensor, rtol=1e-12, atol=1e-14)
        meta = load_from_hdf5(f, '/meta')
        assert meta == {'chi': 32, 'name': 'run'}
        with pytest.raises(Hdf5ImportError, match='no recognizable'):
            load_from_hdf5(f, '/nonexistent')
    # reference-format detection: files written by our reference exporter
    # (which the reference itself can read) route through reference_import
    from cyten_tpu.tools.reference_export import save_reference_hdf5

    fn2 = tmp_path / 'ref_format.h5'
    with h5py.File(fn2, 'w') as f:
        save_reference_hdf5(u1_tensor, f, '/t')
    with h5py.File(fn2, 'r') as f:
        back2 = load_from_hdf5(f, '/t')
    assert almost_equal(back2, u1_tensor, rtol=1e-12, atol=1e-14)


def test_hdf5_util_functions():
    from cyten_tpu.tools import find_global, valid_hdf5_path_component

    assert valid_hdf5_path_component('tensor')
    assert not valid_hdf5_path_component('a/b')
    assert not valid_hdf5_path_component('.')
    assert not valid_hdf5_path_component('..')
    assert find_global('numpy', 'linalg.norm') is np.linalg.norm
    assert find_global('cyten_tpu', 'SymmetricTensor') is ct.SymmetricTensor


def test_printoptions_namespace():
    """cyten_tpu.printoptions aliases config.printoptions_* (reference
    dummy_config.py:5)."""
    from cyten_tpu import printoptions

    old = printoptions.linewidth
    assert old == ct.config.printoptions_linewidth
    try:
        printoptions.linewidth = 77
        assert ct.config.printoptions_linewidth == 77
    finally:
        printoptions.linewidth = old
    assert printoptions.indent == 2
    assert printoptions.maxlines_spaces > 0


def test_random_generation_extras(np_random):
    """The reference's generator helpers (random_generation.py:13-230)."""
    from cyten_tpu.symmetries import TensorProduct
    from cyten_tpu.testing import (
        check_tensor_memory_usage, find_last_leg, random_ElementarySpace,
        random_LegPipe, random_block, random_factor_sectors,
        random_symmetry_sectors,
    )

    bb = ct.get_block_backend('numpy')
    b = random_block(bb, (3, 4), real=False, np_random=np_random)
    assert bb.get_shape(b) == (3, 4) and not bb.get_dtype(b).is_real

    sym = ct.u1_symmetry * ct.z3_symmetry
    s = random_symmetry_sectors(sym, 6, sort=True, np_random=np_random)
    assert s.shape[1] == sym.sector_ind_len
    assert len(np.unique(s, axis=0)) == len(s)            # unique
    assert np.array_equal(s, s[np.lexsort(s.T)])          # sorted
    for sec in s:
        assert sym.is_valid_sector(sec)

    fs = random_factor_sectors(ct.su2_symmetry, 5, np_random=np_random)
    assert fs.shape == (5, 1) and len(np.unique(fs)) == 5

    be = ct.get_backend(ct.u1_symmetry, 'numpy')
    pipe = random_LegPipe(ct.u1_symmetry, be, max_sectors=6, max_mult=6,
                          num_legs=2, np_random=np_random)
    assert pipe.num_legs == 2
    pipe.test_sanity()

    V = random_ElementarySpace(ct.u1_symmetry, np_random, is_dual=False)
    W = random_ElementarySpace(ct.u1_symmetry, np_random, is_dual=False)
    X = random_ElementarySpace(ct.u1_symmetry, np_random, is_dual=False)
    leg = find_last_leg(TensorProduct([V, W]), TensorProduct([X]),
                        max_sectors=4, max_mult=4, np_random=np_random)
    T = ct.SymmetricTensor.from_random_normal([V, W, leg], [X], backend=be,
                                              rng=np_random)
    assert ct.norm(T) > 0   # the found leg admits nonzero blocks
    check_tensor_memory_usage(T.codomain, T.domain, real=True)
    with pytest.raises(RuntimeError, match='memory'):
        check_tensor_memory_usage(T.codomain, T.domain, real=True,
                                  limit_gb=1e-12)


def test_racah_W_alias():
    from cyten_tpu.symmetries.su2_data import racah_W, racah_w, six_j

    assert racah_W is racah_w
    # W(1/2 1/2 1 1/2; 1 1/2): phase (-1)^(1/2+1/2+1/2+1... ) — just pin the 6j relation
    val = racah_W(1, 1, 2, 1, 2, 1)
    expect = (-1 if ((1 + 1 + 1 + 2) // 2) % 2 else 1) * six_j(1, 1, 2, 1, 2, 1)
    assert abs(val - expect) < 1e-15


def test_hdf5_shared_object_identity(tmp_path, np_random):
    """Shared-object memoization (VERDICT r4 #6, reference memorize_save/load
    semantics): an object graph whose tensors share one ElementarySpace
    serializes ONE copy and reloads with `is`-identity restored."""
    leg = ElementarySpace(ct.u1_symmetry, [[0], [1]], [2, 3])
    be = ct.get_backend(ct.u1_symmetry, 'numpy')
    A = SymmetricTensor.from_random_normal([leg], [leg], backend=be,
                                           labels=['a', 'b'], rng=np_random)
    B = SymmetricTensor.from_random_normal([leg], [leg], backend=be,
                                           labels=['a', 'b'], rng=np_random)
    tree = hdf5_io.to_tree([A, B, {'leg': leg}])
    assert tree['__type__'] == 'Graph'
    n_spaces = sum(1 for t in tree['shared'].values()
                   if isinstance(t, dict)
                   and t.get('__type__') == 'ElementarySpace')
    assert n_spaces == 1  # one stored copy for four references
    fn = str(tmp_path / 'shared.h5')
    hdf5_io.save([A, B, {'leg': leg}], fn)
    A2, B2, d2 = hdf5_io.load(fn)
    assert A2.codomain.factors[0] is B2.codomain.factors[0]
    assert A2.codomain.factors[0] is A2.domain.factors[0]
    assert A2.codomain.factors[0] is d2['leg']
    np.testing.assert_allclose(np.asarray(A2.data.blocks[0]),
                               np.asarray(A.data.blocks[0]))


def test_hdf5_cycles_and_plain_layout(tmp_path):
    """Reference cycles through lists/dicts round-trip; trees WITHOUT sharing
    keep the plain (un-wrapped) pre-round-5 layout; cycles through immutable
    nodes raise a clear error on load."""
    lst = [1, 2]
    lst.append(lst)
    d = {'x': lst}
    lst.append(d)
    tree = hdf5_io.to_tree(d)
    assert tree['__type__'] == 'Graph'
    fn = str(tmp_path / 'cyc.h5')
    hdf5_io.save(d, fn)
    d2 = hdf5_io.load(fn)
    assert d2['x'][2] is d2['x']
    assert d2['x'][3] is d2
    # no sharing -> no Graph wrapper (backward-compatible layout)
    t2 = hdf5_io.to_tree({'x': 1, 'y': np.arange(3)})
    assert t2['__type__'] == 'dict'
