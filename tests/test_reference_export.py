"""Reference HDF5 interop, write side: files we write load in the REFERENCE.

Counterpart of test_reference_import.py: objects are exported with
``cyten_tpu.tools.reference_export`` and read back with the reference's own
``load_from_hdf5`` (imported standalone), then compared numerically against
the reference's dense conversion.
"""

import sys
import types

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import ElementarySpace, SymmetricTensor
from cyten_tpu.tools.reference_export import (
    ReferenceExportError, save_reference_file,
)

h5py = pytest.importorskip('h5py')


@pytest.fixture(scope='module')
def ref():
    try:
        if 'cyten' not in sys.modules:
            sys.path.insert(0, '/root/reference')
            core = types.ModuleType('cyten._core')
            core.add = lambda i, j: i + j
            core.__all__ = ['add']
            sys.modules['cyten._core'] = core
        import cyten

        return cyten
    except Exception as e:  # pragma: no cover
        pytest.skip(f'reference unavailable: {e}')


def _ref_load(ref, fn):
    import cyten.tools.hdf5_io as ref_io

    with h5py.File(fn, 'r') as f:
        return ref_io.load_from_hdf5(f)


def test_containers_roundtrip(ref, tmp_path):
    obj = {
        'ints': [1, 2, 3],
        'tup': (1.5, 'x', None),
        'arr': np.arange(12).reshape(3, 4),
        'nested': {'a': {'b': True}},
        'rng': range(2, 10, 3),
        'cplx': 1 + 2j,
        'npscalar': np.float64(3.25),
        'weird keys / ': {(1, 2): 'v'},
    }
    fn = tmp_path / 'containers.h5'
    save_reference_file(obj, fn)
    loaded = _ref_load(ref, fn)
    assert loaded['ints'] == [1, 2, 3]
    assert loaded['tup'] == (1.5, 'x', None)
    np.testing.assert_array_equal(loaded['arr'], obj['arr'])
    assert loaded['nested'] == {'a': {'b': True}}
    assert loaded['rng'] == range(2, 10, 3)
    assert loaded['cplx'] == 1 + 2j
    assert loaded['npscalar'] == 3.25
    assert loaded['weird keys / '] == {(1, 2): 'v'}


def test_symmetry_roundtrip(ref, tmp_path):
    sym = ct.u1_symmetry * ct.z3_symmetry.factors[0]
    fn = tmp_path / 'sym.h5'
    save_reference_file({'sym': sym}, fn)
    loaded = _ref_load(ref, fn)['sym']
    assert type(loaded).__name__ == 'Symmetry'
    assert type(loaded.factors[0]).__name__ == 'U1'
    assert type(loaded.factors[1]).__name__ == 'ZN'
    assert loaded.sector_ind_len == 2
    np.testing.assert_array_equal(loaded.trivial_sector, [0, 0])
    assert loaded.factors[0].num_sectors == np.inf


def test_space_roundtrip(ref, tmp_path):
    V = ElementarySpace(ct.u1_symmetry, [[-1], [0], [2]], [2, 3, 1],
                        is_dual=True)
    fn = tmp_path / 'space.h5'
    save_reference_file({'V': V}, fn)
    loaded = _ref_load(ref, fn)['V']
    assert type(loaded).__name__ == 'ElementarySpace'
    np.testing.assert_array_equal(loaded.defining_sectors, V.defining_sectors)
    np.testing.assert_array_equal(loaded.multiplicities, V.multiplicities)
    assert loaded.is_dual == V.is_dual
    assert loaded.dim == V.dim
    loaded.test_sanity()


@pytest.mark.parametrize('bb_name', ['numpy', 'jax'])
def test_tensor_roundtrip(ref, tmp_path, bb_name, np_random):
    """Tensors we write are loaded by the reference and match numerically."""
    be = ct.get_backend(ct.u1_symmetry, bb_name)
    V = ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [2, 3, 2])
    W = ElementarySpace(ct.u1_symmetry, [[0], [1]], [2, 1])
    T = SymmetricTensor.from_random_normal([V, W], [V, W], backend=be,
                                           labels=['a', 'b', 'c', 'd'],
                                           rng=np_random)
    fn = tmp_path / f"tensor_{bb_name}.h5"
    save_reference_file({'T': T, 'psi': [T, T]}, fn)
    loaded = _ref_load(ref, fn)
    ref_T = loaded['T']
    ref_T.test_sanity()
    assert list(ref_T.labels) == ['a', 'b', 'c', 'd']
    np.testing.assert_allclose(ref_T.to_numpy(), T.to_numpy(),
                               rtol=1e-12, atol=1e-12)
    # shared objects become hard links -> the reference loads them as the SAME
    assert loaded['psi'][0] is loaded['psi'][1]
    np.testing.assert_allclose(loaded['psi'][0].to_numpy(), T.to_numpy(),
                               rtol=1e-12, atol=1e-12)


def test_full_cycle_ours_to_ref_to_ours(ref, tmp_path, np_random):
    """ours -> file -> reference -> file -> ours: the two adapters compose."""
    from cyten_tpu.tools.reference_import import load_reference_hdf5
    import cyten.tools.hdf5_io as ref_io

    be = ct.get_backend(ct.u1_symmetry, 'numpy')
    V = ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [1, 2, 1])
    T = SymmetricTensor.from_random_normal([V], [V], backend=be,
                                           labels=['x', 'y'], rng=np_random)
    fn1 = tmp_path / 'ours.h5'
    save_reference_file({'T': T}, fn1)
    ref_T = _ref_load(ref, fn1)['T']
    fn2 = tmp_path / 'theirs.h5'
    with h5py.File(fn2, 'w') as f:
        ref_io.save_to_hdf5(f, {'T': ref_T})
    with h5py.File(fn2, 'r') as f:
        back = load_reference_hdf5(f)['T']
    back.test_sanity()
    np.testing.assert_allclose(back.to_numpy(), T.to_numpy(),
                               rtol=1e-12, atol=1e-12)


def test_unsupported_raise(np_random):
    be = ct.get_backend(ct.u1_symmetry, 'numpy')
    V = ElementarySpace(ct.u1_symmetry, [[0], [1]], [2, 2])
    D = ct.DiagonalTensor.from_random_normal(V, backend=be, rng=np_random)
    with pytest.raises(ReferenceExportError, match='as_SymmetricTensor'):
        save_reference_file({'D': D}, '/tmp/_never_written.h5')
    su2_be = ct.get_backend(ct.su2_symmetry, 'numpy')
    Vs = ElementarySpace(ct.su2_symmetry, [[0], [1]], [1, 1])
    Ts = SymmetricTensor.from_random_normal([Vs], [Vs], backend=su2_be,
                                            rng=np_random)
    with pytest.raises(ReferenceExportError, match='abelian'):
        save_reference_file({'T': Ts}, '/tmp/_never_written.h5')
