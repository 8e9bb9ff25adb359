"""Write HDF5 files readable by the reference cyten's ``Hdf5Loader``.

Counterpart of :mod:`.reference_import` (which READS reference-written files):
this module WRITES the reference's typed-object-graph format (reference
cyten/tools/hdf5_io.py:431-1241 — ``'type'`` attributes naming ``REPR_*``
formats, ``'class'``/``'module'`` attributes for instances, hard links for
shared objects), with instance nodes pointing at the *reference's* class paths,
so files produced here load in the reference via its own ``load_from_hdf5`` /
per-class ``from_hdf5`` hooks. Together the two modules give migration in both
directions.

Scope (mirrors what the reference itself round-trips losslessly):

- containers & scalars: None/bool/int/float/complex/str/bytes, numpy scalars,
  numpy arrays, numpy dtypes, list/tuple/set/dict/range
- symmetries: product ``Symmetry`` + all :class:`SymmetryFactor` subclasses
  whose class names exist in the reference (the reference's own
  ``SymmetryFactor.save_hdf5``, _symmetries.py:1164-1172, stores only the
  generic fields — the format is equally lossy for e.g. ``ZN.N``)
- spaces: ``ElementarySpace`` (abelian ``LegPipe``s are flattened to their
  ``ElementarySpace`` form — the reference's pipe hook is inherited from
  ``ElementarySpace`` and equally flat), ``TensorProduct``
- tensors: ``SymmetricTensor`` on the abelian backend (block layout per
  reference abelian.py:88-149). Blocks are converted to numpy on write, so jax
  and torch block backends export transparently.

``DiagonalTensor``/``Mask``/``ChargedTensor`` raise (the reference's own saver
falls back to pickle-reduce for their data — no stable format exists to
target); convert with ``as_SymmetricTensor()`` first.
"""

from __future__ import annotations

import numbers

import numpy as np

__all__ = ['ReferenceExportError', 'save_reference_hdf5', 'save_reference_file']


class ReferenceExportError(Exception):
    """Raised when an object cannot be written in the reference format."""


# format constants (reference hdf5_io.py:240-300)
from .hdf5_io import (  # the reference's wire-format vocabulary
    ATTR_CLASS as _ATTR_CLASS, ATTR_LEN as _ATTR_LEN,
    ATTR_MODULE as _ATTR_MODULE, ATTR_TYPE as _ATTR_TYPE,
)

_MOD_SYM = 'cyten.symmetries._symmetries'
_MOD_SPACES = 'cyten.symmetries.spaces'
_MOD_TENSORS = 'cyten.tensors._tensors'
_MOD_ABELIAN = 'cyten.backends.abelian'

# the reference's Dtype enum values (reference block_backends/dtypes.py:12-20);
# they differ from ours for the complex types
_REF_DTYPE_VALUE = {'bool': 2, 'float32': 8, 'complex64': 9,
                    'float64': 16, 'complex128': 17}

_NP_SCALARS = [(np.int64, 'np.int64'), (np.float64, 'np.float64'),
               (np.complex128, 'np.complex128'), (np.int32, 'np.int32'),
               (np.float32, 'np.float32'), (np.complex64, 'np.complex64'),
               (np.bool_, 'bool')]


def _valid_path_component(key):
    return (isinstance(key, str) and len(key) > 0 and '/' not in key
            and key != '.' and key != '..')


class _RefWriter:
    """Writes the reference Hdf5Saver object graph (memoized hard links)."""

    def __init__(self, h5group):
        self.h5 = h5group
        self.memo = {}

    # --- generic dispatch ----------------------------------------------------

    def save(self, obj, path):
        key = id(obj)
        hit = self.memo.get(key)
        if hit is not None:
            h5gr, _ = hit
            self.h5[path] = h5gr  # hard link = the reference's shared-object encoding
            return h5gr
        h5gr = self._save_new(obj, path)
        # keep obj alive so id() stays unique (reference memo does the same)
        self.memo[id(obj)] = (h5gr, obj)
        return h5gr

    def _save_new(self, obj, path):
        from ..dtypes import Dtype
        from ..symmetries.core import Symmetry, SymmetryFactor
        from ..symmetries.spaces import ElementarySpace, LegPipe, TensorProduct
        from ..tensors._tensors import (
            ChargedTensor, DiagonalTensor, Mask, SymmetricTensor,
        )

        if obj is None:
            return self._dataset('None', path, 'None')
        if isinstance(obj, (bool, np.bool_)):
            return self._dataset(bool(obj), path, 'bool')
        for np_t, repr_t in _NP_SCALARS:
            if isinstance(obj, np_t):
                return self._dataset(obj, path, repr_t)
        if isinstance(obj, numbers.Integral):
            obj = int(obj)
            if obj.bit_length() >= 64:
                return self._dataset(str(obj), path, 'int_as_str')
            return self._dataset(obj, path, 'int')
        if isinstance(obj, numbers.Real) and not isinstance(obj, numbers.Integral):
            return self._dataset(float(obj), path, 'float')
        if isinstance(obj, numbers.Complex) and not isinstance(obj, numbers.Real):
            return self._dataset(complex(obj), path, 'complex')
        if isinstance(obj, str):
            return self._dataset(obj, path, 'str')
        if isinstance(obj, bytes):
            return self._dataset(obj, path, 'bytes')
        if isinstance(obj, np.ndarray):
            return self._dataset(obj, path, 'array')
        if isinstance(obj, np.dtype):
            return self._save_np_dtype(obj, path)
        if isinstance(obj, list):
            return self._save_iterable(obj, path, 'list')
        if isinstance(obj, tuple):
            return self._save_iterable(obj, path, 'tuple')
        if isinstance(obj, set):
            return self._save_iterable(obj, path, 'set')
        if isinstance(obj, dict):
            return self._save_dict(obj, path)
        if isinstance(obj, range):
            gr = self._group(path, 'range')
            self.save(obj.start, path + '/start')
            self.save(obj.stop, path + '/stop')
            self.save(obj.step, path + '/step')
            return gr
        if isinstance(obj, Dtype):
            # bare Dtype fields are written as the reference enum VALUE
            return self._dataset(self._ref_dtype_value(obj), path, 'int')
        if isinstance(obj, Symmetry):
            return self._save_symmetry(obj, path)
        if isinstance(obj, SymmetryFactor):
            return self._save_factor(obj, path)
        if isinstance(obj, LegPipe):
            es = self._pipe_as_elementary(obj)
            return self._save_elementary_space(es, path)
        if isinstance(obj, ElementarySpace):
            return self._save_elementary_space(obj, path)
        if isinstance(obj, TensorProduct):
            return self._save_tensor_product(obj, path)
        if isinstance(obj, (DiagonalTensor, Mask, ChargedTensor)):
            raise ReferenceExportError(
                f'{type(obj).__name__} has no stable reference format (the '
                f'reference saver itself falls back to pickle-reduce for it); '
                f'export as_SymmetricTensor() instead.')
        if isinstance(obj, SymmetricTensor):
            return self._save_symmetric_tensor(obj, path)
        raise ReferenceExportError(
            f"Don't know how to export {type(obj)!r} in the reference format")

    # --- leaf / container helpers --------------------------------------------

    def _dataset(self, value, path, type_repr):
        self.h5[path] = value
        h5gr = self.h5[path]
        h5gr.attrs[_ATTR_TYPE] = type_repr
        return h5gr

    def _group(self, path, type_repr):
        gr = self.h5.create_group(path) if path not in ('/', '') else self.h5['/']
        gr.attrs[_ATTR_TYPE] = type_repr
        return gr

    def _instance(self, path, ref_class, ref_module):
        gr = self.h5.create_group(path) if path not in ('/', '') else self.h5['/']
        gr.attrs[_ATTR_TYPE] = 'instance'
        gr.attrs[_ATTR_CLASS] = ref_class
        gr.attrs[_ATTR_MODULE] = ref_module
        return gr

    def _save_iterable(self, obj, path, type_repr):
        gr = self._group(path, type_repr)
        gr.attrs[_ATTR_LEN] = len(obj)
        for i, elem in enumerate(obj):
            self.save(elem, path + '/' + str(i))
        return gr

    def _save_dict(self, obj, path):
        if all(_valid_path_component(k) for k in obj):
            gr = self._group(path, 'simple_dict')
            for k, v in obj.items():
                self.save(v, path + '/' + k)
            return gr
        gr = self._group(path, 'dict')
        self._save_iterable(list(obj.keys()), path + '/keys', 'list')
        self._save_iterable(list(obj.values()), path + '/values', 'list')
        return gr

    def _save_np_dtype(self, dt, path):
        gr = self._group(path, 'dtype')
        gr.attrs['name'] = getattr(dt, 'name', 'void')
        self.save(dt.descr if dt.fields is not None else [], path + '/descr')
        return gr

    def _ref_dtype_value(self, dtype):
        name = np.dtype(dtype.to_numpy).name  # Dtype.to_numpy is a property
        try:
            return _REF_DTYPE_VALUE[name]
        except KeyError:
            raise ReferenceExportError(
                f'dtype {name} does not exist in the reference (its Dtype enum '
                f'stops at complex128; bfloat16 is cyten_tpu-only)') from None

    # --- symmetries (reference _symmetries.py:715-739, 1164-1172) -------------

    def _save_symmetry(self, sym, path):
        gr = self._instance(path, 'Symmetry', _MOD_SYM)
        self.save(list(sym.factors), path + '/factors')
        self.save(np.asarray(sym.sector_slices), path + '/sector_slices')
        self.save(self._ref_dtype_value(sym.fusion_tensor_dtype),
                  path + '/fusion_tensor_dtype')
        self.save(int(sym.fusion_style.value), path + '/fusion_style')
        self.save(int(sym.braiding_style.value), path + '/braiding_style')
        self.save(np.asarray(sym.trivial_sector), path + '/trivial_sector')
        self.save(sym.num_sectors if sym.num_sectors == np.inf
                  else int(sym.num_sectors), path + '/num_sectors')
        self.save(int(sym.sector_ind_len), path + '/sector_ind_len')
        gr.attrs['has_complex_topological_data'] = \
            bool(sym.has_complex_topological_data)
        return gr

    def _save_factor(self, f, path):
        cls_name = type(f).__name__
        gr = self._instance(path, cls_name, _MOD_SYM)
        self.save(f.group_name, path + '/group_name')
        self.save(int(f.fusion_style.value), path + '/fusion_style')
        self.save(int(f.braiding_style.value), path + '/braiding_style')
        self.save(np.asarray(f.trivial_sector), path + '/trivial_sector')
        self.save(f.num_sectors if f.num_sectors == np.inf
                  else int(f.num_sectors), path + '/num_sectors')
        self.save(int(f.sector_ind_len), path + '/sector_ind_len')
        gr.attrs['descriptive_name'] = str(f.descriptive_name)
        gr.attrs['has_complex_topological_data'] = \
            bool(f.has_complex_topological_data)
        return gr

    # --- spaces (reference spaces.py:1452-1486, 1997-2027) --------------------

    def _pipe_as_elementary(self, pipe):
        from ..symmetries.spaces import ElementarySpace

        if hasattr(pipe, 'as_ElementarySpace'):
            es = pipe.as_ElementarySpace()
            if isinstance(es, ElementarySpace):
                return es
        raise ReferenceExportError(
            'cannot flatten this LegPipe to an ElementarySpace for export '
            '(fusion-tree pipes have no flat reference form)')

    def _save_elementary_space(self, sp, path):
        gr = self._instance(path, 'ElementarySpace', _MOD_SPACES)
        self.save(np.asarray(sp.defining_sectors), path + '/defining_sectors')
        self.save(np.asarray(sp.sector_decomposition),
                  path + '/sector_decomposition')
        self.save(sp.sector_order, path + '/sector_order')
        self.save(None if sp._basis_perm is None else np.asarray(sp._basis_perm),
                  path + '/_basis_perm')
        self.save(None if sp._inverse_basis_perm is None
                  else np.asarray(sp._inverse_basis_perm),
                  path + '/_inverse_basis_perm')
        self.save(np.asarray(sp.multiplicities), path + '/multiplicities')
        self.save(sp.symmetry, path + '/symmetry')
        self.save(int(sp.dim), path + '/dim')
        self.save(int(sp.num_sectors), path + '/num_sectors')
        self.save(np.asarray(sp.slices), path + '/slices')
        self.save(np.asarray(sp.sector_dims), path + '/sector_dims')
        gr.attrs['is_dual'] = bool(sp.is_dual)
        return gr

    def _save_tensor_product(self, tp, path):
        gr = self._instance(path, 'TensorProduct', _MOD_SPACES)
        self.save(list(tp.factors), path + '/factors')
        self.save(np.asarray(tp.slices), path + '/slices')
        self.save(tp.symmetry, path + '/symmetry')
        self.save(int(tp.num_sectors), path + '/num_sectors')
        self.save(int(tp.num_factors), path + '/num_factors')
        self.save(np.asarray(tp.sector_decomposition),
                  path + '/sector_decomposition')
        self.save(tp.sector_order, path + '/sector_order')
        self.save(int(tp.dim), path + '/dim')
        self.save(np.asarray(tp.multiplicities), path + '/multiplicities')
        self.save(np.asarray(tp.sector_dims), path + '/sector_dims')
        return gr

    # --- tensors (reference _tensors.py:1483-1501, abelian.py:171-189) --------

    def _save_symmetric_tensor(self, t, path):
        from ..backends.abelian import AbelianBackend

        if not isinstance(t.backend, AbelianBackend):
            raise ReferenceExportError(
                f'reference export supports abelian-backend tensors, not '
                f'{type(t.backend).__name__} (the reference loader rebuilds '
                f'the backend from the symmetry)')
        gr = self._instance(path, 'SymmetricTensor', _MOD_TENSORS)
        self.save(t.domain, path + '/domain')
        self.save(t.codomain, path + '/codomain')
        self._save_backend(path + '/backend')
        self._save_abelian_data(t, path + '/data')
        self.save(t.symmetry, path + '/symmetry')
        self.save(np.dtype(t.dtype.to_numpy), path + '/dtype')
        self.save('cpu', path + '/device')
        gr.attrs['num_legs'] = int(t.num_legs)
        gr.attrs['shape'] = np.array([int(d) for d in t.shape], np.intp)
        gr.attrs['cls'] = 'SymmetricTensor'
        labels = t.labels
        gr.attrs['labels'] = [] if all(l is None for l in labels) \
            else [str(l) for l in labels]
        return gr

    def _save_backend(self, path):
        gr = self._instance(path, 'AbelianBackend', _MOD_ABELIAN)
        sub = self.h5.create_group(path + '/DataCls')
        sub.attrs[_ATTR_TYPE] = 'class'
        sub.attrs[_ATTR_CLASS] = 'AbelianBackendData'
        sub.attrs[_ATTR_MODULE] = _MOD_ABELIAN
        return gr

    def _save_abelian_data(self, t, path):
        gr = self._instance(path, 'AbelianBackendData', _MOD_ABELIAN)
        data = t.data
        self.save(np.asarray(data.block_inds), path + '/block_inds')
        blocks = [np.asarray(t.backend.block_backend.to_numpy(b))
                  for b in data.blocks]
        self._save_iterable(blocks, path + '/blocks', 'list')
        self.save(np.dtype(t.dtype.to_numpy), path + '/dtype')
        self.save('cpu', path + '/device')
        return gr


def save_reference_hdf5(obj, h5group, path='/'):
    """Save `obj` into an open h5py group in the reference's format.

    Like the reference's ``save_to_hdf5``: `path` ``'/'`` reuses the (empty)
    root group (only group-formatted objects — dicts, lists, instances — can
    live at the root, as in the reference).
    """
    return _RefWriter(h5group).save(obj, path)


def save_reference_file(obj, filename, mode='w'):
    """Save `obj` to `filename` (.h5/.hdf5) in the reference's format."""
    import h5py

    with h5py.File(filename, mode) as f:
        save_reference_hdf5(obj, f)
