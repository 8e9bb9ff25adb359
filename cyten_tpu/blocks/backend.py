"""Dense block operations over a numpy-like namespace.

Role-equivalent to the reference's ``BlockBackend`` ABC
(cyten/block_backends/_block_backend.py:23-741, ~90 methods: creation, elementwise,
reshape/permute, combine/split legs, matrix kernels) and its concrete numpy
(cyten/block_backends/numpy.py), torch (torch.py) and array-api (array_api.py)
implementations.

TPU-first redesign:

- One generic implementation over a numpy-like namespace ``self.xp`` covers both JAX
  (``jax.numpy``) and numpy. The JAX backend is the production path — all of its methods
  are jit-traceable, so symmetric-tensor ops built from them compile to fused XLA
  programs on the MXU.
- ``combine_legs``/``split_legs`` support C- and F-style flattening *without* relying on
  ``order='F'`` (which jax lacks): F-style flattening of an axis group equals C-style
  flattening of the reversed group, so we transpose-then-reshape. This keeps the op a
  pure layout change that XLA folds away.
- Randomness is generated host-side with a numpy Generator and transferred once;
  random blocks are used for initialization and tests, never in the hot path.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence, TypeVar

import numpy as np

from ..dtypes import Dtype

__all__ = ['ArrayApiBlockBackend', 'Block', 'BlockBackend', 'JaxBlockBackend',
           'NumpyBlockBackend', 'get_block_backend']

Block = TypeVar('Block')  # jax.Array | np.ndarray

_BF16 = Dtype.bfloat16.to_numpy  # ml_dtypes-registered numpy dtype, shared with jax


class BlockBackend:
    """Dense-array contract. Instances are stateless except for an RNG for test data."""

    svd_algorithms: list[str] = ['default']
    can_jit = False
    name = 'abstract'

    def __init__(self, xp):
        self.xp = xp
        self._rng = np.random.default_rng()

    def __repr__(self):
        return f'{type(self).__name__}()'

    def __reduce__(self):
        # backends hold module references (self.xp); restore via the factory
        return (get_block_backend, (self.name,))

    def test_block_sanity(self, block, expect_shape=None, expect_dtype=None):
        assert self.is_block(block), 'not a block'
        if expect_shape is not None:
            assert tuple(block.shape) == tuple(expect_shape), \
                f'wrong shape: {block.shape} != {expect_shape}'
        if expect_dtype is not None:
            assert self.get_dtype(block) == expect_dtype

    # --- dtype mapping -----------------------------------------------------------

    def to_internal_dtype(self, dtype: Dtype):
        return dtype.to_numpy

    def get_dtype(self, block) -> Dtype:
        return Dtype.from_numpy(block.dtype)

    def to_dtype(self, block, dtype: Dtype):
        if self.get_dtype(block).is_complex and not dtype.is_complex:
            # take the real part explicitly: complex->real astype is deprecated
            # in jax and raises ComplexWarning in numpy
            block = block.real
        return block.astype(self.to_internal_dtype(dtype))

    # --- creation / conversion ----------------------------------------------------

    def is_block(self, obj) -> bool:
        raise NotImplementedError

    def as_block(self, obj, dtype: Dtype = None, return_dtype: bool = False):
        block = self.xp.asarray(obj)
        if block.dtype in (np.int32, np.int64) or str(block.dtype).startswith('int'):
            block = block.astype(self.to_internal_dtype(Dtype.float64)
                                 if dtype is None else self.to_internal_dtype(dtype))
        elif dtype is not None:
            block = block.astype(self.to_internal_dtype(dtype))
        if return_dtype:
            return block, self.get_dtype(block)
        return block

    def copy_block(self, block):
        return self.xp.array(block, copy=True)

    def to_numpy(self, block, numpy_dtype=None) -> np.ndarray:
        res = np.asarray(block)
        if numpy_dtype is not None:
            res = res.astype(numpy_dtype)
        return res

    def zeros(self, shape, dtype: Dtype = Dtype.float64):
        return self.xp.zeros(tuple(shape), self.to_internal_dtype(dtype))

    def ones(self, shape, dtype: Dtype = Dtype.float64):
        return self.xp.ones(tuple(shape), self.to_internal_dtype(dtype))

    def eye_matrix(self, dim: int, dtype: Dtype = Dtype.float64):
        return self.xp.eye(dim, dtype=self.to_internal_dtype(dtype))

    def eye_block(self, legs: Sequence[int], dtype: Dtype = Dtype.float64):
        """Identity map from legs [J, J', ...] to itself; axes [J, J', ..., J*, J'*, ...]."""
        d = math.prod(legs)
        eye = self.xp.eye(d, dtype=self.to_internal_dtype(dtype))
        return self.xp.reshape(eye, tuple(legs) + tuple(legs))

    def block_random_uniform(self, shape, dtype: Dtype, rng: np.random.Generator = None):
        rng = rng if rng is not None else self._rng
        res = rng.uniform(-1, 1, size=tuple(shape))
        if dtype.is_complex:
            res = res + 1j * rng.uniform(-1, 1, size=tuple(shape))
        return self.as_block(res, dtype)

    def block_random_normal(self, shape, dtype: Dtype, sigma: float = 1.,
                            rng: np.random.Generator = None):
        rng = rng if rng is not None else self._rng
        res = rng.normal(scale=sigma, size=tuple(shape))
        if dtype.is_complex:
            res = res + 1j * rng.normal(scale=sigma, size=tuple(shape))
        return self.as_block(res, dtype)

    # --- shape / structure ----------------------------------------------------------

    def get_shape(self, block) -> tuple[int, ...]:
        return tuple(block.shape)

    def reshape(self, block, shape):
        return self.xp.reshape(block, tuple(shape))

    def permute_axes(self, block, permutation: Sequence[int]):
        return self.xp.transpose(block, tuple(permutation))

    def moveaxis(self, block, source, destination):
        return self.xp.moveaxis(block, source, destination)

    def add_axis(self, block, pos: int):
        return self.xp.expand_dims(block, pos)

    def squeeze_axes(self, block, idcs: Sequence[int]):
        if len(idcs) == 0:
            return block
        return self.xp.squeeze(block, tuple(idcs))

    def combine_legs(self, block, leg_idcs_combine: Sequence[Sequence[int]],
                     cstyles: Sequence[bool] = None):
        """Flatten each contiguous group of axes into one axis, C- or F-style per group.

        F-style flattening == C-style flattening of the reversed axes, implemented via a
        single transpose + reshape (cf. reference _block_backend.py:183-213; redesigned
        without ``order='F'`` so it stays jit-traceable).
        """
        old_shape = block.shape
        if cstyles is None:
            cstyles = [True] * len(leg_idcs_combine)
        perm = []
        new_shape = []
        last = 0
        for group, cstyle in zip(leg_idcs_combine, cstyles):
            first_g = group[0]
            perm.extend(range(last, first_g))
            new_shape.extend(old_shape[last:first_g])
            perm.extend(group if cstyle else group[::-1])
            new_shape.append(math.prod(old_shape[i] for i in group))
            last = group[-1] + 1
        perm.extend(range(last, len(old_shape)))
        new_shape.extend(old_shape[last:])
        if perm != list(range(len(old_shape))):
            block = self.xp.transpose(block, tuple(perm))
        return self.xp.reshape(block, tuple(new_shape))

    def split_legs(self, block, idcs: Sequence[int], dims: Sequence[Sequence[int]],
                   cstyles: Sequence[bool] = None):
        """Inverse of :meth:`combine_legs`: expand each axis ``idcs[i]`` into ``dims[i]``."""
        if cstyles is None:
            cstyles = [True] * len(idcs)
        new_shape = []
        # per new axis position, whether it is part of a reversed (F-style) group
        groups = []  # (start, stop) ranges in new_shape to reverse afterwards
        last = 0
        for i, dim_group, cstyle in zip(idcs, dims, cstyles):
            new_shape.extend(block.shape[last:i])
            start = len(new_shape)
            new_shape.extend(dim_group if cstyle else list(dim_group)[::-1])
            if not cstyle and len(dim_group) > 1:
                groups.append((start, len(new_shape)))
            last = i + 1
        new_shape.extend(block.shape[last:])
        block = self.xp.reshape(block, tuple(new_shape))
        if groups:
            perm = list(range(len(new_shape)))
            for start, stop in groups:
                perm[start:stop] = perm[start:stop][::-1]
            block = self.xp.transpose(block, tuple(perm))
        return block

    def permute_combined(self, block, axis: int, dims: Sequence[int],
                         perm: Sequence[int], cstyle: bool = True):
        """Permute the constituent factors inside a combined (flattened) axis.

        ``axis`` was combined from factors of sizes ``dims`` (in the given style); the
        result is as if the factors had been permuted by ``perm`` before combining (the
        factor at old position perm[i] moves to position i).
        Capability-equivalent to reference ``permute_combined_matrix``
        (_block_backend.py:426-506), generalized to any single axis.
        """
        n_before = axis
        shape = block.shape
        factor_dims = list(dims) if cstyle else list(dims)[::-1]
        new_shape = shape[:axis] + tuple(factor_dims) + shape[axis + 1:]
        block = self.xp.reshape(block, new_shape)
        if cstyle:
            inner = [n_before + p for p in perm]
        else:
            k = len(dims)
            inner = [n_before + (k - 1 - p) for p in reversed(perm)]
        axes = (tuple(range(n_before)) + tuple(inner)
                + tuple(range(n_before + len(dims), len(new_shape))))
        block = self.xp.transpose(block, axes)
        return self.xp.reshape(block, shape[:axis] + (math.prod(dims),) + shape[axis + 1:])

    def enlarge_block(self, block, new_shape, slices: Sequence[slice]):
        """Embed `block` into a zero block of `new_shape` at position `slices`."""
        res = self.xp.zeros(tuple(new_shape), block.dtype)
        return self._setitem(res, tuple(slices), block)

    def _setitem(self, block, idx, value):
        block = np.asarray(block).copy()
        block[idx] = np.asarray(value)
        return self.xp.asarray(block)

    # --- scatter-accumulate (mutable for numpy, functional for jax) -----------------

    def accumulator(self, shape, dtype: Dtype):
        """A zero block that :meth:`accum_add` may mutate in place."""
        return np.zeros(tuple(shape), dtype.to_numpy)

    def accum_add(self, acc, idx, value):
        """``acc[idx] += value`` on an accumulator from :meth:`accumulator`."""
        acc[idx] += np.asarray(value)
        return acc

    def finalize_accumulator(self, acc):
        return self.xp.asarray(acc)

    def batched_slice(self, block, starts, shape):
        """Stack the equal-shaped 2D windows ``block[r:r+h, c:c+w]`` for each
        row ``(r, c)`` of ``starts`` into a ``[len(starts), h, w]`` block.

        Generic fallback loops; the jax backend lowers this to ONE gather —
        the compile-time lever of the fusion-tree plan application (one XLA op
        per (group, source block) instead of one slice per plan entry)."""
        h, w = shape
        return self.stack([block[r:r + h, c:c + w] for r, c in starts], axis=0)

    def batched_accum_add(self, acc, starts, updates):
        """``acc[r_i:r_i+h, c_i:c_i+w] += updates[i]`` for each row ``(r_i, c_i)``
        of ``starts`` (repeated windows accumulate). Jax: ONE scatter-add."""
        h, w = updates[0].shape if hasattr(updates[0], 'shape') else updates.shape[1:]
        for k, (r, c) in enumerate(starts):
            acc = self.accum_add(acc, (slice(r, r + h), slice(c, c + w)),
                                 updates[k])
        return acc

    def take_rows(self, block, idx):
        """``block[idx]`` for a host-side integer index array (axis 0)."""
        return block[np.asarray(idx, np.intp)]

    def get_block_element(self, block, idx):
        res = block[tuple(idx)]
        return self.block_item(res)

    def block_item(self, block):
        arr = np.asarray(block)
        assert arr.size == 1, 'not a scalar block'
        return arr.reshape(()).item()

    def stack(self, blocks, axis: int = 0):
        return self.xp.stack(blocks, axis=axis)

    def concatenate(self, blocks, axis: int = 0):
        return self.xp.concatenate(blocks, axis=axis)

    # --- elementwise ----------------------------------------------------------------

    def conj(self, block):
        return self.xp.conj(block)

    def real(self, block):
        return self.xp.real(block)

    def imag(self, block):
        return self.xp.imag(block)

    def angle(self, block):
        return self.xp.angle(block)

    def abs(self, block):
        return self.xp.abs(block)

    def sqrt(self, block):
        return self.xp.sqrt(block)

    def exp(self, block):
        return self.xp.exp(block)

    def log(self, block):
        return self.xp.log(block)

    def stable_log(self, block, cutoff: float):
        return self.xp.where(block > cutoff, self.xp.log(
            self.xp.where(block > cutoff, block, 1.)), 0.)

    def cutoff_inverse(self, block, cutoff: float):
        safe = self.xp.where(self.xp.abs(block) > cutoff, block, 1.)
        return self.xp.where(self.xp.abs(block) > cutoff, 1. / safe, 0.)

    def real_if_close(self, block, tol: float):
        if self.get_dtype(block).is_complex:
            eps = self.get_dtype(block).eps
            if self.to_numpy(self.max_abs(self.xp.imag(block))) <= tol * eps:
                return self.xp.real(block)
        return block

    def apply_elementwise(self, func: Callable, *blocks, **func_kwargs):
        return func(*blocks, **func_kwargs)

    def mul(self, a, block):
        return a * block

    def add(self, block1, block2):
        return block1 + block2

    def linear_combination(self, a, block1, b, block2):
        return a * block1 + b * block2

    # --- boolean / comparison ---------------------------------------------------------

    def allclose(self, a, b, rtol: float = 1e-5, atol: float = 1e-8) -> bool:
        return bool(np.allclose(self.to_numpy(a), self.to_numpy(b), rtol=rtol, atol=atol))

    def block_all(self, block) -> bool:
        return bool(self.xp.all(block))

    def block_any(self, block) -> bool:
        return bool(self.xp.any(block))

    def sum_mask(self, mask) -> int:
        return int(self.xp.sum(mask))

    def apply_mask(self, block, mask, ax: int):
        """Index `block` along axis `ax` with a boolean mask (host-side shape change)."""
        mask_np = self.to_numpy(mask).astype(bool)
        idx = np.nonzero(mask_np)[0]
        return self.xp.take(block, self.xp.asarray(idx), axis=ax)

    # --- reductions -------------------------------------------------------------------

    def norm(self, block, order=2) -> float:
        block, _ = self._linalg_upcast(block)  # accumulate reductions in f32
        flat = self.xp.reshape(block, (-1,))
        if order == 2:
            return float(self.xp.sqrt(self.xp.sum(self.xp.abs(flat) ** 2)))
        if order == np.inf:
            return float(self.xp.max(self.xp.abs(flat))) if flat.shape[0] else 0.
        return float(self.xp.sum(self.xp.abs(flat) ** order) ** (1. / order))

    def norm_sq(self, block):
        """Squared Frobenius norm as a *backend scalar* — NO host transfer.

        Device backends return a 0-d device array here; per-tensor norms sum
        these on device and pay a single host fetch for the final result,
        instead of one round trip per block (each ~30 ms through a tunneled
        TPU — the dominant cost of an eager ``norm`` on many-sector tensors).
        """
        block, _ = self._linalg_upcast(block)  # accumulate reductions in f32
        flat = self.xp.reshape(block, (-1,))
        return self.xp.sum(self.xp.abs(flat) ** 2)

    def max_abs(self, block):
        return self.xp.max(self.xp.abs(block))

    def block_max(self, block):
        return self.xp.max(block)

    def block_min(self, block):
        return self.xp.min(block)

    def block_sum_all(self, block):
        return self.xp.sum(block)

    def block_sum(self, block, ax: int):
        return self.xp.sum(block, axis=ax)

    def argmax(self, block) -> tuple[int, ...]:
        flat_idx = int(np.argmax(self.to_numpy(self.abs(block))))
        return tuple(int(i) for i in np.unravel_index(flat_idx, block.shape))

    # --- diagonal / trace -----------------------------------------------------------

    def get_diagonal(self, block, check_offdiagonal: bool = False):
        d = min(block.shape)
        diag = self.xp.diagonal(self.xp.reshape(block, (block.shape[0], -1))) \
            if block.ndim == 2 else self.xp.diagonal(block)
        if check_offdiagonal:
            full = self.block_from_diagonal(diag, shape=block.shape)
            if not self.allclose(block, full, rtol=1e-10, atol=1e-12):
                raise ValueError('Block is not diagonal')
        return diag

    def block_from_diagonal(self, diag, shape=None):
        d = diag.shape[0]
        res = self.xp.zeros((d, d) if shape is None else tuple(shape), diag.dtype)
        return self._set_diagonal(res, diag)

    def _set_diagonal(self, block, diag):
        res = np.asarray(block).copy()
        np.fill_diagonal(res, np.asarray(diag))
        return self.xp.asarray(res)

    def block_from_mask(self, mask, dtype: Dtype):
        """Rectangular projection matrix [sum(mask), len(mask)] from a bool mask."""
        mask_np = self.to_numpy(mask).astype(bool)
        res = np.zeros((int(np.sum(mask_np)), len(mask_np)), dtype.to_numpy)
        res[np.arange(int(np.sum(mask_np))), np.nonzero(mask_np)[0]] = 1.
        return self.as_block(res, dtype)

    def trace_full(self, block):
        """Full trace pairing axis i with axis ndim/2 + i."""
        n = block.ndim // 2
        d = math.prod(block.shape[:n])
        mat = self.xp.reshape(block, (d, d))
        return self.xp.trace(mat)

    def trace_partial(self, block, idcs1: Sequence[int], idcs2: Sequence[int],
                      remaining: Sequence[int]):
        block = self.xp.transpose(block, tuple(remaining) + tuple(idcs1) + tuple(idcs2))
        nrem = len(remaining)
        drem = block.shape[:nrem]
        d = math.prod(block.shape[nrem:nrem + len(idcs1)])
        block = self.xp.reshape(block, drem + (d, d))
        return self.xp.trace(block, axis1=-2, axis2=-1)

    # --- linear algebra --------------------------------------------------------------

    # bfloat16 policy: bf16 is a *storage* dtype (halves HBM traffic — the measured
    # bottleneck of the DMRG matvec, docs/DESIGN.md §4). All numerics that would
    # suffer at 8-bit significand run in float32 internally: dots accumulate in f32
    # (native on the MXU via preferred_element_type), reductions and factorizations
    # upcast. Outputs are cast back to bf16 so the dtype contract (result dtype ==
    # promoted input dtype) holds at every call site.

    def _linalg_upcast(self, a):
        """(a_f32, was_bf16): factorizations/reductions do not support bfloat16."""
        if self.get_dtype(a) is Dtype.bfloat16:
            return self.to_dtype(a, Dtype.float32), True
        return a, False

    def matrix_dot(self, a, b):
        return self.xp.matmul(a, b)

    def tensordot(self, a, a_axes, b, b_axes):
        return self.xp.tensordot(a, b, (tuple(a_axes), tuple(b_axes)))

    def outer(self, a, b):
        return self.xp.tensordot(a, b, 0)

    def inner(self, a, b, do_dagger: bool):
        """Frobenius inner product of same-shape blocks (f32 accumulation for bf16)."""
        a, _ = self._linalg_upcast(a)
        b, _ = self._linalg_upcast(b)
        if do_dagger:
            return self.xp.sum(self.xp.conj(a) * b)
        return self.xp.sum(a * b)

    def scale_axis(self, block, factors, ax: int):
        shape = [1] * block.ndim
        shape[ax] = -1
        return block * self.xp.reshape(factors, tuple(shape))

    def matrix_svd(self, a, algorithm: str = None):
        """SVD of a matrix: U, S (1D real), Vh."""
        a, half = self._linalg_upcast(a)
        u, s, vh = self.xp.linalg.svd(a, full_matrices=False)
        if half:
            bf = self.to_internal_dtype(Dtype.bfloat16)
            return u.astype(bf), s.astype(bf), vh.astype(bf)
        return u, s, vh

    def matrix_qr(self, a, full: bool = False):
        a, half = self._linalg_upcast(a)
        q, r = self.xp.linalg.qr(a, mode='complete' if full else 'reduced')
        if half:
            bf = self.to_internal_dtype(Dtype.bfloat16)
            return q.astype(bf), r.astype(bf)
        return q, r

    def matrix_lq(self, a, full: bool = False):
        q, r = self.matrix_qr(self.xp.transpose(a), full=full)
        return self.xp.transpose(r), self.xp.transpose(q)

    def matrix_eigh(self, a, sort: str = None):
        a, half = self._linalg_upcast(a)
        w, v = self.xp.linalg.eigh(a)
        if half:
            bf = self.to_internal_dtype(Dtype.bfloat16)
            return w.astype(bf), v.astype(bf)
        return w, v  # ascending by default

    def matrix_eig(self, a):
        # intentional exception to the bf16 round-trip policy: general eig of a
        # real matrix has complex eigenpairs and there is no complex-bf16, so
        # results stay in the upcast (f32-grade complex) dtype
        a, _ = self._linalg_upcast(a)
        w, v = np.linalg.eig(self.to_numpy(a))
        return self.xp.asarray(w), self.xp.asarray(v)

    def matrix_exp(self, a):
        raise NotImplementedError

    def matrix_log(self, a):
        import scipy.linalg

        res = scipy.linalg.logm(self.to_numpy(a))
        return self.xp.asarray(res)

    # --- device handling ----------------------------------------------------------

    def as_device(self, block, device: str = None):
        if device is not None and device.split(':')[0] != 'cpu':
            raise ValueError(
                f'Unsupported device for {type(self).__name__}: {device!r}')
        return block

    def get_device(self, block) -> str:
        return 'cpu'

    def synchronize(self):
        pass


class NumpyBlockBackend(BlockBackend):
    """numpy implementation — host-side oracle and small-problem path.

    Capability-equivalent to reference ``NumpyBlockBackend``
    (cyten/block_backends/numpy.py:17-302).
    """

    svd_algorithms = ['gesdd', 'gesvd', 'robust']
    can_jit = False
    name = 'numpy'

    def __init__(self):
        BlockBackend.__init__(self, np)

    def is_block(self, obj) -> bool:
        return isinstance(obj, np.ndarray)

    def matrix_svd(self, a, algorithm: str = None):
        import scipy.linalg

        a, half = self._linalg_upcast(a)
        if algorithm in (None, 'gesdd'):
            try:
                res = scipy.linalg.svd(a, full_matrices=False)
            except np.linalg.LinAlgError:
                algorithm = 'gesvd'
            else:
                algorithm = 'done'
        if algorithm in ('gesvd', 'robust'):
            res = scipy.linalg.svd(a, full_matrices=False, lapack_driver='gesvd')
        elif algorithm != 'done':
            raise ValueError(f'unknown svd algorithm {algorithm}')
        if half:
            bf = self.to_internal_dtype(Dtype.bfloat16)
            return tuple(x.astype(bf) for x in res)
        return res

    def matrix_exp(self, a):
        import scipy.linalg

        return scipy.linalg.expm(a)


class ArrayApiBlockBackend(BlockBackend):
    """Generic adapter over any numpy-compatible array-API namespace.

    Capability-equivalent to reference ``ArrayApiBlockBackend``
    (cyten/block_backends/array_api.py:15-40). Pass any namespace implementing the
    numpy-style surface the base class uses (``asarray``, ``transpose``, ``reshape``,
    ``tensordot``, ``linalg.svd``/``qr``/``eigh``, elementwise ufuncs); e.g.
    ``cupy``, ``dask.array``, or ``numpy`` itself.
    """

    can_jit = False

    def __init__(self, xp, name: str = None):
        BlockBackend.__init__(self, xp)
        self.name = name if name is not None \
            else f'array_api:{getattr(xp, "__name__", "unknown")}'

    def __reduce__(self):
        # cannot pickle arbitrary namespaces by name; re-import by module name
        mod = getattr(self.xp, '__name__', None)
        if mod is None:
            raise TypeError(f'cannot pickle {self.name}')
        return (_array_api_backend_from_module, (mod,))

    def is_block(self, obj) -> bool:
        return hasattr(obj, 'shape') and hasattr(obj, 'dtype')


def _array_api_backend_from_module(mod: str) -> ArrayApiBlockBackend:
    import importlib

    return ArrayApiBlockBackend(importlib.import_module(mod))


class JaxBlockBackend(BlockBackend):
    """JAX implementation — the production TPU path.

    All methods used in hot loops are jit-traceable; in-place-style helpers
    (``_setitem``, ``_set_diagonal``) use functional ``.at[].set()`` updates so that they
    remain traceable too.
    """

    svd_algorithms = ['default', 'qdwh']
    can_jit = True
    name = 'jax'

    def __init__(self):
        import jax
        import jax.numpy as jnp

        self.jax = jax
        BlockBackend.__init__(self, jnp)

    def is_block(self, obj) -> bool:
        import jax

        return isinstance(obj, jax.Array)

    def _is_tracer(self, obj) -> bool:
        import jax

        return isinstance(obj, jax.core.Tracer)

    # every block dot honors config.matmul_precision (trace-time; innermost
    # context wins, so this is THE precision of record for block math — on TPU
    # the jax default would silently run single-bf16-pass dots, corrupting e.g.
    # DMRG environment updates at the 1e-3 level)
    def matrix_dot(self, a, b):
        from ..config import config

        if a.dtype == _BF16 and b.dtype == _BF16 and config.bf16_accumulate_f32:
            # single bf16 MXU pass, f32 accumulator, one cast in the epilogue —
            # the precision ladder's 1-pass rung without bf16 summation error
            return self.xp.matmul(
                a, b, preferred_element_type=np.float32).astype(_BF16)
        if config.matmul_precision is None:
            return self.xp.matmul(a, b)
        with self.jax.default_matmul_precision(config.matmul_precision):
            return self.xp.matmul(a, b)

    def tensordot(self, a, a_axes, b, b_axes):
        from ..config import config

        if a.dtype == _BF16 and b.dtype == _BF16 and config.bf16_accumulate_f32:
            return self.xp.tensordot(
                a, b, (tuple(a_axes), tuple(b_axes)),
                preferred_element_type=np.float32).astype(_BF16)
        if config.matmul_precision is None:
            return self.xp.tensordot(a, b, (tuple(a_axes), tuple(b_axes)))
        with self.jax.default_matmul_precision(config.matmul_precision):
            return self.xp.tensordot(a, b, (tuple(a_axes), tuple(b_axes)))

    def _sticky_scalar(self, a, block_dtype):
        # bf16 storage is STICKY under scalar broadcasting: reductions
        # (norm/inner) deliberately return f32 scalars, and multiplying them
        # back onto bf16 blocks must not silently promote the whole chain to
        # f32 — jax weak typing only protects python scalars, while traced or
        # numpy scalars are strong and would win the promotion. Scalars keep
        # full precision where it matters (the Lanczos tridiagonal, norms);
        # only the broadcast onto already-bf16 data is demoted.
        if block_dtype == _BF16 and hasattr(a, 'dtype') and a.dtype != _BF16 \
                and not np.issubdtype(a.dtype, np.complexfloating):
            return a.astype(_BF16)
        return a

    def mul(self, a, block):
        return self._sticky_scalar(a, block.dtype) * block

    def linear_combination(self, a, block1, b, block2):
        return self._sticky_scalar(a, block1.dtype) * block1 \
            + self._sticky_scalar(b, block2.dtype) * block2

    def block_item(self, block):
        # under jit, keep the value traced (callers inside jit handle 0-d arrays)
        if self._is_tracer(block):
            return self.xp.reshape(block, ())
        return super().block_item(block)

    def norm(self, block, order=2) -> float:
        if self._is_tracer(block):
            if block.dtype == _BF16:
                block = block.astype(np.float32)
            flat = self.xp.reshape(block, (-1,))
            if order == 2:
                return self.xp.sqrt(self.xp.sum(self.xp.abs(flat) ** 2))
            if order == np.inf:
                return self.xp.max(self.xp.abs(flat))
            return self.xp.sum(self.xp.abs(flat) ** order) ** (1. / order)
        return super().norm(block, order=order)

    def as_block(self, obj, dtype: Dtype = None, return_dtype: bool = False):
        block = self.xp.asarray(obj)
        if np.issubdtype(block.dtype, np.integer) or block.dtype == bool:
            if dtype is None or not dtype.is_bool:
                block = block.astype(self.to_internal_dtype(dtype or Dtype.float64))
        elif dtype is not None:
            block = block.astype(self.to_internal_dtype(dtype))
        if return_dtype:
            return block, self.get_dtype(block)
        return block

    def to_internal_dtype(self, dtype: Dtype):
        # jax canonicalizes x64 -> x32 unless jax_enable_x64; map through numpy names
        return dtype.to_numpy

    def copy_block(self, block):
        return self.xp.array(block, copy=True)

    def _setitem(self, block, idx, value):
        return block.at[idx].set(value)

    def accumulator(self, shape, dtype: Dtype):
        return self.xp.zeros(tuple(shape), self.to_internal_dtype(dtype))

    def accum_add(self, acc, idx, value):
        return acc.at[idx].add(value)

    def finalize_accumulator(self, acc):
        return acc

    def batched_slice(self, block, starts, shape):
        import jax

        h, w = shape
        starts = np.asarray(starts)
        if len(starts) == 1:  # static slice: no gather/clamp machinery
            r, c = int(starts[0, 0]), int(starts[0, 1])
            return block[None, r:r + h, c:c + w]
        starts = self.xp.asarray(starts.astype(np.int32))
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(block, (s[0], s[1]), tuple(shape))
        )(starts)  # lowers to a single gather

    def batched_accum_add(self, acc, starts, updates):
        from jax import lax

        starts = np.asarray(starts)
        if len(starts) == 1:  # static windowed add: no scatter machinery
            r, c = int(starts[0, 0]), int(starts[0, 1])
            h, w = updates.shape[1:]
            return acc.at[r:r + h, c:c + w].add(updates[0])
        idx = self.xp.asarray(starts.astype(np.int32))
        dnums = lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1))
        return lax.scatter_add(acc, idx, updates.astype(acc.dtype), dnums)

    def _set_diagonal(self, block, diag):
        d = diag.shape[0]
        idx = self.xp.arange(d)
        return block.at[idx, idx].set(diag)

    def apply_mask(self, block, mask, ax: int):
        # resolve the kept indices HOST-side: masks are structural constants,
        # and jnp.nonzero of even a constant is disallowed under jit (dynamic
        # output shape). np.asarray works on closed-over concrete jax arrays
        # during tracing; only the block itself stays traced.
        if self._is_tracer(mask):
            raise ValueError('mask data must be a trace-time constant')
        idx = np.nonzero(np.asarray(mask))[0]
        return self.xp.take(block, idx, axis=ax)

    def matrix_exp(self, a):
        from jax.scipy.linalg import expm

        return expm(a)

    def matrix_eig(self, a):
        # jax.numpy.linalg.eig is CPU-only; go through numpy (host-side op).
        # bf16 upcasts to f32; results stay complex-f32-grade (no complex-bf16)
        a, _ = self._linalg_upcast(a)
        w, v = np.linalg.eig(np.asarray(a))
        return self.xp.asarray(w), self.xp.asarray(v)

    def as_device(self, block, device: str = None):
        import jax

        if device is None:
            return block
        kind = device.split(':')[0]
        idx = int(device.split(':')[1]) if ':' in device else 0
        return jax.device_put(block, jax.devices(kind)[idx])

    def get_device(self, block) -> str:
        try:
            dev = list(block.devices())[0]
            return f'{dev.platform}:{dev.id}'
        except Exception:
            return 'cpu'

    def synchronize(self):
        pass  # jax.block_until_ready is per-array; ops are async by design


_BACKENDS: dict[str, BlockBackend] = {}


def get_block_backend(name: str = None) -> BlockBackend:
    """Get (and cache) a block backend instance by name ('jax' | 'numpy')."""
    if name is None:
        from ..config import config

        name = config.default_block_backend
    if name in ('jax', 'tpu', 'gpu'):
        name = 'jax'
    res = _BACKENDS.get(name)
    if res is None:
        if name == 'jax':
            res = JaxBlockBackend()
        elif name == 'numpy':
            res = NumpyBlockBackend()
        elif name == 'torch':
            from .torch_backend import TorchBlockBackend

            res = TorchBlockBackend()
        else:
            raise ValueError(f'unknown block backend: {name}')
        _BACKENDS[name] = res
    return res
