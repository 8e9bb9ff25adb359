"""Torch block backend (CPU/CUDA/MPS via torch).

Role-equivalent to reference ``cyten/block_backends/torch.py`` (:16-342). The jax
backend is the production TPU path; this exists for capability parity and for users
migrating torch-based workflows.
"""

from __future__ import annotations

import numpy as np

from ..dtypes import Dtype
from .backend import BlockBackend

__all__ = ['TorchBlockBackend']


class _TorchNamespace:
    """Thin numpy-like adapter over torch for the generic BlockBackend methods."""

    def __init__(self, torch):
        self.t = torch

    def __getattr__(self, name):
        return getattr(self.t, name)

    def asarray(self, x):
        import numpy as _np

        if isinstance(x, self.t.Tensor):
            return x
        return self.t.as_tensor(_np.asarray(x))

    def array(self, x, copy=True):
        res = self.asarray(x)
        return res.clone() if copy else res

    def zeros(self, shape, dtype=None):
        return self.t.zeros(shape, dtype=dtype)

    def ones(self, shape, dtype=None):
        return self.t.ones(shape, dtype=dtype)

    def eye(self, n, dtype=None):
        return self.t.eye(n, dtype=dtype)

    def reshape(self, x, shape):
        return self.t.reshape(x, shape)

    def transpose(self, x, axes=None):
        if axes is None:
            axes = tuple(range(x.ndim - 1, -1, -1))
        return self.t.permute(x, tuple(axes))

    def moveaxis(self, x, src, dst):
        return self.t.movedim(x, src, dst)

    def expand_dims(self, x, ax):
        return self.t.unsqueeze(x, ax)

    def squeeze(self, x, axes):
        res = x
        for ax in sorted(axes, reverse=True):
            res = self.t.squeeze(res, ax)
        return res

    def tensordot(self, a, b, axes):
        return self.t.tensordot(a, b, dims=axes)

    def take(self, x, idx, axis=0):
        return self.t.index_select(x, axis, self.asarray(idx).long())

    def concatenate(self, xs, axis=0):
        return self.t.cat(list(xs), dim=axis)

    def stack(self, xs, axis=0):
        return self.t.stack(list(xs), dim=axis)

    def diagonal(self, x, axis1=0, axis2=1):
        return self.t.diagonal(x, dim1=axis1, dim2=axis2)

    def trace(self, x, axis1=-2, axis2=-1):
        return self.t.diagonal(x, dim1=axis1, dim2=axis2).sum(-1)

    def sum(self, x, axis=None, keepdims=False):
        if axis is None:
            return self.t.sum(x)
        return self.t.sum(x, dim=axis, keepdim=keepdims)

    def max(self, x, axis=None):
        if axis is None:
            return self.t.max(x)
        return self.t.max(x, dim=axis).values

    def min(self, x, axis=None):
        if axis is None:
            return self.t.min(x)
        return self.t.min(x, dim=axis).values

    def all(self, x):
        return self.t.all(x)

    def any(self, x):
        return self.t.any(x)

    def abs(self, x):
        return self.t.abs(x)

    def conj(self, x):
        return self.t.conj(x).resolve_conj()

    def real(self, x):
        return self.t.real(x) if self.t.is_complex(x) else x

    def imag(self, x):
        return self.t.imag(x) if self.t.is_complex(x) else self.t.zeros_like(x)

    def angle(self, x):
        return self.t.angle(x)

    def sqrt(self, x):
        return self.t.sqrt(x)

    def exp(self, x):
        return self.t.exp(x)

    def log(self, x):
        return self.t.log(x)

    def where(self, c, a, b):
        return self.t.where(c, self.asarray(a), self.asarray(b))

    def matmul(self, a, b):
        return self.t.matmul(a, b)

    def nonzero(self, x):
        return (self.t.nonzero(x).flatten(),)

    def arange(self, n):
        return self.t.arange(n)

    def logical_and(self, a, b):
        return self.t.logical_and(self.asarray(a), self.asarray(b))

    def logical_or(self, a, b):
        return self.t.logical_or(self.asarray(a), self.asarray(b))

    def logical_xor(self, a, b):
        return self.t.logical_xor(self.asarray(a), self.asarray(b))

    def logical_not(self, a):
        return self.t.logical_not(self.asarray(a))

    class linalg:
        pass


class TorchBlockBackend(BlockBackend):
    """torch implementation (lazy import; cpu by default)."""

    svd_algorithms = ['gesvd', 'gesvdj', 'gesvda']
    can_jit = False
    name = 'torch'

    def __init__(self, device: str = 'cpu'):
        import torch

        self.torch = torch
        self.device = device
        BlockBackend.__init__(self, _TorchNamespace(torch))

    def is_block(self, obj) -> bool:
        return isinstance(obj, self.torch.Tensor)

    def to_internal_dtype(self, dtype: Dtype):
        t = self.torch
        return {Dtype.bool: t.bool, Dtype.bfloat16: t.bfloat16,
                Dtype.float32: t.float32,
                Dtype.float64: t.float64, Dtype.complex64: t.complex64,
                Dtype.complex128: t.complex128}[dtype]

    def get_dtype(self, block) -> Dtype:
        t = self.torch
        return {t.bool: Dtype.bool, t.bfloat16: Dtype.bfloat16,
                t.float32: Dtype.float32,
                t.float64: Dtype.float64, t.complex64: Dtype.complex64,
                t.complex128: Dtype.complex128}[block.dtype]

    def as_block(self, obj, dtype: Dtype = None, return_dtype: bool = False):
        block = self.xp.asarray(obj)
        if block.dtype in (self.torch.int32, self.torch.int64):
            block = block.to(self.to_internal_dtype(dtype or Dtype.float64))
        elif dtype is not None:
            block = block.to(self.to_internal_dtype(dtype))
        if return_dtype:
            return block, self.get_dtype(block)
        return block

    def to_dtype(self, block, dtype: Dtype):
        return block.to(self.to_internal_dtype(dtype))

    def to_numpy(self, block, numpy_dtype=None):
        if self.is_block(block):
            block = block.resolve_conj().cpu()
            if block.dtype == self.torch.bfloat16:  # numpy has no bf16
                block = block.float()
            res = block.numpy()
        else:
            res = np.asarray(block)
        if numpy_dtype is not None:
            res = res.astype(numpy_dtype)
        return res

    def copy_block(self, block):
        return block.clone()

    def block_item(self, block):
        return block.item() if self.is_block(block) else np.asarray(block).item()

    def _setitem(self, block, idx, value):
        res = block.clone()
        res[idx] = self.xp.asarray(value)
        return res

    def _set_diagonal(self, block, diag):
        res = block.clone()
        d = diag.shape[0]
        idx = self.torch.arange(d)
        res[idx, idx] = diag
        return res

    def matrix_svd(self, a, algorithm: str = None):
        # bf16 policy: torch linalg kernels do not support bfloat16 either —
        # upcast to f32 and cast back, like the generic backend
        a, half = self._linalg_upcast(a)
        u, s, vh = self.torch.linalg.svd(a, full_matrices=False)
        if half:
            bf = self.to_internal_dtype(Dtype.bfloat16)
            return u.to(bf), s.to(bf), vh.to(bf)
        return u, s, vh

    def matrix_qr(self, a, full: bool = False):
        a, half = self._linalg_upcast(a)
        q, r = self.torch.linalg.qr(a, mode='complete' if full else 'reduced')
        if half:
            bf = self.to_internal_dtype(Dtype.bfloat16)
            return q.to(bf), r.to(bf)
        return q, r

    def matrix_eigh(self, a, sort: str = None):
        a, half = self._linalg_upcast(a)
        w, v = self.torch.linalg.eigh(a)
        if half:
            bf = self.to_internal_dtype(Dtype.bfloat16)
            return w.to(bf), v.to(bf)
        return w, v

    def matrix_exp(self, a):
        return self.torch.linalg.matrix_exp(a)

    def norm(self, block, order=2):
        block, _ = self._linalg_upcast(block)  # accumulate reductions in f32
        return float(self.torch.linalg.vector_norm(block.flatten(), ord=order))

    def norm_sq(self, block):
        block, _ = self._linalg_upcast(block)
        return self.torch.linalg.vector_norm(block.flatten()) ** 2

    def _dot_dtypes(self, a, b):
        """(a, b, cast_back): torch requires equal dtypes; bf16 dots accumulate
        in f32 (same policy as the jax backend's preferred_element_type path)."""
        from ..config import config

        bf = self.torch.bfloat16
        if a.dtype == bf and b.dtype == bf:
            if config.bf16_accumulate_f32:
                return a.float(), b.float(), bf
            return a, b, None
        if a.dtype != b.dtype:
            common = self.torch.promote_types(a.dtype, b.dtype)
            if common == bf:  # promote_types keeps bf16 only if both were bf16
                common = self.torch.float32
            return a.to(common), b.to(common), None
        return a, b, None

    def matrix_dot(self, a, b):
        a, b, cast_back = self._dot_dtypes(a, b)
        res = self.torch.matmul(a, b)
        return res.to(cast_back) if cast_back is not None else res

    def tensordot(self, a, a_axes, b, b_axes):
        a, b, cast_back = self._dot_dtypes(a, b)
        res = self.torch.tensordot(a, b, dims=(tuple(a_axes), tuple(b_axes)))
        return res.to(cast_back) if cast_back is not None else res

    def apply_mask(self, block, mask, ax: int):
        idx = self.torch.nonzero(self.xp.asarray(mask)).flatten()
        return self.torch.index_select(block, ax, idx)

    def as_device(self, block, device: str = None):
        return block.to(device) if device else block

    def get_device(self, block) -> str:
        return str(block.device)
