"""Krylov-subspace eigensolvers and propagators on tensors.

Role-equivalent to reference ``cyten/tensors/krylov_based.py`` (KrylovBased :16,
Arnoldi :184, LanczosGroundState :316, LanczosEvolution :450, lanczos() :557).

The matvec is backend-agnostic; with jax blocks each iteration traces to pure XLA.
The small (N_max x N_max) Krylov eigenproblem is solved host-side with numpy —
it is tiny and controls data-dependent convergence decisions.
"""

from __future__ import annotations

import logging
import warnings
from typing import Sequence

import numpy as np

from ._functions import inner, linear_combination, norm, scalar_multiply
from ._tensors import Tensor
from .sparse import LinearOperator

__all__ = ['KrylovBased', 'Arnoldi', 'LanczosGroundState', 'LanczosEvolution',
           'lanczos', 'lanczos_arpack']

logger = logging.getLogger(__name__)


class KrylovBased:
    """Shared machinery for Krylov-subspace algorithms.

    Options (passed as dict, like the reference's): N_min, N_max, P_tol, E_tol,
    min_gap, cutoff, reortho.
    """

    def __init__(self, H: LinearOperator, psi0: Tensor, options: dict = None):
        self.H = H
        self.psi0 = psi0
        options = options or {}
        self.N_min = options.get('N_min', 3)
        self.N_max = options.get('N_max', 20)
        # None disables the energy-difference criterion (default: the
        # previous np.inf default made |E - E_old| < E_tol ALWAYS true, so
        # every solve silently stopped at N_min iterations)
        self.E_tol = options.get('E_tol', None)
        self.P_tol = options.get('P_tol', 1e-14)
        self.min_gap = options.get('min_gap', 1e-12)
        self.cutoff = options.get('cutoff', 1e-12)
        self.reortho = options.get('reortho', False)
        self._cache: list[Tensor] = []

    def _build_krylov(self):
        """Iteratively build the Krylov basis; subclasses process coefficients."""
        raise NotImplementedError


_JIT_LANCZOS_TAIL = None


def _get_jit_lanczos_tail():
    """jit the orthogonalize-and-measure tail of a Lanczos step: given (w, v, v_prev,
    beta_prev), return (alpha, w_ortho, beta). One fused XLA call instead of ~6
    eager dispatches per iteration."""
    global _JIT_LANCZOS_TAIL
    if _JIT_LANCZOS_TAIL is None:
        import jax

        def tail(w, v, v_prev, beta_prev):
            alpha = inner(v, w, do_dagger=True)
            alpha_re = alpha.real if hasattr(alpha, 'real') else alpha
            w = linear_combination(1., w, -alpha_re, v)
            if v_prev is not None:
                w = linear_combination(1., w, -beta_prev, v_prev)
            return alpha_re, w, norm(w)

        _JIT_LANCZOS_TAIL = jax.jit(tail, static_argnames=())
    return _JIT_LANCZOS_TAIL


def _lanczos_step(H, v, v_prev, beta_prev, use_jit):
    w = H.matvec(v)
    if use_jit:
        try:
            alpha, w, beta = _get_jit_lanczos_tail()(
                w, v, v_prev, 0.0 if beta_prev is None else beta_prev)
            return float(alpha), w, float(beta)
        except Exception:
            pass
    alpha = float(np.real(inner(v, w)))
    w = w - scalar_multiply(alpha, v)
    if v_prev is not None:
        w = w - scalar_multiply(beta_prev, v_prev)
    return alpha, w, None  # beta computed by caller


class LanczosGroundState(KrylovBased):
    """Lanczos ground-state search for hermitian operators."""

    def run(self) -> tuple[float, Tensor, int]:
        """Returns ``(E0, psi0, N_iterations)``."""
        H, psi = self.H, self.psi0
        psi_norm = norm(psi)
        assert psi_norm > 0, 'zero initial vector'
        q = scalar_multiply(1. / psi_norm, psi)
        basis = [q]
        alphas: list[float] = []
        betas: list[float] = []
        E_old = None
        theta = None
        use_jit = getattr(psi.backend.block_backend, 'can_jit', False) \
            and not self.reortho
        for k in range(self.N_max):
            if use_jit:
                v_prev = basis[-2] if len(basis) > 1 else None
                beta_prev = betas[-1] if betas else None
                alpha, w, beta_j = _lanczos_step(H, basis[-1], v_prev, beta_prev,
                                                 True)
                alphas.append(alpha)
                beta = beta_j if beta_j is not None else norm(w)
            else:
                w = H.matvec(basis[-1])
                alpha = float(np.real(inner(basis[-1], w)))
                alphas.append(alpha)
                w = w - scalar_multiply(alpha, basis[-1])
                if len(basis) > 1:
                    w = w - scalar_multiply(betas[-1], basis[-2])
                if self.reortho:
                    for b in basis[:-1]:
                        w = w - scalar_multiply(inner(b, w), b)
                beta = norm(w)
            # solve the small tridiagonal problem
            T = np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
            evals, evecs = np.linalg.eigh(T)
            E = evals[0]
            v0 = evecs[:, 0]
            converged = False
            if beta < self.cutoff:
                converged = True
            if k + 1 >= self.N_min:
                if self.E_tol is not None and E_old is not None \
                        and abs(E - E_old) < self.E_tol:
                    converged = True
                # Ritz residual estimate: |beta * v0[-1]|
                if abs(beta * v0[-1]) ** 2 < self.P_tol:
                    converged = True
            E_old = E
            if converged or k == self.N_max - 1:
                theta = scalar_multiply(complex(v0[0]) if np.iscomplexobj(v0)
                                        else float(v0[0]), basis[0])
                for coeff, b in zip(v0[1:], basis[1:]):
                    theta = theta + scalar_multiply(
                        complex(coeff) if np.iscomplexobj(v0) else float(coeff), b)
                theta_norm = norm(theta)
                if theta_norm > 0:
                    theta = scalar_multiply(1. / theta_norm, theta)
                return float(E), theta, k + 1
            betas.append(float(beta))
            basis.append(scalar_multiply(1. / beta, w))
        raise RuntimeError('unreachable')


class LanczosEvolution(KrylovBased):
    """Compute ``exp(delta * H) |psi0>`` in the Krylov subspace."""

    def processing(self, delta) -> tuple[Tensor, int]:
        H, psi = self.H, self.psi0
        psi_norm = norm(psi)
        q = scalar_multiply(1. / psi_norm, psi)
        basis = [q]
        alphas: list[float] = []
        betas: list[float] = []
        result_coeffs = None
        for k in range(self.N_max):
            w = H.matvec(basis[-1])
            alpha = float(np.real(inner(basis[-1], w)))
            alphas.append(alpha)
            w = w - scalar_multiply(alpha, basis[-1])
            if len(basis) > 1:
                w = w - scalar_multiply(betas[-1], basis[-2])
            if self.reortho:
                for b in basis[:-1]:
                    w = w - scalar_multiply(inner(b, w), b)
            beta = norm(w)
            T = np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
            import scipy.linalg

            expT = scipy.linalg.expm(delta * T)
            coeffs = expT[:, 0]
            converged = beta < self.cutoff or (
                k + 1 >= self.N_min and abs(coeffs[-1]) < self.P_tol)
            if converged or k == self.N_max - 1:
                result_coeffs = coeffs
                break
            betas.append(float(beta))
            basis.append(scalar_multiply(1. / beta, w))
        theta = scalar_multiply(complex(result_coeffs[0]) * psi_norm, basis[0])
        for c, b in zip(result_coeffs[1:], basis[1:]):
            theta = theta + scalar_multiply(complex(c) * psi_norm, b)
        return theta, len(alphas)

    def run(self, delta) -> tuple[Tensor, int]:
        return self.processing(delta)


class Arnoldi(KrylovBased):
    """Arnoldi iteration for (possibly non-hermitian) operators.

    Finds the eigenvalue of largest magnitude (``which='LM'``) or smallest real part
    (``'SR'``), etc., with the corresponding Ritz vector.
    """

    def __init__(self, H, psi0, options: dict = None):
        KrylovBased.__init__(self, H, psi0, options)
        options = options or {}
        self.which = options.get('which', 'LM')

    def _select(self, evals):
        if self.which == 'LM':
            return int(np.argmax(np.abs(evals)))
        if self.which == 'SR':
            return int(np.argmin(np.real(evals)))
        if self.which == 'LR':
            return int(np.argmax(np.real(evals)))
        raise ValueError(f'invalid which: {self.which}')

    def run(self) -> tuple[complex, Tensor, int]:
        H, psi = self.H, self.psi0
        q = scalar_multiply(1. / norm(psi), psi)
        basis = [q]
        h = np.zeros((self.N_max + 1, self.N_max), dtype=complex)
        E_old = None
        for k in range(self.N_max):
            w = H.matvec(basis[-1])
            for i, b in enumerate(basis):
                h[i, k] = inner(b, w)
                w = w - scalar_multiply(h[i, k], b)
            beta = norm(w)
            h[k + 1, k] = beta
            Hk = h[:k + 1, :k + 1]
            evals, evecs = np.linalg.eig(Hk)
            sel = self._select(evals)
            E = evals[sel]
            v0 = evecs[:, sel]
            converged = beta < self.cutoff
            if k + 1 >= self.N_min and E_old is not None:
                if (self.E_tol is not None and abs(E - E_old) < self.E_tol) \
                        or abs(beta * v0[-1]) ** 2 < self.P_tol:
                    converged = True
            E_old = E
            if converged or k == self.N_max - 1:
                theta = scalar_multiply(complex(v0[0]), basis[0])
                for c, b in zip(v0[1:], basis[1:]):
                    theta = theta + scalar_multiply(complex(c), b)
                n = norm(theta)
                if n > 0:
                    theta = scalar_multiply(1. / n, theta)
                return complex(E), theta, k + 1
            basis.append(scalar_multiply(1. / beta, w))
        raise RuntimeError('unreachable')


def lanczos(H: LinearOperator, psi0: Tensor, options: dict = None
            ) -> tuple[float, Tensor, int]:
    """Ground state of a hermitian operator via Lanczos. Returns (E0, psi0, N)."""
    if (options or {}).get('fused'):
        return lanczos_fused(H, psi0, options)
    return LanczosGroundState(H, psi0, options).run()


_FUSED_LANCZOS_CACHE: dict = {}


def _union_embed(t, other):
    """Embed `t` into the union of its and `other`'s block structure (zero-filled).

    Both must be SymmetricTensors on the same legs with BlockSparseData-style
    data (rows of block indices + a block list).
    """
    from ..backends.data import BlockSparseData

    a, b = t.data, other.data
    rows = {tuple(r): ('a', n) for n, r in enumerate(a.block_inds)}
    for n, r in enumerate(b.block_inds):
        rows.setdefault(tuple(r), ('b', n))
    bb = t.backend.block_backend
    blocks, inds = [], []
    for r, (src, n) in rows.items():
        if src == 'a':
            blocks.append(a.blocks[n])
        else:
            blocks.append(bb.zeros(bb.get_shape(b.blocks[n]), a.dtype))
        inds.append(r)
    import numpy as _np

    data = BlockSparseData(blocks, _np.array(inds, _np.intp).reshape(
        len(inds), -1), a.dtype)
    res = t.copy(deep=False)
    res.data = data
    return res


def _structure_key(t):
    return t.data.block_inds.tobytes()


def _close_structure(H, psi0, max_rounds: int = 4):
    """Grow psi0's block structure until it is a fixed point of H.matvec
    (required so the fused scan's carry keeps a constant pytree shape)."""
    psi = psi0
    for _ in range(max_rounds):
        w = H.matvec(psi)
        if _structure_key(w) == _structure_key(psi):
            return psi
        psi = _union_embed(psi, w)
    raise ValueError('matvec block structure did not close; cannot fuse')


def lanczos_fused(H, psi0: Tensor, options: dict = None
                  ) -> tuple[float, Tensor, int]:
    """Whole-Lanczos ground-state search as ONE jitted device program.

    Runs a fixed ``N_max`` iterations inside a single ``lax.scan`` (matvec,
    orthogonalization, basis storage), solves the tridiagonal problem and
    reconstructs the Ritz vector on device. On a remote/tunneled TPU this
    replaces ~3 round trips per iteration (~30 ms each) with one dispatch per
    Lanczos solve — the dominant cost of host-driven DMRG sweeps there.

    Requires ``H`` to be a pytree whose ``matvec`` is jit-traceable (e.g.
    :class:`~cyten_tpu.algorithms.dmrg.HEffective`); the Krylov basis
    (``N_max`` state copies) is held in device memory.
    """
    import jax

    options = options or {}
    N = int(options.get('N_max', 20))
    key = (type(H), N)
    fn = _FUSED_LANCZOS_CACHE.get(key)
    if fn is None:
        def impl(H, psi0):
            return fused_lanczos_impl(H, psi0, N)

        fn = _FUSED_LANCZOS_CACHE[key] = jax.jit(impl)
    psi0 = _close_structure(H, psi0)
    E, theta = fn(H, psi0)
    return float(E), theta, N


def fused_lanczos_impl(H, psi0, N: int):
    """Traceable body of :func:`lanczos_fused` (usable inside larger jits).

    ``psi0``'s block structure must be a fixed point of ``H.matvec`` (see
    ``_close_structure``). Returns ``(E, theta)`` as traced values.
    """
    import jax
    import jax.numpy as jnp

    nrm0 = norm(psi0)
    v0 = scalar_multiply(1. / nrm0, psi0)
    zero = scalar_multiply(0., v0)

    def body(carry, _):
        v, v_prev, beta_prev = carry
        w = H.matvec(v)
        alpha = inner(v, w, do_dagger=True)
        alpha = alpha.real if hasattr(alpha, 'real') else alpha
        w = linear_combination(1., w, -alpha, v)
        w = linear_combination(1., w, -beta_prev, v_prev)
        beta = norm(w)
        # after Krylov closure (beta ~ 0) emit a ZERO vector, not w/tiny:
        # garbage-amplified basis entries would otherwise leak into the
        # reconstruction through f32 eigh roundoff
        scale = jnp.where(beta > 1e-12, 1. / jnp.maximum(beta, 1e-30), 0.)
        v_next = scalar_multiply(scale, w)
        return (v_next, v, beta), (v, alpha, beta)

    # the initial beta must match norm's result dtype exactly (scan carry):
    # norm upcasts bf16 storage to f32, keeps f32/f64 — mirror that here
    from ..dtypes import Dtype as _Dt

    _rdt = psi0.dtype.to_real
    _beta_dt = (_Dt.float32 if _rdt == _Dt.bfloat16 else _rdt).to_numpy
    (_, _, _), (basis, alphas, betas) = jax.lax.scan(
        body, (v0, zero, jnp.zeros((), dtype=_beta_dt)), None, length=N)
    # tridiagonal Ritz problem on device. A vanishing beta_k means the Krylov
    # space closed at k; later alphas are garbage — mask them out.
    valid = jnp.concatenate([jnp.ones((1,), bool), betas[:-1] > 1e-12])
    valid = jnp.cumprod(valid).astype(bool)
    # shift invalid diagonal entries above the valid spectrum by a
    # Gershgorin-type bound — NOT a huge constant, which destroys the f32
    # eigh and silently returns garbage coefficients
    a_v = jnp.where(valid, alphas, 0.)
    bound = jnp.max(jnp.abs(a_v)) + 2. * jnp.max(betas) + 1.
    T = jnp.diag(jnp.where(valid, alphas, bound)) \
        + jnp.diag(jnp.where(valid[1:], betas[:-1], 0.), 1) \
        + jnp.diag(jnp.where(valid[1:], betas[:-1], 0.), -1)
    evals, evecs = jnp.linalg.eigh(T)
    E = evals[0]
    coeffs = evecs[:, 0]
    theta = jax.tree.map(
        lambda ys: jnp.tensordot(coeffs.astype(ys.dtype), ys, axes=(0, 0)),
        basis)
    tnorm = norm(theta)
    theta = scalar_multiply(1. / jnp.maximum(tnorm, 1e-30), theta)
    return E, theta


def fused_lanczos_evolution_impl(H, psi0, delta, N: int):
    """Traceable ``exp(delta * H) |psi0>`` with a fixed-N Krylov space.

    The whole iteration (basis build, tridiagonal eigenproblem, exponential
    combine) is one traced program — usable inside larger jits (fused TDVP
    site updates). ``psi0``'s block structure must be a fixed point of
    ``H.matvec`` (see ``_close_structure``); ``delta`` may be complex (bake at
    trace time or pass a traced scalar).
    """
    import jax
    import jax.numpy as jnp

    if complex(delta).imag != 0 and not psi0.dtype.is_complex:
        # real-time evolution of a real state: promote UP FRONT so the dtype
        # METADATA stays consistent (combining complex blocks under real
        # metadata would later allocate real accumulators and silently drop
        # the imaginary part)
        psi0 = psi0.to_dtype(psi0.dtype.to_complex)
    nrm0 = norm(psi0)
    v0 = scalar_multiply(1. / nrm0, psi0)
    zero = scalar_multiply(0., v0)

    def body(carry, _):
        v, v_prev, beta_prev = carry
        w = H.matvec(v)
        alpha = inner(v, w, do_dagger=True)
        alpha = alpha.real if hasattr(alpha, 'real') else alpha
        w = linear_combination(1., w, -alpha, v)
        w = linear_combination(1., w, -beta_prev, v_prev)
        beta = norm(w)
        scale = jnp.where(beta > 1e-12, 1. / jnp.maximum(beta, 1e-30), 0.)
        v_next = scalar_multiply(scale, w)
        return (v_next, v, beta), (v, alpha, beta)

    # the initial beta must match norm's result dtype exactly (scan carry):
    # norm upcasts bf16 storage to f32, keeps f32/f64 — mirror that here
    from ..dtypes import Dtype as _Dt

    _rdt = psi0.dtype.to_real
    _beta_dt = (_Dt.float32 if _rdt == _Dt.bfloat16 else _rdt).to_numpy
    (_, _, _), (basis, alphas, betas) = jax.lax.scan(
        body, (v0, zero, jnp.zeros((), dtype=_beta_dt)), None, length=N)
    valid = jnp.concatenate([jnp.ones((1,), bool), betas[:-1] > 1e-12])
    valid = jnp.cumprod(valid).astype(bool)
    # invalid entries: decouple them (diagonal far above the spectrum, zero
    # couplings); their overlap with e0 vanishes so exp() of them is harmless
    a_v = jnp.where(valid, alphas, 0.)
    bound = jnp.max(jnp.abs(a_v)) + 2. * jnp.max(betas) + 1.
    T = jnp.diag(jnp.where(valid, alphas, bound)) \
        + jnp.diag(jnp.where(valid[1:], betas[:-1], 0.), 1) \
        + jnp.diag(jnp.where(valid[1:], betas[:-1], 0.), -1)
    evals, evecs = jnp.linalg.eigh(T)
    phase = jnp.exp(jnp.asarray(delta) * evals)
    coeffs = evecs @ (phase * evecs[0, :].conj()) * nrm0
    theta = jax.tree.map(
        lambda ys: jnp.tensordot(
            coeffs.astype(jnp.result_type(ys.dtype, coeffs.dtype)),
            ys.astype(jnp.result_type(ys.dtype, coeffs.dtype)), axes=(0, 0)),
        basis)
    return theta


def lanczos_arpack(H: LinearOperator, psi0: Tensor, options: dict = None):
    """Ground state via scipy ARPACK, flattening tensors to dense vectors.

    Slower than :func:`lanczos`; useful as a cross-check.
    """
    import scipy.sparse.linalg

    from .sparse import NumpyArrayLinearOperator

    wrapper = NumpyArrayLinearOperator(H, psi0)
    op = wrapper.as_scipy_operator()
    vals, vecs = scipy.sparse.linalg.eigsh(op, k=1, which='SA',
                                           v0=wrapper.tensor_to_flat(psi0))
    return float(vals[0]), wrapper.flat_to_tensor(vecs[:, 0]), -1
