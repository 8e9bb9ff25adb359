"""Steady-state truncated SVD: matmul/QR-only, warm-started — the TPU answer to
the per-sector QDWH bottleneck.

Motivation (measured, docs/DESIGN.md SVD roofline): on TPU, ``jnp.linalg.svd`` /
``eigh`` are QDWH-based and cost ~n^2-scaled tens-to-hundreds of ms per sector
block (342 ms at 2944^2 f32), while QR is 30-60x cheaper and GEMMs are ~free on
the MXU. A converged DMRG sweep revisits each bond with a *slightly rotated*
theta, and in static mode the kept per-sector multiplicities are frozen — so the
right-isometry from the previous visit (== the current ``B`` tensor!) is an
excellent warm start. This module computes the rank-frozen truncated SVD

    theta  ~=  U S Vh     (U, Vh isometric; S positive diagonal)

using only GEMMs, thin QR, and small per-sector rotation cleanups:

1. subspace (power) iteration from the warm start:  V <- qr(theta^dag theta V)
2. Rayleigh-Ritz:  T = (theta V)^dag (theta V)  — nearly diagonal
3. first-order Jacobi sweeps:  R ~= qr(I + E/(D_j - D_i)) rotations, degenerate
   clusters left mixed (harmless: any orthonormal basis of a degenerate cluster
   is a valid singular basis)
4. U = theta V S^+, polished to isometry by Newton-Schulz (matmul-only)

Everything is jit-traceable; inside the fused static-mode DMRG bond update this
removes the QDWH calls entirely. Exactness: the subspace converges to the
dominant singular subspace at rate (sigma_{k+1}/sigma_k)^2 per power iteration;
validated against exact-SVD static sweeps in tests/test_dmrg.py.
"""

from __future__ import annotations

import numpy as np

from ._functions import compose, dagger, norm, permute_legs, qr, scale_axis
from ._tensors import DiagonalTensor, SymmetricTensor

__all__ = ['steady_truncated_svd']


def _rotation_blocks(T, n_jacobi: int, eps: float):
    """Per-sector cleanup rotations diagonalizing the nearly-diagonal PSD T.

    Returns (R tensor [kept->kept], diagonal entries of the rotated T).
    """
    bb = T.backend.block_backend
    xp = bb.xp
    from ..dtypes import Dtype

    half = T.dtype == Dtype.bfloat16  # factorization policy: upcast internally
    R_blocks = []
    diags = []
    for blk in T.data.blocks:
        k = blk.shape[0]
        if k == 0:
            R_blocks.append(blk)
            diags.append(blk[:0, 0] if blk.ndim == 2 else blk)
            continue
        if half:
            blk = bb.to_dtype(blk, Dtype.float32)
        Tc = blk
        R_tot = None
        for _ in range(n_jacobi):
            D = xp.diagonal(Tc)
            E = Tc - _diag_embed(xp, D)
            den = D[None, :] - D[:, None]
            scale = xp.max(xp.abs(D)) + 1e-30
            safe = xp.abs(den) > eps * scale
            W = xp.where(safe, E / xp.where(safe, den, 1.), 0.)
            Q, _ = xp.linalg.qr(_eye_like(xp, k, W.dtype) + W)
            Tc = xp.conj(Q.T) @ Tc @ Q
            R_tot = Q if R_tot is None else R_tot @ Q
        R_tot = R_tot if R_tot is not None else _eye_like(xp, k, blk.dtype)
        d = xp.diagonal(Tc)
        if half:  # outputs keep the storage dtype (S included: a wider S
            # would re-promote B through scale_axis downstream)
            R_tot = bb.to_dtype(R_tot, Dtype.bfloat16)
            d = bb.to_dtype(d, Dtype.bfloat16)
        R_blocks.append(R_tot)
        diags.append(d)
    return R_blocks, diags


def _diag_embed(xp, d):
    return xp.diag(d)


def _eye_like(xp, k, dtype):
    return xp.eye(k, dtype=dtype)


def steady_truncated_svd(thp, Vh_prev, n_power: int = 1, n_jacobi: int = 2,
                         ns_polish: int = 2, eps: float = 1e-6,
                         new_labels=('vR', 'vL')):
    """Truncated SVD of ``thp`` with the rank allocation (and warm start) of
    ``Vh_prev``.

    Parameters
    ----------
    thp : SymmetricTensor
        The wavefunction as a morphism codomain -> domain (e.g. [vL, p0 | vR, p1]).
    Vh_prev : SymmetricTensor
        Right isometry from the previous visit: codomain [kept], domain =
        ``thp.domain``. Its codomain leg FIXES the kept per-sector
        multiplicities (static-mode chi allocation).
    n_power, n_jacobi, ns_polish, eps
        Iteration counts of the three cleanup stages; the defaults suffice near
        convergence (see module docstring).

    Returns
    -------
    U : SymmetricTensor   codomain = thp.codomain, domain [kept]
    S : DiagonalTensor    on the kept leg (unnormalized)
    Vh : SymmetricTensor  codomain [kept], domain = thp.domain
    err : scalar          relative discarded weight sqrt(1 - |S|^2 / |thp|^2)
    """
    backend = thp.backend
    bb = backend.block_backend
    xp = bb.xp

    V = dagger(Vh_prev)                       # domain -> kept   (as morphism)
    # subspace iteration toward the dominant right-singular subspace
    for _ in range(n_power):
        B = compose(thp, V)                   # [codomain | kept]
        Z = compose(dagger(thp), B)           # [domain | kept]
        V, _ = qr(Z)
    B = compose(thp, V)
    T = compose(dagger(B), B)                 # [kept | kept], nearly diagonal
    R_blocks, diag_vals = _rotation_blocks(T, n_jacobi, eps)
    from ..backends.data import BlockSparseData, DiagonalBlockData

    R_data = BlockSparseData(R_blocks, T.data.block_inds.copy(), T.data.dtype,
                             is_sorted=True)
    R = SymmetricTensor(R_data, T.codomain, T.domain, backend, T.labels)
    B = compose(B, R)
    V = compose(V, R)
    kept_leg = V.domain.factors[0]
    # singular values: sqrt of the (cleaned) Rayleigh quotients
    s_blocks = [xp.sqrt(xp.maximum(xp.real(d), 0.)) for d in diag_vals]
    diag_inds = np.array([int(i) for i, _ in T.data.block_inds], dtype=np.intp)
    S_data = DiagonalBlockData(s_blocks, diag_inds, T.data.dtype.to_real,
                               is_sorted=True)
    S = DiagonalTensor(S_data, kept_leg, backend,
                       [new_labels[1], f'{new_labels[1]}*'])
    # U = B S^+  (then Newton-Schulz polish back to exact isometry)
    inv_blocks = [xp.where(b > 1e-30, 1. / xp.where(b > 1e-30, b, 1.), 0.)
                  for b in s_blocks]
    Sinv = DiagonalTensor(
        DiagonalBlockData(inv_blocks, diag_inds.copy(), S.data.dtype,
                          is_sorted=True), kept_leg, backend, S.labels)
    U = scale_axis(B, Sinv, -1)
    for _ in range(ns_polish):
        G = compose(dagger(U), U)
        U = 1.5 * U + (-0.5) * compose(U, G)
    Vh = dagger(V)
    # labels: U's new domain leg and Vh's new codomain leg
    U = U.relabelled({U.labels[-1]: new_labels[0]})
    Vh = Vh.relabelled({Vh.labels[0]: new_labels[1]})
    S = S.relabelled([new_labels[1], f'{new_labels[1]}*'])
    total = norm(thp) ** 2
    keptw = norm(S) ** 2
    one = total / total
    ratio = keptw / total
    err = (xp.sqrt(xp.maximum(one - ratio, 0. * one))
           if hasattr(total, 'dtype') else float(np.sqrt(max(1. - ratio, 0.))))
    return U, S, Vh, err
