"""Single-site DMRG with subspace expansion (DMRG3S).

Strictly single-site sweeps following Hubig, McCulloch, Schollwoeck & Wolf,
PRB 91, 155115 (2015): after each local Lanczos optimization the bond is enlarged
with the mixing term ``alpha * LP . theta . W`` (right moves; mirrored for left
moves) before the truncating SVD, so the bond dimension can grow even though only
one site is optimized at a time. Cost per site is O(chi^3 d w) instead of the
two-site engine's O(chi^3 d^2 w) and the expansion keeps DMRG from getting stuck
in symmetry sectors.

No counterpart exists in the reference (its toycodes only implement the two-site
engine, ``toycodes/tenpy_toycodes/d_dmrg.py:117``); this module goes beyond it.

The subspace-expansion bookkeeping is exact: with ``A~ = [theta, alpha*P]`` on an
enlarged bond and ``B~ = [[B], [0]]`` the global state is unchanged,
``A~ . B~ == theta . B``; the expansion only enriches what the truncating SVD of
``A~`` can keep.
"""

from __future__ import annotations

import numpy as np

from ..tensors import (
    SymmetricTensor, apply_mask, apply_mask_DiagonalTensor, combine_legs, compose,
    dagger, eigh, norm,
    permute_legs, pinv, scale_axis, sqrt, svd, svd_apply_mask, tdot,
    tensor_from_grid, truncate_singular_values,
)
from ..tensors.krylov_based import lanczos
from ..tensors.sparse import LinearOperator
from .dmrg import DMRGEngine
from .mps import SimpleMPS

__all__ = ['HEffective1', 'DMRG1SEngine']


_JITTED_MATVEC1 = {}


def _heff1_matvec_impl(LP, RP, W, theta):
    """LP -- W -- RP applied to a one-site wavefunction [vL, p; vR]."""
    x = tdot(theta, LP, 'vL', 'vR')                    # [p, vR, vR*, wR]
    x = tdot(x, W, ['p', 'wR'], ['p*', 'wL'])          # [vR, vR*, p, wR]
    x = tdot(x, RP, ['vR', 'wR'], ['vL', 'wL'])        # [vR*, p, vL*]
    x = x.relabelled({'vR*': 'vL', 'vL*': 'vR'})
    return permute_legs(x, codomain=['vL', 'p'], domain=['vR'])


def _get_jitted_matvec1(precision=None):
    if precision not in _JITTED_MATVEC1:
        import jax

        from .dmrg import _with_precision

        _JITTED_MATVEC1[precision] = jax.jit(
            _with_precision(_heff1_matvec_impl, precision))
    return _JITTED_MATVEC1[precision]


class HEffective1(LinearOperator):
    """Effective single-site Hamiltonian ``LP -- W -- RP``."""

    def __init__(self, LP, RP, W, use_jit: bool = None,
                 matmul_precision: str = None):
        self.LP = LP
        self.RP = RP
        self.W = W
        if use_jit is None:
            use_jit = W.backend.block_backend.can_jit
        self.use_jit = use_jit
        self.matmul_precision = matmul_precision
        LinearOperator.__init__(self, dtype=W.dtype)

    def matvec(self, theta):
        if self.use_jit:
            return _get_jitted_matvec1(self.matmul_precision)(
                self.LP, self.RP, self.W, theta)
        return _heff1_matvec_impl(self.LP, self.RP, self.W, theta)


def _uses_pipes(backend) -> bool:
    """Abelian backends direct-sum pipe legs exactly (block_ind_map is a
    permutation of the public basis); fusion-tree backends need the explicit
    CG-aware fuser instead (the fused basis is not a permutation)."""
    from ..backends.fusion_tree import FusionTreeBackend

    return not isinstance(backend, FusionTreeBackend)


def _expansion_right(LP, W, theta, alpha):
    """Mixing term ``alpha * LP . theta . W`` as [vL, p; (vR.wR)].

    ``pipe_dualities=True`` makes the combined domain leg a ket space, matching
    the MPS bond-leg convention so it can direct-sum with theta's vR leg. On
    fusion-tree backends the combined leg is produced by an explicit unitary
    fuser isometry (flat ElementarySpace leg) instead of pipe metadata."""
    t = tdot(LP, theta, 'vR', 'vL')                     # [vR*, wR, p, vR]
    t = tdot(t, W, ['p', 'wR'], ['p*', 'wL'])           # [vR*, vR, p, wR]
    t = t.relabelled({'vR*': 'vL'})
    t = permute_legs(t, codomain=['vL', 'p'], domain=['wR', 'vR'])
    if _uses_pipes(t.backend):
        t = combine_legs(t, ['vR', 'wR'], pipe_dualities=True)
    else:
        from ..tensors import compose, fuser_tensor

        S = fuser_tensor(t.domain.factors, backend=t.backend, dtype=t.dtype,
                         labels=[t.domain_labels[0], t.domain_labels[1], 'vR'])
        t = compose(t, S)
    return alpha * t


def _expansion_left(RP, W, theta, alpha):
    """Mixing term ``alpha * theta . W . RP`` as [(vL.wL); vR, p]."""
    t = tdot(theta, RP, 'vR', 'vL')                     # [vL, p, wL, vL*]
    t = tdot(t, W, ['p', 'wL'], ['p*', 'wR'])           # [vL, vL*, wL, p]
    t = t.relabelled({'vL*': 'vR'})
    t = permute_legs(t, codomain=['vL', 'wL'], domain=['vR', 'p'])
    if _uses_pipes(t.backend):
        t = combine_legs(t, ['vL', 'wL'])
    else:
        from ..tensors import compose, dagger, fuser_tensor

        # dagger primes the labels, so 'vL*' below becomes the result's 'vL'
        S = fuser_tensor(t.codomain.factors, backend=t.backend, dtype=t.dtype,
                         labels=[t.codomain_labels[0], t.codomain_labels[1],
                                 'vL*'])
        t = compose(dagger(S), t)
    return alpha * t


class DMRG1SEngine(DMRGEngine):
    """Strictly single-site DMRG sweeps with subspace expansion.

    Same interface as :class:`DMRGEngine` (including ``mesh=`` sharding and chi
    bucketing); additional options control the mixing:

    - ``alpha``: initial expansion amplitude (default 1e-3),
    - ``alpha_decay``: multiplied onto alpha after every sweep (default 0.5),
    - ``alpha_min``: expansion switched off below this (default 1e-12),
    - ``mixer``: ``'expand'`` enlarges the bond with the mixing term directly
      (exact bookkeeping; the combined bond.mpo leg uses pipe metadata on
      abelian backends and an explicit unitary fuser isometry on fusion-tree
      backends — CG-aware, so non-abelian symmetries work too) or
      ``'density_matrix'`` (White's perturbation: eigendecompose
      ``theta theta^† + P P^†`` on the [vL, p] side — works for every symmetry
      backend including anyonic). Default: ``'expand'`` for symmetric braiding
      (abelian, fermions, SU(N)), else ``'density_matrix'``.
    """

    def __init__(self, psi: SimpleMPS, model, chi_max: int = 32, eps: float = 1e-12,
                 lanczos_options: dict = None, pad_chi_multiple: int = None,
                 jit_env_updates: bool = None, mesh=None,
                 shard_axis_name: str = 'mult', alpha: float = 1e-3,
                 alpha_decay: float = 0.5, alpha_min: float = 1e-12,
                 mixer: str = None, matmul_precision: str = None):
        DMRGEngine.__init__(self, psi, model, chi_max=chi_max, eps=eps,
                            lanczos_options=lanczos_options,
                            pad_chi_multiple=pad_chi_multiple,
                            jit_env_updates=jit_env_updates, mesh=mesh,
                            shard_axis_name=shard_axis_name,
                            matmul_precision=matmul_precision)
        self.alpha = alpha
        self.alpha_decay = alpha_decay
        self.alpha_min = alpha_min
        if mixer is None:
            sym = psi.Bs[0].symmetry
            mixer = 'expand' if sym.has_symmetric_braid else 'density_matrix'
        assert mixer in ('expand', 'density_matrix')
        self.mixer = mixer

    def sweep(self) -> float:
        L = self.psi.L
        if self.mesh is not None:
            with self.mesh:
                for i in range(L - 1):
                    self.update_site(i, move_right=True)
                for i in range(L - 1, 0, -1):
                    self.update_site(i, move_right=False)
        else:
            for i in range(L - 1):
                self.update_site(i, move_right=True)
            for i in range(L - 1, 0, -1):
                self.update_site(i, move_right=False)
        if self.alpha > self.alpha_min:
            self.alpha = max(self.alpha * self.alpha_decay, self.alpha_min)
        return self.E

    def run(self, n_sweeps: int = 10, tol: float = 1e-10, verbose: bool = False
            ) -> float:
        """Sweep until the energy is converged AND the mixing has decayed.

        The Lanczos energy converges before the state does (each sweep still
        injects an O(alpha) perturbation), so convergence additionally requires
        ``alpha <= alpha_min``."""
        E_old = np.inf
        for sweep in range(n_sweeps):
            E = self.sweep()
            if verbose:
                print(f'sweep {sweep + 1}: E = {E:.12f}, '
                      f'max chi = {self.psi.max_chi()}, alpha = {self.alpha:.2e}')
            if abs(E - E_old) < tol and self.alpha <= self.alpha_min:
                break
            E_old = E
        return self.E

    def update_site(self, i: int, move_right: bool):
        psi = self.psi
        W = self.model.H_mpo[i]
        Heff = HEffective1(self.LPs[i], self.RPs[i], W,
                           matmul_precision=self.matmul_precision)
        theta0 = self._shard(psi.get_theta1(i), 'vL')
        E, theta, n_iter = lanczos(Heff, theta0, self.lanczos_options)
        self.E = E
        if self.mixer == 'density_matrix' and self.alpha > self.alpha_min:
            if move_right:
                self._move_right_dm(i, theta)
            else:
                self._move_left_dm(i, theta)
        elif move_right:
            self._move_right(i, theta)
        else:
            self._move_left(i, theta)

    def _move_right(self, i: int, theta):
        psi = self.psi
        theta = permute_legs(theta, codomain=['vL', 'p'], domain=['vR'])
        expand = self.alpha > self.alpha_min
        if expand:
            P = _expansion_right(self.LPs[i], self.model.H_mpo[i], theta,
                                 self.alpha)
            theta_exp = tensor_from_grid([[theta, P]], row_leg='vL', col_leg='vR')
        else:
            theta_exp = theta
        U, S, Vh = svd(theta_exp, new_labels=['vR', 'vL'])
        mask, err, new_norm = truncate_singular_values(
            S, chi_max=self.chi_max, svd_min=self.eps,
            pad_to_multiple=self.pad_chi_multiple)
        U, S, Vh = svd_apply_mask(U, S, Vh, mask)
        S = (1. / new_norm) * S
        self.trunc_err = max(self.trunc_err, err)
        A = U  # [vL, p; vR], left-isometric
        # Bs[i+1] <- Vh . [[B], [0]]; exact: the zero rows carry the expansion
        B_next = psi.Bs[i + 1]
        if expand:
            B_next = self._stacked_B(B_next, P.domain.factors[0], stack_on='vL')
        psi.Bs[i + 1] = permute_legs(tdot(Vh, B_next, 'vR', 'vL'),
                                     codomain=['vL', 'p'], domain=['vR'])
        psi.Ss[i + 1] = S.relabelled(['vL', 'vL*'])
        Sinv = pinv(psi.Ss[i], cutoff=1e-14)
        psi.Bs[i] = scale_axis(scale_axis(A, Sinv, 'vL'), S, 'vR')
        self.update_LP(i, A)

    def _move_left(self, i: int, theta):
        psi = self.psi
        theta = permute_legs(theta, codomain=['vL'], domain=['vR', 'p'])
        expand = self.alpha > self.alpha_min
        if expand:
            P = _expansion_left(self.RPs[i], self.model.H_mpo[i], theta,
                                self.alpha)
            theta_exp = tensor_from_grid([[theta], [P]], row_leg='vL',
                                         col_leg='vR')
        else:
            theta_exp = theta
        U, S, Vh = svd(theta_exp, new_labels=['vR', 'vL'])
        mask, err, new_norm = truncate_singular_values(
            S, chi_max=self.chi_max, svd_min=self.eps,
            pad_to_multiple=self.pad_chi_multiple)
        U, S, Vh = svd_apply_mask(U, S, Vh, mask)
        S = (1. / new_norm) * S
        self.trunc_err = max(self.trunc_err, err)
        B = permute_legs(Vh, codomain=['vL', 'p'], domain=['vR'])  # right-iso
        psi.Bs[i] = B
        # gauge bookkeeping (same trick as the two-site engine): Bs[i-1] is stored
        # in B-form as S_{i-1}^-1 A_{i-1} S_i^old, so absorbing the carry U S into
        # it must first strip the old bond singulars: theta1(i-1) must come out as
        # A_{i-1} . U|_old . S (the center of the unchanged global state).
        Sinv_old = pinv(psi.Ss[i], cutoff=1e-14)
        psi.Ss[i] = S.relabelled(['vL', 'vL*'])
        # Bs[i-1] <- (B_{i-1} S_old^-1, 0-padded) . U . S; the zero columns kill
        # the expansion rows of U exactly.
        B_prev = scale_axis(psi.Bs[i - 1], Sinv_old, 'vR')
        if expand:
            B_prev = self._stacked_B(B_prev, P.codomain.factors[0],
                                     stack_on='vR')
        carry = scale_axis(U, S, 'vR')
        psi.Bs[i - 1] = tdot(B_prev, carry, 'vR', 'vL')
        self.update_RP(i, B)

    def _move_right_dm(self, i: int, theta):
        """Right move with White's density-matrix mixer (any symmetry backend).

        rho = theta theta^† + P P^† on [vL, p]; its top-chi eigenvectors define
        the new left isometry A. P is the mixing term with (wR, vR) left open —
        no leg combination or direct sum is ever formed, so this path also works
        for non-abelian and anyonic symmetries.
        """
        psi = self.psi
        theta = permute_legs(theta, codomain=['vL', 'p'], domain=['vR'])
        rho = compose(theta, dagger(theta))
        t = tdot(self.LPs[i], theta, 'vR', 'vL')            # [vR*, wR, p, vR]
        t = tdot(t, self.model.H_mpo[i], ['p', 'wR'], ['p*', 'wL'])
        P = self.alpha * permute_legs(t.relabelled({'vR*': 'vL'}),
                                      codomain=['vL', 'p'], domain=['wR', 'vR'])
        rho = rho + compose(P, dagger(P))
        W, V = eigh(rho, new_labels='c')                     # V: [vL, p; c]
        S = sqrt(abs(W))
        mask, err, new_norm = truncate_singular_values(
            S, chi_max=self.chi_max, svd_min=self.eps,
            pad_to_multiple=self.pad_chi_multiple)
        A = apply_mask(V, mask, 'c').relabelled({'c': 'vR'})  # [vL, p; vR]
        S = (1. / new_norm) * apply_mask_DiagonalTensor(S, mask)
        self.trunc_err = max(self.trunc_err, err)
        carry = compose(dagger(A), theta)                    # [vR*; vR]
        carry = carry.relabelled({'vR*': 'vL'})
        nrm = norm(carry)
        carry = (1. / nrm) * carry
        S = S.relabelled(['vL', 'vL*'])
        psi.Bs[i + 1] = permute_legs(
            tdot(scale_axis(carry, pinv(S, cutoff=1e-14), 'vL'),
                 psi.Bs[i + 1], 'vR', 'vL'),
            codomain=['vL', 'p'], domain=['vR'])
        psi.Ss[i + 1] = S
        Sinv = pinv(psi.Ss[i], cutoff=1e-14)
        psi.Bs[i] = scale_axis(scale_axis(A, Sinv, 'vL'), S, 'vR')
        self.update_LP(i, A)

    def _move_left_dm(self, i: int, theta):
        """Left move with the density-matrix mixer (mirror of _move_right_dm)."""
        psi = self.psi
        theta = permute_legs(theta, codomain=['vL'], domain=['vR', 'p'])
        rho = compose(dagger(theta), theta)
        t = tdot(theta, self.RPs[i], 'vR', 'vL')             # [vL, p, wL, vL*]
        t = tdot(t, self.model.H_mpo[i], ['p', 'wL'], ['p*', 'wR'])
        P = self.alpha * permute_legs(t.relabelled({'vL*': 'vR'}),
                                      codomain=['vL', 'wL'], domain=['vR', 'p'])
        rho = rho + compose(dagger(P), P)
        W, V = eigh(rho, new_labels='c')                     # V: [.; c] on (vR,p)
        S = sqrt(abs(W))
        mask, err, new_norm = truncate_singular_values(
            S, chi_max=self.chi_max, svd_min=self.eps,
            pad_to_multiple=self.pad_chi_multiple)
        V = apply_mask(V, mask, 'c')
        S = (1. / new_norm) * apply_mask_DiagonalTensor(S, mask)
        self.trunc_err = max(self.trunc_err, err)
        B = dagger(V).relabelled({'c*': 'vL'})               # [vL; vR, p]
        B = permute_legs(B, codomain=['vL', 'p'], domain=['vR'])
        carry = compose(theta, V).relabelled({'c': 'vR'})    # [vL; vR]
        nrm = norm(carry)
        carry = (1. / nrm) * carry
        Sinv_old = pinv(psi.Ss[i], cutoff=1e-14)
        psi.Bs[i] = B
        psi.Ss[i] = S.relabelled(['vL', 'vL*'])
        B_prev = scale_axis(psi.Bs[i - 1], Sinv_old, 'vR')
        psi.Bs[i - 1] = permute_legs(tdot(B_prev, carry, 'vR', 'vL'),
                                     codomain=['vL', 'p'], domain=['vR'])
        self.update_RP(i, B)

    def _stacked_B(self, B, X, stack_on: str):
        """Stack ``B`` with a zero tensor carrying the expansion leg ``X``.

        ``X`` is the combined (bond.mpo) leg of the mixing term P itself, so the
        stacked direct sum is *identical* (including internal basis order) to the
        enlarged bond of ``theta_exp = [theta, P]``. For right moves
        (stack_on='vL') returns [[B], [0_X]]; for left moves [[B, 0_X]].
        """
        Xe = X.as_ElementarySpace(is_dual=False)
        if stack_on == 'vL':
            Z = SymmetricTensor.from_zero(
                [Xe, B.get_leg_co_domain('p')], [B.domain.factors[0]],
                backend=B.backend, labels=['vL', 'p', 'vR'], dtype=B.dtype)
            return tensor_from_grid([[B], [Z]], row_leg='vL', col_leg='vR')
        else:
            Z = SymmetricTensor.from_zero(
                [B.get_leg_co_domain('vL'), B.get_leg_co_domain('p')], [Xe],
                backend=B.backend, labels=['vL', 'p', 'vR'], dtype=B.dtype)
            return tensor_from_grid([[B, Z]], row_leg='vL', col_leg='vR')


def _register_heff1_pytree():
    """HEffective1 as a jax pytree (see dmrg._register_heff_pytree)."""
    try:
        from jax.tree_util import register_pytree_node
    except ImportError:  # pragma: no cover
        return

    def flatten(h):
        return (h.LP, h.RP, h.W), (h.use_jit, h.matmul_precision, h.dtype)

    def unflatten(aux, children):
        obj = HEffective1.__new__(HEffective1)
        obj.LP, obj.RP, obj.W = children
        obj.use_jit, obj.matmul_precision, obj.dtype = aux
        obj.vector_shape = None
        return obj

    register_pytree_node(HEffective1, flatten, unflatten)


_register_heff1_pytree()
