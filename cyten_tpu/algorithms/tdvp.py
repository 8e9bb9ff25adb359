"""TDVP: time-dependent variational principle for finite MPS.

Single-site TDVP with the projector-splitting integrator of Haegeman, Lubich,
Oseledets, Vandereycken & Verstraete, PRB 94, 165116 (2016): a left-to-right
half sweep (each site evolved forward by dt/2 under its effective Hamiltonian,
each bond center evolved backward under the zero-site K operator) followed by
the mirrored right-to-left half sweep. For time-independent Hamiltonians the
integrator is symplectic: it conserves energy and norm exactly (up to Lanczos
tolerance) at fixed bond dimension, and it evolves under arbitrary MPOs
(long-range interactions), unlike TEBD's nearest-neighbor Trotter gates.

Goes beyond the reference (no time-evolution engines in its toycodes);
expected by TeNPy users.
"""

from __future__ import annotations

import numpy as np

from ..tensors import norm, permute_legs, pinv, scale_axis, svd, tdot
from ..tensors.krylov_based import LanczosEvolution
from ..tensors.sparse import LinearOperator
from .dmrg import DMRGEngine, HEffective, _update_LP_impl, _update_RP_impl
from .dmrg1 import HEffective1
from .mps import SimpleMPS, split_truncate_theta

__all__ = ['KEffective', 'TDVPEngine', 'TDVP2Engine']


class KEffective(LinearOperator):
    """Zero-site effective Hamiltonian ``LP -- RP`` acting on a bond center."""

    def __init__(self, LP, RP):
        self.LP = LP
        self.RP = RP
        LinearOperator.__init__(self, dtype=LP.dtype)

    def matvec(self, C):
        x = tdot(C, self.LP, 'vL', 'vR')                 # [vR, vR*, wR]
        x = tdot(x, self.RP, ['vR', 'wR'], ['vL', 'wL'])  # [vR*, vL*]
        x = x.relabelled({'vR*': 'vL', 'vL*': 'vR'})
        return permute_legs(x, codomain=['vL'], domain=['vR'])


class TDVPEngine:
    """Single-site TDVP sweeps on a finite MPS (second-order splitting).

    Parameters mirror :class:`TEBDEngine`: ``dt`` is the time step,
    ``imaginary=True`` evolves with exp(-dt H) (ground-state projection with
    per-step normalization), else exp(-i dt H). The bond dimension is FIXED by
    the initial state (single-site TDVP cannot grow chi — start from a state
    with the target bond dimension, e.g. a DMRG state, or grow with TEBD/DMRG
    first).
    """

    def __init__(self, psi: SimpleMPS, model, dt: float, imaginary: bool = False,
                 lanczos_options: dict = None):
        assert psi.bc == 'finite'
        self.psi = psi
        self.model = model
        self.dt = dt
        self.imaginary = imaginary
        self.lanczos_options = lanczos_options or {
            'N_max': 30, 'N_min': 3, 'P_tol': 1e-12, 'reortho': True}
        self.backend = psi.backend
        L = psi.L
        # reuse the DMRG environment machinery
        self._env = DMRGEngine.__new__(DMRGEngine)
        self._env.psi = psi
        self._env.model = model
        self._env.backend = psi.backend
        self._env.mesh = None
        self._env.jit_env_updates = False
        self._env.LPs = [None] * L
        self._env.RPs = [None] * L
        self._env._init_environments()
        self.LPs = self._env.LPs
        self.RPs = self._env.RPs

    def _evolve(self, H, vec, delta):
        options = dict(self.lanczos_options)
        ev = LanczosEvolution(H, vec, options)
        res, n_iter = ev.run(delta)
        if self.imaginary:
            res = (1. / norm(res)) * res
        return res

    def _deltas(self, half_dt):
        """(site delta, bond delta): exp(site_delta * H1), exp(bond_delta * K)."""
        if self.imaginary:
            return -half_dt, +half_dt
        return -1j * half_dt, +1j * half_dt

    def sweep(self):
        """One second-order step: dt/2 left-to-right, then dt/2 right-to-left."""
        psi = self.psi
        L = psi.L
        d_site, d_bond = self._deltas(self.dt / 2.)

        # ---- left-to-right half sweep: sites 0..L-1 forward dt/2, bond
        # centers backward dt/2 after every split ----
        th = psi.get_theta1(0)
        for i in range(L):
            H1 = HEffective1(self.LPs[i], self.RPs[i], self.model.H_mpo[i])
            th = self._evolve(H1, th, d_site)
            th = permute_legs(th, codomain=['vL', 'p'], domain=['vR'])
            if i == L - 1:
                break
            U, S, Vh = svd(th, new_labels=['vR', 'vL'])
            nrm = norm(S)
            S = (1. / nrm) * S
            Sinv = pinv(psi.Ss[i], cutoff=1e-14)
            psi.Bs[i] = scale_axis(scale_axis(U, Sinv, 'vL'), S, 'vR')
            psi.Ss[i + 1] = S.relabelled(['vL', 'vL*'])
            self._env.update_LP(i, U)
            C = scale_axis(Vh, S, 'vL')                  # C = S . Vh, [vL; vR]
            if not self.imaginary:
                C = float(nrm) * C
            # zero-site K on bond (i, i+1): left env covers sites <= i (fresh,
            # from the new U), right env covers sites >= i+1 (that is RPs[i])
            K = KEffective(self.LPs[i + 1], self.RPs[i])
            C = self._evolve(K, C, d_bond)
            th = tdot(C, psi.Bs[i + 1], 'vR', 'vL')
            th = permute_legs(th, codomain=['vL', 'p'], domain=['vR'])

        # ---- right-to-left half sweep (site L-1 gets its second dt/2) ----
        for i in range(L - 1, -1, -1):
            H1 = HEffective1(self.LPs[i], self.RPs[i], self.model.H_mpo[i])
            th = self._evolve(H1, th, d_site)
            if i == 0:
                th = permute_legs(th, codomain=['vL', 'p'], domain=['vR'])
                break
            th = permute_legs(th, codomain=['vL'], domain=['vR', 'p'])
            # gauge bookkeeping: Bs[i-1] stores S_{i-1}^-1 U_{i-1} S_i^old, so
            # the old bond singulars must be stripped before absorbing the
            # evolved center (same pattern as DMRG1SEngine._move_left)
            S_old_inv = pinv(psi.Ss[i], cutoff=1e-14)
            U, S, Vh = svd(th, new_labels=['vR', 'vL'])
            nrm = norm(S)
            S = (1. / nrm) * S
            psi.Bs[i] = permute_legs(Vh, codomain=['vL', 'p'], domain=['vR'])
            psi.Ss[i] = S.relabelled(['vL', 'vL*'])
            self._env.update_RP(i, psi.Bs[i])
            C = scale_axis(U, S, 'vR')
            if not self.imaginary:
                C = float(nrm) * C
            K = KEffective(self.LPs[i], self.RPs[i - 1])
            C = self._evolve(K, C, d_bond)
            th = tdot(scale_axis(psi.get_theta1(i - 1), S_old_inv, 'vR'),
                      C, 'vR', 'vL')
            th = permute_legs(th, codomain=['vL', 'p'], domain=['vR'])
        # park the center back into B form at site 0
        psi.Bs[0] = scale_axis(th, pinv(psi.Ss[0], cutoff=1e-14), 'vL')

    def run(self, n_steps: int, verbose: bool = False):
        for n in range(n_steps):
            self.sweep()
            if verbose and (n + 1) % 10 == 0:
                E = self.energy()
                print(f'step {n + 1}: E = {E:.10f}')
        return self

    def energy(self) -> float:
        return float(np.real(self.psi.expectation_value_mpo(self.model.H_mpo)))


class TDVP2Engine(TDVPEngine):
    """Two-site TDVP: like :class:`TDVPEngine` but the forward step evolves
    two-site wavefunctions, so the bond dimension can GROW (up to ``chi_max``,
    truncated at ``eps``). The backward dt/2 step acts on the single-site
    center (Haegeman et al. PRB 94, 165116, Sec. V). Not exactly
    energy-conserving (truncation breaks symplecticity), but it can start from
    low-entanglement initial states; switch to 1-site TDVP once chi saturates.
    """

    def __init__(self, psi: SimpleMPS, model, dt: float, imaginary: bool = False,
                 chi_max: int = 64, eps: float = 1e-12,
                 lanczos_options: dict = None):
        TDVPEngine.__init__(self, psi, model, dt, imaginary=imaginary,
                            lanczos_options=lanczos_options)
        self.chi_max = chi_max
        self.eps = eps
        self.trunc_err = 0.

    def sweep(self):
        psi = self.psi
        L = psi.L
        d_site, d_bond = self._deltas(self.dt / 2.)

        # ---- left-to-right half sweep: two-site forward, one-site backward ----
        th = psi.get_theta2(0)  # [vL, p0, p1; vR]
        for i in range(L - 1):
            H2 = HEffective(self.LPs[i], self.RPs[i + 1], self.model.H_mpo[i],
                            self.model.H_mpo[i + 1])
            th = self._evolve(H2, th, d_site)
            A, S, B, err = split_truncate_theta(
                th, self.chi_max, self.eps)
            self.trunc_err = max(self.trunc_err, err)
            Sinv = pinv(psi.Ss[i], cutoff=1e-14)
            psi.Bs[i] = scale_axis(scale_axis(A, Sinv, 'vL'), S, 'vR')
            psi.Ss[i + 1] = S.relabelled(['vL', 'vL*'])
            psi.Bs[i + 1] = B
            self._env.update_LP(i, A)
            if i == L - 2:
                break
            # backward evolve the one-site center at i+1
            th1 = scale_axis(B, S.relabelled(['vL', 'vL*']), 'vL')
            H1 = HEffective1(self.LPs[i + 1], self.RPs[i + 1],
                             self.model.H_mpo[i + 1])
            th1 = self._evolve(H1, th1, -d_site)
            th1 = permute_legs(th1, codomain=['vL', 'p'], domain=['vR'])
            th = tdot(th1.relabelled({'p': 'p0'}),
                      psi.Bs[i + 2].relabelled({'p': 'p1'}), 'vR', 'vL')
            th = permute_legs(th, codomain=['vL', 'p0', 'p1'], domain=['vR'])

        # ---- right-to-left half sweep ----
        th = psi.get_theta2(L - 2)
        for i in range(L - 2, -1, -1):
            H2 = HEffective(self.LPs[i], self.RPs[i + 1], self.model.H_mpo[i],
                            self.model.H_mpo[i + 1])
            th = self._evolve(H2, th, d_site)
            S_old_inv = pinv(psi.Ss[i], cutoff=1e-14)
            A, S, B, err = split_truncate_theta(
                th, self.chi_max, self.eps)
            self.trunc_err = max(self.trunc_err, err)
            Sinv = pinv(psi.Ss[i], cutoff=1e-14)
            psi.Bs[i] = scale_axis(scale_axis(A, Sinv, 'vL'), S, 'vR')
            psi.Ss[i + 1] = S.relabelled(['vL', 'vL*'])
            psi.Bs[i + 1] = B
            self._env.update_RP(i + 1, B)
            if i == 0:
                break
            # backward evolve the one-site center at i
            th1 = scale_axis(A, S, 'vR')  # [vL, p; c] with left envs of site i
            H1 = HEffective1(self.LPs[i], self.RPs[i], self.model.H_mpo[i])
            th1 = self._evolve(H1, th1, -d_site)
            th1 = permute_legs(th1, codomain=['vL', 'p'], domain=['vR'])
            # absorb into the previous site: theta2(i-1, i)
            prev = scale_axis(psi.get_theta1(i - 1), S_old_inv, 'vR')
            th = tdot(prev.relabelled({'p': 'p0'}),
                      th1.relabelled({'p': 'p1'}), 'vR', 'vL')
            th = permute_legs(th, codomain=['vL', 'p0', 'p1'], domain=['vR'])
