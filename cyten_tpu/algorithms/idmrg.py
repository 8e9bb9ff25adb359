"""Infinite DMRG (iDMRG), two-site unit cell.

McCulloch's infinite-size DMRG (arXiv:0804.2509; Schollwoeck Ann. Phys. 326, 96
(2011), Sec. 10): each step inserts two fresh sites at the center of an
ever-growing chain, optimizes their wavefunction theta with Lanczos, grows the
left/right environments by the new isometries, and predicts the next center
wavefunction with the singular-value "rotation trick"

    theta_guess = S_new . B . pinv(S_old) . A . S_new .

The energy per site is the window-energy difference ``(E_n - E_{n-1}) / 2``;
at the fixed point the center wavefunction ``A S B`` is exactly canonical, so
bond expectation values on it are exact as well.

Goes beyond the reference (its toycodes and DMRGEngine are finite-only,
``toycodes/tenpy_toycodes/d_dmrg.py:208``); expected by TeNPy users.
"""

from __future__ import annotations

import numpy as np

from ..tensors import SymmetricTensor, inner, permute_legs, pinv, scale_axis, tdot
from ..tensors.krylov_based import lanczos
from .dmrg import HEffective, _update_LP_impl, _update_RP_impl
from .mps import SimpleMPS, split_truncate_theta

__all__ = ['iDMRGEngine', 'MultiCellIDMRGEngine']


class iDMRGEngine:
    """Infinite two-site DMRG.

    Parameters
    ----------
    psi : SimpleMPS with ``bc='infinite'`` and L == 2
        Initial unit cell (e.g. a product state); used as the first guess.
    model
        Built with ``bc='infinite'``: uniform bulk ``H_mpo`` (2 tensors) and one
        ``H_bonds`` entry per unit-cell bond.
    chi_max, eps, lanczos_options
        As in :class:`DMRGEngine`.

    After :meth:`run`, :attr:`psi` holds the converged unit cell in B form and
    ``energy_per_site`` the ground-state energy density.
    """

    def __init__(self, psi: SimpleMPS, model, chi_max: int = 32, eps: float = 1e-12,
                 lanczos_options: dict = None, pad_chi_multiple: int = None,
                 mesh=None, shard_axis_name: str = 'mult',
                 matmul_precision: str = None):
        assert psi.bc == 'infinite', "iDMRG needs SimpleMPS(bc='infinite')"
        assert psi.L == 2, 'two-site unit cell for now'
        assert getattr(model, 'bc', 'finite') == 'infinite', \
            "iDMRG needs a model built with bc='infinite'"
        if getattr(model.H_mpo, 'max_range', 1) > 1:
            # measured: the McCulloch fixed point oscillates at the 1e-1 level
            # when the MPO carries in-flight passthrough channels (range > 1
            # terms from mpo_from_terms) — the 2-site insertion window never
            # contains a full term and the energy telescoping destabilizes
            raise ValueError(
                'iDMRGEngine does not support MPOs with couplings beyond '
                'nearest neighbors (in-flight channels). Use VUMPSEngine '
                '(fixed-point environments handle any uniform MPO; warm-start '
                'from an iDMRG run on the nearest-neighbor part), or finite '
                'DMRG with mpo_from_terms.')
        self.model = model
        self.chi_max = chi_max
        self.eps = eps
        self.pad_chi_multiple = pad_chi_multiple
        # iDMRG needs a well-converged local eigenstate each step: the finite
        # engine's loose defaults (N_max=20, no reortho) destabilize the fixed
        # point once chi saturates (measured: energy oscillates at the 1e-1
        # level; with these settings it converges to 1e-14)
        self.lanczos_options = lanczos_options or {
            'N_max': 100, 'N_min': 5, 'P_tol': 1e-14, 'reortho': True}
        self.backend = psi.backend
        self.mesh = mesh
        self.shard_axis_name = shard_axis_name
        self.matmul_precision = matmul_precision
        # center-site state: A (left-iso), B (right-iso), S (center bond),
        # S_prev (outer bond = previous center)
        self.A = None
        self.B = None
        self.S = psi.Ss[0]
        self.S_prev = psi.Ss[0]
        self._theta_guess = permute_legs(psi.get_theta2(0),
                                         codomain=['vL', 'p0', 'p1'],
                                         domain=['vR'])
        self.LP, self.RP = self._init_environments(psi)
        self.E_window = None      # extensive energy of the growing window
        self.energy_per_site = None
        self.trunc_err = 0.
        self.n_steps = 0

    def _shard(self, tensor, leg):
        if self.mesh is None:
            return tensor
        from ..parallel import shard_tensor
        return shard_tensor(tensor, self.mesh, leg, self.shard_axis_name)

    def _init_environments(self, psi):
        """eye(bond) times the unit vector in the MPO boundary channel.

        (The finite engine may use all-ones because its edge MPO tensors are
        boundary-selected to a single channel; a bulk MPO is not.)
        """
        backend = self.backend
        dtype = psi.Bs[0].dtype
        model = self.model

        V0 = psi.Bs[0].get_leg_co_domain('vL')
        w0 = model.H_mpo[0].get_leg_co_domain('wL')
        block = np.zeros((int(V0.dim), int(w0.dim), int(V0.dim)))
        block[:, 0, :] = np.eye(int(V0.dim))
        LP = SymmetricTensor.from_dense_block(
            block, [V0], [V0, w0], backend=backend,
            labels=[['vR*'], ['vR', 'wR']], dtype=dtype)
        VL = psi.Bs[-1].domain.factors[0]
        wL = model.H_mpo[-1].get_leg_co_domain('wR')
        block = np.zeros((int(VL.dim), int(wL.dim), int(VL.dim)))
        block[:, -1, :] = np.eye(int(VL.dim))
        RP = SymmetricTensor.from_dense_block(
            block, [VL, wL], [VL], backend=backend,
            labels=[['vL', 'wL'], ['vL*']], dtype=dtype)
        return LP, RP

    def step(self) -> float:
        """Insert two sites, optimize, grow environments. Returns e/site.

        After each optimization the found eigenvalue is subtracted from the
        left environment's Hamiltonian channel, so the effective Hamiltonian
        stays O(1) instead of growing extensively (the standard iDMRG energy
        subtraction — without it Lanczos conditioning degrades and the fixed
        point destabilizes once chi saturates)."""
        W0, W1 = self.model.H_mpo[0], self.model.H_mpo[1]
        Heff = HEffective(self.LP, self.RP, W0, W1,
                          matmul_precision=self.matmul_precision)
        theta0 = self._shard(self._theta_guess, 'vL')
        E, theta, n_iter = lanczos(Heff, theta0, self.lanczos_options)
        A, S_new, B, err = split_truncate_theta(
            theta, self.chi_max, self.eps,
            pad_to_multiple=self.pad_chi_multiple)
        self.trunc_err = max(self.trunc_err, err)
        LP = _update_LP_impl(self.LP, W0, A)
        # energy subtraction: LP_H <- LP_H - E * eye (H channel = last public wR
        # index, the MPO's "all terms completed" state)
        LP = LP - E * self._eye_at_channel(LP)
        self.LP = self._shard(LP, 'vR')
        self.RP = self._shard(_update_RP_impl(self.RP, W1, B), 'vL')
        # rotation trick: theta_guess = S_new . B . pinv(S_old) . A . S_new
        t = scale_axis(scale_axis(B, S_new, 'vL'),
                       pinv(self.S, cutoff=1e-12), 'vR')
        t2 = scale_axis(A, S_new, 'vR')
        guess = tdot(t.relabelled({'p': 'p0'}), t2.relabelled({'p': 'p1'}),
                     'vR', 'vL')
        self._theta_guess = permute_legs(guess, codomain=['vL', 'p0', 'p1'],
                                         domain=['vR'])
        self.S_prev = self.S
        self.S = S_new
        self.A, self.B = A, B
        # with the subtraction, the eigenvalue IS the energy added by the two
        # new sites (relative to all previously subtracted energy)
        e_site = E / 2. if self.n_steps > 0 else None
        if e_site is not None:
            self.energy_per_site = e_site
        self.E_window = (self.E_window or 0.) + E
        self.n_steps += 1
        return e_site

    def _eye_at_channel(self, LP) -> SymmetricTensor:
        """eye(bond) times the unit vector in the H channel of LP's wR leg."""
        V = LP.get_leg_co_domain('vR')
        w = LP.get_leg_co_domain('wR')
        key = (V, w)
        if getattr(self, '_eye_cache_key', None) == key:
            return self._eye_cache
        D, nw = int(V.dim), int(w.dim)
        block = np.zeros((D, nw, D))
        block[:, -1, :] = np.eye(D)
        res = SymmetricTensor.from_dense_block(
            block, [V], [V, w], backend=self.backend,
            labels=[['vR*'], ['vR', 'wR']], dtype=LP.dtype)
        self._eye_cache_key = key
        self._eye_cache = res
        return res

    def run(self, n_steps: int = 300, tol: float = 1e-10, verbose: bool = False
            ) -> float:
        """Iterate until the energy per site converges; returns it."""
        e_old = np.inf
        for n in range(n_steps):
            e = self.step()
            if verbose and e is not None:
                print(f'step {self.n_steps}: e/site = {e:.12f}, '
                      f'chi = {int(self.S.leg.dim)}')
            if e is not None and abs(e - e_old) < tol:
                break
            e_old = e if e is not None else np.inf
        return self.energy_per_site

    def bond_energy(self) -> float:
        """<theta| h_bond |theta> on the (exactly canonical) center bond."""
        theta = self.theta_center()
        op = self.model.H_bonds[0].relabelled(['p0', 'p1', 'p1*', 'p0*'])
        thp = permute_legs(theta, codomain=['p0', 'p1'], domain=['vL', 'vR'])
        from ..tensors import compose
        op_th = permute_legs(compose(op, thp), codomain=['vL', 'p0', 'p1'],
                             domain=['vR'])
        return float(np.real(inner(theta, op_th, do_dagger=True)))

    def theta_center(self) -> SymmetricTensor:
        """The center two-site wavefunction ``A . S . B`` (normalized)."""
        t = scale_axis(self.A, self.S, 'vR').relabelled({'p': 'p0'})
        th = tdot(t, self.B.relabelled({'p': 'p1'}), 'vR', 'vL')
        return permute_legs(th, codomain=['vL', 'p0', 'p1'], domain=['vR'])

    @property
    def psi(self) -> SimpleMPS:
        """The current unit cell as an infinite MPS in B form.

        ``Bs = [pinv(S_prev) A S, B]``, ``Ss = [S_prev, S]`` — exactly canonical
        at the iDMRG fixed point (where S_prev == S up to the half-cell shift).
        """
        # relative-tail cutoff: directions with S_prev < 1e-8 carry negligible
        # state weight but their inverses would destroy B0's isometry (measured:
        # iso error 1e3 at cutoff 1e-12 -> clean transfer spectrum at 1e-8)
        B0 = scale_axis(scale_axis(self.A, pinv(self.S_prev, cutoff=1e-8), 'vL'),
                        self.S, 'vR')
        return SimpleMPS([B0, self.B],
                         [self.S_prev.relabelled(['vL', 'vL*']),
                          self.S.relabelled(['vL', 'vL*'])], bc='infinite')


def _diag_phases(T, labels):
    """The phases of the diagonal of a square tensor, as a DiagonalTensor
    (zero diagonal entries map to phase 1). Backend-generic: goes through
    ``T.diagonal()`` + the elementwise machinery, so it works on dense
    (no-symmetry), abelian and fusion-tree storage alike."""
    xp = T.backend.block_backend.xp

    def func(blk):
        mag = xp.abs(blk)
        return xp.where(mag > 1e-300, blk / xp.where(mag > 1e-300, mag, 1.), 1.)

    d = T.diagonal()._elementwise_unary(func)
    d.labels = labels
    return d


def _fix_qr_phases(Q, R):
    """Make R's diagonal real-positive (absorbing phases into Q).

    For an exactly B-canonical input, the sign-fixed QR of ``S_i B_i``
    reproduces the canonical ``A_i`` and ``R == S_{i+1}`` EXACTLY, so
    environments absorbed from Q match the window's own gauge."""
    D = _diag_phases(R, [R.labels[0], f'{R.labels[0]}*'])
    if R.dtype.is_complex:
        from ..tensors import complex_conj

        Dc = complex_conj(D)
    else:
        Dc = D
    Q = scale_axis(Q, D, -1)
    R = scale_axis(R, Dc, 0)
    return Q, R


class MultiCellIDMRGEngine:
    """Infinite DMRG with an L-site unit cell (L even; period-L Hamiltonians).

    Each step optimizes an L-site window with finite-DMRG two-site sweeps
    between the accumulated environments, absorbs the left/right half cells,
    subtracts the window energy from the left environment's Hamiltonian
    channel, and predicts the next window with the McCulloch rotation trick
    (the chain grows by L sites per step; the cell register advances by L/2,
    handled by cycling the MPO assignment). Reduces to :class:`iDMRGEngine`'s
    physics for L == 2; use this class for period-2+ Hamiltonians
    (e.g. dimerized chains) and period-L states.
    """

    def __init__(self, psi: SimpleMPS, model, chi_max: int = 32,
                 eps: float = 1e-12, lanczos_options: dict = None,
                 n_inner_sweeps: int = 2, pad_chi_multiple: int = None,
                 mesh=None, shard_axis_name: str = 'mult',
                 matmul_precision: str = None):
        assert psi.bc == 'infinite'
        L = psi.L
        assert L % 2 == 0 and L >= 2
        assert len(model.H_mpo) == L
        self.L = L
        self.model = model
        self.chi_max = chi_max
        self.eps = eps
        self.pad_chi_multiple = pad_chi_multiple
        self.n_inner_sweeps = n_inner_sweeps
        self.mesh = mesh
        self.shard_axis_name = shard_axis_name
        self.matmul_precision = matmul_precision
        self.lanczos_options = lanczos_options or {
            'N_max': 100, 'N_min': 5, 'P_tol': 1e-14, 'reortho': True}
        self.backend = psi.backend
        self.offset = 0        # cell register: window site k has type (offset+k)%L
        self.win_Bs = list(psi.Bs)
        self.win_Ss = list(psi.Ss)
        helper = iDMRGEngine.__new__(iDMRGEngine)
        helper.backend = self.backend
        helper.model = model
        self.LP, self.RP = iDMRGEngine._init_environments(helper, psi)
        self.E_prev = None
        self.energy_per_site = None
        self.trunc_err = 0.
        self.n_steps = 0

    def _window_engine(self):
        from .dmrg import DMRGEngine

        class _WinModel:
            H_mpo = [self.model.H_mpo[(self.offset + k) % self.L]
                     for k in range(self.L)]

        eng = DMRGEngine.__new__(DMRGEngine)
        eng.psi = SimpleMPS(list(self.win_Bs), list(self.win_Ss), bc='finite')
        eng.model = _WinModel()
        eng.chi_max = self.chi_max
        eng.eps = self.eps
        eng.orthogonal_to = []
        eng.matmul_precision = self.matmul_precision
        eng.mesh = self.mesh
        eng.shard_axis_name = self.shard_axis_name
        eng.pad_chi_multiple = self.pad_chi_multiple
        eng.jit_env_updates = False
        eng.auto_static = False
        eng.lanczos_options = self.lanczos_options
        eng.backend = self.backend
        L = self.L
        eng.LPs = [None] * L
        eng.RPs = [None] * L
        eng.LPs[0] = self.LP
        eng.RPs[L - 1] = self.RP
        for i in range(L - 1, 0, -1):
            eng.update_RP(i)
        eng.OLs = []
        eng.ORs = []
        eng.E = None
        eng.trunc_err = 0.
        return eng

    def step(self) -> float:
        from .dmrg import _update_LP_impl, _update_RP_impl

        L = self.L
        eng = self._window_engine()
        for _ in range(self.n_inner_sweeps):
            E = eng.sweep()
        self.trunc_err = max(self.trunc_err, eng.trunc_err)
        psi_w = eng.psi
        # left-isometric tensors of the window via an exact QR
        # left-canonicalization sweep — NOT pinv gauge-stripping, whose 1/S
        # noise amplification destabilizes the fixed point once chi saturates
        from ..tensors import qr as qr_

        As = []
        C = psi_w.Ss[0].as_SymmetricTensor().relabelled(['vL', 'vR'])
        for i in range(L // 2):
            M = tdot(C, psi_w.Bs[i], 'vR', 'vL')
            M = permute_legs(M, codomain=['vL', 'p'], domain=['vR'])
            A_i, C = qr_(M, new_labels=['vR', 'vL'])
            A_i, C = _fix_qr_phases(A_i, C)  # gauge-match the window's B form
            As.append(A_i)
        LP = self.LP
        for k in range(L // 2):
            LP = _update_LP_impl(LP, self.model.H_mpo[(self.offset + k) % L],
                                 As[k])
        # energy subtraction keeps Heff O(1) (see iDMRGEngine.step)
        helper = iDMRGEngine.__new__(iDMRGEngine)
        helper.backend = self.backend
        helper._eye_cache_key = None
        LP = LP - E * iDMRGEngine._eye_at_channel(helper, LP)
        self.LP = iDMRGEngine._shard(self, LP, 'vR')
        RP = self.RP
        for k in range(L - 1, L // 2 - 1, -1):
            RP = _update_RP_impl(RP, self.model.H_mpo[(self.offset + k) % L],
                                 psi_w.Bs[k])
        self.RP = iDMRGEngine._shard(self, RP, 'vL')
        # rotation trick: next window = [right half (B form)] + [left half,
        # re-gauged through the translated Schmidt values]
        Ss_w = [psi_w.Ss[i] for i in range(L)]
        new_Ss = [Ss_w[(L // 2 + k) % L] for k in range(L)]
        new_Bs = list(psi_w.Bs[L // 2:])
        for k in range(L // 2):
            S_left = new_Ss[L // 2 + k]
            S_right = new_Ss[(L // 2 + k + 1) % L] if k < L // 2 - 1 \
                else Ss_w[L // 2]
            new_Bs.append(scale_axis(scale_axis(As[k],
                                                pinv(S_left, cutoff=1e-10),
                                                'vL'), S_right, 'vR'))
        self.win_Bs = new_Bs
        self.win_Ss = new_Ss
        self.offset = (self.offset + L // 2) % L
        e_site = None
        if self.n_steps > 0:
            e_site = float(E) / L
            self.energy_per_site = e_site
        self.E_prev = E
        self.n_steps += 1
        return e_site

    def run(self, n_steps: int = 200, tol: float = 1e-10,
            verbose: bool = False) -> float:
        e_old = np.inf
        for n in range(n_steps):
            e = self.step()
            if verbose and e is not None:
                print(f'step {self.n_steps}: e/site = {e:.12f}, '
                      f'chi = {int(self.win_Ss[0].leg.dim)}')
            if e is not None and abs(e - e_old) < tol:
                break
            e_old = e if e is not None else np.inf
        return self.energy_per_site

    @property
    def psi(self) -> SimpleMPS:
        """The converged unit cell (site types 0..L-1) as an infinite MPS."""
        L = self.L
        # roll the window so site 0 has type 0
        r = (-self.offset) % L
        Bs = [self.win_Bs[(r + k) % L] for k in range(L)]
        Ss = [self.win_Ss[(r + k) % L] for k in range(L)]
        return SimpleMPS(Bs, [s.relabelled(['vL', 'vL*']) for s in Ss],
                         bc='infinite')
