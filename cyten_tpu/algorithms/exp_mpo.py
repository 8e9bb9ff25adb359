"""MPO-based time evolution: the W^II approximation of ``exp(dt H)``.

Zaletel, Mong, Karrasch, Moore & Pollmann, PRB 91, 165112 (2015): for an MPO
Hamiltonian in the standard upper-triangular finite-state-machine form

    W = [[ 1,  C,  D ],
         [ 0,  A,  B ],
         [ 0,  0,  1 ]]

(ready channel first, done channel last — exactly what
:func:`~cyten_tpu.algorithms.models.mpo_from_terms` builds), the W^II MPO
approximates the propagator ``exp(dt H)`` to per-site error ``O(dt^2)`` with
virtual dimension ``1 + (middle channels)`` — one LESS than H itself.  Unlike
TEBD it handles arbitrary-range couplings (anything ``mpo_from_terms`` can
encode), and unlike global Krylov stepping it stays in MPO form, so one
time step is a single (compressed) MPO application.

Each W^II block is an aux-space matrix element of one exponential

    M = exp( dt D ⊗ 1 + sqrt(dt) B_a ⊗ c1† + sqrt(dt) C_b ⊗ c2† + A_ab ⊗ c1†c2† )

over two hard-core bosonic auxiliaries:  W_D = <00|M|00>, W_B[a] = <10|M|00>,
W_C[b] = <01|M|00>, W_A[a,b] = <11|M|00> (Eq. (19) of the paper).  A term
``C · A^(n) · B`` spanning n+2 sites thus collects ``sqrt(dt)·1^n·sqrt(dt) = dt``.

Second order: ``U(dt) ≈ W^II(z) W^II(z̄)`` with ``z = (1+i) dt/2`` cancels the
``O(dt^2)`` error term (tenpy's ``ExpMPOEvolution(order=2)`` trick).

Counterpart of tenpy's ``mpo.make_W_II`` + ``ExpMPOEvolution``; the reference
cyten has no MPO evolution at all (its toycodes stop at TEBD,
/root/reference/cyten/algorithms — absent; models layer ends at two-site
couplings, cyten/models/couplings.py:476).
"""

from __future__ import annotations

import numpy as np

from ..tensors import SymmetricTensor, permute_legs
from .models import MpoTensors, mpo_from_terms
from .mpo import apply_mpo, variational_apply_mpo
from .mps import SimpleMPS

__all__ = ['make_wii', 'exp_mpo_from_terms', 'ExpMPOEvolution']


def _wii_site_dense(Wd: np.ndarray, dt: complex) -> np.ndarray:
    """The dense W^II tensor of one site from the dense full-grid MPO tensor.

    `Wd`: ``(DL, d, DR, d)`` in ``[wL, p, wR, p*]`` legs order, ready channel
    at index 0 and done channel at index -1 of both virtual axes.  Returns
    ``(1 + (DL-2), d, 1 + (DR-2), d)`` — the merged identity channel first.
    """
    from scipy.linalg import expm

    DL, d, DR, _ = Wd.shape
    Nb, Nc = DL - 2, DR - 2
    D = Wd[0, :, -1, :]
    C = Wd[0, :, 1:-1, :].transpose(1, 0, 2)          # (Nc, d, d)
    B = Wd[1:-1, :, -1, :]                            # (Nb, d, d)
    A = Wd[1:-1, :, 1:-1, :].transpose(0, 2, 1, 3)    # (Nb, Nc, d, d)
    dtc = complex(dt)
    # a term's sqrt(dt) split: complex branch needed for negative/complex dt
    s = np.sqrt(dtc.real) if (dtc.imag == 0 and dtc.real >= 0) else np.sqrt(dtc)
    dt_ = dtc.real if dtc.imag == 0 else dtc
    dtype = np.promote_types(Wd.dtype, np.result_type(dt_, s))
    out = np.zeros((1 + Nb, d, 1 + Nc, d), dtype=dtype)
    Id2 = np.eye(2)
    cdag = np.array([[0., 0.], [1., 0.]])  # hard-core boson raising |0> -> |1>
    for r in range(max(Nb, 1)):
        for c in range(max(Nc, 1)):
            h = dt_ * np.kron(np.kron(Id2, Id2), D).astype(dtype)
            if Nb:
                h = h + s * np.kron(np.kron(cdag, Id2), B[r])
            if Nc:
                h = h + s * np.kron(np.kron(Id2, cdag), C[c])
            if Nb and Nc:
                h = h + np.kron(np.kron(cdag, cdag), A[r, c])
            w = expm(h).reshape(2, 2, d, 2, 2, d)
            out[0, :, 0, :] = w[0, 0, :, 0, 0, :]
            if Nb:
                out[1 + r, :, 0, :] = w[1, 0, :, 0, 0, :]
            if Nc:
                out[0, :, 1 + c, :] = w[0, 1, :, 0, 0, :]
            if Nb and Nc:
                out[1 + r, :, 1 + c, :] = w[1, 1, :, 0, 0, :]
    return out


def make_wii(full_mpos, dt) -> MpoTensors:
    """The W^II MPO for ``exp(dt H)`` from a FULL-grid finite MPO of H.

    `full_mpos` must carry the ready channel at public index 0 and the done
    channel at public index -1 of every virtual leg — i.e. come from
    ``mpo_from_terms(..., select_boundary=False)`` (or any hand-built grid in
    the same convention).  `dt` may be complex (``-1j * t`` for real time,
    ``-tau`` for imaginary time).  The result is boundary-ready as is: the
    W^II virtual space is ``trivial ⊕ middles`` and the middle channels are
    empty at the chain ends.

    Requires a symmetry with a dense basis (``symmetry.can_be_dropped``);
    charge conservation of the result is verified by the symmetric projection
    in ``from_dense_block`` (tol 1e-10).
    """
    out = []
    for W in full_mpos:
        W = permute_legs(W, codomain=['wL', 'p'], domain=['p*', 'wR'])
        sym = W.symmetry
        if not sym.can_be_dropped:
            raise NotImplementedError(
                'make_wii needs a dense basis (symmetry.can_be_dropped); '
                'anyonic MPO evolution is not supported')
        wL, p = W.codomain.factors
        pstar, wR = W.domain.factors
        Wd = W.to_numpy()
        DL, DR = Wd.shape[0], Wd.shape[2]
        if DL < 2 or DR < 2:
            raise ValueError('make_wii needs FULL-grid MPO tensors (both the '
                             'ready and the done channel on every virtual leg); '
                             'use mpo_from_terms(..., select_boundary=False)')
        wii = _wii_site_dense(Wd, dt)
        # W^II virtual space = identity channel (ready slot) + middles: drop 'done'
        mask_L = np.ones(DL, dtype=bool)
        mask_L[-1] = False
        mask_R = np.ones(DR, dtype=bool)
        mask_R[-1] = False
        wLp = wL.take_slice(mask_L)
        wRp = wR.take_slice(mask_R)
        # expm roundoff scales with exp(||dt*H_site||): scale the projection
        # tolerance with the block magnitude so large dt / strong couplings
        # lose accuracy instead of spuriously tripping the charge check
        wii_tol = 1e-10 * max(1.0, float(np.max(np.abs(wii))))
        T = SymmetricTensor.from_dense_block(
            wii, [wLp, p], [pstar, wRp], backend=W.backend,
            labels=['wL', 'p', 'wR', 'p*'], tol=wii_tol)
        out.append(T)
    res = MpoTensors(out)
    res.max_range = getattr(full_mpos, 'max_range', 1)
    return res


def exp_mpo_from_terms(site_legs, dt, onsite=(), couplings=(), order: int = 2,
                       backend=None, svd_cut: float = 1e-12):
    """W^II MPO factor(s) of ``exp(dt H)`` for H given as on-site + coupling terms.

    Same term format as :func:`~cyten_tpu.algorithms.models.mpo_from_terms`
    (arbitrary-range couplings welcome).  ``order=1`` returns ``[W^II(dt)]``;
    ``order=2`` returns ``[W^II((1+i) dt/2), W^II((1-i) dt/2)]`` — apply them
    left to right for a per-step error ``O(dt^3)``.
    """
    full = mpo_from_terms(site_legs, onsite=onsite, couplings=couplings,
                          backend=backend, svd_cut=svd_cut, bc='finite',
                          select_boundary=False)
    if order == 1:
        zs = [dt]
    elif order == 2:
        # (1±i)/2 coefficient pair: z1 + z2 = dt and z1^2 + z2^2 = 0, so the
        # O(dt^2) defects of the two factors cancel (dt itself may be complex
        # — the coefficients are conjugate, NOT the steps)
        zs = [0.5 * (1. + 1.j) * dt, 0.5 * (1. - 1.j) * dt]
    else:
        raise ValueError(f'order must be 1 or 2, got {order}')
    return [make_wii(full, z) for z in zs]


class ExpMPOEvolution:
    """Time evolution by compressed W^II MPO application.

    The standard tool for finite chains with LONG-RANGE couplings, where TEBD
    does not apply: one step applies ``exp(dt H)`` in W^II form (order 1 or 2)
    and truncates to `chi_max` by zip-up (default) or a variational fit.

    Parameters
    ----------
    psi : SimpleMPS
        Initial state (finite bc); evolved copy lives in ``self.psi``.
    site_legs, onsite, couplings :
        The Hamiltonian, in :func:`mpo_from_terms` term format.
    dt : float
        Step size.  ``real_time=True`` evolves ``exp(-i dt H)``, else
        ``exp(-dt H)`` (imaginary time; re-normalized every step either way).
    order : 1 | 2
        W^II Trotter order (2 = complex-conjugate pair of half-steps).
    compression : 'zip_up' | 'variational'
        MPO-application compression.  Variational re-fits the zip-up result
        (`n_sweeps` two-site sweeps) — tighter at equal chi, costs more.
    """

    def __init__(self, psi: SimpleMPS, site_legs, onsite=(), couplings=(),
                 dt: float = 0.05, real_time: bool = True, order: int = 2,
                 chi_max: int = 64, eps: float = 1e-12,
                 compression: str = 'zip_up', n_sweeps: int = 2,
                 backend=None, svd_cut: float = 1e-12):
        if psi.bc != 'finite':
            raise ValueError("ExpMPOEvolution requires finite bc "
                             "(use iTDVPEngine / TEBD for infinite MPS)")
        if compression not in ('zip_up', 'variational'):
            raise ValueError(f'unknown compression: {compression!r}')
        self.psi = psi
        self.dt = dt
        self.chi_max = chi_max
        self.eps = eps
        self.compression = compression
        self.n_sweeps = n_sweeps
        self.evolved_time = 0.0
        z = (-1.j if real_time else -1.) * dt
        self.u_mpos = exp_mpo_from_terms(
            site_legs, z, onsite=onsite, couplings=couplings, order=order,
            backend=backend if backend is not None else psi.backend,
            svd_cut=svd_cut)

    def run(self, n_steps: int = 1) -> SimpleMPS:
        for _ in range(n_steps):
            for U in self.u_mpos:
                if self.compression == 'variational':
                    self.psi, _ = variational_apply_mpo(
                        self.psi, U, chi_max=self.chi_max, eps=self.eps,
                        n_sweeps=self.n_sweeps)
                else:
                    self.psi, _ = apply_mpo(self.psi, U, chi_max=self.chi_max,
                                            eps=self.eps)
            self.evolved_time += self.dt
        return self.psi
