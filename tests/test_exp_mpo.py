"""W^II MPO time evolution (Zaletel et al., PRB 91, 165112 (2015)).

Validates the three claims that matter:
- the W^II MPO converges to the exact propagator at the advertised rates
  (error ~ dt^2 for order 1, ~ dt^3 for the (1±i)/2 order-2 pair),
- ExpMPOEvolution reproduces ED real-time dynamics on a conserved-charge
  chain,
- LONG-RANGE couplings evolve correctly (the case TEBD cannot touch at all);
  the W^II virtual dimension is 1 + (middle FSM channels), one less than H.

No counterpart in the reference cyten (toycodes stop at TEBD); tenpy's
``make_W_II`` / ``ExpMPOEvolution`` is the feature being matched.
"""

import functools

import numpy as np
import pytest
from scipy.linalg import expm

from cyten_tpu.algorithms import SimpleMPS
from cyten_tpu.algorithms.exp_mpo import (
    ExpMPOEvolution, exp_mpo_from_terms, make_wii)
from cyten_tpu.algorithms.models import (
    TFIModel, mpo_from_terms, spin_half_site)
from cyten_tpu.algorithms.mpo import apply_mpo
from cyten_tpu.backends import get_backend
from cyten_tpu.tensors import tdot

_sx = np.array([[0., 1.], [1., 0.]])
_sz = np.diag([1., -1.])
_Sp = np.array([[0., 1.], [0., 0.]])
_hop = 0.5 * (np.kron(_Sp, _Sp.T.conj()) + np.kron(_Sp.T.conj(), _Sp))


def _full_state(psi):
    s = psi.get_theta1(0)
    for i in range(1, psi.L):
        s = tdot(s, psi.Bs[i].relabelled({'p': f'p{i}'}), 'vR', 'vL')
    return np.asarray(s.to_dense_block()).reshape(-1)


def _op(o, i, L):
    mats = [np.eye(2)] * L
    mats[i] = o
    return functools.reduce(np.kron, mats)


def _tfi_setup(L=4, g=0.7):
    m = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='numpy')
    onsite = [(i, _sz, -g) for i in range(L)]
    coup = [(i, i + 1, np.kron(_sx, _sx), -1.0) for i in range(L - 1)]
    H = sum(-g * _op(_sz, i, L) for i in range(L)) \
        + sum(-_op(_sx, i, L) @ _op(_sx, i + 1, L) for i in range(L - 1))
    return m, onsite, coup, H


@pytest.mark.parametrize('order, rate', [(1, 4.), (2, 8.)])
def test_wii_convergence_rate(order, rate):
    """Halving dt divides the one-step error by 2^(order+1)."""
    L = 4
    m, onsite, coup, H = _tfi_setup(L)
    psi0 = SimpleMPS.from_product_state([m.site_leg] * L, [0, 1, 0, 1],
                                        backend=m.backend)
    v0 = _full_state(psi0)
    errs = []
    for dt in (0.1, 0.05):
        us = exp_mpo_from_terms([m.site_leg] * L, -1j * dt, onsite=onsite,
                                couplings=coup, order=order, backend=m.backend)
        phi, ntot = psi0, 1.0
        for U in us:
            phi, nrm = apply_mpo(phi, U, chi_max=64, eps=1e-14)
            ntot *= nrm
        errs.append(np.linalg.norm(ntot * _full_state(phi)
                                   - expm(-1j * dt * H) @ v0))
    assert errs[0] < (0.05 if order == 1 else 1e-3)
    assert errs[0] / errs[1] > 0.7 * rate


def test_wii_virtual_dimension():
    """W^II drops the done channel: chi_wii = chi_H - 1 on every bond."""
    L = 5
    m, onsite, coup, _ = _tfi_setup(L)
    full = mpo_from_terms([m.site_leg] * L, onsite=onsite, couplings=coup,
                          backend=m.backend, select_boundary=False)
    wii = make_wii(full, -0.01)
    for W_full, W in zip(full, wii):
        assert int(W.get_leg_co_domain('wR').dim) \
            == int(W_full.get_leg_co_domain('wR').dim) - 1


def test_engine_vs_ed_u1():
    """Real-time quench from Neel on the U(1)-conserved XXZ chain vs ED."""
    L, T, dt = 6, 0.5, 0.05
    leg = spin_half_site('Sz')
    backend = get_backend(leg.symmetry, 'numpy')
    xxz = _hop + 0.25 * np.kron(_sz, _sz)
    coup = [(i, i + 1, xxz, 1.0) for i in range(L - 1)]
    H = sum(0.5 * (_op(_Sp, i, L) @ _op(_Sp.T, i + 1, L)
                   + _op(_Sp.T, i, L) @ _op(_Sp, i + 1, L))
            + 0.25 * _op(_sz, i, L) @ _op(_sz, i + 1, L)
            for i in range(L - 1))
    psi0 = SimpleMPS.from_product_state([leg] * L, [i % 2 for i in range(L)],
                                        backend=backend)
    v0 = _full_state(psi0)
    eng = ExpMPOEvolution(psi0, [leg] * L, couplings=coup, dt=dt, order=2,
                          chi_max=64, eps=1e-13, backend=backend)
    eng.run(int(round(T / dt)))
    v_ex = expm(-1j * T * H) @ v0
    w = _full_state(eng.psi)
    for i in range(L):
        szi = _op(_sz, i, L)
        ed = np.real(np.vdot(v_ex, szi @ v_ex))
        got = np.real(np.vdot(w, szi @ w) / np.vdot(w, w))
        assert abs(ed - got) < 2e-3, (i, ed, got)


def test_engine_long_range_vs_ed():
    """1/r^2-decaying long-range XX chain (range up to L-1): ED dynamics
    reproduced — the regime where TEBD has no Trotter decomposition."""
    L, T, dt = 5, 0.4, 0.04
    leg = spin_half_site('Sz')
    backend = get_backend(leg.symmetry, 'numpy')
    coup = [(i, j, _hop, 1.0 / (j - i) ** 2)
            for i in range(L) for j in range(i + 1, L)]
    H = sum((1.0 / (j - i) ** 2) * 0.5
            * (_op(_Sp, i, L) @ _op(_Sp.T, j, L)
               + _op(_Sp.T, i, L) @ _op(_Sp, j, L))
            for i in range(L) for j in range(i + 1, L))
    psi0 = SimpleMPS.from_product_state([leg] * L, [0, 1, 0, 1, 1],
                                        backend=backend)
    v0 = _full_state(psi0)
    eng = ExpMPOEvolution(psi0, [leg] * L, couplings=coup, dt=dt, order=2,
                          chi_max=64, eps=1e-13, backend=backend)
    eng.run(int(round(T / dt)))
    v_ex = expm(-1j * T * H) @ v0
    w = _full_state(eng.psi)
    for i in range(L):
        szi = _op(_sz, i, L)
        ed = np.real(np.vdot(v_ex, szi @ v_ex))
        got = np.real(np.vdot(w, szi @ w) / np.vdot(w, w))
        assert abs(ed - got) < 2e-3, (i, ed, got)


def test_imaginary_time_cooling():
    """exp(-tau H) cooling onto the TFI ground state (variational
    compression path)."""
    L = 6
    m, onsite, coup, H = _tfi_setup(L, g=1.2)
    psi = SimpleMPS.from_product_state([m.site_leg] * L, [0] * L,
                                       backend=m.backend)
    eng = ExpMPOEvolution(psi, [m.site_leg] * L, onsite=onsite,
                          couplings=coup, dt=0.1, real_time=False, order=2,
                          chi_max=32, eps=1e-12, compression='variational',
                          n_sweeps=2, backend=m.backend)
    for _ in range(30):
        eng.run(1)
    E = np.real(eng.psi.expectation_value_mpo(m.H_mpo))
    E_ex = float(np.linalg.eigvalsh(H)[0])
    assert abs(E - E_ex) < 1e-4, (E, E_ex)
