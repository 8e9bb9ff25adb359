"""mpo_from_terms: the FSM ('MPO graph') builder for arbitrary-range terms.

Validates the three nontrivial claims:
- the FSM grid reproduces hand-built nearest-neighbor MPOs exactly,
- arbitrary-distance couplings are correct (Majumdar-Ghosh exact-dimer anchor,
  frustrated t1-t2 fermions vs free-fermion ED),
- the identity passthrough on graded bond sectors IS the Jordan-Wigner string
  (no explicit string operators anywhere).

The reference cyten has no MPO builder (its models layer stops at two-site
couplings, cyten/models/couplings.py:476); the counterpart is tenpy's MPOGraph.
"""

import numpy as np
import pytest

from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
from cyten_tpu.algorithms.models import (
    HeisenbergModel, TFIModel, mpo_from_terms)

_sx = np.array([[0., 1.], [1., 0.]])
_sz = np.array([[1., 0.], [0., -1.]])
_Sp = np.array([[0., 1.], [0., 0.]])
_SS = (0.5 * (np.kron(_Sp, _Sp.T) + np.kron(_Sp.T, _Sp))
       + 0.25 * np.kron(_sz, _sz))


class _MpoModel:
    def __init__(self, H_mpo):
        self.H_mpo = H_mpo


def test_reproduces_hand_built_mpo():
    """TFI via onsite + nn coupling terms == the hand-built 5-state MPO."""
    L = 6
    m = TFIModel(L=L, J=1., g=0.7, conserve='parity', block_backend='numpy')
    mpo = mpo_from_terms(
        [m.site_leg] * L,
        onsite=[(i, _sz, -0.7) for i in range(L)],
        couplings=[(i, i + 1, np.kron(_sx, _sx), -1.0) for i in range(L - 1)],
        backend=m.backend)
    psi = SimpleMPS.from_product_state([m.site_leg] * L, [0] * L,
                                       backend=m.backend)
    DMRGEngine(psi, m, chi_max=16, eps=1e-12).run(n_sweeps=6)
    E_ref = psi.expectation_value_mpo(m.H_mpo)
    E_new = psi.expectation_value_mpo(mpo)
    assert abs(E_ref - E_new) < 1e-12


@pytest.mark.parametrize('conserve', ['Sz', 'None'])
def test_majumdar_ghosh(conserve):
    """J1-J2 at J2 = J1/2 (open chain, even L): the dimer product is the exact
    ground state, E = -(3/4) J1 L/2."""
    L = 10
    hm = HeisenbergModel(L=L, conserve=conserve, block_backend='numpy')
    mpo = mpo_from_terms(
        [hm.site_leg] * L,
        couplings=[(i, i + 1, _SS, 1.0) for i in range(L - 1)] +
                  [(i, i + 2, _SS, 0.5) for i in range(L - 2)],
        backend=hm.backend)
    psi = SimpleMPS.from_product_state([hm.site_leg] * L,
                                       [i % 2 for i in range(L)],
                                       backend=hm.backend)
    E = DMRGEngine(psi, _MpoModel(mpo), chi_max=32, eps=1e-12).run(n_sweeps=10)
    assert abs(E - (-0.75 * (L // 2))) < 1e-8


def test_majumdar_ghosh_su2():
    """The FSM builder on the fusion-tree backend: SU(2)-symmetric J1-J2
    couplings (SymmetricTensor input) at the Majumdar-Ghosh point."""
    from cyten_tpu.models.couplings import heisenberg_coupling
    from cyten_tpu.models.sites import SpinSite

    L = 8
    site = SpinSite(0.5, conserve='SU2')
    h = heisenberg_coupling([site, site], J=1.).to_tensor()
    mpo = mpo_from_terms(
        [site.leg] * L,
        couplings=[(i, i + 1, h, 1.0) for i in range(L - 1)] +
                  [(i, i + 2, h, 0.5) for i in range(L - 2)],
        backend=site.backend)
    psi = SimpleMPS.from_singlet_pairs(site.leg, L, backend=site.backend)
    E = DMRGEngine(psi, _MpoModel(mpo), chi_max=24, eps=1e-12).run(n_sweeps=8)
    assert abs(E - (-0.75 * (L // 2))) < 1e-8


def test_fermionic_long_range_jw():
    """Frustrated t1-t2 spinless fermions: a missing JW string (hardcore
    bosons) gives a different energy, so this pins the graded passthrough.
    Exact reference: free-fermion single-particle spectrum."""
    from cyten_tpu.models.couplings import hopping
    from cyten_tpu.models.sites import SpinlessFermionSite

    L, t1, t2 = 6, 1.0, 0.6
    site = SpinlessFermionSite('N')
    h1 = hopping([site, site], t=t1).to_tensor()
    h2 = hopping([site, site], t=t2).to_tensor()
    mpo = mpo_from_terms(
        [site.leg] * L,
        couplings=[(i, i + 1, h1) for i in range(L - 1)] +
                  [(i, i + 2, h2) for i in range(L - 2)],
        backend=site.backend)

    h_sp = np.zeros((L, L))
    for i in range(L - 1):
        h_sp[i, i + 1] = h_sp[i + 1, i] = -t1
    for i in range(L - 2):
        h_sp[i, i + 2] = h_sp[i + 2, i] = -t2
    eps = np.linalg.eigvalsh(h_sp)
    E_exact = eps[eps < 0].sum()
    N0 = int((eps < 0).sum())

    state = [1] * N0 + [0] * (L - N0)
    psi = SimpleMPS.from_product_state([site.leg] * L, state,
                                       backend=site.backend)
    E = DMRGEngine(psi, _MpoModel(mpo), chi_max=32, eps=1e-13).run(n_sweeps=8)
    assert abs(E - E_exact) < 1e-9


def test_cylinder_tfi_vs_ed():
    """2D TFI on a 3x3 open-boundary patch, snake-mapped to a chain (range-3
    vertical couplings), vs dense ED — the 2D-lattice use case end-to-end."""
    Lx = Ly = 3
    N = Lx * Ly
    g = 1.2

    def idx(x, y):
        # snake: even columns go up, odd columns go down
        return x * Ly + (y if x % 2 == 0 else Ly - 1 - y)

    pairs = []
    for x in range(Lx):
        for y in range(Ly):
            if y + 1 < Ly:
                pairs.append(tuple(sorted((idx(x, y), idx(x, y + 1)))))
            if x + 1 < Lx:
                pairs.append(tuple(sorted((idx(x, y), idx(x + 1, y)))))

    # dense ED
    H = np.zeros((2 ** N, 2 ** N))

    def op_at(op, i):
        return np.kron(np.kron(np.eye(2 ** i), op), np.eye(2 ** (N - i - 1)))

    for i, j in pairs:
        H -= op_at(_sx, i) @ op_at(_sx, j)
    for i in range(N):
        H -= g * op_at(_sz, i)
    E_exact = np.linalg.eigvalsh(H)[0]

    m = TFIModel(L=N, J=1., g=g, conserve='parity', block_backend='numpy')
    mpo = mpo_from_terms(
        [m.site_leg] * N,
        onsite=[(i, _sz, -g) for i in range(N)],
        couplings=[(i, j, np.kron(_sx, _sx), -1.0) for i, j in pairs],
        backend=m.backend)
    psi = SimpleMPS.from_product_state([m.site_leg] * N, [0] * N,
                                       backend=m.backend)
    E = DMRGEngine(psi, _MpoModel(mpo), chi_max=32, eps=1e-12).run(n_sweeps=8)
    assert abs(E - E_exact) < 1e-8


def test_grouped_pair_terms_and_strength():
    """Terms on the same (i, j) pair are summed before factorizing; optional
    strengths multiply; SymmetricTensor and dense inputs mix."""
    L = 4
    m = TFIModel(L=L, J=1., g=0.3, conserve='None', block_backend='numpy')
    a = mpo_from_terms(
        [m.site_leg] * L,
        couplings=[(0, 1, np.kron(_sx, _sx), -0.5),
                   (0, 1, np.kron(_sx, _sx), -0.5),
                   (1, 2, np.kron(_sx, _sx), -1.0),
                   (2, 3, np.kron(_sx, _sx), -1.0)],
        onsite=[(i, -0.3 * _sz) for i in range(L)],
        backend=m.backend)
    psi = SimpleMPS.from_product_state([m.site_leg] * L, [0] * L,
                                       backend=m.backend)
    DMRGEngine(psi, m, chi_max=8, eps=1e-12).run(n_sweeps=5)
    assert abs(psi.expectation_value_mpo(a)
               - psi.expectation_value_mpo(m.H_mpo)) < 1e-12
    # bond dim: one state per crossing term + ready + done
    assert a[1].get_leg_co_domain('wR').dim <= 1 + 1 + 1 + 1  # R, (1,2)-k, D


def test_invalid_pair_raises():
    m = TFIModel(L=3, J=1., g=1., conserve='None', block_backend='numpy')
    with pytest.raises(ValueError, match='i < j'):
        mpo_from_terms([m.site_leg] * 3,
                       couplings=[(1, 1, np.kron(_sx, _sx))],
                       backend=m.backend)


def test_infinite_uniform_nn():
    """bc='infinite': uniform FSM MPO for a 2-site cell, wrap legs matching,
    iDMRG energy density == exact infinite TFI."""
    from cyten_tpu.algorithms.idmrg import iDMRGEngine

    m = TFIModel(L=2, J=1., g=1.5, conserve='parity', block_backend='numpy',
                 bc='infinite')
    mpo = mpo_from_terms(
        [m.site_leg] * 2,
        onsite=[(0, _sz, -1.5), (1, _sz, -1.5)],
        couplings=[(0, 1, np.kron(_sx, _sx), -1.0),
                   (1, 2, np.kron(_sx, _sx), -1.0)],
        backend=m.backend, bc='infinite')
    assert mpo.max_range == 1
    assert (mpo[0].get_leg_co_domain('wL').dim
            == mpo[1].get_leg_co_domain('wR').dim)

    class M:
        bc = 'infinite'
        H_mpo = mpo

    psi = SimpleMPS.from_product_state([m.site_leg] * 2, [0, 0],
                                       backend=m.backend, bc='infinite')
    e = iDMRGEngine(psi, M(), chi_max=24, eps=1e-12).run(n_steps=150)
    assert abs(e - m.exact_infinite_gs_energy()) < 1e-8


def test_infinite_long_range_tensors_and_guard():
    """Range-2 infinite FSM tensors are exactly the finite builder's bulk
    (finite-ification equality on a converged state); the iDMRG engine
    refuses in-flight MPOs with guidance."""
    from cyten_tpu.algorithms.idmrg import iDMRGEngine
    from cyten_tpu.algorithms.models import _boundary_selector

    hm = HeisenbergModel(L=2, conserve='Sz', block_backend='numpy',
                         bc='infinite')
    W = mpo_from_terms(
        [hm.site_leg] * 2,
        couplings=[(0, 1, _SS, 1.), (1, 2, _SS, 1.),
                   (0, 2, _SS, 0.5), (1, 3, _SS, 0.5)],
        backend=hm.backend, bc='infinite')
    assert W.max_range == 2

    L = 8
    fin_from_inf = [W[i % 2] for i in range(L)]
    fin_from_inf[0] = _boundary_selector(fin_from_inf[0], left=True)
    fin_from_inf[-1] = _boundary_selector(fin_from_inf[-1], left=False)
    fin = mpo_from_terms(
        [hm.site_leg] * L,
        couplings=[(i, i + 1, _SS, 1.) for i in range(L - 1)] +
                  [(i, i + 2, _SS, 0.5) for i in range(L - 2)],
        backend=hm.backend)
    psi = SimpleMPS.from_product_state([hm.site_leg] * L,
                                       [i % 2 for i in range(L)],
                                       backend=hm.backend)
    DMRGEngine(psi, _MpoModel(fin), chi_max=16, eps=1e-12).run(n_sweeps=6)
    assert abs(psi.expectation_value_mpo(fin)
               - psi.expectation_value_mpo(fin_from_inf)) < 1e-12

    class M:
        bc = 'infinite'
        H_mpo = W

    psi_i = SimpleMPS.from_product_state([hm.site_leg] * 2, [0, 1],
                                         backend=hm.backend, bc='infinite')
    with pytest.raises(ValueError, match='nearest neighbors'):
        iDMRGEngine(psi_i, M(), chi_max=16)


def test_infinite_long_range_vumps():
    """The supported path for range > 1 infinite models: warm-start iDMRG on
    the nearest-neighbor part, then VUMPS on the full MPO. Majumdar-Ghosh:
    energy density (MPO-environment growth rate) and state correlators both
    hit the exact -0.375."""
    from cyten_tpu.algorithms.idmrg import iDMRGEngine
    from cyten_tpu.algorithms.vumps import VUMPSEngine
    from cyten_tpu.models.sites import SpinSite

    hm = HeisenbergModel(L=2, conserve='Sz', block_backend='numpy',
                         bc='infinite')

    class M:
        bc = 'infinite'

    m_nn = M()
    m_nn.H_mpo = mpo_from_terms(
        [hm.site_leg] * 2, couplings=[(0, 1, _SS, 1.), (1, 2, _SS, 1.)],
        backend=hm.backend, bc='infinite')
    psi = SimpleMPS.from_product_state([hm.site_leg] * 2, [0, 1],
                                       backend=hm.backend, bc='infinite')
    eng = iDMRGEngine(psi, m_nn, chi_max=16, eps=1e-12)
    for _ in range(30):
        eng.step()
    psi_w = eng.psi
    psi_w.canonicalize_infinite()

    m_full = M()
    m_full.H_mpo = mpo_from_terms(
        [hm.site_leg] * 2,
        couplings=[(0, 1, _SS, 1.), (1, 2, _SS, 1.),
                   (0, 2, _SS, 0.5), (1, 3, _SS, 0.5)],
        backend=hm.backend, bc='infinite')
    v = VUMPSEngine(psi_w, m_full)
    e = v.run(max_iter=150, tol=1e-10)
    assert abs(e + 0.375) < 1e-9          # MPO-native growth-rate energy
    assert abs(v.env_energy_cell + 0.75) < 1e-9

    # independent cross-check on the state itself
    site = SpinSite(0.5, conserve='Sz', backend=hm.backend)
    big = v.psi.enlarge_unit_cell(3)
    Szt, Spt, Smt = site.get_op('Sz'), site.get_op('Sp'), site.get_op('Sm')

    def ss(i, j):
        return (0.5 * (big.correlation_function(Spt, i, Smt, j)
                       + big.correlation_function(Smt, i, Spt, j))
                + big.correlation_function(Szt, i, Szt, j)).real

    e_state = 0.5 * (ss(2, 3) + ss(3, 4)) + 0.25 * (ss(2, 4) + ss(3, 5))
    assert abs(e_state + 0.375) < 1e-9


def test_coupling_model_long_range():
    """CouplingModel.add_coupling(i, c, j=...) + build_H_mpo: the user-facing
    path to arbitrary-range models (Majumdar-Ghosh anchor)."""
    from cyten_tpu.models.couplings import heisenberg_coupling
    from cyten_tpu.models.sites import SpinHalfSite
    from cyten_tpu.models.tenpy_models import CouplingModel

    L = 6
    sites = [SpinHalfSite(conserve='Sz') for _ in range(L)]
    m = CouplingModel(sites)
    for i in range(L - 1):
        m.add_coupling(i, heisenberg_coupling([sites[i], sites[i + 1]], J=1.))
    for i in range(L - 2):
        m.add_coupling(i, heisenberg_coupling([sites[i], sites[i + 2]], J=0.5),
                       j=i + 2)
    with pytest.raises(ValueError, match='build_H_mpo'):
        m.all_bond_ops()
    psi = SimpleMPS.from_product_state([s.leg for s in sites],
                                       [i % 2 for i in range(L)],
                                       backend=sites[0].backend)
    E = DMRGEngine(psi, _MpoModel(m.build_H_mpo()), chi_max=24,
                   eps=1e-12).run(n_sweeps=6)
    assert abs(E - (-0.75 * (L // 2))) < 1e-8
