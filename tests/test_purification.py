"""Finite-temperature purification MPS vs exact thermal ED.

No reference counterpart (cyten has no finite-T algorithms) — validated against
dense thermal averages tr(e^{-beta H} O) / Z computed from exact
diagonalization.
"""

import numpy as np
import pytest

from cyten_tpu.algorithms.models import HeisenbergModel
from cyten_tpu.algorithms.purification import PurificationMPS, PurificationTEBD


def _thermal_ed(model, L, beta):
    """Exact thermal energy of the L-site chain from its bond operator."""
    hb = model.H_bonds[0].relabelled(['p0', 'p1', 'p1*', 'p0*'])
    # legs order [p0, p1, p1*, p0*] -> matrix [(p0 p1), (p0* p1*)]
    d = int(model.site_legs[0].dim)
    hmat = hb.to_numpy().transpose(0, 1, 3, 2).reshape(d * d, d * d)
    H = np.zeros((d ** L, d ** L))
    for i in range(L - 1):
        H += np.kron(np.kron(np.eye(d ** i), hmat), np.eye(d ** (L - 2 - i)))
    w = np.linalg.eigvalsh(H)
    boltz = np.exp(-beta * (w - w[0]))  # shift for stability
    return float((w * boltz).sum() / boltz.sum())


@pytest.mark.parametrize('conserve', ['Sz', 'SU(2)'])
def test_purification_thermal_energy(conserve):
    """Cooling from beta=0 reproduces exact thermal energies on both the
    abelian (Sz) and fusion-tree (SU(2)) backends; the infinite-temperature
    state is the symmetry-covariant coevaluation (for SU(2): singlet pairs
    between physical and ancilla)."""
    L, beta, dt = 4, 1.0, 0.0125
    model = HeisenbergModel(L=L, conserve=conserve, block_backend='numpy')
    psi = PurificationMPS.from_infinite_temperature(model.site_legs,
                                                    backend=model.backend)
    # beta = 0: <h_bond> = tr(h)/d^2 = 0 for Heisenberg
    E0 = sum(float(np.real(psi.bond_expectation_value(model.H_bonds[i], i)))
             for i in range(L - 1))
    assert abs(E0) < 1e-12
    # <Sz_i> = 0 at infinite temperature (and at any T by symmetry)
    if conserve == 'Sz':
        Sz = model.sites[0].get_op('Sz') if hasattr(model, 'sites') else None
    eng = PurificationTEBD(psi, model, dt=dt, chi_max=64, eps=1e-14)
    eng.run(int(round(beta / 2 / dt)))
    assert abs(eng.beta - beta) < 1e-12
    E = sum(float(np.real(psi.bond_expectation_value(model.H_bonds[i], i)))
            for i in range(L - 1))
    E_exact = _thermal_ed(model, L, beta)
    # error budget: second-order Trotter O(dt^2) ~ 2e-6 at dt=0.0125
    assert abs(E - E_exact) < 1e-5, (E, E_exact)


def test_purification_ground_state_limit():
    """beta -> large approaches the ground-state energy from above."""
    from cyten_tpu.algorithms.models import heisenberg_exact_finite_gs_energy

    L, dt = 4, 0.05
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='numpy')
    psi = PurificationMPS.from_infinite_temperature(model.site_legs,
                                                    backend=model.backend)
    eng = PurificationTEBD(psi, model, dt=dt, chi_max=64, eps=1e-14)
    E_gs = heisenberg_exact_finite_gs_energy(L, 1.)
    E_prev = 0.
    for _ in range(4):  # beta 2.5 per leg -> 10
        eng.run(25)
        E = sum(float(np.real(psi.bond_expectation_value(model.H_bonds[i], i)))
                for i in range(L - 1))
        assert E < E_prev + 1e-12  # monotone cooling
        E_prev = E
    assert E > E_gs - 1e-6          # variational from above (up to Trotter)
    assert abs(E - E_gs) < 5e-3     # close at beta = 10


def test_purification_site_observable():
    """<Sz_i>_beta = 0 by symmetry; <(Sz_i)^2> = 1/4 for spin-1/2 at any T."""
    import cyten_tpu as ct
    from cyten_tpu import SymmetricTensor

    L, dt = 4, 0.025
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='numpy')
    psi = PurificationMPS.from_infinite_temperature(model.site_legs,
                                                    backend=model.backend)
    eng = PurificationTEBD(psi, model, dt=dt, chi_max=32, eps=1e-14)
    eng.run(10)  # beta = 0.5
    p = model.site_legs[0]
    Sz = SymmetricTensor.from_dense_block(
        np.diag([0.5, -0.5]), [p], [p], backend=model.backend,
        labels=['p', 'p*'])
    for i in range(L):
        v = complex(psi.site_expectation_value(Sz, i))
        assert abs(v) < 1e-10
        v2 = complex(psi.site_expectation_value(
            SymmetricTensor.from_dense_block(np.diag([0.25, 0.25]), [p], [p],
                                             backend=model.backend,
                                             labels=['p', 'p*']), i))
        assert abs(v2 - 0.25) < 1e-10
