"""iDMRG (McCulloch infinite-size DMRG) vs exact thermodynamic-limit energies."""

import numpy as np
import pytest

from cyten_tpu.algorithms import SimpleMPS
from cyten_tpu.algorithms.idmrg import iDMRGEngine
from cyten_tpu.algorithms.models import (
    HeisenbergModel, TFIModel, tfi_exact_infinite_gs_energy,
)


def test_idmrg_tfi_gapped():
    """Gapped TFI: iDMRG converges to the exact free-fermion energy density."""
    model = TFIModel(L=2, J=1.0, g=1.5, conserve='parity',
                     block_backend='numpy', bc='infinite')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                       backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi, model, chi_max=32, eps=1e-12)
    e = eng.run(n_steps=150, tol=1e-12)
    e_exact = tfi_exact_infinite_gs_energy(1.0, 1.5)
    assert abs(e - e_exact) < 1e-9
    # the converged center wavefunction is canonical: its bond expectation
    # value gives the same energy density
    assert abs(eng.bond_energy() - e_exact) < 1e-5
    # converged unit cell is exposed as an infinite MPS
    out = eng.psi
    assert out.bc == 'infinite'
    assert abs(model.energy(out) - e_exact) < 1e-4


def test_idmrg_exact_energy_formula():
    assert abs(tfi_exact_infinite_gs_energy(1.0, 1.0) - (-4 / np.pi)) < 1e-12
    assert abs(tfi_exact_infinite_gs_energy(1.0, 0.0) - (-1.0)) < 1e-12
    assert abs(tfi_exact_infinite_gs_energy(0.0, 2.5) - (-2.5)) < 1e-12


@pytest.mark.slow
def test_idmrg_heisenberg_critical():
    """Critical Heisenberg chain vs Bethe ansatz e = 1/4 - ln 2 (truncation-
    limited accuracy at chi=48)."""
    model = HeisenbergModel(L=2, conserve='Sz', block_backend='numpy',
                            bc='infinite')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1],
                                       backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi, model, chi_max=48, eps=1e-12)
    e = eng.run(n_steps=300, tol=1e-11)
    assert abs(e - model.exact_infinite_gs_energy()) < 1e-5


def test_infinite_product_state_charge_check():
    model = HeisenbergModel(L=2, conserve='Sz', block_backend='numpy',
                            bc='infinite')
    with pytest.raises(ValueError, match='trivial charge'):
        SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                     backend=model.backend, bc='infinite')


@pytest.mark.slow
def test_idmrg_su2_nonabelian():
    """Non-abelian (SU(2) fusion-tree backend) iDMRG on the infinite Heisenberg
    chain converges to the Bethe-ansatz density (truncation-limited)."""
    model = HeisenbergModel(L=2, conserve='SU(2)', block_backend='numpy',
                            bc='infinite')
    psi = SimpleMPS.from_singlet_pairs(model.site_legs[0], 2,
                                       backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi, model, chi_max=16, eps=1e-10)
    e = eng.run(n_steps=80, tol=1e-9)
    assert abs(e - model.exact_infinite_gs_energy()) < 3e-4


def test_correlation_length():
    """Transfer-matrix correlation length of the infinite TFI vs the exact
    xi = 1/ln(g) (disordered phase; chi-limited accuracy)."""
    for g, tol in ((1.5, 0.05), (2.0, 0.04)):
        model = TFIModel(L=2, J=1.0, g=g, conserve='parity',
                         block_backend='numpy', bc='infinite')
        psi = SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                           backend=model.backend, bc='infinite')
        eng = iDMRGEngine(psi, model, chi_max=24, eps=1e-12)
        eng.run(n_steps=200, tol=1e-13)
        xi = eng.psi.correlation_length()
        xi_exact = 1.0 / np.log(g)
        assert abs(xi - xi_exact) / xi_exact < tol, (g, xi, xi_exact)


def test_canonicalize_infinite():
    """Window canonicalization restores exact B form of the iDMRG unit cell;
    bond energies then agree with the exact density to machine precision."""
    from cyten_tpu.tensors import SymmetricTensor, dagger, norm, tdot

    g = 2.0
    model = TFIModel(L=2, J=1.0, g=g, conserve='parity', block_backend='numpy',
                     bc='infinite')
    psi0 = SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                        backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi0, model, chi_max=24, eps=1e-12)
    eng.run(n_steps=200, tol=1e-13)
    psi = eng.psi
    psi.canonicalize_infinite(n_cells=16)
    for B in psi.Bs:
        E = tdot(B, dagger(B), ['p', 'vR'], ['p*', 'vR*'])
        eye = SymmetricTensor.from_eye([B.get_leg_co_domain('vL')],
                                       backend=B.backend, labels=E.labels)
        assert float(norm(E + (-1.) * eye)) < 1e-10
    e = model.energy(psi)
    assert abs(e - tfi_exact_infinite_gs_energy(1.0, g)) < 1e-10


@pytest.mark.slow
def test_itebd_ground_state():
    """iTEBD (imaginary time, dt schedule, window re-canonicalization) reaches
    the exact infinite TFI energy density."""
    from cyten_tpu.algorithms.tebd import TEBDEngine

    g = 1.5
    model = TFIModel(L=2, J=1.0, g=g, conserve='parity', block_backend='numpy',
                     bc='infinite')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                       backend=model.backend, bc='infinite')
    for dt, n in [(0.1, 100), (0.02, 200), (0.005, 300)]:
        eng = TEBDEngine(psi, model, dt=dt, chi_max=24, imaginary=True,
                         canonicalize_every=5)
        eng.run(n)
    assert abs(eng.energy() - tfi_exact_infinite_gs_energy(1.0, g)) < 1e-8
