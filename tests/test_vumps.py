"""VUMPS (variational uniform MPS) vs exact thermodynamic-limit energies."""

import numpy as np
import pytest

from cyten_tpu.algorithms import SimpleMPS, VUMPSEngine, iDMRGEngine
from cyten_tpu.algorithms.models import (
    HeisenbergModel, TFIModel, tfi_exact_infinite_gs_energy,
)


def _warm_start(model, basis, chi, n_steps=20):
    psi = SimpleMPS.from_product_state(model.site_legs, basis,
                                       backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi, model, chi_max=chi, eps=1e-12)
    eng.run(n_steps=n_steps, tol=1e-5)
    psi = eng.psi
    psi.canonicalize_infinite(n_cells=16)
    return psi


def test_vumps_tfi_gapped():
    """From a LOOSE iDMRG warm start (20 steps), VUMPS converges the uniform
    fixed point to the exact free-fermion energy density."""
    model = TFIModel(L=2, J=1.0, g=1.5, conserve='parity',
                     block_backend='numpy', bc='infinite')
    psi = _warm_start(model, [0, 0], chi=16)
    eng = VUMPSEngine(psi, model)
    e = eng.run(max_iter=40, tol=1e-11)
    e_exact = tfi_exact_infinite_gs_energy(1.0, 1.5)
    assert abs(e - e_exact) < 1e-12
    assert eng.grad_norm < 1e-8
    # the returned state is canonical and reproduces the energy
    out = eng.psi
    assert abs(model.energy(out) - e_exact) < 1e-10


@pytest.mark.slow
def test_vumps_heisenberg_critical():
    """Critical Heisenberg vs Bethe ansatz: VUMPS converges the uniform state
    directly (no growing-window transient), truncation-limited at chi=32."""
    model = HeisenbergModel(L=2, conserve='Sz', block_backend='numpy',
                            bc='infinite')
    psi = _warm_start(model, [0, 1], chi=32, n_steps=20)
    eng = VUMPSEngine(psi, model)
    e = eng.run(max_iter=40, tol=1e-9)
    assert abs(e - model.exact_infinite_gs_energy()) < 5e-5


def test_vumps_gradient_is_variational_diagnostic():
    """The tangent-space gradient norm decreases monotonically-ish and the
    energy_estimate (lam_AC - lam_C residual) goes to zero at the fixed
    point."""
    model = TFIModel(L=2, J=1.0, g=2.0, conserve='parity',
                     block_backend='numpy', bc='infinite')
    psi = _warm_start(model, [0, 0], chi=12)
    eng = VUMPSEngine(psi, model)
    eng.run(max_iter=30, tol=1e-11)
    assert eng.grad_norm < 1e-8
    assert abs(eng.energy_estimate) < 1e-8
