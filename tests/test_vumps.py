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


def test_vumps_from_warm_start_dimerized():
    """VUMPSEngine.from_warm_start on a PERIOD-2 cell (dimerized XX chain):
    from a random/product start VUMPS can hit a local minimum here (per-site
    eigensolves never reshuffle weight between the cell's inequivalent
    bonds); the built-in iDMRG warm start lands in the right basin. Exact
    energy: free fermions with hopping alternating t1/t2."""
    import types

    from scipy.integrate import quad

    from cyten_tpu import get_backend
    from cyten_tpu.algorithms.models import mpo_from_terms, spin_half_site

    J1, J2 = 1.0, 0.6
    t1, t2 = J1 / 2, J2 / 2
    leg = spin_half_site(conserve='Sz')
    backend = get_backend(leg.symmetry, 'numpy')
    Sp = np.array([[0., 1.], [0., 0.]])
    h = 0.5 * (np.kron(Sp, Sp.T) + np.kron(Sp.T, Sp))
    W = mpo_from_terms([leg, leg], couplings=[(0, 1, h, J1), (1, 2, h, J2)],
                       bc='infinite', backend=backend)
    model = types.SimpleNamespace(H_mpo=W, bc='infinite',
                                  site_legs=[leg, leg], backend=backend)
    eng = VUMPSEngine.from_warm_start(model, initial_state=[0, 1], chi_max=24)
    e = eng.run(max_iter=80, tol=1e-11)
    e_exact = -quad(lambda k: abs(t1 + t2 * np.exp(1j * k)),
                    0, 2 * np.pi)[0] / (2 * np.pi) / 2
    assert abs(e - e_exact) < 1e-8, (e, e_exact)


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
