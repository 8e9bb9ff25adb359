"""Integration tests: two-site DMRG vs exact diagonalization.

Mirrors the reference's strongest whole-stack check
(tests/python_tests/test_toycodes.py:39-121): ground-state energies to 1e-9.
"""

import numpy as np
import pytest

from cyten_tpu.algorithms import (
    DMRGEngine, HeisenbergModel, SimpleMPS, TFIModel,
    heisenberg_exact_finite_gs_energy, tfi_exact_finite_gs_energy,
)


@pytest.mark.parametrize('conserve', ['None', 'parity'])
def test_dmrg_tfi(conserve):
    L, J, g = 12, 1., 1.5
    model = TFIModel(L=L, J=J, g=g, conserve=conserve, block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=32, eps=1e-13)
    E = eng.run(n_sweeps=10)
    E_exact = tfi_exact_finite_gs_energy(L, J, g)
    assert abs(E - E_exact) < 1e-9
    assert abs(model.energy(psi) - E_exact) < 1e-8


@pytest.mark.parametrize('conserve', ['None', 'parity', 'Sz'])
def test_dmrg_heisenberg(conserve):
    L, J = 8, 1.
    model = HeisenbergModel(L=L, J=J, conserve=conserve, block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=32, eps=1e-13)
    E = eng.run(n_sweeps=12)
    E_exact = heisenberg_exact_finite_gs_energy(L, J)
    assert abs(E - E_exact) < 1e-9


def test_mps_measurements():
    L = 6
    model = TFIModel(L=L, g=1.0, conserve='parity', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    DMRGEngine(psi, model, chi_max=16).run(n_sweeps=6)
    # entanglement entropy is positive at criticality
    ent = psi.entanglement_entropy()
    assert len(ent) == L - 1
    assert all(s > 0.05 for s in ent[1:-1])
    # norm
    assert abs(psi.norm_squared() - 1) < 1e-10
    assert abs(psi.overlap(psi) - 1) < 1e-10
    # site expectation values of sigma_z
    import numpy as np

    from cyten_tpu.tensors import SymmetricTensor

    sz = SymmetricTensor.from_dense_block(
        np.diag([1., -1.]), [model.site_leg], [model.site_leg],
        backend=model.backend, labels=['p', 'p*'])
    vals = [psi.site_expectation_value(sz, i) for i in range(L)]
    assert all(0 < v < 1 for v in np.real(vals))
