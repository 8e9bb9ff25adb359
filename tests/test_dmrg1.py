"""Single-site DMRG with subspace expansion (DMRG3S), cf. algorithms/dmrg1.py.

The two-site engine's energies are the oracle here (plus exact diagonalization
references); the 1-site engine must reach them from chi=1 product states, which
is only possible if the subspace expansion grows the bond (a plain 1-site sweep
is stuck at chi=1 by construction).
"""

import numpy as np
import pytest

from cyten_tpu.algorithms import SimpleMPS
from cyten_tpu.algorithms.dmrg1 import DMRG1SEngine
from cyten_tpu.algorithms.models import (
    HeisenbergModel, TFIModel, heisenberg_exact_finite_gs_energy,
    tfi_exact_finite_gs_energy,
)


def test_dmrg1s_tfi_expand_mixer():
    L, g = 8, 1.2
    model = TFIModel(L=L, J=1.0, g=g, conserve='parity', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRG1SEngine(psi, model, chi_max=16, eps=1e-14, alpha=1e-2,
                       alpha_decay=0.2, alpha_min=1e-10)
    assert eng.mixer == 'expand'
    E = eng.run(n_sweeps=18, tol=1e-13)
    assert abs(E - tfi_exact_finite_gs_energy(L, 1.0, g)) < 1e-10
    # chi actually grew from the product state
    assert psi.max_chi() == 16
    # the expansion bookkeeping is exact: E equals the true MPS energy once
    # alpha has decayed
    assert abs(model.energy(psi) - E) < 1e-5


def test_dmrg1s_heisenberg_sz():
    L = 8
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                       backend=model.backend)
    eng = DMRG1SEngine(psi, model, chi_max=32, eps=1e-14, alpha=1e-2)
    E = eng.run(n_sweeps=12, tol=1e-13)
    assert abs(E - heisenberg_exact_finite_gs_energy(L, 1.0)) < 1e-10


@pytest.mark.slow
def test_dmrg1s_su2_density_matrix_mixer():
    """SU(2) uses the fusion-tree backend; the bond cannot be enlarged by dense
    direct sums there, so the engine auto-selects White's density-matrix mixer."""
    L = 8
    model = HeisenbergModel(L=L, conserve='SU(2)', block_backend='numpy')
    psi = SimpleMPS.from_singlet_pairs(model.site_legs[0], L,
                                       backend=model.backend)
    eng = DMRG1SEngine(psi, model, chi_max=24, eps=1e-14, alpha=1e-2)
    assert eng.mixer == 'density_matrix'
    E = eng.run(n_sweeps=12, tol=1e-13)
    assert abs(E - heisenberg_exact_finite_gs_energy(L, 1.0)) < 1e-9


def test_dmrg1s_density_matrix_mixer_abelian_crosscheck():
    """The mixer path must agree with the expansion path on abelian symmetry."""
    L = 8
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                       backend=model.backend)
    eng = DMRG1SEngine(psi, model, chi_max=32, eps=1e-14, alpha=1e-2,
                       mixer='density_matrix')
    E = eng.run(n_sweeps=12, tol=1e-13)
    assert abs(E - heisenberg_exact_finite_gs_energy(L, 1.0)) < 1e-10


def test_dmrg1s_jax_backend():
    """Jitted matvec path on the jax block backend."""
    L, g = 6, 1.5
    model = TFIModel(L=L, J=1.0, g=g, conserve='parity', block_backend='jax')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRG1SEngine(psi, model, chi_max=8, eps=1e-14, alpha=1e-2)
    E = eng.run(n_sweeps=10, tol=1e-13)
    assert abs(E - tfi_exact_finite_gs_energy(L, 1.0, g)) < 1e-9
