"""iDMRG: ground-state energy density of infinite chains.

Runs McCulloch-style infinite DMRG on the transverse-field Ising chain and the
Heisenberg antiferromagnet and compares against exact thermodynamic-limit
results (free fermions / Bethe ansatz).
"""

import jax

jax.config.update('jax_enable_x64', True)

from cyten_tpu.algorithms import (
    SimpleMPS, iDMRGEngine, TFIModel, tfi_exact_infinite_gs_energy,
)
from cyten_tpu.algorithms.models import HeisenbergModel


def main():
    print('== infinite TFI, g = 1.5 ==')
    model = TFIModel(L=2, J=1.0, g=1.5, conserve='parity', bc='infinite')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                       backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi, model, chi_max=32, eps=1e-12)
    e = eng.run(n_steps=200, tol=1e-12)
    e_exact = tfi_exact_infinite_gs_energy(1.0, 1.5)
    print(f'e/site = {e:.12f} (exact {e_exact:.12f}, '
          f'error {abs(e - e_exact):.2e}), chi = {int(eng.S.leg.dim)}')
    print(f'half-chain entropy: {eng.psi.entanglement_entropy()[0]:.8f}')

    print('== infinite Heisenberg (critical) ==')
    model = HeisenbergModel(L=2, conserve='Sz', bc='infinite')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1],
                                       backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi, model, chi_max=64, eps=1e-12)
    e = eng.run(n_steps=400, tol=1e-11)
    e_exact = model.exact_infinite_gs_energy()  # 1/4 - ln 2
    print(f'e/site = {e:.12f} (Bethe ansatz {e_exact:.12f}, '
          f'error {abs(e - e_exact):.2e}), chi = {int(eng.S.leg.dim)}')


if __name__ == '__main__':
    main()
