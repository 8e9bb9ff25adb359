"""Finite-temperature Heisenberg chain via purification: E(T) from T=inf to T~0.

The thermal density matrix exp(-beta H) is encoded as a pure MPS on doubled
sites (physical (x) ancilla pipe legs); cooling = imaginary-time TEBD with the
PHYSICAL gates. With conserve='SU(2)' the beta=0 state is a product of
physical-ancilla singlets and the full SU(2) structure is exact at every
temperature.

Run: python examples/13_finite_temperature.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from cyten_tpu.algorithms import HeisenbergModel, PurificationMPS, PurificationTEBD

L, dt = 12, 0.025
model = HeisenbergModel(L=L, conserve='SU(2)', block_backend='numpy')
psi = PurificationMPS.from_infinite_temperature(model.site_legs,
                                                backend=model.backend)
eng = PurificationTEBD(psi, model, dt=dt, chi_max=96, eps=1e-12)


def energy():
    return sum(float(np.real(psi.bond_expectation_value(model.H_bonds[i], i)))
               for i in range(L - 1))


print(f'beta = {eng.beta:6.2f}   E = {energy():+.6f}   (T = inf)')
for _ in range(8):
    eng.run(10)  # beta += 2 * dt * 10 = 0.5
    print(f'beta = {eng.beta:6.2f}   E = {energy():+.6f}   '
          f'chi = {psi.max_chi()}')
print('T -> 0 reference: ground state energy',
      __import__('cyten_tpu.algorithms.models', fromlist=['x'])
      .heisenberg_exact_finite_gs_energy(L, 1.))
