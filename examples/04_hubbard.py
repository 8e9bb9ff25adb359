"""Fermi-Hubbard chain with graded fermion statistics (no manual JW strings).

Conserves FermionNumber x U(1)_{2Sz}; DMRG stays in the initial (N, Sz) sector.
Run: python examples/04_hubbard.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
from cyten_tpu.algorithms.models import FermiHubbardModel

L, t, U = 6, 1., 4.
model = FermiHubbardModel(L=L, t=t, U=U, block_backend='numpy')
# half filling: alternating up/down
psi = SimpleMPS.from_product_state(model.site_legs, [1, 2] * (L // 2),
                                   backend=model.backend)
E = DMRGEngine(psi, model, chi_max=64).run(n_sweeps=10, verbose=True)
print(f'E0(N={L}, Sz=0) = {E:.12f}')
