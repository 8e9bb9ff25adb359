"""SU(2)-symmetric Heisenberg chain: non-abelian DMRG.

The MPS stores one number per SU(2) multiplet; bond dimensions count multiplets.
Run: python examples/02_su2_heisenberg.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
from cyten_tpu.algorithms.models import HeisenbergModel

L = 12
model = HeisenbergModel(L=L, conserve='SU2', block_backend='numpy')
psi = SimpleMPS.from_singlet_pairs(model.site_leg, L, backend=model.backend)
E = DMRGEngine(psi, model, chi_max=48).run(n_sweeps=10, verbose=True)
print(f'E0 = {E:.12f}   (exact: {model.exact_finite_gs_energy():.12f})')
print('multiplet bond dims:', psi.bond_dimensions())
