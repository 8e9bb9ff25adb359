"""Fibonacci golden chain: DMRG with anyons (no dense representation exists!).

Energies reproduce MPSKit.jl to 1e-13. Run: python examples/03_golden_chain.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
from cyten_tpu.algorithms.models import GoldenChainModel

L = 10
model = GoldenChainModel(L=L, block_backend='numpy')
psi = SimpleMPS.from_fusion_pairs(model.site_leg, L, backend=model.backend)
E = DMRGEngine(psi, model, chi_max=34).run(n_sweeps=8, verbose=True)
print(f'E0 = {E:.12f}   (MPSKit.jl: {model.EXACT_ENERGIES[L]:.12f})')
