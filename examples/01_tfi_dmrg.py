"""Ground state of the transverse-field Ising chain with DMRG.

Run: python examples/01_tfi_dmrg.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from cyten_tpu.algorithms import DMRGEngine, SimpleMPS, TFIModel

L, g = 20, 1.5
# block_backend: 'numpy' for small host runs; 'jax' to jit-compile on TPU
model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='numpy')
psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                   backend=model.backend)
eng = DMRGEngine(psi, model, chi_max=32)
E = eng.run(n_sweeps=10, verbose=True)
print(f'E0 = {E:.12f}   (exact: {model.exact_finite_gs_energy():.12f})')
print('entanglement profile:', [round(s, 4) for s in psi.entanglement_entropy()])
