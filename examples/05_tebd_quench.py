"""Real-time quench with TEBD: start from |up...up>, evolve under critical TFI.

Run: python examples/05_tebd_quench.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from cyten_tpu.algorithms import SimpleMPS, TEBDEngine, TFIModel
from cyten_tpu.tensors import SymmetricTensor

L, g, dt = 12, 1.0, 0.05
model = TFIModel(L=L, J=1., g=g, conserve='None', block_backend='numpy')
psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                   backend=model.backend)
eng = TEBDEngine(psi, model, dt=dt, chi_max=64, imaginary=False)
sz = SymmetricTensor.from_dense_block(np.diag([1., -1.]), [model.site_leg],
                                      [model.site_leg], backend=model.backend,
                                      labels=['p', 'p*'])
for step in range(20):
    eng.sweep()
    m = np.real(psi.site_expectation_value(sz, L // 2))
    print(f't = {dt * (step + 1):5.2f}   <sz_mid> = {m:+.6f}   '
          f'chi = {psi.max_chi()}   S_mid = {psi.entanglement_entropy()[L//2-1]:.4f}')
