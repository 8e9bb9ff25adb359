"""TDVP: real-time quench dynamics under the transverse-field Ising chain.

Prepares the ground state at g=2.0 with DMRG, quenches to g=1.2, and evolves
with single-site TDVP (symplectic projector splitting: energy and norm are
conserved exactly at fixed bond dimension). Prints <sigma_z> at the chain
center and the conserved energy along the trajectory.
"""

import jax

jax.config.update('jax_enable_x64', True)

import numpy as np

from cyten_tpu.algorithms import DMRGEngine, SimpleMPS, TDVPEngine, TFIModel


def main():
    L = 12
    model0 = TFIModel(L=L, J=1.0, g=2.0, conserve='parity')
    model = TFIModel(L=L, J=1.0, g=1.2, conserve='parity',
                     backend=model0.backend)
    psi = SimpleMPS.from_product_state(model0.site_legs, [0] * L,
                                       backend=model0.backend)
    DMRGEngine(psi, model0, chi_max=32, eps=1e-12).run(n_sweeps=8)
    # measure <sigma_z>/2 at the chain center (diagonal in the parity basis)
    from cyten_tpu.tensors import SymmetricTensor
    p_leg = model.site_leg
    Sz = SymmetricTensor.from_dense_block(np.diag([0.5, -0.5]), [p_leg], [p_leg],
                                          backend=model0.backend,
                                          labels=['p', 'p*'])

    eng = TDVPEngine(psi, model, dt=0.05)
    E0 = eng.energy()
    print(f't = 0.00: <Sz>_mid = {np.real(psi.site_expectation_value(Sz, L // 2)):+.6f}'
          f'   E = {E0:.10f}')
    for n in range(1, 41):
        eng.sweep()
        if n % 8 == 0:
            sz_mid = np.real(psi.site_expectation_value(Sz, L // 2))
            print(f't = {n * 0.05:.2f}: <Sz>_mid = {sz_mid:+.6f}   '
                  f'E = {eng.energy():.10f}  (drift {abs(eng.energy()-E0):.1e})')


if __name__ == '__main__':
    main()
