"""Kitaev chain: topological superconductor ground states with DMRG.

Sweeps the chemical potential through the topological transition at mu = 2t
(for delta = t) and tracks the ground energy against the exact BdG solution
and the near-degeneracy of the two parity sectors (Majorana edge modes) in
the topological phase.

Run: python examples/10_kitaev_chain.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_enable_x64', True)

from cyten_tpu.algorithms import DMRGEngine, KitaevChainModel, SimpleMPS


def main():
    L, t, delta = 24, 1.0, 1.0
    print(f'== Kitaev chain, L={L}, t=delta={t} ==')
    print(f'{"mu":>5} {"E_dmrg":>16} {"E_bdg":>16} {"err":>9} {"splitting":>11}')
    for mu in (0.5, 1.0, 1.5, 2.5, 3.0):
        model = KitaevChainModel(L=L, t=t, delta=delta, mu=mu,
                                 block_backend='numpy')
        psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                           backend=model.backend)
        E = DMRGEngine(psi, model, chi_max=32, eps=1e-12).run(n_sweeps=12)
        E0, E1 = model.exact_finite_gs_energy(parity='both')
        err = min(abs(E - E0), abs(E - E1))
        # Majorana splitting: exponentially small in L for mu < 2t, O(1) above
        print(f'{mu:5.1f} {E:16.10f} {E0:16.10f} {err:9.1e} {E1 - E0:11.2e}')
    print('mu < 2: splitting ~ e^{-L/xi} (Majorana edge modes); '
          'mu > 2: trivial phase, O(1) gap')


if __name__ == '__main__':
    main()
