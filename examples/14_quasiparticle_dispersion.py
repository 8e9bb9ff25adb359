"""Quasiparticle dispersion of the transverse-field Ising chain.

Converge the uniform ground state with VUMPS (directly at the target bond
dimension, from a random initial MPS), then scan the single-mode excitation
ansatz over momenta and compare against the exact free-fermion dispersion
omega(k) = 2 J sqrt(1 + (g/J)^2 - 2 (g/J) cos k).

Run: python examples/14_quasiparticle_dispersion.py
"""

import numpy as np

from cyten_tpu import DiagonalTensor, ElementarySpace, SymmetricTensor
from cyten_tpu.algorithms import ExcitationEngine, SimpleMPS, VUMPSEngine
from cyten_tpu.algorithms.models import TFIModel, tfi_exact_infinite_gs_energy


def main(g=1.5, chi=16):
    model = TFIModel(L=1, J=1., g=g, conserve='None', block_backend='numpy',
                     bc='infinite')
    sym = model.site_leg.symmetry
    v = ElementarySpace(sym, sym.trivial_sector[None, :], [chi])
    rng = np.random.default_rng(0)
    B = SymmetricTensor.from_random_normal(
        [v, model.site_leg], [v], backend=model.backend,
        labels=['vL', 'p', 'vR'], rng=rng)
    S = DiagonalTensor.from_eye(v, backend=model.backend, labels=['vL', 'vL*'])
    psi = SimpleMPS([B], [S], bc='infinite')
    psi.canonicalize_infinite()

    eng = VUMPSEngine(psi, model)
    e = eng.run(max_iter=200, tol=1e-12)
    print(f'VUMPS:  e = {e:.12f}   (exact '
          f'{tfi_exact_infinite_gs_energy(1., g):.12f}, grad '
          f'{eng.grad_norm:.1e})')

    exc = ExcitationEngine(eng)
    ps = np.linspace(0.15, np.pi, 12)
    om = exc.dispersion(ps)[:, 0]
    print(f'{"k":>8} {"omega(k)":>14} {"exact":>14} {"error":>10}')
    for p, w in zip(ps, om):
        exact = 2. * np.sqrt(1. + g ** 2 - 2. * g * np.cos(p))
        print(f'{p:8.4f} {w:14.10f} {exact:14.10f} {w - exact:10.2e}')

    # spectral function of sigma^x: pole positions + single-mode weights
    sx = SymmetricTensor.from_dense_block(
        np.array([[0., 1.], [1., 0.]]), [model.site_leg], [model.site_leg],
        backend=model.backend, labels=['p', 'p*'])
    print(f'\nS^xx(k, w) single-mode poles:')
    for p in (np.pi / 2, np.pi):
        omegas, weights = exc.spectral_weights(p, sx, n_bands=3)
        print(f'k={p:.4f}: omega_1={omegas[0]:.6f}, one-particle weight '
              f'{weights[0]:.4f} (rest {weights[1:].sum():.1e})')


if __name__ == '__main__':
    main()
