"""Arbitrary-range couplings with the FSM MPO builder: J1-J2 and a 2D lattice.

``mpo_from_terms`` generalizes the nearest-neighbor MPO constructions to
couplings between ANY pair of sites — the factorization bond leg of each term
is carried across the gap sites by symmetric identity passthroughs (for
fermions, the passthrough on an odd sector IS the Jordan-Wigner string).

Two classic use cases:
1. the frustrated J1-J2 Heisenberg chain, swept through the Majumdar-Ghosh
   point J2/J1 = 0.5 where the exact ground state is a product of dimers;
2. the transverse-field Ising model on an Lx x Ly square lattice, snake-mapped
   to a chain (vertical bonds become range-Ly couplings), vs dense ED.
"""

import numpy as np

from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
from cyten_tpu.algorithms.models import HeisenbergModel, TFIModel, mpo_from_terms

_sx = np.array([[0., 1.], [1., 0.]])
_sz = np.array([[1., 0.], [0., -1.]])
_Sp = np.array([[0., 1.], [0., 0.]])
_SS = (0.5 * (np.kron(_Sp, _Sp.T) + np.kron(_Sp.T, _Sp))
       + 0.25 * np.kron(_sz, _sz))


class MpoModel:
    def __init__(self, H_mpo):
        self.H_mpo = H_mpo


def j1j2_sweep():
    L = 16
    hm = HeisenbergModel(L=L, conserve='Sz', block_backend='jax')
    print(f'J1-J2 chain, L={L} (exact dimer product at J2/J1=0.5: E=-0.375 L)')
    print(f'{"J2/J1":>6} {"E/L":>12} {"S_mid":>8}')
    for ratio in (0.0, 0.25, 0.5):
        mpo = mpo_from_terms(
            [hm.site_leg] * L,
            couplings=[(i, i + 1, _SS, 1.0) for i in range(L - 1)] +
                      [(i, i + 2, _SS, ratio) for i in range(L - 2)],
            backend=hm.backend)
        psi = SimpleMPS.from_product_state(
            [hm.site_leg] * L, [i % 2 for i in range(L)], backend=hm.backend)
        E = DMRGEngine(psi, MpoModel(mpo), chi_max=48, eps=1e-10).run(n_sweeps=10)
        S = psi.entanglement_entropy()[L // 2 - 1]
        print(f'{ratio:6.2f} {E / L:12.8f} {S:8.4f}')


def tfi_2d_patch():
    Lx, Ly, g = 4, 3, 3.0
    N = Lx * Ly

    def idx(x, y):  # snake mapping: even columns up, odd columns down
        return x * Ly + (y if x % 2 == 0 else Ly - 1 - y)

    pairs = []
    for x in range(Lx):
        for y in range(Ly):
            if y + 1 < Ly:
                pairs.append(tuple(sorted((idx(x, y), idx(x, y + 1)))))
            if x + 1 < Lx:
                pairs.append(tuple(sorted((idx(x, y), idx(x + 1, y)))))

    m = TFIModel(L=N, J=1., g=g, conserve='parity', block_backend='jax')
    mpo = mpo_from_terms(
        [m.site_leg] * N,
        onsite=[(i, _sz, -g) for i in range(N)],
        couplings=[(i, j, np.kron(_sx, _sx), -1.0) for i, j in pairs],
        backend=m.backend)
    psi = SimpleMPS.from_product_state([m.site_leg] * N, [0] * N,
                                       backend=m.backend)
    E = DMRGEngine(psi, MpoModel(mpo), chi_max=64, eps=1e-10).run(n_sweeps=8)

    # dense ED reference (2^12 = 4096 states)
    H = np.zeros((2 ** N, 2 ** N))

    def op_at(op, i):
        return np.kron(np.kron(np.eye(2 ** i), op), np.eye(2 ** (N - i - 1)))

    for i, j in pairs:
        H -= op_at(_sx, i) @ op_at(_sx, j)
    for i in range(N):
        H -= g * op_at(_sz, i)
    E_exact = np.linalg.eigvalsh(H)[0]
    print(f'\n2D TFI {Lx}x{Ly} patch (snake-mapped, range-{Ly} couplings), '
          f'g={g}')
    print(f'  DMRG {E:.10f}  ED {E_exact:.10f}  err {abs(E - E_exact):.1e}')


if __name__ == '__main__':
    j1j2_sweep()
    tfi_2d_patch()
