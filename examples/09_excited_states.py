"""Excited states: energy gaps via orthogonalized DMRG.

Computes the two lowest states of the even-parity sector of the transverse
field Ising chain with ``DMRGEngine(orthogonal_to=[...])`` (each bond problem
is solved in the subspace orthogonal to the previously found states, via
overlap environments and a ProjectedLinearOperator), and compares the gap to
the exact free-fermion result.

Run: python examples/09_excited_states.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_enable_x64', True)

import numpy as np

from cyten_tpu.algorithms import DMRGEngine, SimpleMPS, TFIModel


def exact_even_spectrum(L, J, g, n=2):
    """Lowest even-parity energies of the open TFI chain via sparse ED."""
    import scipy.sparse as sp
    import scipy.sparse.linalg

    sx = sp.csr_matrix(np.array([[0., 1.], [1., 0.]]))
    sz = sp.csr_matrix(np.diag([1., -1.]))
    eye = sp.identity(2, format='csr')

    def chain_op(ops, i):
        factors = [eye] * L
        for k, o in enumerate(ops):
            factors[i + k] = o
        out = factors[0]
        for f in factors[1:]:
            out = sp.kron(out, f, format='csr')
        return out

    H = sum(-J * chain_op([sx, sx], i) for i in range(L - 1))
    H = H + sum(-g * chain_op([sz], i) for i in range(L))
    P = sp.identity(2 ** L, format='csr')
    for i in range(L):
        P = P @ chain_op([sz], i)
    vals, vecs = scipy.sparse.linalg.eigsh(H, k=4 * n, which='SA')
    even = [float(v) for v, w in zip(vals, vecs.T)
            if (w @ (P @ w)) > 0]
    return sorted(even)[:n]


def main():
    L, J, g = 12, 1.0, 1.5
    # block_backend: 'numpy' for small host runs; 'jax' to jit-compile on TPU
    model = TFIModel(L=L, J=J, g=g, conserve='parity', block_backend='numpy')
    print(f'== TFI chain, L={L}, g={g}: ground state ==')
    psi0 = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                        backend=model.backend)
    E0 = DMRGEngine(psi0, model, chi_max=32, eps=1e-13).run(n_sweeps=12)

    print('== first excited state of the same parity sector ==')
    psi1 = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                        backend=model.backend)
    E1 = DMRGEngine(psi1, model, chi_max=32, eps=1e-13,
                    orthogonal_to=[psi0]).run(n_sweeps=12)

    ex0, ex1 = exact_even_spectrum(L, J, g)
    print(f'E0 = {E0:.12f}  (exact {ex0:.12f}, err {abs(E0 - ex0):.2e})')
    print(f'E1 = {E1:.12f}  (exact {ex1:.12f}, err {abs(E1 - ex1):.2e})')
    print(f'gap = {E1 - E0:.10f} (exact {ex1 - ex0:.10f})')
    print(f'|<psi1|psi0>| = {abs(psi1.overlap(psi0)):.2e}')


if __name__ == '__main__':
    main()
