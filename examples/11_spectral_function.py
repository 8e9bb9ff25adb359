"""Dynamical spin structure factor of the TFI chain via real-time TDVP.

Computes C(j, t) = <gs| sx_j(t) sx_c |gs> by evolving sx_c|gs> with two-site
TDVP, Fourier transforms to S(k, w), and compares the peak positions against
the exact single-quasiparticle dispersion of the transverse-field Ising chain,
eps(k) = 2 sqrt(J^2 + g^2 - 2 J g cos k).

Uses SimpleMPS.apply_local_op + TDVP2Engine (chi grows with the light cone).

Run: python examples/11_spectral_function.py   (~2-4 min on CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_enable_x64', True)

import numpy as np

from cyten_tpu import SymmetricTensor
from cyten_tpu.algorithms import DMRGEngine, SimpleMPS, TDVP2Engine
from cyten_tpu.algorithms.models import TFIModel


def main():
    L, J, g = 24, 1.0, 1.5
    T, dt = 12.0, 0.2
    model = TFIModel(L=L, J=J, g=g, conserve='None', block_backend='numpy')
    print(f'== TFI L={L}, g={g}: ground state ==')
    psi0 = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                        backend=model.backend)
    eng = DMRGEngine(psi0, model, chi_max=32, eps=1e-12)
    E0 = eng.run(n_sweeps=10)
    print(f'E0 = {E0:.10f}')

    sx = SymmetricTensor.from_dense_block(
        np.array([[0., 1.], [1., 0.]]), [model.site_leg], [model.site_leg],
        backend=model.backend, labels=['p', 'p*'])
    c = L // 2
    # bra states <gs| sx_j  (sx is hermitian & unitary)
    bras = [psi0.apply_local_op(sx, j) for j in range(L)]
    phi = psi0.apply_local_op(sx, c)

    print(f'== real-time TDVP2 to T={T} ==')
    tdvp = TDVP2Engine(phi, model, dt=dt, chi_max=48, eps=1e-10)
    n_steps = int(round(T / dt))
    C = np.zeros((n_steps + 1, L), dtype=complex)
    for j in range(L):
        C[0, j] = complex(bras[j].overlap(phi))
    for n in range(1, n_steps + 1):
        tdvp.sweep()
        if n % 10 == 0:
            print(f'  t = {n * dt:.1f}', flush=True)
        for j in range(L):
            C[n, j] = complex(bras[j].overlap(tdvp.psi)) * np.exp(1j * E0 * n * dt)
    print(f'max chi reached: {max(int(s.leg.dim) for s in tdvp.psi.Ss)}, '
          f'trunc_err {tdvp.trunc_err:.2e}')

    # S(k, w): FT over (j - c) and t (Hann window in t, cosine transform since
    # C(-t) = C(t)* for hermitian sx)
    ts = np.arange(n_steps + 1) * dt
    window = 0.5 * (1 + np.cos(np.pi * ts / T))
    ks = np.pi * np.arange(1, L + 1) / (L + 1)
    ws = np.linspace(0.5, 8.0, 751)
    S = np.zeros((len(ks), len(ws)))
    phase_j = np.exp(-1j * np.outer(ks, np.arange(L) - c))  # [k, j]
    Ck = C @ phase_j.T  # [t, k]
    for iw, w in enumerate(ws):
        # 2 Re int_0^T dt e^{i w t} C_k(t) with the window
        kern = window * np.exp(1j * w * ts)
        S[:, iw] = 2 * np.real(kern @ Ck) * dt
    eps = lambda k: 2 * np.sqrt(J ** 2 + g ** 2 - 2 * J * g * np.cos(k))
    print(f'{"k/pi":>6} {"w_peak":>8} {"eps(k)":>8} {"err":>6}')
    errs = []
    for ik in range(2, len(ks) - 2, 4):
        k = ks[ik]
        iw = int(np.argmax(S[ik]))
        w_peak = ws[iw]
        errs.append(abs(w_peak - eps(k)))
        print(f'{k / np.pi:6.3f} {w_peak:8.3f} {eps(k):8.3f} {errs[-1]:6.3f}')
    # resolution limit ~ pi/T ~ 0.26 plus finite-size effects
    assert max(errs) < 0.35, errs
    print('quasiparticle dispersion reproduced within the time-window resolution')


if __name__ == '__main__':
    main()
