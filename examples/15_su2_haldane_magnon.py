"""Haldane magnon with full SU(2) symmetry on the fusion-tree backend.

The spin-1 Heisenberg chain's elementary excitation is a spin-1 (triplet)
magnon with gap Delta = 0.41050 at k=pi (White & Huse, PRB 48, 3844). Here
the whole pipeline runs non-abelian: the S.S coupling is assembled from
SU(2) sector projectors, VUMPS converges the uniform ground state over
half-integer bond multiplets (the Haldane phase's edge-spin signature), and
the quasiparticle ansatz targets the spin-1 sector — one multiplet = all
three magnon polarizations at once.

Run: python examples/15_su2_haldane_magnon.py         (~5 min on one core)
"""

import numpy as np

from cyten_tpu import DiagonalTensor, ElementarySpace, SymmetricTensor, get_backend
from cyten_tpu.algorithms import ExcitationEngine, SimpleMPS, VUMPSEngine
from cyten_tpu.algorithms.models import mpo_from_terms
from cyten_tpu.symmetries import su2_symmetry


def main(chi_mults=(8, 4)):
    backend = get_backend(su2_symmetry, 'numpy')
    p = ElementarySpace(su2_symmetry, [[2]])          # spin 1
    # S.S = -2 P_{j=0} - P_{j=1} + P_{j=2}
    P = {j: SymmetricTensor.from_sector_projection(
            [p, p], [j], backend=backend, labels=['p0', 'p1', 'p1*', 'p0*'])
         for j in (0, 2, 4)}
    h = -2. * P[0] + (-1.) * P[2] + 1. * P[4]

    class Model:
        bc = 'infinite'
        H_mpo = mpo_from_terms([p], couplings=[(0, 1, h)], backend=backend,
                               bc='infinite')

    m12, m32 = chi_mults
    v = ElementarySpace(su2_symmetry, [[1], [3]], [m12, m32])
    rng = np.random.default_rng(5)
    B = SymmetricTensor.from_random_normal(
        [v, p], [v], backend=backend, labels=['vL', 'p', 'vR'], rng=rng)
    S = DiagonalTensor.from_eye(v, backend=backend, labels=['vL', 'vL*'])
    psi = SimpleMPS([B], [S], bc='infinite')
    psi.canonicalize_infinite()

    eng = VUMPSEngine(psi, Model())
    e = eng.run(max_iter=200, tol=1e-10)
    print(f'VUMPS (SU(2), chi_eff={2*m12+4*m32}): e/site = {e:.10f} '
          f'(White-Huse -1.401484038971)')

    exc = ExcitationEngine(eng, sector=[2])   # spin-1 magnon multiplet
    for k in (np.pi, 0.8 * np.pi):
        om = exc.dispersion([k])[0, 0]
        print(f'magnon omega(k={k:.4f}) = {om:.6f}'
              + ('   <- Haldane gap (lit. 0.41050)' if k == np.pi else ''))


if __name__ == '__main__':
    main()
