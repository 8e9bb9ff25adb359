"""The TPU production recipe: every throughput lever on one DMRG run.

Stitches together the levers documented in docs/DESIGN.md on a U(1)
Heisenberg chain (small sizes so it also runs on CPU in seconds; scale
L/chi_max for a real TPU run):

1. chi bucketing (``pad_chi_multiple``): bounds jit recompiles and keeps
   block shapes MXU-aligned.
2. Growth phase: rank-adaptive warm-started truncated SVD
   (``dynamic_svd='adaptive'``) — the only QDWH factorization runs at
   kept-rank size instead of the full theta block (DESIGN §15).
3. bf16-stored MPO environments (``env_dtype='bfloat16'``): halves the HBM
   traffic of the dominant matvec reads; DMRG is variational, so the energy
   error is second order (DESIGN §10).
4. Converged phase: ``auto_static=True`` flips the engine into static mode
   once bond structures saturate — every bond update becomes one fused
   jitted program with the steady (matmul/QR-only) SVD, and ``run()`` then
   executes each half sweep as ONE ``lax.scan`` dispatch per uniform
   period-p bond run (period 2 covers the alternating charge classes of
   Sz-conserving chains; DESIGN §8b).
5. Final polish: one full-precision sweep quotes the energy at f32/f64
   accuracy (converge-then-polish, DESIGN §10).

Run: python examples/16_tpu_production_recipe.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from cyten_tpu.algorithms import DMRGEngine, HeisenbergModel, SimpleMPS
from cyten_tpu.dtypes import Dtype

# demo sizes (CPU-friendly; jit compiles dominate the demo wall time); a
# production TPU run is the same code at
L, chi = 8, 8
model = HeisenbergModel(L=L, conserve='Sz', block_backend='jax')
psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                   backend=model.backend)
eng = DMRGEngine(
    psi, model,
    chi_max=chi,
    eps=1e-12,
    pad_chi_multiple=4,            # (1) chi bucketing
    dynamic_svd='adaptive',        # (2) growth-phase truncated SVD
    env_dtype=Dtype.bfloat16,      # (3) half-width environment storage
    auto_static=True,              # (4) fused static mode + batched sweeps
    lanczos_options={'N_max': 10, 'P_tol': 1e-10},
)
E = eng.run(n_sweeps=6, tol=1e-11, verbose=True)

# (5) polish: drop the bf16 environments and re-sweep at full precision.
# Keep the bucketed bond dimension (chi bucketing may have padded past
# chi_max — truncating back down would throw away converged weight).
eng.env_dtype = None
if getattr(eng, 'static_mode', False):
    eng.static_mode = False        # polish dynamically at full precision
eng.chi_max = psi.max_chi()
eng.LPs = [t if t is None else t.to_dtype(Dtype.float64) for t in eng.LPs]
eng.RPs = [t if t is None else t.to_dtype(Dtype.float64) for t in eng.RPs]
E = eng.sweep()

# note the bf16 sweeps PRINT eigenvalues below the true ground state: with
# rounded environments the effective Hamiltonian is inconsistent at bf16-eps,
# so its per-bond eigenvalue is not variational. The polished quote is.
from cyten_tpu.algorithms.models import heisenberg_exact_finite_gs_energy

E_exact = heisenberg_exact_finite_gs_energy(L, 1.)
print(f'E0 = {E:.12f}   (exact: {E_exact:.12f}, error {abs(E - E_exact):.1e})')
print(f'   (truncation error bound this run: {eng.trunc_err:.2e})')
