"""End-to-end accuracy of the full-bf16 + f32-polish DMRG protocol at scale.

VERDICT r2 #1b: the >=40%-of-peak configuration (full-bf16 step, DESIGN.md
§10) needs its accuracy quantified at production scale, not on TFI L=12
chi=32. This experiment runs the L=24 U(1) Heisenberg chain at chi=1024 with
production-sized (padded) blocks:

- ``--reference``: f64 CPU DMRG (numpy backend, chi ladder 128/256/512) — the
  quoted reference in ``bench.HEIS24_E_REF``.
- default: the TPU side via ``bench.accuracy_bf16work`` — full-bf16 sweeps
  (state + environments stored bfloat16, 1-pass matmuls, adaptive growth
  SVD), then ONE f32 polish sweep; prints the polished and unpolished energy
  errors vs the reference. Also exposed as ``BENCH_SCENARIO=accuracy``.
"""

import sys

sys.path.insert(0, '/root/repo')


def reference():
    import jax

    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    from cyten_tpu.algorithms import DMRGEngine, HeisenbergModel, SimpleMPS

    L = 24
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                       backend=model.backend)
    for chi in (128, 256, 512):
        eng = DMRGEngine(psi, model, chi_max=chi, eps=1e-14)
        E = eng.run(n_sweeps=8, tol=1e-12)
        print(f'chi={chi}: E = {E:.14f}  trunc_err={eng.trunc_err:.2e}',
              flush=True)


def main():
    from bench import HEIS24_E_REF, accuracy_bf16work

    E, E_bf16, dE = accuracy_bf16work()
    print(f'E_ref (f64 CPU)      = {HEIS24_E_REF:.14f}')
    print(f'E_bf16 (last sweep)  = {E_bf16:.14f}  dE = {abs(E_bf16 - HEIS24_E_REF):.2e}')
    print(f'E_polished (f32)     = {E:.14f}  dE = {dE:.2e}')


if __name__ == '__main__':
    if '--reference' in sys.argv:
        reference()
    else:
        main()
