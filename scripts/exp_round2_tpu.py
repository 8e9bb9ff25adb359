"""Round-2 TPU measurement batch: everything in ONE process (one axon claim).

Order: cheapest-compile first so partial results survive timeouts.
Writes progress lines to stdout (flush) — run with `python -u`.
"""

import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

RESULTS = {}


def log(*a):
    print(*a, flush=True)


def save():
    with open('/tmp/round2_results.json', 'w') as f:
        json.dump(RESULTS, f, indent=1)


def main():
    import jax

    log('devices:', jax.devices())
    import cyten_tpu as ct
    from bench import (
        build_hubbard_workload, build_workload, jax_run, step_run, su2_run,
    )
    from cyten_tpu.config import config

    t_all = time.time()

    # 1. steady step at chi=4096 (the north-star scale)
    for chi in (4096, 1024):
        t0 = time.time()
        t_step, flops = step_run(chi, n_lanczos=10, svd_mode='steady',
                                 lengths=(2, 6))
        RESULTS[f'step_steady_chi{chi}'] = {
            'ms': t_step * 1e3, 'tflops': flops / t_step / 1e12,
            'wall': time.time() - t0}
        log(f'step steady chi={chi}: {t_step*1e3:.2f} ms, '
            f'{flops/t_step/1e12:.2f} TFLOP/s  (wall {time.time()-t0:.0f}s)')
        save()

    # 2. hubbard matvec: unrolled vs grouped
    for chi in (2048,):
        t0 = time.time()
        t_unrolled = jax_run(chi, lengths=(10, 50),
                             builder=build_hubbard_workload)
        config.use_grouped_gemm = True
        try:
            t_grouped = jax_run(chi, lengths=(10, 50),
                                builder=build_hubbard_workload)
        finally:
            config.use_grouped_gemm = False
        RESULTS[f'hubbard_chi{chi}'] = {
            'unrolled_ms': t_unrolled * 1e3, 'grouped_ms': t_grouped * 1e3,
            'wall': time.time() - t0}
        log(f'hubbard chi={chi}: unrolled {t_unrolled*1e3:.3f} ms, '
            f'grouped {t_grouped*1e3:.3f} ms  (wall {time.time()-t0:.0f}s)')
        save()

    # 3. u1 matvec chi=4096 with grouped gemm (the 9-sector case)
    t0 = time.time()
    t_u = jax_run(4096, lengths=(10, 50))
    config.use_grouped_gemm = True
    try:
        t_g = jax_run(4096, lengths=(10, 50))
    finally:
        config.use_grouped_gemm = False
    RESULTS['u1_chi4096_grouped'] = {'unrolled_ms': t_u * 1e3,
                                     'grouped_ms': t_g * 1e3}
    log(f'u1 chi=4096 matvec: unrolled {t_u*1e3:.3f} ms, grouped {t_g*1e3:.3f} ms')
    save()

    # 4. su2 matvec 256 / 512 mults
    for cm in (256, 512):
        t0 = time.time()
        t_su2, _ = su2_run(cm, lengths=(5, 25), skip_numpy=True)
        RESULTS[f'su2_{cm}'] = {'ms': t_su2 * 1e3, 'wall': time.time() - t0}
        log(f'su2 {cm} mults: {t_su2*1e3:.3f} ms/iter (wall {time.time()-t0:.0f}s)')
        save()

    # 5. steady step chi=8192
    t0 = time.time()
    t_step, flops = step_run(8192, n_lanczos=10, svd_mode='steady',
                             lengths=(2, 4))
    RESULTS['step_steady_chi8192'] = {
        'ms': t_step * 1e3, 'tflops': flops / t_step / 1e12,
        'wall': time.time() - t0}
    log(f'step steady chi=8192: {t_step*1e3:.2f} ms, '
        f'{flops/t_step/1e12:.2f} TFLOP/s')
    save()

    # 6. exact-QDWH step at chi=1024 (for the DESIGN comparison; slow compile)
    t0 = time.time()
    t_step, flops = step_run(1024, n_lanczos=10, svd_mode='exact',
                             lengths=(2, 4))
    RESULTS['step_exact_chi1024'] = {
        'ms': t_step * 1e3, 'tflops': flops / t_step / 1e12,
        'wall': time.time() - t0}
    log(f'step exact chi=1024: {t_step*1e3:.2f} ms (wall {time.time()-t0:.0f}s)')
    save()

    log(f'ALL DONE in {time.time()-t_all:.0f}s')


if __name__ == '__main__':
    main()
