"""Round-2 TPU measurement batch: everything in ONE process (one axon claim).

Items are individually try/except'd (remote compile can flake); partial results
persist to /tmp/round2_results.json after every item.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, '/root/repo')

import numpy as np

RESULTS = {}


def log(*a):
    print(*a, flush=True)


def save():
    with open('/tmp/round2_results.json', 'w') as f:
        json.dump(RESULTS, f, indent=1)


def item(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                RESULTS[name] = fn()
                RESULTS[name]['wall'] = round(time.time() - t0, 1)
                log(f'{name}: {RESULTS[name]}')
            except Exception as e:
                RESULTS[name] = {'error': f'{type(e).__name__}: {e}'}
                log(f'{name} FAILED: {e}')
                traceback.print_exc()
            save()
        return run
    return deco


def main():
    import jax

    log('devices:', jax.devices())
    from bench import (
        build_hubbard_workload, build_workload, jax_run, step_run, su2_run,
    )
    from cyten_tpu.config import config

    @item('su2_256')
    def su2_256():
        t, _ = su2_run(256, lengths=(5, 25), skip_numpy=True)
        return {'ms': round(t * 1e3, 4)}

    @item('su2_512')
    def su2_512():
        t, _ = su2_run(512, lengths=(5, 25), skip_numpy=True)
        return {'ms': round(t * 1e3, 4)}

    @item('hubbard_2048')
    def hubbard():
        t_u = jax_run(2048, lengths=(10, 50), builder=build_hubbard_workload)
        config.use_grouped_gemm = True
        try:
            t_g = jax_run(2048, lengths=(10, 50),
                          builder=build_hubbard_workload)
        finally:
            config.use_grouped_gemm = False
        return {'unrolled_ms': round(t_u * 1e3, 4),
                'grouped_ms': round(t_g * 1e3, 4)}

    @item('u1_4096_grouped')
    def u1g():
        t_u = jax_run(4096, lengths=(10, 50))
        config.use_grouped_gemm = True
        try:
            t_g = jax_run(4096, lengths=(10, 50))
        finally:
            config.use_grouped_gemm = False
        return {'unrolled_ms': round(t_u * 1e3, 4),
                'grouped_ms': round(t_g * 1e3, 4)}

    @item('step_steady_1024')
    def s1024():
        t, fl = step_run(1024, n_lanczos=10, svd_mode='steady', lengths=(2, 6))
        return {'ms': round(t * 1e3, 3), 'tflops': round(fl / t / 1e12, 3)}

    @item('step_steady_4096')
    def s4096():
        t, fl = step_run(4096, n_lanczos=10, svd_mode='steady', lengths=(2, 6))
        return {'ms': round(t * 1e3, 3), 'tflops': round(fl / t / 1e12, 3)}

    @item('step_steady_8192')
    def s8192():
        t, fl = step_run(8192, n_lanczos=10, svd_mode='steady', lengths=(2, 4))
        return {'ms': round(t * 1e3, 3), 'tflops': round(fl / t / 1e12, 3)}

    @item('step_exact_1024')
    def se1024():
        t, fl = step_run(1024, n_lanczos=10, svd_mode='exact', lengths=(2, 4))
        return {'ms': round(t * 1e3, 3), 'tflops': round(fl / t / 1e12, 3)}

    for fn in (su2_256, su2_512, hubbard, u1g, s1024, s4096, s8192, se1024):
        fn()
    log('ALL DONE')


if __name__ == '__main__':
    main()
