"""Round-5 roofline attack, part 2: pinpoint the matvec gap and the
intercept's steady-SVD knobs (follows exp_r5_step_decomp.py).

A. Stage-prefix attribution of the chi=4096 bf16 matvec (3.02 ms vs 1.9 ms
   stream bound): time s0, s0+s1, s0+s1+s2, full chain — which stage is
   losing the bandwidth?
B. Steady-SVD knob ladder on the full step: (n_power, n_jacobi, ns_polish)
   = (1,2,2) default vs (0,2,2) / (1,1,1) / (0,1,1) — how much of the
   23.5 ms intercept do the polish stages cost?

Prints RESULTS=json at the end.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

RESULTS = {}


def slope(f, args, lens=(10, 50)):
    times = {}
    for n in lens:
        float(f(*args, n))
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            float(f(*args, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[lens[1]] - times[lens[0]]) / (lens[1] - lens[0])


def main():
    import jax
    import jax.numpy as jnp

    import bench
    import cyten_tpu as ct
    from cyten_tpu.algorithms.dmrg import _heff_matvec_impl
    from cyten_tpu.config import config
    from cyten_tpu.dtypes import Dtype
    from cyten_tpu.tensors import tdot

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache_bench')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    print('devices:', jax.devices(), flush=True)

    chi = 4096
    backend = ct.get_backend(ct.u1_symmetry, 'jax')
    LP, RP, W1, W2, theta = bench.build_workload(backend, chi=chi)
    LP, RP, W1, W2, theta = (t.to_dtype(Dtype.bfloat16)
                             for t in (LP, RP, W1, W2, theta))

    # ---- A. stage-prefix attribution ----
    def chain_prefix(n_stages):
        def run_chain(LP, RP, W1, W2, th):
            x = tdot(LP, th, 'vR', 'vL')
            if n_stages >= 2:
                x = tdot(x, W1, ['wR', 'p0'], ['wL', 'p0*'])
            if n_stages >= 3:
                x = tdot(x, W2, ['wR', 'p1'], ['wL', 'p1*'])
            if n_stages >= 4:
                x = tdot(x, RP, ['vR', 'wR'], ['vL', 'wL'])
            return x

        @functools.partial(jax.jit, static_argnums=5)
        def run(LP, RP, W1, W2, th, n):
            def body(c, _):
                x = run_chain(LP, RP, W1, W2, th)
                # fold the output back into a theta-shaped carry via a cheap
                # reduction so the scan carry has constant structure and the
                # chain cannot be dead-code-eliminated
                s = sum(jnp.sum(jnp.abs(b.astype(jnp.float32)))
                        for b in x.data.blocks)
                c2 = c.copy(deep=False)
                c2.data = c.data.__class__(
                    [b * (1. + 0. * s.astype(b.dtype)) for b in c.data.blocks],
                    c.data.block_inds, c.data.dtype, is_sorted=True)
                return c2, s
            c, ss = jax.lax.scan(body, th, None, length=n)
            return ss[-1]
        return run

    old = config.matmul_precision
    config.matmul_precision = 'default'
    try:
        for k, name in ((1, 's0'), (2, 's01'), (3, 's012'), (4, 'full')):
            t = slope(chain_prefix(k), (LP, RP, W1, W2, theta))
            RESULTS[f'matvec_prefix_{name}_ms'] = round(t * 1e3, 3)
            print(name, round(t * 1e3, 3), 'ms', flush=True)
    finally:
        config.matmul_precision = old

    # ---- B. steady-SVD knob ladder on the full step ----
    from cyten_tpu.tensors import steady as steady_mod

    def step_with_knobs(n_power, n_jacobi, ns_polish):
        defaults = steady_mod.steady_truncated_svd.__defaults__
        # (n_power, n_jacobi, ns_polish, eps, new_labels)
        steady_mod.steady_truncated_svd.__defaults__ = (
            n_power, n_jacobi, ns_polish, defaults[3], defaults[4])
        # the static bond fn is cached per (N, svd_mode); clear so the new
        # defaults are traced in
        from cyten_tpu.algorithms import dmrg as dmrg_mod
        dmrg_mod._STATIC_BOND_FN.clear()
        try:
            t_s, fl = bench.step_run(chi, n_lanczos=10, precision='default',
                                     svd_mode='steady',
                                     work_dtype='bfloat16', lengths=(2, 6))
        finally:
            steady_mod.steady_truncated_svd.__defaults__ = defaults
            dmrg_mod._STATIC_BOND_FN.clear()
        return t_s, fl

    for knobs in ((1, 2, 2), (0, 2, 2), (1, 1, 1), (0, 1, 1)):
        t_s, fl = step_with_knobs(*knobs)
        key = 'step_knobs_%d%d%d' % knobs
        RESULTS[key + '_ms'] = round(t_s * 1e3, 2)
        RESULTS[key + '_tflops'] = round(fl / t_s / 1e12, 2)
        print(key, round(t_s * 1e3, 2), 'ms', flush=True)

    print('RESULTS=' + json.dumps(RESULTS), flush=True)


if __name__ == '__main__':
    try:
        main()
    except Exception as e:
        RESULTS['error'] = f'{type(e).__name__}: {e}'[:300]
        print('RESULTS=' + json.dumps(RESULTS), flush=True)
        raise
