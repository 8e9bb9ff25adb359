"""Round-5 step decomposition on the chip (VERDICT r4 #2: attack the chi=4096
roofline).

Questions, answered by measurement in ONE process (axon tunnel: one client at
a time):

1. Where do the chi=4096 bf16work step's ~56 ms go? n_lanczos slope gives the
   per-Lanczos-iteration cost (matvec + 3-term orthogonalization + basis
   store); the intercept is theta assembly + steady SVD + truncation + the
   two environment updates.
2. How fast is the BARE matvec at bf16 storage / 'default' precision (the
   streaming roofline of the dominant part)?
3. Does an int8-stored environment operand halve the HBM read of the big
   GEMMs (i.e. does XLA fuse convert(int8->bf16) into the dot), and what is
   the end-to-end effect worth? (per-sweep int8 env quantization lever)
4. Does Pallas lower through the axon plugin at all? (flat-buffer kernel
   feasibility gate)

Usage: python scripts/exp_r5_step_decomp.py [--quick]
Prints one JSON dict at the end.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

RESULTS = {}


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from cyten_tpu.config import config

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache_bench')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    print('devices:', jax.devices(), flush=True)

    quick = '--quick' in sys.argv

    # ---- 4. pallas availability probe (cheap, do first) ----
    try:
        from jax.experimental import pallas as pl

        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0

        x = jnp.ones((256, 256), jnp.float32)
        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
        ok = bool(abs(float(jnp.sum(y)) - 2 * 256 * 256) < 1)
        RESULTS['pallas_works'] = ok
    except Exception as e:
        RESULTS['pallas_works'] = f'no: {type(e).__name__}: {e}'[:200]
    print('pallas:', RESULTS['pallas_works'], flush=True)

    # ---- 3. int8 env operand probe ----
    # representative stage-0/3 GEMM at chi=4096: theta-side [M, K] bf16 times
    # env-side [K, N] stored int8 vs bf16. HBM-bound regime: K*N dominates.
    M, K, N = 8192, 4096, 20480

    def slope_time(f, args, lens=(8, 32)):
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

    A = jnp.ones((M, K), jnp.bfloat16)
    B16 = jnp.ones((K, N), jnp.bfloat16)
    B8 = jnp.ones((K, N), jnp.int8)

    @functools.partial(jax.jit, static_argnums=2)
    def run16(A, B, n):
        def body(c, _):
            y = jax.lax.dot_general(c, B, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return y[:, :K].astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, A, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    @functools.partial(jax.jit, static_argnums=2)
    def run8(A, B, n):
        def body(c, _):
            Bb = B.astype(jnp.bfloat16)  # ideally fused into the dot read
            y = jax.lax.dot_general(c, Bb, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return y[:, :K].astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, A, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    t16 = slope_time(run16, (A, B16), (4, 12))
    t8 = slope_time(run8, (A, B8), (4, 12))
    RESULTS['gemm_env_bf16_ms'] = round(t16 * 1e3, 3)
    RESULTS['gemm_env_int8read_ms'] = round(t8 * 1e3, 3)
    RESULTS['int8_read_speedup'] = round(t16 / t8, 3)
    print('int8 probe:', RESULTS['gemm_env_bf16_ms'],
          RESULTS['gemm_env_int8read_ms'], flush=True)

    # ---- 2. bare matvec at bf16 storage ----
    import cyten_tpu as ct
    from cyten_tpu.algorithms.dmrg import _heff_matvec_impl
    from cyten_tpu.dtypes import Dtype

    chi = 4096
    backend = ct.get_backend(ct.u1_symmetry, 'jax')
    LP, RP, W1, W2, theta = bench.build_workload(backend, chi=chi)
    LPb, RPb, W1b, W2b, thetab = (t.to_dtype(Dtype.bfloat16)
                                  for t in (LP, RP, W1, W2, theta))

    def make_run(n_iter, args):
        @jax.jit
        def run_many(LP, RP, W1, W2, theta):
            def body(th, _):
                out = _heff_matvec_impl(LP, RP, W1, W2, th)
                nrm = jnp.sqrt(sum(
                    jnp.sum(jnp.abs(b.astype(jnp.float32)) ** 2)
                    for b in out.data.blocks))
                out.data.blocks = [
                    (b.astype(jnp.float32) / nrm).astype(b.dtype)
                    for b in out.data.blocks]
                return out, nrm

            th, nrms = jax.lax.scan(body, theta, None, length=n_iter)
            return nrms[-1]
        return run_many

    old = config.matmul_precision
    config.matmul_precision = 'default'
    try:
        times = {}
        for n in (10, 50):
            f = make_run(n, None)
            float(f(LPb, RPb, W1b, W2b, thetab))
            best = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                float(f(LPb, RPb, W1b, W2b, thetab))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        t_mv = (times[50] - times[10]) / 40
        RESULTS['matvec4096_bf16_default_ms'] = round(t_mv * 1e3, 3)
    finally:
        config.matmul_precision = old
    print('bare matvec bf16:', RESULTS['matvec4096_bf16_default_ms'], 'ms',
          flush=True)

    # ---- 1. n_lanczos slope on the full step (bf16work) ----
    for n_l in ((10, 5) if not quick else (10,)):
        t_s, fl = bench.step_run(chi, n_lanczos=n_l, precision='default',
                                 svd_mode='steady', work_dtype='bfloat16',
                                 lengths=(2, 6))
        RESULTS[f'step4096_bf16work_nl{n_l}_ms'] = round(t_s * 1e3, 2)
        RESULTS[f'step4096_bf16work_nl{n_l}_tflops'] = round(
            fl / t_s / 1e12, 2)
        print(f'step nl={n_l}:', round(t_s * 1e3, 2), 'ms', flush=True)
    if not quick:
        a = RESULTS['step4096_bf16work_nl10_ms']
        b = RESULTS['step4096_bf16work_nl5_ms']
        per_lanczos = (a - b) / 5
        RESULTS['per_lanczos_iter_ms'] = round(per_lanczos, 3)
        RESULTS['intercept_ms'] = round(a - 10 * per_lanczos, 2)

        # exact (QDWH) svd mode for the SVD-part differential
        t_e, _ = bench.step_run(chi, n_lanczos=10, precision='default',
                                svd_mode='exact', work_dtype='bfloat16',
                                lengths=(2, 6))
        RESULTS['step4096_bf16work_exactsvd_ms'] = round(t_e * 1e3, 2)

    print('RESULTS=' + json.dumps(RESULTS), flush=True)


if __name__ == '__main__':
    try:
        main()
    except Exception as e:
        RESULTS['error'] = f'{type(e).__name__}: {e}'[:300]
        print('RESULTS=' + json.dumps(RESULTS), flush=True)
        raise
