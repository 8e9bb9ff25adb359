"""Experiment: full-bf16 working dtype on the north-star step + int8 MXU probe.

Q1: how much of the step's remaining HBM traffic is the f32 working set
(theta carry, Lanczos iterates/basis, intermediates)? DESIGN §10 measured
bf16 *envs* (LP/RP reads) at 1.40-1.45x; this measures the FULL bf16 step
(BENCH_WORK_DTYPE path: state + MPO + envs + intermediates all stored bf16,
sticky-scalar rule keeping the chain from promoting back).

Q2: does the v5e expose a fast int8 MXU path through XLA (dot_general
int8 x int8 -> int32)? If ~2x bf16, quantized environments are the next
traffic lever; if not, retire the idea.

Run on the TPU claim, ONE client at a time (memory note axon-tpu-claim).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_int8(n=8192, iters=20):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (n, n), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (n, n), dtype=np.int8))
    ab = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.bfloat16)
    bb = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.bfloat16)

    def timed(fn, *args):
        # slope timing: chain k dots on-device, fetch a scalar
        def make(k):
            @jax.jit
            def run(x, y):
                def body(c, _):
                    c = fn(c, y)
                    return c, ()
                c, _ = jax.lax.scan(body, x, None, length=k)
                return c.ravel()[0]
            return run
        times = {}
        for k in (4, 16):
            r = make(k)
            float(r(*args))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(r(*args))
                best = min(best, time.perf_counter() - t0)
            times[k] = best
        return (times[16] - times[4]) / 12

    def dot_i8(x, y):
        o = jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # cast back so the carry keeps the int8 structure (saturating-ish)
        return (o >> 8).astype(jnp.int8)

    def dot_bf(x, y):
        o = jnp.matmul(x, y, preferred_element_type=jnp.float32)
        return (o * (1. / n)).astype(jnp.bfloat16)

    t8 = timed(dot_i8, a8, b8)
    tb = timed(dot_bf, ab, bb)
    fl = 2 * n ** 3
    print(f'int8  {n}^3 dot: {t8*1e3:.3f} ms  {fl/t8/1e12:.1f} TOP/s')
    print(f'bf16  {n}^3 dot: {tb*1e3:.3f} ms  {fl/tb/1e12:.1f} TFLOP/s')
    return t8, tb


def step_ladder(chis=(4096, 8192)):
    import bench

    for chi in chis:
        rows = []
        for label, kw in [
            ('f32 all, default-prec', dict()),
            ('bf16 envs, default-prec', dict(env_dtype='bfloat16')),
            ('bf16 WORK, default-prec', dict(work_dtype='bfloat16')),
        ]:
            t, fl = bench.step_run(chi, n_lanczos=10, precision='default',
                                   svd_mode='steady', **kw)
            rows.append((label, t * 1e3, fl / t / 1e12))
            print(f'chi={chi:5d} {label:28s} {t*1e3:8.2f} ms  '
                  f'{fl/t/1e12:6.2f} TFLOP/s', flush=True)
    return rows


if __name__ == '__main__':
    import jax
    print('devices:', jax.devices())
    probe_int8()
    step_ladder()
