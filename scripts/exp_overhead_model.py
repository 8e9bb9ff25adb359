"""Pin down the fixed per-call overhead: T(n_iter) should be affine in n_iter.

Also time a bare scalar fetch (tunnel RTT) and a no-op jit call.
"""

import sys
import time

sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def model(name, make_run, lengths=(50, 200, 800)):
    times = {}
    for n in lengths:
        run = make_run(n)
        float(run())  # compile
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run())
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n1, n2 = lengths[0], lengths[-1]
    slope = (times[n2] - times[n1]) / (n2 - n1)
    fixed = times[n1] - slope * n1
    mid = times[lengths[1]]
    pred = fixed + slope * lengths[1]
    print(f'{name}: slope {slope*1e6:8.2f} us/iter, fixed {fixed*1e3:6.1f} ms, '
          f'mid check {mid*1e3:.1f} vs pred {pred*1e3:.1f} ms', flush=True)


def matmul_run(m, k, n, dtype=jnp.float32, prec='default'):
    a0 = jnp.asarray(np.random.randn(m, k), dtype=dtype)
    b = jnp.asarray(np.random.randn(k, n), dtype=dtype)

    def make(n_iter):
        @jax.jit
        def run(a):
            def body(carry, _):
                a_s, _ = carry
                with jax.default_matmul_precision(prec):
                    c = jnp.dot(a_s, b, preferred_element_type=jnp.float32)
                nrm = jnp.sqrt(jnp.sum(c ** 2))
                return ((a0 * (1.0 / nrm)).astype(dtype), nrm), nrm
            (_, _), nrms = jax.lax.scan(body, (a, jnp.float32(1.0)), None,
                                        length=n_iter)
            return nrms[-1]
        return partial(run, a0)
    return make


if __name__ == '__main__':
    # tunnel RTT: repeated fetch of a device scalar
    x = jnp.float32(1.0) + 0
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(10):
        float(x)
    print(f'scalar fetch: {(time.perf_counter()-t0)/10*1e3:.1f} ms', flush=True)

    f = jax.jit(lambda v: v + 1.0)
    v = f(jnp.float32(0.0))
    t0 = time.perf_counter()
    for _ in range(10):
        v = float(f(jnp.float32(v)))
    print(f'tiny jit call + fetch: {(time.perf_counter()-t0)/10*1e3:.1f} ms',
          flush=True)

    model('matmul 731x731x2193 f32/default ', matmul_run(731, 731, 2193))
    model('matmul 731x731x2193 f32/float32 ',
          matmul_run(731, 731, 2193, prec='float32'))
    model('matmul 2048^3 f32/default       ', matmul_run(2048, 2048, 2048))
    model('matmul 2048^3 bf16              ',
          matmul_run(2048, 2048, 2048, dtype=jnp.bfloat16))
    model('matmul 4096^3 f32/default       ',
          matmul_run(4096, 4096, 4096), lengths=(25, 100, 400))
