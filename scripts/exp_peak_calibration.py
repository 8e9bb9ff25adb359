"""Calibrate achievable matmul TFLOP/s and HBM bandwidth on this device."""

import sys
import time

sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp


def bench_matmul(m, k, n, dtype, prec, n_iter=30):
    a = jnp.asarray(np.random.randn(m, k), dtype=dtype)
    b = jnp.asarray(np.random.randn(k, n), dtype=dtype)

    @jax.jit
    def run(a, b):
        def body(carry, _):
            a_s, _ = carry
            with jax.default_matmul_precision(prec):
                c = jnp.dot(a_s, b, preferred_element_type=jnp.float32)
            nrm = jnp.sqrt(jnp.sum(c ** 2))
            return ((a * (1.0 / nrm)).astype(dtype), nrm), nrm
        (_, _), nrms = jax.lax.scan(body, (a, jnp.float32(1.0)), None,
                                    length=n_iter)
        return nrms[-1]

    float(run(a, b))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(a, b))
        best = min(best, (time.perf_counter() - t0) / n_iter)
    gf = 2 * m * k * n / 1e9
    print(f'{m}x{k}x{n} {dtype.__name__:9s} prec={prec:8s}: '
          f'{best*1e3:7.3f} ms  {gf/best/1e3:7.1f} TFLOP/s', flush=True)


def bench_copy(nbytes, n_iter=30):
    n = nbytes // 4
    x = jnp.asarray(np.random.randn(n), dtype=jnp.float32)

    @jax.jit
    def run(x):
        def body(carry, _):
            x_s, _ = carry
            y = x_s * 1.0000001
            nrm = jnp.sqrt(jnp.sum(y[::1024] ** 2))
            return (y, nrm), nrm
        (_, _), nrms = jax.lax.scan(body, (x, jnp.float32(1.0)), None,
                                    length=n_iter)
        return nrms[-1]

    float(run(x))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, (time.perf_counter() - t0) / n_iter)
    print(f'copy {nbytes/1e6:.0f} MB: {best*1e3:.3f} ms  '
          f'{2*nbytes/best/1e9:.0f} GB/s (r+w)', flush=True)


if __name__ == '__main__':
    for prec in ('default', 'float32', 'highest'):
        bench_matmul(4096, 4096, 4096, jnp.float32, prec)
    bench_matmul(4096, 4096, 4096, jnp.bfloat16, 'default')
    bench_matmul(8192, 8192, 8192, jnp.bfloat16, 'default')
    bench_matmul(731, 731, 2193, jnp.float32, 'float32')
    bench_matmul(731, 731, 2193, jnp.float32, 'default')
    bench_matmul(731, 731, 2193, jnp.bfloat16, 'default')
    bench_copy(256 * 1024 * 1024)
    bench_copy(64 * 1024 * 1024)
