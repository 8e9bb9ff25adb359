"""Diagnose per-scan-iteration overhead vs real compute time on this device."""

import sys
import time

sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp


def bench(name, body_fn, init, n_iter, fetch=float):
    @jax.jit
    def run(x):
        (_, _), nrms = jax.lax.scan(body_fn, (x, jnp.float32(1.0)), None,
                                    length=n_iter)
        return nrms[-1]

    fetch(run(init))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(run(init))
        best = min(best, (time.perf_counter() - t0) / n_iter)
    print(f'{name} (n_iter={n_iter}): {best*1e6:9.1f} us/iter', flush=True)
    return best


def matmul_body(m, k, n):
    b = jnp.asarray(np.random.randn(k, n), dtype=jnp.float32)

    def body(carry, _):
        a, _ = carry
        c = jnp.dot(a, b, preferred_element_type=jnp.float32)
        nrm = jnp.sqrt(jnp.sum(c ** 2))
        return (a * (1.0 / nrm), nrm), nrm
    return body, jnp.asarray(np.random.randn(m, k), dtype=jnp.float32)


if __name__ == '__main__':
    # 1. trivial body: norm of a tiny array
    def tiny_body(carry, _):
        x, _ = carry
        nrm = jnp.sqrt(jnp.sum(x ** 2)) + 1e-9
        return (x * (1.0 / nrm), nrm), nrm
    bench('tiny body 128x128   ', tiny_body,
          jnp.asarray(np.random.randn(128, 128), dtype=jnp.float32), 30)
    bench('tiny body 128x128   ', tiny_body,
          jnp.asarray(np.random.randn(128, 128), dtype=jnp.float32), 300)

    # 2. small matmul at several n_iter
    body, a = matmul_body(731, 731, 2193)
    bench('matmul 731x731x2193 ', body, a, 30)
    bench('matmul 731x731x2193 ', body, a, 300)

    # 3. medium matmul
    body, a = matmul_body(2048, 2048, 2048)
    bench('matmul 2048^3       ', body, a, 30)
    bench('matmul 2048^3       ', body, a, 300)
