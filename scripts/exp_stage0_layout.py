"""Stage-0 (theta x LP) microbench: XLA ceiling under ideal layouts.

Variants (same 84-dot GEMM list, honest sync):
  a  nd-tensordot as the backend emits it
  b  pure 2D dots, operands pre-reshaped/transposed to [M,K]@[K,N] outside the loop
  c  b with bf16 operands, f32 accumulation
  d  b with K-minor lhs ([M,K] contracting last) vs b2 [K,M] contracting first
"""

import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

import cyten_tpu as ct
from cyten_tpu.backends import abelian as ab
from bench import build_workload
from exp_matvec_variants import extract, STAGES


def main():
    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    theta_blocks, _ = extract(chi)
    import jax
    import jax.numpy as jnp

    st = STAGES[0]
    legs1, legs2 = st['legs1'], st['legs2']
    a_keep, b_keep = st['a_keep'], st['b_keep']
    n_iter = 20

    # precompute 2D forms: lhs [M, K] (contracted last), rhs [K, N]
    lhs_perm = [tuple(a_keep + legs1), ]
    rhs = []
    for blk in st['b_blocks']:
        t = np.transpose(blk, legs2 + b_keep)
        K = int(np.prod([blk.shape[i] for i in legs2]))
        rhs.append(jnp.asarray(t.reshape(K, -1)))
    rhs_bf16 = [r.astype(jnp.bfloat16) for r in rhs]

    def make_lhs(th):
        out = []
        for blk in th:
            t = np.transpose(blk, a_keep + legs1)
            M = int(np.prod([blk.shape[i] for i in a_keep]))
            out.append(jnp.asarray(t.reshape(M, -1)))
        return out

    lhs0 = make_lhs(theta_blocks)
    lhs0_bf16 = [l.astype(jnp.bfloat16) for l in lhs0]

    def bench(name, fn, inputs, prec='float32'):
        @jax.jit
        def run_many(xs):
            def body(carry, _):
                xs_s, _ = carry
                with jax.default_matmul_precision(prec):
                    out = fn(xs_s)
                nrm = jnp.sqrt(sum(jnp.sum(b.astype(jnp.float32) ** 2)
                                   for b in out))
                scale = (1.0 / nrm)
                return ([ (b * scale).astype(b.dtype) for b in xs], nrm), nrm
            (_, _), nrms = jax.lax.scan(body, (xs, jnp.float32(1.0)), None,
                                        length=n_iter)
            return nrms[-1]
        float(run_many(inputs))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_many(inputs))
            best = min(best, (time.perf_counter() - t0) / n_iter)
        gf = sum(2 * np.prod([st['a_shapes'][n1][i] for i in a_keep + legs1])
                 * np.prod([st['b_blocks'][n2].shape[i] for i in b_keep])
                 for n1, n2 in zip(st['ia'], st['ib'])) / 1e9
        print(f'{name}: {best*1e3:.3f} ms/iter  ({gf/best/1e3:.1f} TFLOP/s)',
              flush=True)

    jb = [jnp.asarray(b) for b in st['b_blocks']]

    def fn_a(th):
        return [jnp.tensordot(th[n1], jb[n2], axes=(legs1, legs2))
                for n1, n2 in zip(st['ia'], st['ib'])]

    def fn_b(lhs):
        return [lhs[n1] @ rhs[n2] for n1, n2 in zip(st['ia'], st['ib'])]

    def fn_c(lhs):
        return [jnp.dot(lhs[n1], rhs_bf16[n2],
                        preferred_element_type=jnp.float32)
                for n1, n2 in zip(st['ia'], st['ib'])]

    th_j = [jnp.asarray(b) for b in theta_blocks]
    bench('a  nd-tensordot        ', fn_a, th_j)
    bench('b  2D ideal layout     ', fn_b, lhs0)
    bench('c  2D bf16             ', fn_c, lhs0_bf16, prec='default')
    bench('b-hi 2D f32 highest    ', fn_b, lhs0, prec='highest')
    bench('b-df 2D f32 default    ', fn_b, lhs0, prec='default')


if __name__ == '__main__':
    main()
