"""Measure the flat-storage grouped pallas GEMM against XLA's unrolled
per-pair dots (VERDICT r4 #4 keep-or-retire data).

Workloads: the stage-0 (LP . theta) GEMM lists of (a) the U(1)xU(1) Hubbard
bond environment at chi=2048 (59 sectors, many small ragged blocks — where
unrolled dispatch should hurt most) and (b) the U(1) chain at chi=8192 (few
big blocks — where unrolled dots were already measured at the roofline).
Random matrices with the workloads' EXACT per-pair (M, K, N) lists; both
paths slope-timed inside one jitted scan with a real loop dependence.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

RESULTS = {}


def stage0_gemm_list(builder, chi):
    """(M, K, N) per block pair of tdot(LP, theta, 'vR', 'vL')."""
    import cyten_tpu as ct
    import bench

    backend = ct.get_backend(bench._builder_symmetry(builder), 'numpy')
    LP, RP, W1, W2, theta = builder(backend, chi=chi)
    l1 = LP.get_leg_idcs(['vR'])
    l2 = theta.get_leg_idcs(['vL'])
    open1 = [n for n in range(LP.num_legs) if n not in l1]
    open2 = [n for n in range(theta.num_legs) if n not in l2]
    d1 = [np.asarray(LP.get_leg_co_domain(i).multiplicities)
          for i in range(LP.num_legs)]
    d2 = [np.asarray(theta.get_leg_co_domain(i).multiplicities)
          for i in range(theta.num_legs)]
    groups = {}
    for row in LP.data.block_inds:
        groups.setdefault(tuple(row[l1]), []).append(row)
    out = []
    for row2 in theta.data.block_inds:
        for row1 in groups.get(tuple(row2[l2]), ()):
            M = int(np.prod([d1[i][row1[i]] for i in open1]))
            K = int(np.prod([d1[i][row1[i]] for i in l1]))
            N = int(np.prod([d2[i][row2[i]] for i in open2]))
            out.append((M, K, N))
    return out


def measure(shapes, tag):
    import jax
    import jax.numpy as jnp

    from cyten_tpu.blocks.pallas_grouped import (
        grouped_matmul, tile_group,
    )

    rng = np.random.default_rng(0)
    As = [jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)
                      ).astype(jnp.bfloat16) for M, K, N in shapes]
    Bs = [jnp.asarray(rng.normal(size=(K, N)).astype(np.float32)
                      ).astype(jnp.bfloat16) for M, K, N in shapes]
    flops = sum(2 * M * K * N for M, K, N in shapes)
    RESULTS[f'{tag}_pairs'] = len(shapes)
    RESULTS[f'{tag}_gflops'] = round(flops / 1e9, 2)

    group = tile_group(As, Bs)
    RESULTS[f'{tag}_tiles_abc'] = [int(group.a_tiles.shape[0]),
                                   int(group.b_tiles.shape[0]),
                                   int(group.c_tile_count)]

    @functools.partial(jax.jit, static_argnums=2)
    def run_pallas(a_tiles, b_tiles, n):
        def body(at, _):
            g2 = type(group)(group.shapes, at, b_tiles, group.tables,
                             group.c_tile_count, group.c_tile_base)
            c = grouped_matmul(g2)
            s = jnp.sum(c[0].astype(jnp.float32))
            at2 = at * (1. + 1e-30 * s).astype(at.dtype)
            return at2, s
        at, ss = jax.lax.scan(body, a_tiles, None, length=n)
        return ss[-1]

    @functools.partial(jax.jit, static_argnums=2)
    def run_unrolled(As, Bs, n):
        def body(As, _):
            Cs = [jax.lax.dot_general(A, B, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32
                                      ).astype(A.dtype)
                  for A, B in zip(As, Bs)]
            s = sum(jnp.sum(C.astype(jnp.float32)) for C in Cs)
            m = (1. + 1e-30 * s).astype(As[0].dtype)
            return [A * m for A in As], s
        As, ss = jax.lax.scan(body, As, None, length=n)
        return ss[-1]

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

    t_p = slope(run_pallas, (group.a_tiles, group.b_tiles))
    RESULTS[f'{tag}_pallas_ms'] = round(t_p * 1e3, 4)
    RESULTS[f'{tag}_pallas_tflops'] = round(flops / t_p / 1e12, 2)
    print(tag, 'pallas', RESULTS[f'{tag}_pallas_ms'], 'ms',
          RESULTS[f'{tag}_pallas_tflops'], 'TF', flush=True)
    t_u = slope(run_unrolled, (As, Bs))
    RESULTS[f'{tag}_unrolled_ms'] = round(t_u * 1e3, 4)
    RESULTS[f'{tag}_unrolled_tflops'] = round(flops / t_u / 1e12, 2)
    RESULTS[f'{tag}_pallas_speedup'] = round(t_u / t_p, 3)
    print(tag, 'unrolled', RESULTS[f'{tag}_unrolled_ms'], 'ms',
          '-> speedup', RESULTS[f'{tag}_pallas_speedup'], flush=True)


def main():
    import jax

    import bench

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache_bench')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    print('devices:', jax.devices(), flush=True)

    hub = stage0_gemm_list(bench.build_hubbard_workload, 2048)
    measure(hub, 'hubbard2048_s0')
    u1_chi = int(os.environ.get('EXP_U1_CHI', '2048'))
    u1 = stage0_gemm_list(bench.build_workload, u1_chi)
    measure(u1, f'u1_{u1_chi}_s0')

    print('RESULTS=' + json.dumps(RESULTS), flush=True)


if __name__ == '__main__':
    try:
        main()
    except Exception as e:
        RESULTS['error'] = f'{type(e).__name__}: {e}'[:300]
        print('RESULTS=' + json.dumps(RESULTS), flush=True)
        raise
