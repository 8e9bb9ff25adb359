"""Experiment: the full north-star DMRG step (Lanczos + SVD + truncation + env
updates) as one on-device scan iteration — BASELINE.md's "U(1) two-site
tensordot+SVD DMRG step".

Builds the bench.py U(1) workload, freezes the bond structure (static mode), and
slope-times a scan of whole bond updates with the state fed back as the carry.
Reports: step ms, matvec-chain TFLOP/s fraction, and the SVD-only time at the same
block sizes for the roofline decomposition.

Usage: python scripts/exp_step_bench.py [chi] [n_lanczos]
"""

import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def build_step_workload(chi, seed=0):
    import cyten_tpu as ct
    from cyten_tpu import (
        DiagonalTensor, ElementarySpace, Mask, SymmetricTensor,
    )
    from cyten_tpu.algorithms.dmrg import HEffective
    from cyten_tpu.dtypes import Dtype
    from cyten_tpu.tensors import permute_legs, scalar_multiply
    from cyten_tpu.tensors.krylov_based import _close_structure

    sys.path.insert(0, '/root/repo')
    from bench import build_workload

    backend = ct.get_backend(ct.u1_symmetry, 'jax')
    LP, RP, W1, W2, theta = build_workload(backend, chi=chi, seed=seed)
    v_leg = theta.get_leg_co_domain('vL')
    p_leg = theta.get_leg_co_domain('p0')
    rng = np.random.default_rng(seed + 1)
    B1 = SymmetricTensor.from_random_normal([v_leg, p_leg], [v_leg],
                                            backend=backend,
                                            labels=['vL', 'p', 'vR'], rng=rng)
    B2 = SymmetricTensor.from_random_normal([v_leg, p_leg], [v_leg],
                                            backend=backend,
                                            labels=['vL', 'p', 'vR'], rng=rng)
    S = DiagonalTensor.from_random_uniform(v_leg, backend=backend,
                                           labels=['vL', 'vL*'], rng=rng)
    S = S + 1.5  # positive singular values, bounded pinv

    Heff = HEffective(LP, RP, W1, W2)
    closed = _close_structure(Heff, theta)
    theta_tmpl = scalar_multiply(0., closed)
    thp = permute_legs(closed, codomain=['vL', 'p0'], domain=['vR', 'p1'])
    full = ElementarySpace.from_largest_common_subspace(
        thp.codomain, thp.domain, is_dual=False)
    kept_map = {tuple(int(x) for x in s): int(m) for s, m in
                zip(v_leg.sector_decomposition, v_leg.multiplicities)}
    bb = backend.block_backend

    def func(shape, coupled):
        k = kept_map.get(tuple(int(x) for x in np.asarray(coupled)), 0)
        keep = np.zeros(shape[0], dtype=bool)
        keep[:min(k, shape[0])] = True
        return bb.as_block(keep, Dtype.bool)

    diag = DiagonalTensor.from_sector_block_func(func, full, backend=backend)
    mask = Mask.from_DiagonalTensor(diag)
    # sanity: the masked leg must reproduce v_leg so the scan carry is stable
    assert mask.small_leg == v_leg, (mask.small_leg, v_leg)
    return backend, LP, RP, W1, W2, theta, S, B1, B2, theta_tmpl, mask


def time_step(chi, n_lanczos=10, lengths=(2, 6), repeats=3,
              precision='float32', svd_mode='exact'):
    import jax
    import jax.numpy as jnp

    import cyten_tpu as ct
    from cyten_tpu.algorithms.dmrg import HEffective, _get_static_bond_fn
    from cyten_tpu.config import config
    from cyten_tpu.tensors import norm, scalar_multiply

    (backend, LP, RP, W1, W2, theta, S, B1, B2, theta_tmpl,
     mask) = build_step_workload(chi)
    impl = _get_static_bond_fn(n_lanczos, svd_mode)

    def make_run(n_iter):
        @jax.jit
        def run(LP, RP, W1, W2, S, B1, B2):
            def body(carry, _):
                S, B1, B2, LP, RP = carry
                H = HEffective(LP, RP, W1, W2)
                E, nB1, S2, B2n, LPn, RPn = impl(H, S, B1, B2, theta_tmpl, mask)
                # keep the carried values bounded: normalize environments
                LPn = scalar_multiply(1. / norm(LPn), LPn)
                RPn = scalar_multiply(1. / norm(RPn), RPn)
                S2 = S2.relabelled(['vL', 'vL*'])
                return (S2, nB1, B2n, LPn, RPn), E

            (S2, nB1, B2n, LPn, RPn), Es = jax.lax.scan(
                body, (S, B1, B2, LP, RP), None, length=n_iter)
            return Es[-1]
        return run

    old = config.matmul_precision
    config.matmul_precision = precision
    try:
        times = {}
        for n in lengths:
            run = make_run(n)
            t0 = time.perf_counter()
            float(run(LP, RP, W1, W2, S, B1, B2))  # compile + sync
            compile_wall = time.perf_counter() - t0
            best = np.inf
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(run(LP, RP, W1, W2, S, B1, B2))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
            print(f'  scan len {n}: {best:.3f}s (compile+first {compile_wall:.1f}s)',
                  flush=True)
    finally:
        config.matmul_precision = old
    n1, n2 = lengths[0], lengths[-1]
    return (times[n2] - times[n1]) / (n2 - n1)


def step_flops(chi, n_lanczos):
    """Exact GEMM FLOPs of the contraction work in one step (matvecs + env
    updates); SVD/QR FLOPs not counted (reported as overhead time)."""
    import cyten_tpu as ct
    from cyten_tpu.tools.flops import tdot_flops

    sys.path.insert(0, '/root/repo')
    from bench import build_workload

    backend = ct.get_backend(ct.u1_symmetry, 'numpy')
    LP, RP, W1, W2, theta = build_workload(backend, chi=chi)
    from cyten_tpu.tensors import tdot

    flops = tdot_flops(LP, theta, ['vR'], ['vL'])
    x = tdot(LP, theta, 'vR', 'vL')
    flops += tdot_flops(x, W1, ['wR', 'p0'], ['wL', 'p0*'])
    x = tdot(x, W1, ['wR', 'p0'], ['wL', 'p0*'])
    flops += tdot_flops(x, W2, ['wR', 'p1'], ['wL', 'p1*'])
    x = tdot(x, W2, ['wR', 'p1'], ['wL', 'p1*'])
    flops += tdot_flops(x, RP, ['vR', 'wR'], ['vL', 'wL'])
    # per Lanczos iteration 1 matvec; env updates ~ 2 matvec-equivalents
    return flops * (n_lanczos + 2)


def time_svd_only(chi, lengths=(2, 8), repeats=3):
    """SVD of the theta blocks alone (same sizes as in the step)."""
    import jax
    import jax.numpy as jnp

    sizes = []
    charges = np.arange(-4, 5)
    weights = np.exp(-0.4 * charges ** 2)
    mults = np.maximum(1, np.round(chi * weights / weights.sum()).astype(int))
    # theta combined (vL,p0)x(vR,p1) per coupled sector: rows from (q-1,+1),(q+1,-1)
    mm = {int(c): int(m) for c, m in zip(charges, mults)}
    for c in range(-5, 6):
        rows = mm.get(c - 1, 0) + mm.get(c + 1, 0)
        if rows:
            sizes.append((rows, rows))
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, len(sizes))
    blocks = [jax.random.normal(k, s, jnp.float32) for k, s in zip(keys, sizes)]

    def make_run(n_iter):
        @jax.jit
        def run(blocks):
            def body(bs, _):
                outs = [jnp.linalg.svd(b, full_matrices=False) for b in bs]
                nrm = sum(jnp.sum(s) for (_, s, _) in outs)
                return [b * (1. + 0. * nrm) for b in bs], nrm

            bs, nrms = jax.lax.scan(body, blocks, None, length=n_iter)
            return nrms[-1]
        return run

    times = {}
    for n in lengths:
        run = make_run(n)
        float(run(blocks))
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(blocks))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n1, n2 = lengths
    return (times[n2] - times[n1]) / (n2 - n1), sizes


if __name__ == '__main__':
    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_lanczos = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    modes = sys.argv[3].split(',') if len(sys.argv) > 3 else ['steady', 'exact']
    print(f'chi={chi} n_lanczos={n_lanczos}', flush=True)
    if 'svdonly' in modes:
        t_svd, sizes = time_svd_only(chi)
        print(f'svd-only: {t_svd * 1e3:.2f} ms  (blocks {sizes})', flush=True)
    fl = step_flops(chi, n_lanczos)
    for mode in modes:
        if mode == 'svdonly':
            continue
        t_step = time_step(chi, n_lanczos, svd_mode=mode)
        print(f'step[{mode}]: {t_step * 1e3:.2f} ms  contraction flops '
              f'{fl / 1e9:.2f} GF -> {fl / t_step / 1e12:.2f} TFLOP/s',
              flush=True)
