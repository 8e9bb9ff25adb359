"""Time structural variants of the U(1) DMRG matvec GEMM list on the TPU.

Extracts the exact per-stage block-pair plans from the real chain, then times
pure-jnp implementations (honest sync per docs/DESIGN.md §7):

  A  4-stage chain as the backend emits it (tensordot per pair)  [reproduces floor]
  A0..A2  prefixes of A (stage attribution)
  B  3-stage chain with W1*W2 pre-fused into a bond gate
  C  4-stage, mixing stages as matrices with the tiny dim leading ([3,M] layout)
  D  4-stage, mixing stages as explicit broadcast-mul-sum (VPU, no dot)

Usage: python scripts/exp_matvec_variants.py [chi] [variants...]
"""

import sys
import time
from functools import partial

sys.path.insert(0, '/root/repo')

import numpy as np

import cyten_tpu as ct
from cyten_tpu.backends import abelian as ab
from bench import build_workload

STAGES = []  # per tdot: dict with pairs, legs, shapes

_orig_tdot_data = ab.AbelianBackend.tdot_data


def record_tdot(self, a, b, legs1, legs2):
    a_bi = a.data.block_inds
    b_bi = b.data.block_inds
    a_keep = [n for n in range(a.num_legs) if n not in legs1]
    b_keep = [n for n in range(b.num_legs) if n not in legs2]
    ia, ib, out_id, n_out = ab._cached_compose_plan(
        a_bi.tobytes(), a_bi.shape, tuple(legs1), tuple(a_keep),
        b_bi.tobytes(), b_bi.shape, tuple(legs2), tuple(b_keep))
    # BlockSparseData lexsorts block_inds on construction, permuting the block
    # list out of oid order -- replays must apply the same permutation per stage
    out_rows = [None] * int(n_out)
    for n1, n2, oid in zip(ia, ib, out_id):
        if out_rows[int(oid)] is None:
            out_rows[int(oid)] = tuple(a_bi[int(n1)][a_keep]) \
                + tuple(b_bi[int(n2)][b_keep])
    perm = np.lexsort(np.array(out_rows, dtype=np.intp).T)
    STAGES.append(dict(
        ia=[int(x) for x in ia], ib=[int(x) for x in ib],
        oid=[int(x) for x in out_id], n_out=int(n_out),
        legs1=list(legs1), legs2=list(legs2),
        a_keep=a_keep, b_keep=b_keep, perm=[int(p) for p in perm],
        b_blocks=[np.asarray(blk, dtype=np.float32) for blk in b.data.blocks],
        a_blocks=[np.asarray(blk, dtype=np.float32) for blk in a.data.blocks],
        a_shapes=[np.asarray(blk).shape for blk in a.data.blocks],
    ))
    return _orig_tdot_data(self, a, b, legs1, legs2)


def extract(chi):
    ab.AbelianBackend.tdot_data = record_tdot
    backend = ct.get_backend(ct.u1_symmetry, 'numpy')
    LP, RP, W1, W2, theta = build_workload(backend, chi=chi)
    from cyten_tpu.algorithms.dmrg import _heff_matvec_impl
    out = _heff_matvec_impl(LP, RP, W1, W2, theta)
    ab.AbelianBackend.tdot_data = _orig_tdot_data
    theta_blocks = [np.asarray(b, dtype=np.float32) for b in theta.data.blocks]
    ref_blocks = [np.asarray(b, dtype=np.float32) for b in out.data.blocks]
    return theta_blocks, ref_blocks


def stage_fn(st, jnp):
    """Plain tensordot-per-pair stage, accumulating by out id."""
    legs1, legs2, a_keep = st['legs1'], st['legs2'], st['a_keep']

    def run(x_blocks):
        accum = [None] * st['n_out']
        for n1, n2, oid in zip(st['ia'], st['ib'], st['oid']):
            prod = jnp.tensordot(x_blocks[n1], st['jb'][n2],
                                 axes=(legs1, legs2))
            accum[oid] = prod if accum[oid] is None else accum[oid] + prod
        return [accum[p] for p in st['perm']]
    return run


def stage_fn_mulsum(st, jnp):
    """Mixing stage as broadcast-mul-sum over the tiny contracted dims (VPU)."""
    legs1, legs2 = st['legs1'], st['legs2']

    def run(x_blocks):
        accum = [None] * st['n_out']
        for n1, n2, oid in zip(st['ia'], st['ib'], st['oid']):
            x = x_blocks[n1]
            w = st['jb'][n2]
            # move contracted axes of x to the end, of w to the front; broadcast
            xk = [d for d in range(x.ndim) if d not in legs1]
            x_t = jnp.transpose(x, xk + list(legs1))
            wk = [d for d in range(w.ndim) if d not in legs2]
            w_t = jnp.transpose(w, list(legs2) + wk)
            nc = len(legs1)
            x_exp = x_t.reshape(x_t.shape[:x.ndim - nc] + x_t.shape[x.ndim - nc:]
                                + (1,) * (w.ndim - nc))
            prod = (x_exp * w_t.reshape((1,) * (x.ndim - nc) + w_t.shape)).sum(
                axis=tuple(range(x.ndim - nc, x.ndim)))
            accum[oid] = prod if accum[oid] is None else accum[oid] + prod
        return [accum[p] for p in st['perm']]
    return run


def bench_chain(name, make_chain, theta_blocks, ref_blocks, jax, jnp,
                prec='float32', lengths=(50, 250)):
    """Slope-based timing: the tunneled device has ~30 ms fixed per-call cost
    (RTT of the scalar fetch), so ms/iter = (T(n2) - T(n1)) / (n2 - n1)."""
    chain = make_chain()

    def make_run(n_iter):
        @jax.jit
        def run_many(th):
            def body(carry, _):
                th_s, _ = carry
                with jax.default_matmul_precision(prec):
                    out = chain(th_s)
                nrm = jnp.sqrt(sum(jnp.sum(b.astype(jnp.float32) ** 2)
                                   for b in out))
                scale = 1.0 / nrm
                return ([(b * scale).astype(b.dtype) for b in th], nrm), nrm
            (_, nrm), nrms = jax.lax.scan(body, (th, jnp.float32(1.0)), None,
                                          length=n_iter)
            return nrms[-1]
        return run_many

    th = [jnp.asarray(b) for b in theta_blocks]
    # numeric check (only meaningful when chain output matches ref structure)
    out = jax.jit(chain)(th)
    if ref_blocks is not None and len(out) == len(ref_blocks):
        tot = sum(float(jnp.sum((a.astype(jnp.float32) - jnp.asarray(r)) ** 2))
                  for a, r in zip(out, ref_blocks))
        nrm = sum(float(np.sum(r ** 2)) for r in ref_blocks)
        err = (tot / nrm) ** 0.5
    else:
        err = float('nan')
    times = {}
    for n in lengths:
        run = make_run(n)
        float(run(th))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(th))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n1, n2 = lengths[0], lengths[-1]
    slope = (times[n2] - times[n1]) / (n2 - n1)
    print(f'{name}: {slope * 1e3:.3f} ms/iter  (rel err {err:.2e})', flush=True)
    return slope


def main():
    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    which = set(sys.argv[2:]) or {'A', 'A0', 'A01', 'A012', 'D'}
    theta_blocks, ref_blocks = extract(chi)
    import jax
    import jax.numpy as jnp

    for st in STAGES:
        st['jb'] = [jnp.asarray(b) for b in st['b_blocks']]

    fns = [stage_fn(st, jnp) for st in STAGES]

    chain_A = lambda th: fns[3](fns[2](fns[1](fns[0](th))))
    out_A = [np.asarray(b) for b in jax.jit(chain_A)([jnp.asarray(b) for b in theta_blocks])]
    if 'A' in which:
        bench_chain('A  full 4-stage', lambda: chain_A,
                    theta_blocks, out_A, jax, jnp)
    if 'A0' in which:
        bench_chain('A0 stage0 only', lambda: fns[0], theta_blocks, None, jax, jnp)
    if 'A01' in which:
        bench_chain('A01 stages 0-1', lambda: lambda th: fns[1](fns[0](th)),
                    theta_blocks, None, jax, jnp)
    if 'A012' in which:
        bench_chain('A012 stages 0-2', lambda: lambda th: fns[2](fns[1](fns[0](th))),
                    theta_blocks, None, jax, jnp)
    if 'D' in which:
        d1 = stage_fn_mulsum(STAGES[1], jnp)
        d2 = stage_fn_mulsum(STAGES[2], jnp)
        bench_chain('D  mix as mul-sum', lambda: lambda th: fns[3](d2(d1(fns[0](th)))),
                    theta_blocks, out_A, jax, jnp)
    if 'P' in which:  # precision variants of the full chain
        bench_chain('A  prec=default ', lambda: chain_A, theta_blocks, out_A,
                    jax, jnp, prec='default')
        bench_chain('A  prec=highest ', lambda: chain_A, theta_blocks, out_A,
                    jax, jnp, prec='highest')
    if 'B16' in which:  # bf16 block storage
        for st in STAGES:
            st['jb'] = [b.astype(jnp.bfloat16) for b in st['jb']]
        fns16 = [stage_fn(st, jnp) for st in STAGES]
        chain_16 = lambda th: fns16[3](fns16[2](fns16[1](fns16[0](th))))
        bench_chain('A  bf16 blocks  ', lambda: chain_16,
                    [b.astype(np.float32).astype(jnp.bfloat16) if hasattr(b, 'astype') else b
                     for b in theta_blocks], out_A, jax, jnp, prec='default')

    if 'E' in which:  # small-operand-as-LHS chain: big chi dims stay minor
        # hypothesis: the 2.3x-over-traffic-floor mixing cost is layout — the
        # stage0 output's minor dim is wR(=3), so every elementwise/GEMM pass
        # runs at ~3/128 lane utilization. Putting the SMALL tensor on the lhs
        # keeps chi as the trailing (lane) dim of every intermediate.
        import cyten_tpu as ct
        from cyten_tpu.tensors import tdot as cttdot
        backend = ct.get_backend(ct.u1_symmetry, 'numpy')
        from bench import build_workload
        LP, RP, W1, W2, theta = build_workload(backend, chi=chi)
        STAGES.clear()
        ab.AbelianBackend.tdot_data = record_tdot
        x = cttdot(LP, theta, 'vR', 'vL')                    # [vR*, wR, p0, p1, vR]
        x = cttdot(W1, x, ['p0*', 'wL'], ['p0', 'wR'])       # [p0, wR, vR*, p1, vR]
        x = cttdot(W2, x, ['p1*', 'wL'], ['p1', 'wR'])       # [p1, wR, p0, vR*, vR]
        x = cttdot(x, RP, ['vR', 'wR'], ['vL', 'wL'])        # [p1, p0, vR*, vL*]
        ab.AbelianBackend.tdot_data = _orig_tdot_data
        for st in STAGES:
            st['jb'] = [jnp.asarray(b) for b in st['b_blocks']]
            st['ja'] = [jnp.asarray(b) for b in st['a_blocks']]
        # stages 0-2 have the x on the RHS: the WEIGHTS are operand a there
        def stage_fn_rhs(st):
            legs1, legs2 = st['legs1'], st['legs2']

            def run(x_blocks):
                accum = [None] * st['n_out']
                for n1, n2, oid in zip(st['ia'], st['ib'], st['oid']):
                    prod = jnp.tensordot(st['ja'][n1], x_blocks[n2],
                                         axes=(legs1, legs2))
                    accum[oid] = prod if accum[oid] is None else accum[oid] + prod
                return [accum[p] for p in st['perm']]
            return run

        e_fns = [stage_fn_rhs(STAGES[0]), stage_fn_rhs(STAGES[1]),
                 stage_fn_rhs(STAGES[2]), stage_fn(STAGES[3], jnp)]
        chain_E = lambda th: e_fns[3](e_fns[2](e_fns[1](e_fns[0](th))))
        bench_chain('E  lhs-small 4-stage', lambda: chain_E,
                    theta_blocks, None, jax, jnp)
        bench_chain('E0 stage0 only', lambda: e_fns[0], theta_blocks, None, jax, jnp)
        bench_chain('E01 stages 0-1', lambda: lambda th: e_fns[1](e_fns[0](th)),
                    theta_blocks, None, jax, jnp)
        bench_chain('E012 stages 0-2', lambda: lambda th: e_fns[2](e_fns[1](e_fns[0](th))),
                    theta_blocks, None, jax, jnp)

    if 'B' in which:  # bond gate: W1*W2 prefused (3 tdot stages)
        import cyten_tpu as ct
        from cyten_tpu.tensors import tdot as cttdot
        backend = ct.get_backend(ct.u1_symmetry, 'numpy')
        from bench import build_workload
        LP, RP, W1, W2, theta = build_workload(backend, chi=chi)
        G = cttdot(W1, W2, 'wR', 'wL')  # [wL, p0, p0*, p1, p1*, wR]

        # record the 3-stage plans by running the fused chain
        STAGES.clear()
        _ = ab.AbelianBackend.tdot_data
        ab.AbelianBackend.tdot_data = record_tdot
        x = cttdot(theta, LP, 'vL', 'vR')
        x = cttdot(x, G, ['p0', 'p1', 'wR'], ['p0*', 'p1*', 'wL'])
        x = cttdot(x, RP, ['vR', 'wR'], ['vL', 'wL'])
        ab.AbelianBackend.tdot_data = _orig_tdot_data
        for st in STAGES:
            st['jb'] = [jnp.asarray(b) for b in st['b_blocks']]
        g_fns = [stage_fn(st, jnp) for st in STAGES]
        bench_chain('B  bond-gate 3-stage', lambda: lambda th: g_fns[2](g_fns[1](g_fns[0](th))),
                    theta_blocks, None, jax, jnp)
        bench_chain('B  bond-gate default', lambda: lambda th: g_fns[2](g_fns[1](g_fns[0](th))),
                    theta_blocks, None, jax, jnp,
                    prec='default')  # NOTE: clobbers STAGES; keep last


if __name__ == '__main__':
    main()
