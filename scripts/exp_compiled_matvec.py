"""Experiment: gather-compiled DMRG matvec on the per-coupled-sector (fusion-tree)
layout for U(1).

Hypothesis: the abelian block-sparse matvec is op-count/HBM-bound (176 GEMMs, ~1700
HLO ops, 2.4 GB accessed). Storing tensors per coupled sector (one matrix per fused
charge) and lowering every structural op (permute_legs) to ONE precomputed gather per
block should cut op count ~10x and traffic ~2.5x.

Method: run the real tdot chain once on the numpy fusion-tree backend with
"index tracer" data (entries = global flat positions) to extract, for each
structural stage, the gather indices; then build a jitted function that only does
gathers + per-sector GEMMs. Validate numerics against the reference chain, then time.
"""

import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

import cyten_tpu as ct
from cyten_tpu.backends.fusion_tree import FusionTreeBackend
from cyten_tpu.tensors import permute_legs, tdot
from bench import build_workload


def flat_size(t):
    return sum(b.size for b in t.data.blocks)


def tracer_like(t):
    """Same structure as t, blocks filled with global flat indices (as float64)."""
    res = t.copy(deep=True)
    off = 0
    blocks = []
    for b in res.data.blocks:
        n = b.size
        blocks.append(np.arange(off, off + n, dtype=np.float64).reshape(b.shape))
        off += n
    res.data.blocks = blocks
    from cyten_tpu.dtypes import Dtype

    res.data.dtype = Dtype.float64
    res.dtype = Dtype.float64
    return res


def gather_plan(fn, template):
    """Indices such that applying fn == gathering from the flat input blocks.

    Requires fn to be an entry permutation with coefficients (abelian permutes).
    Returns (out_template, [(idx_array, coeff_array or None) per out block]).
    """
    tr = tracer_like(template)
    out_idx = fn(tr)
    ones = template.copy(deep=True)
    ones.data.blocks = [np.ones_like(np.asarray(b), dtype=np.float64)
                        for b in ones.data.blocks]
    from cyten_tpu.dtypes import Dtype

    ones.data.dtype = Dtype.float64
    ones.dtype = Dtype.float64
    out_coeff = fn(ones)
    plans = []
    sentinel = flat_size(template)  # flat vector gets one extra 0.0 appended
    for bi, bc in zip(out_idx.data.blocks, out_coeff.data.blocks):
        bi = np.asarray(bi)
        bc = np.asarray(bc)
        zero = bc == 0  # slots with no source entry (block absent upstream)
        safe = np.where(zero, 1.0, bc)
        idx = np.where(zero, sentinel, np.round(bi / safe)).astype(np.int64)
        nontrivial = ~np.allclose(np.where(zero, 1.0, bc), 1.0)
        coeff = np.where(zero, 1.0, bc) if nontrivial else None
        plans.append((idx, coeff))
    return out_idx, plans


def main():
    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    ftb = FusionTreeBackend(ct.get_block_backend('numpy'))
    LP, RP, W1, W2, theta = build_workload(ftb, chi=chi)

    # ---- stage decomposition of the matvec (planar chain) ----
    # 1. thetaP: [p0,p1,vR | vL],  LP_P: [vR | wR, vR*(as domain)] etc.
    # We let the existing tdot do the leg bookkeeping, but we reify each permute.
    # tdot(theta, LP, vL, vR) = compose(permute(theta -> dom [vL]), permute(LP -> cod [vR]))
    stages = []

    def traced_tdot(a, b, legs_a, legs_b):
        # mirror what tdot does: bring contracted legs of a to the domain (reversed),
        # of b to the codomain
        ia = a.get_leg_idcs(legs_a)
        ib = b.get_leg_idcs(legs_b)
        rest_a = [n for n in range(a.num_legs) if n not in ia]
        rest_b = [n for n in range(b.num_legs) if n not in ib]
        aP = lambda t: permute_legs(t, codomain=rest_a, domain=ia[::-1])
        # a.domain left-to-right is ia reversed; b.codomain must pair in that order
        bP = lambda t: permute_legs(t, codomain=ib[::-1], domain=rest_b[::-1])
        return aP, bP

    t0 = time.perf_counter()
    x1 = tdot(theta, LP, 'vL', 'vR')
    print(f'  x1 done {time.perf_counter()-t0:.1f}s', flush=True)
    x2 = tdot(x1, W1, ['p0', 'wR'], ['p0*', 'wL'])
    print(f'  x2 done {time.perf_counter()-t0:.1f}s', flush=True)
    x3 = tdot(x2, W2, ['p1', 'wR'], ['p1*', 'wL'])
    x4 = tdot(x3, RP, ['vR', 'wR'], ['vL', 'wL'])
    x5 = x4.relabelled({'vR*': 'vL', 'vL*': 'vR'})
    ref_out = permute_legs(x5, codomain=['vL', 'p0', 'p1'], domain=['vR'])
    print(f'host reference chain: {time.perf_counter() - t0:.2f} s')

    # ---- build gather plans for every structural op ----
    # operand-side permutes for each tdot + final permute; constants pre-permuted.
    plans = {}

    def plan_stage(name, fn, template):
        out, p = gather_plan(fn, template)
        plans[name] = (p, out)
        return out

    aP1, bP1 = traced_tdot(theta, LP, ['vL'], ['vR'])
    thetaP = plan_stage('theta1', aP1, theta)[1] if False else None
    # theta-side permutes are per-iteration; constants once:
    t1 = time.perf_counter()
    thP = plan_stage('th1', aP1, theta)
    print(f'  plan th1 {time.perf_counter()-t1:.1f}s', flush=True)
    LPP = bP1(LP)

    from cyten_tpu.tensors import compose

    y1 = compose(aP1(theta), LPP)
    aP2, bP2 = traced_tdot(y1, W1, ['p0', 'wR'], ['p0*', 'wL'])
    y1P = plan_stage('th2', aP2, y1)
    W1P = bP2(W1)
    y2 = compose(aP2(y1), W1P)
    aP3, bP3 = traced_tdot(y2, W2, ['p1', 'wR'], ['p1*', 'wL'])
    y2P = plan_stage('th3', aP3, y2)
    W2P = bP3(W2)
    y3 = compose(aP3(y2), W2P)
    aP4, bP4 = traced_tdot(y3, RP, ['vR', 'wR'], ['vL', 'wL'])
    y3P = plan_stage('th4', aP4, y3)
    RPP = bP4(RP)
    y4 = compose(aP4(y3), RPP)

    def final_perm(t):
        t = t.relabelled({'vR*': 'vL', 'vL*': 'vR'})
        return permute_legs(t, codomain=['vL', 'p0', 'p1'], domain=['vR'])

    y5 = plan_stage('th5', final_perm, y4)

    # sanity: gather plans reproduce the host chain
    def apply_plan_np(plans_out, flat):
        p, out_t = plans_out
        return [flat[idx] * (c if c is not None else 1.0) for idx, c in p]

    # ---- jitted gather+GEMM matvec ----
    import jax
    import jax.numpy as jnp

    def to_jax_blocks(t):
        return [jnp.asarray(np.asarray(b), dtype=jnp.float32) for b in t.data.blocks]

    # matched GEMM pairing per compose stage: block_inds give (i_cod, j_dom); pairing
    # on equal coupled sector of a.domain and b.codomain == row match of sectors.
    def gemm_pairs(a, b):
        # a blocks [i, j], b blocks [k, l]: contract where a.domain sector j matches
        # b.codomain sector k (same coupled sector decomposition index spaces)
        ja = {int(j): n for n, (i, j) in enumerate(a.data.block_inds)}
        kb = {int(k): m for m, (k, l) in enumerate(b.data.block_inds)}
        dom_sectors = a.domain.sector_decomposition
        cod_sectors = b.codomain.sector_decomposition
        lookup = {tuple(c.tolist()): m for m, c in enumerate(cod_sectors)}
        pairs = []
        for n, (i, j) in enumerate(a.data.block_inds):
            m = kb.get(lookup.get(tuple(dom_sectors[int(j)].tolist())))
            if m is not None:
                pairs.append((n, m))
        return pairs

    pairs1 = gemm_pairs(aP1(theta), LPP)
    pairs2 = gemm_pairs(aP2(y1), W1P)
    pairs3 = gemm_pairs(aP3(y2), W2P)
    pairs4 = gemm_pairs(aP4(y3), RPP)

    consts = [to_jax_blocks(t) for t in (LPP, W1P, W2P, RPP)]
    all_plans = [plans[f'th{i}'][0] for i in range(1, 6)]
    all_pairs = [pairs1, pairs2, pairs3, pairs4]
    shapes = {  # out block shapes per stage for reshape after gather
        i: [np.asarray(b).shape for b in plans[f'th{i}'][1].data.blocks]
        for i in range(1, 6)
    }
    idx_arrays = [[(jnp.asarray(idx.reshape(-1)),
                    None if c is None else jnp.asarray(c.reshape(-1), jnp.float32))
                   for idx, c in p] for p in all_plans]
    for i, (p, shp) in enumerate(zip(idx_arrays, (shapes[j] for j in range(1, 6)))):
        assert len(p) == len(shp), (i, len(p), len(shp))
        for (idx, c), s in zip(p, shp):
            assert idx.size == int(np.prod(s)), (i, idx.shape, s)
    # GEMM outputs must match the plan templates' source block order/sizes
    for s, (tmpl, pairs, aP, const) in enumerate(
            [(y1, pairs1, None, None), (y2, pairs2, None, None),
             (y3, pairs3, None, None), (y4, pairs4, None, None)]):
        tmpl_sizes = [np.asarray(b).size for b in tmpl.data.blocks]
        assert len(tmpl_sizes) == len(all_pairs[s]), (s, len(tmpl_sizes),
                                                      len(all_pairs[s]))

    def gather_stage(blocks, stage):
        flat = jnp.concatenate([b.reshape(-1) for b in blocks]
                               + [jnp.zeros((1,), blocks[0].dtype)])
        out = []
        for (idx, c), shp in zip(idx_arrays[stage], shapes[stage + 1]):
            g = flat[idx]
            if c is not None:
                g = g * c
            out.append(g.reshape(shp))
        return out

    def matvec(theta_blocks):
        x = gather_stage(theta_blocks, 0)
        for s, (const, pairs) in enumerate(zip(consts, all_pairs)):
            y = [x[n] @ const[m] for (n, m) in pairs]
            if s < 3:
                x = gather_stage(y, s + 1)
            else:
                x = gather_stage(y, 4)
        return x

    @jax.jit
    def run_many(theta_blocks):
        def body(th, _):
            out = matvec(th)
            nrm = jnp.sqrt(sum(jnp.sum(b ** 2) for b in out))
            return [b / nrm for b in out], nrm

        th, nrms = jax.lax.scan(body, theta_blocks, None, length=20)
        return nrms[-1]

    # numeric validation on host path first
    th_j = to_jax_blocks(theta)
    with jax.default_matmul_precision('float32'):
        out_once = jax.jit(matvec)(th_j)
    ref_blocks = [np.asarray(b) for b in ref_out.data.blocks]
    got = [np.asarray(b) for b in out_once]
    assert len(got) == len(ref_blocks)
    err = max(np.max(np.abs(g - r)) / max(1e-30, np.max(np.abs(r)))
              for g, r in zip(got, ref_blocks))
    print(f'validation: max rel err vs reference chain = {err:.2e}')
    assert err < 1e-5

    float(run_many(th_j))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_many(th_j))
        best = min(best, (time.perf_counter() - t0) / 20)
    print(f'gather-compiled matvec: {best * 1e3:.3f} ms/iter')


if __name__ == '__main__':
    main()
