"""Benchmark: U(1) two-site DMRG effective-Hamiltonian matvec throughput.

The BASELINE.md north-star workload: the block-sparse tensordot chain (LP-W-W-RP
applied to a two-site wavefunction) at large bond dimension, on whatever accelerator
jax provides (TPU under the driver; CPU otherwise).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where vs_baseline is
the speedup over the reference-style per-block numpy CPU path on the same workload.
"""

import json
import os
import time

import numpy as np


def build_workload(backend, chi=2048, seed=0):
    """Random but realistically-structured U(1) DMRG bond environment + theta."""
    from cyten_tpu import ElementarySpace, SymmetricTensor, u1_symmetry

    rng = np.random.default_rng(seed)
    charges = np.arange(-4, 5)
    weights = np.exp(-0.4 * charges ** 2)
    mults = np.maximum(1, np.round(chi * weights / weights.sum()).astype(int))
    v_leg = ElementarySpace(u1_symmetry, charges[:, None], mults)
    p_leg = ElementarySpace(u1_symmetry, [[-1], [1]], [1, 1])
    w_leg = ElementarySpace.from_defining_sectors(
        u1_symmetry, np.array([[0], [2], [-2], [0], [0]]), unique_sectors=False)

    LP = SymmetricTensor.from_random_normal(
        [v_leg], [v_leg, w_leg], backend=backend,
        labels=[['vR*'], ['vR', 'wR']], rng=rng)
    RP = SymmetricTensor.from_random_normal(
        [v_leg, w_leg], [v_leg], backend=backend, labels=['vL', 'wL', 'vL*'], rng=rng)
    # leg layout matches the model MPOs (legs [wL, p, wR, p*], domain [p*, wR])
    # so the env-update composes in the fused step see the same structure
    W = SymmetricTensor.from_random_normal(
        [w_leg, p_leg], [p_leg, w_leg], backend=backend,
        labels=['wL', 'p', 'wR', 'p*'], rng=rng)
    theta = SymmetricTensor.from_random_normal(
        [v_leg, p_leg, p_leg], [v_leg], backend=backend,
        labels=['vL', 'p0', 'p1', 'vR'], rng=rng)
    W1 = W.relabelled({'p': 'p0', 'p*': 'p0*'})
    W2 = W.relabelled({'p': 'p1', 'p*': 'p1*'})
    return LP, RP, W1, W2, theta


def build_su2_workload(backend, chi_mult=512, seed=0):
    """SU(2) DMRG bond environment + theta: spins j=0..2 on the virtual leg.

    Exercises the fusion-tree backend's tree-move plans under jit (the
    recoupling is all trace-time; on device only dense slices/GEMMs remain).
    `chi_mult` counts multiplets; the state dimension is sum (2j+1) * mult.
    """
    from cyten_tpu import ElementarySpace, SymmetricTensor, su2_symmetry
    from cyten_tpu.algorithms.models import HeisenbergModel

    rng = np.random.default_rng(seed)
    jj = np.arange(5)  # 2*j = 0..4
    weights = np.exp(-0.5 * (jj / 2.0 - 0.5) ** 2)
    mults = np.maximum(1, np.round(chi_mult * weights / weights.sum()).astype(int))
    v_leg = ElementarySpace(su2_symmetry, jj[:, None], mults)
    # bulk Heisenberg MPO (built on the same backend; w-leg [j=0, j=1, j=0])
    W = HeisenbergModel(L=2, conserve='SU(2)', backend=backend,
                        bc='infinite').H_mpo[0]
    p_leg = W.get_leg_co_domain('p')
    w_leg = W.get_leg_co_domain('wL')

    LP = SymmetricTensor.from_random_normal(
        [v_leg], [v_leg, w_leg], backend=backend,
        labels=[['vR*'], ['vR', 'wR']], rng=rng)
    RP = SymmetricTensor.from_random_normal(
        [v_leg, w_leg], [v_leg], backend=backend,
        labels=[['vL', 'wL'], ['vL*']], rng=rng)
    theta = SymmetricTensor.from_random_normal(
        [v_leg, p_leg, p_leg], [v_leg], backend=backend,
        labels=['vL', 'p0', 'p1', 'vR'], rng=rng)
    W1 = W.relabelled({'p': 'p0', 'p*': 'p0*'})
    W2 = W.relabelled({'p': 'p1', 'p*': 'p1*'})
    return LP, RP, W1, W2, theta


def numpy_run(chi, n_iter=3):
    """Time the per-block numpy path and count exact GEMM FLOPs of one matvec."""
    import cyten_tpu as ct
    from cyten_tpu.tensors import tdot
    from cyten_tpu.tools.flops import tdot_flops

    backend = ct.get_backend(ct.u1_symmetry, 'numpy')
    LP, RP, W1, W2, theta = build_workload(backend, chi=chi)
    flops = tdot_flops(LP, theta, ['vR'], ['vL'])
    x = tdot(LP, theta, 'vR', 'vL')
    flops += tdot_flops(x, W1, ['wR', 'p0'], ['wL', 'p0*'])
    x = tdot(x, W1, ['wR', 'p0'], ['wL', 'p0*'])
    flops += tdot_flops(x, W2, ['wR', 'p1'], ['wL', 'p1*'])
    x = tdot(x, W2, ['wR', 'p1'], ['wL', 'p1*'])
    flops += tdot_flops(x, RP, ['vR', 'wR'], ['vL', 'wL'])

    from cyten_tpu.algorithms.dmrg import _heff_matvec_impl

    _heff_matvec_impl(LP, RP, W1, W2, theta)  # warmup
    t0 = time.perf_counter()
    for _ in range(n_iter):
        _heff_matvec_impl(LP, RP, W1, W2, theta)
    return (time.perf_counter() - t0) / n_iter, flops


def jax_run(chi, lengths=(50, 250), repeats=3, precision='float32'):
    """Time the jitted matvec chain.

    Three measurement pitfalls on TPU-behind-a-tunnel, all handled here:

    - per-call dispatch is an RPC and would dominate: the whole iteration loop runs
      on-device inside one jit (lax.scan over the matvec, theta fed back as the
      carry, normalized each step so it cannot overflow);
    - ``jax.block_until_ready`` does NOT wait on the tunnel transport (arrays are
      marked ready at dispatch): the jitted function returns a *scalar* depending on
      the full result, and fetching it to the host is the synchronization;
    - that fetch costs a ~30 ms round trip, a FIXED per-call cost that would inflate
      "time / n_iter" (measured: T(n) is affine in n with ~30-35 ms intercept,
      scripts/exp_overhead_model.py). We therefore time two scan lengths and report
      the SLOPE: t_iter = (T(n2) - T(n1)) / (n2 - n1), best-of-`repeats` each.

    `precision`: 'float32' (6-pass, ~1e-7 accurate — the headline, comparable to the
    f64-ish reference numerics) | 'tensorfloat32' | 'default' (1 bf16 pass, ~1e-3).
    """
    import jax
    import jax.numpy as jnp

    import cyten_tpu as ct
    from cyten_tpu.algorithms.dmrg import _heff_matvec_impl

    backend = ct.get_backend(ct.u1_symmetry, 'jax')
    LP, RP, W1, W2, theta = build_workload(backend, chi=chi)

    def make_run(n_iter):
        @jax.jit
        def run_many(LP, RP, W1, W2, theta):
            def body(th, _):
                out = _heff_matvec_impl(LP, RP, W1, W2, th)
                nrm = jnp.sqrt(sum(jnp.sum(jnp.abs(b) ** 2)
                                   for b in out.data.blocks))
                out.data.blocks = [b / nrm for b in out.data.blocks]
                return out, nrm

            th, nrms = jax.lax.scan(body, theta, None, length=n_iter)
            return nrms[-1]
        return run_many

    from cyten_tpu.config import config
    old_prec = config.matmul_precision
    config.matmul_precision = precision  # baked into the dots at trace time
    try:
        times = {}
        for n in lengths:
            run_many = make_run(n)
            float(run_many(LP, RP, W1, W2, theta))  # warmup/compile; fetch = sync
            best = np.inf
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(run_many(LP, RP, W1, W2, theta))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
    finally:
        config.matmul_precision = old_prec
    n1, n2 = lengths[0], lengths[-1]
    return (times[n2] - times[n1]) / (n2 - n1)


def su2_run(chi_mult=512, lengths=(50, 250), repeats=3, precision='float32'):
    """Slope-timed SU(2) matvec (fusion-tree backend) on device + numpy baseline."""
    import time

    import jax
    import jax.numpy as jnp

    import cyten_tpu as ct
    from cyten_tpu.backends.fusion_tree import FusionTreeBackend
    from cyten_tpu.algorithms.dmrg import _heff_matvec_impl

    t_np = None
    np_backend = FusionTreeBackend(ct.get_block_backend('numpy'))
    args_np = build_su2_workload(np_backend, chi_mult=chi_mult)
    _heff_matvec_impl(*args_np)  # warmup (plan construction)
    t0 = time.perf_counter()
    for _ in range(3):
        _heff_matvec_impl(*args_np)
    t_np = (time.perf_counter() - t0) / 3

    backend = FusionTreeBackend(ct.get_block_backend('jax'))
    LP, RP, W1, W2, theta = build_su2_workload(backend, chi_mult=chi_mult)

    def make_run(n_iter):
        @jax.jit
        def run_many(LP, RP, W1, W2, theta):
            def body(th, _):
                out = _heff_matvec_impl(LP, RP, W1, W2, th)
                nrm = jnp.sqrt(sum(jnp.sum(jnp.abs(b) ** 2)
                                   for b in out.data.blocks))
                out.data.blocks = [b / nrm for b in out.data.blocks]
                return out, nrm

            th, nrms = jax.lax.scan(body, theta, None, length=n_iter)
            return nrms[-1]
        return run_many

    from cyten_tpu.config import config
    old_prec = config.matmul_precision
    config.matmul_precision = precision
    try:
        times = {}
        for n in lengths:
            run_many = make_run(n)
            float(run_many(LP, RP, W1, W2, theta))
            best = np.inf
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(run_many(LP, RP, W1, W2, theta))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
    finally:
        config.matmul_precision = old_prec
    n1, n2 = lengths[0], lengths[-1]
    return (times[n2] - times[n1]) / (n2 - n1), t_np


def main():
    chi = int(os.environ.get('BENCH_CHI', '4096'))
    # headline precision is 'float32' (6-pass bf16, ~1e-7, comparable to the f64
    # reference numerics). 'tensorfloat32' (3-pass) and 'default' (1 pass, ~1e-3)
    # are the documented speed ladder — see docs/DESIGN.md.
    precision = os.environ.get('BENCH_PRECISION', 'float32')
    scenario = os.environ.get('BENCH_SCENARIO', 'u1')
    if scenario == 'su2':
        chi_mult = int(os.environ.get('BENCH_CHI_MULT', '512'))
        t_jax, t_np = su2_run(chi_mult, precision=precision)
        result = {
            'metric': f'su2_dmrg_matvec_{chi_mult}mult_ms',
            'value': round(t_jax * 1e3, 4),
            'unit': 'ms/iter',
            'vs_baseline': round(t_np / t_jax, 3),
        }
        print(json.dumps(result))
        return
    t_np, flops = numpy_run(chi)
    t_jax = jax_run(chi, precision=precision)
    result = {
        'metric': f'u1_dmrg_matvec_chi{chi}_tflops',
        'value': round(flops / t_jax / 1e12, 4),
        'unit': 'TFLOP/s',
        'vs_baseline': round(t_np / t_jax, 3),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
