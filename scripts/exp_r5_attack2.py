"""Round-5 attack, part A fixed: stage-prefix attribution of the chi=4096
bf16 'default' matvec with a REAL loop dependence (the first attempt fed the
scan-invariant theta into the chain, so XLA hoisted the whole thing out of
the scan and the slopes measured zero).

Here the chain consumes the CARRY, and the carry is updated by a multiplier
(1 + 1e-30 * s) computed in f32 from a reduction of the chain output —
numerically exactly 1 after bf16 rounding, but not constant-foldable.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

RESULTS = {}


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


def main():
    import jax
    import jax.numpy as jnp

    import bench
    import cyten_tpu as ct
    from cyten_tpu.config import config
    from cyten_tpu.dtypes import Dtype
    from cyten_tpu.tensors import tdot

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache_bench')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    print('devices:', jax.devices(), flush=True)

    chi = int(os.environ.get('EXP_CHI', '4096'))
    backend = ct.get_backend(ct.u1_symmetry, 'jax')
    LP, RP, W1, W2, theta = bench.build_workload(backend, chi=chi)
    LP, RP, W1, W2, theta = (t.to_dtype(Dtype.bfloat16)
                             for t in (LP, RP, W1, W2, theta))

    def chain_prefix(n_stages):
        def run_chain(c):
            x = tdot(LP, c, 'vR', 'vL')
            if n_stages >= 2:
                x = tdot(W1, x, ['p0*', 'wL'], ['p0', 'wR'])
            if n_stages >= 3:
                x = tdot(W2, x, ['p1*', 'wL'], ['p1', 'wR'])
            if n_stages >= 4:
                x = tdot(x, RP, ['vR', 'wR'], ['vL', 'wL'])
            return x

        @functools.partial(jax.jit, static_argnums=1)
        def run(th, n):
            def body(c, _):
                x = run_chain(c)
                s = sum(jnp.sum(jnp.abs(b.astype(jnp.float32)))
                        for b in x.data.blocks)
                m = (1. + 1e-30 * s).astype(jnp.bfloat16)
                c2 = c.copy(deep=False)
                c2.data = c.data.__class__(
                    [b * m for b in c.data.blocks],
                    c.data.block_inds, c.data.dtype, is_sorted=True)
                return c2, s
            c, ss = jax.lax.scan(body, th, None, length=n)
            return ss[-1]
        return run

    old = config.matmul_precision
    config.matmul_precision = 'default'
    try:
        for k, name in ((1, 's0'), (2, 's01'), (3, 's012'), (4, 'full')):
            t = slope(chain_prefix(k), (theta,))
            RESULTS[f'matvec_prefix_{name}_ms'] = round(t * 1e3, 3)
            print(name, round(t * 1e3, 3), 'ms', flush=True)
    finally:
        config.matmul_precision = old

    # ---- MXU-aligned virtual leg: multiplicities rounded up to 128 ----
    # (the engine's pad_chi_multiple production feature applied to the bench
    # workload; FLOPs are counted on the padded sizes, so the TF number stays
    # honest). Does alignment move the full step?
    import bench as bench_mod

    orig_build = bench_mod.build_workload

    def build_padded(backend, chi=2048, seed=0):
        from cyten_tpu import ElementarySpace, SymmetricTensor, u1_symmetry
        rng = np.random.default_rng(seed)
        charges = np.arange(-4, 5)
        weights = np.exp(-0.4 * charges ** 2)
        mults = np.maximum(1, np.round(
            chi * weights / weights.sum()).astype(int))
        mults = -(-mults // 128) * 128  # round UP to 128
        v_leg = ElementarySpace(u1_symmetry, charges[:, None], mults)
        p_leg = ElementarySpace(u1_symmetry, [[-1], [1]], [1, 1])
        w_leg = ElementarySpace.from_defining_sectors(
            u1_symmetry, np.array([[0], [2], [-2], [0], [0]]),
            unique_sectors=False)
        LP = SymmetricTensor.from_random_normal(
            [v_leg], [v_leg, w_leg], backend=backend,
            labels=[['vR*'], ['vR', 'wR']], rng=rng)
        RP = SymmetricTensor.from_random_normal(
            [v_leg, w_leg], [v_leg], backend=backend,
            labels=['vL', 'wL', 'vL*'], rng=rng)
        W = SymmetricTensor.from_random_normal(
            [w_leg, p_leg], [p_leg, w_leg], backend=backend,
            labels=['wL', 'p', 'wR', 'p*'], rng=rng)
        th = SymmetricTensor.from_random_normal(
            [v_leg, p_leg, p_leg], [v_leg], backend=backend,
            labels=['vL', 'p0', 'p1', 'vR'], rng=rng)
        W1 = W.relabelled({'p': 'p0', 'p*': 'p0*'})
        W2 = W.relabelled({'p': 'p1', 'p*': 'p1*'})
        return LP, RP, W1, W2, th

    from cyten_tpu.algorithms import dmrg as dmrg_mod
    from cyten_tpu.tensors import steady as steady_mod

    def step_variant(tag, mixing, padded, knobs=None):
        defaults = steady_mod.steady_truncated_svd.__defaults__
        config.bond_channel_fusion = mixing
        if knobs is not None:
            steady_mod.steady_truncated_svd.__defaults__ = (
                *knobs, defaults[3], defaults[4])
        if padded:
            bench_mod.build_workload = build_padded
        dmrg_mod._STATIC_BOND_FN.clear()
        dmrg_mod._JITTED_MATVEC.clear()
        try:
            t_s, fl = bench_mod.step_run(
                chi, n_lanczos=10, precision='default', svd_mode='steady',
                work_dtype='bfloat16', lengths=(2, 6))
            RESULTS[f'step_{tag}_ms'] = round(t_s * 1e3, 2)
            RESULTS[f'step_{tag}_tflops'] = round(fl / t_s / 1e12, 2)
            print(tag, RESULTS[f'step_{tag}_ms'], 'ms',
                  RESULTS[f'step_{tag}_tflops'], 'TF', flush=True)
        except Exception as e:
            RESULTS[f'step_{tag}_ms'] = f'failed: {e}'[:200]
            print(tag, 'FAILED', e, flush=True)
        finally:
            config.bond_channel_fusion = False
            steady_mod.steady_truncated_svd.__defaults__ = defaults
            bench_mod.build_workload = orig_build
            dmrg_mod._STATIC_BOND_FN.clear()
            dmrg_mod._JITTED_MATVEC.clear()

    step_variant('mix', True, False)
    step_variant('pad128', False, True)
    step_variant('mix_pad', True, True)
    step_variant('mix_pad_111', True, True, knobs=(1, 1, 1))

    # bare matvec with the mixing on (slope): per-iteration effect isolated
    config.bond_channel_fusion = True
    dmrg_mod._JITTED_MATVEC.clear()
    try:
        from cyten_tpu.algorithms.dmrg import _heff_matvec_impl

        def make_run(n_iter):
            @jax.jit
            def run_many(LP, RP, W1, W2, theta):
                def body(th, _):
                    out = _heff_matvec_impl(LP, RP, W1, W2, th)
                    nrm = jnp.sqrt(sum(
                        jnp.sum(jnp.abs(b.astype(jnp.float32)) ** 2)
                        for b in out.data.blocks))
                    out.data.blocks = [
                        (b.astype(jnp.float32) / nrm).astype(b.dtype)
                        for b in out.data.blocks]
                    return out, nrm
                th, nrms = jax.lax.scan(body, theta, None, length=n_iter)
                return nrms[-1]
            return run_many

        config.matmul_precision = 'default'
        times = {}
        for n in (10, 50):
            f = make_run(n)
            float(f(LP, RP, W1, W2, theta))
            best = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                float(f(LP, RP, W1, W2, theta))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        RESULTS['matvec_mix_ms'] = round((times[50] - times[10]) / 40 * 1e3, 3)
        print('matvec mix:', RESULTS['matvec_mix_ms'], 'ms', flush=True)
    finally:
        config.matmul_precision = old
        config.bond_channel_fusion = False
        dmrg_mod._JITTED_MATVEC.clear()

    print('RESULTS=' + json.dumps(RESULTS), flush=True)


if __name__ == '__main__':
    try:
        main()
    except Exception as e:
        RESULTS['error'] = f'{type(e).__name__}: {e}'[:300]
        print('RESULTS=' + json.dumps(RESULTS), flush=True)
        raise
