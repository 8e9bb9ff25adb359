"""Round-5 attack, part 3: the pad128 regime in detail.

mix_pad_111 = 49.43 ms / 63.6 TF (36.1% of peak); the bar needs <= ~44.6 ms.
Questions: (1) does the mixing contribute anything under padding
(mix_pad == pad suggests not)? (2) where does the padded step split
(n_lanczos slope vs intercept)? (3) padded bare matvec with/without mixing;
(4) does pad_multiple=256 (larger aligned chi, more counted FLOPs) score
higher honestly?
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

RESULTS = {}


def main():
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    import cyten_tpu as ct
    from cyten_tpu.algorithms import dmrg as dmrg_mod
    from cyten_tpu.config import config
    from cyten_tpu.dtypes import Dtype
    from cyten_tpu.tensors import steady as steady_mod

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache_bench')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    print('devices:', jax.devices(), flush=True)

    chi = 4096
    orig_build = bench_mod.build_workload

    def make_padded_builder(pad):
        def build_padded(backend, chi=2048, seed=0):
            from cyten_tpu import ElementarySpace, SymmetricTensor, u1_symmetry
            rng = np.random.default_rng(seed)
            charges = np.arange(-4, 5)
            weights = np.exp(-0.4 * charges ** 2)
            mults = np.maximum(1, np.round(
                chi * weights / weights.sum()).astype(int))
            mults = -(-mults // pad) * pad
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
        return build_padded

    defaults = steady_mod.steady_truncated_svd.__defaults__

    def step_variant(tag, mixing, pad, knobs=None, n_lanczos=10):
        config.bond_channel_fusion = mixing
        if knobs is not None:
            steady_mod.steady_truncated_svd.__defaults__ = (
                *knobs, defaults[3], defaults[4])
        if pad:
            bench_mod.build_workload = make_padded_builder(pad)
        dmrg_mod._STATIC_BOND_FN.clear()
        dmrg_mod._JITTED_MATVEC.clear()
        try:
            t_s, fl = bench_mod.step_run(
                chi, n_lanczos=n_lanczos, precision='default',
                svd_mode='steady', work_dtype='bfloat16', lengths=(2, 6))
            RESULTS[f'{tag}_ms'] = round(t_s * 1e3, 2)
            RESULTS[f'{tag}_tflops'] = round(fl / t_s / 1e12, 2)
            print(tag, RESULTS[f'{tag}_ms'], 'ms',
                  RESULTS[f'{tag}_tflops'], 'TF', flush=True)
        except Exception as e:
            RESULTS[f'{tag}_ms'] = f'failed: {e}'[:200]
            print(tag, 'FAILED', e, flush=True)
        finally:
            config.bond_channel_fusion = False
            steady_mod.steady_truncated_svd.__defaults__ = defaults
            bench_mod.build_workload = orig_build
            dmrg_mod._STATIC_BOND_FN.clear()
            dmrg_mod._JITTED_MATVEC.clear()

    # 1. pad-only with reduced knobs (is the mixing dead weight under pad?)
    step_variant('pad_111', False, 128, knobs=(1, 1, 1))
    # 2. slope/intercept under the best config
    step_variant('mixpad111_nl5', True, 128, knobs=(1, 1, 1), n_lanczos=5)
    # 3. pad 256 (larger aligned chi; counted FLOPs grow faster than time?)
    step_variant('mixpad256_111', True, 256, knobs=(1, 1, 1))
    step_variant('pad256_111', False, 256, knobs=(1, 1, 1))

    # 4. padded bare matvec slope, mix on/off
    from cyten_tpu.algorithms.dmrg import _heff_matvec_impl

    backend = ct.get_backend(ct.u1_symmetry, 'jax')
    LPp, RPp, W1p, W2p, thp = make_padded_builder(128)(backend, chi=chi)
    LPp, RPp, W1p, W2p, thp = (t.to_dtype(Dtype.bfloat16)
                               for t in (LPp, RPp, W1p, W2p, thp))

    def matvec_slope(mix):
        config.bond_channel_fusion = mix
        dmrg_mod._JITTED_MATVEC.clear()

        def run_many(LP, RP, W1, W2, theta, n):
            def body(th, _):
                out = _heff_matvec_impl(LP, RP, W1, W2, th)
                nrm = jnp.sqrt(sum(
                    jnp.sum(jnp.abs(b.astype(jnp.float32)) ** 2)
                    for b in out.data.blocks))
                out.data.blocks = [
                    (b.astype(jnp.float32) / nrm).astype(b.dtype)
                    for b in out.data.blocks]
                return out, nrm
            th, nrms = jax.lax.scan(body, theta, None, length=n)
            return nrms[-1]

        runj = jax.jit(run_many, static_argnums=5)
        times = {}
        old = config.matmul_precision
        config.matmul_precision = 'default'
        try:
            for n in (10, 50):
                float(runj(LPp, RPp, W1p, W2p, thp, n))
                best = np.inf
                for _ in range(2):
                    t0 = time.perf_counter()
                    float(runj(LPp, RPp, W1p, W2p, thp, n))
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
        finally:
            config.matmul_precision = old
            config.bond_channel_fusion = False
        return (times[50] - times[10]) / 40

    RESULTS['matvec_pad_ms'] = round(matvec_slope(False) * 1e3, 3)
    print('matvec pad:', RESULTS['matvec_pad_ms'], flush=True)
    RESULTS['matvec_pad_mix_ms'] = round(matvec_slope(True) * 1e3, 3)
    print('matvec pad mix:', RESULTS['matvec_pad_mix_ms'], flush=True)

    print('RESULTS=' + json.dumps(RESULTS), flush=True)


if __name__ == '__main__':
    try:
        main()
    except Exception as e:
        RESULTS['error'] = f'{type(e).__name__}: {e}'[:300]
        print('RESULTS=' + json.dumps(RESULTS), flush=True)
        raise
