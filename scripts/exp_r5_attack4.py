"""Round-5 attack, part 4: the bar at LITERAL chi=4096.

pad256_111 crossed 40% of peak (72.74 TF) but at padded total chi=5632.
Here the virtual leg is allocated as EXACTLY chi=4096 split into
MXU-aligned units (largest-remainder proportional allocation, min one
unit per sector) — the production `pad_chi_multiple` layout at the literal
BASELINE scale. Variants: unit 128 / 256, mixing on/off, knobs (1,1,1).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

RESULTS = {}


def aligned_mults(chi, unit):
    charges = np.arange(-4, 5)
    weights = np.exp(-0.4 * charges ** 2)
    n_units = chi // unit
    assert n_units >= len(charges)
    share = n_units * weights / weights.sum()
    units = np.maximum(1, np.floor(share).astype(int))
    # largest remainder until the total is exact
    while units.sum() < n_units:
        units[np.argmax(share - units)] += 1
    while units.sum() > n_units:
        over = np.where(units > 1)[0]
        units[over[np.argmin((share - units)[over])]] -= 1
    return charges, units * unit


def main():
    import jax

    import bench as bench_mod
    from cyten_tpu.algorithms import dmrg as dmrg_mod
    from cyten_tpu.config import config
    from cyten_tpu.tensors import steady as steady_mod

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache_bench')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    print('devices:', jax.devices(), flush=True)

    chi = 4096
    orig_build = bench_mod.build_workload

    def make_builder(unit):
        def build_aligned(backend, chi=2048, seed=0):
            from cyten_tpu import ElementarySpace, SymmetricTensor, u1_symmetry
            rng = np.random.default_rng(seed)
            charges, mults = aligned_mults(chi, unit)
            print('  mults:', mults.tolist(), 'sum', int(mults.sum()),
                  flush=True)
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
        return build_aligned

    defaults = steady_mod.steady_truncated_svd.__defaults__

    def step_variant(tag, mixing, unit, knobs=(1, 1, 1), n_lanczos=10):
        config.bond_channel_fusion = mixing
        steady_mod.steady_truncated_svd.__defaults__ = (
            *knobs, defaults[3], defaults[4])
        bench_mod.build_workload = make_builder(unit)
        dmrg_mod._STATIC_BOND_FN.clear()
        dmrg_mod._JITTED_MATVEC.clear()
        try:
            t_s, fl = bench_mod.step_run(
                chi, n_lanczos=n_lanczos, precision='default',
                svd_mode='steady', work_dtype='bfloat16', lengths=(2, 6))
            RESULTS[f'{tag}_ms'] = round(t_s * 1e3, 2)
            RESULTS[f'{tag}_tflops'] = round(fl / t_s / 1e12, 2)
            RESULTS[f'{tag}_frac176'] = round(fl / t_s / 1e12 / 176.0, 3)
            print(tag, RESULTS[f'{tag}_ms'], 'ms',
                  RESULTS[f'{tag}_tflops'], 'TF',
                  RESULTS[f'{tag}_frac176'], flush=True)
        except Exception as e:
            RESULTS[f'{tag}_ms'] = f'failed: {e}'[:200]
            print(tag, 'FAILED', e, flush=True)
        finally:
            config.bond_channel_fusion = False
            steady_mod.steady_truncated_svd.__defaults__ = defaults
            bench_mod.build_workload = orig_build
            dmrg_mod._STATIC_BOND_FN.clear()
            dmrg_mod._JITTED_MATVEC.clear()

    step_variant('a4096u256', False, 256)
    step_variant('a4096u256_mix', True, 256)
    step_variant('a4096u128', False, 128)
    # unit 512 impossible: only 8 units for 9 sectors

    print('RESULTS=' + json.dumps(RESULTS), flush=True)


if __name__ == '__main__':
    try:
        main()
    except Exception as e:
        RESULTS['error'] = f'{type(e).__name__}: {e}'[:300]
        print('RESULTS=' + json.dumps(RESULTS), flush=True)
        raise
