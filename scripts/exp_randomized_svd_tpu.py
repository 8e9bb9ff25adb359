"""Measure randomized vs exact (QDWH) truncated SVD on the real TPU.

The growth-phase scenario: a two-site theta at bond dimension chi whose
truncation target chi_max is well below the block sizes. Host-driven timing
(each variant is a handful of dispatches; results are fetched to sync), the
workload is hundreds of ms so the ~30 ms RTT is minor but included — this is
the honest end-to-end cost a DMRG growth sweep pays.

Writes one JSON line per configuration to stdout and
/tmp/randomized_svd_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def build_theta(chi, backend, rng, d=2):
    import cyten_tpu as ct
    from cyten_tpu import ElementarySpace, SymmetricTensor

    # U(1) bond leg mimicking a DMRG bond: ~7 sectors, gaussian-ish multiplicities
    charges = np.arange(-3, 4)
    weights = np.exp(-0.5 * (charges / 1.5) ** 2)
    mults = np.maximum((weights / weights.sum() * chi).astype(int), 1)
    V = ElementarySpace(ct.u1_symmetry, charges[:, None], mults)
    p = ElementarySpace(ct.u1_symmetry, [[0], [1]], [1, 1])
    return SymmetricTensor.from_random_normal(
        [V, p], [V, p], backend=backend, rng=rng,
        labels=['vL', 'p0', 'p1', 'vR'], dtype=ct.dtypes.Dtype.float32)


def timed(fn, n=2):
    # warmup (compiles)
    out = fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    import jax
    print('devices:', jax.devices(), file=sys.stderr)
    import cyten_tpu as ct
    from cyten_tpu.tensors import randomized_truncated_svd

    rng = np.random.default_rng(0)
    results = []
    import os
    configs = os.environ.get('RSVD_CONFIGS', '1024:256,2048:512,4096:1024')
    for chi, chi_max in [tuple(map(int, c.split(':'))) for c in configs.split(',')]:
        backend = ct.get_backend(ct.u1_symmetry, 'jax')
        theta = build_theta(chi, backend, rng)

        def run_exact():
            U, S, Vh, err, _ = ct.truncated_svd(theta, chi_max=chi_max)
            float(ct.norm(S))  # result-dependent fetch = sync
            return err

        def run_rand(n_power, fused):
            U, S, Vh, err, _ = randomized_truncated_svd(
                theta, chi_max=chi_max, n_power=n_power, n_oversample=16,
                rng=rng, fused=fused)
            float(ct.norm(S))
            return err

        t_exact, err_exact = timed(run_exact)
        t_host, err_host = timed(lambda: run_rand(2, False))
        t_fused, err_fused = timed(lambda: run_rand(2, True))
        row = {
            'chi': chi, 'chi_max': chi_max,
            'exact_ms': round(t_exact * 1e3, 1),
            'rand_host_ms': round(t_host * 1e3, 1),
            'rand_fused_ms': round(t_fused * 1e3, 1),
            'err_exact': float(err_exact),
            'err_rand_host': float(err_host),
            'err_rand_fused': float(err_fused),
            'speedup_fused': round(t_exact / t_fused, 2),
        }
        print(json.dumps(row))
        results.append(row)
    with open('/tmp/randomized_svd_results.json', 'w') as f:
        json.dump(results, f, indent=1)


if __name__ == '__main__':
    main()
