"""Benchmark: U(1) two-site DMRG effective-Hamiltonian matvec throughput.

The BASELINE.md north-star workload: the block-sparse tensordot chain (LP-W-W-RP
applied to a two-site wavefunction) at large bond dimension, on whatever accelerator
jax provides (TPU under the driver; CPU otherwise).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where vs_baseline is
the speedup over the reference-style per-block numpy CPU path on the same workload.
"""

import functools
import json
import os
import signal
import sys
import time

import numpy as np

# ---------------------------------------------------------------------------
# Deadline discipline (round-3 post-mortem): the driver runs `python bench.py`
# under a hard timeout; round 3's default emission grew past it and the run
# was killed BEFORE printing -> no benchmark recorded at all. Three guards:
#   1. a persistent XLA compilation cache (compiles dominate the wall time;
#      re-runs on the same chip hit the cache and take seconds),
#   2. every optional metric is gated on the remaining budget
#      (BENCH_DEADLINE_S, default 420 s) and ordered by value,
#   3. SIGTERM/SIGALRM emit the partial result line before dying, so even a
#      surprise kill still hands the driver valid JSON.
# ---------------------------------------------------------------------------
_T0 = time.monotonic()
_DEADLINE_S = float(os.environ.get('BENCH_DEADLINE_S', '420'))
_RESULT: dict = {}
_EMITTED = False
_LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               '.bench_last_good.json')
_ACCURACY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              '.bench_accuracy.json')


def _save_last_good():
    """Persist the metrics gathered so far, MERGED into any previous record
    for the same headline metric, so a later run that hangs mid-capture can
    attach the most complete known-good numbers — clearly labeled (via
    ``measured_at``) as a previous measurement on the same chip.

    Called after the headline lands and again after EVERY completed gated
    metric (round-4 post-mortem: the r04 capture lost the chi=8192 ladder to
    one hung compile because last-good was only written at full emit)."""
    if _RESULT.get('metric') in (None, 'bench_incomplete') \
            or 'step_ms' not in _RESULT:
        return
    try:
        rec = {}
        try:
            with open(_LAST_GOOD_PATH) as f:
                prev = json.load(f)
            if prev.get('metric') == _RESULT.get('metric'):
                # same headline config: keep fields this run hasn't reached
                # yet — but never inherit a previous run's failure markers
                prev.pop('partial', None)
                prev.pop('note', None)
                rec = prev
        except (OSError, ValueError):
            pass
        for k, v in _RESULT.items():
            if k in ('partial', 'note', 'last_good'):
                continue  # failure markers describe a RUN, not the chip
            if isinstance(v, str) and (v.startswith('skipped:')
                                       or v.startswith('failed:')):
                continue  # never overwrite a good number with a skip marker
            rec[k] = v
        rec['measured_at'] = time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())
        with open(_LAST_GOOD_PATH, 'w') as f:
            json.dump(rec, f)
    except OSError:
        pass


def _attach_last_good():
    try:
        with open(_LAST_GOOD_PATH) as f:
            _RESULT['last_good'] = json.load(f)
    except (OSError, ValueError):
        pass


def _time_left():
    return _DEADLINE_S - (time.monotonic() - _T0)


def _emit(partial=False):
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    if partial:
        # attach the merged known-good record on ANY partial emission (not
        # only pre-headline): whatever this run lost to a hang is still
        # reported, labeled with the timestamp it was actually measured at
        _RESULT['partial'] = True
        _save_last_good()
        _attach_last_good()
    else:
        _save_last_good()  # remember the complete capture for future runs
    print(json.dumps(_RESULT), flush=True)


def _on_signal(signum, frame):  # pragma: no cover - timing-dependent
    if _RESULT.get('metric'):
        _emit(partial=True)
    os._exit(0)


def _start_watchdog(margin_s: float = 60.):  # pragma: no cover - timing
    """Emit-and-exit from a daemon THREAD at deadline+margin.

    Signal handlers only run between Python bytecodes: if the main thread is
    blocked inside a C call (a tunneled XLA compile RPC that never returns —
    observed >25 min on a chi=8192 program), SIGTERM/SIGALRM handlers never
    fire and the deadline logic is dead weight. A watchdog thread is immune
    to that: it sleeps past the deadline, prints whatever metrics exist, and
    hard-exits the process."""
    import threading

    def run():
        while True:
            left = _time_left() + margin_s
            if left <= 0:
                break
            time.sleep(min(left, 30.))
        if not _EMITTED:
            if not _RESULT.get('metric'):
                # even the first metric never landed: emit a failure record —
                # a diagnosable line beats an empty capture
                _RESULT.update({'metric': 'bench_incomplete', 'value': 0.0,
                                'unit': 'none', 'vs_baseline': None})
            _RESULT.setdefault('note', 'watchdog: main thread stuck past '
                                       'deadline (likely a hung compile RPC)')
            _emit(partial=True)
        os._exit(0)

    threading.Thread(target=run, daemon=True).start()


def _enable_compilation_cache():
    """Repo-local persistent XLA cache: the driver re-runs bench on the same
    chip, so compiles warmed by any earlier run are ~free on the next.

    CPU runs (BENCH_PLATFORM=cpu, e.g. the accuracy scenario) get a separate
    per-machine cache: XLA:CPU caches AOT machine code keyed only by program,
    and loading an entry AOT-compiled by a previous session's different host
    CPU has been observed to SIGSEGV (cpu_aot_loader 'machine type ...
    doesn't match' warning, then a crash mid-sweep)."""
    import jax

    suffix = ''
    if os.environ.get('BENCH_PLATFORM') == 'cpu':
        import hashlib
        try:
            with open('/proc/cpuinfo') as f:
                flags = next((ln for ln in f if ln.startswith('flags')), '')
        except OSError:
            flags = ''
        suffix = '_cpu_' + hashlib.sha1(flags.encode()).hexdigest()[:10]
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             '.jax_cache_bench' + suffix)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:
        pass


def _gated(key, est_s, fn):
    """Run fn() if the remaining budget covers its estimate; record failures
    and skips under `key` instead of dying."""
    if _time_left() < est_s:
        _RESULT[key] = f'skipped: {int(max(0, _time_left()))}s left < ~{est_s}s'
        return None
    try:
        out = fn()
    except Exception as e:  # pragma: no cover - keep the metrics we have
        _RESULT[key] = f'failed: {e}'
        return None
    _save_last_good()  # checkpoint after every completed metric
    return out


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


def build_padded_workload(backend, chi=2048, seed=0, pad=256):
    """The north-star workload with every sector multiplicity of the
    canonical chi-distribution rounded UP to a multiple of `pad` — the
    production layout of ``DMRGEngine(pad_chi_multiple=...)`` applied to the
    chi bond (the padded bond is LARGER than chi; its actual total is what
    the step really carries and its FLOPs are counted exactly). Ragged
    multiplicities are pure MXU underutilization: the padded chi=4096 step
    runs ~10% faster while doing ~50% more counted work
    (scripts/exp_r5_attack*.py, DESIGN §17)."""
    from cyten_tpu import ElementarySpace, SymmetricTensor, u1_symmetry

    rng = np.random.default_rng(seed)
    charges = np.arange(-4, 5)
    weights = np.exp(-0.4 * charges ** 2)
    mults = np.maximum(1, np.round(chi * weights / weights.sum()).astype(int))
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
        [v_leg, w_leg], [v_leg], backend=backend, labels=['vL', 'wL', 'vL*'],
        rng=rng)
    W = SymmetricTensor.from_random_normal(
        [w_leg, p_leg], [p_leg, w_leg], backend=backend,
        labels=['wL', 'p', 'wR', 'p*'], rng=rng)
    theta = SymmetricTensor.from_random_normal(
        [v_leg, p_leg, p_leg], [v_leg], backend=backend,
        labels=['vL', 'p0', 'p1', 'vR'], rng=rng)
    W1 = W.relabelled({'p': 'p0', 'p*': 'p0*'})
    W2 = W.relabelled({'p': 'p1', 'p*': 'p1*'})
    return LP, RP, W1, W2, theta


def build_hubbard_workload(backend, chi=2048, seed=0):
    """U(1)xU(1) Hubbard-like bond environment: many small irregular sectors.

    (N, 2Sz) charges; the virtual leg populates every reachable combination with
    a binomial-ish weight -> O(50+) sectors whose multiplicities span two orders
    of magnitude. This is the BASELINE.json config where unrolled per-block
    dispatch should hurt most (VERDICT r1 item 2)."""
    import itertools

    from cyten_tpu import ElementarySpace, SymmetricTensor
    from cyten_tpu.symmetries import u1_symmetry

    sym = u1_symmetry * u1_symmetry.factors[0]
    rng = np.random.default_rng(seed)
    sectors = []
    weights = []
    for n in range(-4, 5):
        for sz in range(-4, 5):
            if (n + sz) % 2 == 0:  # fermion-parity-consistent combinations
                sectors.append([n, sz])
                weights.append(np.exp(-0.35 * (n * n + 0.6 * sz * sz)))
    sectors = np.array(sectors)
    weights = np.array(weights)
    mults = np.maximum(1, np.round(chi * weights / weights.sum()).astype(int))
    v_leg = ElementarySpace(sym, sectors, mults)
    # physical site: |0>, |up>, |down>, |updown> -> charges (0,0),(1,1),(1,-1),(2,0)
    p_leg = ElementarySpace(sym, [[0, 0], [1, -1], [1, 1], [2, 0]],
                            [1, 1, 1, 1])
    # MPO leg: identity, hopping up/down (+-), density blocks
    w_charges = np.array([[0, 0], [1, 1], [-1, -1], [1, -1], [-1, 1], [0, 0]])
    w_leg = ElementarySpace.from_defining_sectors(sym, w_charges,
                                                  unique_sectors=False)
    LP = SymmetricTensor.from_random_normal(
        [v_leg], [v_leg, w_leg], backend=backend,
        labels=[['vR*'], ['vR', 'wR']], rng=rng)
    RP = SymmetricTensor.from_random_normal(
        [v_leg, w_leg], [v_leg], backend=backend, labels=['vL', 'wL', 'vL*'],
        rng=rng)
    W = SymmetricTensor.from_random_normal(
        [w_leg, p_leg], [p_leg, w_leg], backend=backend,
        labels=['wL', 'p', 'wR', 'p*'], rng=rng)
    theta = SymmetricTensor.from_random_normal(
        [v_leg, p_leg, p_leg], [v_leg], backend=backend,
        labels=['vL', 'p0', 'p1', 'vR'], rng=rng)
    W1 = W.relabelled({'p': 'p0', 'p*': 'p0*'})
    W2 = W.relabelled({'p': 'p1', 'p*': 'p1*'})
    return LP, RP, W1, W2, theta


def build_dense_workload(backend, chi=2048, seed=0):
    """No-symmetry (dense) TFI DMRG bond environment: the BASELINE.json 'TFIM
    dense' config. One chi x chi x ... block per tensor — pure MXU workload."""
    from cyten_tpu import ElementarySpace, SymmetricTensor
    from cyten_tpu.algorithms.models import TFIModel
    from cyten_tpu.symmetries import no_symmetry

    rng = np.random.default_rng(seed)
    v_leg = ElementarySpace(no_symmetry, [[0]], [chi])
    W = TFIModel(L=2, conserve='None', backend=backend, bc='infinite').H_mpo[0]
    w_leg = W.get_leg_co_domain('wL')
    p_leg = W.get_leg_co_domain('p')
    LP = SymmetricTensor.from_random_normal(
        [v_leg], [v_leg, w_leg], backend=backend,
        labels=[['vR*'], ['vR', 'wR']], rng=rng)
    RP = SymmetricTensor.from_random_normal(
        [v_leg, w_leg], [v_leg], backend=backend, labels=['vL', 'wL', 'vL*'],
        rng=rng)
    theta = SymmetricTensor.from_random_normal(
        [v_leg, p_leg, p_leg], [v_leg], backend=backend,
        labels=['vL', 'p0', 'p1', 'vR'], rng=rng)
    W1 = W.relabelled({'p': 'p0', 'p*': 'p0*'})
    W2 = W.relabelled({'p': 'p1', 'p*': 'p1*'})
    return LP, RP, W1, W2, theta


def build_golden_workload(backend, chi_mult=512, seed=0):
    """Fibonacci golden-chain DMRG bond environment: the BASELINE.json anyonic
    (F/R-heavy) config. The virtual leg carries both sectors (1 and tau) with
    multiplicities split by quantum dimension (1 : phi)."""
    from cyten_tpu import ElementarySpace, SymmetricTensor
    from cyten_tpu.algorithms.models import GoldenChainModel

    import cyten_tpu as ct
    from cyten_tpu.algorithms.models import mpo_from_bond_op
    from cyten_tpu.backends.data import BlockSparseData
    from cyten_tpu.backends.fusion_tree import FusionTreeBackend

    rng = np.random.default_rng(seed)
    # build the MPO HOST-SIDE: the bond factorization runs a complex SVD whose
    # values must come back to the host, and complex transfers are
    # UNIMPLEMENTED through the TPU tunnel (measured 2026-08-19)
    np_backend = FusionTreeBackend(ct.get_block_backend('numpy'))
    model = GoldenChainModel(L=2, backend=np_backend)
    W = mpo_from_bond_op(model.H_bonds[0], 2, bc='infinite')[0]  # bulk tensor
    if W.dtype.is_complex:  # c128 with ~1e-16 imag; the operator is real
        W = W.to_dtype(W.dtype.to_real)
    if backend is not np_backend:
        bb = backend.block_backend
        W = W.copy(deep=False)
        W.backend = backend
        W.data = BlockSparseData(
            [bb.as_block(np.asarray(b), W.dtype) for b in W.data.blocks],
            W.data.block_inds, W.dtype, is_sorted=True)
    fib = W.symmetry
    phi = (1 + 5 ** 0.5) / 2
    m_tau = max(1, int(round(chi_mult * phi / (1 + phi))))
    v_leg = ElementarySpace(fib, [[0], [1]], [chi_mult - m_tau, m_tau])
    p_leg = W.get_leg_co_domain('p')
    w_leg = W.get_leg_co_domain('wL')
    dt = W.dtype  # the MPO factorization is complex; keep one dtype throughout
    LP = SymmetricTensor.from_random_normal(
        [v_leg], [v_leg, w_leg], backend=backend,
        labels=[['vR*'], ['vR', 'wR']], rng=rng, dtype=dt)
    RP = SymmetricTensor.from_random_normal(
        [v_leg, w_leg], [v_leg], backend=backend,
        labels=[['vL', 'wL'], ['vL*']], rng=rng, dtype=dt)
    theta = SymmetricTensor.from_random_normal(
        [v_leg, p_leg, p_leg], [v_leg], backend=backend,
        labels=['vL', 'p0', 'p1', 'vR'], rng=rng, dtype=dt)
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


def _builder_symmetry(builder):
    """The symmetry each workload builder runs under (for get_backend)."""
    import cyten_tpu as ct

    if builder is build_hubbard_workload:
        return ct.u1_symmetry * ct.u1_symmetry.factors[0]
    if builder is build_dense_workload:
        return ct.no_symmetry
    return ct.u1_symmetry


def numpy_run(chi, n_iter=3, builder=None):
    """Time the per-block numpy path and count exact GEMM FLOPs of one matvec."""
    import cyten_tpu as ct
    from cyten_tpu.tensors import tdot
    from cyten_tpu.tools.flops import tdot_flops

    builder = builder or build_workload
    backend = ct.get_backend(_builder_symmetry(builder), 'numpy')
    LP, RP, W1, W2, theta = builder(backend, chi=chi)
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


def jax_run(chi, lengths=(50, 250), repeats=3, precision='float32',
            builder=None):
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

    builder = builder or build_workload
    backend = ct.get_backend(_builder_symmetry(builder), 'jax')
    LP, RP, W1, W2, theta = builder(backend, chi=chi)

    def make_run(n_iter):
        @jax.jit
        def run_many(LP, RP, W1, W2, theta):
            def body(th, _):
                out = _heff_matvec_impl(LP, RP, W1, W2, th)
                dense = not hasattr(out.data, 'blocks')  # no-symmetry backend
                blocks = [out.data.block] if dense else out.data.blocks
                nrm = jnp.sqrt(sum(jnp.sum(jnp.abs(b) ** 2) for b in blocks))
                if dense:
                    out.data.block = out.data.block / nrm
                else:
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


def su2_run(chi_mult=512, lengths=(50, 250), repeats=3, precision='float32',
            skip_numpy=False, builder=None):
    """Slope-timed fusion-tree matvec on device + numpy baseline.

    `builder` defaults to the SU(2) Heisenberg workload; `build_golden_workload`
    gives the anyonic (Fibonacci) variant."""
    import time

    import jax
    import jax.numpy as jnp

    import cyten_tpu as ct
    from cyten_tpu.backends.fusion_tree import FusionTreeBackend
    from cyten_tpu.algorithms.dmrg import _heff_matvec_impl

    builder = builder or build_su2_workload
    t_np = None
    if not skip_numpy:
        np_backend = FusionTreeBackend(ct.get_block_backend('numpy'))
        args_np = builder(np_backend, chi_mult=chi_mult)
        _heff_matvec_impl(*args_np)  # warmup (plan construction)
        t0 = time.perf_counter()
        for _ in range(3):
            _heff_matvec_impl(*args_np)
        t_np = (time.perf_counter() - t0) / 3

    backend = FusionTreeBackend(ct.get_block_backend('jax'))
    LP, RP, W1, W2, theta = builder(backend, chi_mult=chi_mult)

    def make_run(n_iter):
        @jax.jit
        def run_many(LP, RP, W1, W2, theta):
            def body(th, _):
                out = _heff_matvec_impl(LP, RP, W1, W2, th)
                nrm = jnp.sqrt(sum(jnp.sum(jnp.abs(b) ** 2)
                                   for b in out.data.blocks))
                blocks = [b / nrm for b in out.data.blocks]
                if out.dtype != th.dtype and not th.dtype.is_complex:
                    # anyonic tree plans carry complex twist phases whose sum is
                    # real for a real Hamiltonian: take the real part so the
                    # scan carry keeps the input structure
                    blocks = [jnp.real(b) for b in blocks]
                    out.data.dtype = th.dtype
                out.data.blocks = blocks
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
    slope = (times[n2] - times[n1]) / (n2 - n1)
    if slope <= 0:
        # RTT noise can exceed the per-iter cost for tiny workloads; fall back
        # to the (overhead-inclusive, hence upper-bound) per-iteration average
        slope = times[n2] / n2
    return slope, t_np


def build_step_state(backend, chi, seed=0, builder=None):
    """Static-mode step state: B/S tensors + frozen-chi mask + zero template.

    Backend-generic: `builder` picks the workload (default the U(1) north-star;
    `build_su2_workload` gives the fusion-tree variant, where the frozen "chi"
    counts multiplets and the mask keeps whole multiplets per sector).
    """
    import cyten_tpu as ct
    from cyten_tpu import DiagonalTensor, ElementarySpace, Mask, SymmetricTensor
    from cyten_tpu.algorithms.dmrg import HEffective
    from cyten_tpu.dtypes import Dtype
    from cyten_tpu.tensors import permute_legs, scalar_multiply
    from cyten_tpu.tensors.krylov_based import _close_structure

    builder = builder or build_workload
    kw = {'chi_mult': chi} if builder is build_su2_workload else {'chi': chi}
    LP, RP, W1, W2, theta = builder(backend, seed=seed, **kw)
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
                                           labels=['vL', 'vL*'], rng=rng) + 1.5

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
    assert mask.small_leg == v_leg
    return LP, RP, W1, W2, S, B1, B2, theta_tmpl, mask


def step_run(chi, n_lanczos=10, lengths=(2, 6), repeats=3, precision='float32',
             svd_mode='steady', env_dtype=None, work_dtype=None, builder=None,
             steady_opts=None):
    """Slope-time the FULL north-star step: one static-mode bond update (theta
    assembly + fused Lanczos + SVD + frozen-chi truncation + both environment
    updates) per scan iteration, state fed back as the carry.

    ``env_dtype='bfloat16'`` benches the mixed-precision production path
    (``DMRGEngine(env_dtype=...)``): LP/RP — the dominant HBM reads of the
    matvec chain — stored half-width, theta and the Lanczos iterates in the
    working dtype (docs/DESIGN.md §10).

    Returns (seconds/step, contraction FLOPs/step). The contraction FLOPs are
    the exact GEMM counts of the matvec chain x (n_lanczos + 2 env-update
    equivalents); SVD work is included in the TIME but not the FLOPs, so the
    reported TFLOP/s is the honest algorithmic throughput of the step.
    """
    import jax

    import cyten_tpu as ct
    from cyten_tpu.algorithms.dmrg import HEffective, _get_static_bond_fn
    from cyten_tpu.config import config
    from cyten_tpu.tensors import norm, scalar_multiply

    from cyten_tpu.dtypes import Dtype

    if builder is build_su2_workload:
        from cyten_tpu.backends.fusion_tree import FusionTreeBackend
        backend = FusionTreeBackend(ct.get_block_backend('jax'))
    else:
        backend = ct.get_backend(ct.u1_symmetry, 'jax')
    LP, RP, W1, W2, S, B1, B2, theta_tmpl, mask = build_step_state(
        backend, chi, builder=builder)
    env_dtype = Dtype[env_dtype] if isinstance(env_dtype, str) else env_dtype
    work_dtype = Dtype[work_dtype] if isinstance(work_dtype, str) else work_dtype
    if work_dtype is not None:
        # FULL low-precision step: state, MPO, envs and all intermediates in
        # the storage dtype (sticky-scalar rule keeps the chain from silently
        # promoting back to f32); reductions/factorizations still upcast
        # internally per the block-backend policy (DESIGN §10)
        LP, RP, W1, W2, S, B1, B2, theta_tmpl = (
            t.to_dtype(work_dtype) for t in (LP, RP, W1, W2, S, B1, B2,
                                             theta_tmpl))
        env_dtype = None  # envs already in work_dtype; skip the in-loop cast
    if env_dtype is not None:
        LP = LP.to_dtype(env_dtype)
        RP = RP.to_dtype(env_dtype)
    if steady_opts is None and os.environ.get('BENCH_STEADY_OPTS'):
        # e.g. BENCH_STEADY_OPTS=n_jacobi=1,ns_polish=1 (DESIGN S17 knobs)
        steady_opts = dict(kv.split('=') for kv in
                           os.environ['BENCH_STEADY_OPTS'].split(','))
        steady_opts = {k: int(v) for k, v in steady_opts.items()}
    impl = _get_static_bond_fn(n_lanczos, svd_mode, steady_opts)

    def make_run(n_iter):
        # theta_tmpl MUST be an argument: closed over, its chi^2 d^2 block
        # would be baked into the HLO as a literal constant, which blows up
        # compile time and (behind the axon tunnel) the compile-request size
        # (HTTP 413 at chi >= 12288, measured 2026-08-18)
        @jax.jit
        def run(LP, RP, W1, W2, S, B1, B2, theta_tmpl):
            def body(carry, _):
                S, B1, B2, LP, RP = carry
                H = HEffective(LP, RP, W1, W2)
                E, nB1, S2, B2n, LPn, RPn = impl(H, S, B1, B2, theta_tmpl,
                                                 mask)
                LPn = scalar_multiply(1. / norm(LPn), LPn)
                RPn = scalar_multiply(1. / norm(RPn), RPn)
                if env_dtype is not None:
                    # the engine's static path applies the same cast
                    LPn = LPn.to_dtype(env_dtype)
                    RPn = RPn.to_dtype(env_dtype)
                S2 = S2.relabelled(['vL', 'vL*'])
                return (S2, nB1, B2n, LPn, RPn), E

            _, Es = jax.lax.scan(body, (S, B1, B2, LP, RP), None,
                                 length=n_iter)
            return Es[-1]
        return run

    old = config.matmul_precision
    config.matmul_precision = precision
    try:
        times = {}
        for n in lengths:
            run = make_run(n)
            float(run(LP, RP, W1, W2, S, B1, B2, theta_tmpl))  # compile + sync
            best = np.inf
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(run(LP, RP, W1, W2, S, B1, B2, theta_tmpl))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
    finally:
        config.matmul_precision = old
    n1, n2 = lengths[0], lengths[-1]
    if n2 == n1:
        # single-length mode (ladder chis: one compile instead of two; the
        # ~30 ms dispatch RTT is <2% of a chi=8192 scan, so the overhead-
        # inclusive average is an honest upper bound there)
        t_step = times[n2] / n2
    else:
        t_step = (times[n2] - times[n1]) / (n2 - n1)
    if t_step <= 0:  # RTT noise floor on tiny workloads: report the upper bound
        t_step = times[n2] / n2

    if builder is build_su2_workload:
        # fusion-tree data has no per-leg block_inds for tdot_flops; report time
        return t_step, None

    # exact contraction FLOPs of one matvec chain (numpy metadata only)
    import cyten_tpu as ct2
    from cyten_tpu.tensors import tdot
    from cyten_tpu.tools.flops import tdot_flops

    np_backend = ct2.get_backend(_builder_symmetry(builder or build_workload),
                                 'numpy')
    LPn_, RPn_, W1n, W2n, theta_n = (builder or build_workload)(np_backend,
                                                                chi=chi)
    flops = tdot_flops(LPn_, theta_n, ['vR'], ['vL'])
    x = tdot(LPn_, theta_n, 'vR', 'vL')
    flops += tdot_flops(x, W1n, ['wR', 'p0'], ['wL', 'p0*'])
    x = tdot(x, W1n, ['wR', 'p0'], ['wL', 'p0*'])
    flops += tdot_flops(x, W2n, ['wR', 'p1'], ['wL', 'p1*'])
    x = tdot(x, W2n, ['wR', 'p1'], ['wL', 'p1*'])
    flops += tdot_flops(x, RPn_, ['vR', 'wR'], ['vL', 'wL'])
    return t_step, flops * (n_lanczos + 2)


def svd_timing(chi, precision='float32', repeats=3):
    """Time one exact truncation-grade SVD of the theta matrix (per-sector QDWH,
    the BASELINE.md 'per-sector SVD time' metric). One jitted program; the
    ~30 ms fetch RTT is negligible against the hundreds-of-ms QDWH cost."""
    import jax

    import cyten_tpu as ct
    from cyten_tpu.config import config
    from cyten_tpu.tensors import norm, svd

    backend = ct.get_backend(ct.u1_symmetry, 'jax')
    *_, theta = build_workload(backend, chi=chi)

    old = config.matmul_precision
    config.matmul_precision = precision
    try:
        @jax.jit
        def run(th):
            U, S, Vh = svd(th)
            return norm(S)

        float(run(theta))  # compile + sync
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(theta))
            best = min(best, time.perf_counter() - t0)
    finally:
        config.matmul_precision = old
    return best


def svd_dynamic_timing(chi, precision='float32', repeats=3):
    """Time the rank-adaptive warm-started truncated SVD (tensors/adaptive.py)
    — the growth-phase replacement for the per-sector QDWH wall (VERDICT r2
    #2). Warm start = the bond's previous-visit right isometry (here: the
    exact ranks of a chi_max=chi truncation, as after any earlier visit);
    timed end-to-end including sketch assembly, the fused GEMM/QR/small-SVD
    device program, and the truncation-decision fetch."""
    import cyten_tpu as ct
    from cyten_tpu.config import config
    from cyten_tpu.tensors import adaptive_truncated_svd, truncated_svd

    backend = ct.get_backend(ct.u1_symmetry, 'jax')
    *_, theta = build_workload(backend, chi=chi)
    old = config.matmul_precision
    config.matmul_precision = precision
    try:
        _, _, Vh0, _, _ = truncated_svd(theta, chi_max=chi,
                                        new_labels=('vR', 'vL'))
        rng = np.random.default_rng(0)
        adaptive_truncated_svd(theta, Vh0, chi_max=chi, rng=rng)  # compile
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            adaptive_truncated_svd(theta, Vh0, chi_max=chi, rng=rng)
            best = min(best, time.perf_counter() - t0)
    finally:
        config.matmul_precision = old
    return best


def svd_growth_timing(chi, precision='float32', repeats=3, decay=28.,
                      svd_min=1e-2):
    """Growth-regime SVD comparison (VERDICT r4 #5): adaptive warm-started
    vs exact fused, on a theta whose singular spectrum DECAYS so that only
    ~chi/4 values survive the cut — the regime the adaptive path exists for
    (early sweeps, bond still growing; the saturated-rank comparison at
    chi_max ranks measures its worst case instead).

    The decaying workload is the bench theta right-composed with a diagonal
    ``exp(-decay * k / dim)`` on the vR leg, so singular values fall off
    exponentially; ``svd_min`` then keeps ~chi/4 of them (trunc_cut alone is
    only a LOWER bound under minimize_error semantics). Warm start = the
    previous-visit isometry at the kept rank.
    Returns ``(t_dyn, t_exact, kept)``."""
    import numpy as np

    import cyten_tpu as ct
    from cyten_tpu import DiagonalTensor
    from cyten_tpu.config import config
    from cyten_tpu.dtypes import Dtype
    from cyten_tpu.tensors import compose
    from cyten_tpu.tensors.adaptive import (
        adaptive_truncated_svd, fused_truncated_svd,
    )

    backend = ct.get_backend(ct.u1_symmetry, 'jax')
    *_, theta = build_workload(backend, chi=chi)
    v_leg = theta.get_leg_co_domain('vR')
    bb = backend.block_backend

    def func(shape, coupled):
        k = np.arange(shape[0])
        return bb.as_block(np.exp(-decay * k / max(shape[0], 1)),
                           Dtype.float32)

    D = DiagonalTensor.from_sector_block_func(func, v_leg, backend=backend,
                                              labels=['vR', 'vR*'])
    theta = compose(theta, D, relabel2={'vR*': 'vR'})

    old = config.matmul_precision
    config.matmul_precision = precision
    try:
        # previous-visit warm start at the surviving rank
        _, S0, Vh0, _, _ = fused_truncated_svd(theta, chi_max=chi,
                                               svd_min=svd_min)
        kept = int(S0.leg.dim)

        rng = np.random.default_rng(0)
        adaptive_truncated_svd(theta, Vh0, chi_max=chi, svd_min=svd_min,
                               rng=rng)  # compile
        t_dyn = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            adaptive_truncated_svd(theta, Vh0, chi_max=chi,
                                   svd_min=svd_min, rng=rng)
            t_dyn = min(t_dyn, time.perf_counter() - t0)
        t_ex = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            fused_truncated_svd(theta, chi_max=chi, svd_min=svd_min)
            t_ex = min(t_ex, time.perf_counter() - t0)
    finally:
        config.matmul_precision = old
    return t_dyn, t_ex, kept


def svd_exact_e2e_timing(chi, precision='float32', repeats=3):
    """End-to-end EXACT truncated SVD (factorize + truncation decision + mask
    application) via the two-phase jitted path (tensors/adaptive.py
    fused_truncated_svd) — the apples-to-apples companion of svd_dynamic_ms."""
    import jax

    import cyten_tpu as ct
    from cyten_tpu.config import config
    from cyten_tpu.tensors.adaptive import fused_truncated_svd

    backend = ct.get_backend(ct.u1_symmetry, 'jax')
    *_, theta = build_workload(backend, chi=chi)
    old = config.matmul_precision
    config.matmul_precision = precision
    try:
        def run():
            U, S, Vh, err, _ = fused_truncated_svd(theta, chi_max=chi)
            jax.block_until_ready(S.data.blocks)

        run()
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
    finally:
        config.matmul_precision = old
    return best


def measured_bf16_peak(n=8192, iters=32):
    """The chip's measured bf16 MXU ceiling: slope-timed big square matmul.
    Emitted alongside the ladder so 'fraction of peak' claims in the bench
    JSON are self-contained (BASELINE.md north star is 40% of MXU peak)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    x = jnp.ones((n, n), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, k):
        def body(c, _):
            return lax.dot_general(c, x, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.bfloat16), None
        y, _ = lax.scan(body, x, None, length=k)
        return jnp.sum(y.astype(jnp.float32))

    k1, k2 = 4, iters
    float(run(x, k1))
    t0 = time.perf_counter(); float(run(x, k1)); t1 = time.perf_counter()
    float(run(x, k2))
    t2 = time.perf_counter(); float(run(x, k2)); t3 = time.perf_counter()
    dt = ((t3 - t2) - (t1 - t0)) / (k2 - k1)
    return 2 * n ** 3 / dt / 1e12


def measured_hbm_gbps(n_mb=512, lengths=(4, 16)):
    """The chip's measured HBM streaming bandwidth (read + write), via a
    slope-timed elementwise update of one large f32 array. Emitted alongside
    the step metrics so the ``*_frac_roofline`` fields are self-contained
    (the v5e nominal is ~820 GB/s; what this chip sustains is what counts)."""
    import jax
    from jax import lax
    import jax.numpy as jnp

    n = int(n_mb * 2 ** 20 // 4)
    x = jnp.ones((n,), jnp.float32)

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, k):
        def body(c, _):
            # one read + one write of the full array per iteration; the
            # multiply-add cannot be elided or folded across iterations
            return c * np.float32(0.999999) + np.float32(1e-7), None
        y, _ = lax.scan(body, x, None, length=k)
        return y[0]

    times = {}
    for k in lengths:
        float(run(x, k))  # warmup/compile
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(x, k))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = lengths
    dt = (times[k2] - times[k1]) / (k2 - k1)
    return 2 * n * 4 / dt / 1e9


def _tdot_meta(bi1, dims1, bi2, dims2, legs1, legs2):
    """Metadata-only tdot: given (block_inds, per-leg multiplicities) of two
    block-sparse tensors, return the output's (block_inds, dims, elems).

    Mirrors ``tools.flops.tdot_flops`` pairing; output legs are
    ``[open1..., open2...]`` per tdot semantics. Lets the traffic model chain
    through the matvec stages without touching device (or even host) data."""
    open1 = [n for n in range(len(dims1)) if n not in legs1]
    open2 = [n for n in range(len(dims2)) if n not in legs2]

    def size(row, dims):
        return int(np.prod([dims[i][row[i]] for i in range(len(dims))],
                           dtype=np.int64))

    groups1: dict[tuple, list] = {}
    for row in bi1:
        groups1.setdefault(tuple(row[i] for i in legs1), []).append(row)
    out_rows = {}
    pair1 = pair2 = 0  # per-GEMM-pair operand reads (the streaming model)
    for row2 in bi2:
        key = tuple(row2[i] for i in legs2)
        for row1 in groups1.get(key, ()):
            out = tuple(row1[i] for i in open1) + tuple(row2[i] for i in open2)
            out_rows[out] = 1
            pair1 += size(row1, dims1)
            pair2 += size(row2, dims2)
    out_dims = [dims1[i] for i in open1] + [dims2[i] for i in open2]
    elems = 0
    bi_out = []
    for row in out_rows:
        bi_out.append(row)
        elems += int(np.prod([out_dims[i][row[i]] for i in range(len(row))],
                             dtype=np.int64))
    return bi_out, out_dims, elems, pair1, pair2


def matvec_traffic_bytes(chi, env_bytes=4, work_bytes=4, model='unique'):
    """HBM traffic of ONE north-star matvec chain, from metadata only.

    ``model='unique'`` (speed of light): every operand read once, each stage
    intermediate written once and read once by the next stage, theta' written
    once — a true lower bound for ANY implementation of this chain.
    ``model='stream'`` (this storage's roofline): each per-sector GEMM streams
    both operand blocks from HBM (so blocks participating in several pairs are
    re-read) — what an ideally-fused single-pass (bf16 'default' precision)
    per-block dispatch can actually achieve; matches the DESIGN §4 bound."""
    import cyten_tpu as ct

    backend = ct.get_backend(ct.u1_symmetry, 'numpy')
    LP, RP, W1, W2, theta = build_workload(backend, chi=1024)
    # rebuild metadata at the TARGET chi without allocating chi-sized blocks:
    # the sector structure is chi-independent, only multiplicities scale
    charges = np.arange(-4, 5)
    weights = np.exp(-0.4 * charges ** 2)
    mults = np.maximum(1, np.round(chi * weights / weights.sum()).astype(int))
    mult_map = {int(c): int(m) for c, m in zip(charges, mults)}

    def meta(t):
        bi = [tuple(int(x) for x in row) for row in t.data.block_inds]
        dims = []
        for i in range(t.num_legs):
            leg = t.get_leg_co_domain(i)
            if leg.dim > 64:  # a virtual (chi-scaled) leg: rescale to target
                dims.append(np.array([mult_map[int(s[0])]
                                      for s in leg.sector_decomposition]))
            else:
                dims.append(np.asarray(leg.multiplicities))
        return bi, dims

    elems = {}
    for name, t in (('LP', LP), ('RP', RP), ('W1', W1), ('W2', W2),
                    ('theta', theta)):
        bi, dims = meta(t)
        elems[name] = sum(
            int(np.prod([dims[i][row[i]] for i in range(len(row))],
                        dtype=np.int64)) for row in bi)
        if name == 'LP':
            bi_LP, dims_LP = bi, dims
        elif name == 'theta':
            bi_th, dims_th = bi, dims
        elif name == 'W1':
            bi_W, dims_W = bi, dims
        elif name == 'RP':
            bi_RP, dims_RP = bi, dims
    # stage 0: LP (legs [vR*, wR, vR]) . theta[vL, p0, p1, vR] over vR<->vL
    bi1, d1, e1, p0a, p0b = _tdot_meta(bi_LP, dims_LP, bi_th, dims_th,
                                       [2], [0])
    # x1 legs [vR*, wR, p0, p1, vR]; stage 1: . W1[wL, p0, wR, p0*] over
    # (wR, p0) <-> (wL, p0*)
    bi2, d2, e2, p1a, p1b = _tdot_meta(bi1, d1, bi_W, dims_W, [1, 2], [0, 3])
    # x2 legs [vR*, p1, vR, p0', wR]; stage 2: . W2 over (wR, p1)<->(wL, p1*)
    bi3, d3, e3, p2a, p2b = _tdot_meta(bi2, d2, bi_W, dims_W, [4, 1], [0, 3])
    # x3 legs [vR*, vR, p0', p1', wR]; stage 3: . RP over (vR, wR)<->(vL, wL)
    _, _, e4, p3a, p3b = _tdot_meta(bi3, d3, bi_RP, dims_RP, [1, 4], [0, 1])
    if model == 'stream':
        reads = (p0a * env_bytes + p0b * work_bytes          # LP . theta
                 + (p1a + p1b + p2a + p2b) * work_bytes      # . W1, . W2
                 + p3a * work_bytes + p3b * env_bytes)       # . RP
        writes = (e1 + e2 + e3 + e4) * work_bytes
        inter_reads_extra = 0  # pair reads of x1/x2/x3 already in p1a/p2a/p3a
        return reads + writes + inter_reads_extra
    env = (elems['LP'] + elems['RP']) * env_bytes
    mpo = (elems['W1'] + elems['W2']) * work_bytes
    inter = 2 * (e1 + e2 + e3) * work_bytes  # written once + read once
    io = (elems['theta'] + e4) * work_bytes
    return env + mpo + inter + io


def _roofline_ms(flops, traffic_bytes, peak_tf, bw_gbps, passes=1):
    """Lower-bound wall time of a kernel: the binding constraint of the MXU
    (``passes`` bf16 passes per logical FLOP — 6 for 'float32' precision,
    3 for 'tensorfloat32', 1 for 'default') and the HBM streaming bound."""
    t_mxu = passes * flops / (peak_tf * 1e12)
    t_hbm = traffic_bytes / (bw_gbps * 1e9)
    return max(t_mxu, t_hbm) * 1e3


_PASSES = {'float32': 6, 'tensorfloat32': 3, 'default': 1, 'bfloat16': 1}


# f64 CPU DMRG reference for the accuracy scenario: L=24 U(1)-Heisenberg open
# chain, chi=512, trunc_err 4.6e-14, measured 2026-08-20 on this container
# (regenerate: scripts/exp_bf16_accuracy.py --reference)
HEIS24_E_REF = -10.45378576040958


def accuracy_bf16work(chi=1024, L=24, e_ref=HEIS24_E_REF, n_bf16_sweeps=6):
    """End-to-end accuracy of the bar-meeting configuration at production
    scale (VERDICT r2 #1b): FULL-bf16 DMRG (state, environments and
    intermediates stored bfloat16, 1-pass matmuls, adaptive growth-phase SVD)
    followed by ONE f32 polish sweep, on the U(1) Heisenberg chain — the
    quoted-energy error vs the f64 CPU reference. ``eps=0`` +
    ``chi_max=chi`` forces production-sized (chi=1024) blocks even though
    L=24 converges at chi=256, so the bf16 rounding is exercised at scale."""
    import cyten_tpu as ct
    from cyten_tpu.algorithms import DMRGEngine, HeisenbergModel, SimpleMPS
    from cyten_tpu.dtypes import Dtype

    model = HeisenbergModel(L=L, conserve='Sz', block_backend='jax')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=chi, eps=0.,
                     pad_chi_multiple=chi // 4,
                     env_dtype=Dtype.bfloat16,
                     matmul_precision='default',
                     dynamic_svd='adaptive',
                     lanczos_options={'N_max': 10, 'P_tol': 1e-10})
    import jax

    def _n_maps():
        try:
            with open('/proc/self/maps') as f:
                return sum(1 for _ in f)
        except OSError:
            return -1

    for sweep_i in range(n_bf16_sweeps):
        # full-bf16: demote the state after each sweep as well (the engine's
        # env_dtype covers LP/RP, the HBM-dominant operands)
        for i in range(len(eng.psi.Bs)):
            eng.psi.Bs[i] = eng.psi.Bs[i].to_dtype(Dtype.bfloat16)
            eng.psi.Ss[i] = eng.psi.Ss[i].to_dtype(Dtype.bfloat16)
        E_b = eng.sweep()
        # on CPU the eager sweep JIT-compiles thousands of tiny programs;
        # past vm.max_map_count LLVM dies with 'Cannot allocate memory' and
        # the process SIGSEGVs (observed 2026-08-22). Dropping the compiled-
        # program caches each sweep bounds the live module count; recompiles
        # are cheap relative to the sweep.
        print(f'accuracy sweep {sweep_i + 1}/{n_bf16_sweeps}: E={E_b:.8f}, '
              f'maps={_n_maps()}', file=sys.stderr, flush=True)
        jax.clear_caches()
        # executables sit in reference cycles (jaxpr <-> closed-over consts);
        # without a forced collection their LLVM modules stay mapped and the
        # map count still overflows (observed: +9-18k maps/sweep with
        # clear_caches alone)
        import gc
        gc.collect()
    # converge-then-polish (DESIGN §10): one f32 full-precision sweep
    eng.env_dtype = None
    eng.matmul_precision = 'float32'
    for i in range(len(eng.psi.Bs)):
        eng.psi.Bs[i] = eng.psi.Bs[i].to_dtype(Dtype.float32)
        eng.psi.Ss[i] = eng.psi.Ss[i].to_dtype(Dtype.float32)
    eng.LPs = [t if t is None else t.to_dtype(Dtype.float32) for t in eng.LPs]
    eng.RPs = [t if t is None else t.to_dtype(Dtype.float32) for t in eng.RPs]
    E = eng.sweep()
    return float(E), float(E_b), (None if e_ref is None
                                  else abs(float(E) - e_ref))


def su2_step_with_compile(chi_mult=512, n_lanczos=10, svd_mode='steady'):
    """The fused fusion-tree (SU(2)) bond update: explicit TPU compile time +
    slope-timed step. The compile time is a tracked metric (VERDICT r2 #3:
    the index-batched plan application brought it from minutes to ~20 s)."""
    import jax

    import cyten_tpu as ct
    from cyten_tpu.algorithms.dmrg import HEffective, _get_static_bond_fn
    from cyten_tpu.backends.fusion_tree import FusionTreeBackend

    backend = FusionTreeBackend(ct.get_block_backend('jax'))
    LP, RP, W1, W2, S, B1, B2, theta_tmpl, mask = build_step_state(
        backend, chi_mult, builder=build_su2_workload)
    impl = _get_static_bond_fn(n_lanczos, svd_mode)

    def step(LP, RP, W1, W2, S, B1, B2, theta_tmpl):
        H = HEffective(LP, RP, W1, W2)
        return impl(H, S, B1, B2, theta_tmpl, mask)

    lowered = jax.jit(step).lower(LP, RP, W1, W2, S, B1, B2, theta_tmpl)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    out = compiled(LP, RP, W1, W2, S, B1, B2, theta_tmpl)
    float(out[0])  # sync

    def run_n(n):
        t = time.perf_counter()
        o = None
        for _ in range(n):
            o = compiled(LP, RP, W1, W2, S, B1, B2, theta_tmpl)
        float(o[0])
        return time.perf_counter() - t

    n1, n2 = 5, 25
    a = run_n(n1)
    b = run_n(n2)
    return compile_s, (b - a) / (n2 - n1)


def main():
    # deadline guards (see module header): emit whatever we have on SIGTERM
    # (the driver's `timeout` kill) or on the backstop alarm
    try:
        signal.signal(signal.SIGTERM, _on_signal)
        signal.signal(signal.SIGALRM, _on_signal)
        signal.alarm(int(_DEADLINE_S) + 150)
    except (ValueError, OSError):  # pragma: no cover - non-main thread etc.
        pass
    _start_watchdog()
    if os.environ.get('BENCH_PLATFORM'):
        # the axon TPU plugin overrides the JAX_PLATFORMS env var; only the
        # config update forces CPU (for smoke tests on the host)
        import jax
        jax.config.update('jax_platforms', os.environ['BENCH_PLATFORM'])
    if os.environ.get('BENCH_DISABLE_MIXING'):
        # fall back to the chained-tdot matvec programs (e.g. to reuse an
        # older compile cache when a fresh mixing program hangs the tunnel)
        from cyten_tpu.config import config as _cfg
        _cfg.bond_channel_fusion = False
    _enable_compilation_cache()
    chi = int(os.environ.get('BENCH_CHI', '4096'))
    # headline precision is 'float32' (6-pass bf16, ~1e-7, comparable to the f64
    # reference numerics). 'tensorfloat32' (3-pass) and 'default' (1 pass, ~1e-3)
    # are the documented speed ladder — see docs/DESIGN.md.
    precision = os.environ.get('BENCH_PRECISION', 'float32')
    scenario = os.environ.get('BENCH_SCENARIO', 'step')
    if scenario == 'step':
        # the north-star workload (BASELINE.md): the full two-site DMRG bond
        # update. Steady-state mode: warm-started matmul/QR SVD (the converged
        # production path; 'BENCH_SVD_MODE=exact' benches per-sector QDWH).
        svd_mode = os.environ.get('BENCH_SVD_MODE', 'steady')
        n_lanczos = int(os.environ.get('BENCH_N_LANCZOS', '10'))
        # mixed-precision production path: BENCH_ENV_DTYPE=bfloat16 stores the
        # MPO environments half-width (DMRGEngine(env_dtype=...), DESIGN §10)
        env_dtype = os.environ.get('BENCH_ENV_DTYPE') or None
        # BENCH_WORK_DTYPE=bfloat16: the FULL low-precision step (state + MPO +
        # envs + intermediates all stored bf16; DESIGN §10)
        work_dtype = os.environ.get('BENCH_WORK_DTYPE') or None
        suffix = (f'_{work_dtype}work' if work_dtype
                  else (f'_{env_dtype}env' if env_dtype else ''))
        # ---- 0. provisional metric (~20 s): if a surprise kill lands during
        # the headline's minutes-long cold compile, the watchdog still has a
        # valid metric line to emit. Skipped with BENCH_LADDER=0 (it is the
        # ladder's peak measurement; also far too slow on CPU hosts) ----
        peak0 = None
        hbm0 = None
        if os.environ.get('BENCH_LADDER', '1') != '0':
            def _provisional():
                nonlocal peak0, hbm0
                peak0 = measured_bf16_peak()
                _RESULT.update({'metric': 'measured_peak_bf16_tflops',
                                'value': round(peak0, 1), 'unit': 'TFLOP/s',
                                'vs_baseline': None,
                                'note': 'provisional: headline step timed '
                                        'out'})
                hbm0 = measured_hbm_gbps()
                _RESULT['measured_hbm_gbps'] = round(hbm0, 1)
            _gated('provisional_peak', 25, _provisional)
        # ---- 1. headline (ungated): the full step at the bench chi ----
        t_step, flops = step_run(chi, n_lanczos=n_lanczos, precision=precision,
                                 svd_mode=svd_mode, env_dtype=env_dtype,
                                 work_dtype=work_dtype)
        _RESULT.pop('note', None)
        _RESULT.update({
            'metric': f'u1_dmrg_step_chi{chi}_{svd_mode}{suffix}_tflops',
            'value': round(flops / t_step / 1e12, 4),
            'unit': 'TFLOP/s',
            'vs_baseline': None,  # numpy baseline measured last (gated below)
            'step_ms': round(t_step * 1e3, 3),
        })
        # frac-of-peak / frac-of-roofline companions (VERDICT r4 #1d): a flat
        # raw-TF headline must read as "at the bound", not "no progress".
        # The roofline counts only the (n_lanczos + 2) matvec-equivalents the
        # FLOP metric counts — SVD/orthogonalization time is in the numerator
        # but not the bound, so the fraction is conservative (a true <= 1).
        if peak0 is not None and hbm0 is not None:
            wb = 2 if work_dtype == 'bfloat16' else 4
            eb = 2 if (env_dtype == 'bfloat16' or wb == 2) else 4
            tr = matvec_traffic_bytes(chi, eb, wb, 'stream') * (n_lanczos + 2)
            t_roof = _roofline_ms(flops, tr, peak0, hbm0,
                                  _PASSES.get(precision, 1))
            _RESULT['step_frac_peak'] = round(
                flops / t_step / 1e12 / peak0, 3)
            _RESULT['step_frac_roofline'] = round(t_roof / (t_step * 1e3), 3)
        _save_last_good()  # headline checkpoint (r4 #1a)
        # ---- 2. the bar-meeting configuration (BASELINE.md >=40% of MXU
        # peak, VERDICT r2 #1): measured bf16 ceiling + chi=8192 full-bf16
        # step, driver-visible in this same JSON line ----
        if os.environ.get('BENCH_LADDER', '1') != '0' and chi != 8192:
            def _ladder():
                peak = peak0 if peak0 is not None else measured_bf16_peak()
                _RESULT['measured_peak_bf16_tflops'] = round(peak, 1)
                t8w, f8w = step_run(8192, n_lanczos=n_lanczos,
                                    precision='default', svd_mode=svd_mode,
                                    work_dtype='bfloat16', lengths=(6,))
                _RESULT['step8192_bf16work_ms'] = round(t8w * 1e3, 1)
                _RESULT['step8192_bf16work_tflops'] = round(
                    f8w / t8w / 1e12, 2)
                _RESULT['step8192_bf16work_frac_peak'] = round(
                    f8w / t8w / 1e12 / peak, 3)
                if hbm0 is not None:
                    tr8 = matvec_traffic_bytes(8192, 2, 2, 'stream') \
                        * (n_lanczos + 2)
                    _RESULT['step8192_bf16work_frac_roofline'] = round(
                        _roofline_ms(f8w, tr8, peak, hbm0, 1) / (t8w * 1e3),
                        3)
            _gated('step8192_ladder', 100, _ladder)
        # ---- 2a'. the chi=4096 bar rung (BASELINE.md as written): the
        # chi=4096 bond run through the production layout — sector
        # multiplicities padded up to 256-multiples
        # (DMRGEngine(pad_chi_multiple=...); actual padded total emitted as
        # *_padded_chi), full-bf16 work dtype, steady SVD with the
        # converged-sweep cleanup knobs (n_jacobi=1, ns_polish=1;
        # second-order exact at the fixed point,
        # tests/test_dmrg.py::test_static_mode_steady_svd) ----
        if os.environ.get('BENCH_LADDER', '1') != '0' and chi == 4096:
            def _bar4096():
                t_a, f_a = step_run(
                    4096, n_lanczos=n_lanczos, precision='default',
                    svd_mode=svd_mode, work_dtype='bfloat16',
                    builder=build_padded_workload,
                    steady_opts={'n_jacobi': 1, 'ns_polish': 1},
                    lengths=(2, 6))
                w = np.exp(-0.4 * np.arange(-4, 5) ** 2)
                m = np.maximum(1, np.round(4096 * w / w.sum()).astype(int))
                _RESULT['step4096_pad256_bf16work_ms'] = round(t_a * 1e3, 2)
                _RESULT['step4096_pad256_bf16work_tflops'] = round(
                    f_a / t_a / 1e12, 2)
                _RESULT['step4096_pad256_padded_chi'] = int(
                    np.sum(-(-m // 256) * 256))
                peak = _RESULT.get('measured_peak_bf16_tflops')
                if peak:
                    _RESULT['step4096_pad256_bf16work_frac_peak'] = round(
                        f_a / t_a / 1e12 / peak, 3)
            _gated('step4096_pad256_bf16work_ms', 90, _bar4096)
        # ---- 2b. non-abelian BASELINE configs, driver-visible (VERDICT r4
        # #3): the FULL fused SU(2) bond update + compile time, and the
        # anyonic golden-chain matvec ----
        if os.environ.get('BENCH_SU2', '1') != '0':
            chi_mult = int(os.environ.get('BENCH_CHI_MULT', '512'))

            def _su2_step():
                c_s, t_s = su2_step_with_compile(chi_mult)
                _RESULT[f'su2_step_{chi_mult}mult_ms'] = round(t_s * 1e3, 2)
                _RESULT['su2_step_compile_s'] = round(c_s, 1)
                _RESULT['su2_step_compile_cache'] = (
                    'warm' if c_s < 5. else 'cold')
            _gated('su2_step_compile_s', 90, _su2_step)

            def _golden():
                t_g, _ = su2_run(chi_mult, lengths=(10, 50), skip_numpy=True,
                                 builder=build_golden_workload)
                _RESULT[f'golden_matvec_{chi_mult}mult_ms'] = round(
                    t_g * 1e3, 4)
            _gated(f'golden_matvec_{chi_mult}mult_ms', 80, _golden)
        # ---- 3. full-bf16 companion at the bench chi (top rung of the
        # precision ladder; sticky-scalar rule, DESIGN §10) ----
        if (env_dtype is None and work_dtype is None
                and os.environ.get('BENCH_BF16', '1') != '0'):
            def _bf16work():
                t_w, fl_w = step_run(chi, n_lanczos=n_lanczos,
                                     precision='default', svd_mode=svd_mode,
                                     work_dtype='bfloat16')
                _RESULT['step_bf16work_ms'] = round(t_w * 1e3, 3)
                _RESULT['step_bf16work_tflops'] = round(fl_w / t_w / 1e12, 4)
            _gated('step_bf16work_ms', 70, _bf16work)
        # ---- 4. SVD companions: growth-phase adaptive vs exact e2e vs the
        # bare QDWH factorization (BASELINE.md per-sector SVD metric) ----
        if os.environ.get('BENCH_SVD_TIMING', '1') != '0':
            def _svd_growth():
                # growth-regime adaptive-vs-exact pair FIRST: the
                # driver-visible VERDICT r4 #5 evidence (1.44x at rank
                # ~chi/3; the saturated-rank pair below is its worst case)
                t_d, t_e, kept = svd_growth_timing(chi, precision)
                _RESULT['svd_growth_dyn_ms'] = round(t_d * 1e3, 1)
                _RESULT['svd_growth_exact_ms'] = round(t_e * 1e3, 1)
                _RESULT['svd_growth_rank'] = kept
            _gated('svd_growth_dyn_ms', 60, _svd_growth)

            # the contract field vs_baseline is a pure HOST-side numpy
            # baseline (cannot hang the tunnel) -- measure it before the
            # remaining device metrics, whose cold compiles have been
            # observed to hang the tunnel and eat the rest of the budget
            if os.environ.get('BENCH_VS_BASELINE', '1') != '0':
                def _vs_np_early():
                    _RESULT['vs_baseline'] = round(
                        numpy_run(chi)[0] * (n_lanczos + 2) / t_step, 3)
                _gated('vs_baseline_note', 90, _vs_np_early)

            def _svd_dyn():
                _RESULT['svd_dynamic_ms'] = round(
                    svd_dynamic_timing(chi, precision) * 1e3, 1)
            _gated('svd_dynamic_ms', 45, _svd_dyn)

            def _svd_e2e():
                _RESULT['svd_exact_e2e_ms'] = round(
                    svd_exact_e2e_timing(chi, precision) * 1e3, 1)
            _gated('svd_exact_e2e_ms', 45, _svd_e2e)

            def _svd_exact():
                _RESULT['svd_exact_ms'] = round(
                    svd_timing(chi, precision) * 1e3, 1)
            _gated('svd_exact_ms', 35, _svd_exact)
        # ---- 5. fusion-tree matvec tracking metric (the step + golden lines
        # moved up to section 2b — VERDICT r4 #3) ----
        if os.environ.get('BENCH_SU2', '1') != '0':
            chi_mult = int(os.environ.get('BENCH_CHI_MULT', '512'))

            def _su2_matvec():
                # lengths long enough that the slope is clean: the short
                # (2, 10) pair inflated 0.93 ms/iter to 1.6 (2026-08-18)
                t_su2, _ = su2_run(chi_mult, lengths=(10, 50), skip_numpy=True)
                _RESULT[f'su2_matvec_{chi_mult}mult_ms'] = round(
                    t_su2 * 1e3, 4)
            _gated(f'su2_matvec_{chi_mult}mult_ms', 80, _su2_matvec)
        # ---- 6. lower-value companions, kept if budget remains ----
        if env_dtype is None and os.environ.get('BENCH_BF16', '1') != '0':
            def _bf16env():
                # bf16-stored MPO environments (the recommended converged-
                # sweep configuration, DESIGN §10)
                t_b, fl_b = step_run(chi, n_lanczos=n_lanczos,
                                     precision=precision, svd_mode=svd_mode,
                                     env_dtype='bfloat16')
                _RESULT['step_bf16env_ms'] = round(t_b * 1e3, 3)
                _RESULT['step_bf16env_tflops'] = round(fl_b / t_b / 1e12, 4)
            _gated('step_bf16env_ms', 70, _bf16env)

        def _matvec():
            t_matvec = jax_run(chi, precision=precision)
            _RESULT['matvec_tflops'] = round(
                flops / (n_lanczos + 2) / t_matvec / 1e12, 4)
        _gated('matvec_tflops', 60, _matvec)
        if os.environ.get('BENCH_VS_BASELINE', '1') != '0' \
                and _RESULT.get('vs_baseline') is None:
            def _vs_np():
                # per-block numpy matvec baseline (single-core host); usually
                # already measured right after svd_growth above -- this is the
                # retry slot in case that was budget-gated
                _RESULT['vs_baseline'] = round(
                    numpy_run(chi)[0] * (n_lanczos + 2) / t_step, 3)
            _gated('vs_baseline_note', 90, _vs_np)
        if os.environ.get('BENCH_LADDER', '1') != '0' and chi != 8192:
            # LAST: its cold compile was observed to hang >25 min in the
            # tunnel — everything above must already be in _RESULT when the
            # watchdog fires
            def _ladder_f32():
                t8, f8 = step_run(8192, n_lanczos=n_lanczos,
                                  precision=precision, svd_mode=svd_mode,
                                  lengths=(6,))
                _RESULT['step8192_ms'] = round(t8 * 1e3, 1)
                _RESULT['step8192_tflops'] = round(f8 / t8 / 1e12, 2)
            _gated('step8192_ms', 110, _ladder_f32)
        # accuracy companion (VERDICT r2 #1b / r4 #8): the bf16-work
        # protocol's end-to-end energy error, co-reported in the same JSON as
        # the speed bar. The live run takes minutes (BENCH_SCENARIO=accuracy
        # regenerates it); here we attach the last measurement on this chip,
        # labeled with its timestamp.
        try:
            with open(_ACCURACY_PATH) as f:
                _RESULT['accuracy_companion'] = json.load(f)
        except (OSError, ValueError):
            pass
        _RESULT['bench_wall_s'] = round(time.monotonic() - _T0, 1)
        _emit()
        return
    if scenario == 'accuracy':
        # end-to-end accuracy of the full-bf16 + f32-polish protocol at
        # production scale (VERDICT r2 #1b); reference: f64 CPU DMRG
        chi_a = int(os.environ.get('BENCH_CHI', '1024'))
        # the bf16 energy plateaus (within bf16 noise) by sweep 3-4; the
        # sweep count is recorded in the emission
        n_acc = int(os.environ.get('BENCH_ACC_SWEEPS', '6'))
        E, E_bf16, dE = accuracy_bf16work(chi=chi_a, n_bf16_sweeps=n_acc)
        import jax as _jax
        result = {
            'metric': f'heis24_bf16work_polished_dE_chi{chi_a}',
            'value': dE,
            'unit': 'Hartree-equivalent (abs energy error)',
            'vs_baseline': None,
            'E_polished': E,
            'E_bf16': E_bf16,
            'E_ref_f64_cpu': HEIS24_E_REF,
            'dE_bf16': abs(E_bf16 - HEIS24_E_REF),
            'n_bf16_sweeps': n_acc,
            # bf16 storage rounding dominates dE and is platform-identical
            # (both CPU and TPU accumulate bf16-input matmuls in f32), so a
            # CPU-measured dE is faithful; the platform is recorded anyway.
            'platform': _jax.default_backend(),
        }
        _RESULT.update(result)
        try:  # persist for the default capture's accuracy_companion field
            rec = dict(result)
            rec['measured_at'] = time.strftime('%Y-%m-%dT%H:%M:%SZ',
                                               time.gmtime())
            with open(_ACCURACY_PATH, 'w') as f:
                json.dump(rec, f)
        except OSError:
            pass
        _emit()
        return
    if scenario == 'hubbard':
        # U(1)xU(1) many-small-sector matvec: unrolled vs grouped/padded GEMMs
        from cyten_tpu.config import config

        chi_h = int(os.environ.get('BENCH_CHI', '2048'))
        t_np, flops = numpy_run(chi_h, builder=build_hubbard_workload)
        t_unrolled = jax_run(chi_h, precision=precision,
                             builder=build_hubbard_workload)
        config.use_grouped_gemm = True
        try:
            t_grouped = jax_run(chi_h, precision=precision,
                                builder=build_hubbard_workload)
        finally:
            config.use_grouped_gemm = False
        best = min(t_unrolled, t_grouped)
        result = {
            'metric': f'hubbard_dmrg_matvec_chi{chi_h}_tflops',
            'value': round(flops / best / 1e12, 4),
            'unit': 'TFLOP/s',
            'vs_baseline': round(t_np / best, 3),
            'unrolled_ms': round(t_unrolled * 1e3, 4),
            'grouped_ms': round(t_grouped * 1e3, 4),
        }
        _RESULT.update(result)
        _emit()
        return
    if scenario == 'dense':
        # TFIM dense (no-symmetry backend): the pure-MXU BASELINE.json config
        chi_d = int(os.environ.get('BENCH_CHI', '4096'))
        t_np, flops = numpy_run(chi_d, builder=build_dense_workload)
        t_jax = jax_run(chi_d, precision=precision,
                        builder=build_dense_workload)
        result = {
            'metric': f'dense_tfi_matvec_chi{chi_d}_tflops',
            'value': round(flops / t_jax / 1e12, 4),
            'unit': 'TFLOP/s',
            'vs_baseline': round(t_np / t_jax, 3),
        }
        _RESULT.update(result)
        _emit()
        return
    if scenario == 'golden':
        # Fibonacci golden chain (anyonic F/R-heavy path): BASELINE.json config
        chi_mult = int(os.environ.get('BENCH_CHI_MULT', '512'))
        t_jax, t_np = su2_run(chi_mult, lengths=(10, 50), precision=precision,
                              builder=build_golden_workload)
        result = {
            'metric': f'golden_chain_matvec_{chi_mult}mult_ms',
            'value': round(t_jax * 1e3, 4),
            'unit': 'ms/iter',
            'vs_baseline': round(t_np / t_jax, 3),
        }
        _RESULT.update(result)
        _emit()
        return
    if scenario == 'su2_step':
        # the FULL fused bond update on the FUSION-TREE backend (SU(2)
        # Heisenberg): theta assembly + Lanczos + steady SVD + frozen-multiplet
        # truncation + env updates, one jitted program per iteration
        chi_mult = int(os.environ.get('BENCH_CHI_MULT', '512'))
        svd_mode = os.environ.get('BENCH_SVD_MODE', 'steady')
        n_lanczos = int(os.environ.get('BENCH_N_LANCZOS', '10'))
        t_step, _ = step_run(chi_mult, n_lanczos=n_lanczos, precision=precision,
                             svd_mode=svd_mode, builder=build_su2_workload)
        t_matvec, _ = su2_run(chi_mult, lengths=(10, 50), skip_numpy=True,
                              precision=precision)
        result = {
            'metric': f'su2_dmrg_step_{chi_mult}mult_{svd_mode}_ms',
            'value': round(t_step * 1e3, 4),
            'unit': 'ms/step',
            'vs_baseline': None,
            'matvec_ms': round(t_matvec * 1e3, 4),
        }
        _RESULT.update(result)
        _emit()
        return
    if scenario == 'su2':
        chi_mult = int(os.environ.get('BENCH_CHI_MULT', '512'))
        t_jax, t_np = su2_run(chi_mult, precision=precision)
        result = {
            'metric': f'su2_dmrg_matvec_{chi_mult}mult_ms',
            'value': round(t_jax * 1e3, 4),
            'unit': 'ms/iter',
            'vs_baseline': round(t_np / t_jax, 3),
        }
        _RESULT.update(result)
        _emit()
        return
    t_np, flops = numpy_run(chi)
    t_jax = jax_run(chi, precision=precision)
    result = {
        'metric': f'u1_dmrg_matvec_chi{chi}_tflops',
        'value': round(flops / t_jax / 1e12, 4),
        'unit': 'TFLOP/s',
        'vs_baseline': round(t_np / t_jax, 3),
    }
    _RESULT.update(result)
    _emit()


if __name__ == '__main__':
    main()
