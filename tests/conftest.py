"""Test configuration.

Mirrors the reference's fixture-matrix strategy (reference conftest.py:239-341):
parametrize over block backends x symmetries, seeded RNG, and provide factories for
random spaces/tensors with guaranteed non-empty block structure.

JAX runs on CPU with x64 enabled and a virtual 8-device mesh for sharding tests.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

# note: the JAX_PLATFORMS env var is overridden by the environment's TPU plugin;
# the config update reliably forces CPU (with the virtual 8-device mesh from XLA_FLAGS)
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# persistent XLA compilation cache: the suite is dominated by jit compiles of
# DMRG/TDVP bond programs; re-runs hit the cache and take minutes, not ~45 min
_cache_dir = os.path.join(os.path.dirname(__file__), '.jax_cache')
try:
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
except Exception:
    pass  # older jax without the knob: run uncached

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import ElementarySpace, Symmetry


def pytest_addoption(parser):
    # reference parity (reference conftest.py:160-162)
    parser.addoption('--block-backends', action='store', default='numpy,jax,torch',
                     help='Comma-separated block-backend names to test')
    parser.addoption('--rng-seed', action='store', default=12345, type=int,
                     help='The rng seed')
    parser.addoption('--shard', action='store', default=None,
                     help='Deterministic suite slice "k/N" (k = 1..N): run '
                          'only tests whose stable id-hash lands in slice k. '
                          'The union over k = 1..N is exactly the full suite; '
                          'lets a session revalidate the full matrix in '
                          'bounded chunks (see tests/README_SHARDS.md)')


def pytest_collection_modifyitems(config, items):
    shard = config.getoption('--shard')
    if not shard:
        return
    import zlib

    k, n = (int(x) for x in shard.split('/'))
    assert 1 <= k <= n, f'--shard {shard}: need 1 <= k <= N'
    kept = [it for it in items
            if zlib.crc32(it.nodeid.encode()) % n == k - 1]
    deselected = [it for it in items
                  if zlib.crc32(it.nodeid.encode()) % n != k - 1]
    items[:] = kept
    config.hook.pytest_deselected(items=deselected)


def pytest_generate_tests(metafunc):
    if 'block_backend' in metafunc.fixturenames:
        names = metafunc.config.getoption('--block-backends').split(',')
        metafunc.parametrize('block_backend', [n.strip() for n in names if n])


@pytest.fixture
def np_random(request) -> np.random.Generator:
    return np.random.default_rng(seed=request.config.getoption('--rng-seed'))


_SYMMETRIES = {
    'NoSymm': ct.no_symmetry,
    'U1': ct.u1_symmetry,
    'Z4': ct.z4_symmetry,
    'U1xZ3': ct.u1_symmetry * ct.z3_symmetry.factors[0],
    'SU2': ct.su2_symmetry,  # non-abelian: exercises the fusion-tree backend
    # braided symmetries (reference conftest.py:239-251 fixture matrix):
    'fermion': ct.fermion_parity,           # graded, symmetric braid (signs)
    'FermionNumber': ct.fermion_number,
    'FibonacciAnyon': ct.fibonacci_anyon_category,   # no dense representation
    'IsingAnyon': ct.ising_anyon_category,
    'FibU1': ct.fibonacci_anyon_category * ct.u1_symmetry.factors[0],
    # multiplicity-rich: N(8,8->8) = 2 — pins the fusion-multiplicity label
    # handling that every other entry is blind to (caught the outer
    # embedding-pairing bug, see backends/fusion_tree.py::outer)
    'SU3': ct.symmetries.SUN(3).as_Symmetry(),
}


@pytest.fixture(params=list(_SYMMETRIES.keys()))
def any_symmetry(request):
    return _SYMMETRIES[request.param]


def braid_levels(symmetry, num_legs, rng=None):
    """Levels to pass to braiding ops: None when the braid is symmetric (then the
    chirality doesn't matter), else an explicit assignment."""
    if symmetry.has_symmetric_braid:
        return None
    if rng is not None:
        return list(rng.permutation(num_legs))
    return list(range(num_legs))


@pytest.fixture
def block_backend(request):
    # parametrized via pytest_generate_tests (--block-backends option)
    return request.param


@pytest.fixture
def make_compatible_backend(any_symmetry, block_backend):
    return ct.get_backend(any_symmetry, block_backend)


def random_space(symmetry: Symmetry, rng: np.random.Generator, max_sectors=4,
                 max_mult=4, is_dual=None) -> ElementarySpace:
    """A random ElementarySpace with a few sectors."""
    if is_dual is None:
        is_dual = bool(rng.integers(2))
    if symmetry.num_sectors != np.inf and symmetry.num_sectors < 100:
        candidates = symmetry.all_sectors()
    else:
        # sample small sector entries per factor, keeping only valid ones
        cols = []
        for f in symmetry.factors:
            if type(f).__name__ == 'SUN':
                # small-irrep pool (dims 1, 3, 3bar, 8): random integer rows are
                # almost never valid GT labels, and large irreps make the CG
                # tensors (hence dense oracles) expensive
                pool = np.array([[0] * f.N,
                                 [1] + [0] * (f.N - 1),
                                 [1] * (f.N - 1) + [0],
                                 [2] + [1] * (f.N - 2) + [0]])
                cols.append(pool[rng.integers(0, len(pool), size=20)])
            elif f.num_sectors == np.inf:
                raw = rng.integers(-2, 5, size=(40, f.sector_ind_len))
                raw = raw[[f.is_valid_sector(r) for r in raw]]
                cols.append(raw[:20] if len(raw) >= 20
                            else np.repeat(raw, 3, axis=0)[:20])
            else:
                all_f = f.all_sectors()
                cols.append(all_f[rng.integers(0, len(all_f), size=20)])
        candidates = np.unique(np.concatenate(cols, axis=1), axis=0)
    n = min(len(candidates), int(rng.integers(1, max_sectors + 1)))
    which = rng.choice(len(candidates), size=n, replace=False)
    mults = rng.integers(1, max_mult + 1, size=n)
    return ElementarySpace.from_defining_sectors(
        symmetry, candidates[which], mults, is_dual=is_dual, unique_sectors=True)
