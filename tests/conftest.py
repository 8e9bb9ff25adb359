"""Test configuration.

Tests run on CPU with 8 virtual devices (for sharding tests) and 64-bit numerics
(the correctness bar is 1e-10 vs the reference CPU backend; TPU benchmarks use 32-bit).
Must configure the environment *before* jax is imported anywhere.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_enable_x64', True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption('--rng-seed', action='store', type=int, default=12345,
                     help='seed for the random generation of test tensors')


@pytest.fixture
def np_random(request) -> np.random.Generator:
    return np.random.default_rng(seed=request.config.getoption('--rng-seed'))
