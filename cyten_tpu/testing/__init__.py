"""Test utilities: random generation, assertions, dense braid oracles.

Role-equivalent to reference ``cyten/testing/`` (random_generation.py, asserting.py,
swap_gate_numpy.py).
"""

from .random_generation import (
    check_tensor_memory_usage, find_last_leg, random_ElementarySpace,
    random_LegPipe, random_block, random_factor_sectors, random_leg,
    random_symmetry_sectors, random_tensor, randomly_drop_blocks,
)
from .asserting import assert_tensors_almost_equal
from .swap_gate_numpy import swap_gate_numpy, permutation_as_swaps

__all__ = ['random_ElementarySpace', 'random_leg', 'random_tensor',
           'randomly_drop_blocks', 'random_block', 'random_factor_sectors',
           'random_symmetry_sectors', 'random_LegPipe', 'find_last_leg',
           'check_tensor_memory_usage', 'assert_tensors_almost_equal',
           'swap_gate_numpy', 'permutation_as_swaps']
