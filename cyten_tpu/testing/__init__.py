"""Test utilities: random generation, assertions, dense braid oracles.

Role-equivalent to reference ``cyten/testing/`` (random_generation.py, asserting.py,
swap_gate_numpy.py).
"""

from .random_generation import (
    random_ElementarySpace, random_leg, random_tensor, randomly_drop_blocks,
)
from .asserting import assert_tensors_almost_equal
from .swap_gate_numpy import swap_gate_numpy, permutation_as_swaps

__all__ = ['random_ElementarySpace', 'random_leg', 'random_tensor',
           'randomly_drop_blocks', 'assert_tensors_almost_equal',
           'swap_gate_numpy', 'permutation_as_swaps']
