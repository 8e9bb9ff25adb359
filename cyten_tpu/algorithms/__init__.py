"""Tensor-network algorithms on cyten_tpu tensors.

Role-equivalent to reference ``toycodes/tenpy_toycodes/`` (SimpleMPS a_mps.py:9,
models b_model.py, DMRGEngine d_dmrg.py:117), promoted to a package of the framework.
"""

from .mps import SimpleMPS, split_truncate_theta
from .models import TFIModel, HeisenbergModel, tfi_exact_finite_gs_energy, \
    heisenberg_exact_finite_gs_energy
from .dmrg import DMRGEngine, HEffective

__all__ = ['SimpleMPS', 'split_truncate_theta', 'TFIModel', 'HeisenbergModel',
           'tfi_exact_finite_gs_energy', 'heisenberg_exact_finite_gs_energy',
           'DMRGEngine', 'HEffective']
