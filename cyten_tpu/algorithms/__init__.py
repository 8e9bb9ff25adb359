"""Tensor-network algorithms on cyten_tpu tensors.

Role-equivalent to reference ``toycodes/tenpy_toycodes/`` (SimpleMPS a_mps.py:9,
models b_model.py, DMRGEngine d_dmrg.py:117), promoted to a package of the framework.
"""

from .mps import SimpleMPS, split_truncate_theta
from .mpo import add_mpos, apply_mpo, compress_mpo
from .models import (
    FermiHubbardModel, HeisenbergModel, TFIModel, heisenberg_exact_finite_gs_energy,
    mpo_from_bond_op, mpo_from_bond_ops, tfi_exact_finite_gs_energy,
)
from .models import GoldenChainModel, KitaevChainModel, SpinChainModel
from .dmrg import (DMRGEngine, FaultError, HEffective, PlanarDMRGEngine,
                   PlanarHEffective)
from .dmrg1 import DMRG1SEngine, HEffective1
from .exp_mpo import ExpMPOEvolution, exp_mpo_from_terms, make_wii
from .excitations import ExcitationEngine, left_null_space
from .idmrg import MultiCellIDMRGEngine, iDMRGEngine
from .itdvp import iTDVPEngine
from .models import tfi_exact_infinite_gs_energy
from .purification import PurificationMPS, PurificationTEBD
from .tebd import TEBDEngine
from .tdvp import TDVP2Engine, TDVPEngine, TDVPQREngine
from .vumps import VUMPSEngine

__all__ = ['SimpleMPS', 'split_truncate_theta', 'apply_mpo', 'add_mpos',
           'compress_mpo', 'TFIModel', 'HeisenbergModel',
           'FermiHubbardModel', 'GoldenChainModel', 'KitaevChainModel', 'SpinChainModel',
           'mpo_from_bond_op', 'mpo_from_bond_ops',
           'tfi_exact_finite_gs_energy', 'heisenberg_exact_finite_gs_energy',
           'tfi_exact_infinite_gs_energy',
           'DMRGEngine', 'FaultError', 'HEffective', 'PlanarDMRGEngine',
           'PlanarHEffective',
           'DMRG1SEngine', 'HEffective1', 'ExcitationEngine', 'left_null_space',
           'ExpMPOEvolution', 'exp_mpo_from_terms', 'make_wii',
           'iDMRGEngine', 'MultiCellIDMRGEngine',
           'iTDVPEngine', 'TEBDEngine', 'PurificationMPS', 'PurificationTEBD',
           'TDVPEngine', 'TDVP2Engine', 'TDVPQREngine', 'VUMPSEngine']
