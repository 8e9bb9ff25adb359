"""cyten_tpu: a TPU-native symmetric-tensor framework.

Block-sparse tensors with abelian, non-abelian and anyonic symmetries, built for
JAX/XLA/Pallas: all symmetry bookkeeping is static host-side metadata; under ``jit``
XLA sees only dense batched operations on the MXU.

Capability-equivalent to the reference tenpy/cyten library, redesigned TPU-first.
"""

from . import config as _config_module
from .config import config, printoptions
from .dtypes import Dtype
from .version import full_version as __version__
from . import symmetries
from . import tools
from . import blocks
from . import backends
from . import tensors
from .blocks import BlockBackend, get_block_backend
from .backends import TensorBackend, get_backend
from .symmetries import (
    SU2, SUN, U1, ZN, AbelianLegPipe, BraidChiralityUnspecifiedError, BraidingStyle,
    ElementarySpace, FermionNumber, FermionParity, FibonacciAnyonCategory,
    FusionStyle, FusionTree, IsingAnyonCategory, Leg, LegPipe, NoSymmetry,
    QuantumDoubleZNAnyonCategory, SU2_kAnyonCategory, SU3_3AnyonCategory, Sector,
    SectorArray, Space, Symmetry, SymmetryError, TensorProduct, ToricCodeCategory,
    ZNAnyonCategory, ZNAnyonCategory2, double_semion_category, fermion_number,
    fermion_parity, fibonacci_anyon_category, fusion_trees, ising_anyon_category,
    no_symmetry, semion_category, su2_symmetry, toric_code_category, u1_symmetry,
    z2_symmetry, z3_symmetry, z4_symmetry, z5_symmetry, z6_symmetry, z7_symmetry,
    z8_symmetry, z9_symmetry,
)
from .tensors import *  # noqa: F401,F403
from . import models
from . import algorithms
from . import parallel
from . import testing
from ._native import HAS_NATIVE
from ._native import add  # smoke-test binding, parity with reference _core.add
from .blocks import Block, NumpyBlockBackend
from .models import Coupling, Site, couplings, sites


def __getattr__(name):
    if name == 'TorchBlockBackend':  # lazy: avoid importing torch eagerly
        from .blocks import TorchBlockBackend

        return TorchBlockBackend
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')


def __dir__():
    # make the lazy TorchBlockBackend visible to dir() for reference API parity
    # (reference exports it eagerly at top level, cyten/__init__.py)
    return sorted(set(globals()) | {'TorchBlockBackend'})


# reference-parity aliases (cyten exposes these names at top level)
block_backends = blocks
dummy_config = _config_module
bool = Dtype.bool  # noqa: A001 — shadows builtins at module scope, like the reference
float32 = Dtype.float32
float64 = Dtype.float64
complex64 = Dtype.complex64
complex128 = Dtype.complex128


def show_config() -> None:
    """Print environment and configuration summary."""
    from .version import version_summary

    print(version_summary())
    print(config)

# attach reference-parity HDF5 hooks (save_hdf5/from_hdf5) to all persistable classes
from .tools.hdf5_io import _install_hdf5_hooks as _ih
_ih()
del _ih
