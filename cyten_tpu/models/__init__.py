"""Physics model building blocks: sites, degrees of freedom, couplings.

Role-equivalent to reference ``cyten/models/`` (degrees_of_freedom.py, sites.py,
couplings.py, tenpy_models.py).
"""

from .degrees_of_freedom import (
    AnyonDOF, BosonicDOF, ClockDOF, FermionicDOF, OccupationDOF, Site, SpinDOF,
)
from . import sites
from . import couplings
from .sites import (
    AnyonSite, ClockSite, FibonacciAnyonSite, GoldenSite, IsingAnyonSite,
    SpinHalfFermionSite, SpinHalfSite, SpinlessBosonSite, SpinlessFermionSite,
    SpinSite, SU2kSpin1Site,
)
from .couplings import Coupling
from .tenpy_models import CouplingModel, GoldenChain, GoldenModel, TFIModel

__all__ = [
    'Site', 'SpinDOF', 'OccupationDOF', 'BosonicDOF', 'FermionicDOF', 'ClockDOF',
    'AnyonDOF', 'sites', 'couplings', 'Coupling',
    'SpinSite', 'SpinHalfSite', 'SpinlessBosonSite', 'SpinlessFermionSite',
    'SpinHalfFermionSite', 'ClockSite', 'AnyonSite', 'FibonacciAnyonSite',
    'IsingAnyonSite', 'GoldenSite', 'SU2kSpin1Site',
    'CouplingModel', 'TFIModel', 'GoldenModel', 'GoldenChain',
]
