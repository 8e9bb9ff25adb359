"""Concrete sites, each parameterized by a ``conserve`` option.

Role-equivalent to reference ``cyten/models/sites.py`` (SpinSite :28,
SpinlessBosonSite :131, SpinlessFermionSite :276, SpinHalfFermionSite :427,
ClockSite :585, AnyonSite :655, FibonacciAnyonSite :684, IsingAnyonSite :707,
GoldenSite :730, SU2kSpin1Site :751).

The ``conserve`` choice fixes the symmetry of the leg and thereby *which* operators
remain symmetric (SURVEY.md Appendix A.12): diagonal operators survive any abelian
conservation; charge-shifting operators become :class:`ChargedTensor`\\ s; only the
``'None'`` choice keeps everything as plain symmetric tensors.
"""

from __future__ import annotations

import numpy as np

from ..symmetries import (
    ElementarySpace, FermionNumber, FermionParity, SU2_kAnyonCategory, Symmetry, U1,
    ZN, fibonacci_anyon_category, ising_anyon_category, no_symmetry, su2_symmetry,
    u1_symmetry,
)
from .degrees_of_freedom import (
    BosonicDOF, ClockDOF, FermionicDOF, OccupationDOF, Site, SpinDOF,
)

__all__ = ['SpinSite', 'SpinHalfSite', 'SpinlessBosonSite', 'SpinlessFermionSite',
           'SpinHalfFermionSite', 'ClockSite', 'AnyonSite', 'FibonacciAnyonSite',
           'IsingAnyonSite', 'GoldenSite', 'SU2kSpin1Site']


class SpinSite(Site):
    """Spin-S site. ``conserve`` in {'SU(2)', 'Sz', 'parity', 'None'}."""

    def __init__(self, S: float = 0.5, conserve: str = 'Sz', backend=None):
        assert conserve in ('SU(2)', 'SU2', 'Sz', 'parity', 'None', None)
        conserve = conserve or 'None'
        self.S = S
        self.conserve = conserve
        d = int(round(2 * S + 1))
        ops = SpinDOF.spin_ops(S)
        if conserve in ('SU(2)', 'SU2'):
            leg = ElementarySpace(su2_symmetry, [[d - 1]])
            site_ops = {}  # only SU(2)-scalars; Sz etc. are not
        elif conserve == 'Sz':
            leg = ElementarySpace.from_basis(
                u1_symmetry, [[int(round(2 * m))] for m in (S - np.arange(d))])
            site_ops = {k: ops[k] for k in ('Sz', 'Sz2', 'Sp', 'Sm')}
        elif conserve == 'parity':
            leg = ElementarySpace.from_basis(
                ZN(2, 'parity').as_Symmetry(), [[i % 2] for i in range(d)])
            site_ops = {k: ops[k] for k in ('Sz', 'Sz2', 'Sp', 'Sm', 'Sx')}
        else:
            leg = ElementarySpace.from_trivial_sector(d, symmetry=no_symmetry)
            site_ops = {k: ops[k] for k in ('Sz', 'Sz2', 'Sp', 'Sm', 'Sx', 'Sy')}
        labels = {}
        if d == 2:
            labels = {'up': 0, 'down': 1}
        Site.__init__(self, leg, backend=backend, state_labels=labels, **site_ops)


class SpinHalfSite(SpinSite):
    def __init__(self, conserve: str = 'Sz', backend=None):
        SpinSite.__init__(self, S=0.5, conserve=conserve, backend=backend)


class SpinlessBosonSite(Site):
    """Boson site with occupation cutoff. ``conserve`` in {'N', 'parity', 'None'}."""

    def __init__(self, n_max: int = 2, conserve: str = 'N', backend=None):
        assert conserve in ('N', 'parity', 'None', None)
        conserve = conserve or 'None'
        self.n_max = n_max
        self.conserve = conserve
        d = n_max + 1
        ops = BosonicDOF.occupation_ops(n_max)
        if conserve == 'N':
            leg = ElementarySpace.from_basis(
                U1('N').as_Symmetry(), [[n] for n in range(d)])
        elif conserve == 'parity':
            leg = ElementarySpace.from_basis(
                ZN(2, 'parity_N').as_Symmetry(), [[n % 2] for n in range(d)])
        else:
            leg = ElementarySpace.from_trivial_sector(d, symmetry=no_symmetry)
        labels = {'vac': 0}
        Site.__init__(self, leg, backend=backend, state_labels=labels,
                      N=ops['N'], NN=ops['NN'], dN=ops['dN'], B=ops['B'],
                      Bd=ops['Bd'])


class SpinlessFermionSite(Site):
    """Spinless fermion site with graded symmetry for inter-site statistics.

    ``conserve='N'`` uses the graded :class:`FermionNumber`, ``'parity'`` uses
    :class:`FermionParity` — in both cases the *braiding* of the symmetry carries
    the fermionic signs, so couplings need no explicit inter-site JW strings
    (reference degrees_of_freedom.py:577-661).
    """

    def __init__(self, conserve: str = 'N', backend=None):
        assert conserve in ('N', 'parity', 'None', None)
        conserve = conserve or 'None'
        self.conserve = conserve
        ops = FermionicDOF.fermion_ops()
        if conserve == 'N':
            leg = ElementarySpace.from_basis(
                FermionNumber().as_Symmetry(), [[0], [1]])
        elif conserve == 'parity':
            leg = ElementarySpace.from_basis(
                FermionParity().as_Symmetry(), [[0], [1]])
        else:
            leg = ElementarySpace.from_trivial_sector(2, symmetry=no_symmetry)
        labels = {'empty': 0, 'full': 1}
        Site.__init__(self, leg, backend=backend, state_labels=labels,
                      N=ops['N'], JW=ops['JW'], C=ops['C'], Cd=ops['Cd'])

    def get_annihilator_numpy(self, include_JW: bool = True) -> np.ndarray:
        return FermionicDOF.get_annihilator_numpy({}, 0, 1, include_JW=include_JW)


class SpinHalfFermionSite(Site):
    """Spin-1/2 fermion site (dim 4): |0>, |up>, |down>, |updown>.

    ``conserve_N`` in {'N', 'parity', 'None'}; ``conserve_S`` in {'Sz', 'None'}.
    Intra-site JW strings between the two species are included in the annihilators
    (reference degrees_of_freedom.py:625-661).
    """

    def __init__(self, conserve_N: str = 'N', conserve_S: str = 'Sz', backend=None):
        assert conserve_N in ('N', 'parity', 'None', None)
        assert conserve_S in ('Sz', 'None', None)
        conserve_N = conserve_N or 'None'
        conserve_S = conserve_S or 'None'
        self.conserve_N = conserve_N
        self.conserve_S = conserve_S
        # basis: |0>, |up>, |down>, |updown>;  species 0 = up, species 1 = down
        Cu = FermionicDOF.get_annihilator_numpy({}, 0, 2, include_JW=False)
        Cd_dn = FermionicDOF.get_annihilator_numpy({}, 1, 2, include_JW=True)
        # reorder kron basis (up x down): (0,0)=|0>, (0,1)=|down>, (1,0)=|up>, (1,1)
        perm = [0, 2, 1, 3]
        P = np.eye(4)[perm]
        Cu = P @ Cu @ P.T
        Cdn = P @ Cd_dn @ P.T
        Nu = Cu.T @ Cu
        Nd = Cdn.T @ Cdn
        Ntot = Nu + Nd
        Sz = 0.5 * (Nu - Nd)
        Sp = Cu.T @ Cdn   # S+ = c†_up c_down
        JW = np.diag([1., -1., -1., 1.])
        n_factors = []
        sectors = []
        if conserve_N == 'N':
            n_factors.append(FermionNumber('N'))
            sectors.append([0, 1, 1, 2])
        elif conserve_N == 'parity':
            n_factors.append(FermionParity('parity'))
            sectors.append([0, 1, 1, 0])
        if conserve_S == 'Sz':
            n_factors.append(U1('2*Sz'))
            sectors.append([0, 1, -1, 0])
        if not n_factors:
            leg = ElementarySpace.from_trivial_sector(4, symmetry=no_symmetry)
        else:
            symmetry = Symmetry(n_factors)
            basis_sectors = np.array(sectors).T
            leg = ElementarySpace.from_basis(symmetry, basis_sectors)
        labels = {'empty': 0, 'up': 1, 'down': 2, 'full': 3}
        Site.__init__(self, leg, backend=backend, state_labels=labels,
                      Nu=Nu, Nd=Nd, Ntot=Ntot, NuNd=Nu @ Nd, Sz=Sz, JW=JW,
                      Cu=Cu, Cdu=Cu.T.copy(), Cdn=Cdn, Cddn=Cdn.T.copy(), Sp=Sp,
                      Sm=Sp.T.copy())

    def get_annihilator_numpy(self, species: int, include_JW: bool = True
                              ) -> np.ndarray:
        perm = [0, 2, 1, 3]
        P = np.eye(4)[perm]
        C = FermionicDOF.get_annihilator_numpy({}, species, 2, include_JW=include_JW)
        return P @ C @ P.T


class ClockSite(Site):
    """q-state clock site. ``conserve`` in {'Z', 'None'}."""

    def __init__(self, q: int = 3, conserve: str = 'Z', backend=None):
        assert conserve in ('Z', 'None', None)
        conserve = conserve or 'None'
        self.q = q
        self.conserve = conserve
        ops = ClockDOF.clock_ops(q)
        if conserve == 'Z':
            leg = ElementarySpace.from_basis(
                ZN(q, 'clock').as_Symmetry(), [[k] for k in range(q)])
        else:
            leg = ElementarySpace.from_trivial_sector(q, symmetry=no_symmetry)
        Site.__init__(self, leg, backend=backend, Z=ops['Z'], Zhc=ops['Zhc'],
                      X=ops['X'], Xhc=ops['Xhc'])


class AnyonSite(Site):
    """A site carrying a single anyon of the given fusion category."""

    def __init__(self, symmetry, sector, backend=None):
        symmetry = symmetry.as_Symmetry()
        leg = ElementarySpace(symmetry, np.asarray(sector, int)[None, :])
        self.sector = np.asarray(sector, int)
        Site.__init__(self, leg, backend=backend)


class FibonacciAnyonSite(AnyonSite):
    """One Fibonacci tau anyon."""

    def __init__(self, backend=None):
        AnyonSite.__init__(self, fibonacci_anyon_category, [1], backend=backend)


class GoldenSite(FibonacciAnyonSite):
    """Alias used by the golden-chain model (reference sites.py:730)."""


class IsingAnyonSite(AnyonSite):
    """One Ising sigma anyon."""

    def __init__(self, backend=None):
        AnyonSite.__init__(self, ising_anyon_category, [1], backend=backend)


class SU2kSpin1Site(AnyonSite):
    """The 'spin-1' object of the SU(2)_k anyon category (reference sites.py:751)."""

    def __init__(self, k: int = 2, backend=None):
        AnyonSite.__init__(self, SU2_kAnyonCategory(k).as_Symmetry(), [2],
                           backend=backend)
