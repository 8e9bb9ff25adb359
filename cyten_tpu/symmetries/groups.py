"""Group symmetries: trivial, U(1), Z_N, SU(2), SU(N).

Role-equivalent to the group classes of reference ``cyten/symmetries/_symmetries.py``
(NoSymmetry :1304, U1 :1354, ZN :1400, SU2 :1467, SUN :1590, Group :1194,
AbelianGroup :1241).
"""

from __future__ import annotations

import itertools
import math

import numpy as np

from ..dtypes import Dtype
from ..tools.misc import as_immutable_array
from . import su2_data
from .core import (
    _ONE_1D, _ONE_2D, _ONE_2D_F, _ONE_4D, _ONE_4D_F, BraidingStyle, FusionStyle, Sector,
    SectorArray, Symmetry, SymmetryError, SymmetryFactor,
)

__all__ = ['Group', 'AbelianGroup', 'NoSymmetry', 'U1', 'ZN', 'SU2', 'SUN']


class Group(SymmetryFactor):
    """Base for symmetries described by a compact group: bosonic braiding, trivial twists."""

    def __init__(self, fusion_style: FusionStyle, trivial_sector: Sector, group_name: str,
                 num_sectors: int | float, has_complex_topological_data: bool,
                 descriptive_name: str | None = None):
        SymmetryFactor.__init__(
            self, fusion_style=fusion_style, braiding_style=BraidingStyle.bosonic,
            trivial_sector=trivial_sector, group_name=group_name, num_sectors=num_sectors,
            has_complex_topological_data=has_complex_topological_data,
            descriptive_name=descriptive_name)

    def swap_gate(self, a: Sector, b: Sector) -> np.ndarray:
        """Group braiding is the plain flip: X[b,a,b*,a*] = δ_{b,b*} δ_{a,a*}."""
        d_a, d_b = self.sector_dim(a), self.sector_dim(b)
        eye = np.einsum('bq,ap->baqp', np.eye(d_b), np.eye(d_a))
        return eye

    def qdim(self, a: Sector) -> float:
        return self.sector_dim(a)

    def batch_qdim(self, a: SectorArray) -> np.ndarray:
        return self.batch_sector_dim(a)

    def topological_twist(self, a: Sector) -> complex:
        return +1


class AbelianGroup(Group):
    """Base for abelian groups: 1D sectors, unique fusion, trivial topological data."""

    fusion_tensor_dtype = Dtype.float64

    def __init__(self, trivial_sector: Sector, group_name: str, num_sectors: int | float,
                 descriptive_name: str | None = None):
        Group.__init__(self, fusion_style=FusionStyle.single,
                       trivial_sector=trivial_sector, group_name=group_name,
                       num_sectors=num_sectors, has_complex_topological_data=False,
                       descriptive_name=descriptive_name)

    def sector_str(self, a: Sector) -> str:
        return str(a[0]) if len(a) == 1 else str(a)

    def sector_dim(self, a: Sector) -> int:
        return 1

    def batch_sector_dim(self, a: SectorArray) -> np.ndarray:
        return np.ones((len(a),), int)

    def _n_symbol(self, a, b, c) -> int:
        return 1

    def _f_symbol(self, a, b, c, d, e, f) -> np.ndarray:
        return _ONE_4D

    def frobenius_schur(self, a: Sector) -> int:
        return 1

    def qdim(self, a: Sector) -> float:
        return 1

    def sqrt_qdim(self, a: Sector) -> float:
        return 1

    def inv_sqrt_qdim(self, a: Sector) -> float:
        return 1

    def _b_symbol(self, a, b, c) -> np.ndarray:
        return _ONE_2D

    def _r_symbol(self, a, b, c) -> np.ndarray:
        return _ONE_1D

    def _c_symbol(self, a, b, c, d, e, f) -> np.ndarray:
        return _ONE_4D

    def _fusion_tensor(self, a, b, c, Z_a: bool, Z_b: bool) -> np.ndarray:
        return _ONE_4D_F

    def Z_iso(self, a: Sector) -> np.ndarray:
        return _ONE_2D_F


class NoSymmetry(AbelianGroup):
    """Trivial symmetry: a single sector ``[0]``."""

    def __init__(self):
        AbelianGroup.__init__(self, trivial_sector=np.array([0], dtype=int),
                              group_name='no_symmetry', num_sectors=1)

    def is_valid_sector(self, a: Sector) -> bool:
        return getattr(a, 'shape', ()) == (1,) and a[0] == 0

    def are_valid_sectors(self, sectors) -> bool:
        shape = getattr(sectors, 'shape', ())
        return len(shape) == 2 and shape[1] == 1 and np.all(sectors == 0)

    def fusion_outcomes(self, a: Sector, b: Sector) -> SectorArray:
        return a[np.newaxis, :]

    def fusion_outcomes_broadcast(self, a: SectorArray, b: SectorArray) -> SectorArray:
        return a

    def _multiple_fusion_broadcast(self, *sectors: SectorArray) -> SectorArray:
        return sectors[0]

    def dual_sector(self, a: Sector) -> Sector:
        return a

    def dual_sectors(self, sectors: SectorArray) -> SectorArray:
        return sectors

    def all_sectors(self) -> SectorArray:
        return self.trivial_sector[np.newaxis, :]

    def sector_str(self, a: Sector) -> str:
        return '.'

    def __repr__(self):
        return 'NoSymmetry()'

    def _is_equivalent_factor(self, other) -> bool:
        return isinstance(other, NoSymmetry)


class U1(AbelianGroup):
    """U(1) symmetry; sectors are single integer charges."""

    def __init__(self, descriptive_name: str | None = None):
        AbelianGroup.__init__(self, trivial_sector=np.array([0], dtype=int),
                              group_name='U(1)', num_sectors=np.inf,
                              descriptive_name=descriptive_name)

    def is_valid_sector(self, a: Sector) -> bool:
        return getattr(a, 'shape', ()) == (1,)

    def are_valid_sectors(self, sectors) -> bool:
        shape = getattr(sectors, 'shape', ())
        return len(shape) == 2 and shape[1] == 1

    def fusion_outcomes(self, a: Sector, b: Sector) -> SectorArray:
        return (a + b)[np.newaxis, :]

    def fusion_outcomes_broadcast(self, a: SectorArray, b: SectorArray) -> SectorArray:
        return a + b

    def _multiple_fusion_broadcast(self, *sectors: SectorArray) -> SectorArray:
        return sum(sectors)

    def dual_sector(self, a: Sector) -> Sector:
        return -a

    def dual_sectors(self, sectors: SectorArray) -> SectorArray:
        return -sectors

    def __repr__(self):
        name = '' if self.descriptive_name is None else f'"{self.descriptive_name}"'
        return f'U1({name})'

    def _is_equivalent_factor(self, other) -> bool:
        return isinstance(other, U1)


class ZN(AbelianGroup):
    """Z_N cyclic group; sectors are single integers mod N."""

    def __init__(self, N: int, descriptive_name: str | None = None):
        if not isinstance(N, (int, np.integer)) or N < 1:
            raise ValueError(f'invalid N: {N}')
        self.N = int(N)
        subscripts = str.maketrans('0123456789', '₀₁₂₃₄₅₆₇₈₉')
        AbelianGroup.__init__(self, trivial_sector=np.array([0], dtype=int),
                              group_name=f'Z{str(N).translate(subscripts)}',
                              num_sectors=self.N, descriptive_name=descriptive_name)

    def is_valid_sector(self, a: Sector) -> bool:
        return getattr(a, 'shape', ()) == (1,) and 0 <= a[0] < self.N

    def are_valid_sectors(self, sectors) -> bool:
        shape = getattr(sectors, 'shape', ())
        return (len(shape) == 2 and shape[1] == 1
                and bool(np.all(0 <= sectors)) and bool(np.all(sectors < self.N)))

    def fusion_outcomes(self, a: Sector, b: Sector) -> SectorArray:
        return ((a + b) % self.N)[np.newaxis, :]

    def fusion_outcomes_broadcast(self, a: SectorArray, b: SectorArray) -> SectorArray:
        return (a + b) % self.N

    def _multiple_fusion_broadcast(self, *sectors: SectorArray) -> SectorArray:
        return sum(sectors) % self.N

    def dual_sector(self, a: Sector) -> Sector:
        return (-a) % self.N

    def dual_sectors(self, sectors: SectorArray) -> SectorArray:
        return (-sectors) % self.N

    def all_sectors(self) -> SectorArray:
        return np.arange(self.N, dtype=int)[:, None]

    def __repr__(self):
        name = '' if self.descriptive_name is None else f', "{self.descriptive_name}"'
        return f'ZN({self.N}{name})'

    def _is_equivalent_factor(self, other) -> bool:
        return isinstance(other, ZN) and other.N == self.N

    def _init_args(self) -> dict:
        return {'N': self.N}


class SU2(Group):
    """SU(2) symmetry. Sectors ``[jj]`` with ``jj = 2 * j`` a non-negative integer.

    Topological data comes from exact CG / 6j arithmetic in :mod:`.su2_data`.
    """

    fusion_tensor_dtype = Dtype.float64
    spin_zero = as_immutable_array(np.array([0], dtype=int))
    spin_half = as_immutable_array(np.array([1], dtype=int))
    spin_one = as_immutable_array(np.array([2], dtype=int))

    def __init__(self, descriptive_name: str | None = None):
        Group.__init__(self, fusion_style=FusionStyle.multiple_unique,
                       trivial_sector=np.array([0], dtype=int), group_name='SU(2)',
                       num_sectors=np.inf, has_complex_topological_data=False,
                       descriptive_name=descriptive_name)

    def is_valid_sector(self, a: Sector) -> bool:
        return getattr(a, 'shape', ()) == (1,) and a[0] >= 0

    def are_valid_sectors(self, sectors) -> bool:
        shape = getattr(sectors, 'shape', ())
        return len(shape) == 2 and shape[1] == 1 and bool(np.all(sectors >= 0))

    def fusion_outcomes(self, a: Sector, b: Sector) -> SectorArray:
        lo = abs(int(a[0]) - int(b[0]))
        hi = int(a[0]) + int(b[0])
        return np.arange(lo, hi + 2, 2)[:, np.newaxis]

    def can_fuse_to(self, a: Sector, b: Sector, c: Sector) -> bool:
        return bool((c[0] <= a[0] + b[0]) and (a[0] <= b[0] + c[0])
                    and (b[0] <= c[0] + a[0]) and ((a[0] + b[0] + c[0]) % 2 == 0))

    def sector_dim(self, a: Sector) -> int:
        return int(a[0]) + 1

    def batch_sector_dim(self, a: SectorArray) -> np.ndarray:
        if len(a) == 0:
            return np.zeros([0], dtype=int)
        return a[:, 0] + 1

    def sector_str(self, a: Sector) -> str:
        jj = int(a[0])
        return f'{jj} (J={jj // 2 if jj % 2 == 0 else f"{jj}/2"})'

    def __repr__(self):
        name = '' if self.descriptive_name is None else f'"{self.descriptive_name}"'
        return f'SU2({name})'

    def _is_equivalent_factor(self, other) -> bool:
        return isinstance(other, SU2)

    def dual_sector(self, a: Sector) -> Sector:
        return a  # self-dual

    def dual_sectors(self, sectors: SectorArray) -> SectorArray:
        return sectors

    def _n_symbol(self, a, b, c) -> int:
        return 1

    def _f_symbol(self, a, b, c, d, e, f) -> np.ndarray:
        return su2_data.f_symbol(int(a[0]), int(b[0]), int(c[0]), int(d[0]),
                                 int(e[0]), int(f[0]))

    def frobenius_schur(self, a: Sector) -> int:
        return 1 - 2 * (int(a[0]) % 2)

    def qdim(self, a: Sector) -> float:
        return int(a[0]) + 1

    def _r_symbol(self, a, b, c) -> np.ndarray:
        # (-1)^{j_a + j_b - j_c}: +1 for even integer sum, -1 for odd
        return 1 - (a + b - c) % 4

    def _fusion_tensor(self, a, b, c, Z_a: bool, Z_b: bool) -> np.ndarray:
        X = su2_data.fusion_tensor(int(a[0]), int(b[0]), int(c[0]))
        if Z_a:
            # compose Z below leg a: [μ, m_a, m_b, m_c] x [m_a, m_ā*] -> move to axis 1
            X = np.moveaxis(np.tensordot(X, self.Z_iso(self.dual_sector(a)), (1, 0)), -1, 1)
        if Z_b:
            X = np.moveaxis(np.tensordot(X, self.Z_iso(self.dual_sector(b)), (2, 0)), -1, 2)
        return X

    def Z_iso(self, a: Sector) -> np.ndarray:
        return su2_data.Z_iso(int(a[0]))


class SUN(Group):
    """SU(N) symmetry for N >= 3.

    Sectors are the first rows of normalized Gelfand-Tsetlin patterns: non-increasing
    length-N integer arrays ending in 0 (e.g. the SU(3) adjoint is ``[2, 1, 0]``).

    ALL topological data is computed natively — unlike the reference
    (cyten/symmetries/_symmetries.py:1590), which requires precomputed HDF5 files
    even for fusion rules. Fusion and dimensions use the Littlewood-Richardson
    rule and the Weyl dimension formula; Clebsch-Gordan tensors are computed on
    demand in the Gelfand-Tsetlin basis (``sun_cg.py``, Alex-von Delft
    algorithm), and F/R/B/C symbols, Z isomorphisms and Frobenius-Schur
    indicators derive from them in a gauge where every R symbol is diagonal
    with entries +-1. Precomputed HDF5 files (``CGfile``/``Ffile``/``Rfile``,
    reference format) may still be passed to override the native data.
    """

    fusion_tensor_dtype = Dtype.float64

    def __init__(self, N: int, CGfile: str | None = None, Ffile: str | None = None,
                 Rfile: str | None = None, cache_file: str | None = None,
                 descriptive_name: str | None = None):
        assert isinstance(N, (int, np.integer)) and N >= 2
        self.N = int(N)
        self.CGfile = CGfile
        self.Ffile = Ffile
        self.Rfile = Rfile
        #: optional HDF5 path: computed CG tensors are persisted here and reused
        #: across sessions (native disk cache; CG generation for SU(N >= 4)
        #: sectors of dim ~100 takes seconds each and is worth caching once)
        self.cache_file = cache_file
        self._h5 = {}
        self._disk = None
        Group.__init__(self, fusion_style=FusionStyle.general,
                       trivial_sector=np.zeros(self.N, dtype=int),
                       group_name=f'SU({N})', num_sectors=np.inf,
                       has_complex_topological_data=False,
                       descriptive_name=descriptive_name)

    def _init_args(self) -> dict:
        return {'N': self.N, 'CGfile': self.CGfile, 'Ffile': self.Ffile,
                'Rfile': self.Rfile, 'cache_file': self.cache_file}

    # --- disk cache (native format: flat keys, one dataset per CG tensor) -----------

    def _disk_cache(self):
        if self._disk is None and self.cache_file is not None:
            import h5py

            self._disk = h5py.File(self.cache_file, 'a')
            self._disk.attrs['N'] = self.N
        return self._disk

    def _disk_get(self, ta, tb, tc):
        disk = self._disk_cache()
        if disk is None:
            return None
        key = 'CG/' + self._group_name([ta, tb, tc])
        if key in disk:
            X = np.asarray(disk[key])
            X.setflags(write=False)
            return X
        return None

    def _disk_put(self, ta, tb, tc, X):
        disk = self._disk_cache()
        if disk is None:
            return
        key = 'CG/' + self._group_name([ta, tb, tc])
        if key not in disk:
            disk.create_dataset(key, data=np.asarray(X))
            disk.flush()

    def is_valid_sector(self, a: Sector) -> bool:
        if getattr(a, 'shape', ()) != (self.N,):
            return False
        return bool(np.all(a[:-1] >= a[1:]) and a[-1] == 0)

    def are_valid_sectors(self, sectors) -> bool:
        shape = getattr(sectors, 'shape', ())
        return (len(shape) == 2 and shape[1] == self.N
                and bool(np.all(sectors[:, :-1] >= sectors[:, 1:]))
                and bool(np.all(sectors[:, -1] == 0)))

    def sector_dim(self, a: Sector) -> int:
        """Weyl dimension formula: prod_{i<j} (a_i - a_j + j - i) / (j - i)."""
        num = 1
        den = 1
        for i in range(self.N):
            for j in range(i + 1, self.N):
                num *= int(a[i]) - int(a[j]) + j - i
                den *= j - i
        return num // den

    def batch_sector_dim(self, a: SectorArray) -> np.ndarray:
        return np.array([self.sector_dim(s) for s in a], dtype=int)

    def qdim(self, a: Sector) -> float:
        return self.sector_dim(a)

    def dual_sector(self, a: Sector) -> Sector:
        # conjugate rep: reverse, negate, shift so the last entry is 0
        return (int(a[0]) - a)[::-1].copy()

    def dual_sectors(self, sectors: SectorArray) -> SectorArray:
        return np.stack([self.dual_sector(s) for s in sectors]) if len(sectors) else sectors

    def fusion_outcomes(self, a: Sector, b: Sector) -> SectorArray:
        """Distinct outcomes of a ⊗ b via the Littlewood-Richardson rule (mod column trick)."""
        counts = self._lr_multiplicities(a, b)
        rows = sorted(counts.keys())
        return np.array(rows, dtype=int).reshape(len(rows), self.N)

    def _n_symbol(self, a, b, c) -> int:
        return self._lr_multiplicities(a, b).get(tuple(int(x) for x in c), 0)

    def _lr_multiplicities(self, a: Sector, b: Sector) -> dict[tuple, int]:
        key = ('LR', tuple(int(x) for x in a), tuple(int(x) for x in b))
        res = self._cache.get(key)
        if res is not None:
            return res
        counts: dict[tuple, int] = {}
        for lam in _LRChains.expand(tuple(int(x) for x in a), tuple(int(x) for x in b),
                                    self.N):
            # reduce columns of height N: subtract lam[-1] from all rows
            red = tuple(x - lam[-1] for x in lam)
            counts[red] = counts.get(red, 0) + 1
        self._cache[key] = counts
        return counts

    def can_fuse_to(self, a, b, c) -> bool:
        return self._n_symbol(a, b, c) > 0

    # --- data-file-backed topological data -----------------------------------------

    def _load_h5(self, which: str):
        path = {'CG': self.CGfile, 'F': self.Ffile, 'R': self.Rfile}[which]
        if path is None:
            raise SymmetryError(
                f'SU({self.N}) {which} data requires a precomputed HDF5 file; '
                f'pass {which}file= to the constructor.')
        if which not in self._h5:
            import h5py

            self._h5[which] = h5py.File(path, 'r')
        return self._h5[which]

    def _group_name(self, sectors) -> str:
        return ' '.join(','.join(str(int(x)) for x in s) for s in sectors)

    @staticmethod
    def _file_key(prefix: str, sectors) -> str:
        """Dataset key in the reference's F/R file format
        (reference _symmetries.py:1984, 2046): ``F[2, 1, 0][1, 0, 0]...``."""
        return prefix + ''.join(
            '[' + ', '.join(str(int(x)) for x in s) + ']' for s in sectors)

    def _file_cg(self, a, b, c) -> np.ndarray:
        """Dense CG tensor [mu, m_a, m_b, m_c] from a reference-format CG
        file (nested groups ``/N_{N}/a.../b.../Irrep{c}a{mu}`` holding
        1-based sparse coefficient tables, reference _symmetries.py:1861-1884).
        Only ``a x b`` is stored, not ``b x a``; the swapped lookup transposes
        the first two state indices, exactly as the reference reader does."""
        file = self._load_h5('CG')
        root = f'N_{self.N}/'
        path = root + '/'.join(str(int(x)) for x in (*a, *b))
        swapped = False
        grp = file.get(path)
        if grp is None or len(grp) == 0:
            grp = file.get(root + '/'.join(str(int(x)) for x in (*b, *a)))
            swapped = True
        if grp is None:
            raise SymmetryError(
                f'CG tensor for {a} x {b} not in data file')
        cname = ''.join(str(int(x)) for x in c)
        mult = self._n_symbol(a, b, c)
        da, db, dc = (self.sector_dim(s) for s in (a, b, c))
        X = np.zeros((mult, da, db, dc), dtype=np.float64)
        for mu in range(1, mult + 1):
            ds = grp.get(f'Irrep{cname}a{mu}')
            if ds is None:
                raise SymmetryError(
                    f'CG tensor {a} x {b} -> {c} (mu={mu}) not in data file')
            rows = np.asarray(ds)[0]  # [n_entries, 4]: q_a, q_b, q_c, value
            qa = rows[:, 0].astype(int) - 1
            qb = rows[:, 1].astype(int) - 1
            qc = rows[:, 2].astype(int) - 1
            if swapped:
                qa, qb = qb, qa
            X[mu - 1, qa, qb, qc] = rows[:, 3]
        return X

    def _f_symbol(self, a, b, c, d, e, f) -> np.ndarray:
        if self.Ffile is not None:
            file = self._load_h5('F')
            grp = file['F_sym']
            key = self._file_key('F', [a, b, c, d, e, f])
            if key not in grp:
                # the reference also accepts the all-duals key (its files
                # store one of the two, _symmetries.py:1985-1994)
                key = self._file_key('F', [self.dual_sector(s)
                                           for s in (a, b, c, d, e, f)])
            if key not in grp:
                raise SymmetryError(f'F symbol {key} not in data file')
            return np.asarray(grp[key])
        # derive from native CG tensors: overlap of the two fusion trees
        #   right tree: X^{bc}_{e,mu} then X^{ae}_{d,nu}
        #   left tree:  X^{ab}_{f,kappa} then X^{fc}_{d,lambda}
        # [F^{abc}_d]^{e mu nu}_{f kappa lam} = <right | left> / dim(d)
        X_bc_e = self._native_cg(b, c, e)
        X_ae_d = self._native_cg(a, e, d)
        X_ab_f = self._native_cg(a, b, f)
        X_fc_d = self._native_cg(f, c, d)
        # pairwise contractions; never materialize the rank-6 [u,v,a,b,c,d]
        # overlap tensor (it reaches GBs for SU(N>=4) sectors of dim ~100+)
        F = np.einsum('ubcE,vaEd,kabF,lFcd->uvkl', X_bc_e, X_ae_d, X_ab_f,
                      X_fc_d, optimize=True) / self.sector_dim(d)
        return F

    def _r_symbol(self, a, b, c) -> np.ndarray:
        if self.Rfile is not None:
            file = self._load_h5('R')
            grp = file['R_sym']
            key = self._file_key('R', [a, b, c])
            if key not in grp:
                raise SymmetryError(f'R symbol {key} not in data file')
            return np.asarray(grp[key])
        # symmetric gauge (see _native_cg): R is diagonal with entries +-1
        X_ab = self._native_cg(a, b, c)
        X_ba = self._native_cg(b, a, c)
        R = np.einsum('ubac,vabc->uv', X_ba, X_ab) / self.sector_dim(c)
        if not np.allclose(R, np.diag(np.diag(R)), atol=1e-10):
            raise SymmetryError(f'R symbol not diagonal in the native gauge: {R}')
        return np.diag(R).copy()

    def _fusion_tensor(self, a, b, c, Z_a: bool, Z_b: bool) -> np.ndarray:
        if self.CGfile is not None:
            X = self._file_cg(a, b, c)
        else:
            X = self._native_cg(a, b, c)
        # the Z isos below come from the SAME data source (file or native), so
        # the gauge is consistent either way. (The reference raises
        # NotImplementedError for Z_a/Z_b with its file-backed data,
        # /root/reference/cyten/symmetries/_symmetries.py:1897-1898.)
        if Z_a:
            X = np.moveaxis(np.tensordot(X, self.Z_iso(self.dual_sector(a)),
                                         (1, 0)), -1, 1)
        if Z_b:
            X = np.moveaxis(np.tensordot(X, self.Z_iso(self.dual_sector(b)),
                                         (2, 0)), -1, 2)
        return X

    # --- native Clebsch-Gordan machinery (no data files needed) ---------------------

    def _native_cg(self, a, b, c) -> np.ndarray:
        """CG tensor [mu, m_a, m_b, m_c] in the symmetric gauge.

        Canonical pairs (a <= b lexicographically) are computed by the
        Gelfand-Tsetlin algorithm (sun_cg.py); the swapped pair is DEFINED as
        the axis transpose, and for a == b the multiplicity basis is rotated to
        diagonalize the exchange — together this makes every R symbol diagonal
        with entries +-1 (the symmetric-category gauge).
        """
        ta = tuple(int(x) for x in a)
        tb = tuple(int(x) for x in b)
        tc = tuple(int(x) for x in c)
        key = ('CGnat', ta, tb, tc)
        res = self._cache.get(key)
        if res is not None:
            return res
        from . import sun_cg

        if tb < ta:
            X = np.ascontiguousarray(
                self._native_cg(b, a, c).transpose(0, 2, 1, 3))
        else:
            X = self._disk_get(ta, tb, tc)
            if X is None:
                mult = self._n_symbol(np.array(ta), np.array(tb), np.array(tc))
                X = sun_cg.clebsch_gordan(ta, tb, tc, mult)
                if ta == tb and X.shape[0] >= 1:
                    # rotate the multiplicity basis to diagonalize the exchange
                    S = np.einsum('uabm,vbam->uv', X, X)
                    if not np.allclose(S, np.diag(np.diag(S)), atol=1e-10):
                        w, V = np.linalg.eigh((S + S.T) / 2.)
                        X = np.einsum('uv,uabm->vabm', V, X)
                self._disk_put(ta, tb, tc, X)
        X.setflags(write=False)
        self._cache[key] = X
        return X

    def Z_iso(self, a: Sector) -> np.ndarray:
        """Z isomorphism: sqrt(d_a) times the CG projection of a-bar x a onto
        the trivial sector; matrix indices [m_abar, m_a].

        Works for file-backed CG data too: the file's own (a-bar, a, trivial)
        tensor IS the Z iso in the file's gauge (the reference has no SUN
        Z iso at all, _symmetries.py:1897-1898)."""
        a_bar = self.dual_sector(a)
        if self.CGfile is not None:
            X0 = self._file_cg(a_bar, a, self.trivial_sector)
        else:
            X0 = self._native_cg(a_bar, a, self.trivial_sector)
        return np.sqrt(self.sector_dim(a)) * np.ascontiguousarray(X0[0, :, :, 0])

    def frobenius_schur(self, a: Sector) -> int:
        if np.array_equal(self.dual_sector(a), a):
            # real vs pseudo-real: Z^T = FS * Z for a self-conjugate irrep
            # (works for native AND file-backed CG data since Z_iso does)
            try:
                Z = self.Z_iso(a)
            except SymmetryError:
                # file lacks the (a-bar, a, trivial) tensor: F-symbol fallback
                try:
                    return super().frobenius_schur(a)
                except SymmetryError:
                    return 1
            i, j = np.unravel_index(np.argmax(np.abs(Z)), Z.shape)
            return int(np.sign(Z[j, i] / Z[i, j]))
        return 1

    def __repr__(self):
        name = '' if self.descriptive_name is None else f', "{self.descriptive_name}"'
        return f'SUN({self.N}{name})'

    def _is_equivalent_factor(self, other) -> bool:
        return isinstance(other, SUN) and other.N == self.N


def _horizontal_strips(lam: tuple, k: int, N: int):
    """All partitions mu ⊇ lam with |mu| - |lam| = k and mu/lam a horizontal strip.

    Horizontal strip: mu_i >= lam_i >= mu_{i+1} (at most one new box per column).
    """
    results = []

    def rec(row, remaining, acc):
        if row == N:
            if remaining == 0:
                results.append(tuple(acc))
            return
        lo = lam[row]
        hi = lam[row - 1] if row > 0 else lam[0] + remaining
        hi = min(hi, lo + remaining)
        if row > 0:
            hi = min(hi, acc[row - 1])  # keep partition shape
            # horizontal strip: mu_row <= lam_{row-1}
            hi = min(hi, lam[row - 1])
        for m in range(lo, hi + 1):
            acc.append(m)
            rec(row + 1, remaining - (m - lo), acc)
            acc.pop()

    rec(0, k, [])
    return results


class _LRChains:
    """Littlewood-Richardson expansion via partition chains.

    An LR skew tableau of shape λ/a and content b corresponds to a chain
    ``a = λ⁰ ⊆ λ¹ ⊆ ... ⊆ λᵏ = λ`` where step l adds a horizontal strip of size
    ``b[l]`` (the boxes of letter l), subject to the lattice-word condition
    ``N_l(r) ≤ N_{l-1}(r-1)`` with ``N_l(r)`` = number of letter-l boxes in rows 0..r.
    Each outcome partition is yielded once per unit of LR multiplicity.
    """

    @staticmethod
    def expand(a: tuple, b: tuple, N: int):
        a = tuple(a) + (0,) * (N - len(a))
        strips = list(b)
        # chain state: list of partitions [λ⁰, λ¹, ..., λˡ]
        states = [[a]]
        for l, k in enumerate(strips):
            new_states = []
            for chain in states:
                lam = chain[-1]
                for mu in _horizontal_strips(lam, k, N):
                    if l == 0 or _LRChains._lattice_ok(chain[-2], chain[-1], lam, mu):
                        new_states.append(chain + [mu])
            states = new_states
        for chain in states:
            yield chain[-1]

    @staticmethod
    def _lattice_ok(prev2, prev1, lam, mu) -> bool:
        """N_l(r) <= N_{l-1}(r-1): letter-l boxes in rows 0..r vs letter-(l-1) in 0..r-1.

        Letter l adds mu/lam (lam == prev1); letter l-1 added prev1/prev2.
        """
        N = len(mu)
        count_l = 0
        count_lm1 = 0  # rows 0..r-1 of letter l-1
        for r in range(N):
            count_l += mu[r] - lam[r]
            if count_l > count_lm1:
                return False
            count_lm1 += prev1[r] - prev2[r]
        return True
