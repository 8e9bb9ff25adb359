"""SU(N) topological data: reference-format HDF5 export.

The reference's SUN symmetry cannot compute its own data — it *requires*
precomputed HDF5 files (CGfile/Ffile/Rfile) produced by an external
clebsch_gordan_coefficients package (reference cyten/symmetries/_symmetries.py:
1590-1622, file layout read back at :1713-2046). Our SUN computes everything
natively (groups.py / sun_cg.py); this module writes that native data in the
reference's exact file format, so that

- the reference loader can consume our files (migration/interop), and
- expensive high-N data is generated once and shipped as files.

File layouts (reverse-engineered from the reference's readers):

CG file  : attrs {N, Highest_Weight}; nested groups ``/N_{N}/a0/a1/../b0/../``
           per sector pair, holding one dataset ``Irrep{c digits}a{mu}`` per
           fusion channel and multiplicity index (1-based), with attrs
           {Irreplabel, Outer Multiplicity, Dimension} and data of shape
           ``[1, n_nonzero, 4]`` with rows ``(q_a, q_b, q_c, value)`` (1-based
           GT-pattern indices; reference reader :1840-1885).
F file   : attrs {N, Highest_Weight}; group ``/F_sym/`` with datasets
           ``F[a][b][c][d][e][f]`` (reference reader :1966-1995).
R file   : attrs {N, Highest_Weight}; group ``/R_sym/`` with datasets
           ``R[a][b][c]`` (reference reader :2028-2046).
"""

from __future__ import annotations

import itertools

import numpy as np

__all__ = ['export_reference_hdf5', 'sun_sectors_up_to_weight']


def sun_sectors_up_to_weight(N: int, max_weight: int) -> list[tuple]:
    """All SU(N) sectors (first rows of normalized GT patterns) with first
    component <= max_weight."""
    res = []
    for comb in itertools.product(range(max_weight + 1), repeat=N - 1):
        row = tuple(sorted(comb, reverse=True)) + (0,)
        if row not in res:
            res.append(row)
    return sorted(res)


def _bracket(sector) -> str:
    return '[' + ', '.join(str(int(x)) for x in sector) + ']'


class _KeyedArrays:
    """tuple -> np.array view (fusion outcomes may exceed the sector list)."""

    def __init__(self, fn):
        self._fn = fn

    def __getitem__(self, key):
        return self._fn(key)


def export_reference_hdf5(sun, max_weight: int, cg_path: str, f_path: str,
                          r_path: str, sectors=None, progress: bool = False):
    """Write this symmetry's CG/F/R data for all sectors up to ``max_weight``
    into three HDF5 files in the reference's format.

    Parameters
    ----------
    sun : :class:`~cyten_tpu.symmetries.groups.SUN`
        The (native-data) symmetry whose tensors are exported.
    max_weight : int
        Include sectors whose first GT-row entry is <= this.
    sectors : optional
        Explicit sector list (tuples) overriding the weight enumeration — use
        for high N where the full enumeration is too large.
    """
    import h5py

    N = sun.N
    if sectors is None:
        sectors = sun_sectors_up_to_weight(N, max_weight)
    sectors = [tuple(int(x) for x in s) for s in sectors]
    sec_set = set(sectors)

    def arr_of(s):
        return np.array(s, dtype=int)

    arr = _KeyedArrays(arr_of)

    # ---- CG file -------------------------------------------------------------
    with h5py.File(cg_path, 'w') as f:
        f.attrs['N'] = N
        f.attrs['Highest_Weight'] = int(max_weight)
        root = f.require_group(f'N_{N}')
        for a, b in itertools.combinations_with_replacement(sectors, 2):
            grp = root
            for x in (*a, *b):
                grp = grp.require_group(str(int(x)))
            for c_row in sun.fusion_outcomes(arr[a], arr[b]):
                c = tuple(int(x) for x in c_row)
                X = sun.fusion_tensor(arr[a], arr[b], arr[c])  # [mu, qa, qb, qc]
                mult = X.shape[0]
                for mu in range(1, mult + 1):
                    qa, qb, qc = np.nonzero(np.abs(X[mu - 1]) > 1e-15)
                    vals = X[mu - 1][qa, qb, qc]
                    data = np.stack([qa + 1., qb + 1., qc + 1., vals], axis=1)
                    ds = grp.create_dataset(
                        'Irrep' + ''.join(map(str, c)) + 'a' + str(mu),
                        data=data[None])
                    ds.attrs['Irreplabel'] = list(c)
                    ds.attrs['Outer Multiplicity'] = mult
                    ds.attrs['Dimension'] = int(sun.sector_dim(arr[c]))
            if progress:
                print(f'CG {a} x {b} done', flush=True)

    # ---- R file --------------------------------------------------------------
    with h5py.File(r_path, 'w') as f:
        f.attrs['N'] = N
        f.attrs['Highest_Weight'] = int(max_weight)
        grp = f.require_group('R_sym')
        for a, b in itertools.product(sectors, repeat=2):
            for c_row in sun.fusion_outcomes(arr[a], arr[b]):
                c = tuple(int(x) for x in c_row)
                if c not in sec_set:
                    continue
                key = 'R' + _bracket(a) + _bracket(b) + _bracket(c)
                if key not in grp:
                    grp.create_dataset(
                        key, data=np.asarray(sun.r_symbol(arr[a], arr[b],
                                                          arr[c])))

    # ---- F file --------------------------------------------------------------
    with h5py.File(f_path, 'w') as f:
        f.attrs['N'] = N
        f.attrs['Highest_Weight'] = int(max_weight)
        grp = f.require_group('F_sym')
        for a, b, c in itertools.product(sectors, repeat=3):
            # convention (same as the reference base class): e in b x c,
            # f in a x b, d in a x e == f x c
            for e_row in sun.fusion_outcomes(arr[b], arr[c]):
                e = tuple(int(x) for x in e_row)
                if e not in sec_set:
                    continue
                for d_row in sun.fusion_outcomes(arr[a], arr[e]):
                    d = tuple(int(x) for x in d_row)
                    if d not in sec_set:
                        continue
                    for f_row in sun.fusion_outcomes(arr[a], arr[b]):
                        f_ = tuple(int(x) for x in f_row)
                        if f_ not in sec_set:
                            continue
                        if not sun.can_fuse_to(arr[f_], arr[c], arr[d]):
                            continue
                        key = ('F' + _bracket(a) + _bracket(b) + _bracket(c)
                               + _bracket(d) + _bracket(e) + _bracket(f_))
                        if key not in grp:
                            grp.create_dataset(
                                key,
                                data=np.asarray(sun.f_symbol(
                                    arr[a], arr[b], arr[c], arr[d], arr[e],
                                    arr[f_])))
            if progress:
                print(f'F {a} {b} {c} done', flush=True)
