"""Couplings: multi-site operators factorized MPO-style into per-site tensors.

Role-equivalent to reference ``cyten/models/couplings.py`` (Coupling :21,
from_dense_block :77, factories :213-677).

A :class:`Coupling` stores one tensor per site with legs ``[wL, p, wR, p*]``
(codomain ``[wL, p]``, domain ``[p, wR]`` — the planar MPO-entry layout), such that
contracting the horizontal ``w`` legs reproduces the multi-site operator. The
factorization is computed by successive planar SVDs — exact, and valid for every
symmetry backend including anyons.
"""

from __future__ import annotations

import numpy as np

from ..dtypes import Dtype
from ..symmetries import ElementarySpace
from ..tensors import (
    ChargedTensor, SymmetricTensor, add_trivial_leg, compose, permute_legs,
    scale_axis, svd, svd_apply_mask, tdot, truncate_singular_values,
)
from .degrees_of_freedom import AnyonDOF, Site

__all__ = ['Coupling', 'spin_spin_coupling', 'spin_field_coupling', 'heisenberg_coupling',
           'aklt_coupling', 'chiral_3spin_coupling', 'chemical_potential',
           'onsite_interaction', 'density_density_interaction', 'hopping', 'pairing',
           'onsite_pairing', 'clock_coupling', 'clock_clock_coupling', 'clock_field',
           'clock_field_coupling', 'sector_projection_coupling', 'gold_coupling']


class Coupling:
    """A multi-site operator in factorized (MPO-entry) form."""

    def __init__(self, factorization: list[SymmetricTensor], sites: list[Site],
                 name: str = 'coupling'):
        self.factorization = list(factorization)
        self.sites = list(sites)
        self.num_sites = len(sites)
        self.name = name

    @classmethod
    def from_tensor(cls, op: SymmetricTensor, sites: list[Site],
                    name: str = 'coupling', svd_cut: float = 1e-12) -> Coupling:
        """Factorize a multi-site operator (codomain [p0..pn], domain [p0..pn]).

        Uses successive planar SVD splits (the reference's horizontal_factorization,
        planar.py:1102).
        """
        n = len(sites)
        if n == 1:
            t = op.relabelled(['p', 'p*'])
            t = permute_legs(t, codomain=['p'], domain=['p*'])
            t = add_trivial_leg(t, 0, label='wL')
            t = add_trivial_leg(t, 2, label='wR', to_domain=True, is_dual=True)
            return cls([t], sites, name)
        op = op.relabelled([f'p{i}' for i in range(n)]
                           + [f'p{i}*' for i in reversed(range(n))])
        factors = []
        rest = op
        for i in range(n - 1):
            # split site i off the left: the left arc is circularly contiguous
            # (..., p_i*, [wL,] p_i, ...), so the regrouping is a planar rotation
            if i == 0:
                cod = [f'p{i}*', f'p{i}']
            else:
                cod = [f'p{i}*', 'wL', f'p{i}']
            dom = [f'p{k}*' for k in range(i + 1, n)] \
                + [f'p{k}' for k in range(n - 1, i, -1)]
            X = permute_legs(rest, codomain=cod, domain=dom)
            U, S, Vh = svd(X, new_labels=['wR', 'wL'])
            mask, err, _ = truncate_singular_values(S, svd_min=svd_cut)
            U, S, Vh = svd_apply_mask(U, S, Vh, mask)
            sqrt_S = S ** 0.5
            A = scale_axis(U, sqrt_S, 'wR')
            rest = scale_axis(Vh, sqrt_S, 'wL')
            # shape A into the MPO-entry layout [wL, p, wR, p*] (planar moves)
            if i == 0:
                A = permute_legs(A, codomain=[f'p{i}'], domain=[f'p{i}*', 'wR'])
                A = add_trivial_leg(A, 0, label='wL')
            else:
                A = permute_legs(A, codomain=['wL', f'p{i}'],
                                 domain=[f'p{i}*', 'wR'])
            factors.append(A.relabelled({f'p{i}': 'p', f'p{i}*': 'p*'}))
        # last site
        last = permute_legs(rest, codomain=['wL', f'p{n - 1}'],
                            domain=[f'p{n - 1}*'])
        last = add_trivial_leg(last, 2, label='wR', to_domain=True, is_dual=True)
        factors.append(last.relabelled({f'p{n - 1}': 'p', f'p{n - 1}*': 'p*'}))
        return cls(factors, sites, name)

    @classmethod
    def from_dense_block(cls, block, sites: list[Site], name: str = 'coupling',
                         backend=None, tol: float = 1e-8) -> Coupling:
        """From a dense multi-site operator block (legs [p0.., pN*..p0*])."""
        backend = backend if backend is not None else sites[0].backend
        legs = [s.leg for s in sites]
        op = SymmetricTensor.from_dense_block(block, legs, legs, backend=backend,
                                              tol=tol)
        return cls.from_tensor(op, sites, name)

    def to_tensor(self) -> SymmetricTensor:
        """Contract the horizontal legs back into the full multi-site operator.

        All rearrangements are planar rotations, so this works for anyons too.
        """
        n = self.num_sites
        res = self.factorization[0].relabelled({'p': 'p0', 'p*': 'p0*'})
        for i in range(1, n):
            f = self.factorization[i].relabelled({'p': f'p{i}', 'p*': f'p{i}*'})
            # rotate res so that wR sits alone in the domain
            labels = res.labels
            k = labels.index('wR')
            cod = labels[k + 1:] + labels[:k]
            resp = permute_legs(res, codomain=cod, domain=['wR'])
            fp = permute_legs(f, codomain=['wL'],
                              domain=[f'p{i}*', 'wR', f'p{i}'])
            res = compose(resp, fp)
        res = squeeze_w_legs(res)
        cod = [f'p{i}' for i in range(n)]
        dom_lr = [f'p{i}*' for i in range(n)]
        return permute_legs(res, codomain=cod, domain=dom_lr)

    def __mul__(self, factor):
        factors = list(self.factorization)
        factors[0] = factor * factors[0]
        return Coupling(factors, self.sites, self.name)

    __rmul__ = __mul__

    def __repr__(self):
        return f'<Coupling {self.name!r} on {self.num_sites} sites>'


def squeeze_w_legs(t):
    from ..tensors import squeeze_legs

    idcs = [n for n, l in enumerate(t._labels)
            if l in ('wL', 'wR') and t.get_leg(n).is_trivial]
    return squeeze_legs(t, idcs)


# --- two-site factories (dense path for droppable symmetries) ---------------------------


def _two_site_from_numpy(op1: np.ndarray, op2: np.ndarray, sites, coeff=1.,
                         name='coupling') -> Coupling:
    h = coeff * np.kron(op1, op2)
    d0, d1 = int(sites[0].leg.dim), int(sites[1].leg.dim)
    block = h.reshape(d0, d1, d0, d1).transpose(0, 1, 3, 2)
    return Coupling.from_dense_block(block, sites, name=name)


def _two_site_sum_from_numpy(terms, sites, name='coupling') -> Coupling:
    d0, d1 = int(sites[0].leg.dim), int(sites[1].leg.dim)
    h = np.zeros((d0 * d1, d0 * d1), dtype=complex)
    for coeff, op1, op2 in terms:
        h = h + coeff * np.kron(op1, op2)
    if np.allclose(h.imag, 0):
        h = h.real
    block = h.reshape(d0, d1, d0, d1).transpose(0, 1, 3, 2)
    return Coupling.from_dense_block(block, sites, name=name)


def _spin_ops_numpy(site):
    """(Sp, Sm, Sz) of a spin site — from its ops, or recomputed for SU(2) sites
    (where the components are not individually symmetric)."""
    from .degrees_of_freedom import SpinDOF

    if site.has_op('Sp'):
        return tuple(site.get_op_numpy(k) for k in ('Sp', 'Sm', 'Sz'))
    S = getattr(site, 'S', (int(site.leg.dim) - 1) / 2.)
    ops = SpinDOF.spin_ops(S)
    return ops['Sp'], ops['Sm'], ops['Sz']


def spin_spin_coupling(sites, Jx=0., Jy=0., Jz=0., name='spin_spin') -> Coupling:
    r""":math:`J_x S^x S^x + J_y S^y S^y + J_z S^z S^z` (reference couplings.py:213)."""
    assert len(sites) == 2
    Sp0, Sm0, Sz0 = _spin_ops_numpy(sites[0])
    Sp1, Sm1, Sz1 = _spin_ops_numpy(sites[1])
    terms = [(Jz, Sz0, Sz1),
             ((Jx + Jy) / 4., Sp0, Sm1), ((Jx + Jy) / 4., Sm0, Sp1),
             ((Jx - Jy) / 4., Sp0, Sp1), ((Jx - Jy) / 4., Sm0, Sm1)]
    terms = [t for t in terms if abs(t[0]) > 0]
    return _two_site_sum_from_numpy(terms, sites, name=name)


def heisenberg_coupling(sites, J=1., name='heisenberg') -> Coupling:
    r""":math:`J \vec{S} \cdot \vec{S}` (reference couplings.py:296). Works for any
    conserve choice incl. SU(2), where the dense block is projected exactly."""
    return spin_spin_coupling(sites, Jx=J, Jy=J, Jz=J, name=name)


def aklt_coupling(sites, J=1., name='aklt') -> Coupling:
    r""":math:`J [\vec{S}\vec{S} + \frac{1}{3}(\vec{S}\vec{S})^2]`
    (reference couplings.py:264)."""
    assert len(sites) == 2
    Sp0, Sm0, Sz0 = _spin_ops_numpy(sites[0])
    Sp1, Sm1, Sz1 = _spin_ops_numpy(sites[1])
    SS = (np.kron(Sz0, Sz1) + 0.5 * (np.kron(Sp0, Sm1) + np.kron(Sm0, Sp1)))
    h = J * (SS + np.matmul(SS, SS) / 3.)
    d0, d1 = int(sites[0].leg.dim), int(sites[1].leg.dim)
    block = h.reshape(d0, d1, d0, d1).transpose(0, 1, 3, 2)
    return Coupling.from_dense_block(block, sites, name=name)


def chiral_3spin_coupling(sites, J=1., name='chiral_3spin') -> Coupling:
    r""":math:`J \vec{S}_1 \cdot (\vec{S}_2 \times \vec{S}_3)`
    (reference couplings.py:313)."""
    assert len(sites) == 3
    mats = []
    for s in sites:
        Sp, Sm, Sz = (s.get_op_numpy(k) for k in ('Sp', 'Sm', 'Sz'))
        Sx = 0.5 * (Sp + Sm)
        Sy = -0.5j * (Sp - Sm)
        mats.append((Sx, Sy, Sz))
    h = 0.
    eps = {(0, 1, 2): 1, (1, 2, 0): 1, (2, 0, 1): 1,
           (2, 1, 0): -1, (0, 2, 1): -1, (1, 0, 2): -1}
    for (a, b, c), sign in eps.items():
        h = h + sign * np.kron(np.kron(mats[0][a], mats[1][b]), mats[2][c])
    h = J * h
    if np.allclose(np.asarray(h).imag, 0):
        h = np.asarray(h).real
    dims = [int(s.leg.dim) for s in sites]
    block = np.reshape(h, dims + dims).transpose(0, 1, 2, 5, 4, 3)
    return Coupling.from_dense_block(block, sites, name=name)


def chemical_potential(sites, mu=1., name='chemical_potential') -> Coupling:
    r""":math:`-\mu N` on a single site (reference couplings.py:340)."""
    assert len(sites) == 1
    op = SymmetricTensor.from_dense_block(
        -mu * sites[0].get_op_numpy('N'), [sites[0].leg], [sites[0].leg],
        backend=sites[0].backend, labels=['p', 'p*'])
    return Coupling.from_tensor(op, sites, name=name)


def onsite_interaction(sites, U=1., name='onsite_interaction') -> Coupling:
    r""":math:`\frac{U}{2} N (N - 1)` (bosons) or :math:`U N_u N_d`
    (spinful fermions) (reference couplings.py:370)."""
    assert len(sites) == 1
    s = sites[0]
    if s.has_op('NuNd'):
        op_np = U * s.get_op_numpy('NuNd')
    else:
        N = s.get_op_numpy('N')
        op_np = 0.5 * U * (N @ N - N)
    op = SymmetricTensor.from_dense_block(op_np, [s.leg], [s.leg],
                                          backend=s.backend, labels=['p', 'p*'])
    return Coupling.from_tensor(op, sites, name=name)


def density_density_interaction(sites, V=1., name='density_density') -> Coupling:
    r""":math:`V N_i N_j` (reference couplings.py:401)."""
    assert len(sites) == 2
    N0 = sites[0].get_op_numpy('Ntot' if sites[0].has_op('Ntot') else 'N')
    N1 = sites[1].get_op_numpy('Ntot' if sites[1].has_op('Ntot') else 'N')
    return _two_site_from_numpy(N0, N1, sites, coeff=V, name=name)


def hopping(sites, t=1., species: str = '', name='hopping') -> Coupling:
    r""":math:`-t (c^\dagger_i c_j + c^\dagger_j c_i)` (reference couplings.py:476).

    With graded symmetries, the inter-site statistics are carried by the braiding;
    the dense block uses the JW-string convention consistent with the graded basis.
    """
    assert len(sites) == 2
    Cd0 = sites[0].get_op_numpy('Cd' + species)
    C0 = sites[0].get_op_numpy('C' + species)
    Cd1 = sites[1].get_op_numpy('Cd' + species)
    C1 = sites[1].get_op_numpy('C' + species)
    JW0 = sites[0].get_op_numpy('JW')
    terms = [(-t, Cd0 @ JW0, C1), (t, C0 @ JW0, Cd1)]
    return _two_site_sum_from_numpy(terms, sites, name=name)


def pairing(sites, D=1., species: str = '', name='pairing') -> Coupling:
    r""":math:`\Delta (c^\dagger_i c^\dagger_j + c_j c_i)` (reference :503)."""
    assert len(sites) == 2
    Cd0 = sites[0].get_op_numpy('Cd' + species)
    C0 = sites[0].get_op_numpy('C' + species)
    Cd1 = sites[1].get_op_numpy('Cd' + species)
    C1 = sites[1].get_op_numpy('C' + species)
    JW0 = sites[0].get_op_numpy('JW')
    # JW convention: c†_i c†_j = (Cd JW) x Cd, and the h.c. term
    # c_j c_i = (JW C) x C — the string multiplies lowering ops from the LEFT
    # (JW C = -C JW); using C @ JW here would flip the sign and break
    # hermiticity (caught by test_couplings_extra.py::test_pairing_dense).
    terms = [(D, Cd0 @ JW0, Cd1), (D, JW0 @ C0, C1)]
    return _two_site_sum_from_numpy(terms, sites, name=name)


def onsite_pairing(sites, D=1., name='onsite_pairing') -> Coupling:
    r""":math:`\Delta (c^\dagger_u c^\dagger_d + c_d c_u)` on one site
    (reference :538)."""
    assert len(sites) == 1
    s = sites[0]
    Cdu, Cddn, Cu, Cdn = (s.get_op_numpy(k) for k in ('Cdu', 'Cddn', 'Cu', 'Cdn'))
    op_np = D * (Cdu @ Cddn + Cdn @ Cu)
    op = SymmetricTensor.from_dense_block(op_np, [s.leg], [s.leg],
                                          backend=s.backend, labels=['p', 'p*'])
    return Coupling.from_tensor(op, sites, name=name)


def spin_field_coupling(sites, hx=0., hy=0., hz=0., name='spin-field') -> Coupling:
    r""":math:`h_x S^x + h_y S^y + h_z S^z` on one site (reference couplings.py:241)."""
    assert len(sites) == 1
    site = sites[0]
    Sp, Sm, Sz = _spin_ops_numpy(site)
    Sx = (Sp + Sm) / 2.
    Sy = (Sp - Sm) / 2.j
    h = hx * Sx + hy * Sy + hz * Sz
    if np.allclose(h.imag, 0):
        h = h.real
    op = SymmetricTensor.from_dense_block(h, [site.leg], [site.leg],
                                          backend=site.backend, labels=['p', 'p*'])
    return Coupling.from_tensor(op, sites, name=name)


def clock_clock_coupling(sites, Jx=0., Jz=0., name='clock-clock') -> Coupling:
    r""":math:`J_x X_i X_j^\dagger + J_z Z_i Z_j^\dagger + h.c.`
    (reference couplings.py:585; sign convention of the reference, cf. our
    :func:`clock_coupling` which carries the ferromagnetic minus sign)."""
    assert len(sites) == 2
    X0 = sites[0].get_op_numpy('X')
    Z0 = sites[0].get_op_numpy('Z')
    X1 = sites[1].get_op_numpy('X')
    Z1 = sites[1].get_op_numpy('Z')
    terms = [(Jx, X0, X1.conj().T), (Jz, Z0, Z1.conj().T),
             (Jx, X0.conj().T, X1), (Jz, Z0.conj().T, Z1)]
    terms = [t for t in terms if abs(t[0]) > 0]
    return _two_site_sum_from_numpy(terms, sites, name=name)


def clock_field_coupling(sites, hx=0., hz=0., name='clock-field') -> Coupling:
    r""":math:`h_x (X + X^\dagger) + h_z (Z + Z^\dagger)` on one site
    (reference couplings.py:611; reference sign convention)."""
    assert len(sites) == 1
    s = sites[0]
    X = s.get_op_numpy('X')
    Z = s.get_op_numpy('Z')
    h = hx * (X + X.conj().T) + hz * (Z + Z.conj().T)
    if np.allclose(h.imag, 0):
        h = h.real
    op = SymmetricTensor.from_dense_block(h, [s.leg], [s.leg],
                                          backend=s.backend, labels=['p', 'p*'])
    return Coupling.from_tensor(op, sites, name=name)


def clock_coupling(sites, J=1., name='clock_ZZ') -> Coupling:
    r""":math:`-J (Z_i Z_j^\dagger + h.c.)` (reference couplings.py:585)."""
    assert len(sites) == 2
    Z0 = sites[0].get_op_numpy('Z')
    Z1hc = sites[1].get_op_numpy('Zhc')
    terms = [(-J, Z0, Z1hc), (-J, Z0.conj().T, Z1hc.conj().T)]
    return _two_site_sum_from_numpy(terms, sites, name=name)


def clock_field(sites, g=1., name='clock_X') -> Coupling:
    r""":math:`-g (X + X^\dagger)` on one site (reference couplings.py:611)."""
    assert len(sites) == 1
    s = sites[0]
    X = s.get_op_numpy('X')
    op_np = -g * (X + X.conj().T)
    op = SymmetricTensor.from_dense_block(op_np, [s.leg], [s.leg],
                                          backend=s.backend, labels=['p', 'p*'])
    return Coupling.from_tensor(op, sites, name=name)


def sector_projection_coupling(sites, J=1., sector=None,
                               name='sector_projection') -> Coupling:
    """``J P_sector`` — two-site projector onto a fusion channel (reference :638).

    Built sector-wise; works for anyonic symmetries.
    """
    assert len(sites) == 2
    assert sector is not None
    backend = sites[0].backend
    op = AnyonDOF.sector_projector((sites[0].leg, sites[1].leg), sector, backend,
                                   coeff=J)
    return Coupling.from_tensor(op, sites, name=name)


def gold_coupling(sites, J=1., name='gold') -> Coupling:
    r""":math:`-J P^{\text{vac}}` of two Fibonacci anyons (reference :657)."""
    assert len(sites) == 2
    sym = sites[0].symmetry
    return sector_projection_coupling(sites, J=-J, sector=sym.trivial_sector,
                                      name=name)
