"""Finite-temperature MPS via purification.

A thermal density matrix ``rho ~ exp(-beta H)`` is represented as a pure state
``|psi>`` on a doubled Hilbert space: each site carries the physical leg ``p``
and an ancilla leg ``q`` (the dual space), combined into ONE pipe leg so the
whole MPS machinery (:class:`~cyten_tpu.algorithms.mps.SimpleMPS`, TEBD,
truncation) applies unchanged. Thermal expectation values are
``tr(rho O) / tr(rho) = <psi| O (x) 1_q |psi> / <psi|psi>``.

- ``beta = 0``: the maximally entangled pair per site — built symmetry-aware as
  the coevaluation ``bend(eye(p))`` (for SU(2) sites this IS the singlet), so
  all conserved charges remain exact at every temperature.
- Cooling: imaginary-time TEBD with the PHYSICAL gates; applying
  ``exp(-dt H)`` to the ket advances ``rho -> exp(-dt H) rho exp(-dt H)``,
  i.e. ``beta += 2 dt`` per sweep.

The reference (cyten @ /root/reference) has no finite-temperature algorithms;
this follows the standard purification construction (cf. tenpy v1's
``PurificationMPS``), re-expressed over this framework's pipe legs so that the
gate application is a split -> physical compose -> recombine, with no doubled
operators ever materialized.

Symmetric braiding only (fermions included via graded pipes); anyonic
purification is not defined here.
"""

from __future__ import annotations

import numpy as np

from ..dtypes import Dtype
from ..symmetries import ElementarySpace
from ..tensors import (
    SymmetricTensor, DiagonalTensor, add_trivial_leg, bend_legs, combine_legs,
    compose, inner, norm, permute_legs, scalar_multiply, split_legs,
)
from .mps import SimpleMPS, split_truncate_theta
from .tebd import TEBDEngine

__all__ = ['PurificationMPS', 'PurificationTEBD']


class PurificationMPS(SimpleMPS):
    """A purified (thermal) MPS: the physical leg of each B is a pipe (p, q).

    ``site_expectation_value`` / ``bond_expectation_value`` take PHYSICAL
    operators (acting on p only); the ancilla is traced out implicitly through
    the inner product.
    """

    @classmethod
    def from_infinite_temperature(cls, site_legs, backend=None,
                                  dtype=Dtype.float64,
                                  bc: str = 'finite') -> 'PurificationMPS':
        """The beta = 0 state: per site the normalized coevaluation in p (x) q.

        ``bend_legs(eye(p))`` realizes ``sum_i |i>|i*> / sqrt(d)`` in a
        symmetry-covariant way (each sector pairs with its dual)."""
        from ..backends import get_backend

        symmetry = site_legs[0].symmetry
        if backend is None:
            backend = get_backend(symmetry)
        triv = ElementarySpace(symmetry, symmetry.trivial_sector[None, :])
        Bs, Ss = [], []
        for p_leg in site_legs:
            eye = SymmetricTensor.from_eye([p_leg], backend=backend,
                                           labels=['p', 'q'], dtype=dtype)
            coev = bend_legs(eye, num_domain_legs=0)  # codomain [p, q]
            coev = scalar_multiply(1.0 / norm(coev), coev)
            B = add_trivial_leg(coev, legs_pos=0, label='vL')
            # is_dual refers to the LEG view: a domain leg added with
            # is_dual=True has an is_dual=False domain FACTOR, matching the
            # next site's vL codomain factor
            B = add_trivial_leg(B, legs_pos=3, label='vR', to_domain=True,
                                is_dual=True)
            B = combine_legs(B, ['p', 'q']).relabelled(['vL', 'p', 'vR'])
            Bs.append(B)
            Ss.append(DiagonalTensor.from_eye(triv, backend=backend,
                                              labels=['vL', 'vL*'],
                                              dtype=dtype))
        return cls(Bs, Ss, bc=bc)

    # --- physical-operator expectation values ----------------------------------------

    def site_expectation_value(self, op, i: int):
        """<O_i>_beta for a physical single-site operator (codomain [p], domain [p])."""
        theta = self.get_theta1(i)
        ts = split_legs(theta, 'p').relabelled(['vL', 'p', 'q', 'vR'])
        op = op.relabelled(['p', 'p*'])
        thp = permute_legs(ts, codomain=['p'], domain=['vL', 'q', 'vR'])
        op_th = compose(op, thp)
        return inner(thp, op_th, do_dagger=True)

    def bond_expectation_value(self, op, i: int):
        """<O_{i,i+1}>_beta for a physical 2-site operator (codomain [p0, p1])."""
        theta = self.get_theta2(i)
        ts = split_legs(theta, ['p0', 'p1'])
        ts = ts.relabelled(['vL', 'p0', 'q0', 'p1', 'q1', 'vR'])
        op = op.relabelled(['p0', 'p1', 'p1*', 'p0*'])
        thp = permute_legs(ts, codomain=['p0', 'p1'],
                           domain=['vL', 'q0', 'q1', 'vR'])
        op_th = compose(op, thp)
        return inner(thp, op_th, do_dagger=True)


class PurificationTEBD(TEBDEngine):
    """Imaginary-time TEBD on a :class:`PurificationMPS`: cooling from beta=0.

    ``model.H_bonds`` are the PHYSICAL two-site operators; gates act on the
    physical halves of the pipe legs (split -> compose -> recombine), the
    ancillas ride along untouched. After ``run(n)``, ``self.beta == 2 dt n``
    (each sweep multiplies the KET by ``exp(-dt H)``)."""

    def __init__(self, psi: PurificationMPS, model, dt: float,
                 chi_max: int = 64, eps: float = 1e-12,
                 pad_chi_multiple: int = None, canonicalize_every: int = None):
        super().__init__(psi, model, dt, chi_max=chi_max, eps=eps,
                         imaginary=True, pad_chi_multiple=pad_chi_multiple,
                         canonicalize_every=canonicalize_every)
        self.beta = 0.

    def update_bond(self, i: int, U):
        """Apply the physical gate on bond (i, i+1) through the pipes."""
        psi = self.psi
        j = (i + 1) % psi.L if psi.bc == 'infinite' else i + 1
        theta = psi.get_theta2(i)  # codomain [vL, P0, P1], domain [vR]
        ts = split_legs(theta, ['p0', 'p1'])
        ts = ts.relabelled(['vL', 'p0', 'q0', 'p1', 'q1', 'vR'])
        thp = permute_legs(ts, codomain=['p0', 'p1'],
                           domain=['vL', 'q0', 'q1', 'vR'])
        u_th = compose(U, thp)
        back = permute_legs(u_th, codomain=['vL', 'p0', 'q0', 'p1', 'q1'],
                            domain=['vR'])
        back = combine_legs(back, ['p0', 'q0'], ['p1', 'q1'])
        theta = back.relabelled(['vL', 'p0', 'p1', 'vR'])
        from ..tensors import pinv, scale_axis

        A, S, B, err = split_truncate_theta(
            theta, self.chi_max, self.eps,
            pad_to_multiple=self.pad_chi_multiple)
        self.trunc_err = max(self.trunc_err, err)
        Sinv = pinv(psi.Ss[i], cutoff=1e-14)
        psi.Bs[i] = scale_axis(scale_axis(A, Sinv, 'vL'), S, 'vR')
        psi.Ss[j] = S.relabelled(['vL', 'vL*'])
        psi.Bs[j] = B

    def sweep(self):
        super().sweep()
        self.beta += 2 * self.dt
