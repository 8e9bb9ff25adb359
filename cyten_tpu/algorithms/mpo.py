"""MPO application to MPS: the zip-up method.

``apply_mpo(psi, mpos)`` computes ``MPO |psi>`` as a new (truncated) MPS by the
zip-up algorithm (Stoudenmire & White, New J. Phys. 12, 055026 (2010)): sweep
left to right contracting one site tensor and one MPO tensor at a time into a
moving center, truncating with an SVD at every step, then restore canonical
B form with an exact canonicalization sweep.

Goes beyond the reference (no MPO-application machinery in its toycodes);
the building block for H^n |psi>, Krylov time stepping and MPO compression.
"""

from __future__ import annotations

import numpy as np

from ..tensors import (
    permute_legs, svd, svd_apply_mask, tdot, truncate_singular_values,
)
from .mps import SimpleMPS

__all__ = ['apply_mpo']


def apply_mpo(psi: SimpleMPS, mpos, chi_max: int = None, eps: float = 1e-14,
              canonicalize: bool = True):
    """Return ``(phi, nrm)`` with ``phi ~ MPO|psi> / nrm`` and ``nrm = ||MPO|psi>||``.

    `mpos` is one ``[wL, p, wR, p*]`` tensor per site with boundary-selected
    ends (e.g. ``model.H_mpo``). Truncates to `chi_max` (per SVD) at relative
    singular-value cutoff `eps`. The returned state is normalized and in exact
    canonical B form (unless ``canonicalize=False``, where it is left in the
    zip-up's left-isometric gauge).
    """
    assert psi.bc == 'finite'
    L = psi.L
    from ..symmetries import ElementarySpace
    from ..tensors import SymmetricTensor

    sym = psi.Bs[0].symmetry
    bb = psi.backend.block_backend
    dtype = psi.Bs[0].dtype

    def ones_func(shape, coupled):
        return bb.ones(shape, dtype)

    V0 = psi.Bs[0].get_leg_co_domain('vL')
    w0 = mpos[0].get_leg_co_domain('wL')
    carry = SymmetricTensor.from_sector_block_func(
        ones_func, [V0], [V0, w0], backend=psi.backend,
        labels=[['vL'], ['vR', 'wR']])
    new_Bs = []
    norm_factor = 1.0
    for i in range(L):
        M = psi.get_theta1(0) if i == 0 else psi.Bs[i]
        t = tdot(carry, M, 'vR', 'vL')                  # [vL, wR] + [p, vR]
        t = tdot(t, mpos[i], ['wR', 'p'], ['wL', 'p*'])  # [vL, vR] + [p, wR]
        if i == L - 1:
            # the trailing wR is one-dimensional (boundary-selected): fold in
            t = permute_legs(t, codomain=['vL', 'p'], domain=['wR', 'vR'])
            from ..tensors import squeeze_legs

            t = squeeze_legs(t, 'wR') if int(
                t.get_leg_co_domain('wR').dim) == 1 else t
            new_Bs.append(permute_legs(t, codomain=['vL', 'p'], domain=['vR']))
            break
        t = permute_legs(t, codomain=['vL', 'p'], domain=['wR', 'vR'])
        U, S, Vh = svd(t, new_labels=['vR', 'vL'])
        if chi_max is not None or eps:
            mask, err, new_norm = truncate_singular_values(
                S, chi_max=chi_max, svd_min=eps)
            U, S, Vh = svd_apply_mask(U, S, Vh, mask)
        new_Bs.append(U)                                # left-isometric [vL,p;c]
        carry = tdot(S.as_SymmetricTensor().relabelled(['vL', 'vR']), Vh,
                     'vR', 'vL')                        # [vL; wR, vR]
        carry = permute_legs(carry, codomain=['vL'], domain=['vR', 'wR'])
    from ..tensors import DiagonalTensor

    Ss = [DiagonalTensor.from_eye(B.get_leg_co_domain('vL'), backend=psi.backend,
                                  labels=['vL', 'vL*'], dtype=B.dtype)
          for B in new_Bs]
    phi = SimpleMPS(new_Bs, Ss, bc='finite')
    nrm = float(np.sqrt(np.real(phi.overlap(phi))))
    if canonicalize:
        phi.canonicalize(normalize=True)
    return phi, nrm
