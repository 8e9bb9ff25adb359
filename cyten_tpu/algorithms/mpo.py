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

__all__ = ['apply_mpo', 'add_mpos', 'compress_mpo', 'variational_apply_mpo']


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


def add_mpos(mpos_a, mpos_b):
    """The MPO of the operator sum: block-diagonal on the virtual legs
    (boundary sites stack as row/column vectors)."""
    from ..tensors import tensor_from_grid

    L = len(mpos_a)
    assert len(mpos_b) == L
    out = []
    for i in range(L):
        A, B = mpos_a[i], mpos_b[i]
        if L == 1:
            out.append(A + B)
        elif i == 0:
            out.append(tensor_from_grid([[A, B]], row_leg='wL', col_leg='wR'))
        elif i == L - 1:
            out.append(tensor_from_grid([[A], [B]], row_leg='wL', col_leg='wR'))
        else:
            out.append(tensor_from_grid([[A, None], [None, B]], row_leg='wL',
                                        col_leg='wR'))
    return out


def compress_mpo(mpos, chi_max: int = None, eps: float = 1e-12):
    """SVD-compress the virtual bonds of a finite MPO (in operator 2-norm).

    Left-to-right QR sweep into left-isometric form, then a right-to-left
    truncating SVD sweep — the finite-MPS canonicalization applied to the MPO
    viewed as an MPS with a doubled physical leg.
    """
    from ..tensors import (
        combine_legs, qr, split_legs, svd, svd_apply_mask,
        truncate_singular_values,
    )

    L = len(mpos)
    Ws = [W for W in mpos]
    # pass 1: left-to-right QR (combine [wL, p, p*] vs [wR])
    for i in range(L - 1):
        W = permute_legs(Ws[i], codomain=['wL', 'p', 'p*'], domain=['wR'])
        Q, R = qr(W, new_labels=['wR', 'wL'])
        Ws[i] = Q
        Ws[i + 1] = tdot(R, Ws[i + 1], 'wR', 'wL')
        Ws[i + 1] = permute_legs(Ws[i + 1], codomain=['wL', 'p'],
                                 domain=['p*', 'wR'])
    # pass 2: right-to-left truncating SVD
    for i in range(L - 1, 0, -1):
        W = permute_legs(Ws[i], codomain=['wL'], domain=['wR', 'p', 'p*'])
        U, S, Vh = svd(W, new_labels=['wR', 'wL'])
        if chi_max is not None or eps:
            mask, err, _ = truncate_singular_values(S, chi_max=chi_max,
                                                    svd_min=eps)
            U, S, Vh = svd_apply_mask(U, S, Vh, mask)
        Ws[i] = permute_legs(Vh, codomain=['wL', 'p'], domain=['p*', 'wR'])
        carry = tdot(U, S.as_SymmetricTensor(), 'wR', 'wL')  # [wL; wR]
        Ws[i - 1] = tdot(Ws[i - 1], carry, 'wR', 'wL')
        Ws[i - 1] = permute_legs(Ws[i - 1], codomain=['wL', 'p'],
                                 domain=['p*', 'wR'])
    # restore the standard [wL, p, wR, p*] leg order/labels
    return [permute_legs(W, codomain=['wL', 'p'], domain=['p*', 'wR'])
            for W in Ws]


def variational_apply_mpo(psi: SimpleMPS, mpos, phi0: SimpleMPS = None,
                          chi_max: int = 64, eps: float = 1e-14,
                          n_sweeps: int = 4, tol: float = 1e-12):
    """Variational (DMRG-style) fit ``phi ~ MPO|psi>``.

    Sweeps two-site updates maximizing ``<phi| MPO |psi>`` at fixed ``|phi|``:
    each local update CONTRACTS the three-layer environment (phi*, W, psi) onto
    the open two-site block — no eigensolver — then truncates by SVD. More
    accurate than zip-up at equal chi (globally optimal fit at convergence) and
    the standard tool for H|psi> time stepping. Returns ``(phi, nrm)`` with
    ``phi`` normalized in B form and ``nrm = <phi|MPO|psi>`` (== ||MPO psi||
    at convergence).

    `phi0`: initial guess (default: zip-up result).
    """
    from ..tensors import dagger, norm, pinv, scale_axis
    from .mps import split_truncate_theta

    L = psi.L
    if phi0 is None:
        phi, _ = apply_mpo(psi, mpos, chi_max=chi_max, eps=eps)
    else:
        phi = SimpleMPS(list(phi0.Bs), list(phi0.Ss), bc=phi0.bc)
    backend = psi.backend
    bb = backend.block_backend
    dtype = psi.Bs[0].dtype

    def ones_func(shape, coupled):
        return bb.ones(shape, dtype)

    from ..tensors import SymmetricTensor

    # three-layer environments: LPs[i] covers sites < i, legs [vR*(phi), wR, vR(psi)]
    V0_phi = phi.Bs[0].get_leg_co_domain('vL')
    V0_psi = psi.Bs[0].get_leg_co_domain('vL')
    w0 = mpos[0].get_leg_co_domain('wL')
    LPs = [None] * L
    RPs = [None] * L
    LPs[0] = SymmetricTensor.from_sector_block_func(
        ones_func, [V0_phi], [V0_psi, w0], backend=backend,
        labels=[['vR*'], ['vR', 'wR']])
    VR_phi = phi.Bs[-1].domain.factors[0]
    VR_psi = psi.Bs[-1].domain.factors[0]
    wR = mpos[-1].get_leg_co_domain('wR')
    RPs[L - 1] = SymmetricTensor.from_sector_block_func(
        ones_func, [VR_psi, wR], [VR_phi], backend=backend,
        labels=[['vL', 'wL'], ['vL*']])

    def update_RP(i):
        """RPs[i-1] from RPs[i]: absorb psi.Bs[i], W_i, dagger(phi.Bs[i])."""
        t = tdot(psi.Bs[i], RPs[i], 'vR', 'vL')          # psi layer
        t = tdot(t, mpos[i], ['p', 'wL'], ['p*', 'wR'])  # MPO layer
        RPs[i - 1] = tdot(t, dagger(phi.Bs[i]), ['p', 'vL*'], ['p*', 'vR*'])

    def update_LP(i, A_phi):
        t = tdot(LPs[i], psi.Bs[i] if i > 0 else psi.get_theta1(0), 'vR', 'vL')
        t = tdot(t, mpos[i], ['wR', 'p'], ['wL', 'p*'])
        LPs[i + 1] = tdot(dagger(A_phi), t, ['vL*', 'p*'], ['vR*', 'p'])

    for i in range(L - 1, 0, -1):
        update_RP(i)

    val_old = None
    for sweep in range(n_sweeps):
        for sweep_dir, bonds in (('R', range(L - 1)),
                                 ('L', range(L - 2, -1, -1))):
            for i in bonds:
                # project MPO|psi> onto the open two-site block at (i, i+1)
                th = tdot(LPs[i],
                          psi.get_theta1(i) if i == 0 else
                          scale_axis(psi.Bs[i], psi.Ss[i], 'vL'), 'vR', 'vL')
                th = tdot(th, mpos[i], ['wR', 'p'], ['wL', 'p*'])
                th = th.relabelled({'p': 'p0'})
                th = tdot(th, psi.Bs[i + 1], 'vR', 'vL')
                th = tdot(th, mpos[i + 1], ['wR', 'p'], ['wL', 'p*'])
                th = th.relabelled({'p': 'p1'})
                th = tdot(th, RPs[i + 1], ['vR', 'wR'], ['vL', 'wL'])
                th = th.relabelled({'vR*': 'vL', 'vL*': 'vR'})
                th = permute_legs(th, codomain=['vL', 'p0', 'p1'],
                                  domain=['vR'])
                val = float(np.real_if_close(complex(norm(th))))
                A, S, B, _ = split_truncate_theta(th, chi_max, eps)
                Sinv = pinv(phi.Ss[i], cutoff=1e-14)
                phi.Bs[i] = scale_axis(scale_axis(A, Sinv, 'vL'), S, 'vR')
                phi.Ss[i + 1] = S.relabelled(['vL', 'vL*'])
                phi.Bs[i + 1] = B
                update_LP(i, A)
                update_RP(i + 1)
        if val_old is not None and abs(val - val_old) <= tol * abs(val):
            break
        val_old = val
    return phi, val
