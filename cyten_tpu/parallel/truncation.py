"""Device-side global truncation — the one inherently collective step of DMRG.

The reference's truncation constraint solver runs host-side on gathered singular
values (cyten/backends/_backend.py:817-909; our port is
:func:`cyten_tpu.backends._backend.truncation_mask_from_S`). When the per-sector
singular values live sharded across a device mesh, the *global* chi decision needs
cross-device communication (SURVEY.md §2.9: "gathering per-sector singular values
for the global truncation decision"). TPU-natively we do NOT hand-write the
collective: the decision is expressed in plain jnp (concatenate -> top-k threshold
-> per-sector masks) and runs under jit/pjit, where XLA inserts the all-gather when
the inputs are sharded.

Limitations vs the host solver: this device path implements the chi_max + svd_min
constraints (the ones needed in the hot loop); degeneracy_tol / trunc_cut /
chi_min remain host-side in :func:`truncation_mask_from_S`.
"""

from __future__ import annotations

import numpy as np

__all__ = ['device_truncation_masks', 'global_truncate']


def device_truncation_masks(s_blocks, qdims, chi_max: int, svd_min: float = 0.):
    """jit/pjit-friendly keep-masks: globally top-``chi_max`` qdim-weighted values.

    Parameters
    ----------
    s_blocks : list of 1D jax arrays
        Singular values per sector (device-resident, possibly sharded).
    qdims : sequence of float
        Quantum dimension per sector (static metadata).
    chi_max : int
        Maximum total number of kept multiplets (static).
    svd_min : float
        Discard singular values strictly below this.

    Returns
    -------
    masks : list of bool jax arrays
        Keep-mask per sector block. Inside jit these are traced values; convert the
        decision to static structure host-side (fetch) before building the new leg.
    """
    import jax.numpy as jnp

    weighted = jnp.concatenate([
        jnp.asarray(float(q)) * jnp.abs(b) ** 2 for b, q in zip(s_blocks, qdims)])
    total = weighted.shape[0]
    k = min(int(chi_max), int(total))
    # threshold = k-th largest weighted value; ties keep (may exceed chi_max by ties)
    sorted_desc = jnp.sort(weighted)[::-1]
    threshold = sorted_desc[k - 1] if k > 0 else jnp.inf
    masks = []
    for b, q in zip(s_blocks, qdims):
        w = float(q) * jnp.abs(b) ** 2
        masks.append((w >= threshold) & (jnp.abs(b) >= svd_min))
    return masks


def global_truncate(S, chi_max: int, svd_min: float = 0.):
    """Global truncation of a (possibly sharded) DiagonalTensor of singular values.

    Runs the decision on device (collectives inserted by XLA if sharded), fetches
    the boolean masks to the host, and returns the corresponding
    :class:`~cyten_tpu.tensors.Mask` plus the truncation error.
    """
    import numpy as onp

    from ..tensors import Mask

    leg = S.leg
    qdims = [leg.symmetry.qdim(leg.sector_decomposition[i])
             for i in range(leg.num_sectors)]
    # align qdims with the data blocks via block_inds
    q_by_block = [qdims[int(i)] for i in onp.atleast_1d(S.data.block_inds)]
    masks = device_truncation_masks(S.data.blocks, q_by_block, chi_max, svd_min)
    host_masks = [onp.asarray(m) for m in masks]
    # error from discarded weight
    disc = 0.
    tot = 0.
    for b, m, q in zip(S.data.blocks, host_masks, q_by_block):
        w = q * onp.abs(onp.asarray(b)) ** 2
        tot += w.sum()
        disc += w[~m].sum()
    err = float(onp.sqrt(disc / tot)) if tot > 0 else 0.
    from ..backends.data import DiagonalBlockData
    from ..dtypes import Dtype
    from ..tensors import DiagonalTensor

    bb = S.backend.block_backend
    data = DiagonalBlockData([bb.as_block(m, Dtype.bool) for m in host_masks],
                             onp.atleast_1d(S.data.block_inds).copy(), Dtype.bool,
                             is_sorted=True)
    diag = DiagonalTensor(data, leg, S.backend, S.labels)
    # route through the existing Mask machinery for a consistent small leg
    return Mask.from_DiagonalTensor(diag), err
