"""Device-side global truncation — the one inherently collective step of DMRG.

The reference's truncation constraint solver runs host-side on gathered singular
values (cyten/backends/_backend.py:817-909; our host port is
:func:`cyten_tpu.backends._backend.truncation_mask_from_S`). When the per-sector
singular values live sharded across a device mesh, the *global* chi decision needs
cross-device communication (SURVEY.md §2.9: "gathering per-sector singular values
for the global truncation decision"). TPU-natively we do NOT hand-write the
collective: the decision is expressed in plain jnp (concatenate -> sort ->
constraint scan -> per-sector masks) and runs under jit/pjit, where XLA inserts
the all-gather when the inputs are sharded.

The device solver covers the FULL reference constraint set: chi_max, chi_min,
degeneracy_tol (never cut through near-degenerate groups), trunc_cut (bound on the
total discarded qdim-weighted error), svd_min — jointly, with the same
keep-priority (descending marginal error qdim * S^2) as the host solver.
"""

from __future__ import annotations

import numpy as np

__all__ = ['device_truncation_masks', 'global_truncate']


def device_truncation_masks(s_blocks, qdims, chi_max: int = None,
                            chi_min: int = None, degeneracy_tol: float = None,
                            trunc_cut: float = None, svd_min: float = None,
                            minimize_error: bool = True):
    """jit/pjit-friendly keep-masks implementing the full truncation solver.

    Parameters
    ----------
    s_blocks : list of 1D jax arrays
        Singular values per sector (device-resident, possibly sharded).
    qdims : sequence of float
        Quantum dimension per sector (static metadata).
    chi_max, chi_min : int, optional
        Keep at most / at least this many multiplets (static).
    degeneracy_tol : float, optional
        Never cut between singular values with ``|log(S_i/S_j)| < degeneracy_tol``.
    trunc_cut : float, optional
        Total discarded weight must satisfy ``sum qdim S^2 <= trunc_cut^2 * norm^2``.
    svd_min : float, optional
        Discard singular values strictly below this.
    minimize_error : bool
        Keep as many values as the constraints allow (reference semantics).

    Returns
    -------
    masks : list of bool jax arrays
        Keep-mask per sector block. Inside jit these are traced values; convert the
        decision to static structure host-side (fetch) before building the new leg.
    err : scalar jax array
        Truncation error ``sqrt(discarded weight / total weight)``.
    new_norm : scalar jax array
        qdim-weighted norm of the kept values.
    """
    import jax.numpy as jnp

    sizes = [int(b.shape[0]) for b in s_blocks]
    n = int(sum(sizes))
    if n == 0:
        return [], jnp.zeros(()), jnp.zeros(())
    all_S = jnp.concatenate([jnp.abs(b) for b in s_blocks])
    qd = jnp.concatenate([jnp.full((m,), float(q)) for m, q in zip(sizes, qdims)])

    marginal = qd * all_S ** 2
    order = jnp.argsort(-marginal, stable=True)
    S_sorted = all_S[order]
    disc_terms = marginal[order]
    norm_sq = jnp.maximum(jnp.sum(marginal), 1e-300)

    ks = jnp.arange(n + 1)
    ok = jnp.ones(n + 1, dtype=bool)
    if degeneracy_tol:
        logS = jnp.log(jnp.maximum(S_sorted, 1e-100))
        gaps_ok = jnp.abs(logS[:-1] - logS[1:]) >= degeneracy_tol
        ok = ok.at[1:n].set(gaps_ok)
    # disc[k] = discarded weight when keeping the first k (keep-priority order)
    disc = jnp.concatenate([jnp.cumsum(disc_terms[::-1])[::-1], jnp.zeros(1)])

    k_max = jnp.asarray(n)
    if chi_max is not None:
        k_max = jnp.minimum(k_max, int(chi_max))
    if svd_min is not None:
        viol = all_S[order] < svd_min
        any_viol = jnp.any(viol)
        first_viol = jnp.argmax(viol)
        k_max = jnp.where(any_viol, jnp.minimum(k_max, first_viol), k_max)
    if trunc_cut is not None:
        allowed = disc <= trunc_cut ** 2 * norm_sq
        k_needed = jnp.argmax(allowed)  # first k meeting the error bound
    else:
        k_needed = jnp.asarray(0)
    k_min = k_needed
    if chi_min is not None:
        k_min = jnp.maximum(k_min, min(int(chi_min), n))

    valid = ok & (ks <= k_max)
    k_best = jnp.max(jnp.where(valid, ks, -1))
    if minimize_error:
        above = ok & (ks >= k_min)
        k_above = jnp.min(jnp.where(above, ks, n + 1))
        k = jnp.where((k_best < k_min) & (k_above <= n), k_above, k_best)
    else:
        window = ok & (ks >= k_min) & (ks <= k_max)
        k_low = jnp.min(jnp.where(window, ks, n + 1))
        k = jnp.where(k_low <= n, k_low, k_best)
    k = jnp.maximum(k, 0)

    keep_sorted = ks[:n] < k
    keep = jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
    masks = []
    start = 0
    for m in sizes:
        masks.append(keep[start:start + m])
        start += m
    err = jnp.sqrt(jnp.maximum(disc[k], 0.) / norm_sq)
    new_norm = jnp.sqrt(jnp.maximum(norm_sq - disc[k], 0.))
    return masks, err, new_norm


def global_truncate(S, chi_max: int = None, svd_min: float = 0., chi_min=None,
                    degeneracy_tol=None, trunc_cut=None):
    """Global truncation of a (possibly sharded) DiagonalTensor of singular values.

    Runs the full constraint solve on device (collectives inserted by XLA if
    sharded), fetches the boolean masks to the host, and returns the corresponding
    :class:`~cyten_tpu.tensors.Mask` plus the truncation error.
    """
    import numpy as onp

    from ..tensors import Mask

    leg = S.leg
    qdims = [leg.symmetry.qdim(leg.sector_decomposition[i])
             for i in range(leg.num_sectors)]
    # align qdims with the data blocks via block_inds
    q_by_block = [qdims[int(i)] for i in onp.atleast_1d(S.data.block_inds)]
    masks, err, _ = device_truncation_masks(
        S.data.blocks, q_by_block, chi_max=chi_max, chi_min=chi_min,
        degeneracy_tol=degeneracy_tol, trunc_cut=trunc_cut, svd_min=svd_min)
    host_masks = [onp.asarray(m) for m in masks]
    err = float(err)
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
