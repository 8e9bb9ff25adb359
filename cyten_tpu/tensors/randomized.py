"""Randomized truncated SVD — the growth-phase complement to ``tensors/steady.py``.

On TPU, full per-sector SVDs are QDWH-based and expensive (docs/DESIGN.md §8:
27-342 ms per sector block at chi 1024-4096), while GEMMs and thin QR are cheap.
When only the top ``chi`` singular triplets are needed (DMRG truncation with
``chi_max`` well below the block dimensions) the randomized range-finder
[Halko, Martinsson & Tropp, SIAM Rev. 53, 217 (2011)] computes them with
GEMMs + thin QR + one *small* SVD:

    1. sketch        Y = A Ω,      Ω random with ~(chi + p) columns per sector
    2. power iters   Y <- A (A† Q),  Q = qr(Y)      (sharpen the spectrum)
    3. project       B = Q† A       (small: (chi+p) x n per sector)
    4. small SVD     B = U_B S Vh,  U = Q U_B

Everything is expressed in backend-agnostic tensor ops (compose/qr/svd), so the
same code serves the abelian AND fusion-tree backends, with per-sector sketch
sizes derived from the symmetry structure. The tail weight missed by the sketch
is accounted *exactly* via ||A||^2 - ||S||^2, so the reported truncation error
is an upper-bound-correct estimate, not a guess.

Use when bond structures still change (growth phase); once they freeze, the
warm-started steady SVD (``tensors/steady.py``) is cheaper still.

**Measured on TPU v5e (docs/DESIGN.md §8c): XLA's QDWH runs near GEMM rate on
realistic DMRG blocks, so the exact per-sector SVD beats this path at every
truncation ratio up to 32 — the engines therefore default to 'exact'.** This
module remains the right tool where the classic randomized-SVD assumption
(factorizations orders of magnitude slower than matmul) actually holds.

The reference has no counterpart (its per-sector LAPACK SVDs are cheap on CPU);
this is a TPU-native addition. Truncation semantics follow the reference solver
(reference cyten/backends/_backend.py:791-909) via ``truncate_singular_values``.
"""

from __future__ import annotations

import numpy as np

from ..symmetries import ElementarySpace
from ._functions import (
    _decomposition_prepare, _svd_new_labels, compose, dagger, norm, qr,
    scalar_multiply, split_legs, svd, svd_apply_mask, truncate_singular_values,
)
from ._tensors import SymmetricTensor

__all__ = ['randomized_truncated_svd']


def _range_finder(prepped, omega, n_power: int, new_leg_dual: bool):
    """Sketch + power iterations + projection + small SVD (steps 1-4)."""
    Y = compose(prepped, omega)
    Q, _ = qr(Y)
    for _ in range(int(n_power)):
        Z = compose(dagger(prepped), Q)
        Qz, _ = qr(Z)
        Y = compose(prepped, Qz)
        Q, _ = qr(Y)
    B = compose(dagger(Q), prepped)
    U_B, S, Vh = svd(B, new_leg_dual=new_leg_dual)
    U = compose(Q, U_B)
    return U, S, Vh


_JITTED_RANGE_FINDER = None


def _get_jitted_range_finder():
    """One jitted range finder; jax caches compilations per block structure.

    Fusing the whole chain into a single device program removes the per-op
    dispatch round trips (~30 ms each over the tunnel) that otherwise dominate
    the randomized path — measured host-driven it LOSES to per-sector QDWH
    (0.44-0.78x, scripts/exp_randomized_svd_tpu.py); fused it pays one RTT.
    """
    global _JITTED_RANGE_FINDER
    if _JITTED_RANGE_FINDER is None:
        import jax

        _JITTED_RANGE_FINDER = jax.jit(_range_finder, static_argnums=(2, 3))
    return _JITTED_RANGE_FINDER


def randomized_truncated_svd(tensor, chi_max: int, new_labels=None,
                             new_leg_dual: bool = False, n_oversample: int = 16,
                             n_power: int = 1, sector_ranks=None, rng=None,
                             normalize_to: float = None, chi_min=None,
                             degeneracy_tol=None, trunc_cut=None, svd_min=None,
                             pad_to_multiple: int = None, fused: bool = None):
    """Truncated SVD via a randomized range finder. Same return convention as
    :func:`truncated_svd`: ``(U, S, Vh, err, renormalize)``.

    Parameters
    ----------
    chi_max : int
        Global truncation budget (as in :func:`truncate_singular_values`). Also
        caps the per-sector sketch size at ``chi_max + n_oversample``.
    n_oversample : int
        Extra sketch columns per sector; improves the top-``chi`` accuracy.
    n_power : int
        Power (subspace) iterations. 1-2 suffice for DMRG-like decaying spectra.
    sector_ranks : dict[tuple, int] | int | None
        Optional per-sector rank hints (e.g. the previous bond's kept counts,
        times a growth factor). Keys are sector tuples of the new leg. Sketch
        size per sector is ``min(mult, hint + n_oversample)``.
    rng : np.random.Generator | None
        Randomness source for the sketch.

    Notes
    -----
    If the sketch does not reduce any sector (small tensors), this falls back to
    the exact :func:`truncated_svd`. The reported ``err`` includes the weight
    outside the sketched subspace (computed exactly from norms), so downstream
    error accounting stays honest even if the sketch undershoots.
    """
    if rng is None:
        rng = np.random.default_rng()
    a, b, c, d = _svd_new_labels(new_labels)
    prepped, new_leg, comb_cod, comb_dom = _decomposition_prepare(tensor,
                                                                  new_leg_dual)
    sym = prepped.symmetry

    # per-sector sketch sizes
    mults = np.asarray(new_leg.multiplicities, int)
    caps = np.full(len(mults), int(chi_max) + int(n_oversample), dtype=int)
    if sector_ranks is not None:
        if isinstance(sector_ranks, int):
            caps = np.minimum(caps, sector_ranks + n_oversample)
        else:
            for i, sec in enumerate(new_leg.sector_decomposition):
                hint = sector_ranks.get(tuple(int(x) for x in sec))
                if hint is not None:
                    caps[i] = min(caps[i], int(hint) + n_oversample)
    sketch_mults = np.minimum(mults, np.maximum(caps, 1))
    if np.all(sketch_mults >= mults):
        # no reduction anywhere: exact path is cheaper
        U, S, Vh = svd(tensor, new_labels=new_labels, new_leg_dual=new_leg_dual)
        mask, err, new_norm = truncate_singular_values(
            S, chi_max=chi_max, chi_min=chi_min, degeneracy_tol=degeneracy_tol,
            trunc_cut=trunc_cut, svd_min=svd_min,
            pad_to_multiple=pad_to_multiple)
        U, S, Vh = svd_apply_mask(U, S, Vh, mask)
        if normalize_to is None:
            return U, S, Vh, err, 1.
        renormalize = normalize_to / float(new_norm)
        return U, scalar_multiply(renormalize, S), Vh, err, renormalize

    G = ElementarySpace.from_sector_decomposition(
        sym, new_leg.sector_decomposition.copy(), sketch_mults,
        is_dual=new_leg.is_dual)
    dom_factors = list(prepped.domain.factors)
    omega = SymmetricTensor.from_random_normal(
        dom_factors, [G], backend=prepped.backend, rng=rng,
        dtype=prepped.dtype)

    # range finder with power iterations (re-orthogonalized each half-step);
    # on jit-capable block backends the whole chain runs as ONE device program
    if fused is None:
        fused = prepped.backend.block_backend.can_jit
    if fused:
        U, S, Vh = _get_jitted_range_finder()(prepped, omega, int(n_power),
                                              bool(new_leg_dual))
    else:
        U, S, Vh = _range_finder(prepped, omega, n_power, new_leg_dual)
    norm_S_all_sq = float(norm(S)) ** 2  # total computed weight (qdim-weighted)

    # global truncation over the computed values
    mask, err, new_norm = truncate_singular_values(
        S, chi_max=chi_max, chi_min=chi_min, degeneracy_tol=degeneracy_tol,
        trunc_cut=trunc_cut, svd_min=svd_min, pad_to_multiple=pad_to_multiple)
    U, S, Vh = svd_apply_mask(U, S, Vh, mask)

    # account for the weight the sketch did not capture (exact, via norms):
    # discarded-by-truncation + missed-by-sketch, relative to the full tensor
    norm_t_sq = float(norm(prepped)) ** 2
    disc_sq = max(norm_S_all_sq - float(new_norm) ** 2, 0.)
    missed_sq = max(norm_t_sq - norm_S_all_sq, 0.)
    err_total = float(np.sqrt((disc_sq + missed_sq) / max(norm_t_sq, 1e-300)))

    if normalize_to is None:
        renormalize = 1.
    else:
        renormalize = normalize_to / float(new_norm)
        S = scalar_multiply(renormalize, S)

    # restore labels & split combined legs, mirroring truncated_svd/svd
    U = U.copy(deep=False)
    U.labels = [*prepped.codomain_labels, a]
    S = S.copy(deep=False)
    S.labels = [b, c]
    Vh = Vh.copy(deep=False)
    Vh.labels = [d, *reversed(prepped.domain_labels)]
    if comb_cod:
        U = split_legs(U, 0)
    if comb_dom:
        Vh = split_legs(Vh, -1)
    return U, S, Vh, err_total, renormalize
