"""Rank-adaptive warm-started truncated SVD — breaking the growth-phase QDWH wall.

The steady SVD (``tensors/steady.py``) removes QDWH from the *converged* DMRG loop
but freezes the per-sector ranks; the randomized SVD (``tensors/randomized.py``)
adapts ranks but sketches ``chi_max + p`` columns per sector from scratch and was
measured to lose to exact per-sector QDWH on TPU (docs/DESIGN.md §8c). This module
is the middle ground the growth phase actually wants [VERDICT r2 #2]:

    sketch  =  previous visit's right-isometry  ⊕  p fresh random columns

Per sector, the previous kept rank ``k_c`` is warm (within O(truncation error) of
the answer after the first sweep) and only the ``p`` head-room columns are cold, so
one power iteration suffices and the sketch is ``k_c + p`` per sector instead of
``chi_max + p``. The factorization itself never sees a large QDWH:

1. ``V0 = qr([V_prev | Ω])``            — thin QR, warm ⊕ random, orthonormal
2. ``V  <- qr(θ† (θ V))``  (n_power ×)  — 2 GEMMs + thin QR per iteration
3. ``B = θ V;  B = Q R``                — thin QR; R is (k_c+p)² per sector
4. ``R = U_R S W†``                     — QDWH SVD of the SMALL square R only
5. ``U = Q U_R;  Vh = (V W)†``          — exact isometries by construction

Cost: the only QDWH runs at size ``(k_c + p)``, not at the theta block size —
eigh/svd cost scales ~n² on TPU (docs/DESIGN.md §8), so the factorization cost
drops by ~(block_dim / (k_c+p))². Singular values come from the SVD of R directly
(no Rayleigh-quotient squaring), so small-value accuracy matches the exact path.

Ranks ADAPT: the truncation solver (full reference constraint set) runs on the
computed spectrum; per visit each sector can grow by up to ``p`` (new sectors
appear with up to ``p`` values — the random columns cover every candidate bond
sector). The tail weight outside the sketch is accounted exactly via
``||θ||² - ||S_all||²``, so the reported truncation error is upper-bound-correct
even when the sketch undershoots.

Reference counterpart being replaced: the per-sector full-SVD loop
(reference cyten/backends/abelian.py:1928-2011). Truncation semantics follow the
reference solver (cyten/backends/_backend.py:791-909) via
``truncate_singular_values``.
"""

from __future__ import annotations

import numpy as np

from ..symmetries import ElementarySpace
from ._functions import (
    compose, dagger, norm, qr, scalar_multiply, svd, svd_apply_mask,
    tensor_from_grid, truncate_singular_values,
)
from ._tensors import SymmetricTensor

__all__ = ['adaptive_truncated_svd']


def _sketch_extra_leg(thp, warm_leg, n_extra: int):
    """ElementarySpace of fresh sketch columns: for every candidate bond sector c
    (present in BOTH the codomain and domain fusion of ``thp``), ``n_extra``
    columns, capped so warm + extra never exceeds the exact bond rank
    ``min(cod_mult_c, dom_mult_c)``. Returns None if no sector needs columns."""
    cod_secs = thp.codomain.sector_decomposition
    cod_mults = thp.codomain.multiplicities
    dom_secs = thp.domain.sector_decomposition
    dom_mults = thp.domain.multiplicities
    cod = {tuple(int(x) for x in s): int(m) for s, m in zip(cod_secs, cod_mults)}
    warm = {tuple(int(x) for x in s): int(m)
            for s, m in zip(warm_leg.sector_decomposition, warm_leg.multiplicities)}
    secs, mults = [], []
    for s, m_dom in zip(dom_secs, dom_mults):
        key = tuple(int(x) for x in s)
        m_cod = cod.get(key)
        if m_cod is None:
            continue
        full = min(int(m_dom), m_cod)
        extra = min(n_extra, max(full - warm.get(key, 0), 0))
        if extra > 0:
            secs.append(s)
            mults.append(extra)
    if not secs:
        return None
    return ElementarySpace.from_sector_decomposition(
        thp.symmetry, np.asarray(secs), np.asarray(mults, int),
        is_dual=warm_leg.is_dual)


def _factor_chain(thp, Vh_prev, omega, n_power: int,
                  assume_isometry: bool = True):
    """The sketch assembly + GEMM/QR/small-SVD pipeline (everything before the
    truncation decision) — jittable; fused into one device program on
    jit-capable backends so the whole phase costs ONE dispatch instead of one
    round trip per block operation (cf. randomized.py; docs/DESIGN.md §15)."""
    V = dagger(Vh_prev)                         # thp.domain <- [kept_prev]
    if omega is None:
        # a DMRG B tensor is already a right isometry: its dagger has
        # orthonormal columns, so the sketch QR is redundant (measured:
        # ~40 ms of thin QR at chi=4096); n_power >= 1 re-orthonormalizes
        # anyway, so even a slightly degraded input is safe
        if not assume_isometry:
            V, _ = qr(V)
    else:
        V0 = tensor_from_grid([[V, omega]])
        V, _ = qr(V0)
    for _ in range(int(n_power)):
        B = compose(thp, V)                     # [codomain | sketch]
        Z = compose(dagger(thp), B)             # [domain | sketch]
        V, _ = qr(Z)
    B = compose(thp, V)
    # factor through a thin QR so the only QDWH runs on the SMALL square R
    Q, R = qr(B)                                # R: [q | sketch], (k_c+p)-sized
    U_R, S, Vh_R = svd(R)
    # norms computed in-graph: two extra device scalars instead of two eager
    # multi-block reductions (each a host round trip per block on the tunnel)
    return V, Q, U_R, S, Vh_R, norm(S) ** 2, norm(thp) ** 2


_JITTED_CHAIN = None
_PHASE2_CACHE: dict = {}


def _get_jitted_chain():
    global _JITTED_CHAIN
    if _JITTED_CHAIN is None:
        import jax

        _JITTED_CHAIN = jax.jit(_factor_chain, static_argnums=(3, 4))
    return _JITTED_CHAIN


def _exact_chain(thp):
    """Full (exact) SVD + in-graph norms — phase 1 of the fused exact path."""
    U, S, Vh = svd(thp)
    return U, S, Vh, norm(S) ** 2


_JITTED_EXACT = None


def _get_jitted_exact():
    global _JITTED_EXACT
    if _JITTED_EXACT is None:
        import jax

        _JITTED_EXACT = jax.jit(_exact_chain)
    return _JITTED_EXACT


_MASK_CACHE: dict = {}


def _mask_cache_key(mask):
    """Cache key identifying the mask EXACTLY: its boolean pattern plus the
    large leg's full signature (two identical patterns on different legs must
    not share a compiled program). None disables the jitted path (no host
    pattern, or a backend whose mask application is not traceable — the
    fusion-tree backend resolves masks host-side)."""
    bools = getattr(mask, '_host_bools', None)
    if bools is None or not getattr(mask.backend, 'mask_apply_traceable', True):
        return None
    leg = mask.large_leg
    return (str(leg.symmetry),
            tuple(map(tuple, leg.sector_decomposition.tolist())),
            tuple(int(m) for m in leg.multiplicities),
            bool(leg.is_dual), bools)


def _apply_mask_cached(U, S, Vh, mask, fused):
    """``svd_apply_mask`` as a jitted program cached on the mask pattern."""
    key = _mask_cache_key(mask) if fused else None
    if key is None:
        return svd_apply_mask(U, S, Vh, mask)
    fn = _MASK_CACHE.get(key)
    if fn is None:
        import jax

        fn = jax.jit(lambda U, S, Vh: svd_apply_mask(U, S, Vh, mask))
        _MASK_CACHE[key] = fn
        while len(_MASK_CACHE) > 512:  # LRU: evict oldest, not wholesale
            _MASK_CACHE.pop(next(iter(_MASK_CACHE)))
    else:
        _MASK_CACHE[key] = _MASK_CACHE.pop(key)  # mark most-recently-used
    return fn(U, S, Vh)


def fused_truncated_svd(thp, chi_max: int = None, new_labels=('vR', 'vL'),
                        chi_min=None, degeneracy_tol=None, trunc_cut=None,
                        svd_min=None, pad_to_multiple: int = None,
                        normalize_to: float = None, fused: bool = None):
    """EXACT truncated SVD with the same two-phase jit structure as the
    adaptive path: one jitted factorization program, a host truncation
    decision (single batched fetch), and a mask application jitted per mask
    pattern. Numerically identical to :func:`truncated_svd`; on a remote TPU
    the eager per-block dispatch overhead of the plain path dominates its
    QDWH cost 3-30x (measured, docs/DESIGN.md §15), which this removes.

    Returns ``(U, S, Vh, err, renormalize)``."""
    backend = thp.backend
    if fused is None:
        fused = backend.block_backend.can_jit
    chain = _get_jitted_exact() if fused else _exact_chain
    U, S, Vh, nS_sq = chain(thp)
    a, b = new_labels
    U = U.copy(deep=False)
    U.labels = [*U.labels[:-1], a]
    S = S.relabelled([b, f'{b}*'])
    Vh = Vh.copy(deep=False)
    Vh.labels = [b, *Vh.labels[1:]]
    mask, err, new_norm = truncate_singular_values(
        S, chi_max=chi_max, chi_min=chi_min, degeneracy_tol=degeneracy_tol,
        trunc_cut=trunc_cut, svd_min=svd_min, pad_to_multiple=pad_to_multiple)
    U, S, Vh = _apply_mask_cached(U, S, Vh, mask, fused)
    if normalize_to is None:
        renormalize = 1.
    else:
        renormalize = normalize_to / float(new_norm)
        S = scalar_multiply(renormalize, S)
    return U, S, Vh, err, renormalize


def _phase2(Q, U_R, S, Vh_R, V, mask):
    """Mask application + the two output composes (post-truncation phase)."""
    U_R, S, Vh_R = svd_apply_mask(U_R, S, Vh_R, mask)
    U = compose(Q, U_R)
    Vh = compose(Vh_R, dagger(V))
    return U, S, Vh


def _phase2_run(Q, U_R, S, Vh_R, V, mask, fused):
    """Run phase 2, jitted per mask pattern. The mask is a trace-time constant
    (it determines output shapes), so compiled programs are cached on its
    boolean content (host copy attached by truncate_singular_values — no
    device fetch); with chi bucketing (pad_to_multiple) the patterns repeat,
    bounding recompiles exactly like the static-mode structures."""
    key = _mask_cache_key(mask) if fused else None
    if key is None:
        return _phase2(Q, U_R, S, Vh_R, V, mask)
    fn = _PHASE2_CACHE.get(key)
    if fn is None:
        import jax

        fn = jax.jit(lambda Q, U_R, S, Vh_R, V: _phase2(Q, U_R, S, Vh_R, V,
                                                        mask))
        _PHASE2_CACHE[key] = fn
        while len(_PHASE2_CACHE) > 512:  # LRU: evict oldest, not wholesale
            _PHASE2_CACHE.pop(next(iter(_PHASE2_CACHE)))
    else:
        _PHASE2_CACHE[key] = _PHASE2_CACHE.pop(key)  # mark most-recently-used
    return fn(Q, U_R, S, Vh_R, V)


def adaptive_truncated_svd(thp, Vh_prev, chi_max: int, n_oversample: int = 16,
                           n_power: int = 1, new_labels=('vR', 'vL'),
                           chi_min=None, degeneracy_tol=None, trunc_cut=None,
                           svd_min=None, pad_to_multiple: int = None,
                           normalize_to: float = None, rng=None,
                           fused: bool = None):
    """Truncated SVD of ``thp``, warm-started from the previous visit's ``Vh_prev``
    with ``n_oversample`` columns of per-sector rank head-room.

    Parameters
    ----------
    thp : SymmetricTensor
        The wavefunction as a morphism codomain -> domain (e.g. [vL, p0 | vR, p1]).
    Vh_prev : SymmetricTensor
        Right isometry from the previous visit of this bond (in DMRG: the current
        ``B`` tensor as ``[kept] <- thp.domain``). Its per-sector ranks seed the
        sketch; they do NOT freeze the result — ranks adapt by up to
        ``n_oversample`` per sector per visit, including newly appearing sectors.
    chi_max, chi_min, degeneracy_tol, trunc_cut, svd_min, pad_to_multiple
        Truncation constraints, as in :func:`truncate_singular_values`.
    n_power : int
        Subspace (power) iterations after the warm start; 1 suffices once the
        warm subspace is within O(truncation error) of the answer.

    Returns
    -------
    (U, S, Vh, err, renormalize) — same convention as ``randomized_truncated_svd``.
    ``err`` includes the (exactly accounted) weight outside the sketch.
    """
    if rng is None:
        rng = np.random.default_rng()
    backend = thp.backend

    warm_leg = Vh_prev.codomain.factors[0]
    G = _sketch_extra_leg(thp, warm_leg, int(n_oversample))
    if G is not None:
        omega = SymmetricTensor.from_random_normal(
            list(Vh_prev.domain.factors), [G], backend=backend, rng=rng,
            dtype=thp.dtype)
        from ._tensors import _dual_label_list

        omega = omega.copy(deep=False)
        omega.labels = _dual_label_list(Vh_prev.labels)  # == dagger(Vh_prev)'s
    else:
        omega = None
    if fused is None:
        # the grid assembly is traceable on backends with a blockwise
        # from_grid (abelian); elsewhere only the no-growth case fuses
        fused = backend.block_backend.can_jit and (
            omega is None or hasattr(backend, 'from_grid'))
    chain = _get_jitted_chain() if fused else _factor_chain
    V, Q, U_R, S, Vh_R, nS_sq, nt_sq = chain(thp, Vh_prev, omega,
                                             int(n_power))
    a, b = new_labels
    U_R = U_R.copy(deep=False)
    U_R.labels = [*U_R.labels[:-1], a]
    S = S.relabelled([b, f'{b}*'])
    Vh_R = Vh_R.copy(deep=False)
    Vh_R.labels = [b, *Vh_R.labels[1:]]
    norm_S_all_sq = float(nS_sq)                # computed weight (qdim-weighted)

    mask, err, new_norm = truncate_singular_values(
        S, chi_max=chi_max, chi_min=chi_min, degeneracy_tol=degeneracy_tol,
        trunc_cut=trunc_cut, svd_min=svd_min, pad_to_multiple=pad_to_multiple)
    U, S, Vh = _phase2_run(Q, U_R, S, Vh_R, V, mask, fused)
    # exact error: discarded-by-truncation + missed-by-sketch, via norms
    norm_t_sq = float(nt_sq)
    disc_sq = max(norm_S_all_sq - float(new_norm) ** 2, 0.)
    missed_sq = max(norm_t_sq - norm_S_all_sq, 0.)
    err_total = float(np.sqrt((disc_sq + missed_sq) / max(norm_t_sq, 1e-300)))

    if normalize_to is None:
        renormalize = 1.
    else:
        renormalize = normalize_to / float(new_norm)
        S = scalar_multiply(renormalize, S)

    a, b = new_labels
    U = U.relabelled({U.labels[-1]: a})
    S = S.relabelled([b, f'{b}*'])
    Vh = Vh.relabelled({Vh.labels[0]: b})
    return U, S, Vh, err_total, renormalize
