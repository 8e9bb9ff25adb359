"""Two-site DMRG on finite MPS.

Role-equivalent to reference ``toycodes/tenpy_toycodes/d_dmrg.py`` (HEffective :14,
DMRGEngine :117). The effective-Hamiltonian matvec is a chain of label-based tdot
calls, so it runs unchanged on every symmetry backend; with jax blocks, each matvec
traces to a fixed sequence of XLA GEMMs on the MXU.

Environment conventions:

- ``LPs[i]``: everything left of site i, labels ``['vR', 'wR', 'vR*']``
  (ket bond, MPO bond, bra bond).
- ``RPs[i]``: everything right of site i, labels ``['vL', 'wL', 'vL*']``.
"""

from __future__ import annotations

import numpy as np

from ..dtypes import Dtype
from ..symmetries import ElementarySpace
from ..tensors import (
    SymmetricTensor, compose, dagger, norm, permute_legs, pinv, scale_axis, tdot,
)
from ..tensors.krylov_based import lanczos
from ..tensors.sparse import LinearOperator
from .mps import SimpleMPS, split_truncate_theta

__all__ = ['HEffective', 'DMRGEngine', 'FaultError']


class FaultError(RuntimeError):
    """A sweep produced a non-finite result and rollback was impossible or
    exhausted (see :meth:`DMRGEngine.run`'s ``checkpoint`` / ``max_faults``)."""


_JITTED_MATVEC = {}
_JITTED_UPDATE_LP = None
_JITTED_UPDATE_RP = None


def _with_precision(fn, precision):
    """Wrap `fn` so its block dots run at the given jax matmul precision.

    Works by temporarily setting ``config.matmul_precision`` (which the jax
    block backend bakes into every dot at trace time — the innermost context
    wins, so a plain ``jax.default_matmul_precision`` wrapper would be
    overridden by the backend's own per-op context).

    On TPU, f32 dots are executed as bf16 MXU passes: 'float32' = 6 passes
    (~1e-7, the accuracy-comparable-to-f64-reference setting — the global
    default), 'tensorfloat32' = 3 passes (~3e-6, 1.7x faster), 'default' =
    1 pass (~1e-3, 4x faster) — measured ladder in docs/DESIGN.md §4. DMRG is
    variational (energy error is second order in matvec noise), so
    'tensorfloat32' is a well-founded production setting for the matvec.
    `None` keeps the global config value.
    """
    if precision is None:
        return fn

    def wrapped(*args, **kwargs):
        from ..config import config

        old = config.matmul_precision
        config.matmul_precision = precision
        try:
            return fn(*args, **kwargs)
        finally:
            config.matmul_precision = old
    return wrapped


def _update_LP_impl(LP, W, A):
    """LP' from LP and the left-isometric site tensor A (planar rearrangements)."""
    t = tdot(A, LP, 'vL', 'vR')               # [p, vR, vR*, wR]
    t = tdot(t, W, ['p', 'wR'], ['p*', 'wL'])  # [vR, vR*, p, wR]
    tp = permute_legs(t, codomain=['vR*', 'p'], domain=['vR', 'wR'])
    return compose(dagger(A), tp)              # [vR*, wR, vR]


def _update_RP_impl(RP, W, B):
    """RP' from RP and the right-isometric site tensor B (planar rearrangements)."""
    t = tdot(B, RP, 'vR', 'vL')                # [vL, p, wL, vL*]
    tp = permute_legs(t, codomain=['p', 'wL'], domain=['vL', 'vL*'])
    t = compose(W, tp)                          # [wL, p, vL*, vL]
    zp = permute_legs(t, codomain=['vL', 'wL'], domain=['vL*', 'p'])
    dB = permute_legs(dagger(B), codomain=['vR*', 'p*'], domain=['vL*'])
    return compose(zp, dB)                      # [vL, wL, vL*]


def _get_jitted_env_updates():
    global _JITTED_UPDATE_LP, _JITTED_UPDATE_RP
    if _JITTED_UPDATE_LP is None:
        import jax

        _JITTED_UPDATE_LP = jax.jit(_update_LP_impl)
        _JITTED_UPDATE_RP = jax.jit(_update_RP_impl)
    return _JITTED_UPDATE_LP, _JITTED_UPDATE_RP


def _apply_bond_mixing(x1, W1, W2):
    """Apply BOTH MPO tensors to ``x1 = LP . theta`` in a single pass.

    The classic chain runs two sparse GEMM stages (``. W1`` then ``. W2``)
    whose chi^2-sized intermediates each make a full HBM round trip and are
    re-read once per block pair — ~600 MB of the chi=4096 matvec's 1.1 GB
    streaming traffic for ~0.4 GFLOP of work (metadata traffic model,
    bench.matvec_traffic_bytes). Here, per (vR*, vR) sector group, all x1
    blocks are concatenated along one (w, p0, p1) channel axis and hit a
    single small mixing matrix assembled from W1·W2 at trace time: every x1
    element is read once, every output element written once.

    ``x1`` legs ``[vR*, wR, p0, p1, vR]`` (any conventional order — axes are
    resolved by label); returns the tensor the chained
    ``tdot(W2, tdot(W1, x1, ...), ...)`` computes, with legs
    ``[p1, wR, p0, vR*, vR]``. Abelian backends only (index-equality pairing).
    """
    backend = x1.backend
    bb = backend.block_backend
    xp = bb.xp
    ax_i, ax_w, ax_p0, ax_p1, ax_b = x1.get_leg_idcs(
        ['vR*', 'wR', 'p0', 'p1', 'vR'])
    w1_wL, w1_p0, w1_wR, w1_p0c = W1.get_leg_idcs(['wL', 'p0', 'wR', 'p0*'])
    w2_wL, w2_p1, w2_wR, w2_p1c = W2.get_leg_idcs(['wL', 'p1', 'wR', 'p1*'])

    # index W blocks by their contracted legs (index equality — contracted
    # legs are mutually dual spaces with the same defining-sector order)
    W1_by = {}
    for n, r in enumerate(W1.data.block_inds):
        W1_by.setdefault((int(r[w1_p0c]), int(r[w1_wL])), []).append(n)
    W2_by = {}
    for n, r in enumerate(W2.data.block_inds):
        W2_by.setdefault((int(r[w2_p1c]), int(r[w2_wL])), []).append(n)

    def squeeze_w1(n):
        blk = W1.data.blocks[n]
        t = xp.transpose(blk, (w1_wL, w1_p0, w1_wR, w1_p0c))
        return xp.reshape(t, (t.shape[0], t.shape[2]))  # [m_w0, m_w1]

    def squeeze_w2(n):
        blk = W2.data.blocks[n]
        t = xp.transpose(blk, (w2_wL, w2_p1, w2_wR, w2_p1c))
        return xp.reshape(t, (t.shape[0], t.shape[2]))  # [m_w1, m_w2]

    # in-channel (w, p0, p1) -> [(out-channel (w2, p0o, p1o), piece, m_w2)]
    piece_cache: dict = {}

    def pieces_for(in_key):
        if in_key in piece_cache:
            return piece_cache[in_key]
        w, p0, p1 = in_key
        out: dict = {}
        for n1 in W1_by.get((p0, w), ()):
            r1 = W1.data.block_inds[n1]
            p0o, w1 = int(r1[w1_p0]), int(r1[w1_wR])
            A = squeeze_w1(n1)
            for n2 in W2_by.get((p1, w1), ()):
                r2 = W2.data.block_inds[n2]
                p1o, w2 = int(r2[w2_p1]), int(r2[w2_wR])
                # precision-honoring dot (matches the chained-tdot numerics)
                piece = bb.tensordot(A, [1], squeeze_w2(n2), [0])  # [m0, m2]
                key = (w2, p0o, p1o)
                out[key] = piece if key not in out else out[key] + piece
        res = sorted(out.items())
        piece_cache[in_key] = res
        return res

    # group x1 blocks by (vR* sector, vR sector)
    groups: dict = {}
    for n, row in enumerate(x1.data.block_inds):
        key = (int(row[ax_i]), int(row[ax_b]))
        groups.setdefault(key, []).append(
            (n, (int(row[ax_w]), int(row[ax_p0]), int(row[ax_p1]))))

    out_blocks = []
    out_rows = []
    res_dtype = x1.data.dtype
    for (i_idx, b_idx), members in sorted(groups.items()):
        members = [(n, k) for n, k in members if pieces_for(k)]
        if not members:
            continue
        # channel layouts
        out_keys = sorted({ok for _, k in members
                           for ok, _ in pieces_for(k)})
        out_sizes = {}
        for _, k in members:
            for ok, piece in pieces_for(k):
                out_sizes[ok] = piece.shape[1]
        C_out = sum(out_sizes[ok] for ok in out_keys)
        col_off = {}
        off = 0
        for ok in out_keys:
            col_off[ok] = off
            off += out_sizes[ok]
        # concatenated input [mi, C_in, mb] and mixing matrix [C_in, C_out]
        Xs = []
        M_rows = []
        for n, k in members:
            blk = x1.data.blocks[n]
            t = xp.transpose(blk, (ax_i, ax_w, ax_p0, ax_p1, ax_b))
            Xs.append(xp.reshape(t, (t.shape[0], t.shape[1], t.shape[4])))
            m_w = Xs[-1].shape[1]
            row_parts = {ok: None for ok in out_keys}
            for ok, piece in pieces_for(k):
                row_parts[ok] = piece
            M_rows.append(xp.concatenate(
                [row_parts[ok] if row_parts[ok] is not None
                 else xp.zeros((m_w, out_sizes[ok]), Xs[-1].dtype)
                 for ok in out_keys], axis=1))
        Xg = Xs[0] if len(Xs) == 1 else xp.concatenate(Xs, axis=1)
        Mg = M_rows[0] if len(M_rows) == 1 else xp.concatenate(M_rows, axis=0)
        Yg = bb.tensordot(Xg, [1], Mg, [0])  # [mi, mb, C_out]
        for ok in out_keys:
            w2, p0o, p1o = ok
            o = col_off[ok]
            sub = Yg[:, :, o:o + out_sizes[ok]]          # [mi, mb, m_w2]
            blk = xp.reshape(xp.transpose(sub, (2, 0, 1)),
                             (1, sub.shape[2], 1, sub.shape[0], sub.shape[1]))
            out_blocks.append(blk)
            out_rows.append([p1o, w2, p0o, i_idx, b_idx])

    from ..backends.data import BlockSparseData
    from ..symmetries import TensorProduct
    from ..tensors import SymmetricTensor

    codomain = TensorProduct(
        [W2._as_codomain_leg('p1'), W2._as_codomain_leg('wR'),
         W1._as_codomain_leg('p0'), x1._as_codomain_leg('vR*')],
        symmetry=x1.symmetry)
    domain = TensorProduct([x1._as_domain_leg('vR')], symmetry=x1.symmetry)
    data = BlockSparseData(
        out_blocks, np.array(out_rows, dtype=np.intp).reshape((-1, 5)),
        res_dtype, is_sorted=False)
    return SymmetricTensor(data, codomain, domain, backend,
                           ['p1', 'wR', 'p0', 'vR*', 'vR'])


def _heff_matvec_impl(LP, RP, W1, W2, theta):
    from ..backends.abelian import AbelianBackend
    from ..backends.no_symmetry import NoSymmetryBackend
    from ..config import config

    if isinstance(theta.backend, AbelianBackend) \
            and config.bond_channel_fusion \
            and W1.dtype == W2.dtype == theta.dtype:
        x = tdot(LP, theta, 'vR', 'vL')                  # [vR*, wR, p0, p1, vR]
        x = _apply_bond_mixing(x, W1, W2)                # [p1, wR, p0, vR*, vR]
        x = tdot(x, RP, ['vR', 'wR'], ['vL', 'wL'])      # [p1, p0, vR*, vL*]
        x = x.relabelled({'vR*': 'vL', 'vL*': 'vR'})
        return permute_legs(x, codomain=['vL', 'p0', 'p1'], domain=['vR'])
    if isinstance(theta.backend, (AbelianBackend, NoSymmetryBackend)):
        # lhs-small operand order: the small static tensor (LP/W) goes on the
        # left, so chi stays the trailing (TPU lane) dim of every intermediate.
        # Measured 1.11x on the full chain at chi=2048 f32 (DESIGN §4, variant
        # E). Only for symmetric-braiding backends: tdot's internal leg moves
        # differ from the planar order below and may braid.
        x = tdot(LP, theta, 'vR', 'vL')                  # [vR*, wR, p0, p1, vR]
        x = tdot(W1, x, ['p0*', 'wL'], ['p0', 'wR'])     # [p0, wR, vR*, p1, vR]
        x = tdot(W2, x, ['p1*', 'wL'], ['p1', 'wR'])     # [p1, wR, p0, vR*, vR]
        x = tdot(x, RP, ['vR', 'wR'], ['vL', 'wL'])      # [p1, p0, vR*, vL*]
        x = x.relabelled({'vR*': 'vL', 'vL*': 'vR'})
        return permute_legs(x, codomain=['vL', 'p0', 'p1'], domain=['vR'])
    # every step below is a *planar* rearrangement (cyclic rotations + bends only),
    # so the same code runs for anyonic symmetries without braid chiralities.
    x = tdot(theta, LP, 'vL', 'vR')                    # [p0, p1, vR, vR*, wR]
    x = tdot(x, W1, ['p0', 'wR'], ['p0*', 'wL'])       # [p1, vR, vR*, p0, wR]
    x = tdot(x, W2, ['p1', 'wR'], ['p1*', 'wL'])       # [vR, vR*, p0, p1, wR]
    x = tdot(x, RP, ['vR', 'wR'], ['vL', 'wL'])        # [vR*, p0, p1, vL*]
    x = x.relabelled({'vR*': 'vL', 'vL*': 'vR'})
    return permute_legs(x, codomain=['vL', 'p0', 'p1'], domain=['vR'])


def _get_jitted_matvec(precision=None):
    """jax.jit over the full matvec: tensors are pytrees, block structure is static
    aux data, so XLA sees one fused program of GEMMs per (env, theta) structure."""
    if precision not in _JITTED_MATVEC:
        import jax

        _JITTED_MATVEC[precision] = jax.jit(
            _with_precision(_heff_matvec_impl, precision))
    return _JITTED_MATVEC[precision]


class HEffective(LinearOperator):
    """Effective two-site Hamiltonian ``LP -- W1 -- W2 -- RP``.

    `matmul_precision` (jitted path only): None | 'float32' | 'tensorfloat32' |
    'default' — see :func:`_with_precision` for the measured TPU tradeoffs.
    """

    def __init__(self, LP, RP, W1, W2, use_jit: bool = None,
                 matmul_precision: str = None):
        self.LP = LP
        self.RP = RP
        self.W1 = W1.relabelled({'p': 'p0', 'p*': 'p0*'})
        self.W2 = W2.relabelled({'p': 'p1', 'p*': 'p1*'})
        if use_jit is None:
            use_jit = W1.backend.block_backend.can_jit
        self.use_jit = use_jit
        self.matmul_precision = matmul_precision
        LinearOperator.__init__(self, dtype=W1.dtype)

    def matvec(self, theta):
        if self.use_jit:
            return _get_jitted_matvec(self.matmul_precision)(
                self.LP, self.RP, self.W1, self.W2, theta)
        return _heff_matvec_impl(self.LP, self.RP, self.W1, self.W2, theta)


_STATIC_BOND_FN = {}


def _get_static_bond_fn(N: int, svd_mode: str = 'exact',
                        steady_opts: dict | None = None):
    """Traceable body of a WHOLE steady-state DMRG bond update:
    theta assembly, fused Lanczos, SVD, static-mask truncation, B-form
    restore and both environment updates — a single device dispatch per bond
    (vs ~60 host round trips; SURVEY §7 delta 4's two-phase truncation with a
    frozen per-sector chi allocation).

    ``svd_mode='exact'`` uses per-sector QDWH SVD + the frozen mask;
    ``'steady'`` replaces it with the warm-started matmul/QR-only
    :func:`~cyten_tpu.tensors.steady.steady_truncated_svd`, seeded by the
    current right-isometry B_{i+1} — on TPU this removes the dominant QDWH
    cost (tens to hundreds of ms per bond at chi >= 1024, measured in
    docs/DESIGN.md) from the hot loop. ``steady_opts`` overrides its
    iteration knobs (n_power/n_jacobi/ns_polish); near convergence
    ``{'n_jacobi': 1, 'ns_polish': 1}`` saves ~8% of the chi=4096 step with
    the cleanup accuracy still second-order (DESIGN §17)."""
    steady_opts = dict(steady_opts or {})
    key = (N, svd_mode, tuple(sorted(steady_opts.items())))
    if key in _STATIC_BOND_FN:
        return _STATIC_BOND_FN[key]
    import jax

    from ..tensors import svd, svd_apply_mask
    from ..tensors.krylov_based import fused_lanczos_impl
    from ..tensors.steady import steady_truncated_svd

    def impl(H, S_i, B_i, B_ip1, theta_tmpl, mask):
        # theta0 = S_i B_i B_{i+1}, embedded into the closed block structure
        th = scale_axis(B_i, S_i, 'vL').relabelled({'p': 'p0'})
        th = tdot(th, B_ip1.relabelled({'p': 'p1'}), 'vR', 'vL')
        th = permute_legs(th, codomain=['vL', 'p0', 'p1'], domain=['vR'])
        th = th + theta_tmpl                   # union with the closed structure
        E, theta = fused_lanczos_impl(H, th, N)
        thp = permute_legs(theta, codomain=['vL', 'p0'], domain=['vR', 'p1'])
        if svd_mode == 'steady':
            Vh_prev = permute_legs(B_ip1.relabelled({'p': 'p1'}),
                                   codomain=['vL'], domain=['vR', 'p1'])
            U, S, Vh, _ = steady_truncated_svd(thp, Vh_prev,
                                               new_labels=('vR', 'vL'),
                                               **steady_opts)
        else:
            U, S, Vh = svd(thp, new_labels=['vR', 'vL'])
            U, S, Vh = svd_apply_mask(U, S, Vh, mask)
        from ..tensors import scalar_multiply

        nrm = norm(S)
        S = scalar_multiply(1. / nrm, S)
        A = U.relabelled({'p0': 'p'})
        B = permute_legs(Vh, codomain=['vL', 'p1'],
                         domain=['vR']).relabelled({'p1': 'p'})
        Sinv = pinv(S_i, cutoff=1e-14)
        new_B_i = scale_axis(scale_axis(A, Sinv, 'vL'), S, 'vR')
        LP_new = _update_LP_impl(H.LP, H.W1.relabelled({'p0': 'p', 'p0*': 'p*'}),
                                 A)
        RP_new = _update_RP_impl(H.RP, H.W2.relabelled({'p1': 'p', 'p1*': 'p*'}),
                                 B)
        return E, new_B_i, S, B, LP_new, RP_new

    fn = _STATIC_BOND_FN[key] = impl
    return fn


def _register_heff_pytree():
    """HEffective as a jax pytree (tensor children, flags as aux data): lets the
    fused Lanczos jit over whole operators and cache by structure."""
    try:
        from jax.tree_util import register_pytree_node
    except ImportError:  # pragma: no cover
        return

    def flatten(h):
        return (h.LP, h.RP, h.W1, h.W2), (h.use_jit, h.matmul_precision,
                                          h.dtype)

    def unflatten(aux, children):
        obj = HEffective.__new__(HEffective)
        obj.LP, obj.RP, obj.W1, obj.W2 = children
        obj.use_jit, obj.matmul_precision, obj.dtype = aux
        obj.vector_shape = None
        return obj

    register_pytree_node(HEffective, flatten, unflatten)


_register_heff_pytree()


class DMRGEngine:
    """Two-site DMRG sweeps with Lanczos ground-state search per bond."""

    # class-level defaults: several engines (TDVP, MultiCellIDMRG) build partial
    # DMRGEngines via __new__ to reuse the environment machinery; optional
    # attributes must be safe there.
    env_dtype = None
    dynamic_svd = 'exact'
    _sweeps_done = 0  # completed sweeps across run() calls (checkpoint steps)

    def __init__(self, psi: SimpleMPS, model, chi_max: int = 32, eps: float = 1e-12,
                 lanczos_options: dict = None, pad_chi_multiple: int = None,
                 jit_env_updates: bool = None, mesh=None,
                 shard_axis_name: str = 'mult', matmul_precision: str = None,
                 orthogonal_to=None, auto_static: bool | str = False,
                 env_dtype: Dtype = None, dynamic_svd: str = 'exact'):
        self.psi = psi
        self.model = model
        self.chi_max = chi_max
        self.eps = eps
        #: list of SimpleMPS to orthogonalize against (excited-state search):
        #: each bond problem is solved in the subspace orthogonal to these
        #: states, via overlap environments + ProjectedLinearOperator
        self.orthogonal_to = list(orthogonal_to or [])
        #: jax matmul precision for the jitted matvec (None | 'float32' |
        #: 'tensorfloat32' | 'default'); measured TPU ladder in docs/DESIGN.md §4
        self.matmul_precision = matmul_precision
        #: optional jax.sharding.Mesh: shard the bond (virtual-leg) multiplicity
        #: axes of environments, site tensors and theta over the mesh. XLA then
        #: inserts the collectives (psum/all-gather) through the per-block GEMMs
        #: and the global-truncation all-gather (SURVEY.md §2.9/§5.8) — results
        #: are numerically identical to the unsharded run (test_sharding.py).
        self.mesh = mesh
        self.shard_axis_name = shard_axis_name
        #: round kept multiplicities per sector up to this multiple (chi bucketing:
        #: bounded jit recompiles + MXU-aligned shapes on TPU)
        self.pad_chi_multiple = pad_chi_multiple
        #: jit the once-per-bond environment updates. Pays off in steady state
        #: (structures repeat every sweep once chi saturates); adds compile overhead
        #: during chi growth. Default: only when chi bucketing bounds the structures.
        if jit_env_updates is None:
            jit_env_updates = (pad_chi_multiple is not None
                               and psi.backend.block_backend.can_jit)
        self.jit_env_updates = jit_env_updates
        self.lanczos_options = lanczos_options or {'N_max': 20, 'P_tol': 1e-14}
        #: switch to static (fully fused) mode automatically once the bond
        #: structures stop changing between sweeps (run() checks). True uses
        #: svd_mode='steady'; pass 'exact' to keep the QDWH SVD instead.
        self.auto_static = auto_static
        #: storage dtype for the MPO environments LP/RP (mixed-precision mode).
        #: ``Dtype.bfloat16`` halves the HBM traffic of the environment reads in
        #: the Lanczos matvec — the measured bottleneck (docs/DESIGN.md §4) —
        #: while theta and the Lanczos iterates stay in the working dtype, so
        #: Krylov orthogonality is unaffected. The effective Hamiltonian then
        #: carries ~bf16-eps (4e-3) relative perturbation; DMRG is variational,
        #: so the energy error is second order (~1e-5 observed, test_bf16.py).
        self.env_dtype = env_dtype
        #: SVD method for dynamic (non-static) bond updates: 'exact' (per-sector
        #: QDWH), 'adaptive' (warm-started rank-adaptive sketch seeded by the
        #: bond's current B tensor — the only QDWH runs at kept-rank size, the
        #: TPU growth-phase default candidate; tensors/adaptive.py), or
        #: 'randomized' (cold GEMM/QR range finder; measured slower than exact
        #: on TPU, docs/DESIGN.md §8c).
        #: Static mode has its own ladder (enable_static_mode(svd_mode=...)).
        self.dynamic_svd = dynamic_svd
        self.backend = psi.backend
        L = psi.L
        self.LPs = [None] * L
        self.RPs = [None] * L
        self._init_environments()
        self.OLs = [[None] * L for _ in self.orthogonal_to]
        self.ORs = [[None] * L for _ in self.orthogonal_to]
        self._init_overlap_environments()
        self.E = None
        self.trunc_err = 0.

    def _shard(self, tensor, leg):
        """Shard `tensor` along the multiplicity axis of `leg` (no-op without mesh)."""
        if self.mesh is None:
            return tensor
        from ..parallel import shard_tensor
        return shard_tensor(tensor, self.mesh, leg, self.shard_axis_name)

    def _init_environments(self):
        psi, model = self.psi, self.model
        L = psi.L
        backend = self.backend

        def ones_func(shape, coupled):
            return backend.block_backend.ones(shape, psi.Bs[0].dtype)

        # initial LP: codomain [V0] ('vR*'), domain [V0, w0] -> legs [vR*, wR, vR]
        V0 = psi.Bs[0].get_leg_co_domain('vL')
        w0 = model.H_mpo[0].get_leg_co_domain('wL')
        LP = SymmetricTensor.from_sector_block_func(
            ones_func, [V0], [V0, w0], backend=backend,
            labels=[['vR*'], ['vR', 'wR']])
        self.LPs[0] = LP
        # initial RP: codomain [VR, w] (['vL', 'wL']), domain [VR] ('vL*')
        VR = psi.Bs[-1].domain.factors[0]
        wR = model.H_mpo[-1].get_leg_co_domain('wR')
        RP = SymmetricTensor.from_sector_block_func(
            ones_func, [VR, wR], [VR], backend=backend,
            labels=[['vL', 'wL'], ['vL*']])
        self.RPs[L - 1] = RP
        for i in range(L - 1, 0, -1):
            self.update_RP(i)

    # --- overlap environments for excited-state orthogonalization ------------------

    def _init_overlap_environments(self):
        if not self.orthogonal_to:
            return
        psi = self.psi
        L = psi.L
        bb = self.backend.block_backend
        dtype = psi.Bs[0].dtype

        def ones_func(shape, coupled):
            return bb.ones(shape, dtype)

        for k, phi in enumerate(self.orthogonal_to):
            V_psi = psi.Bs[0].get_leg_co_domain('vL')
            V_phi = phi.Bs[0].get_leg_co_domain('vL')
            self.OLs[k][0] = SymmetricTensor.from_sector_block_func(
                ones_func, [V_psi], [V_phi], backend=self.backend,
                labels=[['vR*'], ['vR']])
            Vr_psi = psi.Bs[-1].domain.factors[0]
            Vr_phi = phi.Bs[-1].domain.factors[0]
            self.ORs[k][L - 1] = SymmetricTensor.from_sector_block_func(
                ones_func, [Vr_phi], [Vr_psi], backend=self.backend,
                labels=[['vL'], ['vL*']])
            for i in range(L - 1, 0, -1):
                self.update_OR(k, i)

    def _phi_tensor(self, k: int, i: int):
        """phi's site tensor in the theta-product gauge (theta1 at site 0)."""
        phi = self.orthogonal_to[k]
        return phi.get_theta1(0) if i == 0 else phi.Bs[i]

    def update_OL(self, k: int, i: int, A):
        """OLs[k][i+1] from OLs[k][i], psi's new left isometry A, phi's tensor."""
        t = tdot(self.OLs[k][i], self._phi_tensor(k, i), 'vR', 'vL')
        self.OLs[k][i + 1] = tdot(dagger(A), t, ['vL*', 'p*'], ['vR*', 'p'])

    def update_OR(self, k: int, i: int, B=None):
        """ORs[k][i-1] from ORs[k][i], psi's B at site i, phi's tensor."""
        if B is None:
            B = self.psi.Bs[i]
        t = tdot(self._phi_tensor(k, i), self.ORs[k][i], 'vR', 'vL')
        self.ORs[k][i - 1] = tdot(t, dagger(B), ['p', 'vL*'], ['p*', 'vR*'])

    def _ortho_theta(self, k: int, i: int):
        """phi's two-site wavefunction at bond (i, i+1), expressed in psi's
        current left/right bond bases: OL . phi_i . phi_{i+1} . OR."""
        phi = self.orthogonal_to[k]
        c = tdot(self.OLs[k][i], self._phi_tensor(k, i).relabelled({'p': 'p0'}),
                 'vR', 'vL')
        c = tdot(c, phi.Bs[i + 1].relabelled({'p': 'p1'}), 'vR', 'vL')
        c = tdot(c, self.ORs[k][i + 1], 'vR', 'vL')
        c = c.relabelled({'vR*': 'vL', 'vL*': 'vR'})
        return permute_legs(c, codomain=['vL', 'p0', 'p1'], domain=['vR'])

    def update_LP(self, i: int, A):
        """LPs[i+1] from LPs[i] and the left-isometric tensor A at site i.

        All rearrangements are planar (anyon-safe); jitted with jax blocks.
        """
        W = self.model.H_mpo[i]
        fn = _get_jitted_env_updates()[0] if self.jit_env_updates \
            else _update_LP_impl
        LP = fn(self.LPs[i], W, A)
        if self.env_dtype is not None:
            LP = LP.to_dtype(self.env_dtype)
        self.LPs[i + 1] = self._shard(LP, 'vR')  # [vR*, wR, vR]

    def update_RP(self, i: int, B=None):
        """RPs[i-1] from RPs[i] and the right-isometric tensor B at site i."""
        if B is None:
            B = self.psi.Bs[i]
        W = self.model.H_mpo[i]
        fn = _get_jitted_env_updates()[1] if self.jit_env_updates \
            else _update_RP_impl
        RP = fn(self.RPs[i], W, B)
        if self.env_dtype is not None:
            RP = RP.to_dtype(self.env_dtype)
        self.RPs[i - 1] = self._shard(RP, 'vL')  # [vL, wL, vL*]

    def sweep(self) -> float:
        L = self.psi.L
        if self.mesh is not None:
            with self.mesh:
                for i in range(L - 1):
                    self.update_bond(i)
                for i in range(L - 2, -1, -1):
                    self.update_bond(i)
            return self.E
        for i in range(L - 1):
            self.update_bond(i)
        for i in range(L - 2, -1, -1):
            self.update_bond(i)
        return self.E

    # --- static (fully fused) steady-state mode --------------------------------------

    def enable_static_mode(self, n_lanczos: int = 20, svd_mode: str = 'exact',
                           max_period: int = 2,
                           steady_svd_options: dict | None = None):
        """Freeze the current bond structures: subsequent sweeps run every bond
        update as ONE jitted device program (theta assembly, Lanczos, SVD,
        truncation to the frozen per-sector chi allocation, environment
        updates). Call after the state has structurally converged — e.g. two
        ordinary sweeps with ``pad_chi_multiple`` set. Intended for
        remote/tunneled TPUs where each host dispatch costs a round trip.

        ``svd_mode='steady'`` swaps the per-sector QDWH SVD for the
        warm-started matmul/QR-only steady SVD (tensors/steady.py) — the TPU
        production setting once converged (QDWH costs 30-300 ms per bond at
        chi >= 1024; the steady path is GEMM-bound)."""
        assert self.backend.block_backend.can_jit
        assert not self.orthogonal_to, 'static mode: no excited-state search'
        self.static_mode = True
        self._static_n_lanczos = n_lanczos
        self._static_svd_mode = svd_mode
        #: iteration knobs for svd_mode='steady' (n_power/n_jacobi/ns_polish)
        self._static_steady_opts = steady_svd_options
        #: largest structure-repetition period the batched sweep detects
        #: (2 covers alternating charge classes; raise for longer unit cells,
        #: e.g. 4-site dimerization patterns)
        self._static_max_period = max_period
        self._static_cache = {}

    def _static_entry(self, i: int):
        entry = self._static_cache.get(i)
        if entry is not None:
            return entry
        from ..dtypes import Dtype
        from ..symmetries import ElementarySpace
        from ..tensors import DiagonalTensor, Mask, scalar_multiply
        from ..tensors.krylov_based import _close_structure

        psi = self.psi
        Heff = HEffective(self.LPs[i], self.RPs[i + 1], self.model.H_mpo[i],
                          self.model.H_mpo[i + 1],
                          matmul_precision=self.matmul_precision)
        closed = _close_structure(Heff, psi.get_theta2(i))
        theta_tmpl = scalar_multiply(0., closed)
        thp = permute_legs(closed, codomain=['vL', 'p0'], domain=['vR', 'p1'])
        full = ElementarySpace.from_largest_common_subspace(
            thp.codomain, thp.domain, is_dual=False)
        kept = psi.Ss[i + 1].leg
        kept_map = {tuple(int(x) for x in s): int(m) for s, m in
                    zip(kept.sector_decomposition, kept.multiplicities)}
        bb = self.backend.block_backend

        def func(shape, coupled):
            k = kept_map.get(tuple(int(x) for x in np.asarray(coupled)), 0)
            keep = np.zeros(shape[0], dtype=bool)
            keep[:min(k, shape[0])] = True
            return bb.as_block(keep, Dtype.bool)

        diag = DiagonalTensor.from_sector_block_func(func, full,
                                                     backend=self.backend)
        mask = Mask.from_DiagonalTensor(diag)
        # the mask must be a trace-time CONSTANT — mask application resolves
        # data-dependent shapes host-side — so the jitted program closes over
        # it (one compile per bond structure). The zero theta template however
        # is pure STRUCTURE (its values are never read at trace time): it is
        # passed as a jit ARGUMENT — closed over, its chi^2 d^2 zero block
        # would be embedded in the HLO as a literal, blowing up compile time
        # and hitting the 2 GB program-proto limit at chi >~ 12k (measured).
        import jax

        impl = _get_static_bond_fn(self._static_n_lanczos,
                                   getattr(self, '_static_svd_mode', 'exact'),
                                   getattr(self, '_static_steady_opts', None))
        jfn = jax.jit(lambda H, S_i, B_i, B_ip1, tmpl: impl(
            H, S_i, B_i, B_ip1, tmpl, mask))

        def fn(H, S_i, B_i, B_ip1, _jfn=jfn, _tmpl=theta_tmpl):
            return _jfn(H, S_i, B_i, B_ip1, _tmpl)

        self._static_cache[('consts', i)] = (theta_tmpl, mask)
        entry = self._static_cache[i] = fn
        return entry

    # --- batched static sweeps: one dispatch per half-sweep ---------------------------

    def _bond_structure(self, i: int):
        """Hashable structure key of bond i's static update inputs."""
        import jax

        psi = self.psi
        args = (self.LPs[i], self.RPs[i + 1], psi.Ss[i], psi.Bs[i],
                psi.Bs[i + 1], self.model.H_mpo[i], self.model.H_mpo[i + 1])
        return jax.tree_util.tree_structure(args)

    def _static_runs(self, max_period: int = None):
        """Maximal runs of consecutive bonds whose structures repeat with
        period p <= max_period; returns ``[(b0, b1, p)]`` with ``(b1 - b0)``
        a multiple of p.

        p=1 is the uniform case (e.g. parity-conserving TFI at saturated
        chi). p=2 covers the generic alternating case: on SU(2) spin-1/2 or
        U(1)-Sz chains the virtual legs alternate between the two charge
        classes (integer/half-integer total spin, even/odd Sz offset), so
        NO two consecutive bonds ever share a structure — but next-nearest
        bonds do. Ties prefer the smaller period (smaller compiled body).
        """
        if max_period is None:
            max_period = getattr(self, '_static_max_period', 2)
        L = self.psi.L
        structs = [self._bond_structure(i) for i in range(L - 1)]
        runs = []
        i = 0
        while i < L - 1:
            best_j, best_p = i + 1, 1
            for p in range(1, max_period + 1):
                if i + p > L - 1:
                    break
                j = i + p  # first full period
                while j < L - 1 and structs[j] == structs[j - p]:
                    j += 1
                j = i + ((j - i) // p) * p  # whole periods only
                if j > best_j:
                    best_j, best_p = j, p
            runs.append((i, best_j, best_p))  # bonds [i, best_j)
            i = best_j
        return runs

    def _get_batched_half_sweep(self, key, right: bool):
        """One jitted lax.scan over supercells of ``p`` consecutive bonds.

        ``key = (b0, b1, p)``: bonds [b0, b1) whose structures repeat with
        period p (see _static_runs). The scan body unrolls the p per-residue
        bond updates (each with its own frozen mask/template), so the carry
        returns to the structure it started with — that is what makes the
        alternating-structure case (SU(2)/U(1) chains) scannable at all.
        """
        entry = self._static_cache.get(('half', key, right))
        if entry is not None:
            return entry
        import jax

        b0, b1, p = key
        # per-residue trace-time constants, in PROCESSING order: ascending
        # b0+k for the right pass, descending b1-1-k for the left pass
        rep_bonds = ([b0 + k for k in range(p)] if right
                     else [b1 - 1 - k for k in range(p)])
        consts = [self._static_consts(i) for i in rep_bonds]
        masks = [c[1] for c in consts]
        tmpls = tuple(c[0] for c in consts)
        impl = _get_static_bond_fn(self._static_n_lanczos,
                                   getattr(self, '_static_svd_mode', 'exact'),
                                   getattr(self, '_static_steady_opts', None))

        if right:
            def half(LP0, S0, B0, xs, tmpls):
                """Right pass: carry (LP_i, S_i, B_i); xs[k] stacked over
                cells, per bond i = b0 + c*p + k (ascending):
                (B_{i+1}, RP_{i+1}, W_i, W_{i+1})."""
                def body(carry, x):
                    outs = []
                    for k in range(p):
                        LP, S_i, B_i = carry
                        B_ip1, RP, W_i, W_ip1 = x[k]
                        H = HEffective(LP, RP, W_i, W_ip1)
                        E, nB, S2, B2, LPn, RPn = impl(H, S_i, B_i, B_ip1,
                                                       tmpls[k], masks[k])
                        S2 = S2.relabelled(['vL', 'vL*'])
                        carry = (LPn, S2, B2)
                        outs.append((E, nB, RPn, S2, LPn))
                    return carry, tuple(outs)

                return jax.lax.scan(body, (LP0, S0, B0), xs)
        else:
            def half(RP0, B0, xs, tmpls):
                """Left pass: carry (RP_{i+1}, B_{i+1}); xs[k] stacked over
                cells, per bond i = b1 - 1 - c*p - k (DESCENDING):
                (S_i, B_i, LP_i, W_i, W_{i+1})."""
                def body(carry, x):
                    outs = []
                    for k in range(p):
                        RP, B_ip1 = carry
                        S_i, B_i, LP, W_i, W_ip1 = x[k]
                        H = HEffective(LP, RP, W_i, W_ip1)
                        E, nB, S2, B2, LPn, RPn = impl(H, S_i, B_i, B_ip1,
                                                       tmpls[k], masks[k])
                        S2 = S2.relabelled(['vL', 'vL*'])
                        carry = (RPn, nB)
                        outs.append((E, S2, B2, RPn, nB))
                    return carry, tuple(outs)

                return jax.lax.scan(body, (RP0, B0), xs)
        # the theta templates are jit ARGUMENTS (see _static_consts: as
        # closed-over constants their zero blocks would embed in the HLO)
        jfn = jax.jit(half)

        def fn(*args, _jfn=jfn, _tmpls=tmpls):
            return _jfn(*args, _tmpls)

        self._static_cache[('half', key, right)] = fn
        return fn

    def _stack(self, trees):
        import jax
        import jax.numpy as jnp

        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

    def _unstack(self, tree, k):
        import jax

        return jax.tree_util.tree_map(lambda x: x[k], tree)

    def sweep_static_batched(self) -> float:
        """One full sweep where every maximal uniform run of bonds executes as
        ONE jitted lax.scan dispatch (right pass then left pass). Requires
        static mode; bonds outside uniform runs (chain boundaries) fall back to
        the per-bond static update. With chi bucketing saturating the bulk,
        the dispatch count per half sweep approaches 1 (+ boundary bonds)."""
        assert getattr(self, 'static_mode', False)
        psi = self.psi
        runs = self._static_runs()
        for (b0, b1, p) in runs:
            n_cells = (b1 - b0) // p
            if n_cells < 2:
                for i in range(b0, b1):
                    self.update_bond(i)
                continue
            fn = self._get_batched_half_sweep((b0, b1, p), right=True)
            xs = tuple(
                self._stack([
                    (psi.Bs[i + 1], self.RPs[i + 1], self.model.H_mpo[i],
                     self.model.H_mpo[i + 1])
                    for i in range(b0 + k, b1, p)])
                for k in range(p))
            (LP_last, S_last, B_last), ys = fn(self.LPs[b0], psi.Ss[b0],
                                               psi.Bs[b0], xs)
            for k in range(p):
                for c in range(n_cells):
                    i = b0 + c * p + k
                    E, nB, RPn, S2, LPn = self._unstack(ys[k], c)
                    self.E = E
                    psi.Bs[i] = nB
                    psi.Ss[i + 1] = S2
                    self.RPs[i] = RPn
                    self.LPs[i + 1] = LPn
            psi.Bs[b1] = B_last
        for (b0, b1, p) in reversed(runs):
            n_cells = (b1 - b0) // p
            if n_cells < 2:
                for i in range(b1 - 1, b0 - 1, -1):
                    self.update_bond(i)
                continue
            fn = self._get_batched_half_sweep((b0, b1, p), right=False)
            # bond of cell c, residue k (descending): i = b1 - 1 - c*p - k
            xs = tuple(
                self._stack([
                    (psi.Ss[i], psi.Bs[i], self.LPs[i], self.model.H_mpo[i],
                     self.model.H_mpo[i + 1])
                    for i in range(b1 - 1 - k, b0 - 1, -p)])
                for k in range(p))
            (RP_last, B_first), ys = fn(self.RPs[b1], psi.Bs[b1], xs)
            for k in range(p):
                for c in range(n_cells):
                    i = b1 - 1 - c * p - k
                    E, S2, B2, RPn, nB = self._unstack(ys[k], c)
                    self.E = E
                    psi.Ss[i + 1] = S2
                    psi.Bs[i + 1] = B2
                    self.RPs[i] = RPn
            psi.Bs[b0] = B_first  # == nB of the last processed bond
        self.E = float(self.E)
        return self.E

    def _static_consts(self, i: int):
        """(theta_tmpl, mask) trace-time constants for bond i (cached)."""
        entry = self._static_cache.get(('consts', i))
        if entry is not None:
            return entry
        self._static_entry(i)  # builds and caches via the per-bond path
        return self._static_cache[('consts', i)]

    def _update_bond_static(self, i: int):
        psi = self.psi
        fn = self._static_entry(i)
        Heff = HEffective(self.LPs[i], self.RPs[i + 1], self.model.H_mpo[i],
                          self.model.H_mpo[i + 1],
                          matmul_precision=self.matmul_precision)
        E, new_B, S, B, LP_new, RP_new = fn(
            Heff, psi.Ss[i], psi.Bs[i], psi.Bs[i + 1])
        self.E = float(E)
        psi.Bs[i] = new_B
        psi.Ss[i + 1] = S.relabelled(['vL', 'vL*'])
        psi.Bs[i + 1] = B
        if self.env_dtype is not None:
            # keep the mixed-precision environment contract in static mode too
            # (update_LP/update_RP apply the same cast on the dynamic path)
            LP_new = LP_new.to_dtype(self.env_dtype)
            RP_new = RP_new.to_dtype(self.env_dtype)
        self.LPs[i + 1] = self._shard(LP_new, 'vR')
        self.RPs[i] = self._shard(RP_new, 'vL')

    def update_bond(self, i: int):
        if getattr(self, 'static_mode', False):
            return self._update_bond_static(i)
        psi = self.psi
        Heff = HEffective(self.LPs[i], self.RPs[i + 1], self.model.H_mpo[i],
                          self.model.H_mpo[i + 1],
                          matmul_precision=self.matmul_precision)
        if self.orthogonal_to:
            from ..tensors.sparse import ProjectedLinearOperator

            vecs = [self._ortho_theta(k, i)
                    for k in range(len(self.orthogonal_to))]
            vecs = [v for v in vecs if norm(v) > 1e-12]
            if vecs:
                Heff = ProjectedLinearOperator(Heff, vecs)
        theta0 = self._shard(psi.get_theta2(i), 'vL')
        if self.orthogonal_to and hasattr(Heff, 'project'):
            theta0 = Heff.project(theta0)
        E, theta, n_iter = lanczos(Heff, theta0, self.lanczos_options)
        self.E = E
        A, S, B, err = split_truncate_theta(theta, self.chi_max, self.eps,
                                            pad_to_multiple=self.pad_chi_multiple,
                                            method=self.dynamic_svd,
                                            Vh_prev=psi.Bs[i + 1]
                                            if self.dynamic_svd == 'adaptive'
                                            else None)
        self.trunc_err = max(self.trunc_err, err)
        # restore B form on site i: B_i = S_i^{-1} A S_new
        Sinv = pinv(psi.Ss[i], cutoff=1e-14)
        new_B = scale_axis(scale_axis(A, Sinv, 'vL'), S, 'vR')
        psi.Bs[i] = new_B
        psi.Ss[i + 1] = S.relabelled(['vL', 'vL*'])
        psi.Bs[i + 1] = B
        self.update_LP(i, A)
        self.update_RP(i + 1, B)
        for k in range(len(self.orthogonal_to)):
            self.update_OL(k, i, A)
            self.update_OR(k, i + 1, B)

    def _bond_signature(self):
        """Hashable snapshot of every bond structure (for auto_static)."""
        return tuple(
            (tuple(map(tuple, B.get_leg_co_domain('vL')
                       .sector_decomposition.tolist())),
             tuple(int(m) for m in B.get_leg_co_domain('vL').multiplicities))
            for B in self.psi.Bs)

    def _checkpoint_manager(self, checkpoint):
        """Normalize run()'s ``checkpoint`` argument to a CheckpointManager."""
        if checkpoint is None:
            return None
        if isinstance(checkpoint, str):
            from ..tools.checkpoint import CheckpointManager
            return CheckpointManager(checkpoint)
        return checkpoint

    def _restore_from(self, mgr, step, verbose=False, rollback=False):
        """Restore psi (+ counters) from a checkpoint and rebuild derived state
        (environments, overlap environments); static mode is reset so the
        saturation detector re-triggers on the restored structures."""
        payload = mgr.restore(step)
        self.psi = payload['psi']
        self.E = payload.get('E')
        self.trunc_err = payload.get('trunc_err', 0.)
        self._sweeps_done = int(payload.get('sweep', step))
        self.static_mode = False
        L = self.psi.L
        self.LPs = [None] * L
        self.RPs = [None] * L
        self._init_environments()
        self.OLs = [[None] * L for _ in self.orthogonal_to]
        self.ORs = [[None] * L for _ in self.orthogonal_to]
        self._init_overlap_environments()
        if verbose:
            print(('rollback to' if rollback else 'resumed from')
                  + f' checkpoint step {step} (E = {self.E})')

    def run(self, n_sweeps: int = 10, tol: float = 1e-10, verbose: bool = False,
            checkpoint=None, checkpoint_every: int = 1, resume: bool = True,
            max_faults: int = 2) -> float:
        """Sweep to convergence, optionally with fault tolerance.

        With ``checkpoint`` (a :class:`~cyten_tpu.tools.checkpoint.CheckpointManager`
        or a directory path) the engine becomes restartable and self-healing
        (the framework-level failure story; the reference has none, SURVEY §5):

        - every ``checkpoint_every`` completed sweeps, ``{psi, E, sweep}`` is
          saved (rolling, ``max_to_keep`` per the manager); environments are
          derived state and are rebuilt on restore, not stored;
        - on entry with ``resume=True``, a fresh engine restores the latest
          checkpoint in the directory (crash recovery across processes);
        - after every sweep the energy is health-checked; a non-finite value
          (bf16 overflow, bad device math, corrupted state) triggers a
          rollback to the last checkpoint. The first rollback also escalates
          precision (drops ``env_dtype`` mixed storage); after ``max_faults``
          rollbacks a :class:`FaultError` propagates.
        """
        mgr = self._checkpoint_manager(checkpoint)
        if mgr is not None and resume and self._sweeps_done == 0:
            step = mgr.latest_step()
            if step is not None:
                self._restore_from(mgr, step, verbose)
        faults = 0
        E_old = np.inf
        sig_old = None
        for sweep in range(n_sweeps):
            # in static mode, run each half sweep as one lax.scan dispatch per
            # uniform (period-p) bond run; per-bond env casting/sharding hooks
            # (env_dtype, mesh) stay on the per-bond path
            fault_exc = None
            try:
                if (getattr(self, 'static_mode', False)
                        and self.env_dtype is None and self.mesh is None):
                    E = self.sweep_static_batched()
                else:
                    E = self.sweep()
            except (np.linalg.LinAlgError, FloatingPointError) as exc:
                # hard numerical failure (NaN blocks crash host-side eigh/svd
                # before a non-finite energy ever returns) -> same rollback
                # path as a non-finite energy
                fault_exc = exc
                E = np.nan
            if not np.isfinite(E):
                faults += 1
                if mgr is None or mgr.latest_step() is None \
                        or faults > max_faults:
                    raise FaultError(
                        f'non-finite result after sweep ({fault_exc or E}); '
                        f'no checkpoint to roll back to' if mgr is None
                        or mgr.latest_step() is None else
                        f'non-finite result persisted through {max_faults} '
                        f'rollbacks') from fault_exc
                self._restore_from(mgr, mgr.latest_step(), verbose,
                                   rollback=True)
                if self.env_dtype is not None:
                    if verbose:
                        print('rollback: escalating precision '
                              '(env_dtype -> None)')
                    self.env_dtype = None
                E_old = np.inf
                sig_old = None
                continue
            self._sweeps_done += 1
            if mgr is not None and self._sweeps_done % checkpoint_every == 0:
                mgr.save(self._sweeps_done,
                         {'psi': self.psi, 'E': float(E),
                          'sweep': self._sweeps_done,
                          'trunc_err': float(self.trunc_err)})
            if verbose:
                print(f'sweep {sweep + 1}: E = {E:.12f}, '
                      f'max chi = {self.psi.max_chi()}')
            if self.auto_static and not getattr(self, 'static_mode', False) \
                    and self.backend.block_backend.can_jit \
                    and not self.orthogonal_to:
                sig = self._bond_signature()
                if sig == sig_old:
                    mode = self.auto_static if isinstance(self.auto_static, str) \
                        else 'steady'
                    self.enable_static_mode(
                        n_lanczos=self.lanczos_options.get('N_max', 20),
                        svd_mode=mode)
                    if verbose:
                        print(f'sweep {sweep + 1}: structures saturated -> '
                              f'static mode (svd_mode={mode})')
                sig_old = sig
            if abs(E - E_old) < tol:
                break
            E_old = E
        return self.E


# The engine above uses exclusively planar rearrangements (rotations + bends), so it
# doubles as the reference's PlanarDMRGEngine (toycodes/d_dmrg.py:285); the aliases
# exist for drop-in parity.
PlanarHEffective = HEffective
PlanarDMRGEngine = DMRGEngine
