"""Tangent-space quasiparticle excitations on a uniform MPS.

Single-mode (plane-wave) ansatz on a one-site unit cell in mixed canonical
gauge (AL, C, AR):

    |Phi_p(B)> = sum_n e^{i p n} AL^{(<n)} B_n AR^{(>n)},     B = VL X,

with ``VL`` the left null space of ``AL`` (``dagger(VL) @ AL = 0``), so that
``<Phi_p(X)|Phi_p(X')> = 2 pi delta(p-p') <X, X'>`` and the excitation energy
``omega(p) = E(p) - E_gs`` is the lowest eigenvalue of a Hermitian effective
Hamiltonian acting on the small tensor ``X: [vL~; vR]``.

Formulation follows Haegeman et al., PRB 85, 100408(R) (2012) and
Vanderstraeten, Haegeman & Verstraete, SciPost Phys. Lect. Notes 7 (2019)
Sec. 6, in MPO form: any uniform MPO (``bc='infinite'`` models, incl.
long-range couplings from :func:`~cyten_tpu.algorithms.models.mpo_from_terms`)
defines H. The B-dressed half-infinite environments are geometric sums

    LB(p) = sum_{k>=1} e^{-i p k} T_mixed^{k-1}[LB_1],

resummed by solving ``(1 - e^{-ip} T_mixed) LB = e^{-ip} LB_1`` with GMRES,
where ``T_mixed`` is the MPO-sandwiched mixed transfer operator (bra AL, ket
AR). Its spectrum lies on/in the unit circle with the only unimodular
eigenvalue at 1 (the C-alignment mode), so the solve is well-conditioned for
``p != 0``; near p = 0 it degrades gracefully (more GMRES iterations).

The static environments are NOT taken from the engine as-is: the fixed-point
equations determine their completed-/starting-H-channel components only up to
a multiple of the identity, and that multiple shifts every omega(p) by a
constant. They are re-anchored here at the boundary with the converged energy
density held fixed (see :meth:`ExcitationEngine._anchored_LW`), which makes
omega(p) absolute (validated against the exact transverse-field Ising
dispersion, tests/test_excitations.py).

No reference counterpart (`/root/reference` stops at ground-state DMRG
toycodes, toycodes/tenpy_toycodes/d_dmrg.py); TeNPy v1 ships a comparable
plane-wave excitation engine, MPSKit.jl calls this the QuasiparticleAnsatz.
"""

from __future__ import annotations

import numpy as np

from ..dtypes import Dtype
from ..symmetries.spaces import ElementarySpace
from ..tensors import (
    SymmetricTensor, dagger, norm, permute_legs, qr, tdot,
)
from ..tensors.sparse import LinearOperator, NumpyArrayLinearOperator
__all__ = ['ExcitationEngine', 'left_null_space']


def left_null_space(A: SymmetricTensor, tol: float = 1e-8,
                    max_tries: int = 4) -> SymmetricTensor:
    """The left null space ``VL: [vL, p; vR]`` of a left isometry ``A: [vL, p; vR]``.

    ``dagger(VL) @ A = 0`` and ``dagger(VL) @ VL = eye``; the new bond leg
    carries, per coupled sector, the complementary multiplicity
    ``dim(vL x p) - dim(vR)``. Backend-agnostic construction: project a random
    tensor onto the orthogonal complement of the columns of ``A`` and
    orthonormalize per sector with QR (retry on the measure-zero event that
    the random projection is rank-deficient).
    """
    cod, dom = A.codomain, A.domain
    secs, mults = [], []
    for s, m in zip(cod.sector_decomposition, cod.multiplicities):
        k = int(m) - int(dom.sector_multiplicity(s))
        assert k >= 0, 'A is not an isometry (domain exceeds codomain)'
        if k > 0:
            secs.append(s)
            mults.append(k)
    if not secs:
        raise ValueError('left_null_space: A is unitary, the null space is empty')
    null_leg = ElementarySpace(A.symmetry, np.array(secs), np.array(mults))
    la, lb = A.codomain_labels
    dtype = A.dtype if A.dtype.is_complex else Dtype.complex128
    rng = np.random.default_rng(20260819)
    for _ in range(max_tries):
        R = SymmetricTensor.from_random_normal(
            list(cod.factors), [null_leg], backend=A.backend,
            labels=[[la, lb], ['vR']], dtype=dtype, rng=rng)
        # P R = R - A (A^dag R)
        AdR = tdot(dagger(A), R, [f'{la}*', f'{lb}*'], [la, lb])
        PR = R - permute_legs(tdot(A, AdR, A.labels[-1], f'{A.labels[-1]}*'),
                              codomain=[la, lb], domain=['vR'])
        VL, _ = qr(PR, new_labels=['vR', 'vL'])
        err = float(norm(tdot(dagger(A), VL, [f'{la}*', f'{lb}*'], [la, lb])))
        if err < tol * max(float(norm(A)), 1.):
            return VL
    raise RuntimeError(f'left_null_space did not converge (residual {err:.2e})')


def _q_extra(*tensors):
    """The optional charge-leg label carried by at most one of the tensors."""
    return ['q'] if any(t.has_label('q') for t in tensors) else []


def _update_LP_mixed(LP, W, ket, bra):
    """One-cell left-environment absorption with different bra/ket site tensors.

    Same contraction as :func:`~cyten_tpu.algorithms.dmrg._update_LP_impl`
    with ``dagger(bra)`` closing the top instead of ``dagger(ket)``. Either
    ``ket`` or ``LP`` may carry an extra charge leg 'q' (sector-charged
    excitations); it rides along in the domain.
    """
    t = tdot(ket, LP, 'vL', 'vR')
    t = tdot(t, W, ['p', 'wR'], ['p*', 'wL'])
    t = tdot(dagger(bra), t, ['vL*', 'p*'], ['vR*', 'p'])
    return permute_legs(t, codomain=['vR*'],
                        domain=['vR', 'wR'] + _q_extra(t))


def _update_RP_mixed(RP, W, ket, bra):
    t = tdot(ket, RP, 'vR', 'vL')
    t = tdot(W, t, ['p*', 'wR'], ['p', 'wL'])
    t = tdot(t, dagger(bra), ['vL*', 'p'], ['vR*', 'p*'])
    return permute_legs(t, codomain=['vL', 'wL'],
                        domain=['vL*'] + _q_extra(t))


def _heff1_mixed(LP, RP, W, theta):
    """``LP -- W -- RP`` applied to ``theta``, with an optional charge leg 'q'
    riding along on theta, LP or RP (cf. dmrg1._heff1_matvec_impl)."""
    x = tdot(theta, LP, 'vL', 'vR')
    x = tdot(x, W, ['p', 'wR'], ['p*', 'wL'])
    x = tdot(x, RP, ['vR', 'wR'], ['vL', 'wL'])
    x = x.relabelled({'vR*': 'vL', 'vL*': 'vR'})
    return permute_legs(x, codomain=['vL', 'p'],
                        domain=['vR'] + _q_extra(x))


class _GeometricResolvent(LinearOperator):
    """``x -> x - phase * T(x)`` for resumming geometric environment series."""

    def __init__(self, T, phase, example):
        self.T = T
        self.phase = phase
        self.example = example
        LinearOperator.__init__(self, dtype=example.dtype)

    def matvec(self, x):
        return x - self.phase * self.T(x)

    def some_vector(self):
        return self.example


def _complement_shift(bridge, v0):
    """A penalty eigenvalue for the flat space's non-symmetric complement,
    adaptively far above the physical spectrum (one matvec to estimate the
    scale). See NumpyArrayLinearOperator.as_scipy_operator."""
    from ..tensors import inner

    x = bridge.flat_to_tensor(v0)
    hx = bridge.operator.matvec(x)
    nrm = float(np.real(inner(x, x, do_dagger=True)))
    ray = abs(complex(inner(x, hx, do_dagger=True))) / max(nrm, 1e-300)
    return 1e3 * (1. + ray)


def _gmres(op: LinearOperator, rhs, tol: float = 1e-10, maxiter: int = 400):
    """Solve ``op(x) = rhs`` for tensors via the scipy bridge."""
    import scipy.sparse.linalg as spla

    bridge = NumpyArrayLinearOperator(op, rhs)
    b = bridge.tensor_to_flat(rhs)
    x, info = spla.gmres(bridge.as_scipy_operator(), b,
                         rtol=tol, atol=0., maxiter=maxiter)
    if info != 0:  # pragma: no cover - diagnostics only
        import warnings
        warnings.warn(f'excitations: GMRES stopped with info={info}',
                      stacklevel=2)
    return bridge.flat_to_tensor(x)


class _HEffExcitation(LinearOperator):
    """The momentum-p effective Hamiltonian on the reduced tensor X."""

    def __init__(self, eng: 'ExcitationEngine', p: float, gmres_tol: float):
        self.eng = eng
        self.p = p
        self.gmres_tol = gmres_tol
        LinearOperator.__init__(self, dtype=Dtype.complex128)

    def matvec(self, X):
        eng = self.eng
        p = self.p
        B = tdot(eng.VL, X, 'vR', 'vL')     # [vL, p; vR(, q)]
        # (a) B at the output site
        G = _heff1_mixed(eng.LW, eng.RW, eng.W, B)
        # (b) B strictly left of the output site (ket AR at the output):
        #     LB = e^{-ip} (1 - e^{-ip} T_mixed)^{-1} LB_1
        phase = np.exp(-1j * p)
        LB1 = _update_LP_mixed(eng.LW, eng.W, ket=B, bra=eng.AL)
        LB = _gmres(_GeometricResolvent(eng._T_left_mixed, phase, LB1),
                    phase * LB1, tol=self.gmres_tol)
        G = G + _heff1_mixed(LB, eng.RW, eng.W, eng.AR)
        # (c) B strictly right of the output site (ket AL at the output)
        phase = np.exp(+1j * p)
        RB1 = _update_RP_mixed(eng.RW, eng.W, ket=B, bra=eng.AR)
        RB = _gmres(_GeometricResolvent(eng._T_right_mixed, phase, RB1),
                    phase * RB1, tol=self.gmres_tol)
        G = G + _heff1_mixed(eng.LW, RB, eng.W, eng.AL)
        # project back onto the tangent space: X_out = VL^dag G
        Xo = tdot(dagger(eng.VL), G, ['vL*', 'p*'], ['vL', 'p'])
        Xo = permute_legs(Xo.relabelled({'vR*': 'vL'}),
                          codomain=['vL'], domain=['vR'] + _q_extra(Xo))
        # measure omega from the ground state's own lam0 (see __init__)
        return Xo - eng.lam0 * X

    def some_vector(self):
        rng = np.random.default_rng(7)
        eng = self.eng
        vR = eng.AR.domain.factors[0]
        if eng.q_leg is None:
            return SymmetricTensor.from_random_normal(
                [eng.null_leg], [vR], backend=eng.backend,
                labels=[['vL'], ['vR']], dtype=Dtype.complex128, rng=rng)
        X = SymmetricTensor.from_random_normal(
            [eng.null_leg], [vR, eng.q_leg], backend=eng.backend,
            labels=[['vL'], ['vR', 'q']], dtype=Dtype.complex128, rng=rng)
        if float(norm(X)) == 0.:
            raise ValueError(
                f'no excitation with charge {eng.sector} exists on these bond '
                f'legs (no allowed blocks)')
        return X


def _block_sites(As, pipe=None):
    """Contract the cell's site tensors ``[vL, p; vR]`` into ONE blocked site
    with the physical legs combined into a pipe (returned for reuse)."""
    from ..tensors import combine_legs

    L = len(As)
    A = As[0].relabelled({'p': 'p0'})
    for i in range(1, L):
        A = tdot(A, As[i].relabelled({'p': f'p{i}'}), 'vR', 'vL')
    plabels = [f'p{i}' for i in range(L)]
    A = permute_legs(A, codomain=['vL'] + plabels, domain=['vR'])
    A = combine_legs(A, plabels, pipes=None if pipe is None else [pipe])
    A = A.relabelled({A.labels[1]: 'p'})
    return A, A.codomain.factors[1]


def _block_mpo(Ws, pipe):
    """Contract the cell's MPO tensors ``[wL, p; p*, wR]`` into ONE blocked
    tensor whose p / p* legs are the given pipe and its dual."""
    from ..tensors import combine_legs

    L = len(Ws)
    W = Ws[0].relabelled({'p': 'p0', 'p*': 'p0*'})
    for i in range(1, L):
        W = tdot(W, Ws[i].relabelled({'p': f'p{i}', 'p*': f'p{i}*'}),
                 'wR', 'wL')
    plabels = [f'p{i}' for i in range(L)]
    pslabels = [f'p{i}*' for i in range(L)]
    W = permute_legs(W, codomain=['wL'] + plabels, domain=pslabels + ['wR'])
    # the p* group must combine to the SAME pipe (as a domain factor, i.e.
    # with the duality flag flipped), so contractions against the blocked
    # site tensors' pipe leg match; group labels follow the legs order
    W = combine_legs(W, plabels, list(reversed(pslabels)),
                     pipes=[pipe, pipe], pipe_dualities=[False, True])
    W = W.relabelled({W.labels[1]: 'p', W.labels[-1]: 'p*'})
    return W


class _BlockedCellView:
    """An ``L == 1`` view of an L-site uniform engine: the converged cell is
    blocked into one fat site (physical legs combined into a pipe, the MPO
    cell contracted over its virtual bonds). The single-site tangent space of
    the blocked chain contains every intra-cell combination
    ``AL..B_j..AR`` of the per-site ansatz, so nothing is lost variationally;
    momenta become per-CELL (reduced Brillouin zone — bands fold)."""

    def __init__(self, engine):
        engine._solve_environments()  # also fills env_energy_cell
        self._inner = engine
        self.L = 1
        self.backend = engine.backend
        self.env_tol = engine.env_tol
        self.env_max_iter = engine.env_max_iter
        self.imaginary = getattr(engine, 'imaginary', True)
        AL, pipe = _block_sites(engine.ALs)
        AR, _ = _block_sites(engine.ARs, pipe=pipe)
        W = _block_mpo(list(engine.model.H_mpo), pipe)
        self.ALs = [AL]
        self.ARs = [AR]
        self.Cs = [engine.Cs[0]]
        import types

        self.model = types.SimpleNamespace(H_mpo=[W])
        self.env_energy_cell = engine.env_energy_cell
        self.LW = engine.LW
        self.RW = engine.RW

    def _solve_environments(self):
        pass  # inner engine solved at construction; envs are re-anchored anyway

    # boundary/channel constructions are shape-generic — borrow the engine's
    from .itdvp import iTDVPEngine as _it

    _env_dtype = _it._env_dtype
    _boundary_LW = _it._boundary_LW
    _boundary_RW = _it._boundary_RW
    _eye_H_left = _it._eye_H_left
    _eye_H_right = _it._eye_H_right
    del _it


class ExcitationEngine:
    """Quasiparticle dispersion omega(p) over a converged uniform ground state.

    Parameters
    ----------
    engine : :class:`~cyten_tpu.algorithms.vumps.VUMPSEngine` or \
            :class:`~cyten_tpu.algorithms.itdvp.iTDVPEngine`
        A CONVERGED fixed point with a one-site unit cell (``L == 1``); its
        mixed-gauge tensors and MPO environments are reused. Run VUMPS to
        ``grad_norm`` well below the accuracy you want for omega.
    gmres_tol : float
        Relative tolerance of the geometric-sum solves.
    sector : Sector | None
        Net symmetry charge of the excitation. ``None`` (default) builds the
        topologically trivial ansatz. Otherwise ``X`` carries an auxiliary
        charge leg 'q' with this sector (kept in its domain), so
        ``|Phi_p(X)>`` creates one quantum of that charge — e.g. the
        parity-odd single-particle band of the transverse-field Ising chain
        with ``conserve='parity'``, or an Sz=1 magnon. The charge leg rides
        through every contraction; environments and gauge are unchanged.
    engine_right : converged engine | None
        Domain-wall (kink/soliton) excitations: everything strictly right of
        ``B`` is taken from this SECOND converged engine's ground state,
        ``|Phi_p(X)> = sum_n e^{ipn} AL..AL B_n AR'..AR'``. The two states
        must be degenerate with matching bond legs (symmetry-broken partners,
        e.g. the two ferromagnetic TFI ground states — the kink dispersion
        then matches the free-fermion result exactly).

    Notes
    -----
    L > 1 unit cells are handled by BLOCKING: the converged cell is contracted
    into one fat site (physical legs combined into a pipe) and the one-site
    machinery runs on the blocked chain. The blocked tangent space contains
    every intra-cell placement of the per-site ansatz, so nothing is lost
    variationally; the momentum argument is then per CELL (physical momentum
    k = p / L up to reduced-zone folding). Anyonic symmetries would need
    topological-sector bookkeeping beyond the charge-leg mechanism.
    """

    def __init__(self, engine, gmres_tol: float = 1e-10, sector=None,
                 engine_right=None):
        if engine.L > 1:
            engine = _BlockedCellView(engine)
        if engine_right is not None and engine_right.L > 1:
            engine_right = _BlockedCellView(engine_right)
        engine._solve_environments()
        self.AL = engine.ALs[0]
        self.C = engine.Cs[0]
        self.W = engine.model.H_mpo[0]
        self.backend = engine.backend
        self.gmres_tol = gmres_tol
        self.sector = sector
        if sector is None:
            self.q_leg = None
        else:
            sym = self.AL.symmetry
            sector = np.asarray(sector, dtype=int)
            assert sym.is_valid_sector(sector), f'invalid sector {sector}'
            self.q_leg = ElementarySpace(sym, sector[None, :])
        self.VL = left_null_space(self.AL)
        self.null_leg = self.VL.domain.factors[0]
        # domain-wall (kink) ansatz: everything right of B comes from a
        # SECOND degenerate ground state — ... AL AL B AR' AR' ... The mixed
        # transfer operators take the two states automatically; for different
        # states their identity channels have spectral radius strictly < 1,
        # so the resolvents are well-conditioned at every momentum. The
        # calibration constant below is evaluated on the LEFT state's own
        # (AC, RW); it equals the mixed-background constant when the two
        # ground states are degenerate with identical energy-density split
        # (e.g. symmetry partners), which is the supported use case.
        self.AR = engine.ARs[0]
        self.RW_own = None
        if engine_right is not None:
            assert engine_right.L == 1
            assert engine_right.model.H_mpo[0].labels == self.W.labels
            engine_right._solve_environments()
            assert self.AL.domain.factors[0] == \
                engine_right.ARs[0].codomain.factors[0], \
                'bond legs of the two ground states must match'
        self.LW = self._anchored_LW(engine)
        self.RW = self._anchored_RW(engine)
        if engine_right is not None:
            self.RW_own = self.RW
            self.AR = engine_right.ARs[0]
            self.RW = self._anchored_RW(engine_right)
        # the zero of omega: the ground state's own eigenvalue of the SAME
        # effective Hamiltonian (B at the output site, anchored environments).
        # Subtracting it makes omega(p) = E(p) - E_gs absolute without any
        # model-specific bookkeeping of how energy density splits between
        # onsite and bond MPO channels.
        from ..tensors import inner

        AR_own = engine.ARs[0]
        RW_own = self.RW_own if self.RW_own is not None else self.RW
        AC = permute_legs(tdot(self.C, AR_own, 'vR', 'vL'),
                          codomain=['vL', 'p'], domain=['vR'])
        self.lam0 = float(np.real(
            inner(AC, _heff1_mixed(self.LW, RW_own, self.W, AC),
                  do_dagger=True)
            / inner(AC, AC, do_dagger=True)))

    # -- environment gauge ----------------------------------------------------

    def _anchored_LW(self, engine):
        """Boundary-anchored left environment of ``H - e * N`` (absolute gauge).

        The engine's power iteration subtracts the *instantaneous* growth-rate
        estimate each absorption; the early-iteration estimates differ from
        the converged energy density, so its LW/RW fixed points carry an
        accumulated constant ``c * eye`` in the completed-/starting-H channel.
        That constant is gauge for ground-state algorithms (any ``c`` solves
        the fixed-point equation) but shifts every excitation energy by ``c``.
        Re-iterating from the boundary with the CONVERGED energy density held
        fixed yields the limit ``lim_K (T^K[boundary] - K e eyeH)`` — the
        physical sum of all H-terms in the half-infinite chain measured
        relative to the ground state, with no free constant.
        """
        e = engine.env_energy_cell
        tol = engine.env_tol
        AL = engine.ALs[0]
        LW = engine._boundary_LW()
        eyeHL = engine._eye_H_left(LW)
        for _ in range(4 * engine.env_max_iter):
            LWn = _update_LP_mixed(LW, self.W, ket=AL, bra=AL) - e * eyeHL
            dL = float(norm(LWn - LW))
            LW = LWn
            if dL < tol * max(float(norm(LW)), 1.):
                break
        return LW

    def _anchored_RW(self, engine):
        """Right-side analogue of :meth:`_anchored_LW` (on `engine`'s AR)."""
        e = engine.env_energy_cell
        tol = engine.env_tol
        AR = engine.ARs[0]
        RW = engine._boundary_RW()
        eyeHR = engine._eye_H_right(RW)
        for _ in range(4 * engine.env_max_iter):
            RWn = _update_RP_mixed(RW, self.W, ket=AR, bra=AR) - e * eyeHR
            dR = float(norm(RWn - RW))
            RW = RWn
            if dR < tol * max(float(norm(RW)), 1.):
                break
        return RW

    # -- mixed transfer operators ----------------------------------------------

    def _T_left_mixed(self, env):
        return _update_LP_mixed(env, self.W, ket=self.AR, bra=self.AL)

    def _T_right_mixed(self, env):
        return _update_RP_mixed(env, self.W, ket=self.AL, bra=self.AR)

    # -- dispersion -------------------------------------------------------------

    def effective_h(self, p: float) -> LinearOperator:
        return _HEffExcitation(self, p, self.gmres_tol)

    def dispersion(self, ps, n_bands: int = 1, tol: float = 1e-8):
        """omega(p) for each momentum in `ps`: the `n_bands` lowest eigenvalues
        of the effective Hamiltonian (shape ``(len(ps), n_bands)``).

        `tol` is the eigensolver tolerance. Do NOT pass 0 (machine-exact):
        the effective Hamiltonian is applied through iterative geometric-sum
        solves (`gmres_tol`), so it carries ~1e-9 noise — demanding exact
        Ritz convergence on a noisy operator makes ARPACK return spurious
        values (measured: a -0.0 "gap" on a gapped chain).
        """
        import scipy.sparse.linalg as spla

        out = np.zeros((len(ps), n_bands))
        for i, p in enumerate(ps):
            H = self.effective_h(float(p))
            bridge = NumpyArrayLinearOperator(H, H.some_vector())
            v0 = bridge.tensor_to_flat(H.some_vector())
            n = v0.size
            shift = _complement_shift(bridge, v0)
            if n_bands + 2 >= n:  # tiny problem: dense solve
                M = np.zeros((n, n), complex)
                for j in range(n):
                    e = np.zeros(n, complex)
                    e[j] = 1.
                    Pe = bridge.tensor_to_flat(bridge.flat_to_tensor(e))
                    M[:, j] = bridge.tensor_to_flat(
                        H.matvec(bridge.flat_to_tensor(e))) + shift * (e - Pe)
                w = np.linalg.eigvalsh(M)
                out[i] = w[:n_bands]
            else:
                w = spla.eigsh(bridge.as_scipy_operator(complement_shift=shift),
                               k=n_bands, which='SA', tol=tol, v0=v0,
                               return_eigenvectors=False)
                out[i] = np.sort(w)
        return out

    def operator_tangent_vector(self, p: float, op) -> SymmetricTensor:
        """The tangent-space representation ``X_O`` of ``O_p |gs>`` at
        momentum `p`: ``<Phi_p(X) | O_p | gs> = <X, X_O>``.

        `op` is a single-site operator ``[p; p*]``; for a charge-raising
        operator matching the engine's ``sector``, pass it as ``[p; p*, q]``
        (e.g. built with ``from_dense_block`` over ``[p_leg], [p_leg, q_leg]``).

        ``B_O = O . AC`` is not in left gauge, so besides the same-site term
        ``VL^dag B_O`` the positions where ``B_O`` sits strictly left of the
        projection site contribute a geometric series over the PLAIN mixed
        transfer operator (bra AL, ket AR) seeded by ``AL^dag B_O`` — the
        operator analogue of the LB series in the effective Hamiltonian. The
        ground-state (disconnected) component along ``AL C`` is annihilated
        by ``VL^dag`` in the same-site term and, for p != 0, stays finite in
        the resolvent.
        """
        AC = permute_legs(tdot(self.C, self.AR, 'vR', 'vL'),
                          codomain=['vL', 'p'], domain=['vR'])
        BO = tdot(op, AC, 'p*', 'p')
        BO = permute_legs(BO, codomain=['vL', 'p'],
                          domain=['vR'] + _q_extra(BO))
        # same-site term
        XO = tdot(dagger(self.VL), BO, ['vL*', 'p*'], ['vL', 'p'])
        XO = permute_legs(XO.relabelled({'vR*': 'vL'}),
                          codomain=['vL'], domain=['vR'] + _q_extra(XO))
        # B_O strictly left of the projection site (ket AR in between)
        L1 = tdot(dagger(self.AL), BO, ['vL*', 'p*'], ['vL', 'p'])
        L1 = permute_legs(L1, codomain=['vR*'],
                          domain=['vR'] + _q_extra(L1))
        phase = np.exp(-1j * float(p))
        L = _gmres(_GeometricResolvent(self._plain_left_mixed, phase, L1),
                   phase * L1, tol=self.gmres_tol)
        B2 = tdot(self.AR, L, 'vL', 'vR')
        B2 = permute_legs(B2.relabelled({'vR*': 'vL'}),
                          codomain=['vL', 'p'], domain=['vR'] + _q_extra(B2))
        X2 = tdot(dagger(self.VL), B2, ['vL*', 'p*'], ['vL', 'p'])
        X2 = permute_legs(X2.relabelled({'vR*': 'vL'}),
                          codomain=['vL'], domain=['vR'] + _q_extra(X2))
        return XO + X2

    def _plain_left_mixed(self, x):
        """MPO-free mixed transfer (bra AL, ket AR) on [vR*; vR(, q)]."""
        t = tdot(self.AR, x, 'vL', 'vR')
        t = tdot(dagger(self.AL), t, ['vL*', 'p*'], ['vR*', 'p'])
        return permute_legs(t, codomain=['vR*'], domain=['vR'] + _q_extra(t))

    def spectral_weights(self, p: float, op, n_bands: int = 4,
                         tol: float = 1e-8):
        """Poles and weights of the zero-temperature spectral function

        ``S^{O}(p, omega) = sum_n |<Phi_p(X_n)| O_p |gs>|^2 delta(omega - omega_n)``

        within the single-mode ansatz: returns ``(omegas, weights)`` of the
        `n_bands` lowest excitations at momentum `p` (weights in the
        delta-normalized convention, i.e. ``w_n = |<X_n, X_O>|^2``; for a spin
        flip on a polarized state the single-particle weight tends to 1).
        """
        import scipy.sparse.linalg as spla

        from ..tensors import inner

        XO = self.operator_tangent_vector(p, op)
        H = self.effective_h(float(p))
        bridge = NumpyArrayLinearOperator(H, XO)
        v0 = bridge.tensor_to_flat(XO)
        n = v0.size
        k = min(n_bands, n - 2)
        shift = _complement_shift(bridge, v0)
        w, V = spla.eigsh(bridge.as_scipy_operator(complement_shift=shift),
                          k=max(k, 1), which='SA', tol=tol, v0=v0)
        order = np.argsort(w)
        omegas, weights = [], []
        for j in order:
            Xn = bridge.flat_to_tensor(np.ascontiguousarray(V[:, j]))
            nrm2 = float(np.real(inner(Xn, Xn, do_dagger=True)))
            ov = complex(inner(Xn, XO, do_dagger=True))
            omegas.append(float(w[j]))
            weights.append(abs(ov) ** 2 / nrm2)
        return np.array(omegas), np.array(weights)
