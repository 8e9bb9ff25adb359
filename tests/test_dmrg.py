"""Integration tests: two-site DMRG vs exact diagonalization.

Mirrors the reference's strongest whole-stack check
(tests/python_tests/test_toycodes.py:39-121): ground-state energies to 1e-9.
"""

import numpy as np
import pytest

from cyten_tpu.algorithms import (
    DMRGEngine, HeisenbergModel, SimpleMPS, TFIModel,
    heisenberg_exact_finite_gs_energy, tfi_exact_finite_gs_energy,
)


@pytest.mark.parametrize('conserve', ['None', 'parity'])
def test_dmrg_tfi(conserve):
    L, J, g = 12, 1., 1.5
    model = TFIModel(L=L, J=J, g=g, conserve=conserve, block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=32, eps=1e-13)
    E = eng.run(n_sweeps=10)
    E_exact = tfi_exact_finite_gs_energy(L, J, g)
    assert abs(E - E_exact) < 1e-9
    assert abs(model.energy(psi) - E_exact) < 1e-8


@pytest.mark.parametrize('conserve', ['None', 'parity', 'Sz'])
def test_dmrg_heisenberg(conserve):
    L, J = 8, 1.
    model = HeisenbergModel(L=L, J=J, conserve=conserve, block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=32, eps=1e-13)
    E = eng.run(n_sweeps=12)
    E_exact = heisenberg_exact_finite_gs_energy(L, J)
    assert abs(E - E_exact) < 1e-9


def test_mps_measurements():
    L = 6
    model = TFIModel(L=L, g=1.0, conserve='parity', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    DMRGEngine(psi, model, chi_max=16).run(n_sweeps=6)
    # entanglement entropy is positive at criticality
    ent = psi.entanglement_entropy()
    assert len(ent) == L - 1
    assert all(s > 0.05 for s in ent[1:-1])
    # norm
    assert abs(psi.norm_squared() - 1) < 1e-10
    assert abs(psi.overlap(psi) - 1) < 1e-10
    # site expectation values of sigma_z
    import numpy as np

    from cyten_tpu.tensors import SymmetricTensor

    sz = SymmetricTensor.from_dense_block(
        np.diag([1., -1.]), [model.site_leg], [model.site_leg],
        backend=model.backend, labels=['p', 'p*'])
    vals = [psi.site_expectation_value(sz, i) for i in range(L)]
    assert all(0 < v < 1 for v in np.real(vals))


def test_tebd_imaginary_time():
    """Imaginary-time TEBD converges to the DMRG/exact ground energy (TFI, Z2)."""
    from cyten_tpu.algorithms.models import TFIModel
    from cyten_tpu.algorithms.mps import SimpleMPS
    from cyten_tpu.algorithms.tebd import TEBDEngine

    L = 10
    model = TFIModel(L=L, J=1., g=1.5, conserve='parity', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    E_exact = model.exact_finite_gs_energy()
    errs = []
    for dt, n in [(0.1, 60), (0.05, 60), (0.01, 150)]:
        eng = TEBDEngine(psi, model, dt=dt, chi_max=32, imaginary=True)
        eng.run(n)
        errs.append(abs(eng.energy() - E_exact))
    # with the per-sweep re-canonicalization (default for imaginary time) the
    # O(dt) canonical-form bias is gone; the error is Trotter-limited O(dt^2)
    assert errs[0] > errs[1] > errs[2]
    assert errs[1] < 0.5 * errs[0], errs       # faster than linear in dt
    assert errs[2] < 1e-6, errs


def test_correlation_function():
    """<sz_i sz_j> on the TFI ground state vs exact diagonalization."""
    import scipy.sparse as sp
    import scipy.sparse.linalg

    from cyten_tpu.algorithms.models import TFIModel
    from cyten_tpu.algorithms.mps import SimpleMPS
    from cyten_tpu.algorithms.dmrg import DMRGEngine
    from cyten_tpu.tensors import SymmetricTensor

    L = 8
    model = TFIModel(L=L, J=1., g=1.2, conserve='parity', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    DMRGEngine(psi, model, chi_max=32).run(n_sweeps=8)
    sz = np.diag([1., -1.])
    op = SymmetricTensor.from_dense_block(sz, [model.site_leg], [model.site_leg],
                                          backend=model.backend, labels=['p', 'p*'])
    c = psi.correlation_function(op, 1, op, 5)
    # ED reference
    sz_sp = sp.csr_matrix(sz)
    id2 = sp.identity(2, format='csr')

    def embed(op_s, i):
        res = sp.identity(1, format='csr')
        for k in range(L):
            res = sp.kron(res, op_s if k == i else id2, format='csr')
        return res

    sx = sp.csr_matrix(np.array([[0., 1.], [1., 0.]]))
    H = sp.csr_matrix((2 ** L, 2 ** L))
    for i in range(L - 1):
        H = H - embed(sx, i) @ embed(sx, i + 1)
    for i in range(L):
        H = H - 1.2 * embed(sz_sp, i)
    w, v = scipy.sparse.linalg.eigsh(H, k=1, which='SA')
    gs = v[:, 0]
    c_ed = gs @ (embed(sz_sp, 1) @ embed(sz_sp, 5) @ gs)
    np.testing.assert_allclose(np.real(c), c_ed, atol=1e-8)


def test_tebd_real_time():
    """Real-time TEBD quench vs exact unitary evolution (TFI, L=6)."""
    import scipy.sparse as sp
    import scipy.linalg

    from cyten_tpu.algorithms.models import TFIModel
    from cyten_tpu.algorithms.mps import SimpleMPS
    from cyten_tpu.algorithms.tebd import TEBDEngine
    from cyten_tpu.tensors import SymmetricTensor

    L, g, dt, n_steps = 6, 1.5, 0.05, 10
    model = TFIModel(L=L, J=1., g=g, conserve='None', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = TEBDEngine(psi, model, dt=dt, chi_max=32, imaginary=False)
    eng.run(n_steps)
    sz = np.diag([1., -1.])
    op = SymmetricTensor.from_dense_block(sz, [model.site_leg], [model.site_leg],
                                          backend=model.backend, labels=['p', 'p*'])
    sz_mid = np.real(psi.site_expectation_value(op, L // 2))

    # ED: evolve |up...up> under the same bond-op sum
    H = np.zeros((2 ** L, 2 ** L))
    for i, h in enumerate(model.H_bonds):
        hd = h.to_numpy().transpose(0, 1, 3, 2).reshape(4, 4)
        H += np.kron(np.kron(np.eye(2 ** i), hd), np.eye(2 ** (L - i - 2)))
    v0 = np.zeros(2 ** L)
    v0[0] = 1.  # |up..up> is index 0 in the public basis
    v_t = scipy.linalg.expm(-1j * H * dt * n_steps) @ v0
    sz_embed = np.kron(np.kron(np.eye(2 ** (L // 2)), sz), np.eye(2 ** (L - L//2 - 1)))
    sz_ed = np.real(np.conj(v_t) @ (sz_embed @ v_t))
    np.testing.assert_allclose(sz_mid, sz_ed, atol=5e-4)  # Trotter dt^2 accuracy


def test_canonicalize():
    """SimpleMPS.canonicalize restores exact B form after non-unitary evolution."""
    from cyten_tpu.algorithms.models import TFIModel
    from cyten_tpu.algorithms.mps import SimpleMPS
    from cyten_tpu.algorithms.tebd import TEBDEngine
    from cyten_tpu.tensors import SymmetricTensor, dagger, norm, tdot

    L = 8
    model = TFIModel(L=L, J=1., g=0.9, conserve='parity', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    # degrade canonical form on purpose: imaginary gates, no re-canonicalization
    eng = TEBDEngine(psi, model, dt=0.2, chi_max=16, imaginary=True,
                     canonicalize_every=0)
    eng.run(20)
    E_raw = eng.energy()
    psi.canonicalize()
    assert abs(psi.norm_squared() - 1.) < 1e-12
    for i in range(1, L):
        B = psi.Bs[i]
        E = tdot(B, dagger(B), ['p', 'vR'], ['p*', 'vR*'])
        eye = SymmetricTensor.from_eye([B.get_leg_co_domain('vL')],
                                       backend=B.backend, labels=E.labels)
        assert float(norm(E + (-1.) * eye)) < 1e-12
    # canonicalization is a gauge change: energy measured canonically differs
    # from the biased raw value but is closer to the exact ground energy
    E_canon = eng.energy()
    E_exact = model.exact_finite_gs_energy()
    assert abs(E_canon - E_exact) <= abs(E_raw - E_exact) + 1e-12


def test_charged_correlation_function():
    """<Sp_i Sm_j> via ChargedTensor pairs (hidden charge leg through the
    transfer matrix) against the Sx-correlator oracle without conservation."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import HeisenbergModel
    from cyten_tpu.models.sites import SpinSite

    L = 8
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='numpy')
    site = SpinSite(0.5, conserve='Sz', backend=model.backend)
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * 4,
                                       backend=model.backend)
    DMRGEngine(psi, model, chi_max=24, eps=1e-12).run(n_sweeps=8)
    Sp, Sm = site.get_op('Sp'), site.get_op('Sm')
    v_pm = psi.correlation_function(Sp, 2, Sm, 5)
    v_mp = psi.correlation_function(Sm, 2, Sp, 5)

    model0 = HeisenbergModel(L=L, conserve='None', block_backend='numpy')
    site0 = SpinSite(0.5, conserve='None', backend=model0.backend)
    psi0 = SimpleMPS.from_product_state(model0.site_legs, [0, 1] * 4,
                                        backend=model0.backend)
    DMRGEngine(psi0, model0, chi_max=32, eps=1e-12).run(n_sweeps=8)
    Sx = site0.get_op('Sx')
    v_xx = psi0.correlation_function(Sx, 2, Sx, 5)
    assert abs(v_xx - (v_pm + v_mp) / 4) < 1e-8


def test_charged_correlation_fermions():
    """<Cd_i C_j> on the free-fermion chain vs the exact correlation matrix —
    JW strings come entirely from the graded-symmetry braiding of the hidden
    charge leg (no explicit string operators)."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import mpo_from_bond_op
    from cyten_tpu.models.couplings import hopping
    from cyten_tpu.models.sites import SpinlessFermionSite

    L, t_hop = 6, 1.0
    site = SpinlessFermionSite('N')
    h_bond = hopping([site, site], t=t_hop).to_tensor()

    class FermionChain:
        site_leg = site.leg
        backend = site.backend
        H_bonds = [h_bond] * (L - 1)
        H_mpo = mpo_from_bond_op(h_bond, L)

    psi = SimpleMPS.from_product_state([site.leg] * L, [1, 0] * (L // 2),
                                       backend=site.backend)
    DMRGEngine(psi, FermionChain(), chi_max=24, eps=1e-13).run(n_sweeps=6)
    k = np.arange(1, L + 1)
    eps = -2 * t_hop * np.cos(np.pi * k / (L + 1))
    phi = np.sqrt(2.0 / (L + 1)) * np.sin(
        np.pi * np.outer(np.arange(1, L + 1), k) / (L + 1))
    Cexact = phi[:, eps < 0] @ phi[:, eps < 0].T
    Cd, C = site.get_op('Cd'), site.get_op('C')
    # two pairs suffice: one long-range (crosses 4 JW strings), one adjacent
    for i, j in [(0, 5), (2, 3)]:
        v = psi.correlation_function(Cd, i, C, j)
        assert abs(v - Cexact[i, j]) < 1e-9, (i, j, v, Cexact[i, j])


def test_mpo_expectation_and_variance():
    """<H> via MPO environment (gauge-exact) and the variance diagnostic."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import TFIModel, tfi_exact_finite_gs_energy

    L, g = 10, 1.2
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=24, eps=1e-13)
    eng.sweep()
    var0 = psi.mpo_variance(model.H_mpo)
    eng.run(n_sweeps=8, tol=1e-13)
    E_exact = tfi_exact_finite_gs_energy(L, 1., g)
    assert abs(psi.expectation_value_mpo(model.H_mpo) - E_exact) < 1e-9
    var = psi.mpo_variance(model.H_mpo)
    assert var < 1e-9 < var0  # variance collapses on convergence


def test_dmrg_excited_states():
    """orthogonal_to=[psi0]: the engine finds the first excited state of the
    same charge sector, validated against exact diagonalization."""
    import functools

    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import TFIModel

    L, g = 10, 1.2
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='numpy')
    sx = np.array([[0., 1.], [1., 0.]])
    sz = np.diag([1., -1.])

    def op(o, i):
        mats = [np.eye(2)] * L
        mats[i] = o
        return functools.reduce(np.kron, mats)

    H = sum(-op(sx, i) @ op(sx, i + 1) for i in range(L - 1)) \
        + sum(-g * op(sz, i) for i in range(L))
    Pz = functools.reduce(np.kron, [sz] * L)
    w, v = np.linalg.eigh(H)
    parity = np.einsum('ij,ji->i', v.T @ Pz, v)
    even = w[parity > 0.5]

    psi0 = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                        backend=model.backend)
    E0 = DMRGEngine(psi0, model, chi_max=32, eps=1e-13).run(n_sweeps=8)
    psi1 = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                        backend=model.backend)
    E1 = DMRGEngine(psi1, model, chi_max=32, eps=1e-13,
                    orthogonal_to=[psi0]).run(n_sweeps=10)
    assert abs(E0 - even[0]) < 1e-10
    assert abs(E1 - even[1]) < 1e-10
    assert abs(psi1.overlap(psi0)) < 1e-8


@pytest.mark.slow
def test_chi_bucketing_equivalence():
    """Chi bucketing (pad_chi_multiple) rounds kept multiplicities up per
    sector: a padded run keeps a superset of states, so it is variationally at
    least as good, stays close to the ragged run, and produces MXU-aligned
    multiplicities (SURVEY §4 carry-over: bucketing equivalence)."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import HeisenbergModel

    L = 8  # smaller than round 1 (L=10/chi=12/6 sweeps = 202 s) — same property
    # numpy: padding equivalence is backend-independent; jax DMRG covered elsewhere
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='numpy')
    Es = []
    legs = []
    for pad in (None, 4):
        psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                           backend=model.backend)
        eng = DMRGEngine(psi, model, chi_max=8, eps=1e-12,
                         pad_chi_multiple=pad)
        Es.append(eng.run(n_sweeps=5, tol=1e-12))
        legs.append(psi.Bs[L // 2].get_leg_co_domain('vL'))
    assert abs(Es[0] - Es[1]) < 1e-4           # same physics
    assert Es[1] <= Es[0] + 1e-10              # padding only adds states
    assert all(int(m) % 4 == 0 for m in legs[1].multiplicities)
    assert int(legs[1].dim) >= int(legs[0].dim)


def test_apply_mpo():
    """Zip-up MPO application vs the dense oracle, and the eigenstate property
    H|gs> = E|gs>."""
    import functools

    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import TFIModel
    from cyten_tpu.algorithms.mpo import apply_mpo
    from cyten_tpu.tensors import tdot

    L, g = 6, 1.2
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=8, eps=1e-14)
    eng.run(n_sweeps=2)

    def full_state(p):
        s = p.get_theta1(0)
        for i in range(1, L):
            s = tdot(s, p.Bs[i].relabelled({'p': f'p{i}'}), 'vR', 'vL')
        return np.asarray(s.to_dense_block()).reshape(-1)

    sx = np.array([[0., 1.], [1., 0.]])
    sz = np.diag([1., -1.])

    def op(o, i):
        mats = [np.eye(2)] * L
        mats[i] = o
        return functools.reduce(np.kron, mats)

    H = sum(-op(sx, i) @ op(sx, i + 1) for i in range(L - 1)) \
        + sum(-g * op(sz, i) for i in range(L))
    ref = H @ full_state(psi)
    phi, nrm = apply_mpo(psi, model.H_mpo, chi_max=32, eps=1e-14)
    got = nrm * full_state(phi)
    ph = np.vdot(got, ref) / np.linalg.norm(got) ** 2
    assert np.linalg.norm(ref - ph * got) / np.linalg.norm(ref) < 1e-12

    # eigenstate property after convergence
    E = eng.run(n_sweeps=8, tol=1e-13)
    phi, nrm = apply_mpo(psi, model.H_mpo, chi_max=16, eps=1e-14)
    assert abs(nrm - abs(E)) < 1e-8
    assert abs(abs(phi.overlap(psi)) - 1.) < 1e-8


def test_static_mode_dmrg():
    """Static (fully fused) steady-state mode: each bond update is one jitted
    program with a frozen per-sector chi allocation; energies match the
    dynamic engine to machine precision."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import TFIModel, tfi_exact_finite_gs_energy

    L, g = 10, 1.2
    E_exact = tfi_exact_finite_gs_energy(L, 1., g)
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='jax')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=16, eps=1e-12)
    for _ in range(3):
        eng.sweep()
    eng.enable_static_mode(n_lanczos=20)
    for _ in range(3):
        E = eng.sweep()
    assert abs(E - E_exact) < 1e-10


def test_static_mode_steady_svd():
    """svd_mode='steady' (warm-started matmul/QR-only SVD, tensors/steady.py)
    tracks the exact-SVD static mode: same converged energy, canonical form
    preserved (B isometries) after several steady sweeps."""
    import cyten_tpu as ct
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import (
        HeisenbergModel, heisenberg_exact_finite_gs_energy,
    )
    from cyten_tpu.tensors import SymmetricTensor, compose, dagger, norm

    L = 6  # enough distinct bond structures to exercise the steady path;
    # L=8 only added compile time (the suite's slowest test at ~200 s)
    E_exact = heisenberg_exact_finite_gs_energy(L, 1.)
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='jax')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=16, eps=1e-12)
    for _ in range(4):
        eng.sweep()
    eng.enable_static_mode(n_lanczos=20, svd_mode='steady')
    for _ in range(3):
        E = eng.sweep()
    assert abs(float(E) - E_exact) < 1e-9
    # reduced cleanup knobs (DESIGN §17: ~8% step saving near convergence):
    # the Jacobi/Newton-Schulz corrections are second order at the fixed
    # point, so one of each must preserve the converged energy
    eng.enable_static_mode(n_lanczos=20, svd_mode='steady',
                           steady_svd_options={'n_jacobi': 1, 'ns_polish': 1})
    E = eng.sweep()
    assert abs(float(E) - E_exact) < 1e-9
    # canonical form: every B right-isometric (sum over p, vR of B B^* == id on
    # the left bond, i.e. M M^dag == id for M = B viewed as [vL | p, vR])
    from cyten_tpu.tensors import permute_legs

    for i in range(1, L):
        B = psi.Bs[i]
        M = permute_legs(B, codomain=['vL'], domain=['vR', 'p'])
        MMd = compose(M, dagger(M))
        eye = SymmetricTensor.from_eye(M.codomain.factors, backend=B.backend,
                                       dtype=B.dtype)
        assert float(norm(MMd + (-1.) * eye)) < 1e-8, i


def test_static_mode_fusion_tree():
    """Static (fully fused) steady mode on the FUSION-TREE backend: the whole
    SU(2) bond update (theta assembly, Lanczos, steady SVD, frozen-multiplet
    truncation, env updates) traces as one jitted program. Regression for the
    host-numpy value paths this used to hit (fusion_tree._row_scale_factors
    assembled the scale_axis row factors via to_numpy; Diagonal norm forced
    float())."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import (
        HeisenbergModel, heisenberg_exact_finite_gs_energy,
    )

    L = 6
    E_exact = heisenberg_exact_finite_gs_energy(L, 1.)
    model = HeisenbergModel(L=L, conserve='SU(2)', block_backend='jax')
    psi = SimpleMPS.from_singlet_pairs(model.site_legs[0], L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=16, eps=1e-12)
    for _ in range(4):
        eng.sweep()
    eng.enable_static_mode(n_lanczos=16, svd_mode='steady')
    for _ in range(3):
        E = eng.sweep()
    assert abs(float(E) - E_exact) < 1e-9


def test_static_mode_golden_chain():
    """Static/steady mode on an ANYONIC theory (Fibonacci golden chain): the
    fused bond update handles anyonic tree plans (planar, no braids needed in
    DMRG) and qdim-weighted norms; matches the MPSKit.jl energy."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import GoldenChainModel

    L = 6
    m = GoldenChainModel(L=L, J=1., block_backend='jax')
    psi = SimpleMPS.from_fusion_pairs(m.site_leg, L, backend=m.backend)
    eng = DMRGEngine(psi, m, chi_max=16, eps=1e-13)
    for _ in range(5):
        eng.sweep()
    eng.enable_static_mode(n_lanczos=16, svd_mode='steady')
    for _ in range(3):
        E = eng.sweep()
    assert abs(float(E) - m.exact_finite_gs_energy()) < 1e-9


def test_mpo_sum_and_compression():
    """add_mpos (block-diagonal virtual sum) and compress_mpo (QR+SVD sweeps)
    are exact: <H+H> == 2<H>, and compression recovers the minimal bond dims."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import HeisenbergModel
    from cyten_tpu.algorithms.mpo import add_mpos, compress_mpo

    L = 8
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                       backend=model.backend)
    DMRGEngine(psi, model, chi_max=24, eps=1e-12).run(n_sweeps=6)
    E = psi.expectation_value_mpo(model.H_mpo)
    H2 = add_mpos(model.H_mpo, model.H_mpo)
    assert abs(psi.expectation_value_mpo(H2) - 2 * E) < 1e-10
    assert int(H2[1].get_leg_co_domain('wR').dim) == 10
    H2c = compress_mpo(H2, eps=1e-10)
    dims = [int(W.get_leg_co_domain('wR').dim) for W in H2c[:-1]]
    assert max(dims) <= 5  # compression recovers the minimal MPO rank
    assert abs(psi.expectation_value_mpo(H2c) - 2 * E) < 1e-10


def test_static_batched_half_sweep():
    """sweep_static_batched: maximal uniform bond runs execute as ONE lax.scan
    dispatch per direction; agrees with the per-bond static mode."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import TFIModel, tfi_exact_finite_gs_energy

    L, g = 12, 1.2
    E_exact = tfi_exact_finite_gs_energy(L, 1., g)
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='jax')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=8, eps=1e-14, pad_chi_multiple=4)
    for _ in range(4):
        eng.sweep()
    eng.enable_static_mode(n_lanczos=20, svd_mode='steady')
    eng.sweep()
    runs = eng._static_runs()
    assert any(b1 - b0 >= 3 * p for b0, b1, p in runs), runs  # a real run
    E = None
    for _ in range(2):
        E = eng.sweep_static_batched()
    assert abs(E - E_exact) < 1e-8
    E2 = eng.sweep()  # per-bond static sweep must agree
    assert abs(E2 - E) < 1e-10


@pytest.mark.slow
def test_static_batched_half_sweep_period2_su2():
    """Period-2 batched static sweeps on the FUSION-TREE backend: SU(2)
    spin-1/2 bond legs ALTERNATE between integer and half-integer total spin,
    so no two consecutive bonds ever share a pytree structure — but
    next-nearest bonds do. _static_runs detects the period-2 pattern and the
    half sweep scans over supercells of 2 bonds (NEXT.md round-3 rough edge:
    'sweep_static_batched does not yet cover the fusion-tree backend').
    Needs a long enough saturated plateau (L=20 at chi_mult=8, pad 4) for a
    multi-cell run to exist."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import (
        HeisenbergModel, heisenberg_exact_finite_gs_energy,
    )

    L = 20
    E_exact = heisenberg_exact_finite_gs_energy(L, 1.)
    model = HeisenbergModel(L=L, conserve='SU(2)', block_backend='jax')
    psi = SimpleMPS.from_singlet_pairs(model.site_legs[0], L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=8, eps=1e-14, pad_chi_multiple=4)
    for _ in range(3):
        eng.sweep()
    eng.enable_static_mode(n_lanczos=10, svd_mode='steady')
    eng.sweep()
    runs = eng._static_runs()
    # the alternating structure forces p=2 for any multi-cell run
    assert any(p == 2 and (b1 - b0) // p >= 2 for b0, b1, p in runs), runs
    E = None
    for _ in range(2):
        E = eng.sweep_static_batched()
    assert abs(E - E_exact) < 1e-6  # chi_mult=8-limited truncation floor
    E2 = eng.sweep()  # per-bond static sweep must agree
    assert abs(E2 - E) < 1e-10


def test_auto_static_mode():
    """auto_static=True flips the engine into static (fused) mode once the bond
    structures saturate; the run converges to the exact energy."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import TFIModel, tfi_exact_finite_gs_energy

    L, g = 10, 1.3
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='jax')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=12, eps=1e-12, auto_static=True)
    E = eng.run(n_sweeps=8, tol=1e-13)
    assert getattr(eng, 'static_mode', False) is True
    assert abs(E - tfi_exact_finite_gs_energy(L, 1., g)) < 1e-9


def test_apply_local_op():
    """apply_local_op: consistency with site_expectation_value, norm of a
    unitary application, and canonical form of the result."""
    import cyten_tpu as ct
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import TFIModel

    L = 8
    m = TFIModel(L=L, J=1., g=1.3, conserve='None', block_backend='numpy')
    psi = SimpleMPS.from_product_state(m.site_legs, [0] * L, backend=m.backend)
    DMRGEngine(psi, m, chi_max=16, eps=1e-12).run(n_sweeps=8)
    sx = ct.SymmetricTensor.from_dense_block(
        np.array([[0., 1.], [1., 0.]]), [m.site_leg], [m.site_leg],
        backend=m.backend, labels=['p', 'p*'])
    for i in (0, 3, L - 1):
        phi = psi.apply_local_op(sx, i)
        # <psi|sx_i|psi> == <psi|phi>
        a = complex(psi.site_expectation_value(sx, i))
        b = complex(psi.overlap(phi))
        assert abs(a - b) < 1e-10
        # sx is unitary: |phi| = 1; result is canonical (B form restored)
        assert abs(complex(phi.overlap(phi)) - 1) < 1e-10
        for B in phi.Bs:
            B.test_sanity()


@pytest.mark.parametrize('conserve', ['Sz', 'None'])
def test_dmrg_adaptive_svd(conserve):
    """Full DMRG with dynamic_svd='adaptive' (rank-adaptive warm-started
    truncated SVD, tensors/adaptive.py) from a chi=1 product state: rank growth,
    sector growth, and final energies must match the exact-SVD path to 1e-9.
    (VERDICT r2 #2: growth-phase QDWH wall.)"""
    L, J = 8, 1.
    model = HeisenbergModel(L=L, J=J, conserve=conserve, block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=32, eps=1e-13, dynamic_svd='adaptive')
    E = eng.run(n_sweeps=14)
    E_exact = heisenberg_exact_finite_gs_energy(L, J)
    assert abs(E - E_exact) < 1e-9


def test_adaptive_svd_matches_exact():
    """adaptive_truncated_svd vs truncated_svd on a decaying-spectrum theta:
    same kept structure, singular values to 1e-10, exact error accounting
    (recon error == reported err)."""
    from cyten_tpu import ElementarySpace, SymmetricTensor, u1_symmetry
    from cyten_tpu.backends import get_backend
    from cyten_tpu.tensors import (
        adaptive_truncated_svd, compose, dagger, norm, scale_axis, svd,
        svd_apply_mask, truncate_singular_values, truncated_svd)

    rng = np.random.default_rng(7)
    sym = u1_symmetry
    backend = get_backend(sym, 'numpy')

    def leg(secs, mults, dual=False):
        return ElementarySpace.from_sector_decomposition(
            sym, np.array(secs)[:, None], np.array(mults), is_dual=dual)

    vL = leg([-1, 0, 1], [10, 20, 10])
    p = leg([-1, 1], [1, 1])
    vR = leg([-1, 0, 1], [10, 20, 10], dual=True)
    theta = SymmetricTensor.from_random_normal(
        [vL, p], [vR, p.dual], backend=backend, rng=rng,
        labels=['vL', 'p0', 'vR', 'p1'])
    # impose a decaying spectrum (the DMRG regime): theta <- U diag(decay) Vh
    U_f, S_f, Vh_f = svd(theta, new_labels=('vR', 'vL'))
    s = np.sort(S_f.diag_numpy)[::-1]
    decay = {}
    from cyten_tpu.backends.data import DiagonalBlockData
    vals = np.concatenate([0.5 ** np.arange(len(s))])
    # rescale per-block via elementwise: easiest as full recompose with scaled S
    pos = 0
    new_blocks = []
    for blk in S_f.data.blocks:
        k = blk.shape[0]
        new_blocks.append(backend.block_backend.as_block(
            0.5 ** (np.arange(pos, pos + k) % 24), S_f.dtype))
        pos += k
    S_dec = type(S_f)(DiagonalBlockData(new_blocks, S_f.data.block_inds.copy(),
                                        S_f.data.dtype, is_sorted=True),
                      S_f.leg, backend, S_f.labels)
    theta = compose(scale_axis(U_f, S_dec, -1), Vh_f)

    U0, S0, Vh0, err0, _ = truncated_svd(theta, chi_max=24,
                                         new_labels=('vR', 'vL'))
    # warm start: previous visit kept fewer columns
    _, _, Vh_warm, _, _ = truncated_svd(theta, chi_max=16,
                                        new_labels=('vR', 'vL'))
    U, S, Vh, err, _ = adaptive_truncated_svd(theta, Vh_warm, chi_max=24,
                                              n_oversample=8, n_power=2, rng=rng)
    assert S.leg == S0.leg  # identical kept structure (ranks adapted up)
    s0 = np.sort(S0.diag_numpy)[::-1]
    s1 = np.sort(S.diag_numpy)[::-1]
    np.testing.assert_allclose(s1, s0, rtol=1e-9, atol=1e-12)
    assert abs(err - err0) < 1e-9
    rec = compose(scale_axis(U, S, -1), Vh)
    rel = float(norm(rec - theta)) / float(norm(theta))
    assert abs(rel - err) < 1e-10
    # exact isometries
    g = compose(dagger(U), U)
    eye = SymmetricTensor.from_eye([g.codomain.factors[0]], backend=backend,
                                   labels=g.labels, dtype=g.dtype)
    assert float(norm(g - eye)) < 1e-12


def test_dmrg_adaptive_svd_su2():
    """dynamic_svd='adaptive' on the FUSION-TREE backend (SU(2) Heisenberg):
    qdim-weighted truncation and warm-started sketches are backend-agnostic."""
    from cyten_tpu.algorithms.models import HeisenbergModel

    L = 6
    model = HeisenbergModel(L=L, conserve='SU(2)', block_backend='numpy')
    psi = SimpleMPS.from_singlet_pairs(model.site_legs[0], L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=16, eps=1e-12, dynamic_svd='adaptive')
    E = eng.run(n_sweeps=10)
    E_exact = heisenberg_exact_finite_gs_energy(L, 1.)
    assert abs(E - E_exact) < 1e-9


def test_checkpoint_resume_and_rollback(tmp_path):
    """Framework-level fault tolerance (SURVEY §5 'failure detection /
    elastic' -- the reference has none): (a) an interrupted run resumed from
    its rolling checkpoint in a FRESH engine converges to the same energy as
    an uninterrupted run; (b) a corrupted state (non-finite sweep energy) is
    detected and rolled back to the last checkpoint automatically; (c) with
    no checkpoint to roll back to, FaultError is raised."""
    from cyten_tpu.algorithms import FaultError
    from cyten_tpu.tools.checkpoint import CheckpointManager

    L = 8

    def fresh():
        model = HeisenbergModel(L=L, J=1., conserve='Sz',
                                block_backend='numpy')
        psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                           backend=model.backend)
        return model, psi

    E_exact = heisenberg_exact_finite_gs_energy(L, 1.)

    # (a) interrupt after 3 sweeps, resume in a fresh engine (crash recovery)
    ckpt = str(tmp_path / 'run_a')
    model, psi = fresh()
    eng = DMRGEngine(psi, model, chi_max=32, eps=1e-13)
    eng.run(n_sweeps=3, checkpoint=ckpt)
    assert CheckpointManager(ckpt).latest_step() == 3
    model2, psi2 = fresh()  # pretend the process died; psi2 is the cold start
    eng2 = DMRGEngine(psi2, model2, chi_max=32, eps=1e-13)
    E = eng2.run(n_sweeps=9, checkpoint=ckpt)
    assert eng2._sweeps_done > 3  # actually resumed, then swept further
    assert abs(E - E_exact) < 1e-9

    # (b) corruption mid-run: poison psi, next run() detects the non-finite
    # energy, rolls back to the checkpoint and still converges
    eng2.psi.Bs[3] = eng2.psi.Bs[3] * float('nan')
    L_env = eng2.psi.L
    eng2.LPs = [None] * L_env
    eng2.RPs = [None] * L_env
    eng2._init_environments()
    E = eng2.run(n_sweeps=4, checkpoint=ckpt)
    assert np.isfinite(E) and abs(E - E_exact) < 1e-9

    # (c) the same corruption without a checkpoint raises
    model3, psi3 = fresh()
    eng3 = DMRGEngine(psi3, model3, chi_max=32, eps=1e-13)
    eng3.psi.Bs[3] = eng3.psi.Bs[3] * float('nan')
    eng3.LPs = [None] * L
    eng3.RPs = [None] * L
    eng3._init_environments()
    with pytest.raises(FaultError, match='no checkpoint'):
        eng3.run(n_sweeps=2)
