"""Tests for LinearOperators and Krylov-based solvers."""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import ElementarySpace, SymmetricTensor
from cyten_tpu.tensors import (
    LanczosEvolution, ProjectedLinearOperator, ShiftedLinearOperator,
    SumLinearOperator, TensorLinearOperator, gram_schmidt, lanczos,
)
from cyten_tpu.tensors.krylov_based import Arnoldi, lanczos_arpack


@pytest.fixture
def hermitian_op(np_random):
    leg = ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [2, 3, 2])
    be = ct.get_backend(ct.u1_symmetry, 'numpy')
    A = SymmetricTensor.from_random_normal([leg], [leg], backend=be,
                                           rng=np_random)
    H = 0.5 * (A + ct.dagger(A))
    vec0 = SymmetricTensor.from_random_normal([leg], [], backend=be,
                                              rng=np_random)
    return H, vec0


def _sector0_eigs(H):
    """Eigenvalues of H restricted to the trivial-charge sector of the leg."""
    h = H.to_numpy()
    leg = H.codomain.factors[0]
    idx = np.where(np.all(leg.sectors_of_basis == 0, axis=1))[0]
    return np.linalg.eigvalsh(h[np.ix_(idx, idx)])


def test_lanczos_ground_state(hermitian_op):
    H, vec0 = hermitian_op
    op = TensorLinearOperator(H)
    E, psi, n = lanczos(op, vec0, {'N_max': 30, 'P_tol': 1e-14})
    # a symmetric vector lives in the total-charge-0 sector only -> compare
    # against the exact ground energy of that sector's subblock
    w0 = _sector0_eigs(H)
    assert abs(E - w0[0]) < 1e-9
    # residual
    resid = ct.norm(op.matvec(psi) - E * psi)
    assert resid < 1e-6


def test_lanczos_arpack_agrees(hermitian_op):
    H, vec0 = hermitian_op
    op = TensorLinearOperator(H)
    E1, _, _ = lanczos(op, vec0, {'N_max': 30, 'P_tol': 1e-14})
    E2, _, _ = lanczos_arpack(op, vec0)
    assert abs(E1 - E2) < 1e-8


def test_lanczos_evolution(hermitian_op):
    H, vec0 = hermitian_op
    op = TensorLinearOperator(H)
    delta = -0.3
    psi, n = LanczosEvolution(op, vec0, {'N_max': 25, 'P_tol': 1e-16}).run(delta)
    import scipy.linalg

    h = H.to_numpy()
    expect = scipy.linalg.expm(delta * h) @ vec0.to_numpy()
    np.testing.assert_allclose(psi.to_numpy(), expect, rtol=1e-8, atol=1e-10)


def test_arnoldi(hermitian_op):
    H, vec0 = hermitian_op
    op = TensorLinearOperator(H)
    E, psi, n = Arnoldi(op, vec0, {'N_max': 30, 'which': 'LM',
                                   'P_tol': 1e-14}).run()
    w = _sector0_eigs(H)
    assert abs(abs(E) - np.max(np.abs(w))) < 1e-7


def test_operator_wrappers(hermitian_op, np_random):
    H, vec0 = hermitian_op
    op = TensorLinearOperator(H)
    shifted = ShiftedLinearOperator(op, 2.5)
    np.testing.assert_allclose(
        shifted.matvec(vec0).to_numpy(),
        op.matvec(vec0).to_numpy() + 2.5 * vec0.to_numpy(), atol=1e-12)
    summed = SumLinearOperator(op, op)
    np.testing.assert_allclose(summed.matvec(vec0).to_numpy(),
                               2 * op.matvec(vec0).to_numpy(), atol=1e-12)
    # projected: ground state orthogonal to first GS gives first excited energy
    E0, psi0, _ = lanczos(op, vec0, {'N_max': 40, 'P_tol': 1e-16})
    proj = ProjectedLinearOperator(op, [psi0])
    vec1 = SymmetricTensor.from_random_normal(list(vec0.codomain.factors), [],
                                              backend=vec0.backend,
                                              rng=np_random)
    E1, psi1, _ = lanczos(proj, proj.project(vec1), {'N_max': 40,
                                                     'P_tol': 1e-16})
    assert abs(ct.inner(psi0, psi1)) < 1e-8


def test_gram_schmidt(hermitian_op, np_random):
    H, vec0 = hermitian_op
    vecs = [SymmetricTensor.from_random_normal(list(vec0.codomain.factors), [],
                                               backend=vec0.backend,
                                               rng=np_random)
            for _ in range(3)]
    ortho = gram_schmidt(vecs)
    for i, a in enumerate(ortho):
        for j, b in enumerate(ortho):
            expect = 1. if i == j else 0.
            assert abs(ct.inner(a, b) - expect) < 1e-10


def test_lanczos_fused_matches_host():
    """The single-dispatch fused Lanczos agrees with the host-driven loop."""
    import cyten_tpu as ct
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.dmrg import HEffective
    from cyten_tpu.algorithms.models import TFIModel
    from cyten_tpu.tensors import inner
    from cyten_tpu.tensors.krylov_based import lanczos, lanczos_fused

    L, g = 8, 1.2
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='jax')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=16, eps=1e-13)
    eng.sweep()
    i = L // 2
    H = HEffective(eng.LPs[i], eng.RPs[i + 1], model.H_mpo[i],
                   model.H_mpo[i + 1])
    theta0 = psi.get_theta2(i)
    E_host, th_host, _ = lanczos(H, theta0, {'N_max': 25, 'P_tol': 1e-15})
    E_fused, th_fused, _ = lanczos_fused(H, theta0, {'N_max': 25})
    assert abs(E_host - E_fused) < 1e-10
    ov = abs(complex(inner(th_host, th_fused, do_dagger=True)))
    assert abs(ov - 1.) < 1e-8


def test_dmrg_with_fused_lanczos():
    """Full DMRG run with lanczos_options={'fused': True} hits the exact energy."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import TFIModel, tfi_exact_finite_gs_energy

    L, g = 8, 1.3
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='jax')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=16, eps=1e-13,
                     lanczos_options={'N_max': 20, 'fused': True})
    E = eng.run(n_sweeps=8, tol=1e-12)
    assert abs(E - tfi_exact_finite_gs_energy(L, 1., g)) < 1e-9


def test_fused_lanczos_su2():
    """The fused path also traces through the fusion-tree (SU(2)) backend."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import (
        HeisenbergModel, heisenberg_exact_finite_gs_energy,
    )

    L = 8
    model = HeisenbergModel(L=L, conserve='SU(2)', block_backend='jax')
    psi = SimpleMPS.from_singlet_pairs(model.site_legs[0], L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=16, eps=1e-12,
                     lanczos_options={'N_max': 20, 'fused': True})
    E = eng.run(n_sweeps=6, tol=1e-12)
    assert abs(E - heisenberg_exact_finite_gs_energy(L, 1.0)) < 1e-10
