"""SU(3) chain integration anchors.

These are the only end-to-end tests that drive fusion *multiplicities* (N(8,8->8)=2)
through the DMRG hot path: the MPO virtual leg of the Sutherland exchange contains the
adjoint (8), so the environment fusion trees hit mu=2 vertices. Everything else in the
suite is multiplicity-free at tree vertices (SU(2), anyons, abelian).

The bond operator identity SWAP = P_6 - P_3bar is basis-independent, so it doubles as a
direct unitarity/completeness check of the natively computed SU(3) Clebsch-Gordan data
(symmetries/sun_cg.py; the reference loads these from external HDF5 files,
/root/reference/cyten/symmetries/_symmetries.py:1598-1622).
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import Dtype, DiagonalTensor, ElementarySpace, SymmetricTensor
from cyten_tpu.backends import get_backend

SU3 = ct.symmetries.SUN(3).as_Symmetry()
FUND = np.array([1, 0, 0])      # 3
AFUND = np.array([1, 1, 0])     # 3bar
SIX = np.array([2, 0, 0])       # 6  (symmetric square of 3)
ADJ = np.array([2, 1, 0])       # 8


def su3_swap_bond(backend):
    """The two-site exchange operator P = P_6 - P_3bar on 3 (x) 3."""
    p = ElementarySpace(SU3, FUND[None, :])
    bb = backend.block_backend

    def func(shape, coupled):
        c = np.asarray(coupled)
        if np.all(c == SIX):
            return bb.eye_matrix(shape[0], Dtype.float64)
        if np.all(c == AFUND):
            return -1. * bb.eye_matrix(shape[0], Dtype.float64)
        return bb.zeros(shape, Dtype.float64)

    return SymmetricTensor.from_sector_block_func(
        func, [p, p], [p, p], backend=backend, labels=['p0', 'p1', 'p1*', 'p0*'])


def singlet_triples_mps(L, backend):
    """SU(3)-invariant MPS: consecutive site triples fused to the vacuum
    (3 (x) 3 -> 3bar antisymmetric channel, then 3bar (x) 3 -> 1)."""
    from cyten_tpu.algorithms import SimpleMPS

    assert L % 3 == 0
    bb = backend.block_backend
    triv = ElementarySpace(SU3, SU3.trivial_sector[None, :])
    p = ElementarySpace(SU3, FUND[None, :])
    v3 = ElementarySpace(SU3, FUND[None, :])
    v3bar = ElementarySpace(SU3, AFUND[None, :])

    def ones_func(shape, coupled):
        return bb.ones(shape, Dtype.float64)

    bonds = {0: (triv, v3), 1: (v3, v3bar), 2: (v3bar, triv)}
    Bs, Ss = [], []
    for i in range(L):
        vL, vR = bonds[i % 3]
        B = SymmetricTensor.from_sector_block_func(
            ones_func, [vL, p], [vR], backend=backend, labels=[['vL', 'p'], ['vR']])
        B = B / ct.norm(B)
        Bs.append(B)
        Ss.append(DiagonalTensor.from_eye(vL, backend=backend,
                                          labels=['vL', 'vL*'], dtype=Dtype.float64))
    return SimpleMPS(Bs, Ss)


def test_su3_swap_is_projector_difference():
    """<o0 o1| P |i0 i1> = delta(o0,i1) delta(o1,i0) in the public dense basis —
    pins CG completeness/unitarity of the native SU(3) data, basis-independently."""
    backend = get_backend(SU3, 'numpy')
    h = su3_swap_bond(backend)
    h.test_sanity()
    dense = h.to_numpy()  # legs [p0, p1, p1*, p0*]
    T = np.zeros((3, 3, 3, 3))
    for o0 in range(3):
        for o1 in range(3):
            T[o0, o1, o0, o1] = 1.0  # o0 == i1 (axis 2), o1 == i0 (axis 3)
    np.testing.assert_allclose(dense, T, atol=1e-12)


def _sutherland_ed_energy(L):
    dim = 3 ** L
    H = np.zeros((dim, dim))
    eye = np.eye(3)
    swap = np.einsum('ad,bc->abcd', eye, eye).reshape(9, 9)  # |ab> -> |ba>
    for i in range(L - 1):
        term = np.kron(np.kron(np.eye(3 ** i), swap), np.eye(3 ** (L - 2 - i)))
        H += term
    return np.linalg.eigvalsh(H)[0]


@pytest.mark.slow
def test_su3_sutherland_dmrg():
    """H = sum_i P_{i,i+1} (Sutherland model), L=6, vs dense ED.

    The MPO virtual leg carries {1, 8}; environment trees therefore contain
    (8, 8 -> 8) vertices with multiplicity 2 — the multiplicity hot path."""
    from cyten_tpu.algorithms import DMRGEngine
    from cyten_tpu.algorithms.models import mpo_from_bond_op

    L = 6
    backend = get_backend(SU3, 'numpy')
    h_bond = su3_swap_bond(backend)

    class SutherlandChain:
        H_bonds = [h_bond] * (L - 1)
        H_mpo = mpo_from_bond_op(h_bond, L)

    # the MPO virtual leg must contain the adjoint for the mu=2 claim to hold
    w_sectors = SutherlandChain.H_mpo[1].get_leg_co_domain('wL').sector_decomposition
    assert any(np.all(s == ADJ) for s in w_sectors)

    psi = singlet_triples_mps(L, backend)
    E = DMRGEngine(psi, SutherlandChain(), chi_max=32, eps=1e-13).run(n_sweeps=8)
    E_ed = _sutherland_ed_energy(L)
    assert abs(E - E_ed) < 1e-8
