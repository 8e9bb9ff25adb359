"""Tests for tensors/randomized.py — randomized truncated SVD.

Oracle: the exact truncated_svd. With a few power iterations and oversampling,
the randomized result must match the exact top-chi triplets to high accuracy on
decaying spectra, and its error report must upper-bound the exact error.
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import SymmetricTensor
from cyten_tpu.symmetries import ElementarySpace
from cyten_tpu.tensors import randomized_truncated_svd


def _decaying_tensor(sym, sectors, mults, backend, rng, decay=0.85):
    """A 2-leg tensor with a controlled, decaying singular spectrum per sector."""
    V = ElementarySpace(sym, sectors, mults)
    T = SymmetricTensor.from_random_normal([V], [V], backend=backend, rng=rng)
    U, S, Vh = ct.svd(T)
    # reshape the spectrum to a geometric decay (same block structure)
    k = 0

    def func(shape, coupled):
        nonlocal k
        n = shape[0]
        vals = decay ** (np.arange(n) + rng.uniform(0, 0.3, size=n))
        k += n
        return backend.block_backend.as_block(np.sort(vals)[::-1].copy(),
                                              ct.dtypes.Dtype.float64)

    from cyten_tpu import DiagonalTensor
    S2 = DiagonalTensor.from_sector_block_func(func, S.leg, backend=backend)
    return ct.compose(ct.compose(U, S2.as_SymmetricTensor()), Vh)


@pytest.mark.parametrize('symname', ['u1', 'su2'])
def test_randomized_matches_exact(symname, block_backend, np_random):
    if symname == 'u1':
        sym = ct.u1_symmetry
        sectors, mults = [[-1], [0], [1]], [24, 40, 24]
    else:
        sym = ct.su2_symmetry
        sectors, mults = [[0], [1], [2]], [20, 16, 8]
    backend = ct.get_backend(sym, block_backend)
    T = _decaying_tensor(sym, sectors, mults, backend, np_random)
    chi = 16
    U, S, Vh, err, renorm = randomized_truncated_svd(
        T, chi_max=chi, n_oversample=12, n_power=2, rng=np_random)
    U.test_sanity(), S.test_sanity(), Vh.test_sanity()
    Ue, Se, Vhe, err_e, _ = ct.truncated_svd(T, chi_max=chi)
    # kept singular values match the exact ones
    s_got = np.sort(S.diag_numpy)[::-1] if sym.can_be_dropped else None
    s_exp = np.sort(Se.diag_numpy)[::-1] if sym.can_be_dropped else None
    if s_got is not None:
        np.testing.assert_allclose(s_got, s_exp, rtol=1e-6)
    # error report: close to exact, never below it by more than tolerance
    assert err >= err_e - 1e-8
    assert err <= err_e * 1.2 + 1e-8
    # the rank-chi approximations agree as operators
    approx_r = ct.compose(ct.compose(U, S.as_SymmetricTensor()), Vh)
    approx_e = ct.compose(ct.compose(Ue, Se.as_SymmetricTensor()), Vhe)
    assert ct.norm(approx_r - approx_e) < 1e-5 * ct.norm(T)
    # isometries
    eye = ct.compose(ct.dagger(U), U)
    assert ct.norm(eye - ct.SymmetricTensor.from_eye([S.leg], backend=backend)) \
        < 1e-10


def test_randomized_fallback_exact(block_backend, np_random):
    """Tiny tensors (no sketch reduction) fall back to the exact path."""
    sym = ct.u1_symmetry
    backend = ct.get_backend(sym, block_backend)
    V = ElementarySpace(sym, [[0], [1]], [4, 4])
    T = SymmetricTensor.from_random_normal([V], [V], backend=backend,
                                           rng=np_random)
    U, S, Vh, err, renorm = randomized_truncated_svd(T, chi_max=64,
                                                     rng=np_random)
    rec = ct.compose(ct.compose(U, S.as_SymmetricTensor()), Vh)
    assert ct.norm(rec - T) < 1e-10 * ct.norm(T)
    assert err < 1e-12


def test_randomized_multileg(block_backend, np_random):
    """Works on >2-leg tensors through the combine/split preparation."""
    sym = ct.u1_symmetry
    backend = ct.get_backend(sym, block_backend)
    V = ElementarySpace(sym, [[-1], [0], [1]], [6, 10, 6])
    p = ElementarySpace(sym, [[0], [1]], [1, 1])
    T = SymmetricTensor.from_random_normal([V, p], [V, p], backend=backend,
                                           rng=np_random,
                                           labels=['vL', 'p1', 'p2', 'vR'])
    chi = 8
    U, S, Vh, err, _ = randomized_truncated_svd(T, chi_max=chi, n_power=2,
                                                rng=np_random)
    U.test_sanity(), S.test_sanity(), Vh.test_sanity()
    assert U.num_legs == 3 and Vh.num_legs == 3
    assert S.leg.dim <= chi
    Ue, Se, Vhe, err_e, _ = ct.truncated_svd(T, chi_max=chi)
    np.testing.assert_allclose(np.sort(S.diag_numpy)[::-1],
                               np.sort(Se.diag_numpy)[::-1], rtol=1e-4)
    assert abs(err - err_e) < 0.05 * max(err_e, 1e-3)


def test_randomized_normalize_and_hints(block_backend, np_random):
    sym = ct.u1_symmetry
    backend = ct.get_backend(sym, block_backend)
    T = _decaying_tensor(sym, [[-1], [0], [1]], [20, 30, 20], backend, np_random)
    U, S, Vh, err, renorm = randomized_truncated_svd(
        T, chi_max=12, sector_ranks=8, n_power=2, rng=np_random,
        normalize_to=1.)
    np.testing.assert_allclose(ct.norm(S), 1., rtol=1e-10)
    assert renorm != 1.


def test_dmrg_with_randomized_svd(np_random):
    """DMRG with dynamic_svd='randomized' converges to the exact TFI energy."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import TFIModel, tfi_exact_finite_gs_energy

    L, g = 10, 1.5
    m = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='numpy')
    psi = SimpleMPS.from_product_state(m.site_legs, [0] * L, backend=m.backend)
    eng = DMRGEngine(psi, m, chi_max=24, eps=1e-12, dynamic_svd='randomized')
    E = eng.run(n_sweeps=12)
    assert abs(E - tfi_exact_finite_gs_energy(L, 1., g)) < 1e-7
