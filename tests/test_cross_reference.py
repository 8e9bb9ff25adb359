"""Cross-implementation oracle: compare numerics against the reference library.

Loads the reference cyten (at /root/reference) standalone — its C++ `_core` module
is stubbed — and checks that tensor operations agree to 1e-10 (SURVEY.md §4
carry-over (a)).
"""

import sys
import types

import numpy as np
import pytest

import cyten_tpu as ct


@pytest.fixture(scope='module')
def ref():
    try:
        if 'cyten' not in sys.modules:
            sys.path.insert(0, '/root/reference')
            core = types.ModuleType('cyten._core')
            core.add = lambda i, j: i + j
            core.__all__ = ['add']
            sys.modules['cyten._core'] = core
        import cyten

        return cyten
    except Exception as e:  # pragma: no cover
        pytest.skip(f'reference unavailable: {e}')


def test_topological_data_parity(ref):
    a = np.array([1])
    for mine, theirs in [(ct.su2_symmetry, ref.su2_symmetry),
                         (ct.fibonacci_anyon_category,
                          ref.fibonacci_anyon_category),
                         (ct.ising_anyon_category, ref.ising_anyon_category),
                         (ct.fermion_parity, ref.fermion_parity)]:
        for s in mine.factors[0].all_sectors() if mine.num_sectors < 20 else [a]:
            np.testing.assert_allclose(mine.qdim(s), theirs.qdim(s), atol=1e-12)
            np.testing.assert_allclose(mine.topological_twist(s),
                                       theirs.topological_twist(s), atol=1e-12)
    t = np.array([1])
    np.testing.assert_allclose(
        ct.fibonacci_anyon_category.f_symbol(t, t, t, t, t, t),
        ref.fibonacci_anyon_category.f_symbol(t, t, t, t, t, t), atol=1e-12)
    np.testing.assert_allclose(
        ct.fibonacci_anyon_category.r_symbol(t, t, t),
        ref.fibonacci_anyon_category.r_symbol(t, t, t), atol=1e-12)


@pytest.fixture(scope='module')
def u1_setup(ref):
    rng = np.random.default_rng(42)
    sectors = [[-1], [0], [1]]
    mults = [2, 3, 2]
    leg_m = ct.ElementarySpace(ct.u1_symmetry, sectors, mults)
    leg_r = ref.ElementarySpace(ref.u1_symmetry, sectors, mults)
    be_m = ct.get_backend(ct.u1_symmetry, 'numpy')
    be_r = ref.get_backend(ref.u1_symmetry, 'numpy')
    return rng, leg_m, leg_r, be_m, be_r


def _random_symmetric_dense(rng, leg_m, be_m, n_cod, n_dom):
    t = ct.SymmetricTensor.from_random_normal([leg_m] * n_cod, [leg_m] * n_dom,
                                              backend=be_m, rng=rng)
    return t.to_numpy()


def test_tdot_parity(ref, u1_setup):
    rng, leg_m, leg_r, be_m, be_r = u1_setup
    a = _random_symmetric_dense(rng, leg_m, be_m, 2, 1)
    b = _random_symmetric_dense(rng, leg_m, be_m, 1, 2)
    A_m = ct.SymmetricTensor.from_dense_block(a, [leg_m] * 2, [leg_m],
                                              backend=be_m)
    B_m = ct.SymmetricTensor.from_dense_block(b, [leg_m], [leg_m] * 2,
                                              backend=be_m)
    A_r = ref.SymmetricTensor.from_dense_block(a, [leg_r] * 2, [leg_r],
                                               backend=be_r)
    B_r = ref.SymmetricTensor.from_dense_block(b, [leg_r], [leg_r] * 2,
                                               backend=be_r)
    C_m = ct.tdot(A_m, B_m, [2], [0])
    C_r = ref.tdot(A_r, B_r, [2], [0])
    np.testing.assert_allclose(C_m.to_numpy(), C_r.to_numpy(), atol=1e-10)


def test_svd_parity(ref, u1_setup):
    rng, leg_m, leg_r, be_m, be_r = u1_setup
    a = _random_symmetric_dense(rng, leg_m, be_m, 2, 1)
    A_m = ct.SymmetricTensor.from_dense_block(a, [leg_m] * 2, [leg_m],
                                              backend=be_m)
    A_r = ref.SymmetricTensor.from_dense_block(a, [leg_r] * 2, [leg_r],
                                               backend=be_r)
    _, S_m, _ = ct.svd(A_m)
    _, S_r, _ = ref.svd(A_r)
    np.testing.assert_allclose(np.sort(S_m.diagonal_as_numpy()),
                               np.sort(S_r.diagonal_as_numpy()), atol=1e-10)
    np.testing.assert_allclose(ct.norm(A_m), ref.norm(A_r), atol=1e-12)


def test_permute_parity(ref, u1_setup):
    rng, leg_m, leg_r, be_m, be_r = u1_setup
    a = _random_symmetric_dense(rng, leg_m, be_m, 2, 2)
    A_m = ct.SymmetricTensor.from_dense_block(a, [leg_m] * 2, [leg_m] * 2,
                                              backend=be_m)
    A_r = ref.SymmetricTensor.from_dense_block(a, [leg_r] * 2, [leg_r] * 2,
                                               backend=be_r)
    P_m = ct.permute_legs(A_m, codomain=[0, 3], domain=[1, 2])
    P_r = ref.permute_legs(A_r, codomain=[0, 3], domain=[1, 2])
    np.testing.assert_allclose(P_m.to_numpy(), P_r.to_numpy(), atol=1e-10)


def test_su2_tensor_parity(ref):
    rng = np.random.default_rng(7)
    sectors = [[0], [1], [2]]
    mults = [2, 2, 1]
    leg_m = ct.ElementarySpace(ct.su2_symmetry, sectors, mults)
    leg_r = ref.ElementarySpace(ref.su2_symmetry, sectors, mults)
    be_m = ct.get_backend(ct.su2_symmetry, 'numpy')
    be_r = ref.get_backend(ref.su2_symmetry, 'numpy')
    t = ct.SymmetricTensor.from_random_normal([leg_m, leg_m], [leg_m],
                                              backend=be_m, rng=rng)
    arr = t.to_numpy()
    A_m = ct.SymmetricTensor.from_dense_block(arr, [leg_m] * 2, [leg_m],
                                              backend=be_m)
    A_r = ref.SymmetricTensor.from_dense_block(arr, [leg_r] * 2, [leg_r],
                                               backend=be_r)
    np.testing.assert_allclose(A_m.to_numpy(), A_r.to_numpy(), atol=1e-10)
    np.testing.assert_allclose(ct.norm(A_m), ref.norm(A_r), atol=1e-10)
    B_m = ct.tdot(A_m, ct.dagger(A_m), [2], [0])
    B_r = ref.tdot(A_r, ref.dagger(A_r), [2], [0])
    np.testing.assert_allclose(B_m.to_numpy(), B_r.to_numpy(), atol=1e-10)


def test_qr_eigh_parity(ref, u1_setup):
    rng, leg_m, leg_r, be_m, be_r = u1_setup
    a = _random_symmetric_dense(rng, leg_m, be_m, 2, 1)
    A_m = ct.SymmetricTensor.from_dense_block(a, [leg_m] * 2, [leg_m],
                                              backend=be_m)
    A_r = ref.SymmetricTensor.from_dense_block(a, [leg_r] * 2, [leg_r],
                                               backend=be_r)
    Q_m, R_m = ct.qr(A_m)
    Q_r, R_r = ref.qr(A_r)
    # Q R == A on both sides; gauge may differ, so compare the product
    np.testing.assert_allclose(ct.compose(Q_m, R_m).to_numpy(),
                               ref.compose(Q_r, R_r).to_numpy(), atol=1e-10)
    # hermitian eigenvalues agree
    h = _random_symmetric_dense(rng, leg_m, be_m, 1, 1)
    h = h + h.T.conj()
    # labels needed: the reference's eigh crashes on unlabeled legs (duplicate
    # '(?0)' labels after its internal combine)
    H_m = ct.SymmetricTensor.from_dense_block(h, [leg_m], [leg_m], backend=be_m,
                                              labels=['p', 'p*'])
    H_r = ref.SymmetricTensor.from_dense_block(h, [leg_r], [leg_r], backend=be_r,
                                               labels=['p', 'p*'])
    W_m, V_m = ct.eigh(H_m)
    W_r, V_r = ref.eigh(H_r, ['c', 'c*'], False)
    np.testing.assert_allclose(np.sort(W_m.diagonal_as_numpy()),
                               np.sort(W_r.diagonal_as_numpy()), atol=1e-10)


def test_combine_split_parity(ref, u1_setup):
    rng, leg_m, leg_r, be_m, be_r = u1_setup
    a = _random_symmetric_dense(rng, leg_m, be_m, 2, 2)
    A_m = ct.SymmetricTensor.from_dense_block(a, [leg_m] * 2, [leg_m] * 2,
                                              backend=be_m)
    A_r = ref.SymmetricTensor.from_dense_block(a, [leg_r] * 2, [leg_r] * 2,
                                               backend=be_r)
    C_m = ct.combine_legs(A_m, [0, 1])
    C_r = ref.combine_legs(A_r, [0, 1])
    np.testing.assert_allclose(C_m.to_numpy(), C_r.to_numpy(), atol=1e-10)
    D_m = ct.combine_legs(A_m, [2, 3])
    D_r = ref.combine_legs(A_r, [2, 3])
    np.testing.assert_allclose(D_m.to_numpy(), D_r.to_numpy(), atol=1e-10)


def test_dagger_trace_parity(ref, u1_setup):
    rng, leg_m, leg_r, be_m, be_r = u1_setup
    a = _random_symmetric_dense(rng, leg_m, be_m, 1, 1)
    A_m = ct.SymmetricTensor.from_dense_block(a, [leg_m], [leg_m], backend=be_m)
    A_r = ref.SymmetricTensor.from_dense_block(a, [leg_r], [leg_r], backend=be_r)
    np.testing.assert_allclose(ct.dagger(A_m).to_numpy(),
                               ref.dagger(A_r).to_numpy(), atol=1e-12)
    np.testing.assert_allclose(ct.trace(A_m), ref.trace(A_r), atol=1e-12)
    np.testing.assert_allclose(
        ct.inner(A_m, A_m), ref.inner(A_r, A_r), atol=1e-10)


def test_su2_truncated_svd_parity(ref):
    """Global qdim-weighted truncation decision matches the reference for SU(2)."""
    rng = np.random.default_rng(11)
    sectors = [[0], [1], [2]]
    mults = [3, 3, 2]
    leg_m = ct.ElementarySpace(ct.su2_symmetry, sectors, mults)
    leg_r = ref.ElementarySpace(ref.su2_symmetry, sectors, mults)
    be_m = ct.get_backend(ct.su2_symmetry, 'numpy')
    be_r = ref.get_backend(ref.su2_symmetry, 'numpy')
    t = ct.SymmetricTensor.from_random_normal([leg_m, leg_m], [leg_m],
                                              backend=be_m, rng=rng)
    arr = t.to_numpy()
    A_m = ct.SymmetricTensor.from_dense_block(arr, [leg_m] * 2, [leg_m],
                                              backend=be_m)
    A_r = ref.SymmetricTensor.from_dense_block(arr, [leg_r] * 2, [leg_r],
                                               backend=be_r)
    U_m, S_m, Vh_m, err_m, _ = ct.truncated_svd(A_m, chi_max=4)
    U_r, S_r, Vh_r, err_r, _ = ref.truncated_svd(A_r, chi_max=4)
    np.testing.assert_allclose(np.sort(S_m.diagonal_as_numpy()),
                               np.sort(S_r.diagonal_as_numpy()), atol=1e-10)
    # the reference returns the SQUARED discarded weight as `err` (its docstring
    # says norm(S_discard), but the code never takes the sqrt); we return the
    # documented 2-norm, so compare err_m**2 against the reference value.
    np.testing.assert_allclose(err_m ** 2, err_r, atol=1e-10)
