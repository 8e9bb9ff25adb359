"""Concrete-site batteries: operator availability per conserve, operator
algebra identities, state labels, charged-operator structure.

Reference: tests/python_tests/models/test_site.py — operator availability
*depends on* the conserved symmetry (SURVEY Appendix A.12); the algebra
identities pin the matrix conventions independently of any coupling.
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import ChargedTensor
from cyten_tpu.models.sites import (
    ClockSite, SpinHalfFermionSite, SpinHalfSite, SpinSite, SpinlessBosonSite,
    SpinlessFermionSite,
)


@pytest.mark.parametrize('S', [0.5, 1, 1.5])
@pytest.mark.parametrize('conserve', ['SU(2)', 'Sz', 'parity', 'None'])
def test_spin_site(S, conserve):
    site = SpinSite(S, conserve)
    d = int(round(2 * S + 1))
    assert int(site.leg.dim) == d
    # operator availability per conserve (reference sites.py:76-115 pattern)
    expect_ops = {'SU(2)': set(), 'Sz': {'Sz', 'Sz2', 'Sp', 'Sm'},
                  'parity': {'Sz', 'Sz2', 'Sp', 'Sm', 'Sx'},
                  'None': {'Sz', 'Sz2', 'Sp', 'Sm', 'Sx', 'Sy'}}[conserve]
    assert expect_ops <= set(site.ops)
    assert 'Id' in site.ops
    if conserve != 'None':
        assert 'Sy' not in site.ops or conserve == 'None'
    if conserve in ('SU(2)',):
        return  # no non-scalar ops to check
    # algebra: [Sp, Sm] = 2 Sz, [Sz, Sp] = Sp, Sp = (Sm)^dagger
    Sp = site.get_op_numpy('Sp')
    Sm = site.get_op_numpy('Sm')
    Sz = site.get_op_numpy('Sz')
    np.testing.assert_allclose(Sp @ Sm - Sm @ Sp, 2 * Sz, atol=1e-12)
    np.testing.assert_allclose(Sz @ Sp - Sp @ Sz, Sp, atol=1e-12)
    np.testing.assert_allclose(Sp, Sm.conj().T, atol=1e-12)
    # Casimir: Sz^2 + (SpSm + SmSp)/2 = S(S+1)
    cas = Sz @ Sz + 0.5 * (Sp @ Sm + Sm @ Sp)
    np.testing.assert_allclose(cas, S * (S + 1) * np.eye(d), atol=1e-12)
    # under Sz conservation, Sp is a ChargedTensor with charge +2 (units 2*Sz)
    if conserve == 'Sz':
        op = site.get_op('Sp')
        assert isinstance(op, ChargedTensor)
    if d == 2:
        assert site.state_index('up') == 0
        assert site.state_index('down') == 1


@pytest.mark.parametrize('conserve', ['N', 'parity', 'None'])
def test_spinless_fermion_site(conserve):
    site = SpinlessFermionSite(conserve)
    assert int(site.leg.dim) == 2
    C = site.get_op_numpy('C')
    Cd = site.get_op_numpy('Cd')
    N = site.get_op_numpy('N')
    JW = site.get_op_numpy('JW')
    # canonical anticommutation on one site + JW properties
    np.testing.assert_allclose(C @ Cd + Cd @ C, np.eye(2), atol=1e-14)
    np.testing.assert_allclose(C @ C, 0, atol=1e-14)
    np.testing.assert_allclose(Cd @ C, N, atol=1e-14)
    np.testing.assert_allclose(JW @ JW, np.eye(2), atol=1e-14)
    np.testing.assert_allclose(JW, np.eye(2) - 2 * N, atol=1e-14)
    # JW anticommutes with C
    np.testing.assert_allclose(JW @ C + C @ JW, 0, atol=1e-14)
    assert site.state_index('empty') == 0
    assert site.state_index('full') == 1
    # graded symmetry carries the statistics for 'N'/'parity'
    if conserve in ('N', 'parity'):
        assert site.symmetry.braiding_style == ct.symmetries.BraidingStyle.fermionic


@pytest.mark.parametrize('conserve_N', ['N', 'parity', 'None'])
@pytest.mark.parametrize('conserve_S', ['Sz', 'None'])
def test_spin_half_fermion_site(conserve_N, conserve_S):
    site = SpinHalfFermionSite(conserve_N, conserve_S)
    assert int(site.leg.dim) == 4
    Cu, Cdu = site.get_op_numpy('Cu'), site.get_op_numpy('Cdu')
    Cdn, Cddn = site.get_op_numpy('Cdn'), site.get_op_numpy('Cddn')
    JW = site.get_op_numpy('JW')
    # intra-site anticommutation (species JW included in the matrices)
    np.testing.assert_allclose(Cu @ Cdu + Cdu @ Cu, np.eye(4), atol=1e-14)
    np.testing.assert_allclose(Cdn @ Cddn + Cddn @ Cdn, np.eye(4), atol=1e-14)
    np.testing.assert_allclose(Cu @ Cdn + Cdn @ Cu, 0, atol=1e-14)
    np.testing.assert_allclose(Cu @ Cddn + Cddn @ Cu, 0, atol=1e-14)
    # number operators and JW
    Nu, Nd = site.get_op_numpy('Nu'), site.get_op_numpy('Nd')
    np.testing.assert_allclose(Cdu @ Cu, Nu, atol=1e-14)
    np.testing.assert_allclose(Cddn @ Cdn, Nd, atol=1e-14)
    np.testing.assert_allclose(JW, np.diag([1., -1., -1., 1.]), atol=1e-14)
    # Sz and ladder
    Sz = site.get_op_numpy('Sz')
    np.testing.assert_allclose(Sz, 0.5 * (Nu - Nd), atol=1e-14)
    Sp = site.get_op_numpy('Sp')
    np.testing.assert_allclose(Sp, Cdu @ Cdn, atol=1e-14)
    for lbl, idx in [('empty', 0), ('up', 1), ('down', 2), ('full', 3)]:
        assert site.state_index(lbl) == idx


@pytest.mark.parametrize('conserve', ['N', 'parity', 'None'])
def test_spinless_boson_site(conserve):
    site = SpinlessBosonSite(n_max=4, conserve=conserve)
    d = int(site.leg.dim)
    assert d == 5
    B = site.get_op_numpy('B')
    Bd = site.get_op_numpy('Bd')
    N = site.get_op_numpy('N')
    np.testing.assert_allclose(Bd @ B, N, atol=1e-12)
    # truncated commutation: [B, Bd] = 1 - (n_max+1) |n_max><n_max|
    comm = B @ Bd - Bd @ B
    expect = np.eye(d)
    expect[-1, -1] = -4
    np.testing.assert_allclose(comm, expect, atol=1e-12)
    np.testing.assert_allclose(B, Bd.conj().T, atol=1e-12)


@pytest.mark.parametrize('q', [2, 3, 5])
@pytest.mark.parametrize('conserve', ['Z', 'None'])
def test_clock_site(q, conserve):
    site = ClockSite(q, conserve)
    assert int(site.leg.dim) == q
    Z = site.get_op_numpy('Z')
    X = site.get_op_numpy('X')
    # clock algebra: Z^q = X^q = 1, Z X = omega X Z
    Zq = np.linalg.matrix_power(Z, q)
    Xq = np.linalg.matrix_power(X, q)
    np.testing.assert_allclose(Zq, np.eye(q), atol=1e-12)
    np.testing.assert_allclose(Xq, np.eye(q), atol=1e-12)
    omega = np.exp(2j * np.pi / q)
    scale = (Z @ X) / np.where(np.abs(X @ Z) > 1e-12, X @ Z, 1.)
    vals = scale[np.abs(X @ Z) > 1e-12]
    assert np.allclose(vals, omega) or np.allclose(vals, omega.conjugate())
    # Zhc is the dagger
    np.testing.assert_allclose(site.get_op_numpy('Zhc'), Z.conj().T, atol=1e-12)


def test_operator_symmetric_encoding(np_random):
    """Every stored operator round-trips through its symmetric encoding."""
    sites = [SpinSite(1, 'Sz'), SpinlessFermionSite('N'),
             SpinHalfFermionSite('N', 'Sz'), ClockSite(3, 'Z')]
    for site in sites:
        for name, op in list(site.ops.items()):
            arr = site.get_op_numpy(name)
            assert arr.shape == (int(site.leg.dim),) * 2, (site, name)
            op2 = site.add_operator(f'_roundtrip_{name}', arr)
            np.testing.assert_allclose(
                op2.to_numpy(), arr, atol=1e-10,
                err_msg=f'{type(site).__name__}.{name}')
