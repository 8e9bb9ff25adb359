"""Per-factory dense oracles for the coupling library.

Each factory is checked against an independently constructed dense operator
(explicit spin matrices / Jordan-Wigner two-site fermion algebra / clock shift
algebra / Clebsch-Gordan projectors), across the conserve options of the
participating sites. Reference: tests/python_tests/models/test_couplings.py.
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu.models.couplings import (
    chemical_potential, chiral_3spin_coupling, clock_clock_coupling,
    clock_coupling, clock_field, clock_field_coupling,
    density_density_interaction, hopping, onsite_interaction, onsite_pairing,
    pairing, sector_projection_coupling, spin_field_coupling, spin_spin_coupling,
)
from cyten_tpu.models.sites import (
    ClockSite, SpinHalfFermionSite, SpinSite, SpinlessFermionSite,
)


def dense2(coupling):
    """to_tensor().to_numpy() as a (d0*d1, d0*d1) matrix (kron convention)."""
    t = coupling.to_tensor()
    t.test_sanity()
    arr = t.to_numpy()  # legs [p0, p1, p1*, p0*]
    d0, d1 = arr.shape[0], arr.shape[1]
    return arr.transpose(0, 1, 3, 2).reshape(d0 * d1, d0 * d1)


def dense1(coupling):
    t = coupling.to_tensor()
    t.test_sanity()
    return t.to_numpy()


# single-site fermion matrices in the |empty>, |full> basis
_C = np.array([[0., 1.], [0., 0.]])
_JW = np.diag([1., -1.])


def _two_site_fermion_ops():
    """(c1, c2) on the 2-site graded space, JW convention."""
    c1 = np.kron(_C, np.eye(2))
    c2 = np.kron(_JW, _C)
    return c1, c2


@pytest.mark.parametrize('conserve', ['Sz', 'parity', 'None'])
def test_spin_spin_dense(conserve, np_random):
    Sz = np.diag([0.5, -0.5])
    Sp = np.array([[0., 1.], [0., 0.]])
    Sx = 0.5 * (Sp + Sp.T)
    Sy = -0.5j * (Sp - Sp.T)
    if conserve == 'Sz':
        Jx, Jy, Jz = 1.1, 1.1, 0.4   # XXZ conserves Sz
    else:
        Jx, Jy, Jz = 1.1, 0.7, 0.3   # XYZ only conserves parity
    sites = [SpinSite(0.5, conserve)] * 2
    c = spin_spin_coupling(sites, Jx=Jx, Jy=Jy, Jz=Jz)
    h = (Jx * np.kron(Sx, Sx) + Jy * np.kron(Sy, Sy)
         + Jz * np.kron(Sz, Sz))
    assert np.allclose(h.imag, 0)
    np.testing.assert_allclose(dense2(c), h.real, atol=1e-12)


@pytest.mark.parametrize('conserve', ['N', 'parity', 'None'])
def test_hopping_dense(conserve):
    sites = [SpinlessFermionSite(conserve)] * 2
    c = hopping(sites, t=1.3)
    c1, c2 = _two_site_fermion_ops()
    h = -1.3 * (c1.T @ c2 + c2.T @ c1)
    np.testing.assert_allclose(dense2(c), h, atol=1e-12)


@pytest.mark.parametrize('conserve', ['parity', 'None'])
def test_pairing_dense(conserve):
    sites = [SpinlessFermionSite(conserve)] * 2
    c = pairing(sites, D=0.8)
    c1, c2 = _two_site_fermion_ops()
    h = 0.8 * (c1.T @ c2.T + c2 @ c1)
    np.testing.assert_allclose(dense2(c), h, atol=1e-12)


def test_pairing_rejects_number_conservation():
    """A pairing term violates particle number; the factory must refuse to
    encode it as an N-symmetric tensor."""
    sites = [SpinlessFermionSite('N')] * 2
    with pytest.raises(Exception):
        pairing(sites, D=1.)


@pytest.mark.parametrize('conserve', ['N', 'parity', 'None'])
def test_density_density_and_mu_dense(conserve):
    sites = [SpinlessFermionSite(conserve)] * 2
    n = np.diag([0., 1.])
    c = density_density_interaction(sites, V=2.1)
    np.testing.assert_allclose(dense2(c), 2.1 * np.kron(n, n), atol=1e-12)
    cm = chemical_potential(sites[:1], mu=0.7)
    np.testing.assert_allclose(dense1(cm), -0.7 * n, atol=1e-12)


def test_onsite_interaction_spinful_dense():
    s = SpinHalfFermionSite('N', 'Sz')
    c = onsite_interaction([s], U=3.)
    # basis |0>, |up>, |down>, |updown>: Nu*Nd = diag(0,0,0,1)
    np.testing.assert_allclose(dense1(c), 3. * np.diag([0., 0., 0., 1.]),
                               atol=1e-12)


def test_onsite_interaction_bosonic_dense():
    from cyten_tpu.models.sites import SpinlessBosonSite

    s = SpinlessBosonSite(n_max=3, conserve='N')
    c = onsite_interaction([s], U=2.)
    n = np.arange(4.)
    np.testing.assert_allclose(dense1(c), np.diag(n * (n - 1)), atol=1e-12)


def test_onsite_pairing_dense():
    s = SpinHalfFermionSite('parity', 'None')
    c = onsite_pairing([s], D=1.4)
    Cdu, Cddn = s.get_op_numpy('Cdu'), s.get_op_numpy('Cddn')
    Cu, Cdn = s.get_op_numpy('Cu'), s.get_op_numpy('Cdn')
    h = 1.4 * (Cdu @ Cddn + Cdn @ Cu)
    np.testing.assert_allclose(dense1(c), h, atol=1e-12)
    # hermitian by construction
    np.testing.assert_allclose(h, h.conj().T, atol=1e-12)


@pytest.mark.parametrize('species', ['u', 'dn'])
def test_hopping_spinful_species(species):
    """Species-resolved hopping on spin-1/2 fermion sites conserves the other
    species' occupation."""
    sites = [SpinHalfFermionSite('N', 'Sz')] * 2
    c = hopping(sites, t=1., species=species)
    h = dense2(c)
    np.testing.assert_allclose(h, h.conj().T, atol=1e-12)
    # total N of the OTHER species commutes with h
    other = 'Nd' if species == 'u' else 'Nu'
    n1 = sites[0].get_op_numpy(other)
    N_other = np.kron(n1, np.eye(4)) + np.kron(np.eye(4), n1)
    np.testing.assert_allclose(h @ N_other, N_other @ h, atol=1e-12)
    # matrix elements: single-particle hopping amplitude is -t
    # |species on site 2> -> |species on site 1>
    idx = {'u': 1, 'dn': 2}[species]
    e = np.zeros(16)
    e[0 * 4 + idx] = 1.   # site1 empty, site2 occupied
    out = h @ e
    expect = np.zeros(16)
    expect[idx * 4 + 0] = -1.
    np.testing.assert_allclose(out, expect, atol=1e-12)


@pytest.mark.parametrize('q', [3, 4])
def test_clock_coupling_dense(q):
    sites = [ClockSite(q, 'Z')] * 2
    c = clock_coupling(sites, J=1.2)
    Z = np.diag(np.exp(2j * np.pi * np.arange(q) / q))
    h = -1.2 * (np.kron(Z, Z.conj().T) + np.kron(Z.conj().T, Z))
    got = dense2(c)
    np.testing.assert_allclose(got, h, atol=1e-12)


def test_clock_field_dense():
    s = ClockSite(3, 'None')
    c = clock_field([s], g=0.9)
    X = np.roll(np.eye(3), 1, axis=0)  # shift |k> -> |k+1>
    h = -0.9 * (X + X.conj().T)
    got = dense1(c)
    # the site's own X may use the opposite shift convention; h is symmetric
    # under that choice
    np.testing.assert_allclose(got, h, atol=1e-12)


@pytest.mark.parametrize('conserve', ['parity', 'None'])
def test_spin_field_dense(conserve):
    """h . S against explicit Pauli/2 matrices (reference couplings.py:241)."""
    Sz = np.diag([0.5, -0.5])
    Sp = np.array([[0., 1.], [0., 0.]])
    Sx = 0.5 * (Sp + Sp.T)
    Sy = -0.5j * (Sp - Sp.T)
    if conserve == 'parity':
        hx, hy, hz = 0., 0., 1.3   # parity allows Sz only... actually Sz is fine
        c = spin_field_coupling([SpinSite(0.5, conserve)], hz=hz)
        h = hz * Sz
    else:
        hx, hy, hz = 0.6, 0.4, 1.3
        c = spin_field_coupling([SpinSite(0.5, conserve)], hx=hx, hy=hy, hz=hz)
        h = hx * Sx + hy * Sy + hz * Sz
    got = dense1(c)
    np.testing.assert_allclose(got, h, atol=1e-12)


def test_spin_field_rejects_Sz_conservation_with_transverse():
    with pytest.raises(Exception):
        spin_field_coupling([SpinSite(0.5, 'Sz')], hx=1.)


@pytest.mark.parametrize('q', [3, 4])
def test_clock_clock_coupling_dense(q):
    """Jx X Xdag + Jz Z Zdag + h.c. (reference couplings.py:585; note the
    opposite sign convention from our ferromagnetic clock_coupling)."""
    s = ClockSite(q, 'Z')
    Z = np.diag(np.exp(2j * np.pi * np.arange(q) / q))
    c = clock_coupling([s] * 2, J=1.0)
    cc = clock_clock_coupling([s] * 2, Jz=1.0)
    np.testing.assert_allclose(dense2(cc), -dense2(c), atol=1e-12)
    # Jx term needs X, which breaks Z-charge conservation
    s0 = ClockSite(q, 'None')
    X = s0.get_op_numpy('X')
    ccx = clock_clock_coupling([s0] * 2, Jx=0.7, Jz=0.3)
    h = (0.7 * (np.kron(X, X.conj().T) + np.kron(X.conj().T, X))).astype(complex)
    h += 0.3 * (np.kron(Z, Z.conj().T) + np.kron(Z.conj().T, Z))
    np.testing.assert_allclose(dense2(ccx), h, atol=1e-12)


def test_clock_field_coupling_dense():
    """hx (X + Xdag) + hz (Z + Zdag) (reference couplings.py:611)."""
    s = ClockSite(3, 'None')
    X = s.get_op_numpy('X')
    Z = s.get_op_numpy('Z')
    c = clock_field_coupling([s], hx=0.9, hz=0.4)
    h = 0.9 * (X + X.conj().T) + 0.4 * (Z + Z.conj().T)
    assert np.allclose(h.imag, 0)
    np.testing.assert_allclose(dense1(c), h.real, atol=1e-12)
    # reference-convention relation to our clock_field: hz=0 term is -g-scaled
    cf = clock_field([s], g=0.9)
    np.testing.assert_allclose(dense1(clock_field_coupling([s], hx=0.9)),
                               -dense1(cf), atol=1e-12)


def test_clock_field_rejects_Z_conservation():
    with pytest.raises(Exception):
        clock_field([ClockSite(3, 'Z')], g=1.)


def test_sector_projection_su2():
    """J * P_{S=2} on two spin-1 sites: CG-projector oracle."""
    sites = [SpinSite(1, 'SU(2)')] * 2
    J = 1.7
    c = sector_projection_coupling(sites, J=J, sector=[4])  # 2*S = 4
    got = dense2(c)
    X = ct.su2_symmetry.fusion_tensor(np.array([2]), np.array([2]),
                                      np.array([4]))[0]  # [m1, m2, M]
    P = np.tensordot(X, X.conj(), ([2], [2])).reshape(9, 9)
    np.testing.assert_allclose(got, J * P, atol=1e-10)
    # projector spectrum
    vals = np.linalg.eigvalsh(got)
    assert np.allclose(sorted(vals)[-5:], J, atol=1e-10)
    assert np.allclose(sorted(vals)[:4], 0, atol=1e-10)


def test_chiral_3spin_properties():
    """Hermitian, traceless, odd under site transposition, Sz-conserving."""
    sites = [SpinSite(0.5, 'Sz')] * 3
    c = chiral_3spin_coupling(sites, J=1.)
    t = c.to_tensor()
    t.test_sanity()
    arr = t.to_numpy()  # [p0 p1 p2 p2* p1* p0*]
    h = arr.transpose(0, 1, 2, 5, 4, 3).reshape(8, 8)
    np.testing.assert_allclose(h, h.conj().T, atol=1e-12)
    assert abs(np.trace(h)) < 1e-12
    Sz = np.diag([0.5, -0.5])
    Sztot = sum(np.kron(np.kron(*(
        [Sz if k == i else np.eye(2) for k in range(2)])),
        Sz if i == 2 else np.eye(2)) for i in range(3))
    np.testing.assert_allclose(h @ Sztot, Sztot @ h, atol=1e-12)
