"""iDMRG (McCulloch infinite-size DMRG) vs exact thermodynamic-limit energies."""

import numpy as np
import pytest

from cyten_tpu.algorithms import SimpleMPS
from cyten_tpu.algorithms.idmrg import iDMRGEngine
from cyten_tpu.algorithms.models import (
    HeisenbergModel, TFIModel, tfi_exact_infinite_gs_energy,
)


def test_idmrg_tfi_gapped():
    """Gapped TFI: iDMRG converges to the exact free-fermion energy density."""
    model = TFIModel(L=2, J=1.0, g=1.5, conserve='parity',
                     block_backend='numpy', bc='infinite')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                       backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi, model, chi_max=32, eps=1e-12)
    e = eng.run(n_steps=150, tol=1e-12)
    e_exact = tfi_exact_infinite_gs_energy(1.0, 1.5)
    assert abs(e - e_exact) < 1e-9
    # the converged center wavefunction is canonical: its bond expectation
    # value gives the same energy density
    assert abs(eng.bond_energy() - e_exact) < 1e-5
    # converged unit cell is exposed as an infinite MPS
    out = eng.psi
    assert out.bc == 'infinite'
    assert abs(model.energy(out) - e_exact) < 1e-4


def test_idmrg_exact_energy_formula():
    assert abs(tfi_exact_infinite_gs_energy(1.0, 1.0) - (-4 / np.pi)) < 1e-12
    assert abs(tfi_exact_infinite_gs_energy(1.0, 0.0) - (-1.0)) < 1e-12
    assert abs(tfi_exact_infinite_gs_energy(0.0, 2.5) - (-2.5)) < 1e-12


@pytest.mark.slow
def test_idmrg_heisenberg_critical():
    """Critical Heisenberg chain vs Bethe ansatz e = 1/4 - ln 2 (truncation-
    limited accuracy at chi=48)."""
    model = HeisenbergModel(L=2, conserve='Sz', block_backend='numpy',
                            bc='infinite')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1],
                                       backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi, model, chi_max=32, eps=1e-12)
    e = eng.run(n_steps=150, tol=1e-11)
    assert abs(e - model.exact_infinite_gs_energy()) < 5e-5


def test_infinite_product_state_charge_check():
    model = HeisenbergModel(L=2, conserve='Sz', block_backend='numpy',
                            bc='infinite')
    with pytest.raises(ValueError, match='trivial charge'):
        SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                     backend=model.backend, bc='infinite')


@pytest.mark.slow
def test_idmrg_su2_nonabelian():
    """Non-abelian (SU(2) fusion-tree backend) iDMRG on the infinite Heisenberg
    chain converges to the Bethe-ansatz density (truncation-limited)."""
    model = HeisenbergModel(L=2, conserve='SU(2)', block_backend='numpy',
                            bc='infinite')
    psi = SimpleMPS.from_singlet_pairs(model.site_legs[0], 2,
                                       backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi, model, chi_max=16, eps=1e-10)
    e = eng.run(n_steps=80, tol=1e-9)
    assert abs(e - model.exact_infinite_gs_energy()) < 3e-4


def test_correlation_length():
    """Transfer-matrix correlation length of the infinite TFI vs the exact
    xi = 1/ln(g) (disordered phase; chi-limited accuracy)."""
    for g, tol in ((1.5, 0.05), (2.0, 0.04)):
        model = TFIModel(L=2, J=1.0, g=g, conserve='parity',
                         block_backend='numpy', bc='infinite')
        psi = SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                           backend=model.backend, bc='infinite')
        eng = iDMRGEngine(psi, model, chi_max=24, eps=1e-12)
        eng.run(n_steps=200, tol=1e-13)
        xi = eng.psi.correlation_length()
        xi_exact = 1.0 / np.log(g)
        assert abs(xi - xi_exact) / xi_exact < tol, (g, xi, xi_exact)


def test_canonicalize_infinite():
    """Window canonicalization restores exact B form of the iDMRG unit cell;
    bond energies then agree with the exact density to machine precision."""
    from cyten_tpu.tensors import SymmetricTensor, dagger, norm, tdot

    g = 2.0
    model = TFIModel(L=2, J=1.0, g=g, conserve='parity', block_backend='numpy',
                     bc='infinite')
    psi0 = SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                        backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi0, model, chi_max=24, eps=1e-12)
    eng.run(n_steps=200, tol=1e-13)
    psi = eng.psi
    psi.canonicalize_infinite(n_cells=16)
    for B in psi.Bs:
        E = tdot(B, dagger(B), ['p', 'vR'], ['p*', 'vR*'])
        eye = SymmetricTensor.from_eye([B.get_leg_co_domain('vL')],
                                       backend=B.backend, labels=E.labels)
        assert float(norm(E + (-1.) * eye)) < 1e-10
    e = model.energy(psi)
    assert abs(e - tfi_exact_infinite_gs_energy(1.0, g)) < 1e-10


def test_canonicalize_infinite_fixed_point():
    """Transfer-matrix fixed-point canonicalization (the default): restores
    exact B form after an arbitrary invertible gauge scrambling of the cell,
    with unchanged physics (gauge invariance of the state)."""
    from cyten_tpu.tensors import (
        SymmetricTensor, dagger, eye, norm, permute_legs, tdot,
    )

    g = 1.5
    model = TFIModel(L=2, J=1.0, g=g, conserve='parity', block_backend='numpy',
                     bc='infinite')
    psi0 = SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                        backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi0, model, chi_max=16, eps=1e-12)
    eng.run(n_steps=200, tol=1e-12)
    psi = eng.psi
    psi.canonicalize_infinite()   # default method: fixed_point

    def iso_errs(p):
        errs = []
        for B in p.Bs:
            E = tdot(B, dagger(B), ['p', 'vR'], ['p*', 'vR*'])
            ey = eye([B.get_leg_co_domain('vL')], backend=B.backend,
                     labels=['vL', 'vL*'], dtype=B.dtype).as_SymmetricTensor()
            errs.append(float(norm(E + (-1.) * ey)))
        return errs

    assert max(iso_errs(psi)) < 1e-12
    e_exact = tfi_exact_infinite_gs_energy(1.0, g)
    assert abs(model.energy(psi) - e_exact) < 1e-10

    # scramble the gauge on every bond with a random invertible (symmetric)
    # matrix -- the physical state is invariant, the canonical form is ruined.
    # Clip the gauge's singular values to [1/3, 3]: float64 representation
    # roundoff is amplified by cond(G) (measured: cond=1764 scramble -> 3.7e-10
    # energy error; cond<=10 -> ~1e-12), and we want the strict 1e-10 assertion
    # to test the ALGORITHM, not roundoff amplification.
    rng = np.random.default_rng(42)
    backend = model.backend
    L = psi.L
    Gs, Ginvs = [], []
    for i in range(L):
        bond = psi.Bs[i].get_leg_co_domain('vL')
        ey = eye([bond], backend=backend, labels=['vL', 'vR'],
                 dtype=psi.Bs[i].dtype).as_SymmetricTensor()
        D = int(bond.dim)
        M = np.eye(D) + 0.3 * rng.standard_normal((D, D))
        # project to the symmetric (block-diagonal) subspace FIRST, then clip
        # the projected matrix's singular values -- clipping before projection
        # leaves the projected gauge ill-conditioned again
        G = SymmetricTensor.from_dense_block(M, ey.codomain, ey.domain,
                                             backend, ey.labels, tol=None)
        u_, s_, vt_ = np.linalg.svd(np.asarray(G.to_numpy()))
        M = u_ @ np.diag(np.clip(s_, 1. / 3., 3.)) @ vt_
        G = SymmetricTensor.from_dense_block(M, ey.codomain, ey.domain,
                                             backend, ey.labels, tol=None)
        Ginvs.append(SymmetricTensor.from_dense_block(
            np.linalg.inv(np.asarray(G.to_numpy())), ey.codomain, ey.domain,
            backend, ey.labels, tol=None))
        Gs.append(G)
    newBs = []
    for i in range(L):
        B = tdot(Gs[i], psi.Bs[i], 'vR', 'vL')
        B = tdot(B, Ginvs[(i + 1) % L], 'vR', 'vL')
        newBs.append(permute_legs(B, codomain=['vL', 'p'], domain=['vR']))
    psi_g = SimpleMPS(newBs, list(psi.Ss), bc='infinite')
    assert max(iso_errs(psi_g)) > 0.1   # thoroughly scrambled

    psi_g.canonicalize_infinite()
    assert max(iso_errs(psi_g)) < 1e-12
    for i in range(L):
        e_ref = complex(psi.bond_expectation_value(model.H_bonds[i], i)).real
        e_new = complex(psi_g.bond_expectation_value(model.H_bonds[i], i)).real
        assert abs(e_ref - e_new) < 1e-10
    # Schmidt spectra agree (up to dead directions)
    for a, b in zip(psi.Ss, psi_g.Ss):
        va = np.sort(np.asarray(a.diagonal_as_numpy()
                                if hasattr(a, 'diagonal_as_numpy') else
                                np.diag(a.as_SymmetricTensor().to_numpy())))
        vb = np.sort(np.asarray(np.diag(b.as_SymmetricTensor().to_numpy())))
        n = min(len(va), len(vb))
        assert np.allclose(va[-n:], vb[-n:], atol=1e-6)


@pytest.mark.slow
def test_itebd_ground_state():
    """iTEBD (imaginary time, dt schedule, window re-canonicalization) reaches
    the exact infinite TFI energy density."""
    from cyten_tpu.algorithms.tebd import TEBDEngine

    g = 1.5
    model = TFIModel(L=2, J=1.0, g=g, conserve='parity', block_backend='numpy',
                     bc='infinite')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                       backend=model.backend, bc='infinite')
    for dt, n in [(0.1, 100), (0.02, 200), (0.005, 300)]:
        eng = TEBDEngine(psi, model, dt=dt, chi_max=24, imaginary=True,
                         canonicalize_every=5)
        eng.run(n)
    assert abs(eng.energy() - tfi_exact_infinite_gs_energy(1.0, g)) < 1e-8


def test_multicell_idmrg_uniform_heisenberg():
    """L=4 unit cell on the uniform Heisenberg chain: agrees with the 2-site
    engine / Bethe energy at the chi-limited level, with a STABLE fixed point
    (the QR-absorbed environments; pinv gauge-stripping destabilized it)."""
    from cyten_tpu.algorithms.idmrg import MultiCellIDMRGEngine

    m4 = HeisenbergModel(L=4, conserve='Sz', bc='infinite',
                         block_backend='numpy')
    psi4 = SimpleMPS.from_product_state(m4.site_legs, [0, 1, 0, 1],
                                        backend=m4.backend, bc='infinite')
    eng = MultiCellIDMRGEngine(psi4, m4, chi_max=16, eps=1e-12)
    e = eng.run(n_steps=20, tol=1e-9)
    assert abs(e - (0.25 - np.log(2))) < 2e-4  # chi-limited accuracy
    # converged unit cell: 4 sites, valid B form
    psi = eng.psi
    assert psi.L == 4
    psi.Bs[0].test_sanity()


@pytest.mark.slow
def test_multicell_idmrg_mesh_option():
    """MultiCellIDMRGEngine(mesh=...) shards window/environment bond axes over
    the virtual 8-device mesh; energies match the unsharded engine exactly."""
    from cyten_tpu.algorithms.idmrg import MultiCellIDMRGEngine
    from cyten_tpu.parallel import make_mesh

    m4 = HeisenbergModel(L=2, conserve='Sz', bc='infinite',
                         block_backend='jax')
    kw = dict(chi_max=8, eps=1e-12, n_inner_sweeps=1)
    psi_a = SimpleMPS.from_product_state(m4.site_legs, [0, 1],
                                         backend=m4.backend, bc='infinite')
    psi_b = SimpleMPS.from_product_state(m4.site_legs, [0, 1],
                                         backend=m4.backend, bc='infinite')
    eng_plain = MultiCellIDMRGEngine(psi_a, m4, **kw)
    eng_mesh = MultiCellIDMRGEngine(psi_b, m4, mesh=make_mesh(8), **kw)
    e_plain = eng_plain.run(n_steps=2, tol=0.)
    e_mesh = eng_mesh.run(n_steps=2, tol=0.)
    assert abs(e_plain - e_mesh) < 1e-10


def test_multicell_idmrg_dimerized_xx():
    """Genuinely period-2 Hamiltonian: dimerized XX chain vs the exact
    free-fermion energy density (two-band integral)."""
    import scipy.integrate

    from cyten_tpu.algorithms.idmrg import MultiCellIDMRGEngine
    from cyten_tpu.algorithms.models import _factorize_bond, spin_half_site
    from cyten_tpu.tensors import SymmetricTensor, tensor_from_grid

    J1, J2 = 1.0, 0.6
    p = spin_half_site('Sz')
    be = None
    Sp = np.array([[0., 1.], [0., 0.]])
    Sm = Sp.T

    def xx_bond(J):
        h = J / 2. * (np.kron(Sp, Sm) + np.kron(Sm, Sp))
        block = h.reshape(2, 2, 2, 2).transpose(0, 1, 3, 2)
        import cyten_tpu as ct

        backend = ct.get_backend(p.symmetry, 'numpy')
        return SymmetricTensor.from_dense_block(
            block, [p, p], [p, p], backend=backend,
            labels=['p0', 'p1', 'p1*', 'p0*'])

    h1, h2 = xx_bond(J1), xx_bond(J2)
    A1, B1, Id = _factorize_bond(h1, 1e-12)
    A2, B2, _ = _factorize_bond(h2, 1e-12)

    def W(A, B):
        return tensor_from_grid([[Id, A, None], [None, None, B],
                                 [None, None, Id]],
                                labels=['wL', 'p', 'wR', 'p*'],
                                row_leg='wL', col_leg='wR')

    class Dimerized:
        bc = 'infinite'
        # site 0's right bond is J1, site 1's right bond is J2 (wrap)
        H_mpo = [W(A1, B2), W(A2, B1)]

    import cyten_tpu as ct

    backend = ct.get_backend(p.symmetry, 'numpy')
    psi = SimpleMPS.from_product_state([p, p], [0, 1], backend=backend,
                                       bc='infinite')
    eng = MultiCellIDMRGEngine(psi, Dimerized(), chi_max=32, eps=1e-12)
    e = eng.run(n_steps=60, tol=1e-10)
    t1, t2 = J1 / 2., J2 / 2.
    e_exact = -scipy.integrate.quad(
        lambda k: abs(t1 + t2 * np.exp(1j * k)), -np.pi, np.pi)[0] \
        / (2 * np.pi) / 2.
    assert abs(e - e_exact) < 1e-6, (e, e_exact)  # gapped: chi=32 plenty
