"""Single-site TDVP (projector-splitting integrator) vs exact evolution."""

import functools

import numpy as np

from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
from cyten_tpu.algorithms.models import TFIModel
from cyten_tpu.algorithms.tdvp import TDVPEngine
from cyten_tpu.tensors import tdot


def _full_state(psi):
    s = psi.get_theta1(0)
    for i in range(1, psi.L):
        s = tdot(s, psi.Bs[i].relabelled({'p': f'p{i}'}), 'vR', 'vL')
    return np.asarray(s.to_dense_block()).reshape(-1)


def _dense_tfi(L, g):
    sx = np.array([[0., 1.], [1., 0.]])
    sz = np.diag([1., -1.])

    def op(o, i):
        mats = [np.eye(2)] * L
        mats[i] = o
        return functools.reduce(np.kron, mats)

    return sum(-op(sx, i) @ op(sx, i + 1) for i in range(L - 1)) \
        + sum(-g * op(sz, i) for i in range(L))


def test_tdvp_real_time_exact():
    """At full bond dimension, 1-TDVP reproduces the exact unitary evolution
    (the projector splitting is exact when nothing is projected) and conserves
    energy and norm to Lanczos tolerance."""
    import scipy.linalg

    L, g = 6, 1.5
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='numpy')
    model0 = TFIModel(L=L, J=1., g=3.0, conserve='parity',
                      block_backend='numpy')
    psi = SimpleMPS.from_product_state(model0.site_legs, [0] * L,
                                       backend=model0.backend)
    DMRGEngine(psi, model0, chi_max=8, eps=1e-14).run(n_sweeps=8)
    arr = _full_state(psi)
    arr /= np.linalg.norm(arr)
    dt, n_steps = 0.05, 40
    eng = TDVPEngine(psi, model, dt=dt, imaginary=False)
    E0 = eng.energy()
    eng.run(n_steps)
    assert abs(eng.energy() - E0) < 1e-10            # symplectic: E conserved
    arr_t = scipy.linalg.expm(-1j * _dense_tfi(L, g) * dt * n_steps) @ arr
    arr_tdvp = _full_state(psi)
    assert abs(np.linalg.norm(arr_tdvp) - 1.) < 1e-10  # norm conserved
    assert abs(abs(np.vdot(arr_t, arr_tdvp)) - 1.) < 1e-8


def test_tdvp_truncated_conserves_energy():
    """At fixed chi below full rank, TDVP still conserves energy and norm."""
    L, g = 8, 1.2
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='numpy')
    model0 = TFIModel(L=L, J=1., g=2.5, conserve='parity',
                      block_backend='numpy')
    psi = SimpleMPS.from_product_state(model0.site_legs, [0] * L,
                                       backend=model0.backend)
    DMRGEngine(psi, model0, chi_max=6, eps=1e-14).run(n_sweeps=6)
    eng = TDVPEngine(psi, model, dt=0.05, imaginary=False)
    E0 = eng.energy()
    eng.run(30)
    assert abs(eng.energy() - E0) < 1e-8
    assert abs(psi.norm_squared() - 1.) < 1e-8


def test_tdvp_imaginary_time():
    """Imaginary-time TDVP projects onto the ground state (fixed chi)."""
    L, g = 8, 1.5
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='numpy')
    model0 = TFIModel(L=L, J=1., g=2.0, conserve='parity',
                      block_backend='numpy')
    psi = SimpleMPS.from_product_state(model0.site_legs, [0] * L,
                                       backend=model0.backend)
    DMRGEngine(psi, model0, chi_max=16, eps=1e-14).run(n_sweeps=6)
    eng = TDVPEngine(psi, model, dt=0.1, imaginary=True)
    eng.run(60)
    E_exact = model.exact_finite_gs_energy()
    assert abs(eng.energy() - E_exact) < 1e-8


def test_tdvp2_grows_chi_from_product_state():
    """Two-site TDVP grows the bond dimension during evolution (1-site TDVP
    cannot); from a chi=1 product state it reproduces exact evolution."""
    import scipy.linalg

    L, g = 6, 1.2
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    arr0 = _full_state(psi)
    arr0 /= np.linalg.norm(arr0)
    from cyten_tpu.algorithms.tdvp import TDVP2Engine
    dt, n_steps = 0.02, 50
    eng = TDVP2Engine(psi, model, dt=dt, chi_max=8, eps=1e-12)
    eng.run(n_steps)
    assert psi.max_chi() == 8  # grew from 1 to full rank
    arr_t = scipy.linalg.expm(-1j * _dense_tfi(L, g) * dt * n_steps) @ arr0
    arr = _full_state(psi)
    assert abs(abs(np.vdot(arr_t, arr)) - 1.) < 1e-8
    assert abs(np.linalg.norm(arr) - 1.) < 1e-8


def test_tdvp_qr_matches_svd_engine():
    """QR-split TDVP (TDVPQREngine, no SVDs in the evolution) reproduces the
    SVD-based engine's real-time evolution and refreshes correct Schmidt
    values (docs/DESIGN.md §8: QR is 30-60x cheaper than SVD on TPU)."""
    import scipy.linalg

    from cyten_tpu.algorithms.tdvp import TDVPQREngine

    L, g = 6, 1.5
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='numpy')
    model0 = TFIModel(L=L, J=1., g=3.0, conserve='parity',
                      block_backend='numpy')

    def prepared():
        psi = SimpleMPS.from_product_state(model0.site_legs, [0] * L,
                                           backend=model0.backend)
        DMRGEngine(psi, model0, chi_max=8, eps=1e-14).run(n_sweeps=8)
        return psi

    dt, n_steps = 0.05, 10
    psi_svd = prepared()
    psi_qr = prepared()
    TDVPEngine(psi_svd, model, dt=dt, imaginary=False).run(n_steps)
    eng_qr = TDVPQREngine(psi_qr, model, dt=dt, imaginary=False)
    eng_qr.run(n_steps)
    v1 = _full_state(psi_svd)
    v2 = _full_state(psi_qr)
    overlap = abs(np.vdot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2)))
    assert abs(overlap - 1) < 1e-8, overlap
    # refreshed Schmidt values agree with the SVD engine's
    for i in range(1, L):
        s1 = np.sort(np.concatenate([np.asarray(b)
                                     for b in psi_svd.Ss[i].data.blocks]))
        s2 = np.sort(np.concatenate([np.asarray(b)
                                     for b in psi_qr.Ss[i].data.blocks]))
        np.testing.assert_allclose(s1, s2, atol=1e-8)
    # energy conserved
    assert abs(eng_qr.energy() - TDVPEngine(prepared(), model, dt=dt,
                                            imaginary=False).energy()) < 1e-6


def test_tdvp_qr_fused():
    """The fused per-site jitted QR-TDVP path (jax blocks) matches the
    host-driven QR path."""
    from cyten_tpu.algorithms.tdvp import TDVPQREngine

    L, g = 5, 1.2
    model = TFIModel(L=L, J=1., g=g, conserve='parity', block_backend='jax')
    model0 = TFIModel(L=L, J=1., g=2.5, conserve='parity',
                      block_backend='jax')

    def prepared():
        psi = SimpleMPS.from_product_state(model0.site_legs, [0] * L,
                                           backend=model0.backend)
        DMRGEngine(psi, model0, chi_max=4, eps=1e-14).run(n_sweeps=6)
        return psi

    dt, n_steps = 0.05, 4
    psi_a = prepared()
    psi_b = prepared()
    TDVPQREngine(psi_a, model, dt=dt, imaginary=False,
                 lanczos_options={'N_max': 10}).run(n_steps)
    TDVPQREngine(psi_b, model, dt=dt, imaginary=False, fused=True,
                 lanczos_options={'N_max': 10}).run(n_steps)
    v1 = _full_state(psi_a)
    v2 = _full_state(psi_b)
    overlap = abs(np.vdot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2)))
    assert abs(overlap - 1) < 1e-8, overlap
