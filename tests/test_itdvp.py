"""iTDVP (infinite single-site TDVP with MPO fixed-point environments)."""

import numpy as np
import pytest

from cyten_tpu.algorithms import SimpleMPS, TEBDEngine, iDMRGEngine, iTDVPEngine
from cyten_tpu.algorithms.models import TFIModel, tfi_exact_infinite_gs_energy
from cyten_tpu.tensors import SymmetricTensor, dagger, norm, tdot


def _tfi_ground_state(g=1.5, chi=24):
    model = TFIModel(L=2, J=1.0, g=g, conserve='parity', block_backend='numpy',
                     bc='infinite')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                       backend=model.backend, bc='infinite')
    eng = iDMRGEngine(psi, model, chi_max=chi, eps=1e-14)
    eng.run(n_steps=150, tol=1e-13)
    psi = eng.psi
    psi.canonicalize_infinite(n_cells=20)
    return model, psi


def test_itdvp_imaginary_time_holds_ground_state():
    """Imaginary-time iTDVP on the exact TFI ground state stays there (the
    fixed-point environments and the gauge reconstruction are consistent)."""
    model, psi = _tfi_ground_state(g=1.5, chi=16)
    e_exact = tfi_exact_infinite_gs_energy(1.0, 1.5)
    eng = iTDVPEngine(psi, model, dt=0.05, imaginary=True)
    eng.run(10)
    assert abs(eng.energy_density() - e_exact) < 1e-12
    # environments converge fast on a gapped state (warm started)
    assert eng.env_iters < 50


def test_itdvp_real_time_conserves_energy():
    """Global quench g: 1.5 -> 2.5; the integrator conserves energy density."""
    _, psi = _tfi_ground_state(g=1.5, chi=16)
    mq = TFIModel(L=2, J=1.0, g=2.5, conserve='parity', block_backend='numpy',
                  bc='infinite')
    e0 = mq.energy(psi)
    eng = iTDVPEngine(psi, mq, dt=0.02)
    eng.run(25)   # t = 0.5
    assert abs(mq.energy(eng.psi) - e0) < 1e-6
    # the returned unit cell is canonical B form
    out = eng.psi
    for B in out.Bs:
        E = tdot(B, dagger(B), ['p', 'vR'], ['p*', 'vR*'])
        eye = SymmetricTensor.from_eye([B.get_leg_co_domain('vL')],
                                       backend=B.backend, labels=E.labels)
        assert float(norm(E + (-1.) * eye)) < 1e-10


@pytest.mark.slow
def test_itdvp_quench_vs_itebd():
    """Cross-method anchor: transverse magnetization after a global quench
    agrees between iTDVP (dt=0.02, chi=24) and iTEBD (dt=0.005, chi=48)."""
    _, psi0 = _tfi_ground_state(g=1.5, chi=24)
    mq = TFIModel(L=2, J=1.0, g=2.5, conserve='parity', block_backend='numpy',
                  bc='infinite')
    sz = SymmetricTensor.from_dense_block(
        np.diag([1., -1.]), [mq.site_leg], [mq.site_leg],
        backend=mq.backend, labels=['p', 'p*'])

    def mz(p):
        return float(np.real(p.site_expectation_value(sz, 0)))

    t_end = 0.5
    eng = iTDVPEngine(psi0.copy(), mq, dt=0.02)
    eng.run(int(t_end / 0.02))
    tebd = TEBDEngine(psi0.copy(), mq, dt=0.005, chi_max=48, imaginary=False)
    tebd.run(int(t_end / 0.005))
    assert abs(mz(eng.psi) - mz(tebd.psi)) < 1e-5


def test_itdvp_rejects_non_canonical():
    model = TFIModel(L=2, J=1.0, g=1.5, conserve='parity',
                     block_backend='numpy', bc='infinite')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 0],
                                       backend=model.backend, bc='infinite')
    # scramble the Schmidt values so AL C_{i+1} != C_i AR_i at the wrap
    eng = iDMRGEngine(psi, model, chi_max=8, eps=1e-12)
    eng.run(n_steps=40, tol=1e-12)
    bad = eng.psi
    # squared Schmidt values: the state's B tensors no longer match the Ss
    S2 = bad.Ss[0] * bad.Ss[0]
    bad.Ss[0] = ((1. / float(norm(S2))) * S2).relabelled(['vL', 'vL*'])
    with pytest.raises(ValueError, match='not canonical'):
        iTDVPEngine(bad, model, dt=0.05)
