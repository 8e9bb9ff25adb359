"""bfloat16 storage dtype: promotion rules, f32-accumulating compute, mixed-precision DMRG.

bf16 is a *storage* dtype on TPU (halves HBM traffic — the measured bottleneck of the
DMRG matvec, docs/DESIGN.md §4/§10): block dots run one bf16 MXU pass with an f32
accumulator; reductions and factorizations upcast to f32 internally; outputs are cast
back so the dtype contract (result dtype == promoted input dtype) holds everywhere.
The reference has no half-precision support (its Dtype enum stops at float32,
cyten/block_backends/dtypes.py:12-20) — this is TPU-native surface.
"""

import numpy as np
import pytest

from cyten_tpu import ElementarySpace, SymmetricTensor, norm, tdot, svd, qr, u1_symmetry
from cyten_tpu.blocks.backend import get_block_backend
from cyten_tpu.backends.factory import get_backend
from cyten_tpu.dtypes import Dtype


def test_dtype_bfloat16_basics():
    bf = Dtype.bfloat16
    assert bf.is_real and not bf.is_complex and not bf.is_bool
    assert bf.itemsize == 2
    assert bf.eps == 2. ** -7  # 8-bit significand (7 stored bits)
    assert bf.to_complex is Dtype.complex64
    assert bf.to_real is bf
    # promotion
    assert Dtype.common(bf, bf) is bf
    assert Dtype.common(bf, Dtype.bool) is bf
    assert Dtype.common(bf, Dtype.float32) is Dtype.float32
    assert Dtype.common(bf, Dtype.float64) is Dtype.float64
    assert Dtype.common(bf, Dtype.complex64) is Dtype.complex64
    assert Dtype.common(bf, Dtype.complex128) is Dtype.complex128
    assert Dtype.float32.can_hold(bf) and not bf.can_hold(Dtype.float32)
    # numpy mapping roundtrip (via ml_dtypes)
    assert Dtype.from_numpy(bf.to_numpy) is bf
    assert np.dtype(bf.to_numpy).itemsize == 2


def test_bf16_block_ops(block_backend):
    bb = get_block_backend(block_backend)
    rng = np.random.default_rng(42)
    a_np = rng.standard_normal((24, 16)).astype(np.float32)
    a = bb.as_block(a_np, Dtype.bfloat16)
    assert bb.get_dtype(a) is Dtype.bfloat16

    # factorizations upcast internally, outputs keep the storage dtype
    u, s, vh = bb.matrix_svd(a)
    for x in (u, s, vh):
        assert bb.get_dtype(x) is Dtype.bfloat16
    # reconstruction to bf16 resolution
    recon = bb.to_numpy(bb.matrix_dot(bb.scale_axis(u, s, 1), vh), np.float32)
    assert np.allclose(recon, bb.to_numpy(a, np.float32), atol=0.05)
    # isometry to bf16 eps (f32 QDWH inside, single rounding outside)
    utu = bb.to_numpy(bb.matrix_dot(bb.permute_axes(u, (1, 0)), u), np.float32)
    assert np.allclose(utu, np.eye(16), atol=0.02)

    q, r = bb.matrix_qr(a)
    assert bb.get_dtype(q) is Dtype.bfloat16 and bb.get_dtype(r) is Dtype.bfloat16

    h = bb.add(a[:16, :], bb.permute_axes(a[:16, :], (1, 0)))
    w, v = bb.matrix_eigh(h)
    assert bb.get_dtype(w) is Dtype.bfloat16 and bb.get_dtype(v) is Dtype.bfloat16

    # norm accumulates in f32: value must match the f32 norm to bf16 input rounding
    assert abs(bb.norm(a) - np.linalg.norm(bb.to_numpy(a, np.float32))) < 1e-3


def test_bf16_dot_f32_accumulation():
    """Summation error must be f32-grade, not bf16-grade (preferred_element_type)."""
    bb = get_block_backend('jax')
    n = 4096
    ones = bb.as_block(np.ones((1, n), np.float32), Dtype.bfloat16)
    res = bb.matrix_dot(ones, bb.permute_axes(ones, (1, 0)))
    assert bb.get_dtype(res) is Dtype.bfloat16
    # naive bf16 accumulation saturates at 256 (1.0 + 256.0 == 256.0 in bf16);
    # the f32 accumulator reaches 4096 exactly (representable in bf16)
    assert float(bb.to_numpy(res, np.float32)[0, 0]) == n


@pytest.fixture
def u1_pair():
    sym = u1_symmetry
    V = ElementarySpace(sym, [[-1], [0], [1]], [6, 9, 7])
    W = ElementarySpace(sym, [[-1], [0], [1]], [5, 8, 6])
    return V, W


def test_bf16_tensor_ops(block_backend, u1_pair):
    V, W = u1_pair
    backend = get_backend(u1_symmetry, block_backend)
    rng = np.random.default_rng(7)
    a32 = SymmetricTensor.from_random_normal([V], [W], backend=backend,
                                             dtype=Dtype.float32, rng=rng,
                                             labels=[['p'], ['q']])
    b32 = SymmetricTensor.from_random_normal([W], [V], backend=backend,
                                             dtype=Dtype.float32, rng=rng,
                                             labels=[['q'], ['r']])
    a16 = a32.to_dtype(Dtype.bfloat16)
    b16 = b32.to_dtype(Dtype.bfloat16)
    assert a16.dtype is Dtype.bfloat16

    # contraction: bf16 x bf16 -> bf16, within bf16 rounding of the f32 result
    c32 = tdot(a32, b32, 'q', 'q')
    c16 = tdot(a16, b16, 'q', 'q')
    assert c16.dtype is Dtype.bfloat16
    c16.test_sanity()
    err = norm(c16.to_dtype(Dtype.float32) - c32) / norm(c32)
    assert err < 0.02

    # mixed bf16 x f32 promotes to f32
    cm = tdot(a16, b32, 'q', 'q')
    assert cm.dtype is Dtype.float32

    # factorizations keep the dtype contract
    u, s, vh = svd(a16, new_labels=['k', 'k*'])
    assert u.dtype is Dtype.bfloat16 and s.dtype is Dtype.bfloat16
    u.test_sanity(), s.test_sanity(), vh.test_sanity()
    q_, r_ = qr(a16, new_labels=['k', 'k*'])
    assert q_.dtype is Dtype.bfloat16 and r_.dtype is Dtype.bfloat16


def test_dmrg_bf16_environments():
    """Mixed-precision DMRG: bf16 environment storage, f32 working dtype.

    The effective Hamiltonian carries ~bf16-eps (4e-3) relative perturbation;
    DMRG is variational, so the energy error is second order.
    """
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS, TFIModel, \
        tfi_exact_finite_gs_energy

    L, J, g = 12, 1., 1.5
    model = TFIModel(L=L, J=J, g=g, conserve='parity', block_backend='jax')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=32, eps=1e-13,
                     env_dtype=Dtype.bfloat16)
    E = eng.run(n_sweeps=8)
    E_exact = tfi_exact_finite_gs_energy(L, J, g)
    assert eng.LPs[L // 2].dtype is Dtype.bfloat16
    # the reported Lanczos eigenvalue carries FIRST-order env error (~bf16 eps):
    assert abs(E - E_exact) / abs(E_exact) < 0.02
    # ... but the true (exact-MPO, f64) energy of the bf16-trained state is
    # variational and second order in the perturbation: measured 3.1e-5,
    # consistent with (4e-3)^2 x ||H||. Above the exact value, as it must be.
    E_true = model.energy(psi)
    assert E_true > E_exact - 1e-10
    assert abs(E_true - E_exact) / abs(E_exact) < 2e-4


def test_bf16_torch_factorizations():
    """The torch block backend honors the bf16 storage / f32 numerics policy
    for svd/qr/eigh (torch LAPACK kernels do not support bfloat16)."""
    torch = pytest.importorskip('torch')
    bb = get_block_backend('torch')
    a32 = torch.randn(12, 8)
    a = bb.to_dtype(a32, Dtype.bfloat16)
    u, s, vh = bb.matrix_svd(a)
    assert bb.get_dtype(u) == Dtype.bfloat16
    rec = (u.to(torch.float32) * s.to(torch.float32)) @ vh.to(torch.float32)
    assert float(torch.linalg.norm(rec - a.to(torch.float32))) < 0.15
    q, r = bb.matrix_qr(a)
    assert bb.get_dtype(q) == Dtype.bfloat16
    h = a32 @ a32.T
    hb = bb.to_dtype(h, Dtype.bfloat16)
    w, v = bb.matrix_eigh(hb)
    assert bb.get_dtype(v) == Dtype.bfloat16
    # numpy has no bf16: to_numpy upcasts through f32
    back = bb.to_numpy(a)
    assert back.dtype == np.float32
    np.testing.assert_allclose(back, bb.to_numpy(bb.to_dtype(a, Dtype.float32)))


def test_static_mode_keeps_env_dtype():
    """env_dtype=bfloat16 persists through static-mode bond updates (the cast
    used to live only on the dynamic path)."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import TFIModel

    L = 6
    model = TFIModel(L=L, J=1., g=1.5, conserve='parity', block_backend='jax')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRGEngine(psi, model, chi_max=8, eps=1e-12,
                     env_dtype=Dtype.bfloat16)
    for _ in range(3):
        eng.sweep()
    eng.enable_static_mode(n_lanczos=10)
    eng.sweep()
    for LP in eng.LPs[1:-1]:
        assert LP.dtype == Dtype.bfloat16, LP
    for RP in eng.RPs[1:-1]:
        assert RP.dtype == Dtype.bfloat16, RP


def test_bf16_sticky_scalar():
    """Traced/numpy f32 scalars broadcast onto bf16 blocks must NOT promote the
    result to f32 (jax weak typing only protects python scalars): norm/inner
    deliberately return f32, and x/norm(x) inside a jitted chain would
    otherwise silently turn a bf16 working dtype back into f32 traffic."""
    import jax
    import jax.numpy as jnp

    from cyten_tpu.tensors import linear_combination, scalar_multiply

    backend = get_backend(u1_symmetry, 'jax')
    leg = ElementarySpace(u1_symmetry, [[0], [1]], [4, 3])
    rng = np.random.default_rng(7)
    x = SymmetricTensor.from_random_normal([leg], [leg], backend=backend,
                                           rng=rng).to_dtype(Dtype.bfloat16)

    @jax.jit
    def normalize(t):
        n = norm(t)  # f32 by policy
        t = scalar_multiply(1. / jnp.maximum(n, 1e-30), t)
        return linear_combination(n, t, jnp.float32(0.5), t)

    y = normalize(x)
    assert y.dtype == Dtype.bfloat16
    for b in y.data.blocks:
        assert b.dtype == jnp.bfloat16
    # value sanity: n*(x/n) + 0.5*(x/n) = x * (1 + 0.5/|x|)
    xf = x.to_numpy(np.float32)
    ref = xf * (1. + 0.5 / np.linalg.norm(xf))
    assert np.allclose(y.to_numpy(np.float32), ref, atol=0.05)
    # numpy (strong) scalars are demoted the same way outside jit
    z = scalar_multiply(np.float32(2.0), x)
    assert z.dtype == Dtype.bfloat16
    # full precision is preserved where the storage is wider
    w = scalar_multiply(np.float32(2.0), x.to_dtype(Dtype.float32))
    assert w.dtype == Dtype.float32


def test_full_bf16_static_step():
    """The WHOLE static-mode bond update runs with bf16 storage end-to-end
    (state + MPO + envs + intermediates): no silent f32 promotion anywhere in
    the fused program, and the result is bf16-grade accurate."""
    import bench

    backend = get_backend(u1_symmetry, 'jax')
    args = bench.build_step_state(backend, chi=48)
    LP, RP, W1, W2, S, B1, B2, theta_tmpl, mask = args
    casted = [t.to_dtype(Dtype.bfloat16)
              for t in (LP, RP, W1, W2, S, B1, B2, theta_tmpl)]
    LPb, RPb, W1b, W2b, Sb, B1b, B2b, tmplb = casted

    from cyten_tpu.algorithms.dmrg import HEffective, _get_static_bond_fn

    impl = _get_static_bond_fn(5, 'steady')
    E32, nB1, S2, B2n, LPn, RPn = impl(HEffective(LP, RP, W1, W2), S, B1, B2,
                                       theta_tmpl, mask)
    E16, nB1b, S2b, B2nb, LPnb, RPnb = impl(HEffective(LPb, RPb, W1b, W2b),
                                            Sb, B1b, B2b, tmplb, mask)
    for t in (nB1b, S2b, B2nb, LPnb, RPnb):
        assert t.dtype == Dtype.bfloat16, t
    assert abs(float(E16) - float(E32)) < 0.05 * max(1., abs(float(E32)))
