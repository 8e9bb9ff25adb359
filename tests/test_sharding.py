"""Multi-device sharding equivalence: sharded vs single-device results.

Runs on the virtual 8-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8). This is the §4 carry-over test from
SURVEY.md: sharded execution must be numerically identical to single-device.
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import ElementarySpace, SymmetricTensor
from cyten_tpu.parallel import make_mesh, replicate_tensor, shard_tensor


@pytest.fixture
def workload(np_random):
    import jax

    if len(jax.devices()) < 4:
        pytest.skip('needs >= 4 virtual devices')
    be = ct.get_backend(ct.u1_symmetry, 'jax')
    chi = 16  # divisible by the mesh size
    v = ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [chi, chi, chi])
    p = ElementarySpace(ct.u1_symmetry, [[-1], [1]], [1, 1])
    theta = SymmetricTensor.from_random_normal(
        [v, p, p], [v], backend=be, labels=['vL', 'p0', 'p1', 'vR'],
        rng=np_random)
    LP = SymmetricTensor.from_random_normal(
        [v], [v, p], backend=be, labels=[['vR*'], ['vR', 'wR']], rng=np_random)
    return theta, LP


def test_sharded_contraction_equivalence(workload):
    import jax

    theta, LP = workload
    mesh = make_mesh(4, axis_name='mult')

    def f(lp, th):
        return ct.tdot(th, lp, 'vL', 'vR')

    ref = jax.jit(f)(LP, theta)
    with mesh:
        th_s = shard_tensor(theta, mesh, 'vL')
        lp_s = shard_tensor(LP, mesh, 'vR')
        out = jax.jit(f)(lp_s, th_s)
    for b_ref, b_out in zip(ref.data.blocks, out.data.blocks):
        np.testing.assert_allclose(np.asarray(b_ref), np.asarray(b_out),
                                   rtol=1e-10, atol=1e-10)


def test_sharded_svd_equivalence(workload):
    import jax

    theta, LP = workload
    mesh = make_mesh(4, axis_name='mult')

    def f(th):
        U, S, Vh = ct.svd(ct.permute_legs(th, codomain=['vL', 'p0'],
                                          domain=['vR', 'p1']))
        return S

    S_ref = jax.jit(f)(theta)
    with mesh:
        th_s = shard_tensor(theta, mesh, 'vL')
        S_out = jax.jit(f)(th_s)
    for b_ref, b_out in zip(S_ref.data.blocks, S_out.data.blocks):
        np.testing.assert_allclose(np.sort(np.asarray(b_ref)),
                                   np.sort(np.asarray(b_out)),
                                   rtol=1e-8, atol=1e-8)


def test_replicate(workload):
    import jax

    theta, _ = workload
    mesh = make_mesh(4)
    r = replicate_tensor(theta, mesh)
    np.testing.assert_allclose(np.asarray(r.data.blocks[0]),
                               np.asarray(theta.data.blocks[0]))
