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


def test_global_truncation():
    """Device-side global truncation == host constraint solver (chi_max+svd_min),
    incl. on sharded singular values (XLA inserts the all-gather)."""
    import jax
    import numpy as np

    import cyten_tpu as ct
    from cyten_tpu.backends._backend import truncation_mask_from_S
    from cyten_tpu.parallel import (
        device_truncation_masks, global_truncate, make_mesh, shard_tensor,
    )

    leg = ct.ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [8, 16, 8])
    be = ct.get_backend(ct.u1_symmetry, 'jax')
    rng = np.random.default_rng(0)
    vals = [np.sort(rng.uniform(0.01, 1.0, m))[::-1].copy()
            for m in (8, 16, 8)]
    from cyten_tpu.tensors import DiagonalTensor

    S = DiagonalTensor.from_sector_block_func(
        lambda shape, c, _it=iter(vals): next(_it), leg, backend=be)
    chi = 12
    mask, err = global_truncate(S, chi_max=chi)
    assert int(mask.small_leg.dim) == chi
    # compare kept set against host solver
    host_masks, host_err, _ = truncation_mask_from_S(
        [np.asarray(b) for b in S.data.blocks], np.ones(3), chi_max=chi)
    dev_masks = [np.asarray(b) for b in mask.as_DiagonalTensor().data.blocks]
    for hm, dm in zip(host_masks, dev_masks):
        np.testing.assert_array_equal(hm, dm)
    np.testing.assert_allclose(err, host_err, atol=1e-12)

    # sharded: same masks when the S blocks are sharded over the mesh
    mesh = make_mesh(4, axis_name='mult')
    S_sh = shard_tensor(S, mesh, 0)
    with mesh:
        mask2, err2 = global_truncate(S_sh, chi_max=chi)
    assert int(mask2.small_leg.dim) == chi
    np.testing.assert_allclose(err2, err, atol=1e-12)


def test_device_truncation_full_constraints(np_random):
    """The device constraint solver matches the host solver for EVERY constraint
    combination (chi_max, chi_min, degeneracy_tol, trunc_cut, svd_min), incl.
    qdim weighting (SU(2) sectors)."""
    import itertools

    from cyten_tpu.backends._backend import truncation_mask_from_S
    from cyten_tpu.parallel import device_truncation_masks

    be = ct.get_backend(ct.su2_symmetry, 'jax')
    bb = be.block_backend
    rng = np_random
    for trial in range(4):
        sizes = rng.integers(3, 12, size=3)
        vals = [np.sort(rng.uniform(1e-6, 1.0, m))[::-1].copy() for m in sizes]
        # make some degeneracies
        if trial % 2:
            vals[0][1] = vals[0][0] * (1 - 1e-12)
        qdims = [1., 2., 3.]  # e.g. SU(2) j=0,1/2,1 quantum dimensions
        dev_vals = [bb.as_block(v) for v in vals]
        cases = [
            dict(chi_max=7),
            dict(chi_max=7, svd_min=1e-2),
            dict(chi_max=20, trunc_cut=0.3),
            dict(chi_max=20, trunc_cut=0.3, chi_min=5),
            dict(chi_max=8, degeneracy_tol=1e-10),
            dict(chi_max=6, svd_min=1e-3, trunc_cut=1e-2, chi_min=2,
                 degeneracy_tol=1e-11),
        ]
        for kw in cases:
            host_masks, host_err, host_norm = truncation_mask_from_S(
                vals, np.array(qdims), **kw)
            dev_masks, dev_err, dev_norm = device_truncation_masks(
                dev_vals, qdims, **kw)
            for hm, dm in zip(host_masks, dev_masks):
                np.testing.assert_array_equal(hm, np.asarray(dm), err_msg=str(kw))
            np.testing.assert_allclose(float(dev_err), host_err, atol=1e-12)
            np.testing.assert_allclose(float(dev_norm), host_norm, atol=1e-12)


def test_sector_sharding(workload):
    """Sector-axis placement (SURVEY §2.9 lever (i)): blocks round-robin over
    devices; eager per-block ops produce identical results."""
    import jax

    theta, LP = workload
    mesh = make_mesh(4, axis_name='mult')
    from cyten_tpu.parallel import shard_tensor_sectors

    th_s = shard_tensor_sectors(theta, mesh)
    # blocks actually live on distinct devices
    devs = {list(b.devices())[0] for b in th_s.data.blocks}
    assert len(devs) > 1
    # eager contraction across differently-placed blocks matches
    ref = ct.tdot(theta, LP, 'vL', 'vR')
    out = ct.tdot(th_s, LP, 'vL', 'vR')
    for b_ref, b_out in zip(ref.data.blocks, out.data.blocks):
        np.testing.assert_allclose(np.asarray(b_ref), np.asarray(b_out),
                                   rtol=1e-10, atol=1e-10)


def test_sharded_dmrg_sweep_equivalence():
    """Full DMRG sweeps with per-bond re-sharding over the 8-device mesh produce
    the same energies as the unsharded run (collectives inserted by XLA)."""
    import jax
    import numpy as np

    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import HeisenbergModel
    from cyten_tpu.parallel import make_mesh, shard_tensor

    L = 6
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='jax')
    psi_plain = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                             backend=model.backend)
    psi_shard = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                             backend=model.backend)
    eng_plain = DMRGEngine(psi_plain, model, chi_max=8, eps=1e-13)
    eng_shard = DMRGEngine(psi_shard, model, chi_max=8, eps=1e-13)
    mesh = make_mesh(8, axis_name='mult')

    E_plain = [eng_plain.sweep() for _ in range(1)]

    with mesh:
        Es = []
        for _ in range(1):
            # re-shard the state's bond axes before each sweep
            for i in range(L):
                eng_shard.psi.Bs[i] = shard_tensor(eng_shard.psi.Bs[i], mesh, 'vL')
            Es.append(eng_shard.sweep())

    np.testing.assert_allclose(Es, E_plain, atol=1e-10)


def test_dmrg_engine_mesh_option():
    """DMRGEngine(mesh=...) shards bond axes internally; full runs match the
    unsharded engine exactly (NEXT.md item 2: distributed DMRG engine)."""
    import numpy as np

    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import HeisenbergModel
    from cyten_tpu.parallel import make_mesh

    L = 6
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='jax')
    psi_plain = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                             backend=model.backend)
    psi_mesh = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                            backend=model.backend)
    mesh = make_mesh(8, axis_name='mult')
    eng_plain = DMRGEngine(psi_plain, model, chi_max=8, eps=1e-13)
    eng_mesh = DMRGEngine(psi_mesh, model, chi_max=8, eps=1e-13, mesh=mesh)
    E_plain = eng_plain.run(n_sweeps=3, tol=1e-12)
    E_mesh = eng_mesh.run(n_sweeps=3, tol=1e-12)
    np.testing.assert_allclose(E_mesh, E_plain, atol=1e-10)
    # environments actually carry mesh shardings
    lp = eng_mesh.LPs[2]
    assert any(getattr(b, 'sharding', None) is not None
               for b in lp.data.blocks)


def test_2d_mesh_equivalence(workload):
    """2D (row x col) block sharding: contraction + SVD on a 2x4 mesh equals
    the single-device result. Contracting over the row-sharded leg makes XLA
    psum over the 'sector' axis while the 'mult' axis rides along (VERDICT r2
    #5: 2D mesh composition)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    theta, LP = workload
    from cyten_tpu.parallel import shard_tensor_2d, sharded_fraction

    mesh = make_mesh(shape=(2, 4), axis_names=('sector', 'mult'))

    def f(lp, th):
        return ct.tdot(th, lp, 'vL', 'vR')

    ref = jax.jit(f)(LP, theta)
    with mesh:
        th_s = shard_tensor_2d(theta, mesh, 'vL', 'vR')
        lp_s = shard_tensor_2d(LP, mesh, 'vR', 'vR*')
        assert sharded_fraction(th_s, lp_s) == 1.0
        out = jax.jit(f)(lp_s, th_s)
    for b_ref, b_out in zip(ref.data.blocks, out.data.blocks):
        np.testing.assert_allclose(np.asarray(b_ref), np.asarray(b_out),
                                   rtol=1e-10, atol=1e-10)

    # SVD path on 2D-sharded theta
    def g(th):
        U, S, Vh = ct.svd(ct.permute_legs(th, codomain=['vL', 'p0'],
                                          domain=['vR', 'p1']),
                          new_labels=['vR', 'vL'])
        return S

    S_ref = jax.jit(g)(theta)
    with mesh:
        S_out = jax.jit(g)(th_s)
    for b_ref, b_out in zip(S_ref.data.blocks, S_out.data.blocks):
        np.testing.assert_allclose(np.asarray(b_ref), np.asarray(b_out),
                                   rtol=1e-8, atol=1e-10)


def test_sector_mult_composition(workload):
    """Eager sector x mult composition: round-robin block rows with the
    largest divisible axis sharded within each row (2D mesh form of
    shard_tensor_sectors); results equal single-device."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    theta, LP = workload
    from cyten_tpu.parallel import shard_tensor_sectors, sharded_fraction

    mesh = make_mesh(shape=(2, 4), axis_names=('sector', 'mult'))
    th_s = shard_tensor_sectors(theta, mesh)
    assert sharded_fraction(th_s) == 1.0
    out = ct.tdot(th_s, LP, 'vL', 'vR')
    ref = ct.tdot(theta, LP, 'vL', 'vR')
    for b_ref, b_out in zip(ref.data.blocks, out.data.blocks):
        np.testing.assert_allclose(np.asarray(b_ref), np.asarray(b_out),
                                   rtol=1e-10, atol=1e-10)


def test_sharded_fraction_metric(workload):
    """sharded_fraction: 0 for replicated, 1 for fully sharded tensors."""
    theta, LP = workload
    from cyten_tpu.parallel import sharded_fraction

    mesh = make_mesh(4, axis_name='mult')
    assert sharded_fraction(replicate_tensor(theta, mesh)) == 0.0
    assert sharded_fraction(shard_tensor(theta, mesh, 'vL')) == 1.0
