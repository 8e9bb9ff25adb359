"""Multi-host (DCN) path: 2 real processes, one global mesh, sharded contraction.

SURVEY.md §2.9 third bullet: the multi-controller runtime. No multi-host hardware is
needed — two CPU processes with 4 virtual devices each form an 8-device global mesh;
the collectives XLA inserts for the sharded contraction cross the process boundary
(which is exactly what DCN traffic is to the runtime).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent('''
    import os, sys

    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)

    import numpy as np

    pid, nproc, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from cyten_tpu.parallel.multihost import (
        initialize_distributed, make_global_mesh, shard_tensor_global,
    )
    initialize_distributed(addr, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    import cyten_tpu as ct
    from cyten_tpu import ElementarySpace, SymmetricTensor

    be = ct.get_backend(ct.u1_symmetry, 'jax')
    rng = np.random.default_rng(0)  # deterministic; identical on every process
    chi = 16  # divisible by the 8-device global mesh
    v = ElementarySpace(ct.u1_symmetry, [[-1], [0], [1]], [chi, chi, chi])
    p = ElementarySpace(ct.u1_symmetry, [[-1], [1]], [1, 1])
    theta = SymmetricTensor.from_random_normal(
        [v, p, p], [v], backend=be, labels=['vL', 'p0', 'p1', 'vR'], rng=rng)
    LP = SymmetricTensor.from_random_normal(
        [v], [v, p], backend=be, labels=[['vR*'], ['vR', 'wR']], rng=rng)

    # single-host (process-local, replicated) reference
    ref = float(ct.norm(ct.tdot(theta, LP, 'vL', 'vR')))

    mesh = make_global_mesh('mult')
    assert mesh.devices.size == 4 * nproc
    with mesh:
        th_g = shard_tensor_global(theta, mesh, 'vL')
        lp_g = shard_tensor_global(LP, mesh, 'vR')
        out = jax.jit(lambda lp, th: ct.tdot(th, lp, 'vL', 'vR'))(lp_g, th_g)
        # the result is sharded across hosts; its norm is a global reduction
        nrm = float(ct.norm(out))
    assert abs(nrm - ref) < 1e-10, (nrm, ref)

    # global truncation decision across the host-spanning mesh
    from cyten_tpu.tensors import DiagonalTensor
    from cyten_tpu.parallel import global_truncate
    vals = [np.sort(rng.uniform(0.01, 1.0, chi))[::-1].copy() for _ in range(3)]
    S = DiagonalTensor.from_sector_block_func(
        lambda shape, c, _it=iter(vals): next(_it), v, backend=be)
    with mesh:
        S_g = shard_tensor_global(S, mesh, 0)
        mask, err = global_truncate(S_g, chi_max=10)
    assert int(mask.small_leg.dim) == 10

    print(f'MULTIHOST_OK process={pid} norm={nrm:.12f}')
''')


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_contraction(tmp_path):
    worker = tmp_path / 'worker.py'
    worker.write_text(_WORKER)
    addr = f'127.0.0.1:{_free_port()}'
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('JAX_', 'XLA_', 'TPU'))}
    env['PYTHONPATH'] = '/root/repo'
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), '2', addr],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid} failed:\n{out[-3000:]}'
        assert f'MULTIHOST_OK process={pid}' in out, out[-3000:]
    # both processes computed the same (replicated) global norm
    n0 = [l for l in outs[0].splitlines() if 'MULTIHOST_OK' in l][0].split('=')[-1]
    n1 = [l for l in outs[1].splitlines() if 'MULTIHOST_OK' in l][0].split('=')[-1]
    assert n0 == n1
