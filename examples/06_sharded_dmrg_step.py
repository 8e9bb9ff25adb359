"""A DMRG bond update sharded over a device mesh (runs on 8 virtual CPU devices).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/06_sharded_dmrg_step.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np

import cyten_tpu as ct
from cyten_tpu.algorithms.dmrg import _heff_matvec_impl
from cyten_tpu.parallel import global_truncate, make_mesh, replicate_tensor, \
    shard_tensor
# build a bond environment (see __graft_entry__.dryrun_multichip for the pattern)
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from bench import build_workload

backend = ct.get_backend(ct.u1_symmetry, 'jax')
LP, RP, W1, W2, theta = build_workload(backend, chi=8 * len(jax.devices()))
mesh = make_mesh(axis_name='mult')
theta = shard_tensor(theta, mesh, 'vL')
LP = shard_tensor(LP, mesh, 'vR')
RP = shard_tensor(RP, mesh, 'vL')
W1, W2 = replicate_tensor(W1, mesh), replicate_tensor(W2, mesh)

with mesh:
    out = jax.jit(_heff_matvec_impl)(LP, RP, W1, W2, theta)
    U, S, Vh = ct.svd(ct.permute_legs(out, codomain=['vL', 'p0'],
                                      domain=['vR', 'p1']),
                      new_labels=['vR', 'vL'])
    mask, err = global_truncate(S, chi_max=16)
print(f'sharded matvec + svd + global truncation OK on {len(jax.devices())} '
      f'devices; kept chi = {int(mask.small_leg.dim)}, trunc err = {err:.3e}')
