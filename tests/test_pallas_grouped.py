"""Flat-storage grouped pallas GEMM prototype (SURVEY §7-delta-2 /
VERDICT r4 #4): correctness of the tiled packing, the work-item tables and
the kernel itself (pallas interpret mode on CPU)."""

import numpy as np
import pytest

jnp = pytest.importorskip('jax.numpy')

from cyten_tpu.blocks.pallas_grouped import (  # noqa: E402
    TM, grouped_matmul, tile_group, untile_results,
)


@pytest.mark.parametrize('shapes', [
    [(37, 130, 65), (256, 128, 300), (5, 7, 9), (140, 260, 129)],
    [(128, 128, 128)] * 3,
    [(1, 1, 1), (2, 300, 2)],
])
def test_grouped_matmul_matches_dense(shapes):
    rng = np.random.default_rng(0)
    As = [jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
          for M, K, N in shapes]
    Bs = [jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
          for M, K, N in shapes]
    g = tile_group(As, Bs)
    outs = untile_results(g, grouped_matmul(g, interpret=True))
    for (M, K, N), A, B, C in zip(shapes, As, Bs, outs):
        assert C.shape == (M, N)
        np.testing.assert_allclose(np.asarray(C),
                                   np.asarray(A) @ np.asarray(B),
                                   rtol=2e-5, atol=2e-4)


def test_tile_tables_consistent():
    shapes = [(300, 260, 140), (64, 64, 64)]
    rng = np.random.default_rng(1)
    As = [jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
          for M, K, N in shapes]
    Bs = [jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
          for M, K, N in shapes]
    g = tile_group(As, Bs)
    t = g.tables
    n = len(t['a_id'])
    assert all(len(t[k]) == n for k in t)
    # every c tile is written exactly once (one last_k item per c tile)
    last_c = np.asarray(t['c_id'])[np.asarray(t['last_k']) == 1]
    assert len(set(last_c.tolist())) == len(last_c) == g.c_tile_count
    # k-items of one output tile are consecutive
    cid = np.asarray(t['c_id'])
    changes = np.nonzero(np.diff(cid))[0]
    seen = set()
    prev = 0
    for ch in list(changes + 1) + [n]:
        c = int(cid[prev])
        assert c not in seen  # no revisits after leaving a tile
        seen.add(c)
        prev = ch
