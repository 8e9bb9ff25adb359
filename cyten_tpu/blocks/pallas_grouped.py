"""Grouped (ragged) matmul on flat tiled storage — the SURVEY §7-delta-2
prototype, built for real this time (VERDICT r4 #4).

Storage model: a list of matrices ``A_i [M_i, K_i]`` lives as ONE device
array of shape ``[n_tiles, TM, TK]`` — each 128x128 tile contiguous — plus
host-side tile tables. A grouped GEMM ``C_i = A_i @ B_i`` for all pairs is a
single :func:`pl.pallas_call` whose grid enumerates (output-tile, k-tile)
work items; prefetched ``int32`` tables drive the BlockSpec index maps, so
the pallas pipeline DMAs exactly the tiles each step needs (double-buffered
by the runtime). Accumulation runs in an f32 VMEM scratch across the k
items of one output tile (the grid is ordered k-innermost, and pallas keeps
revisited blocks resident), with the write-out on the last k item.

This is a measurement prototype: `scripts/exp_r5_pallas_grouped.py` compares
it against XLA's unrolled per-pair ``dot_general`` on the bench workloads'
stage-0 GEMM lists; docs/DESIGN.md §17 records the keep-or-retire decision.
"""

from __future__ import annotations

import numpy as np

__all__ = ['TiledGroup', 'tile_group', 'grouped_matmul', 'untile_results']

TM = TK = TN = 128


def _n_tiles(x, t):
    return -(-x // t)


class TiledGroup:
    """Host-side description of a grouped GEMM over tiled flat storage."""

    def __init__(self, shapes, a_tiles, b_tiles, tables, c_tile_count,
                 c_tile_base):
        self.shapes = shapes            # [(M, K, N)]
        self.a_tiles = a_tiles          # [Na, TM, TK] device array
        self.b_tiles = b_tiles          # [Nb, TK, TN]
        self.tables = tables            # dict of int32 arrays, length = grid
        self.c_tile_count = c_tile_count
        self.c_tile_base = c_tile_base  # per-pair first C-tile id


def tile_group(As, Bs):
    """Pack matrix lists into tiled flat storage + work-item tables.

    ``As[i]: [M_i, K_i]``, ``Bs[i]: [K_i, N_i]`` (jax or numpy arrays,
    common dtype). The packing cost is NOT part of a grouped-GEMM dispatch in
    a real flat-storage backend (tensors would live tiled); the prototype
    pays it once outside the timed loop.
    """
    import jax.numpy as jnp

    assert len(As) == len(Bs)
    shapes = []
    a_list, b_list = [], []
    a_base, b_base = [], []
    na = nb = 0
    for A, B in zip(As, Bs):
        M, K = A.shape
        K2, N = B.shape
        assert K == K2
        shapes.append((M, K, N))
        a_base.append(na)
        b_base.append(nb)
        na += _n_tiles(M, TM) * _n_tiles(K, TK)
        nb += _n_tiles(K, TK) * _n_tiles(N, TN)
        Ap = jnp.zeros((_n_tiles(M, TM) * TM, _n_tiles(K, TK) * TK), A.dtype
                       ).at[:M, :K].set(A)
        Bp = jnp.zeros((_n_tiles(K, TK) * TK, _n_tiles(N, TN) * TN), B.dtype
                       ).at[:K, :N].set(B)
        # row-of-tiles order: tile (r, c) at index r * n_tile_cols + c
        a_list.append(Ap.reshape(_n_tiles(M, TM), TM,
                                 _n_tiles(K, TK), TK).transpose(0, 2, 1, 3)
                      .reshape(-1, TM, TK))
        b_list.append(Bp.reshape(_n_tiles(K, TK), TK,
                                 _n_tiles(N, TN), TN).transpose(0, 2, 1, 3)
                      .reshape(-1, TK, TN))
    a_tiles = jnp.concatenate(a_list, axis=0)
    b_tiles = jnp.concatenate(b_list, axis=0)

    # work items: for each pair, for each (m, n) output tile, k tiles inner
    a_id, b_id, c_id, first_k, last_k = [], [], [], [], []
    c_base = []
    nc = 0
    for i, (M, K, N) in enumerate(shapes):
        mt, kt, nt = _n_tiles(M, TM), _n_tiles(K, TK), _n_tiles(N, TN)
        c_base.append(nc)
        for m in range(mt):
            for n in range(nt):
                for k in range(kt):
                    a_id.append(a_base[i] + m * kt + k)
                    b_id.append(b_base[i] + k * nt + n)
                    c_id.append(nc + m * nt + n)
                    first_k.append(1 if k == 0 else 0)
                    last_k.append(1 if k == kt - 1 else 0)
        nc += mt * nt
    tables = {
        'a_id': jnp.asarray(np.array(a_id, np.int32)),
        'b_id': jnp.asarray(np.array(b_id, np.int32)),
        'c_id': jnp.asarray(np.array(c_id, np.int32)),
        'first_k': jnp.asarray(np.array(first_k, np.int32)),
        'last_k': jnp.asarray(np.array(last_k, np.int32)),
    }
    return TiledGroup(shapes, a_tiles, b_tiles, tables, nc, c_base)


def grouped_matmul(group: TiledGroup, interpret: bool = False):
    """All ``C_i = A_i @ B_i`` as ONE pallas call over the tiled storage.

    Returns C tiles ``[n_c_tiles, TM, TN]`` in the group's dtype.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = group.tables
    n_items = int(t['a_id'].shape[0])
    dtype = group.a_tiles.dtype

    def kernel(a_id, b_id, c_id, first_k, last_k, a_ref, b_ref, c_ref, acc):
        i = pl.program_id(0)

        @pl.when(first_k[i] == 1)
        def _init():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(last_k[i] == 1)
        def _write():
            c_ref[0] = acc[:].astype(c_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_items,),
        in_specs=[
            pl.BlockSpec((1, TM, TK),
                         lambda i, a_id, b_id, c_id, fk, lk: (a_id[i], 0, 0)),
            pl.BlockSpec((1, TK, TN),
                         lambda i, a_id, b_id, c_id, fk, lk: (b_id[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, TM, TN), lambda i, a_id, b_id, c_id, fk, lk: (c_id[i], 0, 0)),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((group.c_tile_count, TM, TN), dtype),
        interpret=interpret,
    )(t['a_id'], t['b_id'], t['c_id'], t['first_k'], t['last_k'],
      group.a_tiles, group.b_tiles)


def untile_results(group: TiledGroup, c_tiles):
    """Unpack the C tile array back into per-pair matrices (host-light)."""
    outs = []
    for i, (M, K, N) in enumerate(group.shapes):
        mt, nt = _n_tiles(M, TM), _n_tiles(N, TN)
        base = group.c_tile_base[i]
        tiles = c_tiles[base:base + mt * nt]
        C = tiles.reshape(mt, nt, TM, TN).transpose(0, 2, 1, 3).reshape(
            mt * TM, nt * TN)
        outs.append(C[:M, :N])
    return outs
