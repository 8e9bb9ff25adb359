"""Analyze the exact GEMM list of the U(1) DMRG matvec at a given chi.

For each tdot stage, record per block-pair dot: (M, K, N) matrix dims after
folding kept/contracted axes, and the output-block grouping. Report:

- raw FLOPs vs MXU-tile-padded FLOPs (the tile-waste model of the 2.83 ms floor)
- unique HBM bytes vs per-pair bytes (re-read waste)
- grouping stats: pairs per output block (K-concat opportunity)

This drives the grouped-GEMM kernel design (NEXT.md item 1).
"""

import sys
from collections import defaultdict

sys.path.insert(0, '/root/repo')

import numpy as np

import cyten_tpu as ct
from cyten_tpu.backends import abelian as ab
from bench import build_workload


RECORDS = []  # (stage, list of (M, K, N, oid), n_out)
_STAGE = [0]

_orig = ab.AbelianBackend.tdot_data


def patched(self, a, b, legs1, legs2):
    a_bi = a.data.block_inds
    b_bi = b.data.block_inds
    a_keep = [n for n in range(a.num_legs) if n not in legs1]
    b_keep = [n for n in range(b.num_legs) if n not in legs2]
    ia, ib, out_id, n_out = ab._cached_compose_plan(
        a_bi.tobytes(), a_bi.shape, tuple(legs1), tuple(a_keep),
        b_bi.tobytes(), b_bi.shape, tuple(legs2), tuple(b_keep))
    recs = []
    for n1, n2, oid in zip(ia, ib, out_id):
        sa = np.asarray(a.data.blocks[int(n1)]).shape
        sb = np.asarray(b.data.blocks[int(n2)]).shape
        M = int(np.prod([sa[i] for i in a_keep], dtype=np.int64))
        K = int(np.prod([sa[i] for i in legs1], dtype=np.int64))
        N = int(np.prod([sb[i] for i in b_keep], dtype=np.int64))
        recs.append((M, K, N, int(oid), int(n1), int(n2)))
    RECORDS.append((_STAGE[0], recs, int(n_out),
                    [np.asarray(blk).size for blk in a.data.blocks],
                    [np.asarray(blk).size for blk in b.data.blocks]))
    _STAGE[0] += 1
    return _orig(self, a, b, legs1, legs2)


def pad(x, m):
    return -(-x // m) * m


def main():
    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    ab.AbelianBackend.tdot_data = patched
    backend = ct.get_backend(ct.u1_symmetry, 'numpy')
    LP, RP, W1, W2, theta = build_workload(backend, chi=chi)
    from cyten_tpu.algorithms.dmrg import _heff_matvec_impl
    _heff_matvec_impl(LP, RP, W1, W2, theta)

    tot_raw = tot_pad128 = tot_pad8 = 0
    tot_pair_bytes = 0
    tot_unique_bytes = 0
    n_pairs_total = 0
    print(f'chi={chi}: {len(RECORDS)} tdot stages')
    for stage, recs, n_out, a_sizes, b_sizes in RECORDS:
        raw = sum(2 * M * K * N for M, K, N, *_ in recs)
        # MXU-pass model: time proportional to padded tile volume
        p128 = sum(2 * pad(M, 128) * pad(K, 128) * pad(N, 128)
                   for M, K, N, *_ in recs)
        # memory-granularity model (sublane 8, lane 128)
        p8 = sum(2 * pad(M, 8) * pad(K, 128) * pad(N, 128)
                 for M, K, N, *_ in recs)
        pair_bytes = sum(4 * (M * K + K * N + M * N) for M, K, N, *_ in recs)
        a_used = {n1 for *_, n1, n2 in recs}
        b_used = {n2 for *_, n1, n2 in recs}
        out_elems = {}
        for M, K, N, oid, n1, n2 in recs:
            out_elems[oid] = M * N
        uniq = (sum(a_sizes[i] for i in a_used) + sum(b_sizes[i] for i in b_used)
                + sum(out_elems.values())) * 4
        # grouping: pairs per out block, and K-sum per out block
        groups = defaultdict(list)
        for M, K, N, oid, n1, n2 in recs:
            groups[oid].append((M, K, N))
        ks = [len(v) for v in groups.values()]
        # if pairs per group were concatenated along K: padding paid once per group
        pgrp = sum(2 * pad(g[0][0], 128) * pad(sum(k for _, k, _ in g), 128)
                   * pad(g[0][2], 128) for g in groups.values())
        mks = sorted(recs, key=lambda r: -2 * r[0] * r[1] * r[2])[:4]
        print(f'  stage {stage}: {len(recs)} dots -> {n_out} out blocks; '
              f'raw {raw/1e9:.2f} GF, pad128 {p128/1e9:.2f} GF '
              f'(x{p128/max(raw,1):.1f}), grouped-K pad128 {pgrp/1e9:.2f} GF '
              f'(x{pgrp/max(raw,1):.1f}); pairs/out min/med/max '
              f'{min(ks)}/{sorted(ks)[len(ks)//2]}/{max(ks)}; '
              f'bytes pair {pair_bytes/1e6:.0f} MB uniq {uniq/1e6:.0f} MB; '
              f'top dots {[(r[0], r[1], r[2]) for r in mks]}')
        tot_raw += raw
        tot_pad128 += p128
        tot_pad8 += p8
        tot_pair_bytes += pair_bytes
        tot_unique_bytes += uniq
        n_pairs_total += len(recs)
    print(f'TOTAL: {n_pairs_total} dots, raw {tot_raw/1e9:.2f} GF, '
          f'pad128 {tot_pad128/1e9:.2f} GF (x{tot_pad128/tot_raw:.2f}), '
          f'pad8 {tot_pad8/1e9:.2f} GF (x{tot_pad8/tot_raw:.2f})')
    print(f'bytes: per-pair {tot_pair_bytes/1e6:.0f} MB, unique '
          f'{tot_unique_bytes/1e6:.0f} MB')
    peak = 197e12 / 2  # v5e f32 ~ half bf16 394 TFLOP/s
    print(f'time models @ v5e: mxu-pad128 {tot_pad128/peak*1e3:.2f} ms, '
          f'raw {tot_raw/peak*1e3:.2f} ms, '
          f'hbm-unique {tot_unique_bytes/820e9*1e3:.2f} ms, '
          f'hbm-pair {tot_pair_bytes/820e9*1e3:.2f} ms')


if __name__ == '__main__':
    main()
