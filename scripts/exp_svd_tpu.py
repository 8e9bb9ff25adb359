"""Experiment: device SVD strategies for the per-sector DMRG truncation step.

Candidates for the per-block factorization on TPU (sizes = realistic U(1) theta
sector blocks at chi 1024..8192, d=2):

- 'svd'   : jnp.linalg.svd (QDWH-based on TPU) per block, unrolled — the baseline.
- 'gram'  : eigh of the Gram matrix M^H M (2 GEMMs + 1 eigh). Singular values via
            sqrt of eigenvalues; U = M V S^+. Accuracy ~sqrt(eps) on small S.
- 'gram_both': eigh of the smaller Gram side only (min(m, n)).
- 'qr+svd': QR reduction first when m >> n (not typical here; skipped).

Measurement: slope timing between two scan lengths (docs/DESIGN.md §3); each scan
iteration rescales the input by a result-dependent scalar to defeat loop hoisting.

Run: JAX_PLATFORMS=<default tpu> python scripts/exp_svd_tpu.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def block_sizes(chi, d=2):
    """Realistic per-sector theta matrix sizes for the bench U(1) workload."""
    charges = np.arange(-4, 5)
    weights = np.exp(-0.4 * charges ** 2)
    mults = np.maximum(1, np.round(chi * weights / weights.sum()).astype(int))
    # theta combined (vL, p0) x (vR, p1): per coupled sector, row/col dims are
    # sums over (virtual sector, physical) combinations -> roughly d * mult
    return [(int(d * m), int(d * m)) for m in mults]


def make_blocks(chi, key):
    sizes = block_sizes(chi)
    keys = jax.random.split(key, len(sizes))
    return [jax.random.normal(k, s, dtype=jnp.float32) for k, s in zip(keys, sizes)]


def svd_all(blocks):
    outs = []
    for b in blocks:
        u, s, vh = jnp.linalg.svd(b, full_matrices=False)
        outs.append((u, s, vh))
    return outs


def gram_all(blocks):
    outs = []
    for b in blocks:
        m, n = b.shape
        if m >= n:
            g = b.T.conj() @ b
            w, v = jnp.linalg.eigh(g)           # ascending
            w = w[::-1]
            v = v[:, ::-1]
            s = jnp.sqrt(jnp.maximum(w, 0.))
            u = (b @ v) / jnp.maximum(s, 1e-30)[None, :]
            outs.append((u, s, v.T.conj()))
        else:
            g = b @ b.T.conj()
            w, v = jnp.linalg.eigh(g)
            w = w[::-1]
            v = v[:, ::-1]
            s = jnp.sqrt(jnp.maximum(w, 0.))
            vh = (v.T.conj() @ b) / jnp.maximum(s, 1e-30)[:, None]
            outs.append((v, s, vh))
    return outs


def time_fn(fn, blocks, lengths=(3, 13), repeats=3):
    def make_run(n_iter):
        @jax.jit
        def run(blocks):
            def body(bs, _):
                outs = fn(bs)
                nrm = sum(jnp.sum(s) for (_, s, _) in outs)
                scale = 1. + 0. * nrm
                return [b * scale for b in bs], nrm

            bs, nrms = jax.lax.scan(body, blocks, None, length=n_iter)
            return nrms[-1]
        return run

    times = {}
    for n in lengths:
        run = make_run(n)
        float(run(blocks))  # compile + sync via scalar fetch
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(blocks))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n1, n2 = lengths
    return (times[n2] - times[n1]) / (n2 - n1)


def accuracy(chi):
    key = jax.random.PRNGKey(0)
    blocks = make_blocks(chi, key)
    b = blocks[len(blocks) // 2]
    u, s, vh = jnp.linalg.svd(b, full_matrices=False)
    outs = gram_all([b])[0]
    s2 = outs[1]
    rel = np.abs(np.asarray(s) - np.asarray(s2)) / float(s[0])
    return float(rel.max()), float(np.median(rel))


def main():
    print(f'devices: {jax.devices()}')
    for chi in (1024, 4096, 8192):
        key = jax.random.PRNGKey(0)
        blocks = make_blocks(chi, key)
        dims = [b.shape for b in blocks]
        print(f'chi={chi}: {len(blocks)} blocks, max {max(dims)}')
        t_svd = time_fn(svd_all, blocks)
        print(f'  svd (QDWH unrolled):  {t_svd * 1e3:9.3f} ms')
        t_gram = time_fn(gram_all, blocks)
        print(f'  gram (eigh+GEMMs):    {t_gram * 1e3:9.3f} ms   speedup {t_svd / t_gram:.2f}x')
        amax, amed = accuracy(chi)
        print(f'  gram rel err vs svd: max {amax:.2e} med {amed:.2e}')


if __name__ == '__main__':
    main()
