"""Native SU(N) Clebsch-Gordan coefficients in the Gelfand-Tsetlin basis.

Implements the numerical algorithm of Alex, Kalus, Huckleberry & von Delft,
J. Math. Phys. 52, 023507 (2011): irrep bases are Gelfand-Tsetlin (GT)
patterns; su(2)-subalgebra lowering operators have closed-form matrix elements;
the Clebsch-Gordan tensor for ``c in a (x) b`` is obtained by solving for the
highest-weight null space of all raising operators in the product space and
propagating downward with lowering operators (least squares per weight level).

This removes the reference's hard dependency on precomputed HDF5 data files for
SU(N) topological data (reference cyten/symmetries/_symmetries.py:1598-1622
loads CG/F/R from files; here they are computed on demand and cached).

Conventions:
- sectors are first rows of normalized GT patterns (length N, non-increasing,
  last entry 0), as in ``groups.SUN``;
- basis order within an irrep: GT patterns sorted lexicographically by their
  concatenated rows (deterministic, matches pattern enumeration order);
- all CG coefficients are real; the multiplicity gauge is fixed by
  Gram-Schmidt on the raising-operator null space in row-echelon order with a
  positive leading coefficient.
"""

from __future__ import annotations

import itertools as it
from functools import lru_cache

import numpy as np

__all__ = ['gt_patterns', 'gt_weight', 'lowering_matrix', 'raising_matrix',
           'clebsch_gordan', 'irrep_dim']


@lru_cache(maxsize=None)
def gt_patterns(lam: tuple) -> tuple:
    """All GT patterns with top row `lam`, sorted lexicographically.

    A pattern is a tuple of rows (top row first, decreasing lengths), each row a
    tuple, satisfying betweenness: row[k][j] >= row[k+1][j] >= row[k][j+1].
    """
    N = len(lam)
    rows = [tuple(int(x) for x in lam)]

    def extend(patterns, upper):
        """All rows below `upper` (length len(upper) - 1)."""
        n = len(upper) - 1
        ranges = [range(upper[j + 1], upper[j] + 1) for j in range(n)]
        out = []
        for row in it.product(*ranges):
            if all(row[j] >= row[j + 1] for j in range(n - 1)):
                out.append(row)
        return out

    partial = [tuple(rows)]
    for length in range(N - 1, 0, -1):
        new = []
        for p in partial:
            for row in extend(None, p[-1]):
                new.append(p + (row,))
        partial = new
    return tuple(sorted(partial))


def irrep_dim(lam: tuple) -> int:
    return len(gt_patterns(tuple(int(x) for x in lam)))


def gt_weight(pattern: tuple) -> tuple:
    """Weight vector (N entries): w_l = rowsum(length l) - rowsum(length l-1).

    Rows are stored top-first; row of length l is pattern[N - l].
    """
    N = len(pattern[0])
    sums = [0] * (N + 1)
    for row in pattern:
        sums[len(row)] = sum(row)
    return tuple(sums[l] - sums[l - 1] for l in range(1, N + 1))


@lru_cache(maxsize=None)
def lowering_matrix(lam: tuple, l: int) -> np.ndarray:
    """Matrix of the su(2)_l lowering operator J^-_l in the GT basis of `lam`.

    ``l`` in 1..N-1 acts on the row of length l. Gelfand-Tsetlin closed form
    (Alex et al. eq. (6)): lowering decrements one entry of row l; with shifted
    entries ``a[j, m] = m[j, m] - j`` (1-based j),

        <m - d_{k,l}| J^-_l |m> = sqrt(
            - prod_{j=1..l+1}(a[j,l+1] - a[k,l] + 1) * prod_{j=1..l-1}(a[j,l-1] - a[k,l])
            / (prod_{j!=k}(a[j,l] - a[k,l] + 1)(a[j,l] - a[k,l])) )
    """
    pats = gt_patterns(lam)
    index = {p: i for i, p in enumerate(pats)}
    N = len(lam)
    D = len(pats)
    M = np.zeros((D, D))
    row_pos = N - l  # row of length l

    for i, p in enumerate(pats):
        row_l = p[row_pos]
        row_up = p[row_pos - 1]                       # length l + 1
        row_dn = p[row_pos + 1] if l > 1 else ()      # length l - 1

        def a(row, j):  # 1-based j
            return row[j - 1] - j

        for k in range(1, l + 1):
            new_row = list(row_l)
            new_row[k - 1] -= 1
            q = p[:row_pos] + (tuple(new_row),) + p[row_pos + 1:]
            j2 = index.get(q)
            if j2 is None:
                continue  # betweenness violated
            num = 1.0
            for j in range(1, l + 2):
                num *= a(row_up, j) - a(row_l, k) + 1
            for j in range(1, l):
                num *= a(row_dn, j) - a(row_l, k)
            den = 1.0
            for j in range(1, l + 1):
                if j == k:
                    continue
                den *= (a(row_l, j) - a(row_l, k) + 1) * (a(row_l, j) - a(row_l, k))
            val = -num / den
            if val < 0:
                raise ValueError(f'negative radicand {val} for {p}, k={k}, l={l}')
            M[j2, i] = np.sqrt(val)
    return M


def raising_matrix(lam: tuple, l: int) -> np.ndarray:
    """J^+_l = (J^-_l)^T (matrix elements are real)."""
    return lowering_matrix(lam, l).T


def _simple_root(l: int, N: int) -> np.ndarray:
    alpha = np.zeros(N, int)
    alpha[l - 1] = 1
    alpha[l] = -1
    return alpha


def clebsch_gordan(lam_a: tuple, lam_b: tuple, lam_c: tuple, mult: int
                   ) -> np.ndarray:
    """CG tensor X[mu, i_a, i_b, i_c] for lam_c in lam_a (x) lam_b.

    `mult` is the expected outer multiplicity (from Littlewood-Richardson);
    asserted against the computed null-space dimension. Satisfies
    ``sum_{ia ib} X[mu,ia,ib,m] X[nu,ia,ib,m'] = delta_{mu nu} delta_{m m'}``.
    """
    lam_a = tuple(int(x) for x in lam_a)
    lam_b = tuple(int(x) for x in lam_b)
    lam_c = tuple(int(x) for x in lam_c)
    N = len(lam_a)
    # sectors are column-normalized (last entry 0) but GT weights count boxes:
    # lift lam_c to the U(N) representative with |c| = |a| + |b| (adding full
    # columns shifts all weights uniformly and leaves the SU(N) irrep unchanged)
    boxes = sum(lam_a) + sum(lam_b) - sum(lam_c)
    assert boxes % N == 0, 'inconsistent box counts'
    lam_c = tuple(x + boxes // N for x in lam_c)
    Pa, Pb, Pc = gt_patterns(lam_a), gt_patterns(lam_b), gt_patterns(lam_c)
    wa = np.array([gt_weight(p) for p in Pa])
    wb = np.array([gt_weight(p) for p in Pb])
    wc = [gt_weight(p) for p in Pc]
    da, db, dc = len(Pa), len(Pb), len(Pc)

    # product-space weights; states indexed (ia, ib) flattened as ia * db + ib
    w_prod = wa[:, None, :] + wb[None, :, :]

    # highest-weight pattern of c: rows are truncations of lam_c
    i_hw = max(range(dc), key=lambda i: wc[i])
    w_hw = np.array(wc[i_hw])

    # raising operators on the product space restricted to the w_hw subspace:
    # J^+_l maps weight w -> w + alpha_l; a null vector must be annihilated for
    # every l.
    sel = np.argwhere((w_prod == w_hw).all(axis=-1))
    assert len(sel) > 0, 'no product states at the highest weight'
    sub_index = {(int(ia), int(ib)): t for t, (ia, ib) in enumerate(sel)}
    rows = []
    for l in range(1, N):
        Ea = raising_matrix(lam_a, l)
        Eb = raising_matrix(lam_b, l)
        # target states have weight w_hw + alpha_l
        w_t = w_hw + _simple_root(l, N)
        targets = np.argwhere((w_prod == w_t).all(axis=-1))
        for ja, jb in targets:
            row = np.zeros(len(sel))
            for (ia, ib), t in sub_index.items():
                val = 0.0
                if jb == ib:
                    val += Ea[ja, ia]
                if ja == ia:
                    val += Eb[jb, ib]
                row[t] = val
            rows.append(row)
    if rows:
        A = np.array(rows)
        _, s, vh = np.linalg.svd(A)
        rank = int(np.sum(s >= 1e-10))
        null = vh[rank:]
    else:
        null = np.eye(len(sel))
    assert null.shape[0] == mult, \
        f'null space dim {null.shape[0]} != LR multiplicity {mult}'

    # deterministic gauge: row-reduce then Gram-Schmidt, leading coefficient > 0
    basis = []
    for v in null:
        for u_ in basis:
            v = v - np.dot(u_, v) * u_
        nrm = np.linalg.norm(v)
        if nrm < 1e-8:
            continue
        v = v / nrm
        lead = np.argmax(np.abs(v) > 1e-10)
        if v[lead] < 0:
            v = -v
        basis.append(v)
    assert len(basis) == mult

    # propagate down: solve for CG vectors level by level (decreasing weight)
    X = np.zeros((mult, da, db, dc))
    for mu, v in enumerate(basis):
        for (ia, ib), t in sub_index.items():
            X[mu, ia, ib, i_hw] = v[t]

    # group c-states by weight, order by decreasing (sum of first k components)
    levels: dict[tuple, list[int]] = {}
    for i, w in enumerate(wc):
        levels.setdefault(tuple(w), []).append(i)
    # topological order: height = sum_k (k) * w... use dominance: sort by
    # cumulative-sum vector descending (standard weight poset linearization)
    def height(w):
        return tuple(np.cumsum(w[:-1]))

    order = sorted(levels.keys(), key=height, reverse=True)
    La = [lowering_matrix(lam_a, l) for l in range(1, N)]
    Lb = [lowering_matrix(lam_b, l) for l in range(1, N)]
    Lc = [lowering_matrix(lam_c, l) for l in range(1, N)]
    done = {tuple(w_hw)}
    for w in order:
        if tuple(w) in done:
            continue
        states = levels[w]
        # equations: for every l and every already-done source state at
        # w + alpha_l:  sum_{m' at w} Lc[m', m] X[m'] = (La (x) 1 + 1 (x) Lb) X[m]
        A_mat = []
        rhs_list = []
        for l in range(1, N):
            w_src = tuple(np.array(w) + _simple_root(l, N))
            for m in levels.get(w_src, []):
                if w_src not in done:
                    continue
                col = Lc[l - 1][:, m]
                A_mat.append([col[mp] for mp in states])
                low_a = np.einsum('ca,uab->ucb', La[l - 1], X[:, :, :, m])
                low_b = np.einsum('db,uab->uad', Lb[l - 1], X[:, :, :, m])
                rhs_list.append(low_a + low_b)
        if not A_mat:
            continue  # weight not reachable (no states populated)
        A_mat = np.array(A_mat)                        # [eq, n_states]
        rhs = np.stack(rhs_list, axis=0)               # [eq, mult, da, db]
        sol, *_ = np.linalg.lstsq(
            A_mat, rhs.reshape(len(rhs_list), -1), rcond=None)
        sol = sol.reshape(len(states), mult, da, db)
        for s_i, m_c in enumerate(states):
            X[:, :, :, m_c] = sol[s_i]
        done.add(tuple(w))

    # validate isometry
    G = np.einsum('uabm,vabn->umvn', X, X).reshape(mult * dc, mult * dc)
    err = np.max(np.abs(G - np.eye(mult * dc)))
    if err > 1e-8:
        raise ValueError(f'CG isometry violated: {err:.2e} for '
                         f'{lam_a} x {lam_b} -> {lam_c}')
    return X
