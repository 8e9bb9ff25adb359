"""Host-side planning of leg permutations for the fusion-tree backend.

Role-equivalent to the reference's instruction engine + tree mappings
(cyten/backends/fusion_tree_backend.py: PermuteLegsInstructionEngine :2698,
Braid/Bend/TwistInstruction :2566-2697, TreePairMapping :3181,
FactorizedTreeMapping :3373, transform_tensor :3297).

TPU-first redesign: instead of transforming tensors through a chain of elementary
instructions at *runtime*, we compose the full sequence of moves **symbolically on
tree pairs** at trace time and emit one static plan — a list of (gather slice, scale,
multiplicity-axis permutation, scatter slice) entries per coupled sector — which the
backend applies as dense on-device ops. Plans are memoized on the
(codomain, domain, permutation, levels) key, so repeated calls (e.g. inside DMRG
sweeps) reuse them.

Move conventions (tensor ``T = sum block[Y, X] hconj(Y) ∘ X``; Y = codomain tree,
X = domain tree). ``over`` always means: the plane-LEFT strand of the exchanged
pair passes in front (which the level rule translates to "the higher level goes
over", reference _tensors.py:5519-5537):

- domain braid (plane-adjacent domain factors j, j+1): ``T' = T ∘ B``, i.e.
  ``X -> X.braid(j, not over)`` — the tree-level ``overbraid`` flag is mirrored
  relative to the plane-level chirality, exactly like for codomain trees below.
  Pinned amplitude-by-amplitude against the reference implementation
  (tests/test_ref_oracle_braiding.py); with the un-mirrored flag, a codomain
  crossing and a domain crossing of the same pair at the same heights do NOT
  cancel, which breaks every braid-and-bend roundtrip
  (tests/test_ftb_structure.py::test_long_range_braid_roundtrip).
- codomain braid: ``T' = B ∘ T`` and ``B ∘ hconj(Y) = hconj(Y ∘ B^dagger)``, i.e.
  ``Y -> Y.braid(j, not over, do_conj=True)`` (the vertical mirror flips chirality).
- right bends: ``FusionTree.bend_leg`` moves the last domain leg up
  (``bend_downward=True``) or the last codomain leg down (``False``).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from math import prod

import numpy as np

from ..symmetries import TensorProduct
from ..symmetries.trees import FusionTree, fusion_trees
from ..tools.misc import iter_common_sorted_arrays

__all__ = ['permute_legs_plan', 'PermutePlan', 'PlanEntry']

CUTOFF = 1e-16

# chirality of the domain braids inside the left-bend composites (False = "the
# moving leg passes in front", in the plane-level `over` convention of
# _moves_factory). Validated by the planar rotation-roundtrip and double-transpose
# identities on Fibonacci tensors, the golden-chain benchmark energies, and the
# two-convention coherence test (test_fusion_tree_backend.py::test_lb_dm_chirality).
_LB_DM = False


def _rotation_direction(rot: int, n_flat: int) -> int:
    """Signed rotation for the planar path: the shorter way around.

    Module-level so tests can force the long direction and verify the coherence
    of the left-bend composites against the pure-right route
    (test_fusion_tree_backend.py::test_lb_dm_chirality).
    """
    return rot if rot <= n_flat // 2 else rot - n_flat


@dataclass(frozen=True)
class PlanEntry:
    old_block_key: tuple  # (i, j) into old (co)domain sector decompositions
    old_row_slc: slice
    old_col_slc: slice
    new_block_key: tuple
    new_row_slc: slice
    new_col_slc: slice
    coeff: complex
    mult_shape: tuple  # old sub-block as [row mults..., col mults...]
    axis_perm: tuple  # permutation to the new [row mults..., col mults...] order
    new_shape_2d: tuple


@dataclass(frozen=True)
class PermutePlan:
    entries: tuple
    complex_coeffs: bool


@dataclass(frozen=True)
class PlanGroup:
    """Entries of a :class:`PermutePlan` sharing one (mult_shape, axis_perm):
    a tree-pair mixing that acts as ``coeff [n_dst, n_src]`` on stacked
    sub-blocks with a SINGLE batched transpose — i.e. one small GEMM instead
    of ``nnz(coeff)`` slice/scale/scatter triples."""

    src: tuple        # ((old_block_key, old_row_slc, old_col_slc), ...)
    dst: tuple        # ((new_block_key, new_row_slc, new_col_slc), ...)
    coeff: object     # np.ndarray [n_dst, n_src]
    mult_shape: tuple
    axis_perm: tuple
    new_shape_2d: tuple


@dataclass(frozen=True)
class GroupedPlan:
    groups: tuple
    complex_coeffs: bool


@functools.lru_cache(maxsize=512)
def grouped_plan(plan: PermutePlan) -> GroupedPlan:
    """Compile a plan's entries into per-shape-class coefficient GEMMs.

    The ``axis_perm`` is global to a plan and ``mult_shape``/``new_shape_2d``
    are determined by the source tree pair's uncoupled sectors, so grouping by
    (mult_shape, new_shape_2d) collects exactly the entries whose sub-blocks
    can be stacked; the (src tree pair -> dst tree pair) coefficients then form
    a small dense matrix (cf. reference fusion_tree_backend.py:3181-3370,
    whose TreePairMapping stays an entry-at-a-time instruction stream)."""
    groups: dict = {}
    for e in plan.entries:
        key = (e.mult_shape, e.axis_perm, e.new_shape_2d)
        src_map, dst_map, triples = groups.setdefault(key, ({}, {}, []))
        s = (e.old_block_key, e.old_row_slc, e.old_col_slc)
        d = (e.new_block_key, e.new_row_slc, e.new_col_slc)
        si = src_map.setdefault(s, len(src_map))
        di = dst_map.setdefault(d, len(dst_map))
        triples.append((di, si, e.coeff))
    out = []
    ctype = complex if plan.complex_coeffs else float
    for (mult_shape, axis_perm, new_shape_2d), (src_map, dst_map, triples) \
            in groups.items():
        C = np.zeros((len(dst_map), len(src_map)), dtype=ctype)
        for di, si, c in triples:
            C[di, si] += c
        out.append(PlanGroup(src=tuple(src_map), dst=tuple(dst_map), coeff=C,
                             mult_shape=mult_shape, axis_perm=axis_perm,
                             new_shape_2d=new_shape_2d))
    return GroupedPlan(groups=tuple(out), complex_coeffs=plan.complex_coeffs)


@dataclass(frozen=True)
class BatchedGroup:
    """One shape-class of a plan, compiled to a constant-op-count program:
    ``len(gathers)`` batched gathers + 1 transform (+1 GEMM or coeff-mul) +
    ``len(scatters)`` batched scatter-adds, independent of the entry count.
    This is the compile-time lever for the fusion-tree static mode (VERDICT r2
    #3): the per-entry formulation emits O(entries) slice/scatter XLA ops and
    drives TPU compile of the fused SU(2) bond update to minutes."""

    mode: str                # 'gemm' (dense coeff GEMM) | 'sparse' (per-entry)
    mult_shape: tuple
    axis_perm: tuple
    old_shape_2d: tuple      # gather window (rows, cols) in the old blocks
    new_shape_2d: tuple      # scatter window in the new blocks
    gathers: tuple           # ((old_block_key, starts[n, 2] ndarray), ...)
    coeff: object            # 'gemm': [n_dst_kept, n_src]; 'sparse': [n_entries]
    scatters: tuple          # ((new_block_key, rows_idx ndarray | None,
    #                           starts[n, 2] ndarray), ...)


@dataclass(frozen=True)
class BatchedProgram:
    groups: tuple
    complex_coeffs: bool


@functools.lru_cache(maxsize=1024)
def batched_program(plan: PermutePlan, present: tuple,
                    max_block: int) -> BatchedProgram:
    """Compile ``grouped_plan(plan)`` + the set of PRESENT old blocks into a
    fully index-batched program (see :class:`BatchedGroup`).

    ``present`` is the sorted tuple of old block keys the tensor actually has
    (host metadata) — missing blocks are structural zeros, so their columns are
    dropped here once instead of being skipped entry-by-entry at apply time.
    Groups whose sub-block volume exceeds ``max_block`` use the 'sparse' mode
    (per-entry coefficients, FLOPs ~ nnz instead of the dense n_dst*n_src GEMM
    — the measured runtime crossover, config.fusion_tree_grouped_max_block),
    but with the same O(blocks) op count."""
    from math import prod

    present_set = set(present)
    out = []
    for g in grouped_plan(plan).groups:
        avail = [i for i, (obk, _, _) in enumerate(g.src) if obk in present_set]
        if not avail:
            continue
        h = g.src[avail[0]][1].stop - g.src[avail[0]][1].start
        w = g.src[avail[0]][2].stop - g.src[avail[0]][2].start
        mode = 'sparse' if prod(g.mult_shape) > max_block else 'gemm'
        if mode == 'gemm':
            buckets: dict = {}
            stacked = []
            for i in avail:
                obk = g.src[i][0]
                buckets.setdefault(obk, []).append(i)
            for obk, idcs in buckets.items():
                stacked.extend(idcs)
            gathers = tuple(
                (obk, np.array([[g.src[i][1].start, g.src[i][2].start]
                                for i in idcs], np.int64))
                for obk, idcs in buckets.items())
            C = g.coeff[:, stacked]
            nz = np.flatnonzero(np.abs(C).max(axis=1) > 0)
            if len(nz) == 0:
                continue
            C = C[nz]
            dst_buckets: dict = {}
            for row, di in enumerate(nz):
                nbk, nrs, ncs = g.dst[int(di)]
                dst_buckets.setdefault(nbk, []).append(
                    (row, nrs.start, ncs.start))
            scatters = tuple(
                (nbk,
                 None if len(rows) == len(nz) and
                 all(r == k for k, (r, _, _) in enumerate(rows))
                 else np.array([r for r, _, _ in rows], np.intp),
                 np.array([[rs, cs] for _, rs, cs in rows], np.int64))
                for nbk, rows in dst_buckets.items())
            out.append(BatchedGroup(
                mode='gemm', mult_shape=g.mult_shape, axis_perm=g.axis_perm,
                old_shape_2d=(h, w), new_shape_2d=g.new_shape_2d,
                gathers=gathers, coeff=C, scatters=scatters))
        else:
            # entries = nonzeros of the coeff matrix restricted to avail srcs
            avail_set = set(avail)
            entries = [(di, si, g.coeff[di, si])
                       for di in range(g.coeff.shape[0])
                       for si in range(g.coeff.shape[1])
                       if si in avail_set and g.coeff[di, si] != 0]
            if not entries:
                continue
            # order by source block (first-appearance) for bucketed gathers
            buckets = {}
            for k, (di, si, c) in enumerate(entries):
                buckets.setdefault(g.src[si][0], []).append(k)
            entries = [entries[k] for idcs in buckets.values() for k in idcs]
            gathers = []
            pos = 0
            for obk, idcs in buckets.items():
                chunk = entries[pos:pos + len(idcs)]
                gathers.append((obk, np.array(
                    [[g.src[si][1].start, g.src[si][2].start]
                     for _, si, _ in chunk], np.int64)))
                pos += len(idcs)
            gathers = tuple(gathers)
            coeff_vec = np.array([c for _, _, c in entries])
            dst_buckets = {}
            for k, (di, _, _) in enumerate(entries):
                nbk, nrs, ncs = g.dst[int(di)]
                dst_buckets.setdefault(nbk, []).append((k, nrs.start, ncs.start))
            scatters = tuple(
                (nbk,
                 None if len(rows) == len(entries) and
                 all(r == k for k, (r, _, _) in enumerate(rows))
                 else np.array([r for r, _, _ in rows], np.intp),
                 np.array([[rs, cs] for _, rs, cs in rows], np.int64))
                for nbk, rows in dst_buckets.items())
            out.append(BatchedGroup(
                mode='sparse', mult_shape=g.mult_shape, axis_perm=g.axis_perm,
                old_shape_2d=(h, w), new_shape_2d=g.new_shape_2d,
                gathers=gathers, coeff=coeff_vec, scatters=scatters))
    return BatchedProgram(groups=tuple(out),
                          complex_coeffs=plan.complex_coeffs)


class _PairMap:
    """Linear map on (codomain tree, domain tree) pairs, composed move by move."""

    def __init__(self, pairs):
        self.map = {p: {p: 1.0} for p in pairs}

    def apply(self, move_fn):
        for old, cur in self.map.items():
            new: dict = {}
            for pair, coeff in cur.items():
                for pair2, c2 in move_fn(pair).items():
                    tot = coeff * c2
                    if pair2 in new:
                        new[pair2] += tot
                    else:
                        new[pair2] = tot
            self.map[old] = {p: c for p, c in new.items() if abs(c) > CUTOFF}


def _all_pairs(codomain: TensorProduct, domain: TensorProduct):
    """All (Y, X) tree pairs over common coupled sectors."""
    sym = codomain.symmetry
    cod_dual = [l.is_dual for l in codomain.flat_legs]
    dom_dual = [l.is_dual for l in domain.flat_legs]
    pairs = []
    for i, j in iter_common_sorted_arrays(codomain.sector_decomposition,
                                          domain.sector_decomposition):
        c = codomain.sector_decomposition[i]
        Ys = []
        for unc, _ in codomain.iter_uncoupled():
            Ys.extend(fusion_trees(sym, unc, c, cod_dual))
        Xs = []
        for unc, _ in domain.iter_uncoupled():
            Xs.extend(fusion_trees(sym, unc, c, dom_dual))
        for Y in Ys:
            for X in Xs:
                pairs.append((Y, X))
    return pairs


def _moves_factory(sym):
    symmetric = sym.has_symmetric_braid

    def braid_domain(j, over):
        def fn(pair):
            Y, X = pair
            return {(Y, X2): c
                    for X2, c in X.braid(j, overbraid=not over).items()}

        return fn

    def braid_codomain(j, over):
        def fn(pair):
            Y, X = pair
            return {(Y2, X): c
                    for Y2, c in Y.braid(j, overbraid=not over, do_conj=True).items()}

        return fn

    def bend_up(pair):
        Y, X = pair
        return FusionTree.bend_leg(Y, X, bend_downward=True)

    def bend_down(pair):
        Y, X = pair
        return FusionTree.bend_leg(Y, X, bend_downward=False)

    def twist_domain_first(overtwist):
        """Twist factor of the first domain leg (used by composite left bends)."""

        def fn(pair):
            Y, X = pair
            return {(Y, X2): c for X2, c in X.twist([0], overtwist=overtwist).items()}

        return fn

    def twist_codomain_first(overtwist):
        # splitting-tree twist: opposite twist on the fusion-tree representative
        # gives one conj; representing t = dagger(t_fusion) conjugates coefficients
        # again — the two conjs cancel (cf. reference fusion_tree_backend.py:3266-74)
        def fn(pair):
            Y, X = pair
            res = Y.twist([0], overtwist=overtwist)
            return {(Y2, X): c for Y2, c in res.items()}

        return fn

    return (braid_domain, braid_codomain, bend_up, bend_down, twist_domain_first,
            twist_codomain_first)


def permute_legs_plan(codomain: TensorProduct, domain: TensorProduct,
                      codomain_idcs: tuple, domain_idcs: tuple,
                      levels: tuple | None,
                      bend_right: bool | None = None) -> PermutePlan | None:
    """Compute (and cache) the permutation plan. Returns None if levels are
    required (non-symmetric braiding with actual crossings) but not given.

    ``bend_right=True/False`` forces every bend onto the right/left side of the
    tensor (reference _tensors.py:5524-5536); ``None`` leaves the side to the
    planner (shorter planar rotation — crossing-free, the anyon-friendly
    default)."""
    return _cached_plan(codomain, domain, tuple(codomain_idcs), tuple(domain_idcs),
                        levels, bend_right)


@functools.lru_cache(maxsize=512)
def _cached_plan(codomain, domain, codomain_idcs, domain_idcs, levels,
                 bend_right=None):
    sym = codomain.symmetry
    K = codomain.num_factors
    n = K + domain.num_factors

    # --- flat-leg tags -------------------------------------------------------------
    cod_flat = codomain.flat_legs
    dom_flat = domain.flat_legs  # factor order
    Jf = len(cod_flat)
    Mf = len(dom_flat)

    def factor_flat_tags(i):
        """Flat tags of the factor at legs position i, in *legs order*."""
        if i < K:
            return list(codomain.flat_leg_idcs(i))
        k = n - 1 - i
        return [Jf + t for t in reversed(domain.flat_leg_idcs(k))]

    # target tag lists
    target_cod = []
    for i in codomain_idcs:
        tags = factor_flat_tags(i)
        # a factor's flats in legs order == codomain order for codomain factors;
        # for factors moving from the domain, the codomain order is the legs order
        target_cod.extend(tags)
    target_dom = []
    for i in domain_idcs:
        tags = factor_flat_tags(i)
        # domain factor order is the reverse of legs order
        target_dom.extend(reversed(tags))

    # levels per tag
    if levels is not None:
        lv = list(levels)
        tag_level = {}
        for i in range(n):
            for t in factor_flat_tags(i):
                tag_level[t] = lv[i]
    else:
        tag_level = None

    # --- state: current tag arrangement -----------------------------------------------
    cod_tags = list(range(Jf))
    dom_tags = list(range(Jf, Jf + Mf))
    (braid_domain, braid_codomain, bend_up, bend_down, twist_domain_first,
     twist_codomain_first) = _moves_factory(sym)
    symmetric = sym.has_symmetric_braid
    moves = []  # list of move fns

    braids_needed = False

    def chirality(t1, t2):
        """True if t1 goes over t2."""
        nonlocal braids_needed
        braids_needed = True
        if tag_level is None:
            return True
        return tag_level[t1] > tag_level[t2]

    def do_braid_cod(j, over=None):
        if over is None:
            over = chirality(cod_tags[j], cod_tags[j + 1])
        moves.append(braid_codomain(j, over))
        cod_tags[j], cod_tags[j + 1] = cod_tags[j + 1], cod_tags[j]

    def do_braid_dom(j, over=None):
        if over is None:
            over = chirality(dom_tags[j], dom_tags[j + 1])
        moves.append(braid_domain(j, over))
        dom_tags[j], dom_tags[j + 1] = dom_tags[j + 1], dom_tags[j]

    def do_bend_down():
        moves.append(bend_down)
        dom_tags.append(cod_tags.pop())

    def do_bend_up():
        moves.append(bend_up)
        cod_tags.append(dom_tags.pop())

    def do_bend_down_left():
        """cod_0 -> dom_0: twist the leg, slide it in front of everything around the
        right side (cf. reference fusion_tree_backend.py:2864-2877: by coherence
        this equals the left bend)."""
        moves.append(twist_codomain_first(overtwist=True))
        for j in range(0, len(cod_tags) - 1):
            do_braid_cod(j, over=True)  # moving leg (at j) goes in front
        do_bend_down()
        for j in range(len(dom_tags) - 2, -1, -1):
            do_braid_dom(j, over=_LB_DM)  # moving leg at j + 1 in front

    def do_bend_up_left():
        """dom_0 -> cod_0: twist the leg, slide it in front of everything around the
        right side (cf. reference fusion_tree_backend.py:2936-2941)."""
        moves.append(twist_domain_first(overtwist=False))
        for j in range(0, len(dom_tags) - 1):
            do_braid_dom(j, over=not _LB_DM)  # moving leg (at j) in front
        do_bend_up()
        for j in range(len(cod_tags) - 2, -1, -1):
            do_braid_cod(j, over=False)  # moving leg at j + 1 in front

    # --- planar fast path: the permutation is a cyclic rotation -> bends only.
    # Only used when legs actually switch sides: in-side reorderings are *braids*
    # (crossings as drawn), not rotations — for twisted sectors (fermions, anyons)
    # the two differ by twist factors (cf. reference TwistInstruction notes).
    new_order = list(codomain_idcs) + list(domain_idcs)[::-1]
    flat_new_order = []
    for i in new_order:
        flat_new_order.extend(factor_flat_tags(i))
    n_flat = Jf + Mf
    # old circular (legs) order expressed in tags
    circ_old = list(range(Jf)) + list(range(Jf + Mf - 1, Jf - 1, -1))
    rot = None
    sides_change = set(target_cod) != set(range(Jf))
    if sides_change and flat_new_order and n_flat > 0:
        try:
            start = circ_old.index(flat_new_order[0])
        except ValueError:
            start = None
        if start is not None and flat_new_order == [
                circ_old[(start + k) % n_flat] for k in range(n_flat)]:
            rot = start
    if rot is not None and bend_right is not None and not symmetric \
            and not (bend_right is True and rot == 0):
        # an explicit bend side was requested: the planar rotation would wrap
        # legs around whichever edge is shorter, so only take it when that
        # matches (rot == 0 walks only the right-edge cut = pure right bends).
        # A nonzero rotation realized with only `bend_right`-side bends needs
        # braids instead (crossings as drawn) -> route through the general path.
        rot = None
    if rot is not None:
        K_new = len(target_cod)
        # choose the shorter rotation direction; walk the two boundary cuts
        rot_signed = _rotation_direction(rot, n_flat)
        left, right = 0, Jf
        target_left, target_right = rot_signed, rot_signed + K_new
        while (left, right) != (target_left, target_right):
            if right < target_right and dom_tags:
                do_bend_up()
                right += 1
            elif right > target_right and cod_tags:
                do_bend_down()
                right -= 1
            elif left < target_left and cod_tags:
                do_bend_down_left()
                left += 1
            elif left > target_left and dom_tags:
                do_bend_up_left()
                left -= 1
            else:  # pragma: no cover
                raise RuntimeError('planar routing stuck')
    elif bend_right is False and not symmetric:
        # all-LEFT bends: mirror of the right route below — move legs to the
        # plane-left end of their side, then bend around the left edge (the
        # left composites include the twist; see do_bend_*_left).
        to_dom = set(target_dom)
        while any(t in to_dom for t in cod_tags):
            idx = min(i for i, t in enumerate(cod_tags) if t in to_dom)
            for j in range(idx - 1, -1, -1):
                do_braid_cod(j)
            do_bend_down_left()
        to_cod = set(target_cod)
        while any(t in to_cod for t in dom_tags):
            idx = min(i for i, t in enumerate(dom_tags) if t in to_cod)
            for j in range(idx - 1, -1, -1):
                do_braid_dom(j)
            do_bend_up_left()
        want = {t: i for i, t in enumerate(target_cod)}
        for i in range(len(cod_tags)):
            for j in range(len(cod_tags) - 1):
                if want[cod_tags[j]] > want[cod_tags[j + 1]]:
                    do_braid_cod(j)
        want = {t: i for i, t in enumerate(target_dom)}
        for i in range(len(dom_tags)):
            for j in range(len(dom_tags) - 1):
                if want[dom_tags[j]] > want[dom_tags[j + 1]]:
                    do_braid_dom(j)
    else:
        # 1) move codomain legs that belong in the domain: rightmost first
        to_dom = set(target_dom)
        while any(t in to_dom for t in cod_tags):
            idx = max(i for i, t in enumerate(cod_tags) if t in to_dom)
            for j in range(idx, len(cod_tags) - 1):
                do_braid_cod(j)
            do_bend_down()
        # 2) move domain legs that belong in the codomain
        to_cod = set(target_cod)
        while any(t in to_cod for t in dom_tags):
            idx = max(i for i, t in enumerate(dom_tags) if t in to_cod)
            for j in range(idx, len(dom_tags) - 1):
                do_braid_dom(j)
            do_bend_up()
        # 3) sort codomain to target order (bubble sort)
        want = {t: i for i, t in enumerate(target_cod)}
        for i in range(len(cod_tags)):
            for j in range(len(cod_tags) - 1):
                if want[cod_tags[j]] > want[cod_tags[j + 1]]:
                    do_braid_cod(j)
        want = {t: i for i, t in enumerate(target_dom)}
        for i in range(len(dom_tags)):
            for j in range(len(dom_tags) - 1):
                if want[dom_tags[j]] > want[dom_tags[j + 1]]:
                    do_braid_dom(j)
    assert cod_tags == target_cod and dom_tags == target_dom, \
        (cod_tags, target_cod, dom_tags, target_dom)

    if braids_needed and rot is None and not symmetric and levels is None:
        return None

    # --- compose the pair map ------------------------------------------------------------
    pairs = _all_pairs(codomain, domain)
    pm = _PairMap(pairs)
    for mv in moves:
        pm.apply(mv)

    # --- build the new (co)domain structure ------------------------------------------------
    all_flat = cod_flat + dom_flat

    def tag_leg_as_cod(t):
        leg = all_flat[t]
        return leg if t < Jf else leg.dual

    def tag_leg_as_dom(t):
        leg = all_flat[t]
        return leg.dual if t < Jf else leg

    new_codomain = TensorProduct([tag_leg_as_cod(t) for t in target_cod],
                                 symmetry=sym)
    new_domain = TensorProduct([tag_leg_as_dom(t) for t in target_dom], symmetry=sym)

    # multiplicity lookup per tag
    def tag_mult(t, sector):
        leg = all_flat[t]
        idx = leg.sector_decomposition_where(np.asarray(sector))
        return int(leg.multiplicities[idx])

    # old axis order of mult axes: [cod tags..., dom tags...]
    old_axes = list(range(Jf)) + list(range(Jf, Jf + Mf))
    new_axes = list(target_cod) + list(target_dom)
    axis_perm = tuple(old_axes.index(t) for t in new_axes)

    # --- emit entries -----------------------------------------------------------------------
    entries = []
    complex_coeffs = False
    slice_cache_old: dict = {}
    slice_cache_new: dict = {}

    def old_key_and_slices(Y, X):
        key = (Y, X)
        res = slice_cache_old.get(key)
        if res is None:
            c = Y.coupled
            i = codomain.sector_decomposition_where(np.asarray(c))
            j = domain.sector_decomposition_where(np.asarray(c))
            res = ((int(i), int(j)), codomain.tree_block_slice(Y),
                   domain.tree_block_slice(X))
            slice_cache_old[key] = res
        return res

    def new_key_and_slices(Y, X):
        key = (Y, X)
        res = slice_cache_new.get(key)
        if res is None:
            c = Y.coupled
            i = new_codomain.sector_decomposition_where(np.asarray(c))
            j = new_domain.sector_decomposition_where(np.asarray(c))
            res = ((int(i), int(j)), new_codomain.tree_block_slice(Y),
                   new_domain.tree_block_slice(X))
            slice_cache_new[key] = res
        return res

    for (Y0, X0), targets in pm.map.items():
        if not targets:
            continue
        old_bk, old_rs, old_cs = old_key_and_slices(Y0, X0)
        # mult shape: per old arrangement: Y0 uncoupled sectors on cod tags,
        # X0 uncoupled on dom tags (factor order)
        row_mults = tuple(tag_mult(t, a)
                          for t, a in zip(range(Jf), Y0.uncoupled))
        col_mults = tuple(tag_mult(t, a)
                          for t, a in zip(range(Jf, Jf + Mf), X0.uncoupled))
        mult_shape = row_mults + col_mults
        sector_of_tag = {t: a for t, a in zip(range(Jf), Y0.uncoupled)}
        sector_of_tag.update({t: a for t, a in zip(range(Jf, Jf + Mf),
                                                   X0.uncoupled)})
        new_rows = prod(tag_mult(t, sector_of_tag[t]) for t in target_cod) \
            if target_cod else 1
        new_cols = prod(tag_mult(t, sector_of_tag[t]) for t in target_dom) \
            if target_dom else 1
        for (Yf, Xf), coeff in targets.items():
            new_bk, new_rs, new_cs = new_key_and_slices(Yf, Xf)
            c = complex(coeff)
            if abs(c.imag) > 1e-300:
                complex_coeffs = True
            entries.append(PlanEntry(
                old_block_key=old_bk, old_row_slc=old_rs, old_col_slc=old_cs,
                new_block_key=new_bk, new_row_slc=new_rs, new_col_slc=new_cs,
                coeff=c if abs(c.imag) > 0 else c.real,
                mult_shape=mult_shape, axis_perm=axis_perm,
                new_shape_2d=(new_rows, new_cols)))
    return PermutePlan(entries=tuple(entries), complex_coeffs=complex_coeffs)
