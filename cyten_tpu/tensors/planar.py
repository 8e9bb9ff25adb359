"""Planar contraction DSL: braid-free multi-tensor contractions.

Role-equivalent to reference ``cyten/tensors/planar.py`` (PlanarDiagram :97,
ContractionTree :901, PlanarLinearOperator :1056, planar_contraction :1315,
planar_permute_legs :1831, planar decompositions :2057-2281,
horizontal_factorization :1102).

A :class:`PlanarDiagram` describes the contraction of several tensors by leg labels,
validated to be planar (no braids) and connected; evaluation performs pairwise
contractions in an optimized order, arranging every intermediate by *cyclic
rotations* only — safe for anyonic symmetries. Costs are tracked symbolically with
:class:`~cyten_tpu.tools.cost_polynomials.BigOPolynomial`.
"""

from __future__ import annotations

import itertools as it
import re
from typing import Sequence

from ..tools.cost_polynomials import BigOMonomial, BigOPolynomial
from ._functions import compose, permute_legs, svd, svd_apply_mask, \
    truncate_singular_values, scale_axis, qr as _qr, lq as _lq, eigh as _eigh, \
    truncated_svd as _truncated_svd, partial_trace as _partial_trace
from ._tensors import SymmetricTensor, Tensor

#: DSL symbols (reference _tensors.py:46-52): ``'T1:leg @ T2:leg'`` contracts,
#: ``'T:leg -> name'`` declares an open leg.
CONTRACT_SYMBOL = '@'
LEG_SELECT_SYMBOL = ':'
OPEN_LEG_SYMBOL = '->'

__all__ = ['CONTRACT_SYMBOL', 'LEG_SELECT_SYMBOL', 'OPEN_LEG_SYMBOL',
           'TensorPlaceholder', 'ContractionTree', 'ContractionTreeNode',
           'PlanarDiagram', 'PlanarLinearOperator', 'planar_contraction',
           'planar_permute_legs', 'planar_combine_legs', 'planar_decomposition',
           'planar_svd', 'planar_qr', 'planar_lq', 'planar_eigh',
           'planar_truncated_svd', 'planar_partial_trace', 'planar_almost_equal',
           'parse_leg_bipartition', 'horizontal_factorization']


class TensorPlaceholder:
    """Name + cyclically-ordered leg labels (+ optional symbolic dims)."""

    def __init__(self, name: str, labels: list[str], dims: dict | None = None):
        self.name = name
        self.labels = list(labels)
        self.dims = dims or {}

    def __repr__(self):
        return f'{self.name}[{", ".join(self.labels)}]'


class ContractionTreeNode:
    """Explicit parent/child node view of a contraction tree (reference planar.py:761).

    A node either represents a tensor (``value`` set, no children) or a pairwise
    contraction (both children set). Provided for API parity with the reference;
    :meth:`from_contraction_tree` converts from the nested
    :class:`ContractionTree` form this module uses internally.
    """

    def __init__(self, parent, left_child, right_child, value):
        self.parent = parent
        self.left_child = left_child
        self.right_child = right_child
        self.value = value
        if left_child is None and right_child is None and value is None:
            raise ValueError('Node must either have two children or a value')
        if (left_child is None) != (right_child is None):
            raise ValueError('Must have either none or two child nodes')

    @classmethod
    def from_contraction_tree(cls, tree: 'ContractionTree', parent=None):
        if tree.leaf is not None:
            return cls(parent, None, None, tree.leaf)
        left = cls.from_contraction_tree(tree.left)
        right = cls.from_contraction_tree(tree.right)
        node = cls(parent, left, right, None)
        left.parent = right.parent = node
        return node

    def test_sanity(self):
        assert self.parent is None or isinstance(self.parent, ContractionTreeNode)
        if self.is_leaf:
            assert self.value is not None
        else:
            assert isinstance(self.left_child, ContractionTreeNode)
            assert isinstance(self.right_child, ContractionTreeNode)
            self.left_child.test_sanity()
            self.right_child.test_sanity()

    @property
    def is_leaf(self) -> bool:
        return self.left_child is None and self.right_child is None

    def copy(self, parent=None) -> 'ContractionTreeNode':
        left = None if self.left_child is None else self.left_child.copy()
        right = None if self.right_child is None else self.right_child.copy()
        node = ContractionTreeNode(parent, left, right, self.value)
        if left is not None:
            left.parent = node
            right.parent = node
        return node

    def get_leaves(self):
        """Returns ``(leaves, num_nodes_below)``."""
        if self.is_leaf:
            return [self.value], 0
        leaves_l, n_l = self.left_child.get_leaves()
        leaves_r, n_r = self.right_child.get_leaves()
        return [*leaves_l, *leaves_r], 2 + n_l + n_r

    def remove_children(self):
        """Detach both children; returns their values."""
        assert not self.is_leaf
        a, b = self.left_child.value, self.right_child.value
        self.left_child.parent = self.right_child.parent = None
        self.left_child = self.right_child = None
        return a, b

    def pop_contraction(self):
        """Pop the next elementary (leaf-leaf) contraction, depth-first left.

        Returns ``(node_value_before, left_value, right_value, new_value)``.
        """
        if self.is_leaf:
            raise ValueError('Can not pop a contraction from a single leaf')
        if not self.left_child.is_leaf:
            return self.left_child.pop_contraction()
        if not self.right_child.is_leaf:
            return self.right_child.pop_contraction()
        before = self.value
        a, b = self.remove_children()
        self.value = new_value = f'{a} @ {b}'
        return before, a, b, new_value

    def _str_lines(self, prefix_0='', prefix=''):
        if self.is_leaf:
            return [prefix_0 + str(self.value)]
        return [prefix_0 + ('.' if self.value is None else str(self.value)),
                *self.left_child._str_lines(prefix_0=prefix + '+-',
                                            prefix=prefix + '| '),
                *self.right_child._str_lines(prefix_0=prefix + '`-',
                                             prefix=prefix + '  ')]

    def show_whole_tree(self) -> str:
        root = self
        while root.parent is not None:
            root = root.parent
        return '\n'.join(root._str_lines())

    def __repr__(self):
        leaves, _ = self.get_leaves()
        return f'<ContractionTreeNode over {leaves}>'


class ContractionTree:
    """Binary tree of pairwise contractions; leaves are tensor names."""

    def __init__(self, left, right=None):
        if right is None and isinstance(left, str):
            self.leaf = left
            self.left = self.right = None
        else:
            self.leaf = None
            self.left = left if isinstance(left, ContractionTree) \
                else ContractionTree._from_nested(left)
            self.right = right if isinstance(right, ContractionTree) \
                else ContractionTree._from_nested(right)

    @staticmethod
    def _from_nested(spec):
        if isinstance(spec, str):
            return ContractionTree(spec)
        if isinstance(spec, ContractionTree):
            return spec
        assert len(spec) == 2
        return ContractionTree(ContractionTree._from_nested(spec[0]),
                               ContractionTree._from_nested(spec[1]))

    def names(self) -> list[str]:
        if self.leaf is not None:
            return [self.leaf]
        return self.left.names() + self.right.names()

    def __repr__(self):
        if self.leaf is not None:
            return self.leaf
        return f'({self.left!r} @ {self.right!r})'


def _parse_tensors(tensors) -> dict[str, TensorPlaceholder]:
    if isinstance(tensors, dict):
        return dict(tensors)
    res = {}
    for m in re.finditer(r'(\w+)\s*\[([^\]]*)\]', tensors):
        name = m.group(1)
        labels = [l.strip() for l in m.group(2).split(',') if l.strip()]
        res[name] = TensorPlaceholder(name, labels)
    return res


def _parse_definition(definition):
    if not isinstance(definition, str):
        return [tuple(e) for e in definition]
    res = []
    for instr in definition.split(','):
        instr = instr.strip()
        if not instr:
            continue
        if CONTRACT_SYMBOL in instr:
            a, b = instr.split(CONTRACT_SYMBOL)
            t1, l1 = (x.strip() for x in a.split(LEG_SELECT_SYMBOL))
            t2, l2 = (x.strip() for x in b.split(LEG_SELECT_SYMBOL))
            res.append((t1, l1, t2, l2))
        elif OPEN_LEG_SYMBOL in instr:
            a, new = instr.split(OPEN_LEG_SYMBOL)
            t1, l1 = (x.strip() for x in a.split(LEG_SELECT_SYMBOL))
            res.append((t1, l1, None, new.strip()))
        else:
            raise ValueError(f'cannot parse instruction {instr!r}')
    return res


class PlanarDiagram:
    """A braid-free contraction of several tensors. See module docstring and the
    reference docstring (planar.py:97-200) for the DSL."""

    def __init__(self, tensors, definition, dims: dict | None = None,
                 order='greedy'):
        self.tensors = _parse_tensors(tensors)
        self.definition = _parse_definition(definition)
        # symbol per label for cost accounting
        self.label_dims: dict[str, str] = {}
        if dims:
            for sym_name, labels in dims.items():
                for (tname, llabel) in self._all_leg_ids():
                    if llabel in labels:
                        self.label_dims[(tname, llabel)] = sym_name
        self._validate()
        self.open_legs = [e[3] for e in self.definition if e[2] is None]
        if order in ('greedy', 'optimal'):
            self.order, self.contraction_cost = self.optimize_order(method=order)
        elif order == 'definition':
            names = list(self.tensors)
            tree = ContractionTree(names[0])
            for n in names[1:]:
                tree = ContractionTree(tree, ContractionTree(n))
            self.order = tree
            self.contraction_cost = self._tree_cost(self.order)
        elif isinstance(order, ContractionTree):
            self.order = order
            self.contraction_cost = self._tree_cost(order)
        elif isinstance(order, str):
            self.order = self._order_from_instructions(order)
            self.contraction_cost = self._tree_cost(self.order)
        else:
            self.order = ContractionTree._from_nested(order)
            self.contraction_cost = self._tree_cost(self.order)

    # --- structure -----------------------------------------------------------------

    def _all_leg_ids(self):
        for name, ph in self.tensors.items():
            for l in ph.labels:
                yield (name, l)

    def _validate(self):
        used = set()
        for e in self.definition:
            t1, l1 = e[0], e[1]
            assert t1 in self.tensors, f'unknown tensor {t1}'
            assert l1 in self.tensors[t1].labels, f'unknown leg {t1}:{l1}'
            assert (t1, l1) not in used, f'leg {t1}:{l1} used twice'
            used.add((t1, l1))
            if e[2] is not None:
                t2, l2 = e[2], e[3]
                assert t2 in self.tensors and l2 in self.tensors[t2].labels
                assert (t2, l2) not in used, f'leg {t2}:{l2} used twice'
                used.add((t2, l2))
        missing = set(self._all_leg_ids()) - used
        assert not missing, f'legs not specified: {missing}'
        # connectivity
        names = list(self.tensors)
        adj = {n: set() for n in names}
        for e in self.definition:
            if e[2] is not None:
                adj[e[0]].add(e[2])
                adj[e[2]].add(e[0])
        seen = {names[0]}
        stack = [names[0]]
        while stack:
            for m in adj[stack.pop()]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        assert seen == set(names), 'diagram is not connected'
        self._check_planarity()

    def _check_planarity(self):
        """Genus-0 check of the combinatorial map (reference planar.py validates
        planarity on construction; evaluation would otherwise silently braid).

        Each tensor's label list is its counterclockwise boundary order (legs ==
        [*codomain, *reversed(domain)] walks the box boundary). Open legs end in
        free pendant vertices — their far ends can always be redrawn without
        crossings, so they do not constrain the embedding. The diagram is planar
        iff the rotation system has Euler characteristic V - E + F == 2.
        """
        # darts: (tensor, label); rotation σ: next dart counterclockwise at vertex
        rotation: dict[tuple, tuple] = {}
        for name, ph in self.tensors.items():
            darts = [(name, l) for l in ph.labels]
            for i, d in enumerate(darts):
                rotation[d] = darts[(i + 1) % len(darts)]
        open_entries = [e for e in self.definition if e[2] is None]
        pendant_darts = [('__open__', f'{e[0]}.{e[1]}') for e in open_entries]
        for d in pendant_darts:
            rotation[d] = d  # degree-1 vertex
        # involution α: opposite dart of the same edge
        alpha: dict[tuple, tuple] = {}
        for e in self.definition:
            d1 = (e[0], e[1])
            d2 = (e[2], e[3]) if e[2] is not None \
                else ('__open__', f'{e[0]}.{e[1]}')
            alpha[d1] = d2
            alpha[d2] = d1
        n_vertices = len(self.tensors) + len(open_entries)
        n_edges = len(self.definition)
        # faces = orbits of φ = σ ∘ α
        unvisited = set(alpha)
        n_faces = 0
        while unvisited:
            d = next(iter(unvisited))
            n_faces += 1
            while d in unvisited:
                unvisited.remove(d)
                d = rotation[alpha[d]]
        euler = n_vertices - n_edges + n_faces
        if euler != 2:
            genus = (2 - euler) // 2
            raise ValueError(
                f'diagram is not planar (genus {genus}): contractions cross for '
                f'the declared leg orders. Reorder legs/tensors or use tdot with '
                f'explicit braiding levels instead.')

    def contracted_pairs(self, group1: set, group2: set):
        """Contraction entries between two groups of tensor names."""
        res = []
        for e in self.definition:
            if e[2] is None:
                continue
            if e[0] in group1 and e[2] in group2:
                res.append((e[0], e[1], e[2], e[3]))
            elif e[0] in group2 and e[2] in group1:
                res.append((e[2], e[3], e[0], e[1]))
        return res

    # --- cost model ------------------------------------------------------------------

    def _leg_symbol(self, tname, label) -> str:
        return self.label_dims.get((tname, label), f'{tname}:{label}')

    def _open_symbols(self, group: set) -> list[str]:
        """Symbols of the legs of the (contracted) group that are still open."""
        inner = set()
        for e in self.definition:
            if e[2] is not None and e[0] in group and e[2] in group:
                inner.add((e[0], e[1]))
                inner.add((e[2], e[3]))
        res = []
        for name in group:
            for l in self.tensors[name].labels:
                if (name, l) not in inner:
                    res.append(self._leg_symbol(name, l))
        return res

    def _pair_cost(self, group1: set, group2: set) -> BigOPolynomial:
        """Cost of contracting the (already contracted) groups: prod of all involved
        leg dims (open legs of both + contracted between them counted once)."""
        syms1 = self._open_symbols(group1)
        contracted = {(e[0], e[1]) for e in self.contracted_pairs(group1, group2)}
        syms2 = []
        for name in group2:
            for l in self.tensors[name].labels:
                inner = False
                for e in self.definition:
                    if e[2] is not None and e[0] in group2 and e[2] in group2 \
                            and ((e[0], e[1]) == (name, l)
                                 or (e[2], e[3]) == (name, l)):
                        inner = True
                if not inner:
                    s = self._leg_symbol(name, l)
                    syms2.append(s)
        # open legs of union = syms1 + syms2 minus 2x contracted; cost counts each
        # contracted dim once: prod(open of 1) * prod(open of 2) / prod(contracted)
        powers: dict[str, int] = {}
        for s in syms1 + syms2:
            powers[s] = powers.get(s, 0) + 1
        for (tn, ll) in contracted:
            s = self._leg_symbol(tn, ll)
            powers[s] = powers.get(s, 0) - 1
        powers = {k: v for k, v in powers.items() if v != 0}
        return BigOPolynomial([BigOMonomial(1.0, powers)])

    def _tree_cost(self, tree: ContractionTree) -> BigOPolynomial:
        total = BigOPolynomial([])
        def walk(t):
            if t.leaf is not None:
                return {t.leaf}
            g1 = walk(t.left)
            g2 = walk(t.right)
            nonlocal total
            total = total + self._pair_cost(g1, g2)
            return g1 | g2
        walk(tree)
        return total

    def optimize_order(self, method: str = 'greedy'):
        """Greedy (or exhaustive) contraction-order optimization."""
        names = list(self.tensors)
        if len(names) == 1:
            return ContractionTree(names[0]), BigOPolynomial([])
        if method == 'optimal' and len(names) <= 8:
            best = None
            for tree in _all_trees(names):
                t = ContractionTree._from_nested(tree)
                if not self._tree_connected(t):
                    continue
                c = self._tree_cost(t)
                if best is None or _poly_less(c, best[1]):
                    best = (t, c)
            return best
        # greedy: repeatedly contract the connected pair with the lowest cost
        groups = [( {n}, ContractionTree(n)) for n in names]
        total = BigOPolynomial([])
        while len(groups) > 1:
            best = None
            for i in range(len(groups)):
                for j in range(i + 1, len(groups)):
                    if not self.contracted_pairs(groups[i][0], groups[j][0]):
                        continue
                    c = self._pair_cost(groups[i][0], groups[j][0])
                    if best is None or _poly_less(c, best[2]):
                        best = (i, j, c)
            assert best is not None, 'disconnected diagram'
            i, j, c = best
            total = total + c
            merged = (groups[i][0] | groups[j][0],
                      ContractionTree(groups[i][1], groups[j][1]))
            groups = [g for k, g in enumerate(groups) if k not in (i, j)]
            groups.append(merged)
        return groups[0][1], total

    def _tree_connected(self, tree) -> bool:
        def walk(t):
            if t.leaf is not None:
                return {t.leaf}, True
            g1, ok1 = walk(t.left)
            g2, ok2 = walk(t.right)
            ok = ok1 and ok2 and bool(self.contracted_pairs(g1, g2))
            return g1 | g2, ok
        return walk(tree)[1]

    def _order_from_instructions(self, order: str) -> ContractionTree:
        groups = {n: ContractionTree(n) for n in self.tensors}
        owner = {n: n for n in self.tensors}
        for instr in order.split(','):
            a, b = (x.strip() for x in instr.split('@'))
            ra, rb = owner[a], owner[b]
            merged = ContractionTree(groups[ra], groups[rb])
            for n, r in owner.items():
                if r in (ra, rb):
                    owner[n] = ra
            groups[ra] = merged
        return groups[owner[next(iter(self.tensors))]]

    # --- evaluation -------------------------------------------------------------------

    def evaluate(self, **tensors) -> Tensor:
        """Contract concrete tensors. Labels must match the placeholders."""
        from ._functions import partial_trace, tdot

        assert set(tensors) == set(self.tensors), \
            f'expected tensors {set(self.tensors)}'

        def walk(tree):
            if tree.leaf is not None:
                t = tensors[tree.leaf]
                # apply self-trace pairs (both edge ends on this tensor) up front;
                # planarity of such pairs was validated at construction
                self_pairs = [
                    [f'{tree.leaf}.{e[1]}', f'{tree.leaf}.{e[3]}']
                    for e in self.definition
                    if e[2] is not None and e[0] == e[2] == tree.leaf
                ]
                if self_pairs:
                    t = partial_trace(t, *self_pairs)
                return t, {tree.leaf}
            t1, g1 = walk(tree.left)
            t2, g2 = walk(tree.right)
            pairs = self.contracted_pairs(g1, g2)
            # relabel to unique names to avoid collisions, then contract by label
            legs1 = []
            legs2 = []
            for (ta, la, tb, lb) in pairs:
                legs1.append(t1.get_leg_idx(self._qualified(t1, g1, ta, la)))
                legs2.append(t2.get_leg_idx(self._qualified(t2, g2, tb, lb)))
            res = tdot(t1, t2, legs1, legs2)
            return res, g1 | g2

        # qualify all labels with their tensor name to avoid duplicates
        tensors = {name: t.relabelled([f'{name}.{l}' if l is not None else None
                                       for l in t.labels])
                   for name, t in tensors.items()}
        res, _ = walk(self.order)
        # rename open legs
        mapping = {}
        for e in self.definition:
            if e[2] is None:
                mapping[f'{e[0]}.{e[1]}'] = e[3]
        return res.relabelled(mapping)

    def _qualified(self, t, group, tname, label):
        return f'{tname}.{label}'

    def __call__(self, **tensors):
        return self.evaluate(**tensors)

    def add_tensor(self, name: str, labels: list[str], new_definition):
        tensors = dict(self.tensors)
        tensors[name] = TensorPlaceholder(name, labels)
        return PlanarDiagram(tensors, new_definition)

    def remove_tensor(self, name: str, new_definition):
        tensors = {k: v for k, v in self.tensors.items() if k != name}
        return PlanarDiagram(tensors, new_definition)

    def __repr__(self):
        return (f'<PlanarDiagram: {list(self.tensors)}, open={self.open_legs}, '
                f'order={self.order!r}>')


def _all_trees(names):
    if len(names) == 1:
        yield names[0]
        return
    for i in range(1, len(names)):
        for left_set in it.combinations(names, i):
            right_set = [n for n in names if n not in left_set]
            for lt in _all_trees(list(left_set)):
                for rt in _all_trees(right_set):
                    yield (lt, rt)


def _poly_less(a: BigOPolynomial, b: BigOPolynomial) -> bool:
    """Compare polynomials by leading degree then coefficient sum (heuristic)."""
    da = max((m.total_degree() for m in a.monomials), default=0)
    db = max((m.total_degree() for m in b.monomials), default=0)
    if da != db:
        return da < db
    ca = sum(m.coeff for m in a.monomials if m.total_degree() == da)
    cb = sum(m.coeff for m in b.monomials if m.total_degree() == db)
    return ca < cb


from .sparse import LinearOperator as _LinearOperator


class PlanarLinearOperator(_LinearOperator):
    """A linear operator defined by a planar diagram with one tensor left open.

    Role-equivalent to reference planar.py:1056. The diagram must have a placeholder
    named `vec_name`; :meth:`matvec` plugs the vector in and evaluates.
    """

    def __init__(self, diagram: PlanarDiagram, tensors: dict, vec_name: str = 'vec'):
        self.diagram = diagram
        self.fixed = dict(tensors)
        self.vec_name = vec_name
        _LinearOperator.__init__(self, dtype=None)

    def matvec(self, vec):
        kwargs = dict(self.fixed)
        kwargs[self.vec_name] = vec
        res = self.diagram.evaluate(**kwargs)
        # arrange like the input vector (same codomain/domain split by labels)
        return permute_legs(res, codomain=vec.labels[:vec.num_codomain_legs],
                            domain=list(reversed(
                                vec.labels[vec.num_codomain_legs:])))

    def some_vector(self):
        raise NotImplementedError


# --- planar variants of tensor operations -----------------------------------------------


def planar_contraction(diagram: PlanarDiagram, **tensors):
    """Evaluate a planar diagram (reference planar.py:1315)."""
    return diagram.evaluate(**tensors)


def planar_permute_legs(tensor, codomain=None, domain=None):
    """Cyclic permutations + bends only (anyon-safe; reference planar.py:1831).

    Raises if the requested rearrangement is not a cyclic rotation of the legs.
    """
    if codomain is None and domain is None:
        raise ValueError('need codomain and/or domain')
    if codomain is None:
        domain_idcs = tensor.get_leg_idcs(domain)
        codomain_idcs = [n for n in range(tensor.num_legs) if n not in domain_idcs]
    elif domain is None:
        codomain_idcs = tensor.get_leg_idcs(codomain)
        domain_idcs = [n for n in reversed(range(tensor.num_legs))
                       if n not in codomain_idcs]
    else:
        codomain_idcs = tensor.get_leg_idcs(codomain)
        domain_idcs = tensor.get_leg_idcs(domain)
    order = list(codomain_idcs) + list(domain_idcs)[::-1]
    n = tensor.num_legs
    if order:
        r = order[0]
        if order != [(r + k) % n for k in range(n)]:
            raise ValueError('planar_permute_legs allows only cyclic rotations '
                             f'(+ bends); got leg order {order}')
    return permute_legs(tensor, codomain=codomain_idcs, domain=domain_idcs)


def planar_combine_legs(tensor, *which_legs, **kw):
    """Combine contiguous leg groups without braids."""
    from ._functions import combine_legs

    for group in which_legs:
        idcs = tensor.get_leg_idcs(group)
        assert idcs == list(range(min(idcs), max(idcs) + 1)), \
            'planar_combine_legs requires contiguous groups'
    return combine_legs(tensor, *which_legs, **kw)


def parse_leg_bipartition(legs: Sequence[int], num_legs: int):
    """Sort a contiguous-on-the-circle subset of ``range(num_legs)``.

    Leg indices live on a circle (``0`` follows ``num_legs - 1``); a planar cut
    must separate two contiguous arcs. Returns ``(legs, other_legs)``, each
    sorted in circle order (so ``legs`` may wrap, e.g. ``[7, 8, 0, 1]``).
    Raises if ``legs`` is not a single contiguous arc.
    Reference: planar.py:2282.
    """
    legs = [l % num_legs for l in legs]
    if len(set(legs)) != len(legs):
        raise ValueError(f'duplicate legs in {legs}')
    if not 0 < len(legs) < num_legs:
        raise ValueError('bipartition needs a proper nonempty subset of legs')
    in_set = [False] * num_legs
    for l in legs:
        in_set[l] = True
    # count arcs: transitions False -> True around the circle
    starts = [i for i in range(num_legs) if in_set[i] and not in_set[i - 1]]
    if len(starts) != 1:
        raise ValueError(f'legs {sorted(legs)} are not contiguous on the '
                         f'circle of {num_legs} legs')
    s = starts[0]
    legs_sorted = [(s + k) % num_legs for k in range(len(legs))]
    other = [(s + len(legs) + k) % num_legs for k in range(num_legs - len(legs))]
    return legs_sorted, other


def planar_decomposition(tensor, codomain_cut: int, domain_cut: int, which: str,
                         new_labels=None, new_leg_dual=False, **kwargs):
    """Factorize across a planar cut through the tensor (reference planar.py:1465).

    The cut runs between codomain leg ``codomain_cut - 1`` and ``codomain_cut``
    (``0`` = left of the whole codomain) and between domain leg ``domain_cut - 1``
    and ``domain_cut``; the "left" part (first `codomain_cut` codomain legs and
    first `domain_cut` domain legs) ends up in the first factor. Only cyclic
    rotations and bends are used — safe for anyonic symmetries. ``which`` is one
    of ``'qr' | 'lq' | 'eigh' | 'svd' | 'truncated_svd'``.
    """
    assert 0 <= codomain_cut <= tensor.num_codomain_legs
    assert 0 <= domain_cut <= tensor.num_domain_legs
    if codomain_cut == 0 and domain_cut == 0:
        raise ValueError('Nothing to do')
    if codomain_cut == tensor.num_codomain_legs and domain_cut == tensor.num_domain_legs:
        raise ValueError('Nothing to do')

    n = tensor.num_legs
    codom = [*range(n - domain_cut, n), *range(codomain_cut)]
    dom = [*reversed(range(codomain_cut, n - domain_cut))]
    to_decompose = planar_permute_legs(tensor, codomain=codom, domain=dom)

    S = err = renormalize = None
    if which == 'qr':
        A, B = _qr(to_decompose, new_labels=new_labels, new_leg_dual=new_leg_dual)
    elif which == 'lq':
        A, B = _lq(to_decompose, new_labels=new_labels, new_leg_dual=new_leg_dual)
    elif which == 'eigh':
        # eigh returns (W, V); V is the isometry-like factor, permute it as A
        B, A = _eigh(to_decompose, new_labels=new_labels,
                     new_leg_dual=new_leg_dual, **kwargs)
    elif which == 'svd':
        A, S, B = svd(to_decompose, new_labels=new_labels,
                      new_leg_dual=new_leg_dual, **kwargs)
    elif which == 'truncated_svd':
        A, S, B, err, renormalize = _truncated_svd(
            to_decompose, new_labels=new_labels, new_leg_dual=new_leg_dual,
            **kwargs)
    else:
        raise ValueError(f'Invalid decomposition {which!r}')

    if which != 'eigh':  # for eigh, B holds the eigenvalues (diagonal)
        B_codom = [*range(tensor.num_codomain_legs - codomain_cut + 1)]
        B_dom = [*reversed(range(tensor.num_codomain_legs - codomain_cut + 1,
                                 B.num_legs))]
        B = planar_permute_legs(B, codomain=B_codom, domain=B_dom)
    A_codom = [*range(domain_cut, A.num_codomain_legs)]
    A_dom = [*reversed(range(domain_cut)), A.num_codomain_legs]
    A = planar_permute_legs(A, codomain=A_codom, domain=A_dom)

    if which == 'svd':
        return A, S, B
    if which == 'truncated_svd':
        return A, S, B, err, renormalize
    if which == 'eigh':
        return B, A
    return A, B


def planar_svd(tensor, codomain_cut=None, domain_cut=None, new_labels=None,
               new_leg_dual=False, algorithm=None):
    """SVD without braids.

    With ``codomain_cut``/``domain_cut`` given (reference planar.py:2124
    signature), decompose across that planar cut; otherwise the existing
    (co)domain grouping is used as-is.
    """
    if codomain_cut is not None or domain_cut is not None:
        return planar_decomposition(tensor, codomain_cut or 0, domain_cut or 0,
                                    'svd', new_labels=new_labels,
                                    new_leg_dual=new_leg_dual, algorithm=algorithm)
    return svd(tensor, new_labels=new_labels, new_leg_dual=new_leg_dual,
               algorithm=algorithm)


def planar_qr(tensor, codomain_cut=None, domain_cut=None, new_labels=None,
              new_leg_dual=False):
    if codomain_cut is not None or domain_cut is not None:
        return planar_decomposition(tensor, codomain_cut or 0, domain_cut or 0,
                                    'qr', new_labels=new_labels,
                                    new_leg_dual=new_leg_dual)
    return _qr(tensor, new_labels=new_labels, new_leg_dual=new_leg_dual)


def planar_lq(tensor, codomain_cut=None, domain_cut=None, new_labels=None,
              new_leg_dual=False):
    if codomain_cut is not None or domain_cut is not None:
        return planar_decomposition(tensor, codomain_cut or 0, domain_cut or 0,
                                    'lq', new_labels=new_labels,
                                    new_leg_dual=new_leg_dual)
    return _lq(tensor, new_labels=new_labels, new_leg_dual=new_leg_dual)


def planar_eigh(tensor, codomain_cut=None, domain_cut=None, new_labels=None,
                new_leg_dual=False, sort=None):
    if codomain_cut is not None or domain_cut is not None:
        return planar_decomposition(tensor, codomain_cut or 0, domain_cut or 0,
                                    'eigh', new_labels=new_labels,
                                    new_leg_dual=new_leg_dual, sort=sort)
    return _eigh(tensor, new_labels=new_labels, new_leg_dual=new_leg_dual, sort=sort)


def planar_truncated_svd(tensor, codomain_cut=None, domain_cut=None,
                         new_labels=None, new_leg_dual=False, **trunc):
    if codomain_cut is not None or domain_cut is not None:
        return planar_decomposition(tensor, codomain_cut or 0, domain_cut or 0,
                                    'truncated_svd', new_labels=new_labels,
                                    new_leg_dual=new_leg_dual, **trunc)
    return _truncated_svd(tensor, new_labels=new_labels,
                          new_leg_dual=new_leg_dual, **trunc)


def planar_almost_equal(tensor_1, tensor_2, rtol: float = 1e-5,
                        atol: float = 1e-8) -> bool:
    """Equality up to tolerance and planar permutation (reference planar.py:1172).

    Permutes ``tensor_1``'s legs (cyclic rotations + bends only) to the label
    configuration of ``tensor_2``, then compares entrywise. Both tensors must
    carry matching leg labels.
    """
    from ._functions import almost_equal

    if set(tensor_1.labels) != set(tensor_2.labels) or None in tensor_1.labels:
        raise ValueError('planar_almost_equal needs matching leg labels')
    permuted = planar_permute_legs(tensor_1, codomain=tensor_2.codomain_labels,
                                   domain=tensor_2.domain_labels)
    return almost_equal(permuted, tensor_2, rtol=rtol, atol=atol)


def planar_partial_trace(tensor, *pairs):
    """Partial trace of adjacent (planar-closable) leg pairs."""
    return _partial_trace(tensor, *pairs)


def horizontal_factorization(op, svd_cut: float = 1e-12, new_labels=('wR', 'wL')):
    """Split a two-site operator across the middle: ``op = sum_k L_k ∘_w R_k``.

    Returns (L, R) with a shared horizontal leg; the reference's planar.py:1102.
    L has legs [p0, wR, p0*], R has legs [wL, p1, p1*].
    """
    h = op.relabelled(['p0', 'p1', 'p1*', 'p0*'])
    X = permute_legs(h, codomain=['p0*', 'p0'], domain=['p1*', 'p1'])
    U, S, Vh = svd(X, new_labels=list(new_labels))
    mask, err, _ = truncate_singular_values(S, svd_min=svd_cut)
    U, S, Vh = svd_apply_mask(U, S, Vh, mask)
    sqrt_S = S ** 0.5
    L = scale_axis(U, sqrt_S, new_labels[0])
    R = scale_axis(Vh, sqrt_S, new_labels[1])
    L = permute_legs(L, codomain=['p0'], domain=['p0*', new_labels[0]])
    R = permute_legs(R, codomain=[new_labels[1], 'p1'], domain=['p1*'])
    return L, R
