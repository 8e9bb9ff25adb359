"""Symbolic big-O cost polynomials for contraction-order optimization.

Role-equivalent to reference ``cyten/tools/cost_polynomials.py:9-184``. Costs are
polynomials in symbolic size variables (e.g. bond dimension 'chi'); used by the planar
contraction-order optimizer and by trace-time FLOP accounting.
"""

from __future__ import annotations

import numbers
from typing import Mapping

__all__ = ['BigOMonomial', 'BigOPolynomial']


class BigOMonomial:
    """``coeff * prod(var ** exp)`` with symbolic variables."""

    def __init__(self, coeff: float = 1.0, powers: Mapping[str, int] | None = None):
        self.coeff = coeff
        self.powers = dict(sorted((powers or {}).items()))

    def key(self) -> tuple:
        return tuple(self.powers.items())

    def __mul__(self, other):
        if isinstance(other, numbers.Number):
            return BigOMonomial(self.coeff * other, self.powers)
        if isinstance(other, BigOMonomial):
            powers = dict(self.powers)
            for v, e in other.powers.items():
                powers[v] = powers.get(v, 0) + e
            return BigOMonomial(self.coeff * other.coeff, powers)
        return NotImplemented

    __rmul__ = __mul__

    def __call__(self, **values) -> float:
        res = self.coeff
        for v, e in self.powers.items():
            res *= values[v] ** e
        return res

    def total_degree(self) -> int:
        return sum(self.powers.values())

    def __repr__(self):
        factors = [f'{v}^{e}' if e != 1 else v for v, e in self.powers.items()]
        return ' '.join([str(self.coeff)] + factors) if factors else str(self.coeff)

    def __eq__(self, other):
        return (isinstance(other, BigOMonomial) and self.coeff == other.coeff
                and self.powers == other.powers)


class BigOPolynomial:
    """A sum of :class:`BigOMonomial`. Supports +, *, evaluation and dominance comparison."""

    def __init__(self, monomials=()):
        merged: dict[tuple, float] = {}
        protos: dict[tuple, BigOMonomial] = {}
        for m in monomials:
            if isinstance(m, numbers.Number):
                m = BigOMonomial(m)
            k = m.key()
            merged[k] = merged.get(k, 0.0) + m.coeff
            protos[k] = m
        self.monomials = [BigOMonomial(c, dict(protos[k].powers))
                          for k, c in merged.items() if c != 0]

    @classmethod
    def var(cls, name: str, exp: int = 1, coeff: float = 1.0) -> BigOPolynomial:
        return cls([BigOMonomial(coeff, {name: exp})])

    @classmethod
    def const(cls, value: float) -> BigOPolynomial:
        return cls([BigOMonomial(value)])

    def __add__(self, other):
        if isinstance(other, numbers.Number):
            other = BigOPolynomial.const(other)
        if isinstance(other, BigOPolynomial):
            return BigOPolynomial(self.monomials + other.monomials)
        return NotImplemented

    __radd__ = __add__

    def __mul__(self, other):
        if isinstance(other, numbers.Number):
            return BigOPolynomial([m * other for m in self.monomials])
        if isinstance(other, BigOPolynomial):
            return BigOPolynomial([m1 * m2 for m1 in self.monomials for m2 in other.monomials])
        return NotImplemented

    __rmul__ = __mul__

    def __call__(self, **values) -> float:
        return sum(m(**values) for m in self.monomials)

    def max_degree(self) -> int:
        return max((m.total_degree() for m in self.monomials), default=0)

    def dominates(self, other: BigOPolynomial, at: float = 1e6) -> bool:
        """Heuristic comparison: evaluate all variables at a large common value."""
        vars_ = {v for m in self.monomials + other.monomials for v in m.powers}
        vals = {v: at for v in vars_}
        return self(**vals) > other(**vals)

    def __repr__(self):
        if not self.monomials:
            return 'O(0)'
        return 'O(' + ' + '.join(repr(m) for m in self.monomials) + ')'

    def __eq__(self, other):
        if not isinstance(other, BigOPolynomial):
            return NotImplemented
        a = {m.key(): m.coeff for m in self.monomials}
        b = {m.key(): m.coeff for m in other.monomials}
        return a == b
