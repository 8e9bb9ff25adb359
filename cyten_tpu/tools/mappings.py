"""Sparse linear maps on hashable keys.

Role-equivalent to reference ``cyten/tools/mappings.py:16-99``. Used host-side to compose
fusion-tree transformations before they are lowered to device gather/scatter plans.
"""

from __future__ import annotations

from typing import Generic, Hashable, TypeVar

K = TypeVar('K', bound=Hashable)


class SparseMapping(Generic[K]):
    """A sparse linear map ``out_key -> {in_key: coefficient}``.

    ``data[o][i] = c`` means the output component `o` receives ``c * input[i]``.
    """

    def __init__(self, data: dict[K, dict[K, complex]] | None = None):
        self.data: dict[K, dict[K, complex]] = {} if data is None else data

    @classmethod
    def from_diagonal(cls, keys, values=None) -> SparseMapping[K]:
        if values is None:
            return cls({k: {k: 1.0} for k in keys})
        return cls({k: {k: v} for k, v in zip(keys, values)})

    def __getitem__(self, key: K) -> dict[K, complex]:
        return self.data[key]

    def __contains__(self, key: K) -> bool:
        return key in self.data

    def __iter__(self):
        return iter(self.data)

    def __len__(self):
        return len(self.data)

    def add_to_entry(self, out_key: K, in_key: K, coeff: complex):
        row = self.data.setdefault(out_key, {})
        row[in_key] = row.get(in_key, 0) + coeff

    def pre_compose(self, other: SparseMapping[K]) -> SparseMapping[K]:
        """``(self ∘ other)``: apply `other` first, then `self`.

        ``result[o][i] = sum_m self[o][m] * other[m][i]``.
        """
        res: dict[K, dict[K, complex]] = {}
        for o, mids in self.data.items():
            row: dict[K, complex] = {}
            for m, c1 in mids.items():
                inner = other.data.get(m)
                if inner is None:
                    continue
                for i, c2 in inner.items():
                    row[i] = row.get(i, 0) + c1 * c2
            if row:
                res[o] = row
        return SparseMapping(res)

    def prune(self, eps: float = 0.0) -> SparseMapping[K]:
        """Drop entries with ``|coeff| <= eps`` (in place); returns self."""
        for o in list(self.data):
            row = {i: c for i, c in self.data[o].items() if abs(c) > eps}
            if row:
                self.data[o] = row
            else:
                del self.data[o]
        return self

    def __repr__(self):
        n = sum(len(r) for r in self.data.values())
        return f'<SparseMapping {len(self.data)} rows, {n} entries>'


class IdentityMapping(SparseMapping[K]):
    """Identity on a fixed key set."""

    def __init__(self, keys):
        super().__init__({k: {k: 1.0} for k in keys})
