"""Integer / sorting utilities used by the block-sparse machinery.

Role-equivalent to the reference's ``cyten/tools/misc.py`` (reference: cyten/tools/misc.py:
172-520). These run host-side (numpy) at trace time: they compute *static* block-structure
metadata, never touching device data. Where the reference uses Python generators we provide
vectorized numpy implementations returning index arrays, which matter because plan
construction happens on the host critical path.
"""

from __future__ import annotations

import warnings
from typing import Sequence

import numpy as np

__all__ = [
    'duplicate_entries', 'to_iterable', 'to_iterable_of_len', 'as_immutable_array',
    'inverse_permutation', 'is_permutation', 'rank_data', 'make_stride', 'make_grid',
    'unstridify', 'find_row_differences', 'list_to_dict_list', 'lexsorted',
    'common_rows_sorted', 'common_noncommon_rows_sorted', 'iter_common_sorted',
    'iter_common_sorted_arrays', 'iter_common_noncommon_sorted', 'combine_permutations',
    'iter_common_noncommon_sorted_arrays', 'find_subclass', 'UNSPECIFIED',
    'argsort', 'np_argsort', 'combine_constraints', 'is_iterable', 'to_valid_idx',
    'permutation_as_swaps',
]

_MAX_INT = np.iinfo(np.int64).max

UNSPECIFIED = object()  # sentinel for "argument not given" where None is meaningful


def duplicate_entries(seq: Sequence, ignore: Sequence = ()) -> set:
    """The set of entries that appear more than once in `seq` (excluding `ignore`)."""
    seen = set()
    dup = set()
    for x in seq:
        if x in ignore:
            continue
        if x in seen:
            dup.add(x)
        seen.add(x)
    return dup


def to_iterable(obj):
    """Wrap a non-list/tuple object into a list; pass lists/tuples through."""
    if isinstance(obj, (list, tuple)):
        return obj
    return [obj]


def to_iterable_of_len(obj, length: int):
    """Like :func:`to_iterable`, but broadcast single entries to the given length."""
    res = to_iterable(obj)
    if len(res) == 1 and length != 1:
        res = list(res) * length
    if len(res) != length:
        raise ValueError(f'expected length {length}, got {len(res)}')
    return res


def as_immutable_array(a, dtype=None) -> np.ndarray:
    """Convert to a read-only numpy array (safe to cache / share)."""
    res = np.asarray(a, dtype=dtype)
    if res.flags.writeable:
        res = res.copy() if res.base is not None else res
        res.setflags(write=False)
    return res


def is_permutation(perm) -> bool:
    """Whether `perm` is a permutation of ``range(len(perm))``."""
    perm = np.asarray(perm, dtype=np.intp)
    if perm.ndim != 1:
        return False
    seen = np.zeros(perm.shape[0], dtype=bool)
    if np.any(perm < 0) or np.any(perm >= perm.shape[0]):
        return False
    seen[perm] = True
    return bool(np.all(seen))


def inverse_permutation(perm) -> np.ndarray:
    """Invert a permutation: ``inv[perm[j]] == j``. O(N), unlike argsort."""
    perm = np.asarray(perm, dtype=np.intp)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=np.intp)
    return inv


def rank_data(a, stable: bool = True) -> np.ndarray:
    """Ranks of the entries of 1D data `a`; stable ties break by position."""
    order = np.argsort(a, stable=stable) if stable else np.argsort(a)
    return inverse_permutation(order)


def make_stride(shape, cstyle: bool = True) -> np.ndarray:
    """Strides (in elements) of a C-style (or F-style) contiguous array of given shape.

    ``np.sum(inds * make_stride(maxima, cstyle=False), axis=1)`` preserves the
    ``np.lexsort(inds.T)`` order of non-negative integer rows `inds` — the key trick that
    lets us merge multiple index columns into a single sortable integer.
    """
    shape = np.asarray(shape, dtype=np.intp)
    res = np.empty(len(shape), np.intp)
    if cstyle:
        res[-1] = 1
        if len(shape) > 1:
            res[:-1] = np.cumprod(shape[::-1])[:-1][::-1]
    else:
        res[0] = 1
        if len(shape) > 1:
            res[1:] = np.cumprod(shape[:-1])
    total = res[0] * shape[0] if cstyle else res[-1] * shape[-1]
    assert total < _MAX_INT, 'integer overflow in stride computation'
    return res


def make_grid(shape, cstyle: bool = True) -> np.ndarray:
    """All index combinations into `shape` as rows of a ``(prod(shape), len(shape))`` array.

    C-style varies the last column fastest; F-style the first. The F-style grid is
    ``np.lexsort``-ordered.
    """
    if len(shape) == 0:
        return np.zeros((1, 0), dtype=np.intp)
    if cstyle:
        return np.indices(shape, np.intp).reshape(len(shape), -1).T
    return np.indices(shape, np.intp).T.reshape(-1, len(shape))


def unstridify(flat: np.ndarray, strides: np.ndarray, shape: np.ndarray) -> np.ndarray:
    """Inverse of ``inds @ strides``: recover multi-indices from merged integers."""
    flat = np.asarray(flat)
    res = np.empty(flat.shape + (len(strides),), dtype=np.intp)
    for k in np.argsort(-np.asarray(strides)):
        res[..., k] = flat // strides[k]
        flat = flat % strides[k]
    return res


def find_row_differences(sectors: np.ndarray, include_len: bool = False) -> np.ndarray:
    """Indices where consecutive rows of a 2D array differ (always includes 0)."""
    n = len(sectors)
    diff = np.ones(n + int(include_len), dtype=bool)
    if n > 1:
        diff[1:n] = np.any(sectors[1:] != sectors[:-1], axis=1)
    return np.nonzero(diff)[0]


def list_to_dict_list(rows) -> dict:
    """Lookup table ``tuple(row) -> [positions]`` handling duplicates."""
    d: dict = {}
    for i, r in enumerate(rows):
        d.setdefault(tuple(r), []).append(i)
    return d


def lexsorted(a: np.ndarray) -> bool:
    """Whether 2D integer array `a` is sorted w.r.t. ``np.lexsort(a.T)``."""
    if len(a) < 2:
        return True
    # compare consecutive rows: last column is the most significant for lexsort
    for col in range(a.shape[1] - 1, -1, -1):
        lt = a[:-1, col] < a[1:, col]
        gt = a[:-1, col] > a[1:, col]
        if col == a.shape[1] - 1:
            decided_lt, decided_gt = lt, gt
        else:
            decided_lt = decided_lt | (~decided_gt & ~decided_lt & lt)
            decided_gt = decided_gt | (~decided_gt & ~decided_lt & gt)
    return not np.any(decided_gt & ~decided_lt)


def _merge_columns(a: np.ndarray, b: np.ndarray):
    """Merge the columns of two 2D int arrays into single sortable integers (shared strides).

    Entries may be negative (e.g. U(1) charges): columns are shifted to be
    non-negative before the stride merge.
    """
    if a.shape[1] == 0:
        return np.zeros(len(a), np.intp), np.zeros(len(b), np.intp)
    both = np.concatenate([a, b], axis=0)
    lo = np.min(both, axis=0, initial=0)
    ranges = np.max(both, axis=0, initial=0) - lo + 1
    strides = make_stride(ranges, cstyle=False)
    return (a - lo) @ strides, (b - lo) @ strides


def common_rows_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized: pairs ``(i, j)`` with ``a[i] == b[j]`` for lexsorted, duplicate-free rows.

    Returns an ``(n, 2)`` array of index pairs. Vectorized equivalent of the reference's
    generator ``iter_common_sorted_arrays`` (reference: cyten/tools/misc.py:435-468).
    """
    ka, kb = _merge_columns(a, b)
    common, ia, ib = np.intersect1d(ka, kb, assume_unique=True, return_indices=True)
    return np.stack([ia, ib], axis=1)


def common_noncommon_rows_sorted(a: np.ndarray, b: np.ndarray):
    """Vectorized: (pairs, only_a, only_b) index arrays for lexsorted duplicate-free rows."""
    ka, kb = _merge_columns(a, b)
    common, ia, ib = np.intersect1d(ka, kb, assume_unique=True, return_indices=True)
    mask_a = np.ones(len(ka), dtype=bool)
    mask_a[ia] = False
    mask_b = np.ones(len(kb), dtype=bool)
    mask_b[ib] = False
    return np.stack([ia, ib], axis=1), np.nonzero(mask_a)[0], np.nonzero(mask_b)[0]


# generator versions (API parity with the reference; prefer the vectorized ones above)

def iter_common_sorted(a, b):
    """Yield ``(i, j)`` with ``a[i] == b[j]`` for strictly ascending 1D arrays."""
    i, j, la, lb = 0, 0, len(a), len(b)
    while i < la and j < lb:
        if a[i] < b[j]:
            i += 1
        elif b[j] < a[i]:
            j += 1
        else:
            yield i, j
            i += 1
            j += 1


def iter_common_noncommon_sorted(a, b):
    """Yield ``(i, j)``, ``(i, None)``, ``(None, j)`` for strictly ascending 1D arrays."""
    i, j, la, lb = 0, 0, len(a), len(b)
    while i < la and j < lb:
        if a[i] < b[j]:
            yield i, None
            i += 1
        elif a[i] > b[j]:
            yield None, j
            j += 1
        else:
            yield i, j
            i += 1
            j += 1
    yield from ((i2, None) for i2 in range(i, la))
    yield from ((None, j2) for j2 in range(j, lb))


def iter_common_sorted_arrays(a, b, a_strict: bool = True, b_strict: bool = True):
    """Yield ``(i, j)`` with ``all(a[i] == b[j])`` for lexsorted 2D arrays.

    At most one of the two arrays may contain duplicate rows (its ``*_strict=False``).
    """
    if not (a_strict or b_strict):
        raise ValueError('at least one array must be strictly sorted')
    if a_strict and b_strict:
        for i, j in common_rows_sorted(np.asarray(a), np.asarray(b)):
            yield int(i), int(j)
        return
    la, lb = len(a), len(b)
    d = a.shape[1]
    i = j = 0
    while i < la and j < lb:
        for k in reversed(range(d)):
            if a[i, k] < b[j, k]:
                i += 1
                break
            elif b[j, k] < a[i, k]:
                j += 1
                break
        else:
            yield (i, j)
            if b_strict:
                i += 1
            if a_strict:
                j += 1


def iter_common_noncommon_sorted_arrays(a, b):
    """Yield ``(i, j)`` / ``(i, None)`` / ``(None, j)`` for strictly lexsorted 2D arrays."""
    pairs, only_a, only_b = common_noncommon_rows_sorted(np.asarray(a), np.asarray(b))
    # emit in merged sorted order (i ascending; j ascending interleaved)
    pi = {int(i): int(j) for i, j in pairs}
    sa = set(int(x) for x in only_a)
    i = j = 0
    la, lb = len(a), len(b)
    while i < la and j < lb:
        if i in pi:
            # decide order by comparing rows lexicographically
            cmp = _lexcmp(a[i], b[j])
            if cmp == 0:
                yield i, pi[i]
                j = pi[i] + 1
                i += 1
                continue
            elif cmp < 0:
                yield i, None
                i += 1
            else:
                yield None, j
                j += 1
        else:
            cmp = _lexcmp(a[i], b[j])
            if cmp < 0:
                yield i, None
                i += 1
            else:
                yield None, j
                j += 1
    yield from ((i2, None) for i2 in range(i, la))
    yield from ((None, j2) for j2 in range(j, lb))


def _lexcmp(ra, rb) -> int:
    for k in reversed(range(len(ra))):
        if ra[k] < rb[k]:
            return -1
        if ra[k] > rb[k]:
            return 1
    return 0


def combine_permutations(perms: Sequence[Sequence[int]], cstyle: bool = True) -> np.ndarray:
    """Permutation on a combined (product) axis from permutations of the factors.

    Such that ``a[np.ix_(*perms)].reshape(-1) == a.reshape(-1)[result]``.
    """
    assert all(is_permutation(p) for p in perms)
    strides = make_stride([len(p) for p in perms], cstyle=cstyle)
    grids = np.ix_(*[np.asarray(p, dtype=np.intp) for p in perms])
    total = sum(g * s for g, s in zip(grids, strides))
    return total.reshape(-1, order='C' if cstyle else 'F')


def find_subclass(base_class: type, subclass_name):
    """Find the unique subclass of `base_class` with the given name (for deserialization)."""
    if not isinstance(subclass_name, str):
        if not isinstance(subclass_name, type):
            raise TypeError(f'expected str or class, got {subclass_name!r}')
        if not issubclass(subclass_name, base_class):
            warnings.warn(f'{subclass_name!r} is not a subclass of {base_class!r}')
        return subclass_name
    found = set()
    stack = [base_class]
    seen = set()
    while stack:
        cls = stack.pop()
        if cls in seen:
            continue
        seen.add(cls)
        if cls.__name__ == subclass_name:
            found.add(cls)
        stack.extend(cls.__subclasses__())
    if len(found) == 1:
        return found.pop()
    if not found:
        raise ValueError(f'no subclass of {base_class.__name__} named {subclass_name!r}')
    raise ValueError(f'multiple subclasses of {base_class.__name__} named '
                     f'{subclass_name!r}: {found}')


def is_iterable(a) -> bool:
    """Whether the given object is iterable. Reference: tools/misc.py:20."""
    try:
        iter(a)
    except TypeError:
        return False
    return True


def to_valid_idx(idx: int, length: int) -> int:
    """Convert to a valid non-negative index for the given `length`.

    Reference: tools/misc.py:38.
    """
    if not -length <= idx < length:
        raise IndexError(f'Index {idx} out of bounds for length {length}')
    if idx < 0:
        idx += length
    return idx


def argsort(a, sort=None, **kwargs) -> np.ndarray:
    """``np.argsort`` with ascending/descending/magnitude sort modes.

    `sort` options (scipy-eigensolver style): ``'m>'``/``'LM'`` largest magnitude
    first, ``'m<'``/``'SM'`` smallest magnitude, ``'>'``/``'LR'``/``'LA'`` largest real
    part, ``'<'``/``'SR'``/``'SA'`` smallest real part, ``'LI'``/``'SI'`` largest /
    smallest imaginary part, ``None`` = numpy default. Reference: tools/misc.py:86.
    """
    if sort is not None:
        if sort in ('m<', 'SM'):
            a = np.abs(a)
        elif sort in ('m>', 'LM'):
            a = -np.abs(a)
        elif sort in ('<', 'SR', 'SA'):
            a = np.real(a)
        elif sort in ('>', 'LR', 'LA'):
            a = -np.real(a)
        elif sort == 'SI':
            a = np.imag(a)
        elif sort == 'LI':
            a = -np.imag(a)
        else:
            raise ValueError(f'unknown sort option {sort!r}')
    return np.argsort(a, **kwargs)


def np_argsort(a, stable: bool = True) -> np.ndarray:
    """``np.argsort`` with a stable default. Reference: tools/misc.py:238."""
    if stable:
        return np.argsort(a, kind='stable')
    return np.argsort(a)


def combine_constraints(good1: np.ndarray, good2: np.ndarray, warn: str) -> np.ndarray:
    """``good1 & good2`` if any entry remains True, else warn and return `good1`.

    Used to relax conflicting truncation constraints. Reference: tools/misc.py:141.
    """
    assert good1.shape == good2.shape, f'{good1.shape} != {good2.shape}'
    res = np.logical_and(good1, good2)
    if np.any(res):
        return res
    warnings.warn(f"truncation: can't satisfy constraint for {warn}", stacklevel=3)
    return good1


def permutation_as_swaps(perm) -> list[int]:
    """Decompose a permutation into adjacent transpositions (bubble sort).

    Returns positions j, meaning swap ``(j, j+1)``, applied left to right, such that
    ``arr[perm]`` results from applying the swaps to ``arr``.
    Reference: tools/misc.py:54.
    """
    from ..testing.swap_gate_numpy import permutation_as_swaps as _impl

    return _impl(perm)
