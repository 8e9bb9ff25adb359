"""Loader for the native core extension, with pure-python fallback.

The native layer implements host-side plan construction (the trace-time hot spot of
the abelian backend); everything device-side goes through jax/XLA regardless.
Build with ``python setup.py build_ext --inplace`` (see also native/CMakeLists.txt).
"""

from __future__ import annotations

import numpy as np

__all__ = ['HAS_NATIVE', 'add', 'compose_plan']

try:
    from . import _core  # type: ignore

    HAS_NATIVE = True
except ImportError:  # pragma: no cover - depends on build
    _core = None
    HAS_NATIVE = False


def add(i: int, j: int) -> int:
    """Smoke-test binding (parity with reference cyten._core.add)."""
    if _core is not None:
        return _core.add(i, j)
    return i + j


def compose_plan(a_contr: np.ndarray, a_keep: np.ndarray, b_contr: np.ndarray,
                 b_keep: np.ndarray):
    """GEMM-pair enumeration for block-sparse compose.

    Parameters are merged int64 keys per block (contracted columns / kept columns).
    Returns ``(ia, ib, out_id, n_out)``: for each pair, the a-block index, b-block
    index and the output-block id (numbered by first appearance).
    """
    a_contr = np.ascontiguousarray(a_contr, dtype=np.int64)
    a_keep = np.ascontiguousarray(a_keep, dtype=np.int64)
    b_contr = np.ascontiguousarray(b_contr, dtype=np.int64)
    b_keep = np.ascontiguousarray(b_keep, dtype=np.int64)
    if _core is not None:
        ia_b, ib_b, oid_b, n_out = _core.compose_plan(a_contr, a_keep, b_contr,
                                                      b_keep)
        ia = np.frombuffer(ia_b, dtype=np.int64)
        ib = np.frombuffer(ib_b, dtype=np.int64)
        out_id = np.frombuffer(oid_b, dtype=np.int64)
        return ia, ib, out_id, int(n_out)
    # pure-python fallback
    groups: dict[int, list[int]] = {}
    for i, k in enumerate(a_contr):
        groups.setdefault(int(k), []).append(i)
    ia, ib, out_id = [], [], []
    out_ids: dict[tuple, int] = {}
    for j, k in enumerate(b_contr):
        for i in groups.get(int(k), ()):
            key = (int(a_keep[i]), int(b_keep[j]))
            oid = out_ids.setdefault(key, len(out_ids))
            ia.append(i)
            ib.append(j)
            out_id.append(oid)
    return (np.array(ia, np.int64), np.array(ib, np.int64),
            np.array(out_id, np.int64), len(out_ids))
