"""Tests for the native core extension (and its pure-python fallback)."""

import numpy as np

from cyten_tpu import _native


def test_add():
    assert _native.add(2, 3) == 5


def test_compose_plan_matches_fallback():
    rng = np.random.default_rng(0)
    a_contr = rng.integers(0, 5, size=30)
    a_keep = rng.integers(0, 7, size=30)
    b_contr = rng.integers(0, 5, size=25)
    b_keep = rng.integers(0, 7, size=25)
    res_native = _native.compose_plan(a_contr, a_keep, b_contr, b_keep)
    # force fallback
    core = _native._core
    try:
        _native._core = None
        res_py = _native.compose_plan(a_contr, a_keep, b_contr, b_keep)
    finally:
        _native._core = core
    for x, y in zip(res_native, res_py):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_native_built():
    # the repo ships with the built extension; make the smoke test loud if missing
    assert _native.HAS_NATIVE
