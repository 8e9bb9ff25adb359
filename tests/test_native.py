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
    """The built extension is not tracked in git (build artifact); build it on
    demand so a fresh checkout exercises the native path too."""
    if not _native.HAS_NATIVE:
        import pathlib
        import subprocess
        import sys

        repo = pathlib.Path(__file__).resolve().parent.parent
        subprocess.run([sys.executable, 'setup.py', 'build_ext', '--inplace'],
                       cwd=repo, check=True, capture_output=True, timeout=600)
        import importlib

        importlib.reload(_native)
    assert _native.HAS_NATIVE
