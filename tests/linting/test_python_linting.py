"""Linting as tests — the reference's CI idea, stdlib-only.

The reference gates CI on lint checks run *as tests*
(reference tests/linting/python_linting.py:35-45 invokes ruff/flake8 and fails
the test on violations; .github/workflows/linting.yml:37-57). This battery
ports that idea without requiring any third-party linter: every rule below is
implemented on the stdlib ``ast``/``tokenize`` machinery, so it runs in any
environment (the CI linting workflow additionally runs full ruff).

Rules (all currently clean — keep them that way):
- every file parses (syntax gate, catches stray merge markers etc.)
- no tabs, no trailing whitespace
- line length <= 100
- no bare ``except:``
- no mutable default arguments (list/dict/set literals)
- every library module has a module docstring
- no ``breakpoint()`` / ``pdb.set_trace`` left behind
"""

import ast
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parents[2]

LIBRARY_FILES = sorted(REPO.glob('cyten_tpu/**/*.py'))
ALL_FILES = sorted([
    *LIBRARY_FILES,
    *REPO.glob('tests/**/*.py'),
    *REPO.glob('scripts/*.py'),
    REPO / 'bench.py',
    REPO / '__graft_entry__.py',
    REPO / 'setup.py',
])
MAX_LINE = 100


def _rel(f):
    return str(f.relative_to(REPO))


@pytest.fixture(scope='module')
def parsed():
    """{path: (source, ast tree)} for all checked files (parse = syntax gate)."""
    out = {}
    for f in ALL_FILES:
        src = f.read_text()
        out[f] = (src, ast.parse(src, filename=str(f)))
    return out


def test_whitespace_and_line_length(parsed):
    bad = []
    for f, (src, _) in parsed.items():
        for i, line in enumerate(src.splitlines(), 1):
            if '\t' in line:
                bad.append(f'{_rel(f)}:{i}: tab character')
            if line != line.rstrip():
                bad.append(f'{_rel(f)}:{i}: trailing whitespace')
            if len(line) > MAX_LINE:
                bad.append(f'{_rel(f)}:{i}: line too long ({len(line)} > {MAX_LINE})')
    assert not bad, '\n'.join(bad)


def test_no_bare_except(parsed):
    bad = []
    for f, (_, tree) in parsed.items():
        for node in ast.walk(tree):
            if isinstance(node, ast.ExceptHandler) and node.type is None:
                bad.append(f'{_rel(f)}:{node.lineno}: bare except')
    assert not bad, '\n'.join(bad)


def test_no_mutable_default_args(parsed):
    bad = []
    for f, (_, tree) in parsed.items():
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                defaults = [*node.args.defaults,
                            *[d for d in node.args.kw_defaults if d is not None]]
                for d in defaults:
                    if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                        bad.append(f'{_rel(f)}:{node.lineno}: mutable default '
                                   f'in {node.name}()')
    assert not bad, '\n'.join(bad)


def test_library_module_docstrings(parsed):
    bad = []
    for f in LIBRARY_FILES:
        _, tree = parsed[f]
        if ast.get_docstring(tree) is None and f.name != '__init__.py':
            bad.append(f'{_rel(f)}: missing module docstring')
        # __init__.py files get docstrings too in this codebase; enforce
        if ast.get_docstring(tree) is None and f.name == '__init__.py' \
                and f.read_text().strip():
            bad.append(f'{_rel(f)}: missing module docstring')
    assert not bad, '\n'.join(bad)


def test_no_debugger_leftovers(parsed):
    bad = []
    for f, (_, tree) in parsed.items():
        for node in ast.walk(tree):
            if isinstance(node, ast.Call):
                fn = node.func
                if isinstance(fn, ast.Name) and fn.id == 'breakpoint':
                    bad.append(f'{_rel(f)}:{node.lineno}: breakpoint()')
                if (isinstance(fn, ast.Attribute) and fn.attr == 'set_trace'):
                    bad.append(f'{_rel(f)}:{node.lineno}: set_trace()')
    assert not bad, '\n'.join(bad)


def test_no_undefined_names_smoke(parsed):
    """Cheap F821-style check: flag `NameError`-prone typos at module level.

    Full undefined-name analysis needs a real linter (ruff runs in CI); here we
    at least compile every file to bytecode, which catches e.g. nonlocal/return
    placement errors and malformed f-strings beyond what ast.parse validates.
    """
    for f, (src, _) in parsed.items():
        compile(src, str(f), 'exec')


def test_api_docs_build():
    """The API-reference build resolves all cross-references (the sphinx
    nitpicky-build gate, provided by docs/build_api_docs.py --check)."""
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, str(REPO / 'docs' / 'build_api_docs.py'), '--check'],
        capture_output=True, text=True,
        env={'JAX_PLATFORMS': 'cpu', 'PATH': '/usr/bin:/bin',
             'HOME': '/tmp'},
    )
    assert res.returncode == 0, res.stdout + res.stderr
