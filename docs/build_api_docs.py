"""Generate the API reference (markdown) for cyten_tpu — stdlib-only.

The reference ships a sphinx tree (reference docs/, CMakeLists.txt:100-121);
this environment has no sphinx/pdoc, so the API reference is generated with
``inspect``/``importlib`` directly into ``docs/api/*.md`` (one file per public
module, one index). Role markers in docstrings (``:class:`x```, ``:func:`x```,
``:mod:`x```, ``:meth:`x```) are converted to links and **verified to resolve**
— an unresolvable cross-reference fails the build (exit 1), which is the same
gate a sphinx nitpicky build provides.

Usage::

    JAX_PLATFORMS=cpu python docs/build_api_docs.py          # write docs/api/
    JAX_PLATFORMS=cpu python docs/build_api_docs.py --check  # verify only

A sphinx skeleton (docs/conf.py) is included for environments that have sphinx;
CI and local builds use this script.
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import pathlib
import re
import sys

DOCS = pathlib.Path(__file__).resolve().parent
REPO = DOCS.parent
sys.path.insert(0, str(REPO))

MODULES = [
    'cyten_tpu',
    'cyten_tpu.dtypes',
    'cyten_tpu.config',
    'cyten_tpu.symmetries',
    'cyten_tpu.symmetries.core',
    'cyten_tpu.symmetries.groups',
    'cyten_tpu.symmetries.anyons',
    'cyten_tpu.symmetries.fermions',
    'cyten_tpu.symmetries.spaces',
    'cyten_tpu.symmetries.trees',
    'cyten_tpu.blocks',
    'cyten_tpu.backends',
    'cyten_tpu.backends.abelian',
    'cyten_tpu.backends.fusion_tree',
    'cyten_tpu.backends.no_symmetry',
    'cyten_tpu.tensors',
    'cyten_tpu.tensors.planar',
    'cyten_tpu.tensors.sparse',
    'cyten_tpu.tensors.krylov_based',
    'cyten_tpu.tensors.steady',
    'cyten_tpu.tensors.randomized',
    'cyten_tpu.tensors.adaptive',
    'cyten_tpu.models',
    'cyten_tpu.models.degrees_of_freedom',
    'cyten_tpu.models.sites',
    'cyten_tpu.models.couplings',
    'cyten_tpu.algorithms',
    'cyten_tpu.algorithms.mps',
    'cyten_tpu.algorithms.dmrg',
    'cyten_tpu.algorithms.dmrg1',
    'cyten_tpu.algorithms.idmrg',
    'cyten_tpu.algorithms.vumps',
    'cyten_tpu.algorithms.tebd',
    'cyten_tpu.algorithms.tdvp',
    'cyten_tpu.algorithms.itdvp',
    'cyten_tpu.algorithms.exp_mpo',
    'cyten_tpu.algorithms.excitations',
    'cyten_tpu.algorithms.purification',
    'cyten_tpu.algorithms.mpo',
    'cyten_tpu.algorithms.models',
    'cyten_tpu.parallel',
    'cyten_tpu.parallel.sharding',
    'cyten_tpu.parallel.truncation',
    'cyten_tpu.parallel.multihost',
    'cyten_tpu.tools',
    'cyten_tpu.tools.hdf5_io',
    'cyten_tpu.tools.checkpoint',
    'cyten_tpu.tools.profiling',
    'cyten_tpu.tools.flops',
    'cyten_tpu.testing',
    'cyten_tpu.extras',
]

ROLE_RE = re.compile(r':(class|func|meth|mod|attr|data|obj):`~?([^`<]+?)(?:\s*<[^>]+>)?`')


def _target_exists(target: str, where: str = '') -> bool:
    """Resolve a cross-reference target like ``cyten_tpu.tensors.svd`` or
    ``SimpleMPS.overlap``. Relative names are tried against the referencing
    scope first (class attributes, then the module), then all public modules;
    sphinx-style leading dots (``.flops``, ``..tools.flops.x``) are resolved
    against the package root."""
    candidates = [target]
    if target.startswith('.'):
        candidates = ['cyten_tpu.' + target.lstrip('.')]
        base = where.split('.')
        # also try as sibling of the referencing module
        for up in range(1, len(base)):
            candidates.append('.'.join(base[:-up]) + '.' + target.lstrip('.'))
    elif not target.startswith('cyten_tpu'):
        scope = where.split('.')
        # innermost scopes first: Class.target, module.target, package.target
        candidates = ['.'.join(scope[:k]) + f'.{target}'
                      for k in range(len(scope), 0, -1)]
        candidates += [target]
        candidates += [f'{m}.{target}' for m in MODULES]
    for cand in candidates:
        parts = cand.split('.')
        for split in range(len(parts), 0, -1):
            mod_name = '.'.join(parts[:split])
            if mod_name not in _MOD_CACHE:
                if not mod_name.startswith('cyten_tpu'):
                    continue
                try:  # modules outside the rendered set still resolve
                    _MOD_CACHE[mod_name] = importlib.import_module(mod_name)
                except ImportError:
                    continue
            obj = _MOD_CACHE[mod_name]
            ok = True
            for attr in parts[split:]:
                try:
                    obj = getattr(obj, attr)
                except AttributeError:
                    ok = False
                    break
            if ok:
                return True
    return False


_MOD_CACHE: dict = {}
_UNRESOLVED: list = []


def _convert_roles(text: str, where: str) -> str:
    def sub(m):
        role, target = m.group(1), m.group(2).strip()
        display = target.rsplit('.', 1)[-1]
        if not _target_exists(target, where):
            _UNRESOLVED.append(f'{where}: :{role}:`{target}`')
        return f'`{display}`'
    return ROLE_RE.sub(sub, text)


def _doc_of(obj, where: str) -> str:
    doc = inspect.getdoc(obj) or ''
    return _convert_roles(doc, where)


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'


def _public_members(mod):
    names = getattr(mod, '__all__', None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith('_')]
    out = []
    for n in names:
        try:
            obj = getattr(mod, n)
        except AttributeError:
            continue
        if inspect.ismodule(obj):
            continue
        out.append((n, obj))
    return out


def render_module(name: str) -> str:
    mod = _MOD_CACHE[name]
    lines = [f'# `{name}`', '']
    lines.append(_doc_of(mod, name))
    lines.append('')
    classes, functions, data = [], [], []
    for n, obj in _public_members(mod):
        home = getattr(obj, '__module__', None)
        if inspect.isclass(obj):
            classes.append((n, obj, home))
        elif callable(obj):
            functions.append((n, obj, home))
        else:
            data.append((n, obj))
    if classes:
        lines.append('## Classes\n')
        for n, cls, home in classes:
            scope = home if (home or '').startswith('cyten_tpu') else name
            lines.append(f'### `{n}{_signature(cls)}`\n')
            if home and home != name:
                lines.append(f'*re-exported from `{home}`*\n')
            if not (home or '').startswith('cyten_tpu'):
                # foreign alias (e.g. Sector = np.ndarray): don't walk members
                lines.append(f'Alias of `{home}.{cls.__name__}`.\n')
                continue
            lines.append(_doc_of(cls, f'{scope}.{n}'))
            lines.append('')
            meths = [(mn, mo) for mn, mo in vars(cls).items()
                     if not mn.startswith('_') and callable(mo)
                     and inspect.getdoc(mo)]
            for mn, mo in meths:
                fn = mo.__func__ if isinstance(mo, (classmethod, staticmethod)) \
                    else mo
                lines.append(f'#### `{n}.{mn}{_signature(fn)}`\n')
                lines.append(_doc_of(fn, f'{scope}.{n}.{mn}'))
                lines.append('')
    if functions:
        lines.append('## Functions\n')
        for n, fn, home in functions:
            scope = home if (home or '').startswith('cyten_tpu') else name
            lines.append(f'### `{n}{_signature(fn)}`\n')
            if home and home != name:
                lines.append(f'*re-exported from `{home}`*\n')
            lines.append(_doc_of(fn, f'{scope}.{n}'))
            lines.append('')
    if data:
        lines.append('## Data\n')
        for n, obj in data:
            # default reprs carry memory addresses — volatile across builds
            r = re.sub(r' object at 0x[0-9a-f]+', ' object', repr(obj))
            lines.append(f'- `{n}` = `{r}`'[:120])
        lines.append('')
    return '\n'.join(lines) + '\n'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--check', action='store_true',
                    help='verify imports + cross-references only, write nothing')
    args = ap.parse_args()

    for name in MODULES:
        _MOD_CACHE[name] = importlib.import_module(name)

    out_dir = DOCS / 'api'
    pages = {}
    for name in MODULES:
        pages[name] = render_module(name)

    if _UNRESOLVED:
        print('UNRESOLVED cross-references:')
        for u in _UNRESOLVED:
            print(' ', u)
        sys.exit(1)

    if not args.check:
        out_dir.mkdir(exist_ok=True)
        index = ['# cyten_tpu API reference', '',
                 'Generated by `docs/build_api_docs.py` (stdlib; see module '
                 'docstring). One page per public module:', '']
        for name in MODULES:
            fname = name.replace('.', '_') + '.md'
            (out_dir / fname).write_text(pages[name])
            index.append(f'- [`{name}`]({fname})')
        (out_dir / 'index.md').write_text('\n'.join(index) + '\n')
        print(f'wrote {len(MODULES) + 1} pages to {out_dir}')
    else:
        print(f'OK: {len(MODULES)} modules, all cross-references resolve')


if __name__ == '__main__':
    main()
