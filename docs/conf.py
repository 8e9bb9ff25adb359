"""Sphinx configuration (skeleton) for environments that have sphinx installed.

The canonical docs build in this repo is ``python docs/build_api_docs.py``
(stdlib-only, generates docs/api/*.md and verifies cross-references — see that
module's docstring). This conf.py lets a sphinx-equipped environment build the
same content with autodoc, mirroring the reference's docs/ tree.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

project = 'cyten_tpu'
author = 'cyten_tpu developers'
release = '0.1.0'

extensions = [
    'sphinx.ext.autodoc',
    'sphinx.ext.autosummary',
    'sphinx.ext.napoleon',
    'sphinx.ext.viewcode',
    'sphinx.ext.intersphinx',
    'myst_parser',
]
autosummary_generate = True
nitpicky = True  # unresolvable cross-references fail the build
intersphinx_mapping = {
    'python': ('https://docs.python.org/3', None),
    'numpy': ('https://numpy.org/doc/stable/', None),
    'jax': ('https://docs.jax.dev/en/latest/', None),
}
source_suffix = {'.rst': 'restructuredtext', '.md': 'markdown'}
master_doc = 'index'
html_theme = 'alabaster'
