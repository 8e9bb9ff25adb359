"""Version information for cyten_tpu."""

from __future__ import annotations

import platform
import subprocess
import sys

version = '0.1.0'
released = False


def git_revision(silent: bool = True) -> str | None:
    """Best-effort git revision of the installed package (None outside a checkout)."""
    try:
        import os

        here = os.path.dirname(os.path.abspath(__file__))
        rev = subprocess.check_output(
            ['git', 'rev-parse', 'HEAD'], cwd=here, stderr=subprocess.DEVNULL
        )
        return rev.decode().strip()
    except Exception:
        if silent:
            return None
        raise


full_version = version if released else f'{version}.dev'


def version_summary() -> str:
    """Multi-line summary of the environment, for bug reports and logs."""
    import numpy

    lines = [
        f'cyten_tpu {full_version} (git {git_revision()})',
        f'python {sys.version}',
        f'numpy {numpy.__version__}',
        f'platform {platform.platform()}',
    ]
    try:
        import jax

        lines.append(f'jax {jax.__version__}')
        lines.append(f'jax devices {jax.devices()}')
    except Exception as e:  # pragma: no cover
        lines.append(f'jax unavailable: {e!r}')
    return '\n'.join(lines)
