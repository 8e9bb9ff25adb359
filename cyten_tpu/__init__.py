"""cyten_tpu: a TPU-native symmetric-tensor framework.

Block-sparse tensors with abelian, non-abelian and anyonic symmetries, built for
JAX/XLA/Pallas: all symmetry bookkeeping is static host-side metadata; under ``jit``
XLA sees only dense batched operations on the MXU.

Capability-equivalent to the reference tenpy/cyten library, redesigned TPU-first.
"""

from . import config as _config_module
from .config import config
from .dtypes import Dtype
from .version import full_version as __version__
from . import symmetries
from . import tools


def show_config() -> None:
    """Print environment and configuration summary."""
    from .version import version_summary

    print(version_summary())
    print(config)
