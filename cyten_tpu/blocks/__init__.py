"""Block backends: dense-array algebra under the symmetric-tensor machinery.

Role-equivalent to reference ``cyten/block_backends/`` (``_block_backend.py:23-741``,
``numpy.py``, ``torch.py``, ``array_api.py``). The primary backend is JAX (CPU/GPU/TPU via
XLA); a numpy backend exists for host-side oracles and tests.
"""

from .backend import (
    ArrayApiBlockBackend, Block, BlockBackend, JaxBlockBackend, NumpyBlockBackend,
    get_block_backend,
)
from ..dtypes import Dtype

__all__ = ['ArrayApiBlockBackend', 'Block', 'BlockBackend', 'Dtype', 'JaxBlockBackend',
           'NumpyBlockBackend', 'TorchBlockBackend', 'get_block_backend']


def __getattr__(name):
    if name == 'TorchBlockBackend':  # lazy: avoid importing torch eagerly
        from .torch_backend import TorchBlockBackend

        return TorchBlockBackend
    raise AttributeError(name)
