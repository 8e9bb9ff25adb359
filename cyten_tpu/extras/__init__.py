"""Extras: optional components kept outside the TPU production path.

Everything here is functional and tested, but was *measured* to not belong in the
default TPU pipeline (docs/DESIGN.md records the retire decisions). Kept for
CPU/GPU users and as a reference for the techniques.

- :mod:`~cyten_tpu.extras.compiled` — gather-compiled contraction chains.
  CPU/GPU-only by measurement (DESIGN §4: the generic per-block path already
  saturates HBM on TPU; the gather formulation helps where dispatch overhead
  dominates, i.e. eager CPU/GPU).
"""

from . import compiled
from .compiled import CompiledContractionChain, GatherPlan, compile_heff_chain

__all__ = ['compiled', 'CompiledContractionChain', 'GatherPlan', 'compile_heff_chain']
