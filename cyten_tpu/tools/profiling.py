"""Tracing and profiling utilities.

The reference has no profiling subsystem (SURVEY.md §5) — its closest artifact is the
symbolic contraction-cost model (cyten/tools/cost_polynomials.py:9-184). Here we pair
that idea (exact per-sector FLOP accounting from static metadata, :mod:`.flops`) with
JAX's native profiler: traces viewable in Perfetto / TensorBoard, plus a lightweight
wall-clock + achieved-FLOP/s report for individual tensor operations.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ['trace_profile', 'profile_op', 'OpProfile', 'annotate']


@contextlib.contextmanager
def trace_profile(log_dir: str, create_perfetto_link: bool = False):
    """Context manager wrapping ``jax.profiler.trace``.

    Captures device + host activity under the block into `log_dir`; inspect with
    TensorBoard (``tensorboard --logdir log_dir``) or Perfetto.
    Falls back to a no-op if jax is unavailable.
    """
    try:
        import jax
    except ImportError:  # pragma: no cover
        yield
        return
    with jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline (``jax.profiler.TraceAnnotation``)."""
    try:
        import jax

        ctx = jax.profiler.TraceAnnotation(name)
    except ImportError:  # pragma: no cover
        ctx = contextlib.nullcontext()
    with ctx:
        yield


class OpProfile:
    """Timing + FLOP report for one operation.

    Attributes: ``wall_seconds``, ``flops`` (exact GEMM FLOPs from block metadata,
    None if unknown), ``tflops_per_sec`` (None if flops unknown), ``result``.
    """

    def __init__(self, wall_seconds: float, flops: int | None, result):
        self.wall_seconds = wall_seconds
        self.flops = flops
        self.tflops_per_sec = (flops / wall_seconds / 1e12) if flops else None
        self.result = result

    def __repr__(self):
        parts = [f'wall={self.wall_seconds * 1e3:.3f}ms']
        if self.flops is not None:
            parts.append(f'flops={self.flops:.3e}')
        if self.tflops_per_sec is not None:
            parts.append(f'{self.tflops_per_sec:.3f} TFLOP/s')
        return f'<OpProfile {" ".join(parts)}>'


def _block_until_ready(obj):
    try:
        import jax

        jax.block_until_ready(
            obj.data.blocks if hasattr(obj, 'data') else obj)
    except (ImportError, TypeError):
        pass


def profile_op(fn, *args, flops: int | None = None, n_iter: int = 1, warmup: int = 1,
               **kwargs) -> OpProfile:
    """Run ``fn(*args, **kwargs)`` under timing and return an :class:`OpProfile`.

    Blocks on the result (tensor pytrees included) so async dispatch does not skew the
    measurement. Pass ``flops`` (e.g. from :func:`..tools.flops.tdot_flops`) to get
    achieved FLOP/s.
    """
    for _ in range(warmup):
        _block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        res = fn(*args, **kwargs)
    _block_until_ready(res)
    wall = (time.perf_counter() - t0) / n_iter
    total = None if flops is None else flops
    return OpProfile(wall, total, res)
