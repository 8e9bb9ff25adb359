"""Global configuration for cyten_tpu.

Mirrors the role of the reference's ``cyten/dummy_config.py`` (reference:
cyten/dummy_config.py:1-23) but adds TPU-specific knobs: default block dtype policy,
bucketing thresholds for batched sector kernels, and debug-check toggles.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Config:
    # --- printing ---
    printoptions_skip_data: bool = True
    printoptions_precision: int = 8
    printoptions_linewidth: int = 120

    # --- semantics / checks ---
    do_fusion_input_checks: bool = True
    #: enable extra invariant assertions (test_sanity on intermediate results etc.)
    debug_checks: bool = False

    # --- backend defaults ---
    default_symmetry_backend: str = 'abelian'
    default_block_backend: str = 'jax'

    # --- numerics ---
    #: blocks with norm below this are dropped from fusion-tree data (reference:
    #: cyten/backends/fusion_tree_backend.py:249)
    fusion_tree_block_eps: float = 5e-14
    #: tolerance when projecting dense arrays onto the symmetric subspace
    from_dense_block_tol: float = 1e-8

    # --- TPU execution policy ---
    #: jax matmul precision for every block dot (baked in at trace time by the
    #: jax block backend). On TPU, f32 dots run as bf16 MXU passes: 'float32'
    #: = 6 passes (~1e-7 — the default; anything looser silently corrupts
    #: Lanczos/environment numerics at the 1e-3 level), 'tensorfloat32' = 3
    #: passes, 'default' = 1 pass. None leaves jax's own default. Engines can
    #: lower it for their heavy matvec via their matmul_precision= option.
    matmul_precision: str | None = 'float32'
    #: for bfloat16-stored blocks: run block dots as a single bf16 MXU pass with an
    #: f32 accumulator (``preferred_element_type``), casting back to bf16 in the GEMM
    #: epilogue. This removes the bf16 *summation* error from the contraction
    #: (K-dim reductions of thousands of terms) while keeping HBM traffic halved;
    #: per-element input rounding (~4e-3) remains — bf16 storage is a mixed-precision
    #: production mode, see docs/DESIGN.md §10.
    bf16_accumulate_f32: bool = True
    #: pad per-sector matrix dims up to multiples of this when bucketing batched GEMMs
    mxu_pad_multiple: int = 128
    #: fuse BOTH MPO applications of the two-site effective-Hamiltonian
    #: matvec into one per-(vR*, vR)-group channel-mixing GEMM against a
    #: trace-time W1.W2 mixing matrix (algorithms.dmrg._apply_bond_mixing):
    #: the two chi^2-sized chain intermediates (x.W1, x.W2) and their
    #: per-pair re-reads — ~600 MB of the chi=4096 matvec's 1.1 GB HBM
    #: streaming traffic for 0.4 GFLOP — collapse to one concatenate + one
    #: small-K GEMM. Abelian backends only; other backends and mixed-dtype
    #: operands use the chained-tdot path.
    bond_channel_fusion: bool = True
    #: RETIRED (round 5, measured): the flat-buffer + pallas grouped-GEMM
    #: storage redesign (SURVEY.md §7 delta 2). The REAL prototype was built
    #: this time — tile-linearized flat storage + a prefetched-offset ragged
    #: matmul kernel (blocks/pallas_grouped.py, correct vs dense) — and
    #: measured against XLA's unrolled per-pair dots on the actual stage-0
    #: GEMM lists (scripts/exp_r5_pallas_grouped.py, v5e, slope-timed):
    #: Hubbard chi=2048 (2036 tiny ragged pairs, the hoped-for niche) pallas
    #: is 0.82-0.86x — the 128-aligned tile padding wastes more than the
    #: dispatch overhead it saves; U(1) chi=2048 (84 big blocks) 0.28x —
    #: unrolled dots run at 70 TF there; the chi=8192 program crashed the
    #: tunnel's remote compiler. The intermediate-traffic motivation was
    #: delivered at trace level instead (bond_channel_fusion, +10% headline).
    #: The flag remains as an opt-in for the standalone kernel only.
    use_pallas: bool = False
    #: minimum total FLOPs in a bucket before a pallas batched GEMM kernel is preferred
    pallas_gemm_min_flops: int = 2**24
    #: group same-shape GEMM pairs into batched einsums when a compose has at least
    #: this many pairs; None disables. Measured on TPU v5e with honest (fetch-sync)
    #: timing: stack+segment_sum grouping is SLOWER than XLA's unrolled dot_generals
    #: even on an ideal bucketed workload with uniform mults (11.7 vs 5.9 ms/iter,
    #: chi~4k U(1) DMRG matvec) — the stack copies dominate. Off by default;
    #: only plausibly useful for mult ~ O(1) many-tiny-sector workloads.
    compose_batch_threshold: int | None = None
    #: flat-buffer emulation experiment (SURVEY 7 delta 2 / VERDICT r1 item 2):
    #: fold blocks to matrices, PAD dims up to buckets (mxu_pad_multiple),
    #: stack per bucket and run batched GEMMs + segment-sum instead of unrolled
    #: per-pair dot_generals in tdot. Measured keep-or-retire per workload in
    #: docs/DESIGN.md (scripts/exp_grouped_gemm.py).
    use_grouped_gemm: bool = False
    #: fusion-tree permute plans: apply same-shape entry groups as one
    #: stack -> batched transpose -> coefficient GEMM -> scatter instead of
    #: per-entry slice/scale/scatter triples (VERDICT r1 item 6). None = auto
    #: (on for the jax block backend, off for eager numpy where the python
    #: loop is cheaper than the stack copies). True/False force.
    fusion_tree_grouped_apply: bool | None = None
    #: the grouped path is hybrid: groups whose sub-blocks exceed this many
    #: elements fall back to per-entry application. Measured crossover on v5e
    #: (SU(2) DMRG matvec, slope-timed): grouped wins 1.63x at 128 multiplets
    #: (blocks <= ~70^2) and 1.16x at 256, loses 0.87x at 512 where the stack
    #: copies of large blocks cost more than the dispatch floor they save.
    fusion_tree_grouped_max_block: int = 32768


config = Config()


class _PrintOptions:
    """Reference-named view (``cyten.dummy_config.printoptions``,
    dummy_config.py:5-14) onto :class:`Config`'s printing fields.

    Reading/writing ``printoptions.linewidth``/``precision``/``skip_data``
    aliases the ``config.printoptions_*`` fields; the remaining reference
    knobs live here directly.
    """

    _map = {'linewidth': 'printoptions_linewidth',
            'precision': 'printoptions_precision',
            'skip_data': 'printoptions_skip_data'}
    indent: int = 2
    maxlines_spaces: int = 15
    maxlines_tensors: int = 30
    summarize_blocks: bool = False

    def __getattr__(self, name):
        if name in type(self)._map:
            return getattr(config, type(self)._map[name])
        raise AttributeError(name)

    def __setattr__(self, name, value):
        if name in type(self)._map:
            setattr(config, type(self)._map[name], value)
        else:
            object.__setattr__(self, name, value)


printoptions = _PrintOptions()
