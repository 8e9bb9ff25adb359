"""Gather-compiled linear contraction chains — the TPU hot-path compiler.

No reference counterpart (SURVEY.md §2.9: the reference loops per-block in Python).
On the per-coupled-sector storage layout (FusionTreeBackend), every *structural* op
(permute_legs, bends, combine/split) acts on the data as an **entry permutation with
scalar coefficients**: for a fixed tensor structure it can be precomputed host-side
and applied on device as ONE gather per output block. A chain of tdots against
constant tensors (the DMRG effective Hamiltonian, transfer matrices, ...) then
compiles to::

    gather -> per-sector GEMM -> gather -> GEMM -> ... -> gather

with roughly 10x fewer XLA ops than the generic per-block path, and one large GEMM
per coupled sector instead of one small GEMM per block triple.

The plans are extracted by *tracing*: the structural op is executed once on the host
(numpy blocks) with index-valued entries; the output entries reveal each slot's
source position (and running the same op on all-ones blocks reveals the scalar
coefficients, including zero for slots whose source block is absent upstream).
This works for any backend whose structural ops are entry permutations — it needs no
access to the op's internals and stays correct as tree-move conventions evolve.
"""

from __future__ import annotations

import numpy as np

from ..dtypes import Dtype

__all__ = ['GatherPlan', 'CompiledContractionChain', 'compile_heff_chain']


def _flat_size(data) -> int:
    return sum(int(np.prod(np.asarray(b).shape)) for b in data.blocks)


def _index_tracer_like(t):
    """Copy of tensor `t` whose entries are their global flat positions (float64)."""
    res = t.copy(deep=True)
    off = 0
    blocks = []
    for b in res.data.blocks:
        n = int(np.prod(np.asarray(b).shape))
        blocks.append(np.arange(off, off + n, dtype=np.float64).reshape(
            np.asarray(b).shape))
        off += n
    res.data.blocks = blocks
    res.data.dtype = Dtype.float64
    res.dtype = Dtype.float64
    return res


def _ones_like(t):
    res = t.copy(deep=True)
    res.data.blocks = [np.ones_like(np.asarray(b), dtype=np.float64)
                       for b in res.data.blocks]
    res.data.dtype = Dtype.float64
    res.dtype = Dtype.float64
    return res


class GatherPlan:
    """A structural tensor op, compiled to one gather per output block.

    Build with :meth:`from_function` by tracing `fn` (any entry-permutation op, e.g.
    a ``permute_legs`` closure) on a host-side (numpy-block) `template` tensor.
    Apply with :meth:`apply` to a list of device blocks with the template's
    structure. Slots with no source entry (blocks absent upstream) read a zero
    sentinel appended to the flattened input.
    """

    def __init__(self, idx, coeffs, out_shapes, out_structure):
        self.idx = idx                  # list of 1D intp arrays (per out block)
        self.coeffs = coeffs            # list of (1D float array | None)
        self.out_shapes = out_shapes    # list of tuples
        self.out_structure = out_structure  # host template of the output tensor

    @classmethod
    def from_function(cls, fn, template) -> GatherPlan:
        tracer_out = fn(_index_tracer_like(template))
        ones_out = fn(_ones_like(template))
        sentinel = _flat_size(template.data)
        idx, coeffs, shapes = [], [], []
        for bi, bc in zip(tracer_out.data.blocks, ones_out.data.blocks):
            bi = np.asarray(bi)
            bc = np.asarray(bc)
            zero = bc == 0
            safe = np.where(zero, 1.0, bc)
            pos = np.round(bi / safe)
            # verify the trace is consistent (pure permutation-with-coefficients)
            assert np.all(np.abs(bi - pos * safe) < 1e-6), \
                'op is not an entry permutation'
            # int32 suffices for < 2^31 entries and halves the index-array traffic
            idx_dtype = np.int32 if sentinel < 2 ** 31 else np.int64
            idx.append(np.where(zero, sentinel, pos).astype(idx_dtype).reshape(-1))
            c = np.where(zero, 1.0, bc).reshape(-1)
            coeffs.append(None if np.allclose(c, 1.0) else c)
            shapes.append(tuple(int(s) for s in bi.shape))
        return cls(idx, coeffs, shapes, tracer_out)

    def apply(self, blocks, xp=None):
        """Apply to device blocks (list, template order). jit-traceable with jax."""
        if xp is None:
            import jax.numpy as xp
        flat = xp.concatenate([xp.reshape(b, (-1,)) for b in blocks]
                              + [xp.zeros((1,), blocks[0].dtype)])
        out = []
        for idx, c, shp in zip(self.idx, self.coeffs, self.out_shapes):
            g = flat[idx]
            if c is not None:
                g = g * xp.asarray(c, dtype=g.dtype)
            out.append(xp.reshape(g, shp))
        return out


class CompiledContractionChain:
    """Compile ``x -> permute(tdot(...tdot(x, A1, ...) ..., An, ...))`` to
    gathers + per-coupled-sector GEMMs.

    Parameters
    ----------
    x_template : SymmetricTensor
        Host-side (numpy-block) tensor with the structure of the chain input. Must
        live on a per-coupled-sector-layout backend (FusionTreeBackend).
    steps : list of (SymmetricTensor, legs_x, legs_op)
        Constant operands (host-side, same backend) and the legs to contract, as for
        ``tdot(x, op, legs_x, legs_op)``.
    final : callable, optional
        A structural post-processing op (e.g. relabel + permute back to the input
        structure), applied to the host chain to define the output arrangement.

    After construction, :meth:`bind` converts the constants to device blocks and
    returns a jit-traceable ``blocks -> blocks`` function.
    """

    def __init__(self, x_template, steps, final=None):
        from ..tensors._functions import compose, permute_legs

        self.backend = x_template.backend
        plans = []
        gemm_pairs = []
        const_hosts = []
        x = x_template
        for op, legs_x, legs_op in steps:
            ix = x.get_leg_idcs(legs_x)
            iop = op.get_leg_idcs(legs_op)
            rest_x = [n for n in range(x.num_legs) if n not in ix]
            rest_op = [n for n in range(op.num_legs) if n not in iop]

            def xP(t, rest=rest_x, ic=ix):
                return permute_legs(t, codomain=rest, domain=ic[::-1])

            xPt = xP(x)
            plans.append(GatherPlan.from_function(xP, x))
            opP = permute_legs(op, codomain=iop[::-1], domain=rest_op[::-1])
            const_hosts.append(opP)
            gemm_pairs.append(self._pairs(xPt, opP))
            x = compose(xPt, opP)
        if final is not None:
            plans.append(GatherPlan.from_function(final, x))
            x = final(x)
        self.plans = plans
        self.const_hosts = const_hosts
        self.gemm_pairs = gemm_pairs
        self.out_template = x
        self.has_final = final is not None

    @staticmethod
    def _pairs(a, b):
        """GEMM pairing: a blocks [i_cod, j_dom] with b blocks [k_cod, l_dom] where
        a's domain coupled sector == b's codomain coupled sector."""
        lookup_b = {}
        for m, (k, l) in enumerate(b.data.block_inds):
            c = tuple(np.asarray(b.codomain.sector_decomposition[int(k)]).tolist())
            lookup_b[c] = m
        pairs = []
        for n, (i, j) in enumerate(a.data.block_inds):
            c = tuple(np.asarray(a.domain.sector_decomposition[int(j)]).tolist())
            m = lookup_b.get(c)
            if m is not None:
                pairs.append((n, m))
        return pairs

    def bind(self, block_backend=None, dtype=None):
        """Device-bind the constants; returns jit-traceable ``blocks -> blocks``."""
        import jax.numpy as jnp

        np_dtype = (dtype or self.out_template.dtype).to_numpy
        consts = [[jnp.asarray(np.asarray(b), dtype=np_dtype)
                   for b in t.data.blocks] for t in self.const_hosts]
        plans = self.plans
        gemm_pairs = self.gemm_pairs
        n_steps = len(consts)

        def apply(blocks):
            x = plans[0].apply(blocks)
            for s in range(n_steps):
                y = [x[n] @ consts[s][m] for (n, m) in gemm_pairs[s]]
                if s + 1 < len(plans):
                    x = plans[s + 1].apply(y)
                else:
                    x = y
            return x

        return apply

    def host_reference(self, x):
        """Run the uncompiled chain on a host tensor (for validation)."""
        from ..tensors._functions import tdot

        raise NotImplementedError('kept for API symmetry; use the chain spec')


def compile_heff_chain(LP, RP, W1, W2, theta_template):
    """Compile the two-site DMRG effective-Hamiltonian matvec.

    Mirrors :func:`cyten_tpu.algorithms.dmrg._heff_matvec_impl` (the planar chain
    theta·LP·W1·W2·RP with the final planar rearrangement) for tensors on a
    per-coupled-sector-layout backend with numpy blocks; returns a
    :class:`CompiledContractionChain`.
    """
    from ..tensors._functions import permute_legs

    def final(t):
        t = t.relabelled({'vR*': 'vL', 'vL*': 'vR'})
        return permute_legs(t, codomain=['vL', 'p0', 'p1'], domain=['vR'])

    steps = [
        (LP, ['vL'], ['vR']),
        (W1, ['p0', 'wR'], ['p0*', 'wL']),
        (W2, ['p1', 'wR'], ['p1*', 'wL']),
        (RP, ['vR', 'wR'], ['vL', 'wL']),
    ]
    return CompiledContractionChain(theta_template, steps, final=final)
