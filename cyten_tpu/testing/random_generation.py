"""Random test-data generators with guaranteed non-empty block structure.

Role-equivalent to reference ``cyten/testing/random_generation.py``
(random_ElementarySpace :60, random_leg :119, randomly_drop_blocks :152,
random_tensor :282).
"""

from __future__ import annotations

import numpy as np

from ..symmetries import ElementarySpace, Symmetry, TensorProduct

__all__ = ['random_ElementarySpace', 'random_leg', 'random_tensor',
           'randomly_drop_blocks']


def random_ElementarySpace(symmetry: Symmetry, rng: np.random.Generator = None,
                           max_sectors: int = 4, max_mult: int = 4,
                           is_dual: bool = None) -> ElementarySpace:
    """A random space with a few sectors and small multiplicities."""
    rng = rng or np.random.default_rng()
    if is_dual is None:
        is_dual = bool(rng.integers(2))
    if symmetry.num_sectors != np.inf and symmetry.num_sectors < 100:
        candidates = symmetry.all_sectors()
    else:
        cols = []
        for f in symmetry.factors:
            if f.num_sectors == np.inf:
                cols.append(rng.integers(-2, 3, size=(20, f.sector_ind_len)))
            else:
                all_f = f.all_sectors()
                cols.append(all_f[rng.integers(0, len(all_f), size=20)])
        candidates = np.unique(np.concatenate(cols, axis=1), axis=0)
    n = min(len(candidates), int(rng.integers(1, max_sectors + 1)))
    which = rng.choice(len(candidates), size=n, replace=False)
    mults = rng.integers(1, max_mult + 1, size=n)
    return ElementarySpace.from_defining_sectors(
        symmetry, candidates[which], mults, is_dual=is_dual, unique_sectors=True)


random_leg = random_ElementarySpace


def random_tensor(codomain, domain=None, backend=None, labels=None,
                  rng: np.random.Generator = None, cls=None):
    """A random tensor guaranteed to have at least one allowed block.

    If the given legs admit no charge-compatible blocks, the last domain (or
    codomain) leg is enlarged by the missing coupled sectors.
    """
    from ..tensors import SymmetricTensor

    rng = rng or np.random.default_rng()
    if cls is None:
        cls = SymmetricTensor
    res = cls.from_random_normal(codomain, domain, backend=backend, labels=labels,
                                 rng=rng)
    if len(getattr(res.data, 'blocks', [0])) == 0 and res.num_domain_legs > 0:
        # enlarge the last domain factor so at least one coupled sector matches
        cod_sectors = res.codomain.sector_decomposition
        extra = ElementarySpace.from_sector_decomposition(
            res.symmetry, cod_sectors[:1], [1], unique_sectors=True)
        new_last = res.domain.factors[0].direct_sum(
            extra.with_is_dual(res.domain.factors[0].is_dual))
        domain2 = [new_last] + list(res.domain.factors[1:])
        res = cls.from_random_normal(list(res.codomain.factors), domain2,
                                     backend=res.backend, labels=labels, rng=rng)
    return res


def randomly_drop_blocks(tensor, fraction: float = 0.5,
                         rng: np.random.Generator = None):
    """Randomly zero out (drop) a fraction of the blocks, keeping at least one."""
    from ..backends.data import BlockSparseData

    rng = rng or np.random.default_rng()
    data = tensor.data
    if not isinstance(data, BlockSparseData) or len(data.blocks) <= 1:
        return tensor
    n = len(data.blocks)
    keep = rng.random(n) > fraction
    if not keep.any():
        keep[rng.integers(n)] = True
    blocks = [b for b, k in zip(data.blocks, keep) if k]
    block_inds = data.block_inds[keep]
    res = tensor.copy(deep=False)
    res.data = BlockSparseData(blocks, block_inds, data.dtype, is_sorted=True)
    return res
