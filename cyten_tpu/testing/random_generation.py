"""Random test-data generators with guaranteed non-empty block structure.

Role-equivalent to reference ``cyten/testing/random_generation.py``
(random_ElementarySpace :60, random_leg :119, randomly_drop_blocks :152,
random_tensor :282).
"""

from __future__ import annotations

import numpy as np

from ..symmetries import ElementarySpace, Symmetry, TensorProduct

__all__ = ['random_ElementarySpace', 'random_leg', 'random_tensor',
           'randomly_drop_blocks', 'random_block', 'random_factor_sectors',
           'random_symmetry_sectors', 'random_LegPipe', 'find_last_leg',
           'check_tensor_memory_usage']


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


def random_block(block_backend, size, real: bool = False,
                 np_random: np.random.Generator = None):
    """A random backend-specific block of the given shape
    (reference random_generation.py:13)."""
    np_random = np_random or np.random.default_rng()
    block = np_random.normal(size=size)
    if not real:
        block = block + 1.j * np_random.normal(size=size)
    return block_backend.as_block(block)


def random_factor_sectors(factor, num: int,
                          np_random: np.random.Generator = None):
    """`num` unique random sectors of a single symmetry factor
    (reference random_generation.py:40)."""
    from ..symmetries import SU2, U1, SymmetryFactor

    np_random = np_random or np.random.default_rng()
    if isinstance(factor, Symmetry):  # premade instances wrap a single factor
        assert factor.num_factors == 1, 'use random_symmetry_sectors for products'
        factor = factor.factors[0]
    assert isinstance(factor, SymmetryFactor)
    if isinstance(factor, SU2):
        return np_random.choice(max(int(1.3 * num), 2), replace=False,
                                size=(num, 1))
    if isinstance(factor, U1):
        vals = np.asarray(list(range(-num, num)) + [123])
        return np_random.choice(vals, replace=False, size=(num, 1))
    if factor.num_sectors < np.inf:
        all_ = factor.all_sectors()
        if factor.num_sectors <= num:
            return np_random.permutation(all_)
        which = np_random.choice(int(factor.num_sectors), replace=False, size=num)
        return all_[which, :]
    raise NotImplementedError(f'random sectors for {factor!r}')


def random_symmetry_sectors(symmetry: Symmetry, num: int, sort: bool = False,
                            np_random: np.random.Generator = None):
    """Up to `num` unique random sectors of a (possibly product) symmetry
    (reference random_generation.py:21)."""
    np_random = np_random or np.random.default_rng()
    per_factor = max(3, num // max(1, symmetry.num_factors))
    factor_sectors = [
        random_factor_sectors(f, min(per_factor, int(min(f.num_sectors, per_factor))),
                              np_random=np_random)
        for f in symmetry.factors]
    combs = np.indices([len(s) for s in factor_sectors]).T.reshape(
        (-1, len(factor_sectors)))
    if len(combs) > num:
        combs = np_random.choice(combs, replace=False, size=num)
    res = np.hstack([fs[i] for fs, i in zip(factor_sectors, combs.T)])
    if sort:
        res = res[np.lexsort(res.T)]
    return res


def random_LegPipe(symmetry: Symmetry, backend, max_sectors: int = 5,
                   max_mult: int = 5, is_dual: bool = None, num_legs: int = 2,
                   np_random: np.random.Generator = None):
    """A random backend-specific pipe over `num_legs` random spaces
    (reference random_generation.py:70)."""
    np_random = np_random or np.random.default_rng()
    if is_dual is None:
        is_dual = bool(np_random.random() < 0.5)
    # split the sector/multiplicity budgets multiplicatively over the legs
    per_leg_sectors = max(1, int(round(max_sectors ** (1. / num_legs))))
    per_leg_mult = max(1, int(round(max_mult ** (1. / num_legs))))
    legs = [random_ElementarySpace(symmetry, np_random,
                                   max_sectors=per_leg_sectors,
                                   max_mult=per_leg_mult)
            for _ in range(num_legs)]
    return backend.make_pipe(legs, is_dual=is_dual)


def find_last_leg(same: TensorProduct, opposite: TensorProduct,
                  max_sectors: int, max_mult: int, backend=None,
                  extra_sectors=None, is_dual: bool = False,
                  np_random: np.random.Generator = None) -> ElementarySpace:
    """A leg to append to `same` such that the tensor ``same (+leg) <- opposite``
    has nonzero blocks (reference random_generation.py:206).

    Chooses (a subset of) the sectors of ``dual(same) x opposite``, i.e. exactly
    those a new `same`-side leg must carry for charge-compatible blocks to
    exist; optionally mixes in `extra_sectors`.
    """
    np_random = np_random or np.random.default_rng()
    assert same.num_sectors > 0 and opposite.num_sectors > 0
    prod = TensorProduct.from_partial_products(same.dual, opposite)
    sectors = prod.sector_decomposition.copy()
    mults = np.minimum(prod.multiplicities, max_mult)
    if len(sectors) > max_sectors:
        which = np.sort(np_random.choice(len(sectors), size=max_sectors,
                                         replace=False))
        sectors, mults = sectors[which], mults[which]
    if extra_sectors is not None:
        extra_sectors = np.asarray(extra_sectors)
        dup = np.any(np.all(extra_sectors[None, :, :] == sectors[:, None, :],
                            axis=2), axis=0)
        extra_sectors = extra_sectors[~dup]
        n_max = min(len(sectors) // 2, len(extra_sectors))
        if n_max >= 1:
            n = int(np_random.integers(1, n_max, endpoint=True))
            which = np_random.choice(len(sectors), size=n, replace=False)
            sectors[which, :] = extra_sectors[:n]
    order = np.lexsort(sectors.T)
    res = ElementarySpace.from_defining_sectors(
        same.symmetry, sectors[order], mults[order], is_dual=is_dual,
        unique_sectors=True)
    res.test_sanity()
    return res


def check_tensor_memory_usage(codomain: TensorProduct, domain: TensorProduct,
                              real: bool, limit_gb: float = 1.0):
    """Raise if the estimated dense block storage exceeds `limit_gb`
    (reference random_generation.py:664)."""
    from ..tools.misc import iter_common_sorted_arrays

    num_entries = 0
    for i, j in iter_common_sorted_arrays(codomain.sector_decomposition,
                                          domain.sector_decomposition):
        num_entries += codomain.block_size(i) * domain.block_size(j)
    memory = (8 if real else 16) * num_entries / 1024 ** 3
    if memory > limit_gb:
        raise RuntimeError(f'Estimated tensor memory {memory:.2f}GB exceeds '
                           f'{limit_gb:.2f}GB')
