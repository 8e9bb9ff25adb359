"""Dense numpy oracle for braided leg permutations.

Role-equivalent to reference ``cyten/testing/swap_gate_numpy.py`` (:15-40): applies
explicit swap gates (``cyten_tpu.symmetries.swap_gate``) to the dense representation
so that braided permutations of fermionic tensors can be checked against numpy.
"""

from __future__ import annotations

import numpy as np

from ..symmetries import swap_gate

__all__ = ['swap_gate_numpy', 'permutation_as_swaps']


def permutation_as_swaps(perm) -> list[int]:
    """Decompose a permutation into adjacent transpositions (bubble sort).

    Returns positions j, meaning swap (j, j+1), applied left to right, such that
    ``arr[perm]`` results from applying the swaps to ``arr``.
    """
    swaps = []
    # repeatedly bubble the wanted element into place
    arr = list(range(len(perm)))
    want = list(perm)
    for i in range(len(want)):
        j = arr.index(want[i])
        while j > i:
            swaps.append(j - 1)
            arr[j - 1], arr[j] = arr[j], arr[j - 1]
            j -= 1
    return swaps


def swap_gate_numpy(dense: np.ndarray, legs: list, perm) -> np.ndarray:
    """Permute the axes of a dense tensor, inserting swap gates at each adjacent
    transposition (the correct dense oracle for symmetric-but-signed braiding,
    e.g. fermions).

    Parameters
    ----------
    dense : the dense array (axes in legs order)
    legs : the Leg of each axis (as in ``tensor.legs``)
    perm : the target axis permutation
    """
    legs = list(legs)
    res = dense
    for j in permutation_as_swaps(perm):
        V, W = legs[j], legs[j + 1]
        gate = swap_gate(V, W)  # axes [W, V, W*, V*]
        # apply to axes (j, j+1): contract gate's (W*, V*) with res's (W?, ...)
        res = np.tensordot(gate, res, ([3, 2], [j, j + 1]))
        # gate output axes [W, V] are now at the front; move back to (j, j+1)
        order = list(range(2, res.ndim))
        order[j:j] = [0, 1]
        res = np.transpose(res, order)
        legs[j], legs[j + 1] = legs[j + 1], legs[j]
    return res
