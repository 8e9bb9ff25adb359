"""Tests dealing with different devices (reference tests/python_tests/test_devices.py).

On this machine only CPU devices exist (JAX runs with a virtual CPU mesh, torch
is CPU-only), so the cross-device moves reduce to same-device round trips plus
the bookkeeping (``device`` attribute, copy semantics) — mirroring the
reference's skip-heavy structure (test_devices.py:16-25 skips unavailable
devices).
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu import ChargedTensor, SymmetricTensor
from cyten_tpu.symmetries import ElementarySpace
from cyten_tpu.tensors import almost_equal, on_device


@pytest.mark.parametrize('cls', ['SymmetricTensor', 'ChargedTensor'])
def test_device_control(cls, block_backend, np_random):
    sym = ct.u1_symmetry
    backend = ct.get_backend(sym, block_backend)
    # skip if the backend cannot report devices at all
    try:
        x = backend.block_backend.as_block(np.ones(1))
        device1 = backend.block_backend.get_device(x)
    except Exception:
        pytest.skip(reason=f'device handling not available on {block_backend}')

    leg = ElementarySpace.from_defining_sectors(sym, [[0], [1]], [2, 3])
    T1 = SymmetricTensor.from_random_normal([leg], [leg], backend=backend,
                                            rng=np_random, labels=['a', 'b'])
    if cls == 'ChargedTensor':
        q = ElementarySpace.from_defining_sectors(sym, [[1]], [1])
        inv = SymmetricTensor.from_random_normal(
            [leg], [q, leg], backend=backend, rng=np_random,
            labels=[['a'], [ChargedTensor._CHARGE_LEG_LABEL, 'b']])
        T1 = ChargedTensor(inv, np_random.normal(size=(1,)))
    T1.test_sanity()
    dev = T1.device
    assert isinstance(dev, str) and len(dev) > 0

    # copy=True must leave the original untouched and produce an equal tensor
    T2 = on_device(T1, device=dev, copy=True)
    T2.test_sanity()
    assert T2.device == dev
    assert T1.device == dev
    assert almost_equal(T1, T2)

    # copy=False moves in place (same-device: contents unchanged)
    T3 = on_device(T1, device=dev, copy=False)
    T3.test_sanity()
    assert T3.device == dev
    assert almost_equal(T3, T2)


def test_unavailable_device_raises(block_backend):
    sym = ct.u1_symmetry
    backend = ct.get_backend(sym, block_backend)
    leg = ElementarySpace.from_defining_sectors(sym, [[0], [1]], [2, 2])
    T = SymmetricTensor.from_random_normal([leg], [leg], backend=backend)
    with pytest.raises(Exception):
        on_device(T, device='not_a_real_device:99')
