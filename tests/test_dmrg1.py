"""Single-site DMRG with subspace expansion (DMRG3S), cf. algorithms/dmrg1.py.

The two-site engine's energies are the oracle here (plus exact diagonalization
references); the 1-site engine must reach them from chi=1 product states, which
is only possible if the subspace expansion grows the bond (a plain 1-site sweep
is stuck at chi=1 by construction).
"""

import numpy as np
import pytest

from cyten_tpu.algorithms import SimpleMPS
from cyten_tpu.algorithms.dmrg1 import DMRG1SEngine
from cyten_tpu.algorithms.models import (
    HeisenbergModel, TFIModel, heisenberg_exact_finite_gs_energy,
    tfi_exact_finite_gs_energy,
)


def test_dmrg1s_tfi_expand_mixer():
    L, g = 8, 1.2
    model = TFIModel(L=L, J=1.0, g=g, conserve='parity', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRG1SEngine(psi, model, chi_max=16, eps=1e-14, alpha=1e-2,
                       alpha_decay=0.2, alpha_min=1e-10)
    assert eng.mixer == 'expand'
    E = eng.run(n_sweeps=18, tol=1e-13)
    assert abs(E - tfi_exact_finite_gs_energy(L, 1.0, g)) < 1e-10
    # chi actually grew from the product state
    assert psi.max_chi() == 16
    # the expansion bookkeeping is exact: E equals the true MPS energy once
    # alpha has decayed
    assert abs(model.energy(psi) - E) < 1e-5


def test_dmrg1s_heisenberg_sz():
    L = 8
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                       backend=model.backend)
    eng = DMRG1SEngine(psi, model, chi_max=32, eps=1e-14, alpha=1e-2)
    E = eng.run(n_sweeps=12, tol=1e-13)
    assert abs(E - heisenberg_exact_finite_gs_energy(L, 1.0)) < 1e-10


@pytest.mark.slow
def test_dmrg1s_su2_density_matrix_mixer():
    """White's density-matrix mixer on the fusion-tree backend (SU(2));
    requested explicitly — the default is now the CG-aware expand mixer."""
    L = 8
    model = HeisenbergModel(L=L, conserve='SU(2)', block_backend='numpy')
    psi = SimpleMPS.from_singlet_pairs(model.site_legs[0], L,
                                       backend=model.backend)
    eng = DMRG1SEngine(psi, model, chi_max=24, eps=1e-14, alpha=1e-2,
                       mixer='density_matrix')
    assert eng.mixer == 'density_matrix'
    E = eng.run(n_sweeps=12, tol=1e-13)
    assert abs(E - heisenberg_exact_finite_gs_energy(L, 1.0)) < 1e-9


def test_dmrg1s_density_matrix_mixer_abelian_crosscheck():
    """The mixer path must agree with the expansion path on abelian symmetry."""
    L = 8
    model = HeisenbergModel(L=L, conserve='Sz', block_backend='numpy')
    psi = SimpleMPS.from_product_state(model.site_legs, [0, 1] * (L // 2),
                                       backend=model.backend)
    eng = DMRG1SEngine(psi, model, chi_max=32, eps=1e-14, alpha=1e-2,
                       mixer='density_matrix')
    E = eng.run(n_sweeps=12, tol=1e-13)
    assert abs(E - heisenberg_exact_finite_gs_energy(L, 1.0)) < 1e-10


def test_dmrg1s_jax_backend():
    """Jitted matvec path on the jax block backend."""
    L, g = 6, 1.5
    model = TFIModel(L=L, J=1.0, g=g, conserve='parity', block_backend='jax')
    psi = SimpleMPS.from_product_state(model.site_legs, [0] * L,
                                       backend=model.backend)
    eng = DMRG1SEngine(psi, model, chi_max=8, eps=1e-14, alpha=1e-2)
    E = eng.run(n_sweeps=10, tol=1e-13)
    assert abs(E - tfi_exact_finite_gs_energy(L, 1.0, g)) < 1e-9


def test_dmrg1s_expand_mixer_su2():
    """The expand mixer on the fusion-tree backend (CG-aware fuser isometry for
    the combined bond.mpo leg) converges to the exact SU(2) Heisenberg energy."""
    from cyten_tpu.algorithms import (
        SimpleMPS, heisenberg_exact_finite_gs_energy,
    )
    from cyten_tpu.algorithms.dmrg1 import DMRG1SEngine
    from cyten_tpu.algorithms.models import HeisenbergModel

    L = 6
    m = HeisenbergModel(L=L, conserve='SU(2)', block_backend='numpy')
    psi = SimpleMPS.from_singlet_pairs(m.site_leg, L, backend=m.backend)
    eng = DMRG1SEngine(psi, m, chi_max=24, mixer='expand')
    E = eng.run(n_sweeps=8)
    assert abs(E - heisenberg_exact_finite_gs_energy(L, 1.)) < 1e-10


def test_fuser_tensor_unitary():
    """fuser_tensor is exactly unitary and reproduces the pipe's sector counts."""
    import numpy as np

    import cyten_tpu as ct
    from cyten_tpu import ElementarySpace, TensorProduct
    from cyten_tpu.backends.fusion_tree import FusionTreeBackend
    from cyten_tpu.tensors import compose, dagger, fuser_tensor

    for sym, sectors, mults in [
        (ct.su2_symmetry, [[0], [1]], [2, 1]),
        (ct.fibonacci_anyon_category, [[0], [1]], [1, 2]),
    ]:
        be = FusionTreeBackend(ct.get_block_backend('numpy'))
        V = ElementarySpace.from_defining_sectors(sym, sectors, mults)
        W = ElementarySpace.from_defining_sectors(sym, sectors, [1, 1])
        S = fuser_tensor([V, W], backend=be, labels=['a', 'b', 'f'])
        S.test_sanity()
        fused = S.domain.factors[0]
        tp = TensorProduct([V, W])
        np.testing.assert_array_equal(fused.sector_decomposition,
                                      tp.sector_decomposition)
        np.testing.assert_array_equal(fused.multiplicities, tp.multiplicities)
        # unitarity: S^dag S = id_fused and S S^dag = id_{V (x) W}
        SdS = compose(dagger(S), S)
        eye_f = ct.SymmetricTensor.from_eye([fused], backend=be, dtype=S.dtype)
        assert ct.almost_equal(SdS, eye_f, rtol=1e-12, atol=1e-12)
        SSd = compose(S, dagger(S))
        eye_vw = ct.SymmetricTensor.from_eye([V, W], backend=be, dtype=S.dtype)
        assert ct.almost_equal(SSd, eye_vw, rtol=1e-12, atol=1e-12)


def test_tensor_from_grid_pipe_legs_work():
    """Grids over fusion-tree pipe legs direct-sum natively.

    This used to be a refusal (with fuser_tensor guidance); tensor_from_grid
    now flattens the pipe via the unitary fuser and sums — the DMRG1S
    expansion path works on pipes directly (see also
    test_tensors_extra.py::test_tensor_from_grid_fusion_tree_pipes).
    """
    import numpy as np

    import cyten_tpu as ct
    from cyten_tpu import ElementarySpace
    from cyten_tpu.tensors import combine_legs, tensor_from_grid

    be = ct.get_backend(ct.su2_symmetry, 'numpy')
    V = ElementarySpace(ct.su2_symmetry, [[0], [1]], [2, 1])
    rng = np.random.default_rng(0)
    t = ct.SymmetricTensor.from_random_normal([V, V], [V, V], backend=be,
                                              rng=rng, labels=list('abcd'))
    tc = combine_legs(t, ['c', 'd'])
    G = tensor_from_grid([[tc, tc]], row_leg=0, col_leg=2)
    G.test_sanity()
    assert abs(float(G.legs[2].dim) - 2 * float(tc.legs[2].dim)) < 1e-10
    # block-diagonal-free content check through the dense oracle
    g = G.to_numpy()
    d = tc.to_numpy()
    assert abs(np.linalg.norm(g) ** 2 - 2 * np.linalg.norm(d) ** 2) < 1e-8
