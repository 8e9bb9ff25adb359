"""Framework-internal exact diagonalization for anyonic chains.

Anyons have no dense representation, so the usual numpy-ED oracle does not exist.
Instead we build the full chain Hamiltonian *inside the framework* (embedding each
bond operator with outer products and planar rearrangements), diagonalize it with
the symmetric ``eigh``, and compare DMRG against that. The harness itself is
validated on the golden chain against the MPSKit.jl anchors.
"""

import numpy as np
import pytest

import cyten_tpu as ct
from cyten_tpu.tensors import SymmetricTensor, eigh, outer, permute_legs


def full_chain_hamiltonian(h_bonds, site_leg, backend):
    """H = sum_i 1 x .. x h_i x .. x 1 as one tensor [p0..pL-1 | p0..pL-1]."""
    L = len(h_bonds) + 1
    H = None
    for i, h in enumerate(h_bonds):
        # h legs [p0, p1, p1*, p0*] -> term with identities padded on both sides
        term = h.relabelled([f'p{i}', f'p{i+1}', f'p{i+1}*', f'p{i}*'])
        for j in range(i - 1, -1, -1):  # prepend identities
            eye = SymmetricTensor.from_eye([site_leg], backend=backend,
                                           labels=[f'p{j}'], dtype=h.dtype)
            term = outer(eye, term)
        for j in range(i + 2, L):       # append identities
            eye = SymmetricTensor.from_eye([site_leg], backend=backend,
                                           labels=[f'p{j}'], dtype=h.dtype)
            term = outer(term, eye)
        term = permute_legs(term, codomain=[f'p{j}' for j in range(L)],
                            domain=[f'p{j}*' for j in range(L)])
        H = term if H is None else H + term
    return H


def lowest_eigenvalue(H) -> float:
    W, V = eigh(H)
    return float(np.min(W.diag_block_min()) if hasattr(W, 'diag_block_min')
                 else min(float(np.min(np.asarray(b))) for b in W.data.blocks))


def test_golden_chain_ed_matches_mpskit():
    """Validate the anyonic ED harness against the MPSKit.jl anchor (L=6)."""
    from cyten_tpu.algorithms.models import GoldenChainModel

    model = GoldenChainModel(L=6, block_backend='numpy')
    H = full_chain_hamiltonian(model.H_bonds, model.site_leg, model.backend)
    E0 = lowest_eigenvalue(H)
    np.testing.assert_allclose(E0, model.EXACT_ENERGIES[6], atol=1e-9)


def test_ising_anyon_chain_dmrg_vs_ed():
    """Ising-anyon chain (sigma anyons, vacuum-channel projector Hamiltonian):
    DMRG vs framework-internal ED — a second anyonic end-to-end anchor."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import mpo_from_bond_op
    from cyten_tpu.models.couplings import sector_projection_coupling
    from cyten_tpu.models.sites import IsingAnyonSite

    L = 8
    site = IsingAnyonSite()
    sym = site.symmetry
    coup = sector_projection_coupling([site, site], J=-1.,
                                      sector=sym.trivial_sector)
    h_bond = coup.to_tensor()

    class IsingAnyonChain:
        site_leg = site.leg
        backend = site.backend
        H_bonds = [h_bond] * (L - 1)
        H_mpo = mpo_from_bond_op(h_bond, L)

    model = IsingAnyonChain()
    H = full_chain_hamiltonian(model.H_bonds, site.leg, site.backend)
    E0 = lowest_eigenvalue(H)

    psi = SimpleMPS.from_fusion_pairs(site.leg, L, backend=site.backend)
    E = DMRGEngine(psi, model, chi_max=16, eps=1e-13).run(n_sweeps=8)
    np.testing.assert_allclose(E, E0, atol=1e-9)


def test_su2k_chain_dmrg_vs_ed():
    """SU(2)_4 'spin-1' anyon chain: third anyonic anchor via internal ED."""
    from cyten_tpu.algorithms import DMRGEngine, SimpleMPS
    from cyten_tpu.algorithms.models import mpo_from_bond_op
    from cyten_tpu.models.couplings import sector_projection_coupling
    from cyten_tpu.models.sites import SU2kSpin1Site

    L = 6
    site = SU2kSpin1Site(k=4)
    sym = site.symmetry
    coup = sector_projection_coupling([site, site], J=-1.,
                                      sector=sym.trivial_sector)
    h_bond = coup.to_tensor()

    class Chain:
        site_leg = site.leg
        backend = site.backend
        H_bonds = [h_bond] * (L - 1)
        H_mpo = mpo_from_bond_op(h_bond, L)

    H = full_chain_hamiltonian(Chain.H_bonds, site.leg, site.backend)
    E0 = lowest_eigenvalue(H)
    psi = SimpleMPS.from_fusion_pairs(site.leg, L, backend=site.backend)
    E = DMRGEngine(psi, Chain(), chi_max=20, eps=1e-13).run(n_sweeps=8)
    np.testing.assert_allclose(E, E0, atol=1e-9)
