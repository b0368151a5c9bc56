"""Irregular lattice line: LSQ weights, lattice geometry, Hamiltonian assembly.

Oracles per SURVEY.md §4: analytic 27-point weights (the reference's own
self-check, IrrLap.py:153-169), quadratic moment conditions, box/point-count
invariants (test_Lattice.py:5-22), and the one-big-box irregular==regular
equivalence recorded in the writeup (notes.tex:334)."""

import itertools

import numpy as np
import pytest

from lanczos_tpu.models.irrlap import laplacian_weights, laplacian_weights_batch
from lanczos_tpu.models.lattice import build_lattice, find_neighbors
from lanczos_tpu.models.irr_hamiltonian import (
    assemble_irregular_hamiltonian,
    irregular_laplacian_rows,
)
from lanczos_tpu.models.grids import build_regular_hamiltonian
from lanczos_tpu.models.potentials import deuteron_potential_3d


FULL_CUBE = np.array(
    [v for v in itertools.product((-1, 0, 1), repeat=3) if any(v)], dtype=np.int64
)


def test_weights_match_27pt_analytic():
    """Full 26-neighbor cloud reproduces the regular 27-pt stencil weights
    (face 3/13, edge 3/26, corner 1/13; Hamiltonian.py:116-128)."""
    w = laplacian_weights(FULL_CUBE)
    nz = (FULL_CUBE != 0).sum(axis=1)
    np.testing.assert_allclose(w[nz == 1], 3 / 13, rtol=1e-12)
    np.testing.assert_allclose(w[nz == 2], 3 / 26, rtol=1e-12)
    np.testing.assert_allclose(w[nz == 3], 1 / 13, rtol=1e-12)
    np.testing.assert_allclose(w.sum(), 44 / 13, rtol=1e-12)


@pytest.mark.parametrize("scale", [(1, 1, 1), (1, 1, 2), (2, 2, 4)])
def test_weights_moment_conditions(scale):
    """sum_i v_i p(x_i) = (lap p)(0) exactly for all quadratics with p(0)=0."""
    pts = FULL_CUBE * np.asarray(scale)
    w = laplacian_weights(pts)
    x = pts.astype(float)
    for a in range(3):
        np.testing.assert_allclose(w @ x[:, a], 0.0, atol=1e-10)  # gradients
        for b in range(3):
            expect = 2.0 if a == b else 0.0
            np.testing.assert_allclose(
                w @ (x[:, a] * x[:, b]), expect, atol=1e-9
            )


def test_weights_batch_masking():
    """Padded entries get zero weight and do not perturb the solve."""
    pts = np.zeros((1, 30, 3))
    pts[0, :26] = FULL_CUBE
    mask = np.zeros((1, 30), dtype=bool)
    mask[0, :26] = True
    w = laplacian_weights_batch(pts, mask)[0]
    np.testing.assert_allclose(w[:26], laplacian_weights(FULL_CUBE), rtol=1e-12)
    np.testing.assert_allclose(w[26:], 0.0)


def test_lattice_counts_reference_config():
    """N=30, box_depth=3, debug spacings (2 everywhere, center 1):
    26 boxes of (10/2)^3 points + 1 box of 10^3 (reference test_Lattice.py)."""
    lat = build_lattice(30, 1.0, 3, overwrite_spacing=True)
    assert lat.spacings.tolist() == [2] * 13 + [1] + [2] * 13
    assert lat.num_points == 26 * 5**3 + 10**3
    # occupancy is a bijection onto the points
    assert (lat.occupancy >= 0).sum() == lat.num_points
    # all coords land in their box
    npb = lat.n_per_box
    box = (
        lat.coords[:, 0] // npb
        + (lat.coords[:, 1] // npb) * 3
        + (lat.coords[:, 2] // npb) * 9
    )
    np.testing.assert_array_equal(box, lat.box_of_point)


def test_one_big_box_equals_regular():
    """box_depth=1 lattice reproduces the regular 27-pt Hamiltonian exactly
    (the writeup's recorded invariant, notes.tex:334)."""
    n = 8
    length = 25.0
    t_factor = 1.7
    lat = build_lattice(n, length, 1, spacings=np.array([1]))
    h_irr = assemble_irregular_hamiltonian(
        lat, deuteron_potential_3d, t_factor=t_factor, dtype=np.float64
    )
    h_reg = build_regular_hamiltonian(
        n, length, deuteron_potential_3d, stencil="27",
        t_factor=t_factor, dtype="float64",
    )
    a = h_irr.to_scipy().toarray()
    b = h_reg.to_ell().to_scipy().toarray()
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10)


def test_mixed_spacing_neighbor_search():
    """Mixed-spacing lattice: every point has a usable neighborhood and the
    edge-path neighborhoods are mirror-symmetric."""
    lat = build_lattice(24, 1.0, 3, overwrite_spacing=True)
    nbrs, rels = find_neighbors(lat, 1)
    counts = (nbrs >= 0).sum(axis=1)
    assert counts.min() >= 6
    # interior points see exactly the 26-stencil; edge points may see more
    # (fine + coarse points inside the widened cube, like the reference's
    # case-3 search returning every symmetric point in the cube).
    assert (counts == 26).any()
    assert counts.max() <= (2 * 2 + 1) ** 3 - 1
    # mirror symmetry: for every kept offset, its negation is kept too.
    for i in range(0, lat.num_points, 97):
        offs = {tuple(o) for o, n in zip(rels[i], nbrs[i]) if n >= 0}
        assert all(tuple(-np.array(o)) in offs for o in offs)


def test_irregular_rows_moment_conditions():
    """Every assembled row satisfies the Laplacian moment conditions — the
    per-row correctness property that makes the operator a Laplacian."""
    lat = build_lattice(24, 1.0, 3, overwrite_spacing=True)
    nbrs, rels, weights = irregular_laplacian_rows(lat)
    x = rels.astype(float)
    for a in range(3):
        np.testing.assert_allclose(
            np.einsum("pk,pk->p", weights, x[..., a]), 0.0, atol=1e-8
        )
        np.testing.assert_allclose(
            np.einsum("pk,pk->p", weights, x[..., a] ** 2), 2.0, atol=1e-7
        )


def test_widening_rule():
    """Points with <26 mirror-filtered neighbors get the widened D=2 cloud
    (reference rule, IrrHamiltonian.py:49-53)."""
    lat = build_lattice(24, 1.0, 3, overwrite_spacing=True)
    nbrs1, _ = find_neighbors(lat, 1)
    counts1 = (nbrs1 >= 0).sum(axis=1)
    nbrs, _, _ = irregular_laplacian_rows(lat)
    counts = (nbrs >= 0).sum(axis=1)
    needy = counts1 < 26
    assert needy.any()
    assert (counts[needy] >= counts1[needy]).all()


def test_irregular_spectrum_vs_dense_oracle():
    """Small irregular deuteron: two-sided Lanczos + symmetrized paths vs a
    dense host eigensolve of the same assembled matrix."""
    import jax.numpy as jnp
    import scipy.linalg

    from lanczos_tpu import eigsh
    from lanczos_tpu.solver.two_sided import two_sided_eigs, two_sided_lanczos

    lat = build_lattice(12, 25.0, 3, overwrite_spacing=True)
    h = assemble_irregular_hamiltonian(
        lat, deuteron_potential_3d, symmetrize=None, dtype=np.float64
    )
    m = h.shape[0]
    dense = h.to_scipy().toarray()

    # (a) symmetrized average path through the standard symmetric solver
    h_sym = assemble_irregular_hamiltonian(
        lat, deuteron_potential_3d, symmetrize="average", dtype=np.float64
    )
    res = eigsh(h_sym, k=4, n=m, which="SA", dtype=np.float64)
    exact_sym = np.linalg.eigvalsh(0.5 * (dense + dense.T))[:4]
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), exact_sym, rtol=1e-7, atol=1e-7
    )

    # (b) two-sided Lanczos on the non-symmetric operator (n deep enough to
    # converge the lowest pairs, short of the serious-breakdown point)
    fac = two_sided_lanczos(h, 150, op_transpose=h.transpose(), dtype=np.float64)
    vals, vecs = two_sided_eigs(fac)
    exact = np.sort(scipy.linalg.eigvals(dense).real)
    np.testing.assert_allclose(
        np.sort(vals.real)[:4], exact[:4], rtol=1e-6, atol=1e-6
    )
    # right Ritz vectors satisfy H x ~ lambda x for the converged pairs
    order = np.argsort(vals.real)
    x0 = vecs[:, order[0]].real
    lam0 = vals[order[0]].real
    resid = np.linalg.norm(dense @ x0 - lam0 * x0) / np.linalg.norm(x0)
    assert resid < 1e-6
