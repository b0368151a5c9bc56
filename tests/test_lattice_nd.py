"""Dimension-general irregular lattice (the reference's gen-2 scope).

Parity with /root/reference/Python/Irregular/test_Lattice.py:5-22 (box
counts, per-box spacings, total point counts for dims {2, 3, 6}) plus what
the reference never had: an end-to-end 2D eigenproblem against the scipy
oracle and n-D moment-condition checks on the LSQ stencils.
"""

import numpy as np
import pytest

import lanczos_tpu as lt
from lanczos_tpu.models.irr_hamiltonian import irregular_laplacian_rows
from lanczos_tpu.models.irrlap import laplacian_weights
from lanczos_tpu.models.lattice import build_lattice, find_neighbors


@pytest.mark.parametrize(
    "ndim,n_fine,bd",
    [(2, 24, 3), (3, 12, 3), (6, 6, 3)],
)
def test_lattice_counts(ndim, n_fine, bd):
    """Box count, per-box point count, and total (test_Lattice.py semantics)."""
    nb = bd**ndim
    sp = np.full(nb, 2, dtype=np.int64)
    sp[nb // 2] = 1
    lat = build_lattice(n_fine, 25.0, bd, spacings=sp, ndim=ndim)
    npb = n_fine // bd
    expected = (nb - 1) * (npb // 2) ** ndim + npb**ndim
    assert lat.num_points == expected
    assert lat.ndim == ndim
    assert lat.occupancy.shape == (n_fine**ndim,)
    # Every point maps back to itself through the occupancy grid.
    assert (lat.lookup(lat.coords) == np.arange(lat.num_points)).all()


@pytest.mark.parametrize("ndim", [2, 3])
def test_uniform_lattice_aligned_stencil(ndim):
    nb = 3**ndim
    lat = build_lattice(12, 25.0, 3, spacings=np.full(nb, 2), ndim=ndim)
    nbrs, rels = find_neighbors(lat, 1, backend="numpy")
    assert nbrs.shape[1] == 3**ndim - 1
    assert (nbrs >= 0).all()
    assert np.abs(rels).max() == 2


def test_laplacian_weights_2d_analytic():
    """On the regular 2D 8-point neighborhood the LSQ weights must satisfy
    the moment conditions exactly (sum w x_a x_b = 2 delta_ab)."""
    offs = np.array(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    )
    w = laplacian_weights(offs)
    x = offs.astype(float)
    assert abs(np.sum(w * x[:, 0])) < 1e-12
    assert abs(np.sum(w * x[:, 1])) < 1e-12
    assert abs(np.sum(w * x[:, 0] * x[:, 0]) - 2.0) < 1e-12
    assert abs(np.sum(w * x[:, 1] * x[:, 1]) - 2.0) < 1e-12
    assert abs(np.sum(w * x[:, 0] * x[:, 1])) < 1e-12


def test_moment_conditions_mixed_2d():
    nb = 9
    sp = np.full(nb, 2, dtype=np.int64)
    sp[4] = 1
    lat = build_lattice(24, 25.0, 3, spacings=sp, ndim=2)
    nbrs, rels, weights = irregular_laplacian_rows(lat)
    x = rels.astype(float)
    for a in range(2):
        assert np.abs(np.einsum("pk,pk->p", weights, x[..., a])).max() < 1e-6
        for b in range(a, 2):
            target = 2.0 if a == b else 0.0
            got = np.einsum("pk,pk->p", weights, x[..., a] * x[..., b])
            assert np.abs(got - target).max() < 1e-6


def test_2d_eigensolve_vs_scipy():
    """End-to-end: 2D mixed-spacing lattice kinetic+well spectrum via the
    two-sided solver matches scipy on the assembled matrix."""
    import scipy.sparse.linalg

    def well(x, y):
        import jax.numpy as jnp

        r2 = x * x + y * y
        return -8.0 * jnp.exp(-((r2 / 25.0) ** 2))

    nb = 9
    sp = np.full(nb, 2, dtype=np.int64)
    sp[4] = 1
    lat = build_lattice(24, 25.0, 3, spacings=sp, ndim=2)
    H = lt.assemble_irregular_hamiltonian(lat, well, dtype=np.float64)
    n = min(200, H.shape[0])
    fac = lt.two_sided_lanczos(H, n, op_transpose=H.transpose(), dtype=np.float64)
    vals, _ = lt.two_sided_eigs(fac)
    lo = np.sort(np.real(np.asarray(vals)))[:3]

    A = H.to_scipy().asfptype()
    exact = np.sort(
        np.real(scipy.sparse.linalg.eigs(A, k=6, which="SR")[0])
    )[:3]
    np.testing.assert_allclose(lo, exact, atol=5e-3, rtol=1e-3)


def test_6d_neighbor_search_smoke():
    nb = 3**6
    sp = np.full(nb, 2, dtype=np.int64)
    sp[nb // 2] = 1
    lat = build_lattice(6, 25.0, 3, spacings=sp, ndim=6)
    idx = np.arange(0, lat.num_points, max(1, lat.num_points // 64))
    nbrs, rels = find_neighbors(lat, 1, idx, backend="numpy")
    assert (nbrs >= 0).any()
    # Mirror symmetry of every returned cloud.
    for row in range(len(idx)):
        got = {tuple(r) for r, nb_ in zip(rels[row], nbrs[row]) if nb_ >= 0}
        assert got == {tuple(-np.array(r)) for r in got}


def test_6d_sparse_occupancy_at_scale():
    """A 6-D lattice whose fine grid (64^6 cells = 550 GB dense) only fits
    through the sorted-table occupancy (VERDICT r1 #8); lookup semantics must
    match the dense path exactly."""
    from lanczos_tpu.models.lattice import DENSE_OCCUPANCY_LIMIT

    bd, n_fine = 4, 64
    nb = bd**6
    sp = np.full(nb, 8, dtype=np.int64)
    sp[nb // 2] = 4
    assert n_fine**6 > DENSE_OCCUPANCY_LIMIT
    lat = build_lattice(n_fine, 25.0, bd, spacings=sp, ndim=6)
    assert lat.occupancy is None
    assert lat.num_points == (nb - 1) * 2**6 + 4**6
    # Round-trip through the sparse lookup, plus misses map to -1.
    assert (lat.lookup(lat.coords) == np.arange(lat.num_points)).all()
    assert (lat.lookup(lat.coords + 1) == -1).any()
    # Neighbor search agrees with the 3-D semantics: interior same-spacing
    # points get the full aligned 3^6-1 stencil at their own spacing.
    idx = np.arange(0, lat.num_points, max(1, lat.num_points // 32))
    nbrs, rels = find_neighbors(lat, 1, idx, backend="numpy")
    a_own = lat.spacings[lat.box_of_point[idx]]
    full = (nbrs >= 0).sum(axis=1) == 3**6 - 1
    assert full.any()
    # Full-stencil (interior) rows reach exactly +-a_own in every axis.
    assert all(
        np.abs(rels[i][nbrs[i] >= 0]).max() == a_own[i]
        for i in np.nonzero(full)[0]
    )


def test_sparse_occupancy_matches_dense():
    """Force the sparse path on a small 3-D lattice and compare every lookup
    against the dense occupancy."""
    import dataclasses as _dc

    nb = 27
    sp = np.full(nb, 2, dtype=np.int64)
    sp[nb // 2] = 1
    lat = build_lattice(12, 25.0, 3, spacings=sp, ndim=3)
    flat = lat.coords @ lat.strides
    order = np.argsort(flat, kind="stable")
    sparse = _dc.replace(
        lat, occupancy=None, sorted_flat=flat[order], sorted_order=order
    )
    rng = np.random.default_rng(0)
    probe = rng.integers(-12, 24, size=(2000, 3))
    np.testing.assert_array_equal(sparse.lookup(probe), lat.lookup(probe))
    n1, r1 = find_neighbors(lat, 1, backend="numpy")
    n2, r2 = find_neighbors(sparse, 1, backend="numpy")
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(r1, r2)


def test_mixed_nonpow2_spacings_gcd_step():
    """ADVICE r2 (high): with mixed spacings {2, 3} the edge scan must step
    by the GCD (=1 here) of the touched spacings, not their minimum (=2),
    or every +-3 offset is silently dropped.  Compare against a brute-force
    step-1 scan with identical semantics (exist + mirror filter)."""
    nb = 9
    sp = np.full(nb, 2, dtype=np.int64)
    sp[4] = 3  # n_per_box = 6 divisible by both
    lat = build_lattice(18, 25.0, 3, spacings=sp, ndim=2)
    nbrs, rels = find_neighbors(lat, 1, backend="numpy")

    from lanczos_tpu.models.lattice import _local_max_spacing

    idx = np.arange(lat.num_points)
    local_a, _, differs = _local_max_spacing(lat, idx, 1)
    assert differs.any()
    for i in np.nonzero(differs)[0]:
        p = lat.coords[i]
        r = int(local_a[i])
        got = set()
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                if dx == 0 and dy == 0:
                    continue
                off = np.array([dx, dy])
                if lat.lookup((p + off)[None])[0] >= 0 and (
                    lat.lookup((p - off)[None])[0] >= 0
                ):
                    got.add((dx, dy))
        have = {tuple(rr) for rr, nn in zip(rels[i], nbrs[i]) if nn >= 0}
        assert have == got, f"point {i}: missing {got - have}, extra {have - got}"
