"""CompositeV2 (region-native strided-conv irregular SpMV) vs the ELL oracle.

The v2 operator must be numerically identical (fp64) to the padded-ELL
assembly from the same lattice rows.  Its vectors live in the region-native
layout (dead slots at region holes): scatter/gather through idx_map.
"""

import numpy as np
import pytest

import lanczos_tpu as lt
from lanczos_tpu.models.irr_hamiltonian import (
    irregular_laplacian_rows,
    kinetic_prefactor,
)
from lanczos_tpu.models.lattice import build_lattice
from lanczos_tpu.ops.composite2 import build_composite_v2


def _mixed_lattice(n=24, bd=3):
    sp = np.full(bd**3, 2, dtype=np.int64)
    sp[bd**3 // 2] = 1
    return build_lattice(n, 25.0, bd, spacings=sp)


def _scatter(op, idx_map, x_lat):
    v = np.zeros(op.shape[0], dtype=x_lat.dtype)
    v[idx_map] = x_lat
    return v


@pytest.fixture(scope="module")
def ops():
    lat = _mixed_lattice()
    ell = lt.assemble_irregular_hamiltonian(
        lat, lt.deuteron_potential_3d, dtype=np.float64
    )
    t_factor = kinetic_prefactor(lat.s)
    nbrs, rels, weights = irregular_laplacian_rows(lat)
    diag = t_factor * weights.sum(axis=1)
    import jax

    phys = lat.physical_coords()
    with jax.default_device(jax.devices("cpu")[0]):
        diag = diag + np.asarray(
            jax.jit(lt.deuteron_potential_3d)(*(phys[:, a] for a in range(3))),
            dtype=np.float64,
        )
    # min_grid_rows=4 so the conv-class path participates even at this
    # small N (production lattices hit it with the default threshold).
    comp, idx_map = build_composite_v2(
        lat, nbrs, rels, weights, diag, scale=-t_factor, dtype=np.float64,
        min_grid_rows=4,
    )
    return lat, ell, comp, idx_map


def test_matvec_matches_ell(ops):
    import jax.numpy as jnp

    lat, ell, comp, idx_map = ops
    rng = np.random.default_rng(0)
    x = rng.normal(size=lat.num_points)
    y_ell = np.asarray(ell.matvec(jnp.asarray(x)))
    y_op = np.asarray(comp.matvec(jnp.asarray(_scatter(comp, idx_map, x))))
    np.testing.assert_allclose(y_op[idx_map], y_ell, atol=1e-9, rtol=1e-9)


def test_dead_slots_are_annihilated(ops):
    """A e_dead = 0: a vector supported only on dead slots maps to zero, so
    a live-masked Krylov start keeps the whole basis live."""
    import jax.numpy as jnp

    lat, ell, comp, idx_map = ops
    m = comp.shape[0]
    assert m > lat.num_points  # there are dead slots
    rng = np.random.default_rng(7)
    v = rng.normal(size=m)
    dead = np.asarray(comp.live) == 0
    v_dead = np.where(dead, v, 0.0)
    y = np.asarray(comp.matvec(jnp.asarray(v_dead)))
    assert np.abs(y).max() == 0.0


def test_matmat_matches_matvec(ops):
    import jax.numpy as jnp

    lat, ell, comp, idx_map = ops
    rng = np.random.default_rng(1)
    X = rng.normal(size=(comp.shape[0], 3))
    Y = np.asarray(comp.matmat(jnp.asarray(X)))
    for j in range(3):
        np.testing.assert_allclose(
            Y[:, j], np.asarray(comp.matvec(jnp.asarray(X[:, j]))), atol=1e-12
        )


def test_grid_path_participates(ops):
    lat, ell, comp, idx_map = ops
    n_grid_rows = sum(int(np.prod(meta[3])) for meta in comp.grid_meta)
    assert n_grid_rows > 0


def test_most_interface_rows_covered_by_grids():
    """At production-like sizes the conv classes must carry the bulk of the
    interface (the fallback tail is edges/corners, O(m) vs O(m^2))."""
    lat = _mixed_lattice(n=48)
    t_factor = kinetic_prefactor(lat.s)
    nbrs, rels, weights = irregular_laplacian_rows(lat)
    diag = t_factor * weights.sum(axis=1)
    comp, idx_map = build_composite_v2(
        lat, nbrs, rels, weights, diag, scale=-t_factor, dtype=np.float64
    )
    n_grid_rows = sum(int(np.prod(meta[3])) for meta in comp.grid_meta)
    n_fb = sum(int(b[0].shape[0]) for b in comp.ifc_buckets)
    assert n_grid_rows > n_fb, (n_grid_rows, n_fb)
    # and it must still be numerically exact
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    x = rng.normal(size=lat.num_points)
    ell = lt.assemble_irregular_hamiltonian(lat, dtype=np.float64)
    y_ell = np.asarray(ell.matvec(jnp.asarray(x)))
    y_op = np.asarray(comp.matvec(jnp.asarray(_scatter(comp, idx_map, x))))
    np.testing.assert_allclose(y_op[idx_map], y_ell, atol=1e-9, rtol=1e-9)


def test_graph_laplacian_symmetric_matvec():
    """northstar-style graph Laplacian: unit off-diagonals, degree diagonal,
    symmetric=True path, checked against an explicit scipy matrix."""
    import jax.numpy as jnp
    import scipy.sparse

    from lanczos_tpu.models.lattice import find_neighbors

    lat = _mixed_lattice(n=18)
    nbrs, rels = find_neighbors(lat, 1)
    p, k = nbrs.shape
    rows = np.repeat(np.arange(p, dtype=np.int64), k)
    cols = nbrs.reshape(-1)
    valid = cols >= 0
    # reciprocity (symmetric adjacency)
    fwd = rows[valid] * p + cols[valid]
    bwd = np.sort(cols[valid] * p + rows[valid])
    pos = np.minimum(np.searchsorted(bwd, fwd), len(bwd) - 1)
    keep = np.zeros(len(rows), dtype=bool)
    keep[valid] = bwd[pos] == fwd
    keep = keep.reshape(p, k)
    nbrs = np.where(keep, nbrs, -1)
    weights = np.where(keep, -1.0, 0.0)
    deg = keep.sum(axis=1).astype(np.float64)

    comp, idx_map = build_composite_v2(
        lat,
        nbrs,
        rels,
        weights,
        deg,
        scale=1.0,
        dtype=np.float64,
        interior_weights=lambda a: np.full(26, -1.0),
        symmetric=True,
        min_grid_rows=4,
    )
    A = scipy.sparse.csr_matrix(
        (np.ones(keep.sum()), (rows[keep.reshape(-1)], cols[keep.reshape(-1)])),
        shape=(p, p),
    )
    L = scipy.sparse.diags(deg) - A
    rng = np.random.default_rng(2)
    x = rng.normal(size=p)
    y_ref = L @ x
    y_op = np.asarray(comp.matvec(jnp.asarray(_scatter(comp, idx_map, x))))
    np.testing.assert_allclose(y_op[idx_map], y_ref, atol=1e-9, rtol=1e-9)
    yr_op = np.asarray(comp.rmatvec(jnp.asarray(_scatter(comp, idx_map, x))))
    np.testing.assert_allclose(yr_op[idx_map], y_ref, atol=1e-9, rtol=1e-9)


def test_fused_interface_kernel_matches():
    """Fused Pallas interface kernel (ROADMAP r4 item 1) == the XLA tap
    path, bitwise-class: same fp32-stored weights, interpret mode here,
    compiled Mosaic on the chip."""
    import jax.numpy as jnp

    lat = _mixed_lattice(n=24)
    t_factor = kinetic_prefactor(lat.s)
    nbrs, rels, weights = irregular_laplacian_rows(lat)
    diag = t_factor * weights.sum(axis=1)
    kw = dict(
        scale=-t_factor, dtype=np.float64, min_grid_rows=4,
    )
    comp_ref, idx_map = build_composite_v2(lat, nbrs, rels, weights, diag, **kw)
    comp_fused, idx2 = build_composite_v2(
        lat, nbrs, rels, weights, diag, fuse_interface=True, **kw
    )
    np.testing.assert_array_equal(idx_map, idx2)
    assert comp_fused.fused_plan is not None
    assert len(comp_fused.fused_plan.classes) > 0
    # 2:1-graded lattice: every class covered, no fallback
    assert comp_fused.fused_plan.fallback == ()
    rng = np.random.default_rng(0)
    x = np.zeros(comp_ref.shape[0])
    x[idx_map] = rng.normal(size=lat.num_points)
    y_ref = np.asarray(comp_ref.matvec(jnp.asarray(x)))
    y_fused = np.asarray(comp_fused.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y_fused, y_ref, rtol=1e-13, atol=1e-13)
    # and under jit (the plan rides the static pytree field)
    import jax

    y_jit = np.asarray(jax.jit(comp_fused.matvec)(jnp.asarray(x)))
    np.testing.assert_allclose(y_jit, y_ref, rtol=1e-13, atol=1e-13)


def test_nonsym_transpose_rmatvec_matches_ell_transpose(ops):
    """build_transpose=True materializes A^T in v2 format: rmatvec must
    equal the scipy/ELL transpose on the genuinely non-symmetric LSQ
    deuteron operator (reference H^T p, Irregular/IrrLanczos.py:127)."""
    import jax.numpy as jnp

    lat, ell, _, _ = ops
    t_factor = kinetic_prefactor(lat.s)
    nbrs, rels, weights = irregular_laplacian_rows(lat)
    diag = t_factor * weights.sum(axis=1)
    comp, idx_map = build_composite_v2(
        lat, nbrs, rels, weights, diag, scale=-t_factor, dtype=np.float64,
        min_grid_rows=4, build_transpose=True,
    )
    assert comp.transpose_op is not None and not comp.symmetric
    H = ell.to_scipy()
    # honestly non-symmetric problem
    assert abs(H - H.T).max() > 1e-8
    rng = np.random.default_rng(11)
    x = rng.normal(size=lat.num_points)
    # ell has no potential on the diagonal here -- rebuild the oracle from
    # rows to match comp exactly (kinetic-only diag).
    import scipy.sparse

    p = lat.num_points
    rr = np.repeat(np.arange(p), nbrs.shape[1])
    cc = nbrs.reshape(-1)
    ok = cc >= 0
    A = scipy.sparse.csr_matrix(
        ((-t_factor) * weights.reshape(-1)[ok], (rr[ok], cc[ok])), shape=(p, p)
    ) + scipy.sparse.diags(diag)
    y_ref = A.T @ x
    y_op = np.asarray(comp.rmatvec(jnp.asarray(_scatter(comp, idx_map, x))))
    np.testing.assert_allclose(y_op[idx_map], y_ref, atol=1e-9, rtol=1e-9)
    # forward direction still intact
    np.testing.assert_allclose(
        np.asarray(comp.matvec(jnp.asarray(_scatter(comp, idx_map, x))))[idx_map],
        A @ x, atol=1e-9, rtol=1e-9,
    )


def test_nonsym_two_sided_runs_on_v2(ops):
    """two_sided_lanczos over the v2 fast format (matvec + transpose-op
    rmatvec): eigenvalues must match the dense oracle of the same matrix."""
    import jax.numpy as jnp
    import scipy.sparse

    from lanczos_tpu.solver.two_sided import two_sided_eigs, two_sided_lanczos

    lat, ell, _, _ = ops
    t_factor = kinetic_prefactor(lat.s)
    nbrs, rels, weights = irregular_laplacian_rows(lat)
    diag = t_factor * weights.sum(axis=1)
    comp, idx_map = build_composite_v2(
        lat, nbrs, rels, weights, diag, scale=-t_factor, dtype=np.float64,
        min_grid_rows=4, build_transpose=True,
    )
    n = 120
    fac = two_sided_lanczos(
        comp, n, op_transpose=comp.transpose(), dtype=np.float64,
    )
    vals, _ = two_sided_eigs(fac)
    vals = np.sort(np.asarray(vals).real)
    p = lat.num_points
    rr = np.repeat(np.arange(p), nbrs.shape[1])
    cc = nbrs.reshape(-1)
    ok = cc >= 0
    A = scipy.sparse.csr_matrix(
        ((-t_factor) * weights.reshape(-1)[ok], (rr[ok], cc[ok])), shape=(p, p)
    ) + scipy.sparse.diags(diag)
    exact = np.sort(np.linalg.eigvals(A.toarray()).real)
    # The extremal (largest) Ritz values converge first in Krylov methods;
    # operator EXACTNESS is pinned by the rmatvec test above — this checks
    # the transpose path drives a correct biorthogonal recurrence.
    np.testing.assert_allclose(vals[-3:], exact[-3:], rtol=1e-5)


def test_fused_interface_vmem_budget_falls_back(monkeypatch):
    """When the planned VMEM-resident operand volume exceeds the budget the
    plan must route every class to the XLA path (advisor r4: the gridless
    whole-array pallas_call cannot compile past ~120 MB) — and the matvec
    must stay numerically identical."""
    import jax.numpy as jnp

    monkeypatch.setenv("LANCZOS_IFACE_VMEM_MB", "0.001")
    lat = _mixed_lattice(n=24)
    t_factor = kinetic_prefactor(lat.s)
    nbrs, rels, weights = irregular_laplacian_rows(lat)
    diag = t_factor * weights.sum(axis=1)
    kw = dict(scale=-t_factor, dtype=np.float64, min_grid_rows=4)
    comp_ref, idx_map = build_composite_v2(lat, nbrs, rels, weights, diag, **kw)
    comp_budget, _ = build_composite_v2(
        lat, nbrs, rels, weights, diag, fuse_interface=True, **kw
    )
    plan = comp_budget.fused_plan
    assert plan is not None and plan.classes == ()
    assert len(plan.fallback) == len(comp_budget.grid_meta)
    rng = np.random.default_rng(0)
    x = np.zeros(comp_ref.shape[0])
    x[idx_map] = rng.normal(size=lat.num_points)
    np.testing.assert_allclose(
        np.asarray(comp_budget.matvec(jnp.asarray(x))),
        np.asarray(comp_ref.matvec(jnp.asarray(x))),
        rtol=1e-13, atol=1e-13,
    )
