"""Distributed (row-sharded) Lanczos on the 8-device virtual CPU mesh.

Oracle: the single-device solver — the multi-chip path must reproduce its
factorization and spectra (this is the multi-chip test mechanism the
reference lacks entirely; SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lanczos_tpu import build_regular_hamiltonian, deuteron_potential_3d, lanczos
from lanczos_tpu.ops import ell_from_scipy
from lanczos_tpu.parallel import lanczos_sharded, make_row_mesh, shard_operator
from lanczos_tpu.solver.tridiag import ritz_from_factorization

from conftest import random_sparse_symmetric


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_row_mesh(8)


def test_sharded_stencil_matches_single_device(mesh):
    """3D deuteron Hamiltonian: sharded (halo-exchange) == single-device."""
    n_grid = 16  # 16^3 = 4096 points, leading dim 16 divides 8 devices
    H = build_regular_hamiltonian(
        n_grid, 25.0, deuteron_potential_3d, stencil="27", dtype="float64"
    )
    n = 40
    fac_ref = lanczos(H, n, seed=3, dtype="float64")
    Hs = shard_operator(H, mesh)
    fac_dist = lanczos_sharded(Hs, n, mesh, seed=3, dtype="float64")

    np.testing.assert_allclose(
        np.asarray(fac_dist.alpha), np.asarray(fac_ref.alpha), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(fac_dist.beta), np.asarray(fac_ref.beta), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(fac_dist.V), np.asarray(fac_ref.V), rtol=1e-8, atol=1e-9
    )


def test_sharded_ell_matches_single_device(mesh, rng):
    """Row-sharded ELL (all-gather SpMV) == single-device, random sparse."""
    m = 400  # divides 8
    a = random_sparse_symmetric(rng, m)
    op = ell_from_scipy(a, dtype=np.float64)
    n = 50
    fac_ref = lanczos(op, n, seed=11, dtype="float64")
    op_s = shard_operator(op, mesh)
    fac_dist = lanczos_sharded(op_s, n, mesh, seed=11, dtype="float64")

    np.testing.assert_allclose(
        np.asarray(fac_dist.alpha), np.asarray(fac_ref.alpha), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(fac_dist.beta), np.asarray(fac_ref.beta), rtol=1e-9, atol=1e-9
    )


def test_sharded_spectra_vs_scipy(mesh, rng):
    """End-to-end: sharded factorization -> Ritz values vs scipy oracle."""
    import scipy.sparse.linalg

    m = 320
    a = random_sparse_symmetric(rng, m)
    op = shard_operator(ell_from_scipy(a, dtype=np.float64), mesh)
    fac = lanczos_sharded(op, 120, mesh, dtype="float64")
    theta, X, resid = ritz_from_factorization(fac)
    exact = np.sort(scipy.sparse.linalg.eigsh(a, k=4, which="SA")[0])
    np.testing.assert_allclose(np.asarray(theta)[:4], exact, rtol=1e-8, atol=1e-8)


def test_sharded_rejects_indivisible(mesh):
    from lanczos_tpu.ops import ell_from_coo

    op = ell_from_coo([0, 1, 2], [0, 1, 2], [1.0, 2.0, 3.0], 3, dtype=np.float64)
    with pytest.raises(ValueError, match="divide"):
        lanczos_sharded(op, 2, mesh)


@pytest.fixture(scope="module")
def composite_pair():
    from lanczos_tpu.models.irr_hamiltonian import (
        assemble_irregular_hamiltonian_composite,
    )
    from lanczos_tpu.models.lattice import build_lattice

    # Smallest lattice with both levels + interfaces: keeps the Krylov-Schur
    # equivalence test below at ~1 min instead of ~10 (it dominates suite
    # wall time; the physics-scale runs live in test_composite.py).
    lat = build_lattice(12, 25.0, 3, overwrite_spacing=True)
    comp, perm = assemble_irregular_hamiltonian_composite(
        lat, deuteron_potential_3d, dtype=np.float64
    )
    return comp, perm


def test_sharded_composite_matvec_matches(mesh, composite_pair, rng):
    """Device-major sharded composite == level-major single-device matvec
    (face-table halo exchange + per-device interface buckets)."""
    comp, _ = composite_pair
    op = shard_operator(comp, mesh)
    sc = op.host
    p = comp.shape[0]
    x = rng.standard_normal(p)
    y_ref = np.asarray(comp.matvec(jnp.asarray(x)))
    y_sh = np.asarray(jax.jit(op.matvec)(jnp.asarray(sc.to_sharded(x))))
    np.testing.assert_allclose(sc.from_sharded(y_sh), y_ref, atol=1e-12)
    # ghost (box-padding) slots never acquire values
    np.testing.assert_array_equal(y_sh * (1 - sc.live_mask()), 0.0)


def test_sharded_composite_solve_matches(mesh, composite_pair):
    """Krylov-Schur on the sharded composite == single-device, to 1e-9."""
    from lanczos_tpu import eigs_nonsym

    comp, _ = composite_pair
    op = shard_operator(comp, mesh)
    res = eigs_nonsym(op, k=3, tol=1e-9, which="SR", dtype="float64")
    res1 = eigs_nonsym(comp, k=3, tol=1e-9, which="SR", dtype="float64")
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), np.asarray(res1.eigenvalues),
        rtol=1e-9, atol=1e-9,
    )
    assert float(np.max(np.asarray(res.residuals))) < 1e-9


def test_sharded_stencil_pallas_path_matches(mesh):
    """The sharded local matvec dispatched through the Pallas kernel (the
    single-chip hot path, interpret mode here) + two-plane boundary
    correction == the global operator, on every device count that divides
    the grid (VERDICT r1 next #5: unified hot paths)."""
    from functools import partial
    from jax.sharding import PartitionSpec as P

    from lanczos_tpu.parallel.distributed import _stencil_local_matvec

    n_grid = 16
    H = build_regular_hamiltonian(
        n_grid, 25.0, deuteron_potential_3d, stencil="27", dtype="float32"
    )
    m = H.shape[0]
    x = jax.random.uniform(jax.random.PRNGKey(0), (m,), dtype=jnp.float32)
    y_ref = np.asarray(H.matvec(x.reshape(H.vec_shape)).reshape(-1))

    local_mv = _stencil_local_matvec(H, 8, "rows", use_pallas=True)
    mapped = jax.jit(
        jax.shard_map(
            local_mv, mesh=mesh,
            in_specs=(P(), P("rows"), P("rows")), out_specs=P("rows"),
            check_vma=False,
        )
    )
    y = np.asarray(mapped(H.weights, H.diag.reshape(-1), x))
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)


def test_sharded_eigsh_restarted_matches(mesh):
    """Thick-restart Lanczos on a row-sharded SYMMETRIC operator ==
    single-device (the north-star engine's multi-chip form, SURVEY §7.8).
    The regular stencil Hamiltonian is exactly symmetric; the sharded run
    partitions the basis/vectors over the mesh under GSPMD."""
    import lanczos_tpu as lt
    from lanczos_tpu.solver.restart import eigsh_restarted

    H = lt.build_regular_hamiltonian(
        16, 25.0, lt.deuteron_potential_3d, stencil="27", dtype="float64"
    )
    Hs = shard_operator(H, mesh)
    from jax.sharding import NamedSharding, PartitionSpec

    m = H.shape[0]
    v0 = np.random.default_rng(3).standard_normal(m)
    res_1 = eigsh_restarted(
        H, k=3, tol=1e-9, max_cycles=60, dtype="float64",
        v0=jnp.asarray(v0),
    )
    v0_s = jax.device_put(
        jnp.asarray(v0), NamedSharding(mesh, PartitionSpec("rows"))
    )
    res_s = eigsh_restarted(
        Hs, k=3, tol=1e-9, max_cycles=60, dtype="float64", v0=v0_s
    )
    np.testing.assert_allclose(
        np.asarray(res_s.eigenvalues), np.asarray(res_1.eigenvalues),
        rtol=1e-9, atol=1e-9,
    )
    assert float(np.max(np.asarray(res_s.residuals))) < 1e-8
