"""Pallas stencil SpMV/SpMM kernel vs the XLA roll path (interpret mode on CPU).

The kernel is the TPU replacement for the reference's cuSPARSE CSR SpMV
(/root/reference/Python/Regular/Lanczos.py:88,116); correctness oracle here
is the StencilOperator roll path, itself validated against scipy in
test_operators.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lanczos_tpu as lt
from lanczos_tpu.ops.operators import make_stencil_operator
from lanczos_tpu.ops.pallas_kernels import (
    stencil_spmm_pallas,
    stencil_spmv_pallas,
)


def _xla_matvec(op, x):
    """The roll-path reference, bypassing the pallas auto-dispatch."""
    xg = x.reshape(op.grid_shape)
    y = op._apply_stencil(xg).reshape(-1)
    if op.diag is not None:
        y = y + op.diag * x
    return y


@pytest.mark.parametrize("n,stencil", [(12, "27"), (10, "7"), (8, "27")])
def test_spmv_matches_xla(n, stencil):
    H = lt.build_regular_hamiltonian(
        n, 25.0, lt.deuteron_potential_3d, stencil=stencil, dtype="float32"
    )
    m = H.shape[0]
    x = jax.random.normal(jax.random.PRNGKey(0), (m,), dtype=jnp.float32)
    y_ref = _xla_matvec(H, x)
    y_pal = stencil_spmv_pallas(H, x, interpret=True)
    scale = float(jnp.max(jnp.abs(y_ref)))
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), atol=2e-5 * scale, rtol=1e-4
    )


def test_spmv_no_diag_anisotropic_grid():
    # Non-cubic grid, pure stencil (no diagonal), asymmetric weights.
    offs = [(0, 0, 0), (1, 0, 0), (0, -1, 0), (0, 0, 1), (-1, 1, -1)]
    w = [2.0, -1.0, 0.5, 0.25, 1.5]
    op = make_stencil_operator((6, 10, 14), offs, w, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (op.shape[0],), dtype=jnp.float32)
    y_ref = _xla_matvec(op, x)
    y_pal = stencil_spmv_pallas(op, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=1e-5, rtol=1e-4)


def test_spmm_matches_xla():
    H = lt.build_regular_hamiltonian(
        10, 25.0, lt.deuteron_potential_3d, stencil="27", dtype="float32"
    )
    X = jax.random.normal(jax.random.PRNGKey(2), (H.shape[0], 3), dtype=jnp.float32)
    Y_ref = jax.vmap(lambda c: _xla_matvec(H, c), in_axes=1, out_axes=1)(X)
    Y_pal = stencil_spmm_pallas(H, X, interpret=True)
    scale = float(jnp.max(jnp.abs(Y_ref)))
    np.testing.assert_allclose(
        np.asarray(Y_pal), np.asarray(Y_ref), atol=2e-5 * scale, rtol=1e-4
    )


def test_spmv_flat_plane_branch():
    """Grid with ny*nx % 128 == 0 but nx % 128 != 0 exercises the
    flattened-plane kernel (the lane-alignment fast path)."""
    offs = [
        (0, 0, 0), (0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0),
        (1, 0, 0), (-1, 0, 0), (1, 1, 1), (-1, -1, -1), (0, 1, -1),
    ]
    w = [1.0, 0.5, -0.5, 0.25, 2.0, -1.5, 3.0, 0.125, -0.25, 0.75]
    diag = np.linspace(-1.0, 1.0, 8 * 16 * 8).astype(np.float32)
    op = make_stencil_operator((8, 16, 8), offs, w, diag=diag, dtype=jnp.float32)
    assert (16 * 8) % 128 == 0 and 8 % 128 != 0  # hits the flat-plane branch
    x = jax.random.normal(jax.random.PRNGKey(3), (op.shape[0],), dtype=jnp.float32)
    y_ref = _xla_matvec(op, x)
    y_pal = stencil_spmv_pallas(op, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=1e-5, rtol=1e-4)


def test_spmv_flat_graded_ladder():
    """N=16 27-pt deuteron: plane=256 is lane-aligned and the stencil is
    graded, exercising the factorized ladder fast path."""
    H = lt.build_regular_hamiltonian(
        16, 25.0, lt.deuteron_potential_3d, stencil="27", dtype="float32"
    )
    assert H.graded is not None and (16 * 16) % 128 == 0 and 16 % 128 != 0
    x = jax.random.normal(jax.random.PRNGKey(4), (H.shape[0],), dtype=jnp.float32)
    y_ref = _xla_matvec(H, x)
    y_pal = stencil_spmv_pallas(H, x, interpret=True)
    scale = float(jnp.max(jnp.abs(y_ref)))
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), atol=2e-5 * scale, rtol=1e-4
    )


def test_offsets_beyond_unit_rejected():
    op = make_stencil_operator((8, 8, 8), [(2, 0, 0)], [1.0], dtype=jnp.float32)
    with pytest.raises(ValueError):
        stencil_spmv_pallas(op, jnp.zeros(512, jnp.float32), interpret=True)


def test_lanczos_spectrum_with_pallas_matvec():
    """End-to-end: Lanczos driven by the pallas SpMV matches the XLA-path run."""
    H = lt.build_regular_hamiltonian(
        8, 25.0, lt.deuteron_potential_3d, stencil="27", dtype="float32"
    )
    from lanczos_tpu.solver.lanczos import lanczos_kernel
    from lanczos_tpu.solver.tridiag import ritz_from_factorization

    m = H.shape[0]
    v0 = jax.random.uniform(jax.random.PRNGKey(7), (m,), jnp.float32, -1.0, 1.0)
    fac_p = lanczos_kernel(
        lambda v: stencil_spmv_pallas(H, v, interpret=True), v0, 20
    )
    fac_x = lanczos_kernel(lambda v: _xla_matvec(H, v), v0, 20)
    th_p, _, _ = ritz_from_factorization(fac_p)
    th_x, _, _ = ritz_from_factorization(fac_x)
    np.testing.assert_allclose(np.asarray(th_p), np.asarray(th_x), rtol=1e-3, atol=1e-3)
