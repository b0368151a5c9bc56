"""Operator layer: ELL vs scipy CSR, stencil vs ELL equivalence, transposes."""

import numpy as np
import pytest
import scipy.sparse

import jax.numpy as jnp

from lanczos_tpu.ops import (
    DenseOperator,
    EllOperator,
    ell_from_scipy,
    make_stencil_operator,
    stencil_to_ell,
)
from lanczos_tpu.models.grids import laplacian_stencil

from conftest import random_sparse_symmetric


def test_ell_matvec_matches_scipy(rng):
    m = 200
    a = random_sparse_symmetric(rng, m)
    op = ell_from_scipy(a, dtype=np.float64)
    x = rng.standard_normal(m)
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))), a @ x, rtol=1e-12)


def test_ell_rmatvec_matches_scipy(rng):
    m = 150
    a = scipy.sparse.random(
        m, m, density=0.05, random_state=np.random.RandomState(7), dtype=np.float64
    ).tocsr()
    op = ell_from_scipy(a, dtype=np.float64)
    x = rng.standard_normal(m)
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(jnp.asarray(x))), a.T @ x, rtol=1e-12
    )


def test_ell_transpose(rng):
    m = 80
    a = scipy.sparse.random(
        m, m, density=0.08, random_state=np.random.RandomState(3), dtype=np.float64
    ).tocsr()
    op = ell_from_scipy(a, dtype=np.float64)
    at = op.transpose()
    x = rng.standard_normal(m)
    np.testing.assert_allclose(np.asarray(at.matvec(jnp.asarray(x))), a.T @ x, rtol=1e-12)


def test_ell_matmat(rng):
    m, b = 120, 7
    a = random_sparse_symmetric(rng, m)
    op = ell_from_scipy(a, dtype=np.float64)
    X = rng.standard_normal((m, b))
    np.testing.assert_allclose(
        np.asarray(op.matmat(jnp.asarray(X))), a @ X, rtol=1e-10, atol=1e-12
    )


@pytest.mark.parametrize(
    "ndim,points,n",
    [(1, "3", 17), (2, "5", 9), (3, "7", 6), (3, "27", 6)],
)
def test_stencil_matches_ell(rng, ndim, points, n):
    """Matrix-free roll-based stencil == its explicit sparse materialization."""
    offsets, weights = laplacian_stencil(ndim, points)
    m = n**ndim
    diag = rng.standard_normal(m)
    op = make_stencil_operator(
        (n,) * ndim, offsets, weights, diag=diag, dtype=jnp.float64
    )
    ell = stencil_to_ell(op)
    x = rng.standard_normal(m)
    y_stencil = np.asarray(op.matvec(jnp.asarray(x)))
    y_ell = np.asarray(ell.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y_stencil, y_ell, rtol=1e-12, atol=1e-12)


def test_stencil_symmetry(rng):
    """Periodic Laplacian stencil operators are symmetric matrices."""
    offsets, weights = laplacian_stencil(3, "27")
    op = make_stencil_operator((5, 5, 5), offsets, weights, dtype=jnp.float64)
    assert op.is_symmetric_stencil
    dense = np.asarray(op.to_dense())
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)


def test_stencil_rmatvec(rng):
    offsets, weights = laplacian_stencil(2, "5")
    n = 8
    diag = rng.standard_normal(n * n)
    op = make_stencil_operator((n, n), offsets, weights, diag=diag, dtype=jnp.float64)
    dense = np.asarray(op.to_dense())
    x = rng.standard_normal(n * n)
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(jnp.asarray(x))), dense.T @ x, rtol=1e-12
    )
