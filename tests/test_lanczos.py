"""Solver core: Lanczos vs scipy oracle, basis invariants, acceptance checks.

Test strategy mirrors SURVEY.md §4: scipy.sparse.linalg.eigsh is the oracle
(reference Lanczos.py:68-71), the basis-quality tolerances are the
reference's own (norm 1e-3, orthogonality 1e-2, Lanczos.py:157-158), and the
eigvec acceptance statistic is <(Ax/|Ax|), x>^2 within 0.01 of 1
(Lanczos.py:166-185).
"""

import numpy as np
import pytest
import scipy.sparse.linalg

import jax.numpy as jnp

from lanczos_tpu import (
    DenseOperator,
    eigsh,
    ell_from_scipy,
    lanczos,
    match_eigs,
    ritz_from_factorization,
    tridiag_eigh,
)
from lanczos_tpu.solver.results import check_normalized, check_orthogonal

from conftest import random_sparse_symmetric


def test_full_krylov_recovers_spectrum(rng):
    """n = M Lanczos on a small dense symmetric matrix reproduces eigh exactly
    (the reference's own self-test: Lanczos.py __main__, 20x20, n=M=20)."""
    m = 20
    a = rng.integers(-50, 51, size=(m, m)).astype(np.float64)
    a = (a + a.T) / 2
    op = DenseOperator(jnp.asarray(a))

    fac = lanczos(op, m, seed=99)
    theta, X, resid = ritz_from_factorization(fac)
    exact = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.asarray(theta), exact, rtol=1e-9, atol=1e-9)
    # Ritz vectors are true eigenvectors.
    for i in range(m):
        x = np.asarray(X[:, i])
        np.testing.assert_allclose(a @ x, np.asarray(theta)[i] * x, atol=1e-7)


def test_basis_invariants(rng):
    """Krylov basis passes the reference's normality/orthogonality tests."""
    m, n = 300, 60
    a = random_sparse_symmetric(rng, m)
    op = ell_from_scipy(a, dtype=np.float64)
    fac = lanczos(op, n, seed=99)
    V = np.asarray(fac.V).T  # (M, n) columns
    assert check_normalized(V) < 1e-3  # reference tol (Lanczos.py:157)
    assert check_orthogonal(V) < 1e-2  # reference tol (Lanczos.py:158)
    # CGS2 should actually achieve machine-precision orthogonality.
    assert check_orthogonal(V) < 1e-10


def test_eigsh_vs_scipy_oracle(rng):
    """Extremal eigenvalues match scipy eigsh to tight tolerance."""
    m, k = 400, 8
    a = random_sparse_symmetric(rng, m)
    res = eigsh(a, k=k, n=120, which="SA", dtype=np.float64)
    exact = scipy.sparse.linalg.eigsh(a, k=k, which="SA")[0]
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), np.sort(exact), rtol=1e-8, atol=1e-8
    )
    # Residual estimates are honest: verify against explicit residuals.
    X = np.asarray(res.eigenvectors)
    for i in range(k):
        explicit = np.linalg.norm(a @ X[:, i] - np.asarray(res.eigenvalues)[i] * X[:, i])
        assert explicit < 1e-6
    assert res.good_mask(tol=0.01).all()


def test_eigvec_acceptance_statistic(rng):
    """<(Ax/|Ax|), x>^2 ~ 1 for converged pairs (reference print_good_eigs)."""
    m = 250
    a = random_sparse_symmetric(rng, m)
    res = eigsh(a, k=5, n=100, which="LM", dtype=np.float64)
    assert np.all(np.abs(1.0 - np.asarray(res.inner_prod)) < 0.01)


def test_match_eigs_greedy(rng):
    m = 100
    a = random_sparse_symmetric(rng, m)
    res = eigsh(a, k=6, n=60, which="SA", dtype=np.float64)
    vals, vecs = scipy.sparse.linalg.eigsh(a, k=6, which="SA")
    ref_vals, matched, innerprod = match_eigs(
        np.asarray(res.eigenvalues), np.asarray(res.eigenvectors), vals, vecs
    )
    ok = ~np.isnan(matched)
    assert ok.sum() >= 5
    np.testing.assert_allclose(matched[ok], ref_vals[ok], rtol=1e-7)
    assert np.nanmin(innerprod) > 0.99


def test_tridiag_eigh_matches_scipy(rng):
    import scipy.linalg

    n = 50
    alpha = rng.standard_normal(n)
    beta = np.abs(rng.standard_normal(n - 1)) + 0.1
    vals, vecs = tridiag_eigh(jnp.asarray(alpha), jnp.asarray(beta))
    ref = scipy.linalg.eigh_tridiagonal(alpha, beta, eigvals_only=True)
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-10, atol=1e-10)


def test_breakdown_detection():
    """Starting in an invariant subspace triggers breakdown, not NaNs."""
    a = np.diag(np.arange(1.0, 11.0))
    op = DenseOperator(jnp.asarray(a))
    v0 = jnp.zeros(10, dtype=jnp.float64).at[0].set(1.0)  # exact eigenvector
    fac = lanczos(op, 5, v0=v0)
    assert int(fac.breakdown_iter) < 5
    assert np.isfinite(np.asarray(fac.alpha)).all()
    assert np.isfinite(np.asarray(fac.V)).all()


def test_reorth_none_still_finds_extremes(rng):
    """Without reorth the extremal values still converge (ghost filter on)."""
    m = 300
    a = random_sparse_symmetric(rng, m)
    res = eigsh(a, k=3, n=150, which="SA", reorth="none", dtype=np.float64)
    exact = np.sort(scipy.sparse.linalg.eigsh(a, k=3, which="SA")[0])
    np.testing.assert_allclose(np.asarray(res.eigenvalues), exact, rtol=1e-6, atol=1e-6)
