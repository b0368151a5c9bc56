"""Thick-restart Lanczos (Wu-Simon) vs oracles, with a bounded basis.

The plain solver needs the full (n, M) basis; thick restart must converge
the same spectra with a basis a fraction of the problem size — the feature
the reference lacks entirely and the BASELINE k=100 target requires.
"""

import numpy as np
import pytest

import lanczos_tpu as lt
from lanczos_tpu.solver.restart import eigsh_restarted


def test_dense_oracle():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(300, 300))
    A = (A + A.T) / 2
    op = lt.as_operator(A.astype(np.float64))
    res = eigsh_restarted(op, k=6, max_basis=40, tol=1e-10, dtype=np.float64)
    exact = np.sort(np.linalg.eigvalsh(A))[:6]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), exact, atol=1e-9)
    assert res.good_mask(1e-6).all()


def test_largest_algebraic():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(200, 200))
    A = (A + A.T) / 2
    op = lt.as_operator(A.astype(np.float64))
    res = eigsh_restarted(
        op, k=4, which="LA", max_basis=30, tol=1e-10, dtype=np.float64
    )
    exact = np.sort(np.linalg.eigvalsh(A))[-4:][::-1]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), exact, atol=1e-9)


def test_stiff_1d_deuteron_bounded_basis():
    """n=1001 problem, basis bounded at 80 — the full-Krylov reference run
    (1Ddeuteron.py uses n=N=1001) needs 12x the memory for the same answer."""
    import scipy.sparse.linalg

    n = 1001
    v = np.asarray(lt.deuteron_potential_radial(np.linspace(0, 25.0, n)))
    H = lt.build_chain_hamiltonian_1d(n, 25.0, v)
    res = eigsh_restarted(
        H, k=5, max_basis=80, tol=1e-10, max_cycles=300, dtype=np.float64
    )
    oracle = np.sort(scipy.sparse.linalg.eigsh(H.to_scipy(), k=5, which="SA")[0])
    np.testing.assert_allclose(np.asarray(res.eigenvalues), oracle, atol=1e-7)


def test_3d_stencil_operator():
    """Every returned Ritz value must be an exact eigenvalue; the lattice
    spectrum has degenerate multiplets (p-wave triplets) that single-vector
    Lanczos legitimately reports with reduced multiplicity, so matching is
    per-value, not positional."""
    import scipy.sparse.linalg

    H = lt.build_regular_hamiltonian(
        10, 25.0, lt.deuteron_potential_3d, stencil="27", dtype=np.float64
    )
    res = eigsh_restarted(H, k=4, max_basis=60, tol=1e-9, dtype=np.float64)
    exact = np.sort(scipy.sparse.linalg.eigsh(H.to_scipy(), k=10, which="SA")[0])
    got = np.asarray(res.eigenvalues)
    # Ground + first excited are simple: positional match.
    np.testing.assert_allclose(got[:2], exact[:2], atol=1e-7)
    # All values must coincide with some exact eigenvalue.
    assert np.abs(got[:, None] - exact[None, :]).min(axis=1).max() < 1e-7


def test_restart_surfaces_nonfinite():
    """NaN/Inf in the recurrence raises immediately with context instead of
    silently locking NaN Ritz pairs (SURVEY §5.2 sanitizer gap)."""
    import jax.numpy as jnp
    import pytest

    from lanczos_tpu.ops.operators import DenseOperator
    from lanczos_tpu.solver.restart import eigsh_restarted

    a = np.diag(np.linspace(1.0, 2.0, 40)).astype(np.float64)
    a[0, 0] = np.inf
    op = DenseOperator(jnp.asarray(a))
    with pytest.raises(FloatingPointError, match="non-finite"):
        eigsh_restarted(op, k=3, tol=1e-8, max_cycles=3, dtype="float64")
