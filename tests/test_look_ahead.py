"""Look-ahead two-sided Lanczos (solver/look_ahead.py).

The reference iterates straight through serious breakdown
(/root/reference/Python/Irregular/IrrLanczos.py:140-142) even though its own
papers directory ships the cure (FGN 1993); the scan solver here detects and
truncates; the look-ahead solver must CURE the curable case (VERDICT r1 #6).
"""

import numpy as np
import pytest

from lanczos_tpu.ops.operators import DenseOperator
from lanczos_tpu.solver import lookahead_eigs, two_sided_lanczos_lookahead
from lanczos_tpu.solver.two_sided import two_sided_lanczos_kernel


def _cyclic_op():
    """3x3 cyclic shift: with v0 = w0 = e1 the scalar pivot w_1 = r.s
    vanishes exactly (Hankel moment matrix H_2 = [[1,0],[0,0]] singular)
    while H_3 is nonsingular — the canonical CURABLE serious breakdown."""
    A = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    return DenseOperator(A=np.asarray(A)), A


def test_plain_two_sided_breaks_down():
    import jax.numpy as jnp

    op, A = _cyclic_op()
    e1 = jnp.asarray(np.array([1.0, 0.0, 0.0]))
    fac = two_sided_lanczos_kernel(
        op.matvec, op.rmatvec, e1, e1, 3, reorth=False
    )
    assert int(fac.breakdown_iter) < 3  # truncated, no cure


def test_lookahead_cures_curable_breakdown():
    op, A = _cyclic_op()
    e1 = np.array([1.0, 0.0, 0.0])
    fac = two_sided_lanczos_lookahead(op, 3, v0=e1, w0=e1)
    assert not fac.incurable
    assert fac.n == 3
    assert fac.max_block_used == 2  # one genuine look-ahead block
    # D_l blocks are nonsingular by construction.
    for a, b in fac.blocks:
        D = fac.W[a:b] @ fac.V[a:b].T
        assert np.linalg.cond(D) < 1e8
    vals, _ = lookahead_eigs(fac)
    exact = np.linalg.eigvals(A)
    np.testing.assert_allclose(
        np.sort_complex(vals), np.sort_complex(exact), atol=1e-10
    )


def test_lookahead_incurable_flag():
    op, _ = _cyclic_op()
    e1 = np.array([1.0, 0.0, 0.0])
    fac = two_sided_lanczos_lookahead(op, 3, v0=e1, w0=e1, max_block=1)
    assert fac.incurable
    assert fac.n == 1  # only the first (closed) block survives


def test_lookahead_matches_scipy_no_breakdown():
    rng = np.random.default_rng(3)
    n = 24
    A = rng.standard_normal((n, n))
    A = A + np.diag(np.linspace(1.0, 10.0, n))  # well-separated real parts
    op = DenseOperator(A=np.asarray(A))
    fac = two_sided_lanczos_lookahead(op, n, seed=5)
    assert not fac.incurable
    vals, _ = lookahead_eigs(fac)
    exact = np.linalg.eigvals(A)
    np.testing.assert_allclose(
        np.sort(vals.real), np.sort(exact.real), atol=1e-6
    )


def test_lookahead_residual_filtered_result():
    """op-aware path returns an EigResult whose pairs satisfy the claimed
    residuals against the operator itself."""
    rng = np.random.default_rng(7)
    n = 30
    B = rng.standard_normal((n, n)) * 0.05
    A = np.diag(np.linspace(-5.0, 5.0, n)) + B  # near-normal, real spectrum
    op = DenseOperator(A=np.asarray(A))
    fac = two_sided_lanczos_lookahead(op, n, seed=1)
    res = lookahead_eigs(fac, k=5, op=op, residual_tol=1e-6)
    assert res.k >= 3
    X = np.asarray(res.eigenvectors)
    lam = np.asarray(res.eigenvalues)
    R = A @ X - X * lam[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-5
