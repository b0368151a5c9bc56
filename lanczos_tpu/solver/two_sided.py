"""Two-sided (biorthogonal / non-Hermitian) Lanczos.

TPU-native re-design of the reference's IrrLanczos.execute_Lanczos
(/root/reference/Python/Irregular/IrrLanczos.py:77-187), needed for the
non-symmetric Laplacian of the irregular multi-resolution lattice.

Recurrence (same math as the reference's loop at IrrLanczos.py:125-144):

    r = A q_j   - gamma_{j-1} q_{j-1}
    s = A^T p_j - beta_{j-1}  p_{j-1}
    alpha_j = (p_j.r + q_j.s)/2
    r -= alpha_j q_j ; s -= alpha_j p_j
    w_j = r.s ; beta_j = sqrt|w_j| ; gamma_j = w_j / beta_j
    q_{j+1} = r/beta_j ; p_{j+1} = s/gamma_j

Differences from the reference (intentional, documented in SURVEY.md quirks):
  * serious breakdown (w ~ 0, IrrLanczos.py:140-142 unhandled there) is
    detected and the iteration index recorded;
  * the projected matrix T has beta on the subdiagonal and gamma on the
    SUPERdiagonal with the correct index (the reference writes gamma[i-1] at
    H_eff[i, i+1], IrrLanczos.py:174 — an off-by-one);
  * eigensolve of T: when beta_i * gamma_i > 0 for all i, T is similar to a
    symmetric tridiagonal via a diagonal scaling (off-diag sqrt(beta*gamma)),
    solved on-device with eigh — the reference applies np.linalg.eigh
    directly to the NON-symmetric T (IrrLanczos.py:291), which is only valid
    in that same regime but silently wrong otherwise;
  * two-sided full rebiorthogonalization is expressed as batched matmuls
    against the stored bases (the MXU form of IrrLanczos.py:389-443).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.operators import LinearOperator

__all__ = [
    "TwoSidedFactorization",
    "two_sided_lanczos",
    "two_sided_eigs",
    "nonsymmetric_tridiag_eig",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TwoSidedFactorization:
    """Biorthogonal factorization: A Q.T ~ Q.T T,  A.T P.T ~ P.T T.T.

    alpha (n,), beta (n-1,) subdiag, gamma (n-1,) superdiag;
    Q, P: (n, M) right/left Lanczos vectors (rows), P.T Q ~ I.
    breakdown_iter: first j where |w_j| underflowed (n if none).
    """

    alpha: jax.Array
    beta: jax.Array
    gamma: jax.Array
    Q: jax.Array
    P: jax.Array
    breakdown_iter: jax.Array

    @property
    def n(self) -> int:
        return self.alpha.shape[0]


_PRECISION = jax.lax.Precision.HIGHEST


def _default_dot(a, b):
    return jnp.dot(a, b, precision=_PRECISION, preferred_element_type=a.dtype)


def two_sided_lanczos_kernel(
    matvec: Callable,
    rmatvec: Callable,
    v0: jax.Array,
    w0: jax.Array,
    n: int,
    *,
    reorth: bool = True,
    dot: Callable = _default_dot,
    basis_dot: Callable = None,
    breakdown_tol: Optional[float] = None,
) -> TwoSidedFactorization:
    """Pure two-sided Lanczos kernel (jit/shard_map safe)."""
    if basis_dot is None:
        basis_dot = lambda B, v: jnp.dot(B, v, precision=_PRECISION)
    m = v0.shape[0]
    dtype = v0.dtype
    if breakdown_tol is None:
        breakdown_tol = float(100 * np.finfo(np.dtype(dtype)).eps)

    # Biorthogonal init: scale the pair so p0.q0 = +-1 (IrrLanczos.py:106-108).
    d = dot(v0, w0)
    scale = jnp.sqrt(jnp.abs(d))
    q0 = v0 / scale
    p0 = w0 / scale * jnp.sign(d)

    Q = jnp.zeros((n, m), dtype=dtype).at[0].set(q0)
    P = jnp.zeros((n, m), dtype=dtype).at[0].set(p0)

    def biorth(Q, P, r, s):
        """One pass of two-sided Gram-Schmidt: r ⊥ rows(P), s ⊥ rows(Q) in the
        biorthogonal sense: r -= Q.T (P r), s -= P.T (Q s).

        Rows beyond the current iteration are zero and contribute nothing.
        Assumes P.T Q ~ I on the filled rows (maintained inductively).
        """
        cr = basis_dot(P, r)  # (n,)
        r = r - jnp.dot(cr, Q, precision=_PRECISION)
        cs = basis_dot(Q, s)
        s = s - jnp.dot(cs, P, precision=_PRECISION)
        return r, s

    r0 = matvec(q0)
    s0 = rmatvec(p0)
    alpha0 = (dot(p0, r0) + dot(q0, s0)) / 2.0
    r = r0 - alpha0 * q0
    s = s0 - alpha0 * p0

    def scan_step(carry, j):
        Q, P, r, s, breakdown_iter = carry
        if reorth:
            r, s = biorth(Q, P, r, s)
        w = dot(r, s)
        ok = jnp.abs(w) > breakdown_tol
        breakdown_iter = jnp.where(
            ok, breakdown_iter, jnp.minimum(breakdown_iter, j)
        )
        w_safe = jnp.where(ok, w, 1.0)
        beta = jnp.sqrt(jnp.abs(w_safe))
        gamma = w_safe / beta
        okf = ok.astype(r.dtype)
        q = r / beta * okf
        p = s / gamma * okf

        Q = jax.lax.dynamic_update_slice_in_dim(Q, q[None, :], j, axis=0)
        P = jax.lax.dynamic_update_slice_in_dim(P, p[None, :], j, axis=0)

        qm1 = jax.lax.dynamic_index_in_dim(Q, j - 1, axis=0, keepdims=False)
        pm1 = jax.lax.dynamic_index_in_dim(P, j - 1, axis=0, keepdims=False)
        r = matvec(q) - gamma * qm1
        s = rmatvec(p) - beta * pm1
        alpha = (dot(p, r) + dot(q, s)) / 2.0
        r = r - alpha * q
        s = s - alpha * p
        return (Q, P, r, s, breakdown_iter), (alpha, beta, gamma)

    init = (Q, P, r, s, jnp.asarray(n, dtype=jnp.int32))
    (Q, P, r, s, breakdown_iter), (alphas, betas, gammas) = jax.lax.scan(
        scan_step, init, jnp.arange(1, n, dtype=jnp.int32)
    )
    alpha = jnp.concatenate([alpha0[None], alphas])
    return TwoSidedFactorization(
        alpha=alpha,
        beta=betas,
        gamma=gammas,
        Q=Q,
        P=P,
        breakdown_iter=breakdown_iter,
    )


@partial(jax.jit, static_argnames=("n", "reorth", "dtype"))
def _two_sided_jit(op, op_t, n, seed, reorth, dtype):
    m = op.shape[0]
    k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
    v0 = jax.random.uniform(k0, (m,), dtype=dtype, minval=-1.0, maxval=1.0)
    w0 = jax.random.uniform(k1, (m,), dtype=dtype, minval=-1.0, maxval=1.0)
    rmatvec = op_t.matvec if op_t is not None else op.rmatvec
    return two_sided_lanczos_kernel(
        op.matvec, rmatvec, v0, w0, n, reorth=reorth
    )


def two_sided_lanczos(
    op: LinearOperator,
    n: int,
    *,
    seed: int = 99,
    reorth: bool = True,
    op_transpose: Optional[LinearOperator] = None,
    dtype=None,
) -> TwoSidedFactorization:
    """Run n two-sided Lanczos steps on a (generally non-symmetric) operator.

    ``op_transpose``: optional explicit A^T operator (e.g. a materialized
    EllOperator transpose) — faster than scatter-based ``rmatvec``.
    """
    if n > op.shape[0]:
        raise ValueError("n cannot exceed operator dimension")
    if dtype is None:
        dtype = op.dtype
    return _two_sided_jit(op, op_transpose, n, seed, reorth, jnp.dtype(dtype))


def two_sided_eigs(fac: TwoSidedFactorization, k: Optional[int] = None):
    """Ritz values/right-vectors from a two-sided factorization.

    Truncates the projected tridiagonal at the serious-breakdown iteration
    (w_j ~ 0): iterations past breakdown carry no information (the look-ahead
    cure of papers/50-FreGutNac93-SISC14.pdf is future work; the reference
    iterates straight through breakdown, IrrLanczos.py:140-142).

    Returns (vals (j,), X (M, j)) sorted by ascending real part.
    """
    j = min(int(fac.breakdown_iter), fac.n)
    alpha = np.asarray(fac.alpha)[:j]
    beta = np.asarray(fac.beta)[: j - 1]
    gamma = np.asarray(fac.gamma)[: j - 1]
    vals, w = nonsymmetric_tridiag_eig(alpha, beta, gamma)
    x = np.asarray(fac.Q)[:j].T @ w  # right Ritz vectors
    if k is not None:
        vals, x = vals[:k], x[:, :k]
    return vals, x


def nonsymmetric_tridiag_eig(
    alpha: np.ndarray, beta: np.ndarray, gamma: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Eigendecomposition of T = tridiag(beta; alpha; gamma).

    If beta_i * gamma_i > 0 for all i, T is similar to the symmetric
    tridiagonal with off-diagonals sqrt(beta_i * gamma_i) via a diagonal
    similarity D T D^-1; the eigenvalues are real and eigh applies.  The
    eigenvectors are mapped back through D.  Otherwise falls back to dense
    nonsymmetric eig (host LAPACK).

    Returns (eigvals, right eigvecs columns); eigvals sorted by real part.
    """
    alpha = np.asarray(alpha, dtype=np.float64)
    beta = np.asarray(beta, dtype=np.float64)
    gamma = np.asarray(gamma, dtype=np.float64)
    n = len(alpha)
    prod = beta * gamma
    if n == 1:
        return alpha.copy(), np.ones((1, 1))
    if np.all(prod > 0):
        import scipy.linalg

        off = np.sqrt(prod)
        # D with D[0]=1, D[i+1] = D[i] * sqrt(gamma_i / beta_i):
        # (D T D^-1)_{i,i+1} = gamma_i * D_i/D_{i+1} = sqrt(beta*gamma) = off.
        ratio = np.sqrt(gamma / beta)
        d = np.concatenate([[1.0], np.cumprod(ratio)])
        vals, vecs_sym = scipy.linalg.eigh_tridiagonal(alpha, off)
        vecs = vecs_sym / d[:, None]  # right eigvecs of T: T (D^-1 u) = lam (D^-1 u)
        vecs = vecs / np.linalg.norm(vecs, axis=0, keepdims=True)
        return vals, vecs
    t = np.diag(alpha) + np.diag(beta, -1) + np.diag(gamma, 1)
    vals, vecs = np.linalg.eig(t)
    order = np.argsort(vals.real)
    return vals[order], vecs[:, order]
