"""User-facing eigensolver driver: lanczos -> tridiag eigh -> Ritz -> accept.

One call replaces the reference's four-step ritual
(``Lanczos(H)``; ``execute_Lanczos(n)``; ``get_H_eigs()``;
``print_good_eigs()`` — Regular/3Ddeuteron.py:94-97).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.operators import LinearOperator, as_operator
from .lanczos import lanczos
from .results import EigResult, acceptance_inner_prod
from .tridiag import cullum_willoughby_mask, ritz_from_factorization

__all__ = ["eigsh"]


def _select(theta, which: str, k: int):
    theta_np = np.asarray(theta)
    if which == "SA":  # smallest algebraic
        order = np.argsort(theta_np)
    elif which == "LA":  # largest algebraic
        order = np.argsort(theta_np)[::-1]
    elif which == "SM":  # smallest magnitude (the reference oracle's choice,
        # Regular/Lanczos.py:70: eigsh(k=20, which="SM"))
        order = np.argsort(np.abs(theta_np))
    elif which == "LM":
        order = np.argsort(np.abs(theta_np))[::-1]
    else:
        raise ValueError(f"unknown which={which!r}")
    return order[:k]


def eigsh(
    A,
    k: int = 6,
    *,
    n: Optional[int] = None,
    which: str = "SA",
    seed: int = 99,
    v0=None,
    reorth: str = "full",
    reorth_passes: int = 2,
    reorth_period: int = 5,
    ghost_filter: Optional[bool] = None,
    compute_acceptance: bool = True,
    dtype=None,
    compensated: bool = False,
    block_size: int = 1,
) -> EigResult:
    """Find k extremal eigenpairs of a symmetric operator by Lanczos.

    Parameters mirror scipy.sparse.linalg.eigsh where they overlap; ``A`` may
    be a LinearOperator, a dense array, or a scipy sparse matrix.

    ``block_size > 1`` runs BLOCK Lanczos (solver.block): the recurrence
    advances a (M, b) panel per step through ``op.matmat``, resolving
    degenerate multiplets up to b that single-vector Lanczos cannot
    (SURVEY.md §7.7); ``n`` then counts Krylov VECTORS (rounded UP to a
    whole number of blocks so at least k vectors exist).  reorth/ghost
    options apply to the single-vector path only; ``v0`` and ``compensated``
    are rejected with ``block_size > 1``.

    ``ghost_filter`` defaults to True when reorthogonalization is not "full"
    (without full reorth, spurious copies of converged eigenvalues appear and
    must be filtered by the Cullum–Willoughby test).

    ``compensated=True`` runs the recurrence's alpha/beta/norm reductions
    through the error-free-transform dot (ops.compensated), removing the
    plain-fp32 reduction floor on large M at negligible bandwidth cost.
    """
    op = as_operator(A)
    m = op.shape[0]
    if n is None:
        n = min(m, max(2 * k + 20, 4 * k))
    if k > n:
        raise ValueError(f"k={k} cannot exceed Krylov depth n={n}")
    if ghost_filter is None:
        ghost_filter = reorth != "full"

    if block_size > 1:
        from .block import block_lanczos, block_ritz

        if v0 is not None:
            raise ValueError("v0 is not supported with block_size > 1")
        if compensated:
            raise ValueError("compensated is not supported with block_size > 1")
        # Krylov dimension must cover k: ceil over blocks, capped at the
        # operator dimension (ADVICE r2: n//block_size can silently yield < k
        # vectors, e.g. k=10, n=10, block_size=3 -> 9).
        if m < 2 * block_size:
            # The minimum 2-block basis would already exceed the operator
            # dimension (ADVICE r3: flooring the cap at 2 defeated it).
            raise ValueError(
                f"operator dimension {m} is too small for block_size="
                f"{block_size} (needs m >= {2 * block_size})"
            )
        num_blocks = max(-(-max(n, k) // block_size), 2)
        num_blocks = min(num_blocks, m // block_size)
        if num_blocks * block_size < k:
            raise ValueError(
                f"block Krylov dimension {num_blocks * block_size} "
                f"(block_size={block_size}, m={m}) cannot produce k={k} pairs"
            )
        bfac = block_lanczos(
            op, num_blocks, block_size, seed=seed, dtype=dtype
        )
        theta_b, X_b, resid_b = block_ritz(bfac)
        sel = _select(np.asarray(theta_b), which, k)
        eigenvalues = theta_b[sel]
        eigenvectors = X_b[:, sel]
        residuals = resid_b[sel]
        if compute_acceptance:
            inner = acceptance_inner_prod(op, eigenvectors)
        else:
            inner = jnp.full(len(sel), jnp.nan, dtype=eigenvalues.dtype)
        return EigResult(
            eigenvalues=eigenvalues,
            eigenvectors=eigenvectors,
            residuals=residuals,
            inner_prod=inner,
        )

    fac = lanczos(
        op,
        n,
        seed=seed,
        v0=v0,
        reorth=reorth,
        reorth_passes=reorth_passes,
        reorth_period=reorth_period,
        dtype=dtype,
        compensated=compensated,
    )
    theta, X, resid_est = ritz_from_factorization(fac)

    keep = np.ones(fac.n, dtype=bool)
    if ghost_filter:
        theta_np = np.asarray(theta)
        keep = cullum_willoughby_mask(
            np.asarray(fac.alpha), np.asarray(fac.beta), theta_np
        )
        # Without (full) reorthogonalization, converged Ritz values reappear
        # as numerically identical copies.  Single-vector Lanczos cannot
        # resolve true multiplicity anyway, so collapse each cluster to its
        # best-residual representative.
        resid_np = np.asarray(resid_est)
        scale = max(float(np.max(np.abs(theta_np))), 1.0)
        tol = 1e-8 * scale
        rep = None  # index of current cluster's representative
        for i in np.argsort(theta_np):
            if not keep[i]:
                continue
            if rep is not None and theta_np[i] - theta_np[rep] < tol:
                if resid_np[i] < resid_np[rep]:
                    keep[rep] = False
                    rep = i
                else:
                    keep[i] = False
            else:
                rep = i
    kept_idx = np.nonzero(keep)[0]
    sel_local = _select(np.asarray(theta)[kept_idx], which, k)
    sel = kept_idx[sel_local]

    eigenvalues = theta[sel]
    eigenvectors = X[:, sel]
    residuals = resid_est[sel]

    if compute_acceptance:
        inner = acceptance_inner_prod(op, eigenvectors)
    else:
        inner = jnp.full(len(sel), jnp.nan, dtype=eigenvalues.dtype)

    return EigResult(
        eigenvalues=eigenvalues,
        eigenvectors=eigenvectors,
        residuals=residuals,
        inner_prod=inner,
    )
