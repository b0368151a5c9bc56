"""Look-ahead two-sided Lanczos: curing serious breakdown with block pivots.

The plain biorthogonal recurrence (solver/two_sided.py; reference loop at
/root/reference/Python/Irregular/IrrLanczos.py:125-144) divides by
w_j = r.s each step.  When w_j ~ 0 while r and s are both healthy ("serious
breakdown"), the division is meaningless; the reference iterates straight
through it (IrrLanczos.py:140-142 — the failure mode its own papers
directory ships the cure for: Freund/Gutknecht/Nachtigal, *An Implementation
of the Look-Ahead Lanczos Algorithm for Non-Hermitian Matrices*, SISC 1993,
/root/reference/papers/50-FreGutNac93-SISC14.pdf), and the scan kernel here
detects it and truncates.  This module implements the cure: instead of
requiring every 1x1 pivot w_j to be invertible, vectors are grouped into
*blocks*, and a block is closed only when its moment matrix
D_l = W_l^T V_l is safely nonsingular; projections use block inverses
D_l^{-1}, so a vanishing scalar pivot just grows the current block by one.

Design (host-driven, deliberately NOT a lax.scan):
  * Block closure is data-dependent control flow — exactly what XLA's traced
    loops cannot express.  The matvecs (the O(M) work) still run on the
    device through ``op.matvec``; the O(n^2) pivot logic runs in numpy fp64
    on the host.  For the modest n (hundreds) where the two-sided path
    operates, the host arithmetic is noise next to one SpMV.
  * Full two-sided Gram-Schmidt against ALL closed blocks each step (the
    robust form; the three-term block recurrence of FGN is an exact-
    arithmetic shortcut that the plain solver already exploits — this module
    is the rescue path, so it buys robustness with the O(n M) projection the
    per-step bireorthogonalization pays anyway, IrrLanczos.py:389-443).
  * Eigenvalues come from the oblique projection pencil
    (W^T A V) y = theta (W^T V) y over the closed blocks — W^T V is block
    diagonal and invertible by construction, so the pencil is regular.
  * A block that cannot be closed within ``max_block`` vectors is an
    INCURABLE breakdown (FGN's terminology): the run stops cleanly at the
    last closed block and says so.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..ops.operators import LinearOperator
from .results import EigResult

__all__ = [
    "LookAheadFactorization",
    "two_sided_lanczos_lookahead",
    "lookahead_eigs",
]


@dataclasses.dataclass(frozen=True)
class LookAheadFactorization:
    """V, W: (j, M) right/left bases (rows), grouped into closed blocks.

    blocks: list of (start, end) index ranges, each with nonsingular
    D_l = W[start:end] V[start:end]^T.  ``incurable`` marks a run stopped by
    a block that would not close within max_block vectors.  AV caches A V^T
    rows for the projected pencil (one extra (j, M) array, no extra SpMVs).
    """

    V: np.ndarray
    W: np.ndarray
    AV: np.ndarray
    blocks: Tuple[Tuple[int, int], ...]
    incurable: bool
    max_block_used: int

    @property
    def n(self) -> int:
        return 0 if not self.blocks else self.blocks[-1][1]


def _project_out(
    r: np.ndarray,
    s: np.ndarray,
    V: np.ndarray,
    W: np.ndarray,
    blocks: List[Tuple[int, int]],
    dinvs: List[np.ndarray],
    passes: int = 2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Oblique projection: r -= V_l D_l^{-1} (W_l r), s -= W_l D_l^{-T} (V_l s)
    for every closed block l (two passes: classical Gram-Schmidt twice)."""
    for _ in range(passes):
        for (a, b), dinv in zip(blocks, dinvs):
            Vl, Wl = V[a:b], W[a:b]
            r = r - Vl.T @ (dinv @ (Wl @ r))
            s = s - Wl.T @ (dinv.T @ (Vl @ s))
    return r, s


def two_sided_lanczos_lookahead(
    op: LinearOperator,
    n: int,
    *,
    op_transpose: Optional[LinearOperator] = None,
    v0: Optional[np.ndarray] = None,
    w0: Optional[np.ndarray] = None,
    seed: int = 99,
    close_tol: float = 1e-8,
    max_block: int = 4,
) -> LookAheadFactorization:
    """Up to n steps of look-ahead two-sided Lanczos (host fp64).

    ``close_tol``: a block closes when smallest-singular-value(D) exceeds
    close_tol * ||D||.  ``max_block``: block size at which breakdown is
    declared incurable.
    """
    m = op.shape[0]
    rng = np.random.default_rng(seed)
    r = np.asarray(v0, dtype=np.float64) if v0 is not None else rng.uniform(-1, 1, m)
    s = np.asarray(w0, dtype=np.float64) if w0 is not None else rng.uniform(-1, 1, m)

    def matvec(x):
        return np.asarray(op.matvec(x.astype(op.dtype)), dtype=np.float64)

    def rmatvec(x):
        if op_transpose is not None:
            return np.asarray(
                op_transpose.matvec(x.astype(op_transpose.dtype)),
                dtype=np.float64,
            )
        return np.asarray(op.rmatvec(x.astype(op.dtype)), dtype=np.float64)

    V = np.zeros((n, m))
    W = np.zeros((n, m))
    AV = np.zeros((n, m))
    blocks: List[Tuple[int, int]] = []
    dinvs: List[np.ndarray] = []
    open_start = 0
    incurable = False
    max_used = 1
    j = 0
    while j < n:
        rn, sn = np.linalg.norm(r), np.linalg.norm(s)
        if rn < 1e-300 or sn < 1e-300:
            break  # invariant subspace: benign termination
        V[j] = r / rn
        W[j] = s / sn
        AV[j] = matvec(V[j])

        # Try to close the open block [open_start, j+1).
        D = W[open_start : j + 1] @ V[open_start : j + 1].T
        svals = np.linalg.svd(D, compute_uv=False)
        bsize = j + 1 - open_start
        if svals[-1] > close_tol * max(svals[0], 1e-300):
            blocks.append((open_start, j + 1))
            dinvs.append(np.linalg.inv(D))
            max_used = max(max_used, bsize)
            open_start = j + 1
        elif bsize >= max_block:
            # Incurable: drop the unclosable block and stop.
            incurable = True
            j = open_start
            break

        # Next candidate pair: continue the Krylov spaces from the newest
        # vectors, obliquely orthogonalized against every closed block.
        r = AV[j]
        s = rmatvec(W[j])
        r, s = _project_out(r, s, V, W, blocks, dinvs)
        j += 1

    jdone = blocks[-1][1] if blocks else 0
    return LookAheadFactorization(
        V=V[:jdone],
        W=W[:jdone],
        AV=AV[:jdone],
        blocks=tuple(blocks),
        incurable=incurable,
        max_block_used=max_used,
    )


def lookahead_eigs(
    fac: LookAheadFactorization,
    k: Optional[int] = None,
    *,
    op: Optional[LinearOperator] = None,
    residual_tol: float = 1e-3,
):
    """Ritz pairs from the oblique projection pencil S y = theta G y,
    S = W^T A V, G = W^T V (block diagonal, invertible by construction).

    With ``op`` given: returns an EigResult of residual-filtered real pairs
    (same acceptance semantics as two_sided_eigs); otherwise (vals, X).
    """
    import scipy.linalg

    j = fac.n
    if j == 0:
        raise ValueError("empty factorization (immediate incurable breakdown)")
    G = fac.W @ fac.V.T
    S = fac.W @ fac.AV.T
    vals, Y = scipy.linalg.eig(S, G)
    X = fac.V.T @ Y
    order = np.argsort(vals.real)
    vals, X = vals[order], X[:, order]

    if op is None:
        if k is not None:
            vals, X = vals[:k], X[:, :k]
        return vals, X

    real = np.abs(vals.imag) <= 1e-8 * np.maximum(np.abs(vals.real), 1.0)
    vals_r = vals[real].real
    X_r = np.ascontiguousarray(X[:, real].real)
    W_mat = np.asarray(
        op.matmat(np.asarray(X_r, dtype=op.dtype)), dtype=np.float64
    )
    R = W_mat - X_r * vals_r[None, :]
    xn = np.linalg.norm(X_r, axis=0)
    resid = np.linalg.norm(R, axis=0) / np.maximum(xn, 1e-300) / np.maximum(
        np.abs(vals_r), 1.0
    )
    keep = resid <= residual_tol
    vals_k, X_k, resid_k = vals_r[keep], X_r[:, keep], resid[keep]
    if k is not None:
        vals_k, X_k, resid_k = vals_k[:k], X_k[:, :k], resid_k[:k]
    X_k = X_k / np.maximum(np.linalg.norm(X_k, axis=0), 1e-300)
    from .results import acceptance_inner_prod

    return EigResult(
        eigenvalues=vals_k,
        eigenvectors=X_k,
        residuals=resid_k,
        inner_prod=acceptance_inner_prod(
            op, np.asarray(X_k, dtype=op.dtype)
        ),
    )
