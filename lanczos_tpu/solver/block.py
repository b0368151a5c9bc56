"""Block Lanczos: the SpMM path for clustered/degenerate spectra.

New capability beyond the reference (single-vector only): iterate on a block
of b vectors at once.  Each step does one operator application on an (M, b)
block — the SpMM shape the TPU likes (the gather feeds b lanes per row) —
and resolves degenerate eigenvalue clusters up to multiplicity b that
single-vector Lanczos provably cannot separate.

Recurrence (blocks stored row-major (b, M) like the single-vector basis):

    W   = A Q_j^T            (SpMM)
    A_j = Q_j W              (b x b, symmetric)
    R   = W^T - Q_j^T A_j - Q_{j-1}^T B_{j-1}^T
    [full reorthogonalization of R against all stored blocks]
    Q_{j+1}^T B_j^T = qr(R)  (tall-skinny QR on device)

The projected matrix is block tridiagonal with A_j on the diagonal and B_j
on the off-diagonal; Ritz extraction mirrors the single-vector path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.operators import LinearOperator

__all__ = ["BlockLanczosFactorization", "block_lanczos", "block_ritz"]

_PRECISION = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockLanczosFactorization:
    """A Q^T ~ Q^T T with Q = stacked blocks (nb, b, M), T block tridiagonal.

    a_blocks: (nb, b, b) diagonal blocks (symmetric).
    b_blocks: (nb-1, b, b) subdiagonal blocks (upper triangular from QR).
    Q:        (nb, b, M) orthonormal basis blocks (rows are vectors).
    """

    a_blocks: jax.Array
    b_blocks: jax.Array
    Q: jax.Array
    resid_block: jax.Array  # (M, b) final residual block (unnormalized)

    @property
    def num_blocks(self) -> int:
        return self.a_blocks.shape[0]

    @property
    def block_size(self) -> int:
        return self.a_blocks.shape[1]


def _orth_block(basis_flat, r):
    """Orthogonalize the (M, b) block r against all rows of (K, M) basis, CGS2."""
    for _ in range(2):
        coeff = jnp.dot(basis_flat, r, precision=_PRECISION)  # (K, b)
        r = r - jnp.dot(basis_flat.T, coeff, precision=_PRECISION)
    return r


def block_lanczos_kernel(
    matmat,
    q0: jax.Array,  # (M, b) initial block, need not be orthonormal
    num_blocks: int,
) -> BlockLanczosFactorization:
    m, b = q0.shape
    dtype = q0.dtype

    q0, _ = jnp.linalg.qr(q0)  # (M, b) orthonormal columns

    Q = jnp.zeros((num_blocks, b, m), dtype=dtype).at[0].set(q0.T)

    def step(carry, j):
        Q, q_prev_t, b_prev = carry  # q_prev_t: (M, b); b_prev: (b, b)
        w = matmat(q_prev_t)  # (M, b) = A Q_j^T
        a_j = jnp.dot(q_prev_t.T, w, precision=_PRECISION)  # (b, b)
        a_j = 0.5 * (a_j + a_j.T)

        q_prev2_t = jax.lax.dynamic_index_in_dim(
            Q, jnp.maximum(j - 1, 0), axis=0, keepdims=False
        ).T  # (M, b)
        r = w - jnp.dot(q_prev_t, a_j, precision=_PRECISION)
        r = r - jnp.where(
            j > 0, 1.0, 0.0
        ) * jnp.dot(q_prev2_t, b_prev.T, precision=_PRECISION)

        basis_flat = Q.reshape(num_blocks * b, m)
        r = _orth_block(basis_flat, r)
        q_next, b_j = jnp.linalg.qr(r)  # (M, b), (b, b) upper triangular

        Q = jax.lax.dynamic_update_slice_in_dim(
            Q, q_next.T[None], j + 1, axis=0
        )
        return (Q, q_next, b_j), (a_j, b_j)

    (Q, q_last, b_last), (a_blocks, b_blocks) = jax.lax.scan(
        step, (Q, q0, jnp.zeros((b, b), dtype=dtype)),
        jnp.arange(0, num_blocks - 1, dtype=jnp.int32),
    )
    # Final diagonal block + the residual block that the (unperformed) next
    # step would orthonormalize — it yields the Ritz residual estimates.
    w = matmat(q_last)
    a_last = jnp.dot(q_last.T, w, precision=_PRECISION)
    a_last = 0.5 * (a_last + a_last.T)
    a_blocks = jnp.concatenate([a_blocks, a_last[None]])
    q_prev2_t = Q[num_blocks - 2].T if num_blocks >= 2 else jnp.zeros_like(q_last)
    resid_block = (
        w
        - jnp.dot(q_last, a_last, precision=_PRECISION)
        - jnp.dot(q_prev2_t, b_last.T, precision=_PRECISION)
    )
    return BlockLanczosFactorization(
        a_blocks=a_blocks, b_blocks=b_blocks, Q=Q, resid_block=resid_block
    )


@partial(jax.jit, static_argnames=("num_blocks", "block_size", "dtype"))
def _block_jit(op, num_blocks, block_size, seed, dtype):
    m = op.shape[0]
    q0 = jax.random.normal(
        jax.random.PRNGKey(seed), (m, block_size), dtype=dtype
    )
    return block_lanczos_kernel(op.matmat, q0, num_blocks)


def block_lanczos(
    op: LinearOperator,
    num_blocks: int,
    block_size: int = 4,
    *,
    seed: int = 99,
    dtype=None,
) -> BlockLanczosFactorization:
    if num_blocks * block_size > op.shape[0]:
        raise ValueError("num_blocks * block_size cannot exceed dimension M")
    if dtype is None:
        dtype = op.dtype
    return _block_jit(op, num_blocks, block_size, seed, jnp.dtype(dtype))


@jax.jit
def block_ritz(fac: BlockLanczosFactorization):
    """(theta, X, resid_est) from the block factorization.

    Builds the dense block-tridiagonal T (nb*b, nb*b), eigensolves on device,
    back-transforms through the stacked basis, and estimates residuals from
    the last block row: ||A x_i - theta_i x_i|| ~ ||B_last W[last block, i]||.
    """
    nb, b = fac.num_blocks, fac.block_size
    n = nb * b
    m = fac.Q.shape[2]
    t = jnp.zeros((n, n), dtype=fac.a_blocks.dtype)
    for j in range(nb):
        t = jax.lax.dynamic_update_slice(t, fac.a_blocks[j], (j * b, j * b))
    # A Qc_j = Qc_{j-1} B_{j-1}^T + Qc_j A_j + Qc_{j+1} B_j (B upper
    # triangular from QR), so T_{j+1,j} = B_j and T_{j,j+1} = B_j^T.
    for j in range(nb - 1):
        t = jax.lax.dynamic_update_slice(
            t, fac.b_blocks[j], ((j + 1) * b, j * b)
        )
        t = jax.lax.dynamic_update_slice(
            t, fac.b_blocks[j].T, (j * b, (j + 1) * b)
        )
    theta, w = jnp.linalg.eigh(t)
    basis = fac.Q.reshape(n, m)  # (n, M)
    x = jnp.dot(basis.T, w, precision=_PRECISION)  # (M, n)
    # Residual: A X - X T = R_last E_last^T  =>  per-pair norm is
    # ||resid_block @ W[last block rows, i]||.
    last_rows = w[-b:, :]  # (b, n)
    resid = jnp.linalg.norm(
        jnp.dot(fac.resid_block, last_rows, precision=_PRECISION), axis=0
    )
    return theta, x, resid
