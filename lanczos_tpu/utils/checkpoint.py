"""Solver-state checkpointing: resumable long Lanczos runs.

The reference has matrix-level caching only (T cached to npz,
Regular/Hamiltonian.py:48-69) and no solver-state checkpointing — a crashed
400-iteration run restarts from zero (SURVEY.md §5.4).  Here the Krylov
state (V panel, residual, alpha/beta history, iteration index) is
checkpointed every ``every`` iterations; ``lanczos_checkpointed`` resumes
from the newest checkpoint automatically.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.operators import LinearOperator
from ..solver.lanczos import (
    LanczosFactorization,
    _default_basis_dot,
    _default_dot,
    _orthogonalize,
)

__all__ = ["save_state", "load_state", "lanczos_checkpointed"]


def save_state(path: str, V, r, alpha, beta, j: int) -> None:
    tmp = path + ".tmp"
    np.savez(
        tmp if tmp.endswith(".npz") else tmp,
        V=np.asarray(V),
        r=np.asarray(r),
        alpha=np.asarray(alpha),
        beta=np.asarray(beta),
        j=np.asarray(j),
    )
    # numpy appends .npz to the tmp name
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)


def load_state(path: str):
    with np.load(path) as z:
        return z["V"], z["r"], z["alpha"], z["beta"], int(z["j"])


@partial(jax.jit, static_argnames=("j0", "j1", "reorth_passes"))
def _segment(op, V, r, alpha, beta, j0: int, j1: int, reorth_passes: int):
    """Run Lanczos steps j0..j1-1 from a warm state (same recurrence as
    solver.lanczos.lanczos_kernel, restartable)."""
    dot = _default_dot
    basis_dot = _default_basis_dot

    def norm(x):
        return jnp.sqrt(dot(x, x))

    def step(carry, j):
        V, r, alpha, beta = carry
        b = norm(r)
        v = r / b
        v = _orthogonalize(V, v, basis_dot, reorth_passes)
        v = v / norm(v)
        V = jax.lax.dynamic_update_slice_in_dim(V, v[None, :], j, axis=0)
        v_prev = jax.lax.dynamic_index_in_dim(V, j - 1, axis=0, keepdims=False)
        w = op.matvec(v)
        a = dot(v, w)
        r = w - a * v - b * v_prev
        alpha = alpha.at[j].set(a)
        beta = beta.at[j - 1].set(b)
        return (V, r, alpha, beta), None

    (V, r, alpha, beta), _ = jax.lax.scan(
        step, (V, r, alpha, beta), jnp.arange(j0, j1, dtype=jnp.int32)
    )
    return V, r, alpha, beta


def lanczos_checkpointed(
    op: LinearOperator,
    n: int,
    path: str,
    *,
    every: int = 50,
    seed: int = 99,
    v0=None,
    reorth_passes: int = 2,
    dtype=None,
    progress: Optional[Callable[[int], None]] = None,
) -> LanczosFactorization:
    """Full-reorthogonalization Lanczos in resumable segments.

    If ``path`` exists, resumes from it; otherwise starts fresh.  The state
    is written atomically after every segment, so a killed run loses at most
    ``every`` iterations.
    """
    m = op.shape[0]
    if dtype is None:
        dtype = op.dtype
    dtype = jnp.dtype(dtype)

    if os.path.exists(path):
        V, r, alpha, beta, j = load_state(path)
        if V.shape != (n, m):
            raise ValueError(
                f"checkpoint at {path} has shape {V.shape}, expected {(n, m)}"
            )
        V = jnp.asarray(V, dtype=dtype)
        r = jnp.asarray(r, dtype=dtype)
        alpha = jnp.asarray(alpha, dtype=dtype)
        beta = jnp.asarray(beta, dtype=dtype)
    else:
        if v0 is None:
            v0 = jax.random.uniform(
                jax.random.PRNGKey(seed), (m,), dtype=dtype, minval=-1.0, maxval=1.0
            )
        v0 = jnp.asarray(v0, dtype=dtype)
        v0 = v0 / jnp.linalg.norm(v0)
        V = jnp.zeros((n, m), dtype=dtype).at[0].set(v0)
        w = op.matvec(v0)
        a0 = jnp.dot(w, v0, precision=jax.lax.Precision.HIGHEST)
        r = w - a0 * v0
        alpha = jnp.zeros(n, dtype=dtype).at[0].set(a0)
        beta = jnp.zeros(n - 1, dtype=dtype)
        j = 1

    while j < n:
        j1 = min(j + every, n)
        V, r, alpha, beta = _segment(
            op, V, r, alpha, beta, j, j1, reorth_passes
        )
        jax.block_until_ready(r)
        j = j1
        save_state(path, V, r, alpha, beta, j)
        if progress is not None:
            progress(j)

    return LanczosFactorization(
        alpha=alpha,
        beta=beta,
        V=V,
        resid=r,
        breakdown_iter=jnp.asarray(n, dtype=jnp.int32),
    )
