"""Solver-state checkpointing: resumable long Lanczos runs.

The reference has matrix-level caching only (T cached to npz,
Regular/Hamiltonian.py:48-69) and no solver-state checkpointing — a crashed
400-iteration run restarts from zero (SURVEY.md §5.4).  Two mechanisms here:

* ``lanczos_checkpointed`` — the plain (non-restarted) solver in resumable
  segments.  The recurrence is ``solver.lanczos.lanczos_segment`` — the SAME
  compiled step as ``lanczos_kernel``, so the checkpointed path cannot drift
  from the main kernel (it inherits the breakdown guard and the
  ``compensated`` reduction option).  Two on-disk layouts:
  - ``path`` ending in ``.npz``: one atomic full-state file per segment
    (simple; rewrite cost grows with n — fine for small runs);
  - any other ``path``: a checkpoint DIRECTORY with incremental writes —
    each segment appends only its new basis rows (``V_{j0}_{j1}.npy``) plus
    a small ``meta.npz`` (r, alpha, beta, j), so the per-segment write cost
    is O(every * M) instead of O(n * M) (the flagship basis is ~6.5 GB; the
    incremental segment write is ~0.8 GB at every=50).

* ``eigsh_restarted(..., checkpoint_path=...)`` (solver.restart) — thick
  restart checkpoints per CYCLE: the natural unit for k=100-class runs, and
  its state is only the locked block + restart vector ((l+1, M), not the
  full (m+1, M) basis).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.operators import LinearOperator
from ..solver.lanczos import LanczosFactorization, lanczos_segment

__all__ = [
    "save_state",
    "load_state",
    "lanczos_checkpointed",
    "save_restart_state",
    "load_restart_state",
]


def _atomic_savez(path: str, **arrays) -> None:
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    # numpy appends .npz to names without the suffix
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)


def save_state(path: str, V, r, alpha, beta, j: int) -> None:
    """Legacy single-file checkpoint (full basis rewritten every call)."""
    _atomic_savez(
        path,
        V=np.asarray(V),
        r=np.asarray(r),
        alpha=np.asarray(alpha),
        beta=np.asarray(beta),
        j=np.asarray(j),
    )


def load_state(path: str):
    with np.load(path) as z:
        return z["V"], z["r"], z["alpha"], z["beta"], int(z["j"])


def _save_incremental(dirpath: str, V, r, alpha, beta, j_prev: int, j: int):
    """Append basis rows [j_prev, j) and atomically update meta."""
    os.makedirs(dirpath, exist_ok=True)
    seg = os.path.join(dirpath, f"V_{j_prev:06d}_{j:06d}.npy")
    tmp = seg + ".tmp.npy"
    np.save(tmp, np.asarray(V[j_prev:j]))
    os.replace(tmp, seg)
    _atomic_savez(
        os.path.join(dirpath, "meta.npz"),
        r=np.asarray(r),
        alpha=np.asarray(alpha),
        beta=np.asarray(beta),
        j=np.asarray(j),
    )


def _load_incremental(dirpath: str, n: int, m: int):
    """Reassemble (V, r, alpha, beta, j) from an incremental checkpoint dir.

    Only segments covered by meta's ``j`` are trusted (a segment written
    after a crash mid-meta-update is simply ignored)."""
    with np.load(os.path.join(dirpath, "meta.npz")) as z:
        r, alpha, beta, j = z["r"], z["alpha"], z["beta"], int(z["j"])
    V = np.zeros((n, m), dtype=r.dtype)
    covered = np.zeros(n, dtype=bool)
    for name in sorted(os.listdir(dirpath)):
        if not (name.startswith("V_") and name.endswith(".npy")):
            continue
        j0, j1 = (int(t) for t in name[2:-4].split("_"))
        if j1 > j:
            continue
        V[j0:j1] = np.load(os.path.join(dirpath, name))
        covered[j0:j1] = True
    if not covered[:j].all():
        missing = int(np.count_nonzero(~covered[:j]))
        raise ValueError(
            f"incremental checkpoint at {dirpath} is missing {missing} basis "
            f"rows below j={j}"
        )
    return V, r, alpha, beta, j


@partial(
    jax.jit, static_argnames=("j0", "j1", "reorth_passes", "compensated")
)
def _segment_jit(op, V, r, alpha, beta, bki, j0, j1, reorth_passes, compensated):
    return lanczos_segment(
        op.matvec,
        V,
        r,
        alpha,
        beta,
        bki,
        j0,
        j1,
        reorth="full",
        reorth_passes=reorth_passes,
        compensated=compensated,
    )


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
    compensated: bool = False,
    progress: Optional[Callable[[int], None]] = None,
) -> LanczosFactorization:
    """Full-reorthogonalization Lanczos in resumable segments.

    If ``path`` exists, resumes from it; otherwise starts fresh.  State is
    written after every segment (atomically for the meta/full file), so a
    killed run loses at most ``every`` iterations.  ``path`` ending in
    ``.npz`` selects the legacy full-file layout; anything else selects the
    incremental directory layout (see module docstring).
    """
    m = op.shape[0]
    if dtype is None:
        dtype = op.dtype
    dtype = jnp.dtype(dtype)
    legacy = path.endswith(".npz")

    state = None
    if legacy and os.path.exists(path):
        state = load_state(path)
    elif not legacy and os.path.exists(os.path.join(path, "meta.npz")):
        state = _load_incremental(path, n, m)

    if state is not None:
        V, r, alpha, beta, j = state
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
        if compensated:
            from ..ops.compensated import dot2_rounded

            a0 = dot2_rounded(w, v0)
        else:
            a0 = jnp.dot(w, v0, precision=jax.lax.Precision.HIGHEST)
        r = w - a0 * v0
        alpha = jnp.zeros(n, dtype=dtype).at[0].set(a0)
        beta = jnp.zeros(n - 1, dtype=dtype)
        j = 1
        if not legacy:
            # Row 0 must be on disk too, or a resume from the first meta
            # would be missing the start vector.
            _save_incremental(path, V, r, alpha, beta, 0, 1)

    bki = jnp.asarray(n, dtype=jnp.int32)
    while j < n:
        j1 = min(j + every, n)
        V, r, alpha, beta, bki = _segment_jit(
            op, V, r, alpha, beta, bki, j, j1, reorth_passes, compensated
        )
        jax.block_until_ready(r)
        if legacy:
            save_state(path, V, r, alpha, beta, j1)
        else:
            _save_incremental(path, V, r, alpha, beta, j, j1)
        j = j1
        if progress is not None:
            progress(j)

    return LanczosFactorization(
        alpha=alpha,
        beta=beta,
        V=V,
        resid=r,
        breakdown_iter=bki,
    )


# ---------------------------------------------------------------------------
# Thick-restart cycle checkpointing (used by solver.restart.eigsh_restarted).


def save_restart_state(path: str, V_locked, u, theta, sigma, cycle: int) -> None:
    """Atomically save a thick-restart cycle boundary: locked Ritz rows
    (l, M), restart vector u (M,), locked values theta (l,), couplings
    sigma (l,), completed-cycle count."""
    _atomic_savez(
        path,
        V_locked=np.asarray(V_locked),
        u=np.asarray(u),
        theta=np.asarray(theta),
        sigma=np.asarray(sigma),
        cycle=np.asarray(cycle),
    )


def load_restart_state(path: str):
    with np.load(path) as z:
        return (
            z["V_locked"],
            z["u"],
            z["theta"],
            z["sigma"],
            int(z["cycle"]),
        )
