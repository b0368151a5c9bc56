"""Irregular-lattice Hamiltonian assembly: H = -T + V as padded ELL.

Vectorized re-design of the reference's per-point loop
(/root/reference/Python/Irregular/IrrHamiltonian.py:39-70):

* neighbor search for ALL points at once (lattice.find_neighbors), with the
  reference's widening rule: points with fewer than 26 neighbors at D=1
  rerun at D=2 (IrrHamiltonian.py:49-53);
* least-squares Laplacian weights solved once per UNIQUE stencil class
  (np.unique over canonicalized offset clouds — the array form of the
  reference's hash memoization, IrrLap.py:42-45 / Stencils.py:39-55) and
  broadcast back;
* every point gets a T row.  (The reference emits T rows ONLY for points
  that needed the widened search — interior points get no kinetic term at
  all (IrrHamiltonian.py:49-69, the append block is inside the <26 branch) —
  and rebuilds the CSC matrix every iteration.  Both are taken as bugs, per
  SURVEY.md quirks, and fixed here.)

The assembled operator is generally NON-symmetric (the least-squares weights
of point i's cloud need not match point j's).  The RECOMMENDED solve path is
solver.two_sided.two_sided_lanczos on the raw operator: its spectrum is
clean (the pure kinetic part has smallest real eigenvalue 0, measured on the
two-level N=60 lattice).  NOTE on precision/depth: in fp64 (CPU) the N=60
problem converges at n=250; in fp32 on TPU large lattices (N=120, P=272k,
spectral radius ~1e3) need substantially deeper Krylov runs and residual
filtering — two-sided Ritz values whose residual ||Hx - lambda x|| is not
small are ghosts and must be discarded (use results.acceptance_inner_prod
or an explicit residual check).  A restarted/precision-compensated
two-sided solver is the planned cure.  Symmetrizing instead introduces spurious
interface-localized negative eigenmodes (O(10 MeV) deep at 2:1 spacing
contrast, worse at 4:1) because the one-sided LSQ stencils are consistent
but not symmetric at refinement boundaries.  Options, with that caveat:
  "normal"  : H^T H (the reference's escape hatch, IrrHamiltonian.py:23-24)
  "average" : (H + H^T)/2
  "volume"  : (S + S^T)/2 with S = D^{1/2} H D^{-1/2}, D = diag(cell
              volumes a_i^3) — the natural inner product on a
              multi-resolution lattice; ~3x smaller interface artifacts
              than plain "average" in the same measurement.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import numpy as np

from ..ops.assemble import ell_from_coo
from ..ops.operators import EllOperator
from .irrlap import laplacian_weights_batch
from .lattice import IrregularLattice, find_neighbors
from .potentials import DEUTERON_REDUCED_REST_ENERGY_MEV, kinetic_prefactor

__all__ = [
    "assemble_irregular_hamiltonian",
    "assemble_irregular_hamiltonian_composite",
    "irregular_laplacian_rows",
]


def _solve_weights_dedup(nbrs, rels):
    """LSQ weights, solved once per UNIQUE stencil class (canonical key = the
    offset cloud + its mask; clouds arrive in deterministic scan order, so
    equal clouds have equal keys — the array form of the reference's hash
    memoization, IrrLap.py:42-45 / Stencils.py:39-55).

    Grouping uses two independent 64-bit random-projection hashes of each
    row's (offsets, mask) record instead of np.unique(axis=0) — the latter
    sorts the full (P, ~4K) byte matrix (tens of seconds at P~1e5); hashing
    is one chunked pass.  Collision probability over 128 bits is
    negligible (and the reference's own memoization, HashList, accepted far
    weaker hashing, IrrLap.py:20-34).
    """
    p, k = nbrs.shape
    nd = rels.shape[-1]
    mask = nbrs >= 0
    rng = np.random.default_rng(0xC0FFEE)
    proj = rng.integers(1, 2**63, size=(2, (nd + 1) * k), dtype=np.uint64)
    proj |= 1  # odd multipliers mix better under wraparound

    h = np.empty((2, p), dtype=np.uint64)
    chunk = max(1, (1 << 24) // ((nd + 1) * k))
    for lo in range(0, p, chunk):
        hi = min(p, lo + chunk)
        rec = np.concatenate(
            [
                (rels[lo:hi].reshape(hi - lo, -1) + (1 << 20)).astype(np.uint64),
                mask[lo:hi].astype(np.uint64),
            ],
            axis=1,
        )
        # Wrapping multiply-accumulate; position-dependent by projection.
        with np.errstate(over="ignore"):
            h[0, lo:hi] = (rec * proj[0]).sum(axis=1, dtype=np.uint64)
            h[1, lo:hi] = (rec * proj[1]).sum(axis=1, dtype=np.uint64)

    key = h[0] ^ (h[1] << np.uint64(1))
    order = np.argsort(key, kind="stable")
    ks = key[order]
    first = np.empty(p, dtype=bool)
    first[:1] = True
    first[1:] = ks[1:] != ks[:-1]
    group_of_sorted = np.cumsum(first) - 1
    inverse = np.empty(p, dtype=np.int64)
    inverse[order] = group_of_sorted
    reps = order[first]  # one representative row per class

    uniq_w = laplacian_weights_batch(rels[reps], mask[reps])
    weights = uniq_w[inverse]
    weights[~mask] = 0.0
    return weights


def _moment_violation(rels, weights):
    """Per-row deviation from the Laplacian moment conditions
    sum w x_a = 0, sum w x_a x_b = 2 delta_ab."""
    x = rels.astype(np.float64)
    nd = rels.shape[-1]
    err = np.zeros(len(weights))
    for a in range(nd):
        err = np.maximum(err, np.abs(np.einsum("pk,pk->p", weights, x[..., a])))
        for b in range(a, nd):
            target = 2.0 if a == b else 0.0
            err = np.maximum(
                err,
                np.abs(
                    np.einsum("pk,pk->p", weights, x[..., a] * x[..., b])
                    - target
                ),
            )
    return err


def irregular_laplacian_rows(
    lat: IrregularLattice,
    *,
    min_neighbors: Optional[int] = None,
    max_d: int = 3,
    moment_tol: float = 1e-6,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Neighbor indices, offsets, and LSQ Laplacian weights for every point.

    Returns (nbrs (P, K) padded with -1, rels (P, K, 3), weights (P, K) with
    0 on padding).  Starts from the D=1 search and ESCALATES the search
    radius per row until that row's weights satisfy the Laplacian moment
    conditions to ``moment_tol``.  This subsumes the reference's
    count-based widening rule (<26 neighbors -> D=2, IrrHamiltonian.py:49-53)
    and additionally repairs rows whose mirror-filtered cloud is large but
    DEGENERATE (e.g. nearly planar at fine/coarse corners) — those pass the
    reference's count test yet yield a singular moment matrix and a
    non-Laplacian row (an unvalidated failure mode of the reference).
    """
    p = lat.num_points
    if min_neighbors is None:
        min_neighbors = 3**lat.ndim - 1  # the reference's 26 in 3D
    nbrs, rels = find_neighbors(lat, 1)
    weights = _solve_weights_dedup(nbrs, rels)
    counts = (nbrs >= 0).sum(axis=1)
    bad = (counts < min_neighbors) | (_moment_violation(rels, weights) > moment_tol)

    d = 2
    while bad.any() and d <= max_d:
        wi = np.nonzero(bad)[0]
        nbrs_w, rels_w = find_neighbors(lat, d, wi)
        w_w = _solve_weights_dedup(nbrs_w, rels_w)
        k = max(nbrs.shape[1], nbrs_w.shape[1])

        def pad(a, k, fill):
            if a.shape[1] >= k:
                return a
            pw = [(0, 0), (0, k - a.shape[1])] + [(0, 0)] * (a.ndim - 2)
            return np.pad(a, pw, constant_values=fill)

        nbrs, rels, weights = pad(nbrs, k, -1), pad(rels, k, 0), pad(weights, k, 0)
        nbrs[wi] = pad(nbrs_w, k, -1)
        rels[wi] = pad(rels_w, k, 0)
        weights[wi] = pad(w_w, k, 0)
        bad = np.zeros(p, dtype=bool)
        bad[wi] = _moment_violation(rels[wi], weights[wi]) > moment_tol
        d += 1

    if bad.any():
        raise ValueError(
            f"{int(bad.sum())} lattice points have no consistent Laplacian "
            f"stencil within search depth {max_d}; lattice spacing contrast "
            "is too harsh"
        )
    return nbrs, rels, weights


def assemble_irregular_hamiltonian_composite(
    lat: IrregularLattice,
    potential: Optional[Callable] = None,
    *,
    t_factor: Optional[float] = None,
    rest_energy: float = DEUTERON_REDUCED_REST_ENERGY_MEV,
    dtype=np.float32,
):
    """H = -T + V as a CompositeOperator (the TPU-fast irregular format).

    Returns (op, perm): ``perm`` maps lattice point order -> the operator's
    level-major order (operator vectors are lattice vectors indexed by perm;
    see ops.composite).  Numerically identical to the padded-ELL assembly,
    but the SpMV runs at stencil speed on TPU instead of XLA-gather speed.
    """
    import jax

    from ..ops.composite import build_composite

    if t_factor is None:
        t_factor = kinetic_prefactor(lat.s, rest_energy)
    nbrs, rels, weights = irregular_laplacian_rows(lat)
    diag = t_factor * weights.sum(axis=1)
    if potential is not None:
        phys = lat.physical_coords()
        with jax.default_device(jax.devices("cpu")[0]):
            diag = diag + np.asarray(
                jax.jit(potential)(*(phys[:, a] for a in range(lat.ndim))),
                dtype=np.float64,
            )
    return build_composite(
        lat, nbrs, rels, weights, diag, scale=-t_factor, dtype=dtype
    )


def assemble_irregular_hamiltonian_composite2(
    lat: IrregularLattice,
    potential: Optional[Callable] = None,
    *,
    t_factor: Optional[float] = None,
    rest_energy: float = DEUTERON_REDUCED_REST_ENERGY_MEV,
    dtype=np.float32,
    min_grid_rows: int = 16,
    build_transpose: bool = False,
    fuse_interface: bool = False,
):
    """H = -T + V as a CompositeV2 (region-native strided irregular format).

    Returns (op, idx_map): scatter lattice-order vectors into the operator's
    region-native layout with ``v_op[idx_map] = v_lat`` and gather back with
    ``v_op[idx_map]`` (see ops.composite2).  Numerically identical to the
    padded-ELL assembly; roughly 2x the v1 composite SpMV throughput and
    lattice-size-independent interface cost.

    ``build_transpose=True`` materializes H^T in the same format so the
    two-sided recurrence (reference IrrLanczos.py:126-127) runs both
    directions at v2 speed; ``fuse_interface=True`` enables the Pallas
    fused interface kernel (ops.interface_kernel).
    """
    import jax

    from ..ops.composite2 import build_composite_v2

    if t_factor is None:
        t_factor = kinetic_prefactor(lat.s, rest_energy)
    nbrs, rels, weights = irregular_laplacian_rows(lat)
    diag = t_factor * weights.sum(axis=1)
    if potential is not None:
        phys = lat.physical_coords()
        with jax.default_device(jax.devices("cpu")[0]):
            diag = diag + np.asarray(
                jax.jit(potential)(*(phys[:, a] for a in range(lat.ndim))),
                dtype=np.float64,
            )
    return build_composite_v2(
        lat, nbrs, rels, weights, diag, scale=-t_factor, dtype=dtype,
        min_grid_rows=min_grid_rows, build_transpose=build_transpose,
        fuse_interface=fuse_interface,
    )


def assemble_irregular_hamiltonian(
    lat: IrregularLattice,
    potential: Optional[Callable] = None,
    *,
    t_factor: Optional[float] = None,
    rest_energy: float = DEUTERON_REDUCED_REST_ENERGY_MEV,
    symmetrize: Optional[str] = None,
    dtype=np.float32,
) -> EllOperator:
    """H = -T + V on the irregular lattice, as a padded-ELL operator.

    t_factor defaults to the physical kinetic prefactor with dx = the FINE
    grid spacing s (the LSQ weights are expressed in fine-grid units;
    Irr3Ddeuteron.py:18-22 uses dx = L/N — we use s = L/(N-1), the lattice's
    own fine spacing, for consistency with its coordinate convention).
    """
    p = lat.num_points
    if t_factor is None:
        t_factor = kinetic_prefactor(lat.s, rest_energy)

    nbrs, rels, weights = irregular_laplacian_rows(lat)
    k = nbrs.shape[1]
    mask = nbrs >= 0

    # Diagonal: +T_factor * sum(w) (from -T, with T's diagonal -sum(w),
    # IrrHamiltonian.py:62-64) plus the potential at the point.
    diag = t_factor * weights.sum(axis=1)
    if potential is not None:
        phys = lat.physical_coords()
        with jax.default_device(jax.devices("cpu")[0]):
            diag = diag + np.asarray(
                jax.jit(potential)(*(phys[:, a] for a in range(lat.ndim))),
                dtype=np.float64,
            )

    rows = np.repeat(np.arange(p, dtype=np.int64), k)[mask.reshape(-1)]
    cols = nbrs.reshape(-1)[mask.reshape(-1)]
    vals = (-t_factor * weights).reshape(-1)[mask.reshape(-1)]
    rows = np.concatenate([rows, np.arange(p, dtype=np.int64)])
    cols = np.concatenate([cols, np.arange(p, dtype=np.int64)])
    vals = np.concatenate([vals, diag])

    if symmetrize is None or symmetrize == "none":
        return ell_from_coo(rows, cols, vals, p, dtype=dtype)

    import scipy.sparse

    h = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(p, p)).tocsr()
    if symmetrize == "normal":
        # Normal equations H^T H (IrrHamiltonian.py:23-24): symmetric positive
        # semidefinite; eigenvalues are the squared singular values of H.
        h = (h.T @ h).tocoo()
    elif symmetrize == "average":
        h = (0.5 * (h + h.T)).tocoo()
    elif symmetrize == "volume":
        vol = (lat.spacings[lat.box_of_point] ** lat.ndim).astype(np.float64)
        d = np.sqrt(vol)
        dh = scipy.sparse.diags(d)
        dinv = scipy.sparse.diags(1.0 / d)
        s = dh @ h @ dinv
        h = (0.5 * (s + s.T)).tocoo()
    else:
        raise ValueError(f"unknown symmetrize={symmetrize!r}")
    from ..ops.assemble import ell_from_scipy

    return ell_from_scipy(h, dtype=dtype)
