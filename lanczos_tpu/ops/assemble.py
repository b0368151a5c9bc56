"""Host-side sparse assembly: COO triplets -> padded ELL, format conversions.

The reference assembles its Hamiltonians as Python lists of COO triplets in an
N^3 interpreted loop (Regular/Hamiltonian.py:62-67 — hours-scale at N=160).
Here assembly is O(nnz) vectorized numpy on the host; the resulting ELL arrays
are then device_put once and stay HBM-resident for the whole Krylov run.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .operators import EllOperator, StencilOperator

__all__ = [
    "ell_from_coo",
    "ell_from_scipy",
    "stencil_to_ell",
    "coo_sum_duplicates",
]


def coo_sum_duplicates(rows, cols, vals, m):
    """Merge duplicate (row, col) entries by summation. Returns sorted COO."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    key = rows * m + cols
    order = np.argsort(key, kind="stable")
    key, rows, cols, vals = key[order], rows[order], cols[order], vals[order]
    unique_mask = np.empty(len(key), dtype=bool)
    unique_mask[0:1] = True
    unique_mask[1:] = key[1:] != key[:-1]
    group_ids = np.cumsum(unique_mask) - 1
    out_vals = np.zeros(group_ids[-1] + 1 if len(group_ids) else 0, dtype=vals.dtype)
    np.add.at(out_vals, group_ids, vals)
    return rows[unique_mask], cols[unique_mask], out_vals


def ell_from_coo(
    rows,
    cols,
    vals,
    m: int,
    dtype=np.float32,
    k_pad: Optional[int] = None,
    sum_duplicates: bool = True,
) -> EllOperator:
    """Build a padded-ELL operator from COO triplets.

    Rows with fewer than K entries are padded with (col=row, val=0).  K is the
    max row length, optionally rounded up to ``k_pad``.
    """
    if sum_duplicates and len(np.atleast_1d(rows)):
        rows, cols, vals = coo_sum_duplicates(rows, cols, vals, m)
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)

    counts = np.bincount(rows, minlength=m)
    k = int(counts.max()) if len(counts) else 1
    if k_pad is not None:
        k = max(k, int(k_pad))
    k = max(k, 1)

    order = np.argsort(rows, kind="stable")
    rows_s, cols_s, vals_s = rows[order], cols[order], vals[order]

    from ..native import pack_ell_native

    packed = pack_ell_native(rows_s, cols_s, vals_s, m, k)
    if packed is not None:
        ell_cols, ell_vals = packed
        ell_vals = ell_vals.astype(dtype, copy=False)
    else:
        # numpy fallback: position of each entry within its (sorted) row.
        row_starts = np.concatenate([[0], np.cumsum(counts)])
        pos_in_row = np.arange(len(rows_s)) - row_starts[rows_s]
        ell_cols = np.tile(np.arange(m, dtype=np.int64)[:, None], (1, k))
        ell_vals = np.zeros((m, k), dtype=dtype)
        ell_cols[rows_s, pos_in_row] = cols_s
        ell_vals[rows_s, pos_in_row] = vals_s

    return EllOperator(
        cols=jnp.asarray(ell_cols, dtype=jnp.int32),
        vals=jnp.asarray(ell_vals, dtype=dtype),
    )


def ell_from_scipy(A, dtype=None, k_pad: Optional[int] = None) -> EllOperator:
    """Convert a scipy sparse matrix to a padded-ELL operator."""
    coo = A.tocoo()
    if dtype is None:
        dtype = coo.data.dtype
    assert coo.shape[0] == coo.shape[1], "operator must be square"
    return ell_from_coo(
        coo.row, coo.col, coo.data, coo.shape[0], dtype=dtype, k_pad=k_pad
    )


def stencil_to_ell(op: StencilOperator) -> EllOperator:
    """Materialize a StencilOperator as padded ELL (vectorized, O(M*k)).

    Direct construction — every row has the same k-tap structure, so no COO
    sort/dedup is needed (the diagonal merges into the stencil's center tap).
    Used for cross-checking the matrix-free path against the sparse path and
    for feeding the ELL SpMV benchmark with the regular-grid Hamiltonian.
    """
    grid_shape = op.grid_shape
    m = int(np.prod(grid_shape))
    ndim = len(grid_shape)
    gs = np.asarray(grid_shape, dtype=np.int64)
    # coords[a] of every flat index, slow->fast: flat = sum_a c[a]*stride[a].
    coords = np.stack(
        np.unravel_index(np.arange(m, dtype=np.int64), grid_shape), axis=0
    )  # (ndim, M)
    strides = np.ones(ndim, dtype=np.int64)
    for a in range(ndim - 2, -1, -1):
        strides[a] = strides[a + 1] * grid_shape[a + 1]

    offsets = np.asarray(op.offsets, dtype=np.int64)  # (k, ndim)
    weights = np.asarray(op.weights)
    dtype = weights.dtype
    k = offsets.shape[0]

    ell_cols = np.empty((m, k), dtype=np.int64)
    for j in range(k):  # k is small (<= 27); each pass is vectorized over M
        nbr = (coords + offsets[j][:, None]) % gs[:, None]  # (ndim, M)
        ell_cols[:, j] = strides @ nbr
    ell_vals = np.broadcast_to(weights.astype(dtype), (m, k)).copy()

    diag = None if op.diag is None else np.asarray(op.diag, dtype=dtype)
    center = [j for j in range(k) if not offsets[j].any()]
    if diag is not None:
        if center:
            ell_vals[:, center[0]] += diag
        else:
            ell_cols = np.concatenate(
                [ell_cols, np.arange(m, dtype=np.int64)[:, None]], axis=1
            )
            ell_vals = np.concatenate([ell_vals, diag[:, None]], axis=1)

    return EllOperator(
        cols=jnp.asarray(ell_cols, dtype=jnp.int32),
        vals=jnp.asarray(ell_vals, dtype=dtype),
    )
