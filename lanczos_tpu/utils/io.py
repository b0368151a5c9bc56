"""Matrix / result I/O: npz operator caching and external-format export.

Covers the reference's persistence surface (SURVEY.md §3.5/5.4):
  * `.npz` caching of assembled operators, keyed by a config string
    (reference: T_matrices/T_N={N}_Laplace={points}.npz,
    Regular/Hamiltonian.py:48-69);
  * `.npy` eigenpair dumps (3Ddeuteron.py:99-100);
  * Mathematica-syntax `.dat` COO export, the interop boundary the
    reference serves with MatrixWrite.py:37-62.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.operators import EllOperator

__all__ = [
    "save_ell",
    "load_ell",
    "cached_ell",
    "save_eigpairs",
    "export_mathematica",
]


def save_ell(path: str, op: EllOperator) -> None:
    np.savez_compressed(
        path if path.endswith(".npz") else path + ".npz",
        cols=np.asarray(op.cols),
        vals=np.asarray(op.vals),
    )


def load_ell(path: str) -> EllOperator:
    with np.load(path) as z:
        return EllOperator(
            cols=jnp.asarray(z["cols"]), vals=jnp.asarray(z["vals"])
        )


def cached_ell(path: str, builder) -> EllOperator:
    """Load the operator from ``path`` if present, else build + save it
    (the reference's T-matrix cache pattern, Hamiltonian.py:48-69)."""
    real = path if path.endswith(".npz") else path + ".npz"
    if os.path.exists(real):
        return load_ell(real)
    op = builder()
    os.makedirs(os.path.dirname(real) or ".", exist_ok=True)
    save_ell(real, op)
    return op


def save_eigpairs(prefix: str, eigenvalues, eigenvectors) -> None:
    """eigvals/eigvecs .npy dumps, mirroring 3Ddeuteron.py:99-100."""
    np.save(prefix + "_eigvals.npy", np.asarray(eigenvalues))
    np.save(prefix + "_eigvecs.npy", np.asarray(eigenvectors))


def export_mathematica(
    path: str,
    op: EllOperator,
    *,
    ndim: int = 3,
    length: float = 25.0,
    potential_name: str = "Deuteron",
    shape: Optional[int] = None,
) -> None:
    """COO triplet export in the reference's Mathematica syntax.

    Header and body format follow MatrixWrite.py:37-60:
        numd = d; nrpoints = nnz; box = {L, L, L};
        potential = "name"; H = {{M, M}, { {row, col, val},\\n ... }};
    Values are printed with 17 decimal places as the reference does.
    """
    coo = op.to_scipy().tocoo()
    m = coo.shape[0] if shape is None else shape
    lines = [
        f"numd = {ndim:d};",
        f"nrpoints = {coo.nnz:d};",
        f"box = {{{length:g}, {length:g}, {length:g}}};",
        f'potential = "{potential_name}";',
        f"H = {{{{{m:d}, {m:d}}}, {{",
    ]
    body = "".join(
        f"{{{r}, {c}, {v:.17f}}},\n"
        for r, c, v in zip(coo.row, coo.col, coo.data)
    )
    with open(path, "w") as f:
        f.write("\n".join(lines))
        f.write(body)
        f.write("}};")
