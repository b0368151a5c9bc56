"""Pallas TPU kernels for the hot SpMV/SpMM path.

The reference's hot op is the CSR SpMV ``H*v`` executed by cuSPARSE
(/root/reference/Python/Regular/Lanczos.py:88,116).  On TPU the equivalent
speed-of-light implementation is *not* a CSR gather kernel — irregular
gathers are hostile to the VPU — but a windowed stencil kernel that streams
x through VMEM exactly once:

* :func:`stencil_spmv_pallas` — periodic 3D stencil + diagonal SpMV.  The
  grid iterates over z-slabs.  Each program sees a Tz-plane body block of x
  plus two single-plane periodic halo blocks (the same x array passed with
  modular ``index_map``s — no extra HBM copies), applies every stencil tap
  as a static z-slice + in-plane ``pltpu.roll``, adds the diagonal term,
  and writes one Tz-plane slab of y.  HBM traffic is ~(1+2/Tz) reads of x
  + 1 read of diag + 1 write of y per SpMV — the bandwidth floor for this
  op — and Pallas double-buffers all blocks automatically.

* :func:`stencil_spmm_pallas` — the same kernel applied per column of a
  Krylov block (SpMM for block Lanczos, SURVEY.md §7.7).  Each column call
  is individually HBM-bound, so sequencing them loses nothing.

Both kernels are exact drop-ins for ``StencilOperator.matvec`` /
``.matmat`` and are validated against them in tests (CPU interpret mode)
and against the XLA path on the real chip.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "stencil_spmv_pallas",
    "stencil_spmm_pallas",
    "pallas_supported",
]


def pallas_supported() -> bool:
    """True when the current default backend can run these kernels compiled."""
    return jax.default_backend() == "tpu"


def _pick_tz(nz: int, plane_elems: int, itemsize: int) -> int:
    """Choose the z-slab height: as tall as fits comfortably in VMEM.

    Live VMEM ~= double-buffered body/diag/out blocks (6*tz planes) + the
    concatenated slab and tap temporaries (~3*tz).  Keep that under ~8 MB
    so Mosaic has pipelining headroom, and pick a divisor of nz so the grid
    tiles exactly.
    """
    budget = 8 * 1024 * 1024
    per_plane = plane_elems * itemsize
    tz = max(1, min(nz, (budget // max(per_plane, 1)) // 9))
    while tz > 1 and nz % tz != 0:
        tz -= 1
    return tz


def _stencil_kernel_body(
    *refs,
    offsets: Tuple[Tuple[int, int, int], ...],
    has_diag: bool,
):
    """One grid step: produce y planes [b*tz, (b+1)*tz) from a haloed slab.

    Stencil weights arrive as a traced SMEM vector (not baked constants) so
    the kernel stays usable under an outer jit where the operator's weight
    array is a tracer, and so one compilation serves any weight values.
    """
    if has_diag:
        w_ref, body_ref, top_ref, bot_ref, diag_ref, y_ref = refs
    else:
        w_ref, body_ref, top_ref, bot_ref, y_ref = refs
        diag_ref = None

    body = body_ref[...]  # (tz, ny, nx): x planes [b*tz, b*tz + tz)
    top = top_ref[...]  # (1, ny, nx):  x plane  (b*tz - 1) mod nz
    bot = bot_ref[...]  # (1, ny, nx):  x plane  (b*tz + tz) mod nz
    slab = jnp.concatenate([top, body, bot], axis=0)  # (tz+2, ny, nx)
    tz = body.shape[0]

    # Apply every tap: static z-slice of the slab + in-plane rolls.  Group
    # taps by (dy, dx) so each in-plane roll happens once: combine the (up
    # to 3) z-shifted slices first, then roll the combined stack.
    groups = {}
    for k, (dz, dy, dx) in enumerate(offsets):
        groups.setdefault((dy, dx), []).append((dz, k))

    ny, nx = body.shape[1], body.shape[2]
    acc = None
    for (dy, dx), taps in sorted(groups.items()):
        part = None
        for dz, k in taps:
            sl = jax.lax.slice_in_dim(slab, 1 + dz, 1 + dz + tz, axis=0)
            term = w_ref[k] * sl
            part = term if part is None else part + term
        # y[c] = sum_k w_k x[c + off_k]  <=>  y += w * roll(x, -off); pltpu
        # rolls must be non-negative, so shift by (-d) mod axis_size.
        if dy != 0:
            part = pltpu.roll(part, shift=(-dy) % ny, axis=1)
        if dx != 0:
            part = pltpu.roll(part, shift=(-dx) % nx, axis=2)
        acc = part if acc is None else acc + part

    if has_diag:
        acc = acc + diag_ref[...] * body
    y_ref[...] = acc


def _build_call(
    grid_shape: Tuple[int, int, int],
    offsets: Tuple[Tuple[int, int, int], ...],
    has_diag: bool,
    dtype,
    interpret: bool,
):
    nz, ny, nx = grid_shape
    itemsize = jnp.dtype(dtype).itemsize
    tz = _pick_tz(nz, ny * nx, itemsize)
    nblocks = nz // tz

    kernel = functools.partial(
        _stencil_kernel_body,
        offsets=offsets,
        has_diag=has_diag,
    )
    w_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    # The same x array is passed three times with different index maps: the
    # Tz-plane body plus the two periodic halo planes.  Halo blocks are one
    # plane tall, so their "block index" is a plane index mod nz.
    body_spec = pl.BlockSpec((tz, ny, nx), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    top_spec = pl.BlockSpec(
        (1, ny, nx),
        lambda b: ((b * tz - 1) % nz, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bot_spec = pl.BlockSpec(
        (1, ny, nx),
        lambda b: ((b * tz + tz) % nz, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [w_spec, body_spec, top_spec, bot_spec]
    if has_diag:
        in_specs.append(body_spec)

    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tz, ny, nx), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * len(offsets) * nz * ny * nx,
            bytes_accessed=(3 if has_diag else 2) * nz * ny * nx * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    return call


@functools.partial(
    jax.jit,
    static_argnames=("grid_shape", "offsets", "interpret"),
)
def _spmv_impl(x, diag, weights, grid_shape, offsets, interpret):
    call = _build_call(grid_shape, offsets, diag is not None, x.dtype, interpret)
    xg = x.reshape(grid_shape)
    if diag is not None:
        y = call(weights, xg, xg, xg, diag.reshape(grid_shape))
    else:
        y = call(weights, xg, xg, xg)
    return y.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("grid_shape", "offsets", "interpret"),
)
def _spmm_impl(X, diag, weights, grid_shape, offsets, interpret):
    call = _build_call(grid_shape, offsets, diag is not None, X.dtype, interpret)
    diag_g = None if diag is None else diag.reshape(grid_shape)

    def one(xcol):
        xg = xcol.reshape(grid_shape)
        if diag_g is not None:
            y = call(weights, xg, xg, xg, diag_g)
        else:
            y = call(weights, xg, xg, xg)
        return y.reshape(-1)

    # Sequential per-column kernel calls in one XLA program: each call is
    # HBM-bandwidth-bound on its own, so there is nothing to gain from
    # batching them, and the 3D VMEM layout stays lane-aligned.
    cols = [one(X[:, j]) for j in range(X.shape[1])]
    return jnp.stack(cols, axis=1)


def _prep(op):
    offsets = tuple(tuple(int(o) for o in off) for off in op.offsets)
    if len(op.grid_shape) != 3:
        raise ValueError("pallas stencil kernel supports 3D grids only")
    for off in offsets:
        if any(abs(o) > 1 for o in off):
            raise ValueError("pallas stencil kernel supports offsets in {-1,0,1}")
    return offsets


def stencil_spmv_pallas(op, x: jax.Array, *, interpret: Optional[bool] = None):
    """y = op @ x via the Pallas slab kernel.  ``op`` is a StencilOperator."""
    if interpret is None:
        interpret = not pallas_supported()
    offsets = _prep(op)
    return _spmv_impl(x, op.diag, op.weights, op.grid_shape, offsets, interpret)


def stencil_spmm_pallas(op, X: jax.Array, *, interpret: Optional[bool] = None):
    """Y = op @ X (X: (M, b)) via the Pallas slab kernel."""
    if interpret is None:
        interpret = not pallas_supported()
    offsets = _prep(op)
    return _spmm_impl(X, op.diag, op.weights, op.grid_shape, offsets, interpret)
