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


# Flat-layout VMEM working-set budget (MB); module-level so perf experiments
# can tune the slab height without editing code.
_FLAT_VMEM_MB = 48


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


def _roll_flat_x(part, dx: int, nx: int, col_x):
    """Shift by dx along the x axis on the flattened (y, x) plane.

    Base plane-roll by dx is exact except in the single wrapping column
    (x + dx outside [0, nx)), where the correct source is one x-row back.
    """
    p_plane = part.shape[1]
    base = pltpu.roll(part, shift=(-dx) % p_plane, axis=1)
    fixed = pltpu.roll(part, shift=(-(dx - dx * nx)) % p_plane, axis=1)
    wrap = col_x == (nx - 1 if dx > 0 else 0)
    return jnp.where(wrap, fixed, base)


def _graded_flat(slab, body, w0, w1, w2, w3, ny: int, nx: int, col_x):
    """Factorized graded-stencil application on the flat plane.

    For weights that depend only on the count of nonzero offset components
    (the 27-point Laplacian ladder, reference weights at
    Regular/Hamiltonian.py:116-128):

        y = A + Sx B,   A = w0 x + w1 (Sy+Sz) x + w2 SySz x,
                        B = w1 x + w2 (Sy+Sz) x + w3 SySz x,

    where S_a = shift_{+1} + shift_{-1} along axis a.  This costs ~26 VPU
    passes instead of ~75 for the general 27-tap accumulation chain — the
    kernel is VPU-bound, so this is ~2x on the flagship problem.
    """
    tz = body.shape[0]
    p_plane = body.shape[1]

    def roll_y(a, dy):
        return pltpu.roll(a, shift=(-dy * nx) % p_plane, axis=1)

    c1 = slab[0:tz] + slab[2 : tz + 2]  # Sz x
    g01 = roll_y(body, 1) + roll_y(body, -1)  # Sy x
    g11 = roll_y(c1, 1) + roll_y(c1, -1)  # Sy Sz x
    mid = g01 + c1
    a = w0 * body + w1 * mid + w2 * g11
    b = w1 * body + w2 * mid + w3 * g11
    return a + _roll_flat_x(b, 1, nx, col_x) + _roll_flat_x(b, -1, nx, col_x)


def _stencil_kernel_body_flat(
    *refs,
    offsets: Tuple[Tuple[int, int, int], ...],
    has_diag: bool,
    ny: int,
    nx: int,
    ladder: Optional[Tuple[int, int, int, int]] = None,
):
    """Flattened-plane variant: blocks are (tz, ny*nx) with ny*nx % 128 == 0.

    Mosaic's VMEM tiling pads the lane (last) dimension to a multiple of 128;
    a 3D block with nx=160 therefore wastes ~40% of every DMA and makes all
    in-plane ops shuffle through masked tiles.  Flattening (y, x) into one
    lane-aligned axis restores speed-of-light DMA whenever ny*nx is a
    multiple of 128 even though nx itself is not.

    Tap algebra on the flat plane P = ny*nx: the y-offset becomes an exact
    plane-modular roll (p + dy*nx wraps y periodically by construction); the
    x-offset is the same roll shifted by dx, which is wrong only in the
    single wrapping column (x + dx outside [0, nx)), fixed by one extra roll
    and a select on the output x-coordinate.
    """
    if has_diag:
        w_ref, body_ref, top_ref, bot_ref, diag_ref, y_ref = refs
    else:
        w_ref, body_ref, top_ref, bot_ref, y_ref = refs
        diag_ref = None

    body = body_ref[...]  # (tz, P)
    # Halo blocks are 8 planes tall (the minimum sublane-aligned block); the
    # needed plane sits at a fixed row because tz is a multiple of 8: the
    # top halo plane b*tz-1 is row 7 of the preceding 8-block, the bottom
    # halo plane b*tz+tz is row 0 of the following one.
    slab = jnp.concatenate([top_ref[7:8], body, bot_ref[0:1]], axis=0)
    tz = body.shape[0]
    p_plane = body.shape[1]

    if ladder is not None:
        col_x = jax.lax.broadcasted_iota(jnp.int32, (1, p_plane), 1) % nx
        k0, k1, k2, k3 = ladder
        acc = _graded_flat(
            slab, body, w_ref[k0], w_ref[k1], w_ref[k2], w_ref[k3], ny, nx, col_x
        )
        if has_diag:
            acc = acc + diag_ref[...] * body
        y_ref[...] = acc
        return

    groups = {}
    for k, (dz, dy, dx) in enumerate(offsets):
        groups.setdefault((dy, dx), []).append((dz, k))

    # Output x-coordinate per flat position (constant across rows).
    col_x = jax.lax.broadcasted_iota(jnp.int32, (1, p_plane), 1) % nx

    acc = None
    for (dy, dx), taps in sorted(groups.items()):
        part = None
        for dz, k in taps:
            sl = jax.lax.slice_in_dim(slab, 1 + dz, 1 + dz + tz, axis=0)
            term = w_ref[k] * sl
            part = term if part is None else part + term
        s = dy * nx + dx
        shifted = pltpu.roll(part, shift=(-s) % p_plane, axis=1) if s else part
        if dx != 0:
            # Wrap column: x + dx leaves [0, nx); the correct source is one
            # x-row back (dx=+1) or forward (dx=-1).
            s_fix = s - dx * nx
            fixed = pltpu.roll(part, shift=(-s_fix) % p_plane, axis=1)
            wrap = col_x == (nx - 1 if dx > 0 else 0)
            shifted = jnp.where(wrap, fixed, shifted)
        acc = shifted if acc is None else acc + shifted

    if has_diag:
        acc = acc + diag_ref[...] * body
    y_ref[...] = acc


def _build_call(
    grid_shape: Tuple[int, int, int],
    offsets: Tuple[Tuple[int, int, int], ...],
    has_diag: bool,
    dtype,
    interpret: bool,
    ladder: Optional[Tuple[int, int, int, int]] = None,
):
    nz, ny, nx = grid_shape
    itemsize = jnp.dtype(dtype).itemsize
    tz = _pick_tz(nz, ny * nx, itemsize)
    nblocks = nz // tz

    # Lane-alignment-driven layout choice: when nx is not a multiple of the
    # 128-lane tile but the whole plane is, the flattened-plane kernel avoids
    # padded DMA tiles (~6x on the N=160 flagship, measured on v5e).  The
    # flat layout is 2D, so every block's last two dims must be
    # (8k, 128k)-aligned: tz and the halo blocks become multiples of 8.
    flat = (nx % 128 != 0) and ((ny * nx) % 128 == 0) and nz % 8 == 0
    if flat:
        block_rest = (ny * nx,)
        kernel = functools.partial(
            _stencil_kernel_body_flat,
            offsets=offsets,
            has_diag=has_diag,
            ny=ny,
            nx=nx,
            ladder=ladder,
        )
        # tz: multiple of 8, divisor of nz, sized to VMEM (~_FLAT_VMEM_MB
        # usable on v5e): ~8*tz + 48 plane-sized buffers live at once.
        plane_bytes = ny * nx * itemsize
        cap = max(int((_FLAT_VMEM_MB * 2**20 / plane_bytes - 48) // 8), 8)
        tz = 8
        for cand in range(8, min(nz, cap) + 1, 8):
            if nz % cand == 0:
                tz = cand
        halo_h = 8
    else:
        block_rest = (ny, nx)
        kernel = functools.partial(
            _stencil_kernel_body,
            offsets=offsets,
            has_diag=has_diag,
        )
        halo_h = 1
    nblocks = nz // tz
    zeros = (0,) * len(block_rest)
    w_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    # The same x array is passed three times with different index maps: the
    # Tz-plane body plus the two periodic halo blocks.  In the 3D layout the
    # halo blocks are single planes indexed mod nz; in the flat layout they
    # are the 8-plane blocks containing the halo planes (see the flat kernel
    # body for the fixed in-block rows).
    body_spec = pl.BlockSpec(
        (tz, *block_rest), lambda b: (b, *zeros), memory_space=pltpu.VMEM
    )
    top_spec = pl.BlockSpec(
        (halo_h, *block_rest),
        lambda b: (((b * tz - halo_h) % nz) // halo_h, *zeros),
        memory_space=pltpu.VMEM,
    )
    bot_spec = pl.BlockSpec(
        (halo_h, *block_rest),
        lambda b: (((b * tz + tz) % nz) // halo_h, *zeros),
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
            (tz, *block_rest), lambda b: (b, *zeros), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nz, *block_rest), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * len(offsets) * nz * ny * nx,
            bytes_accessed=(3 if has_diag else 2) * nz * ny * nx * itemsize,
            transcendentals=0,
        ),
        # The default scoped-VMEM limit is 16 MB; v5e has 128 MB physical
        # VMEM and the wide flat-layout blocks are chosen to use it.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )
    return call, (nz, *block_rest)


@functools.partial(
    jax.jit,
    static_argnames=("grid_shape", "offsets", "interpret", "ladder"),
)
def _spmv_impl(x, diag, weights, grid_shape, offsets, interpret, ladder=None):
    call, shape = _build_call(
        grid_shape, offsets, diag is not None, x.dtype, interpret, ladder
    )
    xg = x.reshape(shape)
    if diag is not None:
        y = call(weights, xg, xg, xg, diag.reshape(shape))
    else:
        y = call(weights, xg, xg, xg)
    return y.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("grid_shape", "offsets", "interpret", "ladder"),
)
def _spmm_impl(X, diag, weights, grid_shape, offsets, interpret, ladder=None):
    call, shape = _build_call(
        grid_shape, offsets, diag is not None, X.dtype, interpret, ladder
    )
    diag_g = None if diag is None else diag.reshape(shape)

    def one(xcol):
        xg = xcol.reshape(shape)
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
    ladder = None
    if getattr(op, "graded", None) is not None:
        # One representative tap index per nonzero-component count; the
        # operator already verified weights are equal within each class.
        by_count = {}
        for k, off in enumerate(offsets):
            by_count.setdefault(sum(o != 0 for o in off), k)
        if sorted(by_count) == [0, 1, 2, 3]:
            ladder = tuple(by_count[c] for c in range(4))
    return offsets, ladder


def stencil_spmv_pallas(op, x: jax.Array, *, interpret: Optional[bool] = None):
    """y = op @ x via the Pallas slab kernel.  ``op`` is a StencilOperator."""
    if interpret is None:
        interpret = not pallas_supported()
    offsets, ladder = _prep(op)
    return _spmv_impl(
        x, op.diag, op.weights, op.grid_shape, offsets, interpret, ladder
    )


def stencil_spmm_pallas(op, X: jax.Array, *, interpret: Optional[bool] = None):
    """Y = op @ X (X: (M, b)) via the Pallas slab kernel."""
    if interpret is None:
        interpret = not pallas_supported()
    offsets, ladder = _prep(op)
    return _spmm_impl(
        X, op.diag, op.weights, op.grid_shape, offsets, interpret, ladder
    )
