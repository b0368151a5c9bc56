"""Pallas TPU kernels for the hot SpMV/SpMM path.

The reference's hot op is the CSR SpMV ``H*v`` executed by cuSPARSE
(/root/reference/Python/Regular/Lanczos.py:88,116).  On TPU the equivalent
speed-of-light implementation is *not* a CSR gather kernel — irregular
gathers are hostile to the VPU — but a windowed stencil kernel that streams
x through VMEM exactly once:

* :func:`stencil_spmv_pallas` — periodic 3D stencil + diagonal SpMV.  The
  grid iterates over z-slabs.  Each program sees a Tz-plane body block of x
  plus two periodic halo blocks (the same x array passed with modular
  ``index_map``s — no extra HBM copies), applies every stencil tap
  as a static z-slice + in-plane ``pltpu.roll``, adds the diagonal term,
  and writes one Tz-plane slab of y.  HBM traffic is ~(1+2h/Tz) reads of x
  + 1 read of diag + 1 write of y per SpMV — the bandwidth floor for this
  op — and Pallas double-buffers all blocks automatically.

* :func:`stencil_spmm_pallas` — the same kernel applied per column of a
  Krylov block (SpMM for block Lanczos, SURVEY.md §7.7).  Each column call
  is individually HBM-bound, so sequencing them loses nothing.

LAYOUT MATTERS (measured on v5e, N=160^3 fp32): the kernel's internal
layout is 2D "flat-plane" (nz, ny*nx) when nx is not lane-aligned.  A
caller handing the kernel a FLAT (M,) vector forces a tiled-layout
conversion: done at the XLA level (x.reshape before pallas_call) it
materializes through HBM and costs ~50 us per SpMV; done INSIDE the kernel
(1D blocks reshaped in VMEM) it costs ~25 us.  Callers that carry their
vectors in ``StencilOperator.vec_shape`` skip both: ~100 us vs 125/149 us
per SpMV.  The solvers (solver.lanczos / solver.restart) therefore carry
vec_shape-shaped vectors; foreign 1D vectors still work through the
in-kernel reshape path.

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
    "pallas_vec_shape",
]


def pallas_supported() -> bool:
    """True when the current default backend can run these kernels compiled.

    ``LANCZOS_NO_PALLAS=1`` forces the XLA roll/einsum paths instead — the
    escape hatch for environments where a Mosaic kernel (or its compile)
    faults the TPU worker ("TPU worker process crashed ... kernel fault",
    observed twice during the r5 north-star refinement CG phase).  NOTE:
    operators built with a fused interface plan would run it in interpret
    mode under this flag — build with fuse_interface=False when using it.
    """
    if _os.environ.get("LANCZOS_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


# Flat-layout VMEM working-set budget (MB); env-tunable so on-chip perf
# experiments can sweep the slab height without editing code (taller slabs
# cut the 8-plane halo-block fetch fraction: tz=40 reads 1.4x of x at
# N=160, tz=80 reads 1.2x).
import os as _os

_FLAT_VMEM_MB = int(_os.environ.get("LANCZOS_FLAT_VMEM_MB", "48"))


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


def _layout(grid_shape, dtype):
    """Static layout decision: (flat, tz, halo_h, block_rest).

    Lane-alignment-driven: when nx is not a multiple of the 128-lane tile
    but the whole plane is, the flattened-plane layout avoids padded DMA
    tiles (~6x on the N=160 flagship, measured on v5e).  The flat layout is
    2D, so every block's last two dims must be (8k, 128k)-aligned: tz and
    the halo blocks become multiples of 8.
    """
    nz, ny, nx = grid_shape
    itemsize = jnp.dtype(dtype).itemsize
    flat = (nx % 128 != 0) and ((ny * nx) % 128 == 0) and nz % 8 == 0
    if flat:
        plane_bytes = ny * nx * itemsize
        cap = max(int((_FLAT_VMEM_MB * 2**20 / plane_bytes - 48) // 8), 8)
        tz = 8
        for cand in range(8, min(nz, cap) + 1, 8):
            if nz % cand == 0:
                tz = cand
        return True, tz, 8, (ny * nx,)
    return False, _pick_tz(nz, ny * nx, itemsize), 1, (ny, nx)


def pallas_vec_shape(grid_shape, dtype) -> Tuple[int, ...]:
    """The vector shape the kernel wants its operands in (see module doc)."""
    flat, _, _, block_rest = _layout(grid_shape, dtype)
    return (grid_shape[0], *block_rest)


# ---------------------------------------------------------------------------
# Kernel math on loaded arrays (shared by the shaped-ref and flat-ref paths)


def _math_3d(w_ref, body, top, bot, diag, offsets):
    """3D-layout tap accumulation.  body (tz, ny, nx); top/bot (1, ny, nx)."""
    slab = jnp.concatenate([top, body, bot], axis=0)
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

    if diag is not None:
        acc = acc + diag * body
    return acc


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
    Regular/Hamiltonian.py:116-128), with S_a = shift_{+1} + shift_{-1}
    along axis a, group by Sx and use [Sz, Sx] = 0 to apply the EXPENSIVE
    operator (Sx: misaligned lane rotates + a wrap-column fix on the flat
    plane; Sy is one plane-periodic aligned roll pair, Sz is free slab
    slices) exactly ONCE:

        y = w0 x + w1 Sy x + Sz(w1 x + w2 Sy x) + Sx C
        C = w1 x + w2 Sy x + Sz(w2 x + w3 Sy x)

    The kernel is VMEM-PASS-bound (round-3: ~24 slab-size VMEM passes ~
    100 us at N=160^3); this form materializes only body-sized
    z-neighbour sums (sz_*) instead of the earlier slab-sized D/U
    operands — 2 fewer slab materializations (round 4) — and 4 misaligned
    x-rolls instead of the two-branch form's 8.
    """
    tz = body.shape[0]
    p_plane = body.shape[1]

    def roll_y(a, dy):
        return pltpu.roll(a, shift=(-dy * nx) % p_plane, axis=1)

    sy = roll_y(slab, 1) + roll_y(slab, -1)  # Sy x on slab rows
    sy_body = sy[1 : tz + 1]
    sz_slab = slab[0:tz] + slab[2 : tz + 2]  # Sz x on body rows
    sz_sy = sy[0:tz] + sy[2 : tz + 2]  # Sz Sy x on body rows
    c = w1 * body + w2 * sy_body + w2 * sz_slab + w3 * sz_sy
    sxc = _roll_flat_x(c, 1, nx, col_x) + _roll_flat_x(c, -1, nx, col_x)
    return (
        w0 * body
        + w1 * sy_body
        + w1 * sz_slab
        + w2 * sz_sy
        + sxc
    )


def _math_flat(w_ref, body, top, bot, diag, offsets, ny, nx, ladder):
    """Flat-plane tap accumulation.  body (tz, P); top/bot (8, P) blocks —
    the needed halo plane sits at a fixed row because tz is a multiple of
    8: the top halo plane b*tz-1 is row 7 of the preceding 8-block, the
    bottom halo plane b*tz+tz is row 0 of the following one.

    Tap algebra on the flat plane P = ny*nx: the y-offset becomes an exact
    plane-modular roll (p + dy*nx wraps y periodically by construction);
    the x-offset is the same roll shifted by dx, which is wrong only in the
    single wrapping column (x + dx outside [0, nx)), fixed by one extra
    roll and a select on the output x-coordinate.
    """
    slab = jnp.concatenate([top[7:8], body, bot[0:1]], axis=0)
    tz = body.shape[0]
    p_plane = body.shape[1]
    col_x = jax.lax.broadcasted_iota(jnp.int32, (1, p_plane), 1) % nx

    if ladder is not None:
        k0, k1, k2, k3 = ladder
        acc = _graded_flat(
            slab, body, w_ref[k0], w_ref[k1], w_ref[k2], w_ref[k3], ny, nx,
            col_x,
        )
        if diag is not None:
            acc = acc + diag * body
        return acc

    groups = {}
    for k, (dz, dy, dx) in enumerate(offsets):
        groups.setdefault((dy, dx), []).append((dz, k))

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

    if diag is not None:
        acc = acc + diag * body
    return acc


# ---------------------------------------------------------------------------
# pallas_call builders


def _build_call(
    grid_shape: Tuple[int, int, int],
    offsets: Tuple[Tuple[int, int, int], ...],
    has_diag: bool,
    dtype,
    interpret: bool,
    ladder: Optional[Tuple[int, int, int, int]] = None,
    flat_io: bool = False,
):
    """Build the pallas_call.  ``flat_io=False``: operands/result carry the
    kernel's internal shape (nz, ...) — the fast path.  ``flat_io=True``:
    operands/result are flat (M,) vectors, reshaped to the internal shape
    inside the kernel (an in-VMEM relayout; see module doc)."""
    nz, ny, nx = grid_shape
    itemsize = jnp.dtype(dtype).itemsize
    flat, tz, halo_h, block_rest = _layout(grid_shape, dtype)
    nblocks = nz // tz
    rest = int(np.prod(block_rest))

    def run_math(w_ref, body, top, bot, diag):
        if flat:
            return _math_flat(
                w_ref, body, top, bot, diag, offsets, ny, nx, ladder
            )
        return _math_3d(w_ref, body, top, bot, diag, offsets)

    if flat_io:

        def kernel(*refs):
            if has_diag:
                w_ref, body_ref, top_ref, bot_ref, diag_ref, y_ref = refs
            else:
                w_ref, body_ref, top_ref, bot_ref, y_ref = refs
            body = body_ref[...].reshape((tz, *block_rest))
            top = top_ref[...].reshape((halo_h, *block_rest))
            bot = bot_ref[...].reshape((halo_h, *block_rest))
            diag = (
                diag_ref[...].reshape((tz, *block_rest)) if has_diag else None
            )
            y_ref[...] = run_math(w_ref, body, top, bot, diag).reshape(-1)

        body_spec = pl.BlockSpec(
            (tz * rest,), lambda b: (b,), memory_space=pltpu.VMEM
        )
        top_spec = pl.BlockSpec(
            (halo_h * rest,),
            lambda b: (((b * tz - halo_h) % nz) // halo_h,),
            memory_space=pltpu.VMEM,
        )
        bot_spec = pl.BlockSpec(
            (halo_h * rest,),
            lambda b: (((b * tz + tz) % nz) // halo_h,),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((nz * rest,), dtype)
        out_spec = body_spec
    else:

        def kernel(*refs):
            if has_diag:
                w_ref, body_ref, top_ref, bot_ref, diag_ref, y_ref = refs
            else:
                w_ref, body_ref, top_ref, bot_ref, y_ref = refs
            diag = diag_ref[...] if has_diag else None
            y_ref[...] = run_math(
                w_ref, body_ref[...], top_ref[...], bot_ref[...], diag
            )

        zeros = (0,) * len(block_rest)
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
        out_shape = jax.ShapeDtypeStruct((nz, *block_rest), dtype)
        out_spec = body_spec

    w_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [w_spec, body_spec, top_spec, bot_spec]
    if has_diag:
        in_specs.append(body_spec)

    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
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
    """SpMV dispatch: vec_shape-shaped x runs the zero-relayout path; flat
    (M,) x runs through 1D blocks with the in-kernel reshape."""
    shaped = x.ndim > 1
    call, shape = _build_call(
        grid_shape, offsets, diag is not None, x.dtype, interpret, ladder,
        flat_io=not shaped,
    )
    if shaped:
        if x.shape != shape:
            x = x.reshape(shape)
        d = None if diag is None else diag.reshape(shape)
        return call(weights, x, x, x, d) if d is not None else call(
            weights, x, x, x
        )
    d = None if diag is None else diag.reshape(-1)
    if d is not None:
        return call(weights, x, x, x, d)
    return call(weights, x, x, x)


@functools.partial(
    jax.jit,
    static_argnames=("grid_shape", "offsets", "interpret", "ladder"),
)
def _spmm_impl(X, diag, weights, grid_shape, offsets, interpret, ladder=None):
    call, shape = _build_call(
        grid_shape, offsets, diag is not None, X.dtype, interpret, ladder,
        flat_io=True,
    )
    diag_f = None if diag is None else diag.reshape(-1)

    def one(xcol):
        if diag_f is not None:
            return call(weights, xcol, xcol, xcol, diag_f)
        return call(weights, xcol, xcol, xcol)

    # Sequential per-column kernel calls in one XLA program: each call is
    # HBM-bandwidth-bound on its own, so there is nothing to gain from
    # batching them.
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
    """y = op @ x via the Pallas slab kernel.  ``op`` is a StencilOperator.

    ``x`` may be flat (M,) or shaped ``op.vec_shape`` (faster: skips the
    layout conversion); y comes back in the same shape as x.
    """
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
