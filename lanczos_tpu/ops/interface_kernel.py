"""Fused Pallas kernel for the CompositeV2 interface classes.

The v2 interface application is op-DISPATCH-bound at the XLA level: each of
the ~27 taps of each signature class is its own strided-slice + multiply +
add HLO (~0.6 us of dispatch on v5e regardless of data size — ROADMAP
round-3 measurement: 548 us at P = 139k where the data itself is face-sized).
This module moves ALL tap arithmetic into a handful of Pallas kernel
invocations:

* Build time (plan_interface_kernel): every tap is re-indexed onto a small
  set of OPERANDS — parity/stride phase-splits of the per-level region
  arrays (`x3[l][p0::s0, p1::s1, p2::s2]`), so stride-2 cross-level reads
  become dense in-kernel slices (the lane-dim stride-2 read Mosaic cannot
  do is done ONCE per matvec at the XLA level).  Tap weights are baked in
  as compile-time constants (they are frozen with the operator).

* Run time (apply_fused_interface): one XLA slice per operand, then
  chunked pallas_calls (<= _CLASSES_PER_CALL class outputs each, whole
  arrays VMEM-resident, no grid) computing every class's accumulated tap
  sum in-kernel; the per-class interior-dilated placement into the output
  regions stays at the XLA level (2 HLOs per class).

The plan is a hashable static object so it can ride a
``jax.tree_util.register_dataclass`` STATIC field through jit flattening
(a non-pytree attribute would silently vanish inside traced solver code).

Classes whose taps have strides outside {1, 2} fall back to the XLA path
(none occur on 2:1-graded lattices).  Numerical identity with the XLA path
is pinned in tests/test_composite2.py (interpret mode on CPU).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["InterfacePlan", "plan_interface_kernel", "apply_fused_interface"]

_CLASSES_PER_CALL = 48


@dataclasses.dataclass(frozen=True)
class InterfacePlan:
    """Hashable fused-interface plan (static pytree field).

    operands: ((level, (s0,s1,s2), (p0,p1,p2), shape), ...) — phase-split
        slices of the level arrays, computed per matvec at the XLA level.
    classes:  ((row_level, out_start, interior, acc_shape, taps), ...) with
        taps ((operand_idx, start3, weight), ...); the slice SHAPE is the
        class's acc_shape for every tap.
    fallback: indices into the operator's grid_meta for classes the kernel
        does not cover (served by the XLA path).
    """

    operands: Tuple
    classes: Tuple
    fallback: Tuple


def plan_interface_kernel(grid_meta, level_meta, grid_w_host) -> InterfacePlan:
    """Build the fused plan from CompositeV2 static geometry + host weights."""
    op_index = {}
    operands = []
    classes = []
    fallback = []
    exts = {i: ext for i, (a, ext, st) in enumerate(level_meta)}
    for ci, (row_level, out_start, interior, acc_shape, taps) in enumerate(
        grid_meta
    ):
        w = np.asarray(grid_w_host[ci], np.float64)
        ktaps = []
        ok = True
        for t, (src_level, start, limit, stride) in enumerate(taps):
            if any(s not in (1, 2) for s in stride):
                ok = False
                break
            par = tuple(int(start[ax] % stride[ax]) for ax in range(3))
            key = (src_level, tuple(stride), par)
            if key not in op_index:
                ext = exts[src_level]
                shape = tuple(
                    (ext[ax] - par[ax] + stride[ax] - 1) // stride[ax]
                    for ax in range(3)
                )
                op_index[key] = len(operands)
                operands.append((src_level, tuple(stride), par, shape))
            st_op = tuple(
                (start[ax] - par[ax]) // stride[ax] for ax in range(3)
            )
            ktaps.append((op_index[key], st_op, float(w[t])))
        if ok:
            classes.append(
                (row_level, out_start, interior, acc_shape, tuple(ktaps))
            )
        else:
            fallback.append(ci)
    return InterfacePlan(
        operands=tuple(operands),
        classes=tuple(classes),
        fallback=tuple(fallback),
    )


@functools.lru_cache(maxsize=64)
def _build_calls(plan: InterfacePlan, dtype_name: str, interpret: bool):
    """Chunked pallas_calls for the plan (memoized by plan identity)."""
    dtype = jnp.dtype(dtype_name)
    calls = []
    n_ops = len(plan.operands)
    for lo in range(0, len(plan.classes), _CLASSES_PER_CALL):
        chunk = plan.classes[lo : lo + _CLASSES_PER_CALL]

        def kernel(*refs, _chunk=chunk):
            in_refs = refs[:n_ops]
            out_refs = refs[n_ops:]
            for ci, (rl, o_start, interior, acc_shape, taps) in enumerate(
                _chunk
            ):
                az, ay, ax = acc_shape
                acc = None
                for (oi, st, w) in taps:
                    sl = in_refs[oi][
                        st[0] : st[0] + az,
                        st[1] : st[1] + ay,
                        st[2] : st[2] + ax,
                    ]
                    term = dtype.type(w) * sl
                    acc = term if acc is None else acc + term
                out_refs[ci][...] = acc

        out_shapes = [
            jax.ShapeDtypeStruct(c[3], dtype) for c in chunk
        ]
        call = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_ops)
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in chunk
            ],
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 2**20
            ),
            interpret=interpret,
        )
        calls.append((call, chunk))
    return calls


def apply_fused_interface(plan: InterfacePlan, x3, y3, interpret: bool):
    """Add every planned class's contribution into the per-level y3 arrays.

    x3: per-level full region arrays; y3: per-level output arrays (updated
    functionally and returned).  Fallback classes are NOT handled here.
    """
    dtype = x3[0].dtype
    ops = []
    for (src_level, stride, par, shape) in plan.operands:
        sl = x3[src_level][
            par[0] :: stride[0], par[1] :: stride[1], par[2] :: stride[2]
        ]
        ops.append(sl)
    for call, chunk in _build_calls(plan, dtype.name, interpret):
        accs = call(*ops)
        for acc, (row_level, out_start, interior, acc_shape, taps) in zip(
            accs, chunk
        ):
            padded = jax.lax.pad(
                acc, jnp.zeros((), dtype), [(0, 0, i) for i in interior]
            )
            z0, y0, x0 = out_start
            pz, py, px = padded.shape
            y3[row_level] = (
                y3[row_level]
                .at[z0 : z0 + pz, y0 : y0 + py, x0 : x0 + px]
                .add(padded)
            )
    return y3
