"""Fused Pallas kernel for the CompositeV2 interface classes.

The v2 interface application is op-DISPATCH-bound at the XLA level: each of
the ~27 taps of each signature class is its own strided-slice + multiply +
add HLO (~0.6 us of dispatch on v5e regardless of data size — ROADMAP
round-3 measurement: 548 us at P = 139k where the data itself is face-sized).
This module moves ALL tap arithmetic AND the per-class output placement into
a handful of Pallas kernel invocations:

* Build time (plan_interface_kernel): every tap is re-indexed onto a small
  set of INPUT OPERANDS — parity/stride phase-splits of the per-level region
  arrays (`x3[l][p0::s0, p1::s1, p2::s2]`), so stride-2 cross-level reads
  become dense in-kernel slices (the lane-dim stride-2 read Mosaic cannot
  do is done ONCE per matvec at the XLA level).  The class OUTPUTS are
  phase-split the same way: a class writing with interior dilation step
  s = interior+1 at out_start targets the dense window
  ``y3[rl][p::s][out_start//s : ... + acc_shape]`` of the output phase
  operand keyed by (row_level, s, out_start % s).  Tap weights are baked in
  as compile-time constants (they are frozen with the operator).

* Run time (apply_fused_interface): one XLA slice per input operand and one
  per output phase, then chunked pallas_calls (<= _CLASSES_PER_CALL class
  outputs each, whole arrays VMEM-resident, no grid).  Each call takes the
  output phases its classes touch as ALIASED in-out operands and
  ACCUMULATES every class's weighted tap sum into its dense output window
  in-kernel — the former per-class interior-dilated pad + dynamic add
  (2 XLA HLOs per class, the r4 residual cost) is gone; what remains at
  the XLA level is O(#operands + #phases) ops, independent of class count.

The plan is a hashable static object so it can ride a
``jax.tree_util.register_dataclass`` STATIC field through jit flattening
(a non-pytree attribute would silently vanish inside traced solver code).

Classes whose tap strides or output dilation steps are outside {1, 2} fall
back to the XLA path (none occur on 2:1-graded lattices).  When the planned
VMEM-resident operand volume exceeds the budget (env
``LANCZOS_IFACE_VMEM_MB``, default 100 — the gridless whole-array
pallas_call otherwise fails to compile at large lattices, advisor r4), the
plan routes EVERYTHING to the XLA fallback instead.  Numerical identity
with the XLA path is pinned in tests/test_composite2.py (interpret mode on
CPU).
"""

from __future__ import annotations

import dataclasses
import functools
import os
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
        input slices of the level arrays, computed per matvec at the XLA
        level.
    out_operands: ((row_level, (s0,s1,s2), (p0,p1,p2), shape), ...) —
        phase-split views of the per-level OUTPUT arrays; kernels
        accumulate into dense windows of these.
    classes:  ((out_idx, out_off, acc_shape, taps), ...) with taps
        ((operand_idx, start3, weight), ...); the input slice SHAPE is the
        class's acc_shape for every tap, and the class accumulates into
        ``out_operands[out_idx]`` at ``out_off : out_off + acc_shape``.
    fallback: indices into the operator's grid_meta for classes the kernel
        does not cover (served by the XLA path).
    """

    operands: Tuple
    out_operands: Tuple
    classes: Tuple
    fallback: Tuple


def plan_interface_kernel(grid_meta, level_meta, grid_w_host) -> InterfacePlan:
    """Build the fused plan from CompositeV2 static geometry + host weights."""
    op_index = {}
    operands = []
    out_index = {}
    out_operands = []
    classes = []
    fallback = []
    exts = {i: ext for i, (a, ext, st) in enumerate(level_meta)}
    for ci, (row_level, out_start, interior, acc_shape, taps) in enumerate(
        grid_meta
    ):
        w = np.asarray(grid_w_host[ci], np.float64)
        out_step = tuple(int(i) + 1 for i in interior)
        if any(s not in (1, 2) for s in out_step):
            fallback.append(ci)
            continue
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
        if not ok:
            fallback.append(ci)
            continue
        out_par = tuple(int(out_start[ax] % out_step[ax]) for ax in range(3))
        okey = (row_level, out_step, out_par)
        if okey not in out_index:
            ext = exts[row_level]
            shape = tuple(
                (ext[ax] - out_par[ax] + out_step[ax] - 1) // out_step[ax]
                for ax in range(3)
            )
            out_index[okey] = len(out_operands)
            out_operands.append((row_level, out_step, out_par, shape))
        out_off = tuple(int(out_start[ax] // out_step[ax]) for ax in range(3))
        oshape = out_operands[out_index[okey]][3]
        assert all(
            out_off[ax] + acc_shape[ax] <= oshape[ax] for ax in range(3)
        ), (out_off, acc_shape, oshape)
        classes.append((out_index[okey], out_off, tuple(acc_shape), tuple(ktaps)))

    # VMEM budget check (advisor r4): the gridless whole-array pallas_call
    # holds every operand VMEM-resident; past the budget it cannot compile
    # — route everything to the XLA path instead (fp32 production sizing).
    budget = float(os.environ.get("LANCZOS_IFACE_VMEM_MB", "100")) * 2**20
    vol = sum(int(np.prod(o[3])) for o in operands) + sum(
        int(np.prod(o[3])) for o in out_operands
    )
    if classes and vol * 4 > budget:
        return InterfacePlan(
            operands=(),
            out_operands=(),
            classes=(),
            fallback=tuple(range(len(grid_meta))),
        )
    return InterfacePlan(
        operands=tuple(operands),
        out_operands=tuple(out_operands),
        classes=tuple(classes),
        fallback=tuple(fallback),
    )


@functools.lru_cache(maxsize=64)
def _build_calls(plan: InterfacePlan, dtype_name: str, interpret: bool):
    """Chunked pallas_calls for the plan (memoized by plan identity).

    Returns [(call, out_ids), ...]: ``out_ids`` are the indices into
    plan.out_operands the call consumes (aliased in-out) in order.
    """
    dtype = jnp.dtype(dtype_name)
    n_ops = len(plan.operands)
    calls = []
    for lo in range(0, len(plan.classes), _CLASSES_PER_CALL):
        chunk = plan.classes[lo : lo + _CLASSES_PER_CALL]
        out_ids = sorted({c[0] for c in chunk})
        out_pos = {oid: i for i, oid in enumerate(out_ids)}

        def kernel(*refs, _chunk=chunk, _out_pos=out_pos):
            in_refs = refs[:n_ops]
            out_refs = refs[n_ops + len(_out_pos):]
            for (oid, off, acc_shape, taps) in _chunk:
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
                o = out_refs[_out_pos[oid]]
                window = (
                    slice(off[0], off[0] + az),
                    slice(off[1], off[1] + ay),
                    slice(off[2], off[2] + ax),
                )
                o[window] = o[window] + acc

        out_shapes = [
            jax.ShapeDtypeStruct(plan.out_operands[oid][3], dtype)
            for oid in out_ids
        ]
        call = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM)
                for _ in range(n_ops + len(out_ids))
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_ids
            ],
            out_shape=out_shapes,
            input_output_aliases={n_ops + i: i for i in range(len(out_ids))},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 2**20
            ),
            interpret=interpret,
        )
        calls.append((call, out_ids))
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
    # Output phases are pure CONTRIBUTION accumulators: they start at zero,
    # thread through the chunked calls (aliased in-out), and are scatter-
    # ADDED into y3 once at the end.  (Extracting the current y3 values
    # instead would be wrong: a level can carry overlapping phases — e.g. a
    # dense step-1 phase and a dilated step-2 phase — whose write-backs
    # would each clobber the other's additions.)
    phases = {}

    def phase_get(oid):
        if oid not in phases:
            shape = plan.out_operands[oid][3]
            phases[oid] = jnp.zeros(shape, dtype)
        return phases[oid]

    for call, out_ids in _build_calls(plan, dtype.name, interpret):
        outs = call(*ops, *(phase_get(oid) for oid in out_ids))
        for oid, r in zip(out_ids, outs):
            phases[oid] = r
    for oid, v in phases.items():
        rl, step, par, shape = plan.out_operands[oid]
        if step == (1, 1, 1):
            y3[rl] = y3[rl] + v
        else:
            y3[rl] = (
                y3[rl]
                .at[par[0] :: step[0], par[1] :: step[1], par[2] :: step[2]]
                .add(v)
            )
    return y3
