"""Micro-benchmark of the CompositeV2 SpMV components on the real chip.

Splits the matvec cost into (a) per-level interior stencils, (b) the
strided interface classes + ELL tail, (c) the full operator, using the same
chain-differencing methodology as utils/bench_impl.py (block_until_ready is
unreliable on the tunneled runtime).  Drives the fused-interface-kernel
work (ROADMAP round-4 item 1: target <= 200 us at P = 139k).

Usage: python scripts/bench_interface.py [--n-fine 120] [--min-grid-rows 16]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-fine", type=int, default=120)
    ap.add_argument("--box-depth", type=int, default=3)
    ap.add_argument("--min-grid-rows", type=int, default=16)
    ap.add_argument("--fuse", action="store_true",
                    help="use the fused Pallas interface kernel")
    ap.add_argument("--lo", type=int, default=5)
    ap.add_argument("--hi", type=int, default=205)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import lanczos_tpu as lt
    from lanczos_tpu.models.irr_hamiltonian import (
        assemble_irregular_hamiltonian_composite2,
    )
    from lanczos_tpu.ops.composite2 import interface_apply_full
    from lanczos_tpu.utils.bench_impl import _chain_time_per_iter

    lat = lt.build_lattice(
        args.n_fine, 25.0, args.box_depth, potential=lt.deuteron_potential_3d
    )
    comp, idx_map = assemble_irregular_hamiltonian_composite2(
        lat, lt.deuteron_potential_3d, dtype="float32",
        min_grid_rows=args.min_grid_rows,
    )
    if args.fuse:
        from lanczos_tpu.ops.interface_kernel import plan_interface_kernel
        import dataclasses as _dc

        plan = plan_interface_kernel(
            comp.grid_meta, comp.level_meta,
            [np.asarray(w, np.float64) for w in comp.grid_w],
        )
        comp = _dc.replace(comp, fused_plan=plan)
        print(f"fused: {len(plan.classes)} classes in-kernel, "
              f"{len(plan.fallback)} fallback, "
              f"{len(plan.operands)} operands", flush=True)
    m = comp.shape[0]
    p = lat.num_points
    n_classes = len(comp.grid_meta)
    n_taps = sum(len(meta[4]) for meta in comp.grid_meta)
    n_ell_rows = sum(int(b[0].shape[0]) for b in comp.ifc_buckets)
    print(f"P={p} M={m} classes={n_classes} taps={n_taps} "
          f"ell_tail_rows={n_ell_rows} backend={jax.default_backend()}",
          flush=True)

    def full_chain(iters):
        @jax.jit
        def chain(x):
            def body(_, v):
                return comp.matvec(v) * jnp.asarray(1e-2, v.dtype)

            return jax.lax.fori_loop(0, iters, body, x)

        return chain

    def stencil_chain(iters):
        @jax.jit
        def chain(x):
            def body(_, v):
                y = []
                for (a, gshape, start), op in zip(
                    comp.level_meta, comp.level_ops
                ):
                    vol = gshape[0] * gshape[1] * gshape[2]
                    xg = jax.lax.slice(v, (start,), (start + vol,)).reshape(
                        gshape
                    )
                    y.append(op.matvec(xg).reshape(-1))
                return jnp.concatenate(y) * jnp.asarray(1e-2, v.dtype)

            return jax.lax.fori_loop(0, iters, body, x)

        return chain

    def interface_chain(iters):
        @jax.jit
        def chain(x):
            def body(_, v):
                x3 = []
                for (a, gshape, start) in comp.level_meta:
                    vol = gshape[0] * gshape[1] * gshape[2]
                    x3.append(
                        jax.lax.slice(v, (start,), (start + vol,)).reshape(
                            gshape
                        )
                    )
                if comp.fused_plan is not None:
                    from lanczos_tpu.ops.interface_kernel import (
                        apply_fused_interface,
                    )
                    from lanczos_tpu.ops.pallas_kernels import pallas_supported

                    y3 = [
                        jnp.zeros(gshape, v.dtype)
                        for (a, gshape, st) in comp.level_meta
                    ]
                    y3 = apply_fused_interface(
                        comp.fused_plan, x3, y3,
                        interpret=not pallas_supported(),
                    )
                    y = jnp.concatenate([t.reshape(-1) for t in y3])
                    fb = comp.fused_plan.fallback
                    if fb or comp.ifc_buckets:
                        y = y + interface_apply_full(
                            x3, v,
                            tuple(comp.grid_meta[i] for i in fb),
                            tuple(comp.grid_w[i] for i in fb),
                            comp.level_meta, comp.ifc_buckets,
                        )
                else:
                    y = interface_apply_full(
                        x3, v, comp.grid_meta, comp.grid_w, comp.level_meta,
                        comp.ifc_buckets,
                    )
                return v * jnp.asarray(1e-2, v.dtype) + y * jnp.asarray(
                    1e-6, v.dtype
                )

            return jax.lax.fori_loop(0, iters, body, x)

        return chain

    x = jnp.ones((m,), dtype=jnp.float32) / np.sqrt(m)
    out = {"P": p, "M": m, "classes": n_classes, "taps": n_taps}
    for name, mk in (
        ("full", full_chain),
        ("stencil", stencil_chain),
        ("interface", interface_chain),
    ):
        t = _chain_time_per_iter(mk, x, lo=args.lo, hi=args.hi, repeats=5)
        out[f"{name}_us"] = round(t * 1e6, 1)
        print(f"{name}: {t * 1e6:.1f} us", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
