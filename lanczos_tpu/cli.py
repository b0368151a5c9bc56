"""Command-line interface.

The reference's only CLI is MatrixWrite.py (argparse, flags -d -L -N -p,
MatrixWrite.py:66-76); its solves are driver scripts with hard-coded
constants (3Ddeuteron.py:63-71).  This CLI covers both as subcommands:

  python -m lanczos_tpu.cli solve-regular   -N 64 -L 25 -n 150 -k 8
  python -m lanczos_tpu.cli solve-irregular -N 60 -L 25 --box-depth 3 -n 250 -k 5
  python -m lanczos_tpu.cli export-matrix   -d 3 -L 25 -N 30 -p Deuteron
  python -m lanczos_tpu.cli bench
"""

from __future__ import annotations

import argparse
import sys
import time


def _configure_platform(args):
    import jax

    if args.platform == "cpu" or (
        args.platform == "auto" and args.dtype == "float64"
    ):
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    return jax


def _add_common(p):
    p.add_argument("-L", type=float, default=25.0, help="box length [fm]")
    p.add_argument("-n", type=int, default=150, help="Krylov iterations")
    p.add_argument("-k", type=int, default=8, help="eigenpairs to report")
    p.add_argument("--seed", type=int, default=99)
    p.add_argument(
        "--dtype", default="float32", choices=["float32", "float64"]
    )
    p.add_argument(
        "--platform", default="auto", choices=["auto", "cpu", "tpu"],
        help="auto = cpu for float64, default device otherwise",
    )
    p.add_argument("--out", default=None, help="prefix for .npy eigenpair dump")


def cmd_solve_regular(args):
    jax = _configure_platform(args)
    import numpy as np

    import lanczos_tpu as lt

    t0 = time.time()
    h = lt.build_regular_hamiltonian(
        args.N, args.L, lt.deuteron_potential_3d,
        stencil=args.stencil, dtype=args.dtype,
    )
    if args.restart:
        res = lt.eigsh_restarted(
            h, k=args.k, max_basis=args.max_basis, tol=args.tol,
            seed=args.seed, dtype=args.dtype,
        )
    elif args.block_size > 1:
        res = lt.eigsh_block_restarted(
            h, k=args.k, block_size=args.block_size, tol=args.tol,
            seed=args.seed, dtype=args.dtype,
        )
    else:
        res = lt.eigsh(
            h, k=args.k, n=args.n, which="SA", seed=args.seed,
            reorth=args.reorth, dtype=args.dtype,
        )
    jax.block_until_ready(res.eigenvalues)
    print(f"# regular {args.N}^3 grid, {args.stencil}-pt stencil, "
          f"{time.time()-t0:.1f}s on {jax.default_backend()}")
    print(res.summary(print_nr=args.k))
    if args.out:
        from lanczos_tpu.utils.io import save_eigpairs

        save_eigpairs(args.out, res.eigenvalues, res.eigenvectors)
        print(f"# saved {args.out}_eigvals.npy / _eigvecs.npy")


def cmd_solve_irregular(args):
    jax = _configure_platform(args)
    import numpy as np

    import lanczos_tpu as lt

    t0 = time.time()
    lat = lt.build_lattice(
        args.N, args.L, args.box_depth,
        potential=lt.deuteron_potential_3d,
        overwrite_spacing=args.overwrite_spacing,
    )
    print(f"# lattice: {lat.num_points} points "
          f"(fine grid {args.N}^3 = {args.N**3}), spacings "
          f"{sorted(set(lat.spacings.tolist()))}")
    if args.symmetrize == "none":
        if args.solver == "krylov-schur":
            # The robust fp32 path (solver/arnoldi.py): Krylov-Schur on the
            # raw non-symmetric operator, verified against true residuals.
            # On TPU, run it on the composite operator (stencil-speed SpMV);
            # its vectors live in level-major order — permute back for
            # saving.
            perm = None
            if jax.default_backend() != "cpu":
                from lanczos_tpu.models.irr_hamiltonian import (
                    assemble_irregular_hamiltonian_composite,
                )

                op, perm = assemble_irregular_hamiltonian_composite(
                    lat, lt.deuteron_potential_3d, dtype=args.dtype
                )
            else:
                op = lt.assemble_irregular_hamiltonian(
                    lat, lt.deuteron_potential_3d, symmetrize=None,
                    dtype=args.dtype,
                )
            res = lt.eigs_nonsym(
                op, k=args.k, max_basis=args.n, tol=args.tol,
                seed=args.seed, dtype=args.dtype,
                compensated=args.compensated, verbose=args.verbose,
            )
            jax.block_until_ready(res.eigenvalues)
            print(f"# Krylov-Schur (Arnoldi), basis {args.n}, "
                  f"{time.time()-t0:.1f}s on {jax.default_backend()}")
            print(res.summary(print_nr=args.k))
            if args.out:
                from lanczos_tpu.utils.io import save_eigpairs

                vecs = np.asarray(res.eigenvectors)
                if perm is not None:
                    back = np.empty_like(vecs)
                    back[perm] = vecs
                    vecs = back
                save_eigpairs(args.out, res.eigenvalues, vecs)
        else:
            # Two-sided biorthogonal path (reference IrrLanczos.py:77-187).
            # On TPU both directions run on the fast v2 composite format:
            # H^T is materialized at assembly (build_transpose, r5).
            perm2 = None
            if jax.default_backend() != "cpu":
                from lanczos_tpu.models.irr_hamiltonian import (
                    assemble_irregular_hamiltonian_composite2,
                )

                h, perm2 = assemble_irregular_hamiltonian_composite2(
                    lat, lt.deuteron_potential_3d, dtype=args.dtype,
                    build_transpose=True,
                )
            else:
                h = lt.assemble_irregular_hamiltonian(
                    lat, lt.deuteron_potential_3d, symmetrize=None,
                    dtype=args.dtype,
                )
            fac = lt.two_sided_lanczos(
                h, args.n, seed=args.seed, op_transpose=h.transpose(),
                dtype=args.dtype, compensated=args.compensated,
            )
            res = lt.two_sided_eigs(fac, k=args.k, op=h, residual_tol=args.tol)
            print(f"# two-sided Lanczos, breakdown at "
                  f"{int(fac.breakdown_iter)}/{args.n}, "
                  f"max biorth drift {float(np.max(np.asarray(fac.biorth_drift))):.2e}, "
                  f"{time.time()-t0:.1f}s")
            print(res.summary(print_nr=args.k))
            if args.out:
                from lanczos_tpu.utils.io import save_eigpairs

                vecs = np.asarray(res.eigenvectors)
                if perm2 is not None:
                    vecs = vecs[perm2, :]  # region layout -> lattice order
                save_eigpairs(args.out, res.eigenvalues, vecs)
    else:
        h = lt.assemble_irregular_hamiltonian(
            lat, lt.deuteron_potential_3d, symmetrize=args.symmetrize,
            dtype=args.dtype,
        )
        res = lt.eigsh(
            h, k=args.k, n=args.n, which="SA", seed=args.seed,
            dtype=args.dtype,
        )
        print(f"# symmetrize={args.symmetrize}, {time.time()-t0:.1f}s "
              "(NOTE: symmetrized irregular operators carry spurious "
              "interface modes; prefer --symmetrize none)")
        print(res.summary(print_nr=args.k))
        if args.out:
            from lanczos_tpu.utils.io import save_eigpairs

            save_eigpairs(args.out, res.eigenvalues, res.eigenvectors)


def cmd_export_matrix(args):
    # MatrixWrite.py parity: -d -L -N -p, overwrite_spacing lattice,
    # T_factor doubled (MatrixWrite.py:30 — the *2 is the Laplacian
    # normalization our weights already carry, so NOT doubled here).
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import lanczos_tpu as lt
    from lanczos_tpu.utils.io import export_mathematica

    if args.p != "Deuteron":
        raise SystemExit(f"unsupported potential {args.p!r}")
    if args.d != 3:
        raise SystemExit("only 3 dimensions supported")
    lat = lt.build_lattice(
        args.N, args.L, 3, overwrite_spacing=True
    )
    h = lt.assemble_irregular_hamiltonian(
        lat, lt.deuteron_potential_3d, dtype="float64"
    )
    out = args.out or f"matrix_d={args.d}_N={args.N}_L={args.L:g}_p={args.p}.dat"
    export_mathematica(
        out, h, ndim=args.d, length=args.L, potential_name=args.p
    )
    print(f"# wrote {out} ({lat.num_points} points)")


def cmd_bench(args):
    from lanczos_tpu.utils.bench_impl import main as bench_main

    bench_main()


def main(argv=None):
    parser = argparse.ArgumentParser(prog="lanczos_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("solve-regular", help="3D deuteron on a regular grid")
    p.add_argument("-N", type=int, default=64, help="grid points per dim")
    p.add_argument("--stencil", default="27", choices=["7", "27"])
    p.add_argument("--reorth", default="full",
                   choices=["full", "selective", "periodic", "none"])
    p.add_argument("--restart", action="store_true",
                   help="memory-bounded thick-restart solver")
    p.add_argument("--max-basis", type=int, default=0,
                   help="restart basis bound (default 2k+30)")
    p.add_argument("--block-size", type=int, default=1,
                   help=">1: restarted BLOCK solver (degenerate multiplets)")
    p.add_argument("--tol", type=float, default=1e-6,
                   help="restart/block convergence tolerance")
    _add_common(p)
    p.set_defaults(fn=cmd_solve_regular)

    p = sub.add_parser("solve-irregular",
                       help="3D deuteron on a multi-resolution lattice")
    p.add_argument("-N", type=int, default=60, help="fine grid points per dim")
    p.add_argument("--box-depth", type=int, default=3)
    p.add_argument("--overwrite-spacing", action="store_true",
                   help="debug spacings: 2 everywhere, 1 in center box")
    p.add_argument("--symmetrize", default="none",
                   choices=["none", "average", "volume", "normal"])
    p.add_argument("--solver", default="krylov-schur",
                   choices=["krylov-schur", "two-sided"],
                   help="krylov-schur (robust, fp32-safe) or the "
                        "reference-parity two-sided biorthogonal Lanczos")
    p.add_argument("--tol", type=float, default=1e-4,
                   help="true relative residual acceptance threshold")
    p.add_argument("--compensated", action="store_true",
                   help="error-free-transform scalar reductions")
    p.add_argument("--verbose", action="store_true")
    _add_common(p)
    p.set_defaults(fn=cmd_solve_irregular)

    p = sub.add_parser("export-matrix",
                       help="export irregular H as Mathematica .dat "
                            "(MatrixWrite parity)")
    p.add_argument("-d", type=int, default=3)
    p.add_argument("-L", type=float, default=25.0)
    p.add_argument("-N", type=int, default=30)
    p.add_argument("-p", type=str, default="Deuteron")
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_export_matrix)

    p = sub.add_parser("bench", help="flagship SpMV benchmark (JSON line)")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
