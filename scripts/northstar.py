"""North-star run (BASELINE.md): k=100 eigenpairs of a multi-million-node
irregular graph Laplacian on one TPU chip, vs scipy eigsh on the host.

The graph is the irregular multi-resolution lattice's neighbor graph
(reference geometry: /root/reference/Python/Irregular/IrrGrid.py), made
undirected by edge reciprocity (keep (i,j) iff both endpoints list each
other), so L = D - A is exactly symmetric and the compensated thick-restart
symmetric solver applies.  The operator runs as the composite multi-level
format (ops/composite.py) on the chip in fp32 with compensated reductions;
a +1 spectral shift keeps the relative-residual convergence criterion
well-defined at the lambda=0 end (subtracted before reporting).

Writes one JSON artifact (NORTHSTAR_r{round}.json) with build/solve
timings, residual statistics (TRUE fp64 residuals computed on the host
matrix), and the scipy eigsh comparison.

Usage: python scripts/northstar.py [--n-fine 288] [--k 100] [--tol 1e-8]
       [--scipy-timeout 900] [--out NORTHSTAR_r02.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_graph_laplacian_rows(n_fine: int, box_depth: int = 3):
    """Lattice -> symmetric graph-Laplacian rows (nbrs, rels, weights, deg)."""
    from lanczos_tpu.models.lattice import build_lattice, find_neighbors

    nb = box_depth**3
    sp = np.full(nb, 2, dtype=np.int64)
    sp[nb // 2] = 1  # the reference's overwrite_spacing debug lattice shape
    t0 = time.time()
    lat = build_lattice(n_fine, 25.0, box_depth, spacings=sp, ndim=3)
    nbrs, rels = find_neighbors(lat, 1)
    t_nbrs = time.time() - t0

    # Edge reciprocity: keep (i -> j) only if (j -> i) exists.  Vectorized
    # membership test on sorted (min, max, i<j?) edge keys.
    t0 = time.time()
    p, k = nbrs.shape
    rows = np.repeat(np.arange(p, dtype=np.int64), k)
    cols = nbrs.reshape(-1)
    valid = cols >= 0
    rows_v, cols_v = rows[valid], cols[valid]
    fwd = rows_v * p + cols_v
    bwd = np.sort(cols_v * p + rows_v)
    pos = np.searchsorted(bwd, fwd)
    pos = np.minimum(pos, len(bwd) - 1)
    recip = bwd[pos] == fwd
    keep = np.zeros(rows.shape[0], dtype=bool)
    keep[valid] = recip
    keep = keep.reshape(p, k)
    nbrs = np.where(keep, nbrs, -1)
    weights = np.where(keep, -1.0, 0.0)
    deg = keep.sum(axis=1).astype(np.float64)
    t_recip = time.time() - t0
    return lat, nbrs, rels, weights, deg, {"t_neighbors_s": t_nbrs,
                                           "t_reciprocity_s": t_recip}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-fine", type=int, default=288)
    ap.add_argument("--box-depth", type=int, default=3)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--max-cycles", type=int, default=60)
    ap.add_argument("--scipy-timeout", type=float, default=900.0)
    ap.add_argument("--skip-scipy", action="store_true")
    ap.add_argument("--out", default="NORTHSTAR_r02.json")
    args = ap.parse_args()

    import jax

    from lanczos_tpu.ops.composite import build_composite
    from lanczos_tpu.solver.restart import eigsh_restarted

    if os.environ.get("NORTHSTAR_CPU"):
        jax.config.update("jax_platforms", "cpu")

    # NOTE: jax.default_backend() (first backend touch — on this machine a
    # TPU-tunnel grant that can take minutes when stale) is deferred until
    # after the host-side graph build below.
    info = {
        "problem": "irregular lattice graph Laplacian, k smallest",
        "n_fine": args.n_fine,
        "box_depth": args.box_depth,
        "k": args.k,
        "tol": args.tol,
        "dtype": "float32",
        "compensated": True,
    }
    print(f"[northstar] building lattice N={args.n_fine} ...", flush=True)
    lat, nbrs, rels, weights, deg, times = build_graph_laplacian_rows(
        args.n_fine, args.box_depth
    )
    p = lat.num_points
    nnz = int((nbrs >= 0).sum() + p)
    info.update(times, num_points=p, nnz=nnz)
    print(f"[northstar] P={p} nnz={nnz} "
          f"(neighbors {times['t_neighbors_s']:.1f}s)", flush=True)

    info["backend"] = jax.default_backend()
    shift = 1.0
    t0 = time.time()
    comp, perm = build_composite(
        lat, nbrs, rels, weights, deg + shift, scale=1.0, dtype=np.float32,
        interior_weights=lambda a: np.full(26, -1.0),
    )
    info["t_build_composite_s"] = time.time() - t0
    print(f"[northstar] composite built in {info['t_build_composite_s']:.1f}s",
          flush=True)

    t0 = time.time()
    res = eigsh_restarted(
        comp,
        k=args.k,
        tol=args.tol,
        which="SA",
        dtype="float32",
        compensated=True,
        max_cycles=args.max_cycles,
        verbose=True,
    )
    vals32 = np.asarray(res.eigenvalues, dtype=np.float64)
    X = np.asarray(res.eigenvectors, dtype=np.float64)
    info["t_solve_s"] = time.time() - t0
    info["solver_residual_max"] = float(np.max(np.asarray(res.residuals)))
    print(f"[northstar] solve {info['t_solve_s']:.1f}s "
          f"est-resid max {info['solver_residual_max']:.2e}", flush=True)

    # TRUE residuals in fp64 on the host matrix (oracle arithmetic).
    import scipy.sparse

    rows = np.repeat(np.arange(p, dtype=np.int64), nbrs.shape[1])
    cols = nbrs.reshape(-1)
    m_valid = cols >= 0
    A = scipy.sparse.csr_matrix(
        (np.ones(m_valid.sum()), (rows[m_valid], cols[m_valid])), shape=(p, p)
    )
    L = scipy.sparse.diags(deg) - A  # unshifted
    asym = abs(L - L.T).max()
    info["matrix_asymmetry"] = float(asym)
    # X is in operator (level-major) order; L is in lattice order.
    Xl = np.empty_like(X)
    Xl[perm] = X
    lam = vals32 - shift
    R = L @ Xl - Xl * lam[None, :]
    xn = np.linalg.norm(Xl, axis=0)
    true_res = np.linalg.norm(R, axis=0) / np.maximum(xn, 1e-300) / np.maximum(
        np.abs(lam), 1.0
    )
    info["eigenvalues_head"] = [float(v) for v in lam[:10]]
    info["true_residual_max"] = float(true_res.max())
    info["true_residual_median"] = float(np.median(true_res))
    info["pairs_below_1e-6"] = int((true_res < 1e-6).sum())
    info["pairs_below_1e-7"] = int((true_res < 1e-7).sum())
    # scipy-style normalization (relative to the operator norm, the tol
    # ARPACK itself uses): ||Lx - lam x|| / (||x|| ||L||).
    l_norm = float(abs(L).sum(axis=1).max())  # inf-norm bound
    res_opnorm = np.linalg.norm(R, axis=0) / np.maximum(xn, 1e-300) / l_norm
    info["operator_norm_bound"] = l_norm
    info["resid_over_opnorm_max"] = float(res_opnorm.max())
    info["resid_over_opnorm_median"] = float(np.median(res_opnorm))
    print(f"[northstar] true residuals: max {true_res.max():.2e} "
          f"median {np.median(true_res):.2e} "
          f"(/||L||: {res_opnorm.max():.2e})", flush=True)

    if not args.skip_scipy:
        import multiprocessing as mp

        def scipy_run(q):
            # Plain ARPACK SA (shift-invert would need an splu factorization
            # of a 3D-graph matrix — fill-in is prohibitive at this scale).
            t0 = time.time()
            vals = scipy.sparse.linalg.eigsh(
                L, k=args.k, which="SA", tol=args.tol
            )[0]
            q.put((time.time() - t0, np.sort(vals)[:10].tolist()))

        q = mp.Queue()
        proc = mp.Process(target=scipy_run, args=(q,))
        proc.start()
        proc.join(args.scipy_timeout)
        if proc.is_alive():
            proc.terminate()
            proc.join()
            info["scipy_eigsh_s"] = None
            info["scipy_note"] = (
                f"did not finish within {args.scipy_timeout:.0f}s"
            )
        else:
            t_scipy, head = q.get()
            info["scipy_eigsh_s"] = t_scipy
            info["scipy_eigenvalues_head"] = head
            info["speedup_vs_scipy"] = t_scipy / info["t_solve_s"]
        print(f"[northstar] scipy: {info.get('scipy_eigsh_s')}", flush=True)

    with open(args.out, "w") as f:
        json.dump(info, f, indent=1)
    print(json.dumps({k: info[k] for k in (
        "num_points", "nnz", "t_solve_s", "true_residual_max",
        "pairs_below_1e-6")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
