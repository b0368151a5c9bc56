"""Benchmark implementation: flagship SpMV (3D deuteron Hamiltonian, 27-point stencil).

Prints ONE JSON line:
  metric       spmv_effective_bandwidth — effective HBM traffic of the
               stencil SpMV (read x + write y + read diag = 12 B/point in
               fp32) on the reference's flagship problem size
               (N=160^3 = 4.096M points, ~110M stencil taps;
               /root/reference/Python/Regular/3Ddeuteron.py:63-65).
  vs_baseline  speedup in nnz/s over the reference's own compute path for
               this exact problem: scipy.sparse CSR SpMV on the host CPU
               (3Ddeuteron.py:95 runs use_cuda=False), measured here on the
               same matrix.

Timing methodology: on the tunneled TPU runtime ``block_until_ready`` can
return before the device work has finished, so every measurement forces a
data-dependent scalar readback, and per-iteration time is obtained by
DIFFERENCING two chain lengths (n_hi - n_lo iterations) — fixed dispatch,
tunnel, and readback latencies cancel exactly.
"""

import json
import time

import numpy as np


def _chain_time_per_iter(make_chain, x, lo=5, hi=505, repeats=5):
    """Median per-iteration time of ``make_chain(n)(x)`` via two-length
    differencing (backwards-compatible scalar form of _chain_time_stats)."""
    return _chain_time_stats(make_chain, x, lo=lo, hi=hi, repeats=repeats)[
        "median_s"
    ]


def _chain_time_stats(make_chain, x, lo=5, hi=505, repeats=7):
    """Per-iteration time DISTRIBUTION of ``make_chain(n)(x)``.

    The chain must return an array whose [0] element depends on every
    iteration; reading it back forces completion on runtimes where
    block_until_ready is unreliable.  ``repeats`` interleaved (lo, hi)
    pairs give ``repeats`` independent differenced estimates; the tunneled
    chip's throughput varies ~2.5x run-to-run (ROADMAP r4), so a single
    number cannot distinguish regression from noise — callers get
    median/min/max and must report the spread alongside the median.
    """
    f_lo, f_hi = make_chain(lo), make_chain(hi)
    for f in (f_lo, f_hi):
        float(f(x).reshape(-1)[0])  # compile + warm

    def once(f):
        t0 = time.perf_counter()
        float(f(x).reshape(-1)[0])
        return time.perf_counter() - t0

    samples = []
    for _ in range(repeats):
        # min-of-2 inside each sample suppresses single-dispatch outliers
        # (a slow t_lo would otherwise make the difference negative).
        t_lo = min(once(f_lo), once(f_lo))
        t_hi = min(once(f_hi), once(f_hi))
        d = (t_hi - t_lo) / (hi - lo)
        if d > 0:
            samples.append(d)
    if not samples:
        raise RuntimeError("all differenced timing samples were nonpositive")
    samples = np.asarray(samples)
    return {
        "median_s": float(np.median(samples)),
        "min_s": float(samples.min()),
        "max_s": float(samples.max()),
        "n_samples": int(len(samples)),
    }


def bench_tpu_spmv(n_grid=160, dtype="float32"):
    import jax
    import jax.numpy as jnp
    import lanczos_tpu as lt

    H = lt.build_regular_hamiltonian(
        n_grid, 25.0, lt.deuteron_potential_3d, stencil="27", dtype=dtype
    )
    m = H.shape[0]

    def make_chain(iters):
        @jax.jit
        def chain(x):
            def body(_, v):
                # Scale instead of normalize: keeps the chain numerically
                # finite without adding a full reduction to the hot loop.
                return H.matvec(v) * jnp.asarray(1e-2, v.dtype)

            return jax.lax.fori_loop(0, iters, body, x)

        return chain

    # Carry the operator's preferred vector layout — exactly what the
    # solvers do since they became vec_shape-aware (a flat carry would add
    # a ~50 us/SpMV HBM relayout that no solver pays anymore).
    x = jnp.ones(H.vec_shape, dtype=dtype) / np.sqrt(m)
    stats = _chain_time_stats(make_chain, x)
    per_spmv = stats["median_s"]
    itemsize = jnp.dtype(dtype).itemsize
    bytes_per = 3 * m * itemsize  # read x, write y, read diag
    nnz_per = 27 * m  # stencil taps (diagonal merged into the center tap)
    return {
        "m": m,
        "spmv_s": per_spmv,
        "gbps": bytes_per / per_spmv / 1e9,
        "gbps_best": bytes_per / stats["min_s"] / 1e9,
        "gbps_worst": bytes_per / stats["max_s"] / 1e9,
        "n_samples": stats["n_samples"],
        "nnz_per_s": nnz_per / per_spmv,
        "backend": jax.default_backend(),
    }


def bench_scipy_baseline(n_grid=160, iters=3, dtype="float64"):
    """The reference's compute path: scipy CSR SpMV of the same H on host CPU."""
    import scipy.sparse

    import lanczos_tpu as lt
    from lanczos_tpu.ops.assemble import stencil_to_ell

    H = lt.build_regular_hamiltonian(
        n_grid, 25.0, lt.deuteron_potential_3d, stencil="27", dtype="float32"
    )
    ell = stencil_to_ell(H)
    m = H.shape[0]
    k = ell.cols.shape[1]
    # Uniform rows: CSR arrays directly from ELL, no COO round-trip.
    indices = np.asarray(ell.cols).reshape(-1)
    data = np.asarray(ell.vals, dtype=dtype).reshape(-1)
    indptr = np.arange(m + 1, dtype=np.int64) * k
    csr = scipy.sparse.csr_matrix((data, indices, indptr), shape=(m, m))
    x = np.ones(m, dtype=dtype) / np.sqrt(m)
    csr @ x  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        y = csr @ x
    dt = (time.perf_counter() - t0) / iters
    return {"spmv_s": dt, "nnz_per_s": csr.nnz / dt}


def main():
    tpu = bench_tpu_spmv()
    ref = bench_scipy_baseline()
    vs = tpu["nnz_per_s"] / ref["nnz_per_s"]
    print(
        json.dumps(
            {
                "metric": "spmv_effective_bandwidth",
                "value": round(tpu["gbps"], 2),
                "unit": "GB/s",
                "vs_baseline": round(vs, 2),
                "detail": {
                    "problem": "3D deuteron, 27pt stencil, N=160^3, fp32",
                    "backend": tpu["backend"],
                    "statistic": "median over differenced samples",
                    "gbps_spread": [
                        round(tpu["gbps_worst"], 2),
                        round(tpu["gbps_best"], 2),
                    ],
                    "n_samples": tpu["n_samples"],
                    "spmv_time_s": round(tpu["spmv_s"], 6),
                    "nnz_per_s": round(tpu["nnz_per_s"], 0),
                    "baseline": "scipy CSR SpMV, host CPU (reference path)",
                    "baseline_spmv_time_s": round(ref["spmv_s"], 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
