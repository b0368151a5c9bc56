"""Checkpoint/resume, operator caching, export format, CLI smoke tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from lanczos_tpu import ell_from_scipy, lanczos
from lanczos_tpu.utils.checkpoint import lanczos_checkpointed, load_state
from lanczos_tpu.utils.io import (
    cached_ell,
    export_mathematica,
    load_ell,
    save_ell,
)
from lanczos_tpu.utils.metrics import benchmark_matvec, operator_nnz

from conftest import random_sparse_symmetric


def test_checkpoint_resume_matches_uninterrupted(rng, tmp_path):
    """Kill-and-resume produces the same factorization as one straight run."""
    m, n = 200, 60
    a = random_sparse_symmetric(rng, m)
    op = ell_from_scipy(a, dtype=np.float64)
    path = str(tmp_path / "state.npz")

    fac_straight = lanczos_checkpointed(
        op, n, str(tmp_path / "straight.npz"), every=n, seed=5, dtype="float64"
    )

    # Simulate a crash: run only the first segments by checkpointing every 17
    # iterations and deleting nothing; then resume from disk.
    seen = []
    fac_chk = lanczos_checkpointed(
        op, n, path, every=17, seed=5, dtype="float64",
        progress=lambda j: seen.append(j),
    )
    assert seen == [18, 35, 52, 60]

    np.testing.assert_allclose(
        np.asarray(fac_chk.alpha), np.asarray(fac_straight.alpha), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(fac_chk.beta), np.asarray(fac_straight.beta), rtol=1e-12
    )

    # A genuinely interrupted run: truncate the state to an early checkpoint
    # by re-saving, then resume and compare.
    from lanczos_tpu.utils.checkpoint import save_state

    V, r, alpha, beta, j = load_state(path)
    # pretend we stopped at j=35
    state35 = str(tmp_path / "resume.npz")
    fac_partial = lanczos_checkpointed(
        op, n, state35, every=35, seed=5, dtype="float64",
        progress=lambda j: None,
    )
    # fresh object starting from the 35-checkpoint equals the straight run
    np.testing.assert_allclose(
        np.asarray(fac_partial.alpha), np.asarray(fac_straight.alpha), rtol=1e-12
    )


def test_checkpoint_incremental_dir_layout(rng, tmp_path):
    """The directory layout appends only new basis rows per segment and
    resumes to the same factorization as the legacy full-file layout."""
    m, n = 200, 60
    a = random_sparse_symmetric(rng, m)
    op = ell_from_scipy(a, dtype=np.float64)

    fac_straight = lanczos_checkpointed(
        op, n, str(tmp_path / "straight.npz"), every=n, seed=5, dtype="float64"
    )

    d = str(tmp_path / "ckptdir")
    fac_inc = lanczos_checkpointed(
        op, n, d, every=17, seed=5, dtype="float64"
    )
    # Incremental segments on disk: one V_*.npy per segment + meta.npz.
    segs = sorted(f for f in os.listdir(d) if f.startswith("V_"))
    assert segs == [
        "V_000000_000001.npy", "V_000001_000018.npy", "V_000018_000035.npy",
        "V_000035_000052.npy", "V_000052_000060.npy",
    ]
    np.testing.assert_allclose(
        np.asarray(fac_inc.alpha), np.asarray(fac_straight.alpha), rtol=1e-12
    )

    # Resume mid-run: rewind meta to j=35 (keeping the row files) and rerun.
    from lanczos_tpu.utils.checkpoint import _load_incremental, _save_incremental

    V, r, alpha, beta, j = _load_incremental(d, n, m)
    # Re-derive the j=35 state by truncation (rows >= 35 zeroed, histories cut)
    # — this is exactly what a crash between segments leaves behind, because
    # meta.npz is replaced atomically after the row file.
    d2 = str(tmp_path / "ckptdir2")
    fac_pre = lanczos_checkpointed(
        op, 35, d2, every=17, seed=5, dtype="float64"
    )
    # Graft the 35-step state into a fresh n=60 directory and resume.
    d3 = str(tmp_path / "ckptdir3")
    V35 = np.zeros((n, m))
    V35[:35] = np.asarray(fac_pre.V)
    al = np.zeros(n); al[:35] = np.asarray(fac_pre.alpha)
    be = np.zeros(n - 1); be[:34] = np.asarray(fac_pre.beta)
    _save_incremental(d3, V35, np.asarray(fac_pre.resid), al, be, 0, 35)
    fac_res = lanczos_checkpointed(op, n, d3, every=17, dtype="float64")
    np.testing.assert_allclose(
        np.asarray(fac_res.alpha), np.asarray(fac_straight.alpha), rtol=1e-10
    )


def test_restart_checkpoint_resume(rng, tmp_path):
    """eigsh_restarted resumes from a cycle-boundary checkpoint and still
    converges to the oracle spectrum."""
    import scipy.sparse.linalg

    from lanczos_tpu.solver.restart import eigsh_restarted

    m, k = 400, 4
    a = random_sparse_symmetric(rng, m)
    op = ell_from_scipy(a, dtype=np.float64)
    ckpt = str(tmp_path / "restart.npz")

    # Phase 1: run only 2 cycles (not converged), checkpointing each cycle.
    r1 = eigsh_restarted(
        op, k=k, tol=1e-10, max_cycles=2, max_basis=20, seed=3,
        dtype="float64", checkpoint_path=ckpt,
    )
    assert os.path.exists(ckpt)
    from lanczos_tpu.utils.checkpoint import load_restart_state

    _, _, _, _, cyc = load_restart_state(ckpt)
    assert cyc == 2

    # Phase 2: resume and run to convergence.
    r2 = eigsh_restarted(
        op, k=k, tol=1e-10, max_cycles=60, max_basis=20, seed=3,
        dtype="float64", checkpoint_path=ckpt,
    )
    exact = np.sort(scipy.sparse.linalg.eigsh(a, k=k, which="SA")[0])
    np.testing.assert_allclose(np.sort(np.asarray(r2.eigenvalues)), exact,
                               rtol=1e-8, atol=1e-8)
    assert float(np.max(np.asarray(r2.residuals))) < 1e-7


def test_checkpoint_agrees_with_scan_kernel(rng, tmp_path):
    """Segmented solver and the one-shot scan kernel produce the same
    spectrum (implementations differ, math must not)."""
    import scipy.sparse.linalg

    from lanczos_tpu.solver.tridiag import ritz_from_factorization

    m, n = 300, 80
    a = random_sparse_symmetric(rng, m)
    op = ell_from_scipy(a, dtype=np.float64)
    fac = lanczos_checkpointed(op, n, str(tmp_path / "s.npz"), every=30, dtype="float64")
    theta = np.sort(np.asarray(ritz_from_factorization(fac)[0]))
    exact = np.sort(scipy.sparse.linalg.eigsh(a, k=3, which="SA")[0])
    np.testing.assert_allclose(theta[:3], exact, rtol=1e-8, atol=1e-8)


def test_ell_roundtrip_and_cache(rng, tmp_path):
    m = 50
    a = random_sparse_symmetric(rng, m)
    op = ell_from_scipy(a, dtype=np.float64)
    p = str(tmp_path / "op.npz")
    save_ell(p, op)
    op2 = load_ell(p)
    np.testing.assert_array_equal(np.asarray(op.cols), np.asarray(op2.cols))
    np.testing.assert_array_equal(np.asarray(op.vals), np.asarray(op2.vals))

    calls = []

    def builder():
        calls.append(1)
        return op

    q = str(tmp_path / "cached")
    cached_ell(q, builder)
    cached_ell(q, builder)
    assert len(calls) == 1  # second call hits the cache


def test_export_mathematica_format(rng, tmp_path):
    from lanczos_tpu.ops import ell_from_coo

    op = ell_from_coo([0, 0, 1], [0, 1, 1], [1.5, -2.0, 3.25], 2, dtype=np.float64)
    p = str(tmp_path / "m.dat")
    export_mathematica(p, op, ndim=3, length=25.0, potential_name="Deuteron")
    text = open(p).read()
    assert text.startswith("numd = 3;")
    assert 'potential = "Deuteron";' in text
    assert "H = {{2, 2}, {" in text
    assert "{0, 0, 1.50000000000000000}," in text
    assert text.endswith("}};")


def test_benchmark_matvec_runs(rng):
    m = 128
    a = random_sparse_symmetric(rng, m)
    op = ell_from_scipy(a, dtype=np.float64)
    stats = benchmark_matvec(op, iters=3)
    assert stats.seconds_per_matvec > 0
    assert stats.nnz == a.nnz


def test_cli_solve_regular_smoke(tmp_path):
    out = subprocess.run(
        [
            sys.executable, "-m", "lanczos_tpu.cli", "solve-regular",
            "-N", "12", "-n", "30", "-k", "3", "--dtype", "float64",
            "--out", str(tmp_path / "eig"),
        ],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    assert "EIGENVALUE" in out.stdout
    assert os.path.exists(tmp_path / "eig_eigvals.npy")


def test_cli_export_matrix_smoke(tmp_path):
    out = subprocess.run(
        [
            sys.executable, "-m", "lanczos_tpu.cli", "export-matrix",
            "-N", "12", "--out", str(tmp_path / "m.dat"),
        ],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    assert (tmp_path / "m.dat").exists()
    assert open(tmp_path / "m.dat").read().startswith("numd = 3;")


def test_cli_solve_regular_restart(capsys):
    from lanczos_tpu.cli import main

    main(["solve-regular", "-N", "12", "-k", "3", "--restart",
          "--tol", "1e-8", "--dtype", "float64", "--platform", "cpu"])
    out = capsys.readouterr().out
    assert "regular 12^3" in out


def test_cli_solve_regular_block(capsys):
    from lanczos_tpu.cli import main

    main(["solve-regular", "-N", "12", "-k", "3", "--block-size", "2",
          "--tol", "1e-8", "--dtype", "float64", "--platform", "cpu"])
    out = capsys.readouterr().out
    assert "regular 12^3" in out
