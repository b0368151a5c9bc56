"""Throughput measurement and profiling hooks.

Replaces the reference's tqdm bars and ad-hoc time.time() deltas
(SURVEY.md §5.1) with quantitative GB/s / nnz/s measurement and
jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.operators import EllOperator, LinearOperator, StencilOperator

__all__ = ["MatvecStats", "benchmark_matvec", "profile_trace", "operator_nnz"]


def operator_nnz(op: LinearOperator) -> int:
    """Nonzero count of the operator (stencil taps count once per point)."""
    if isinstance(op, EllOperator):
        return int(np.count_nonzero(np.asarray(op.vals)))
    if isinstance(op, StencilOperator):
        m = op.shape[0]
        k = len(op.offsets)
        has_sep_diag = op.diag is not None and not any(
            not any(o) for o in op.offsets
        )
        return m * (k + (1 if has_sep_diag else 0))
    raise TypeError(type(op).__name__)


@dataclasses.dataclass
class MatvecStats:
    seconds_per_matvec: float
    effective_gbps: float
    nnz_per_s: float
    m: int
    nnz: int

    def __str__(self):
        return (
            f"SpMV: {self.seconds_per_matvec*1e3:.3f} ms, "
            f"{self.effective_gbps:.1f} GB/s effective, "
            f"{self.nnz_per_s/1e9:.2f} Gnnz/s (M={self.m}, nnz={self.nnz})"
        )


def benchmark_matvec(op: LinearOperator, iters: int = 30) -> MatvecStats:
    """Time back-to-back SpMVs in a single dispatch (fori_loop chain).

    Effective bandwidth counts the minimum HBM traffic of a matrix-free
    stencil apply (read x, write y, read diag); for ELL operators it counts
    the matrix stream too (cols + vals), the dominant term.
    """
    m = op.shape[0]
    dtype = op.dtype
    itemsize = jnp.dtype(dtype).itemsize

    @jax.jit
    def chain(x):
        def body(_, v):
            y = op.matvec(v)
            return y / jnp.linalg.norm(y)

        return jax.lax.fori_loop(0, iters, body, x)

    x = jnp.ones(m, dtype=dtype) / np.sqrt(m)
    chain(x).block_until_ready()
    t0 = time.perf_counter()
    chain(x).block_until_ready()
    per = (time.perf_counter() - t0) / iters

    nnz = operator_nnz(op)
    if isinstance(op, EllOperator):
        k = op.cols.shape[1]
        bytes_per = m * k * (itemsize + 4) + 2 * m * itemsize
    else:
        bytes_per = 3 * m * itemsize
    return MatvecStats(
        seconds_per_matvec=per,
        effective_gbps=bytes_per / per / 1e9,
        nnz_per_s=nnz / per,
        m=m,
        nnz=nnz,
    )


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace around a block: view with tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
