"""Benchmark entry point: flagship SpMV on the TPU chip.

Prints ONE JSON line (see lanczos_tpu/utils/bench_impl.py for details and
the baseline definition)."""

from lanczos_tpu.utils.bench_impl import main

if __name__ == "__main__":
    main()
