"""Smoke tests for the visualization module and the mirror-symmetry filter."""

import numpy as np
import pytest

import lanczos_tpu as lt
from lanczos_tpu.models.lattice import build_lattice, mirror_symmetric_filter


def test_mirror_symmetric_filter():
    # A symmetric core plus an asymmetric straggler.
    pts = np.array(
        [(1, 0, 0), (-1, 0, 0), (0, 2, 0), (0, -2, 0), (3, 3, 3), (0, 0, 5)]
    )
    kept = mirror_symmetric_filter(pts)
    kept_set = {tuple(p) for p in kept}
    assert kept_set == {(1, 0, 0), (-1, 0, 0), (0, 2, 0), (0, -2, 0)}


def test_mirror_symmetric_filter_2d():
    pts = np.array([(1, 1), (-1, -1), (1, -1), (-1, 1), (2, 0)])
    kept = mirror_symmetric_filter(pts)
    assert {tuple(p) for p in kept} == {(1, 1), (-1, -1), (1, -1), (-1, 1)}


@pytest.fixture(scope="module")
def lat():
    sp = np.full(27, 2, dtype=np.int64)
    sp[13] = 1
    return build_lattice(24, 25.0, 3, spacings=sp)


def test_plot_lattice(lat, tmp_path):
    from lanczos_tpu.utils.viz import plot_lattice

    fig = plot_lattice(lat, slice_coord=9)
    fig.savefig(tmp_path / "lat.png")


def test_plot_neighbors(lat, tmp_path):
    from lanczos_tpu.utils.viz import plot_neighbors

    fig = plot_neighbors(lat, point=lat.num_points // 2)
    fig.savefig(tmp_path / "nbrs.png")


def test_plot_eigenvectors_1d(tmp_path):
    import jax

    jax.config.update("jax_enable_x64", True)
    from lanczos_tpu.utils.viz import plot_eigenvectors_1d

    n = 101
    v = lt.square_well_1d(n)
    x = np.linspace(0.0, 10.0, n)
    H = lt.build_chain_hamiltonian_1d(n, 10.0, v)
    res = lt.eigsh(H, k=4, n=n, which="SA", dtype=np.float64)
    fig = plot_eigenvectors_1d(x, np.asarray(res.eigenvectors), res.eigenvalues)
    fig.savefig(tmp_path / "vecs.png")


def test_plot_convergence(tmp_path):
    from lanczos_tpu.utils.viz import plot_convergence

    fig = plot_convergence(np.geomspace(1, 1e-9, 40))
    fig.savefig(tmp_path / "conv.png")
