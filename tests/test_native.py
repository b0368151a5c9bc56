"""Native C++ lattice graph-builder vs the numpy reference path.

The native engine (lanczos_tpu/native/neighbor_engine.cpp) must reproduce
models.lattice.find_neighbors bit-for-bit (same neighbors, same order, same
padding) — it is the production path for large assemblies, the numpy path
the oracle.  Skips cleanly when no C++ toolchain is present.
"""

import numpy as np
import pytest

import lanczos_tpu as lt
from lanczos_tpu import native
from lanczos_tpu.models.lattice import build_lattice, find_neighbors

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable (no g++?)"
)


def _mixed_lattice(n=24, bd=3):
    sp = np.full(bd**3, 2, dtype=np.int64)
    sp[bd**3 // 2] = 1  # fine center box
    return build_lattice(n, 25.0, bd, spacings=sp)


@pytest.mark.parametrize("d", [1, 2])
def test_find_neighbors_matches_numpy(d):
    lat = _mixed_lattice()
    nb_n, rl_n = find_neighbors(lat, d, backend="native")
    nb_p, rl_p = find_neighbors(lat, d, backend="numpy")
    assert nb_n.shape == nb_p.shape
    np.testing.assert_array_equal(nb_n, nb_p)
    np.testing.assert_array_equal(rl_n, rl_p)


def test_find_neighbors_subset_query():
    lat = _mixed_lattice()
    idx = np.arange(7, lat.num_points, 13)
    nb_n, rl_n = find_neighbors(lat, 1, idx, backend="native")
    nb_p, rl_p = find_neighbors(lat, 1, idx, backend="numpy")
    np.testing.assert_array_equal(nb_n, nb_p)
    np.testing.assert_array_equal(rl_n, rl_p)


def test_uniform_lattice_fast_path_only():
    lat = build_lattice(12, 25.0, 3, spacings=np.full(27, 2, dtype=np.int64))
    nb, rl = find_neighbors(lat, 1, backend="native")
    assert nb.shape[1] == 26  # aligned stencil everywhere
    assert (nb >= 0).all()
    np.testing.assert_array_equal(np.abs(rl).max(), 2)


def test_pack_ell_matches_scipy():
    import scipy.sparse

    rng = np.random.default_rng(0)
    m, nnz = 50, 400
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, m, nnz)
    vals = rng.normal(size=nnz)
    from lanczos_tpu.ops.assemble import ell_from_coo

    ell = ell_from_coo(rows, cols, vals, m, dtype=np.float64)
    ref = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(m, m)).toarray()
    np.testing.assert_allclose(ell.to_scipy().toarray(), ref, atol=1e-14)


def test_assembly_through_native_backend():
    """Full irregular assembly (which routes through the native engine when
    available) matches the same assembly forced onto the numpy path."""
    lat = _mixed_lattice(n=12, bd=3)
    H_auto = lt.assemble_irregular_hamiltonian(
        lat, lt.deuteron_potential_3d, dtype=np.float64
    )
    a = H_auto.to_scipy().toarray()
    # numpy-only path via monkeypatched backend
    import lanczos_tpu.native as nat

    lib, tried = nat._LIB, nat._TRIED
    try:
        nat._LIB, nat._TRIED = None, True
        H_np = lt.assemble_irregular_hamiltonian(
            lat, lt.deuteron_potential_3d, dtype=np.float64
        )
    finally:
        nat._LIB, nat._TRIED = lib, tried
    np.testing.assert_allclose(a, H_np.to_scipy().toarray(), atol=1e-12)


def test_reciprocal_mask_matches_numpy():
    """Native reciprocity scan == the numpy sorted-key membership test
    (scripts/northstar.py's graph symmetrization) on a mixed lattice whose
    neighbor relation is genuinely asymmetric at spacing interfaces."""
    lat = _mixed_lattice()
    nbrs, _ = find_neighbors(lat, 1)
    p, k = nbrs.shape
    keep_native = native.reciprocal_mask_native(nbrs)
    assert keep_native is not None and keep_native.shape == (p, k)
    rows = np.repeat(np.arange(p, dtype=np.int64), k)
    cols = nbrs.reshape(-1)
    valid = cols >= 0
    fwd = rows[valid] * p + cols[valid]
    bwd = np.sort(cols[valid] * p + rows[valid])
    pos = np.minimum(np.searchsorted(bwd, fwd), len(bwd) - 1)
    keep_np = np.zeros(p * k, dtype=bool)
    keep_np[valid] = bwd[pos] == fwd
    np.testing.assert_array_equal(keep_native, keep_np.reshape(p, k))
    # the relation IS asymmetric somewhere (else the test proves nothing)
    assert (~keep_native & (nbrs >= 0)).any()
