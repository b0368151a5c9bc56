"""Test configuration: CPU backend with 8 virtual devices, fp64 enabled.

The reference has no test harness at all (SURVEY.md §4); this suite runs the
whole framework on the JAX CPU backend with a virtual 8-device mesh so that
single-device numerics AND multi-chip sharding are exercised on any machine —
the fake-backend mechanism the reference lacks.
"""

import os

# Forced (not setdefault): the ambient environment may point JAX_PLATFORMS at
# a real TPU tunnel, and the test suite must run on the virtual CPU mesh
# regardless.  NOTE: `import pytest` already imports jax (via the jaxtyping
# pytest plugin), so env vars alone are too late — use jax.config, which works
# until a backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, (
    "test suite requires the 8-device virtual CPU mesh; backend was "
    "initialized before conftest could configure it"
)

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran before it.
    return np.random.default_rng(1234)


def random_sparse_symmetric(rng, m, density=0.05, dtype=np.float64):
    """Random symmetric sparse matrix with a well-spread spectrum."""
    import scipy.sparse

    a = scipy.sparse.random(
        m, m, density=density, random_state=np.random.RandomState(rng.integers(2**31)),
        dtype=dtype,
    )
    a = (a + a.T) * 0.5
    a = a + scipy.sparse.diags(np.linspace(-1.0, 1.0, m).astype(dtype))
    return a.tocsr()
