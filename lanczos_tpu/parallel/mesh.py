"""Device-mesh helpers for row-partitioned execution.

The reference is single-process/single-GPU (SURVEY.md §2.2); this module is
new capability: a 1D "rows" mesh over which the Krylov vectors and the
operator's rows are sharded.  On real hardware the axis should map onto the
ICI ring; in tests it maps onto 8 virtual CPU devices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

__all__ = ["ROWS", "make_row_mesh"]

#: Canonical axis name for the row-partitioned dimension.
ROWS = "rows"


def make_row_mesh(num_devices: Optional[int] = None, devices=None) -> jax.sharding.Mesh:
    """1D mesh over the first ``num_devices`` devices, axis name "rows"."""
    if devices is None:
        devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    devices = np.asarray(devices[:num_devices])
    return jax.sharding.Mesh(devices, (ROWS,))
