"""Physical constants and potential library.

Constants and the deuteron potential reproduce the reference's numerics
exactly (golden values):
  hbar*c and reduced rest energy: /root/reference/Python/Regular/1Ddeuteron.py:30-32
  deuteron well/core parameters:  /root/reference/Python/Irregular/Potentials.py:3-13
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = [
    "HBAR_C_MEV_FM",
    "DEUTERON_REDUCED_REST_ENERGY_MEV",
    "kinetic_prefactor",
    "deuteron_potential_3d",
    "deuteron_potential_radial",
    "square_well_1d",
    "DeuteronParams",
]

#: hbar * c in MeV * fm (reference: 1Ddeuteron.py:30 "hc = 197.327").
HBAR_C_MEV_FM = 197.327

#: Reduced rest energy of the two-nucleon system in MeV/c^2
#: (reference: 1Ddeuteron.py:31 "rest_energy = 469.4592").
DEUTERON_REDUCED_REST_ENERGY_MEV = 469.4592


def kinetic_prefactor(dx: float, rest_energy: float = DEUTERON_REDUCED_REST_ENERGY_MEV):
    """T_factor = (hbar c)^2 / (2 m c^2) / dx^2  [MeV]  (1Ddeuteron.py:32)."""
    return HBAR_C_MEV_FM**2 / (2.0 * rest_energy) / dx**2


@dataclasses.dataclass(frozen=True)
class DeuteronParams:
    """Core/well parameters of the model deuteron potential
    (reference Potentials.py:6-11)."""

    e_wells: float = 65.4823128982115
    e_well: float = 54.531
    core_scale: float = 40.0
    r_core: float = 1.0 / 4
    r_well: float = 17.0 / 10
    f_pow: float = 4.0

    @property
    def e_cores(self) -> float:
        return self.core_scale * self.e_well


_DEFAULT = DeuteronParams()


def deuteron_potential_radial(r, params: DeuteronParams = _DEFAULT):
    """V(r) = eCores exp(-(r/rCore)^4) - eWells exp(-(r/rWell)^4)  [MeV].

    (reference Potentials.py:13)
    """
    return params.e_cores * jnp.exp(-((r / params.r_core) ** params.f_pow)) - (
        params.e_wells * jnp.exp(-((r / params.r_well) ** params.f_pow))
    )


def deuteron_potential_3d(x, y, z, params: DeuteronParams = _DEFAULT):
    """3D deuteron potential centered at the origin (Potentials.py:3-13)."""
    r = jnp.sqrt(x**2 + y**2 + z**2)
    return deuteron_potential_radial(r, params)


def square_well_1d(n: int, depth: float = -10.0):
    """The 1D particle-in-a-box well of the reference driver
    (Regular/1Dbox.py:8-9): V = depth on the middle half, 0 outside."""
    v = jnp.zeros(n)
    return v.at[n // 4 : (3 * n) // 4].set(depth)
