"""Atmospheric forcing pre-processing.

Derives potential temperature, vapor pressure, air density, the fixed
10/90 convective/large-scale precipitation split, and the 70/30
direct/diffuse x 50/50 vis/nir shortwave partition
(reference: core/module_noahmp_func.f90:479-531).
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import RAIR, CPAIR


class AtmOut(NamedTuple):
    thair: jnp.ndarray    # potential temperature [K]
    qair: jnp.ndarray     # specific humidity [kg kg-1]
    eair: jnp.ndarray     # vapor pressure [Pa]
    rhoair: jnp.ndarray   # air density [kg m-3]
    qprecc: jnp.ndarray   # convective precipitation [mm s-1]
    qprecl: jnp.ndarray   # large-scale precipitation [mm s-1]
    solad: jnp.ndarray    # (2,) direct beam vis/nir [W m-2]
    solai: jnp.ndarray    # (2,) diffuse vis/nir [W m-2]
    swdown: jnp.ndarray   # total downward solar after cosz gate [W m-2]


def atm(sfcprs, sfctmp, q2, prcp, soldn, cosz) -> AtmOut:
    # The reference uses the surface pressure itself as the reference
    # pressure, making thair == sfctmp (func:508-509); kept for parity.
    thair = sfctmp * (sfcprs / sfcprs) ** (RAIR / CPAIR)
    qair = q2  # driver supplies specific humidity already
    eair = qair * sfcprs / (0.622 + 0.378 * qair)
    rhoair = (sfcprs - 0.378 * eair) / (RAIR * sfctmp)

    qprecc = 0.10 * prcp
    qprecl = 0.90 * prcp

    swdown = jnp.where(cosz <= 0.0, 0.0, soldn)
    solad = jnp.stack([swdown * 0.7 * 0.5, swdown * 0.7 * 0.5])
    solai = jnp.stack([swdown * 0.3 * 0.5, swdown * 0.3 * 0.5])
    return AtmOut(thair, qair, eair, rhoair, qprecc, qprecl,
                  solad, solai, swdown)
