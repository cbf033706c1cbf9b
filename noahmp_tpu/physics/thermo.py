"""Thermal properties of the snow/soil column.

Per-layer conductivity DF and heat capacity HCPCT for snow (Yen-1965
conductivity), soil (Peters-Lidard/Johansen), and lake columns, plus the
phase-change factor FACT = dt/(C*dz) and the snow/soil interface blending
(reference: core/module_noahmp_func.f90:1341-1595).

Snow layers are fixed-shape (MSNOW,) arrays; inactive slots are masked
(their dz is 0) and guarded against division by zero.
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import (MSNOW, CICE, CWAT, CPAIR, TFRZ, TKICE,
                         TKWAT, DENICE, DENWAT, MPE)


class SnowThermo(NamedTuple):
    tksno: jnp.ndarray    # (MSNOW,) snow conductivity [W m-1 K-1]
    cvsno: jnp.ndarray    # (MSNOW,) snow volumetric heat capacity
    snicev: jnp.ndarray   # (MSNOW,) partial volume of ice
    snliqv: jnp.ndarray   # (MSNOW,) partial volume of liquid
    epore: jnp.ndarray    # (MSNOW,) effective porosity


class ThermoOut(NamedTuple):
    df: jnp.ndarray       # (NLEVELS,) thermal conductivity
    hcpct: jnp.ndarray    # (NLEVELS,) volumetric heat capacity
    fact: jnp.ndarray     # (NLEVELS,) dt/(C*dz) phase-change factor
    snicev: jnp.ndarray
    snliqv: jnp.ndarray
    epore: jnp.ndarray


def csnow(snice, snliq, dzsnow) -> SnowThermo:
    """Snow heat capacity/conductivity from partial volumes
    (reference func:1448-1497).  dzsnow: (MSNOW,) thicknesses (0 when
    the slot is inactive)."""
    dz = jnp.maximum(dzsnow, MPE)
    snicev = jnp.minimum(1.0, snice / (dz * DENICE))
    epore = 1.0 - snicev
    snliqv = jnp.minimum(epore, snliq / (dz * DENWAT))
    bdsnoi = (snice + snliq) / dz
    cvsno = CICE * snicev + CWAT * snliqv
    tksno = 3.2217e-6 * bdsnoi ** 2.0   # Stieglitz (Yen 1965)
    return SnowThermo(tksno, cvsno, snicev, snliqv, epore)


def tdfcnd(soil, sltyp, smc, swc):
    """Peters-Lidard soil thermal conductivity (reference func:1500-1595).
    Elementwise over soil layers."""
    smcmax = soil.smcmax[sltyp]
    quartz = soil.quartz[sltyp]
    satratio = smc / smcmax
    thkw = 0.57
    thko = 2.0
    thkqtz = 7.7
    thks = thkqtz ** quartz * thko ** (1.0 - quartz)
    xunfroz = swc / jnp.maximum(smc, MPE)
    xu = xunfroz * smcmax
    thksat = (thks ** (1.0 - smcmax) * TKICE ** (smcmax - xu)
              * thkw ** xu)
    gammd = (1.0 - smcmax) * 2700.0
    thkdry = (0.135 * gammd + 64.7) / (2700.0 - 0.947 * gammd)
    frozen = (swc + 0.0005) < smc
    ake_unfrozen = jnp.where(satratio > 0.1,
                             jnp.log10(jnp.maximum(satratio, MPE)) + 1.0,
                             0.0)
    ake = jnp.where(frozen, satratio, ake_unfrozen)
    return ake * (thksat - thkdry) + thkdry


def thermoprop(soil, veg, gen, sltyp, lutyp, ist, nsnow, dt, dzsnso,
               snowh, snice, snliq, csoil, smc, swc, stc) -> ThermoOut:
    """Column thermal properties (reference func:1341-1445).

    dzsnso: (NLEVELS,) layer thicknesses; snow slots 0..MSNOW-1 hold 0
    when inactive.
    """
    snow = csnow(snice, snliq, dzsnso[:MSNOW])

    soilice = smc - swc
    smcmax = soil.smcmax[sltyp]
    hc_soil = (swc * CWAT + (1.0 - smcmax) * csoil
               + (smcmax - smc) * CPAIR + soilice * CICE)
    df_soil = tdfcnd(soil, sltyp, smc, swc)
    # urban override (func:1405-1409)
    df_soil = jnp.where(lutyp == veg.isurban, 3.24, df_soil)
    # lake branch (func:1420-1430)
    stc_soil = stc[MSNOW:]
    hc_soil = jnp.where(ist == 2,
                        jnp.where(stc_soil > TFRZ, CWAT, CICE), hc_soil)
    df_soil = jnp.where(ist == 2,
                        jnp.where(stc_soil > TFRZ, TKWAT, TKICE), df_soil)

    df = jnp.concatenate([snow.tksno, df_soil])
    hcpct = jnp.concatenate([snow.cvsno, hc_soil])
    fact = dt / (hcpct * jnp.maximum(dzsnso, MPE))

    # snow/soil interface blending of the top soil layer (func:1440-1444)
    dz1 = dzsnso[MSNOW]
    df1 = df[MSNOW]
    # no layered snow: blend with bulk snow conductivity 0.35
    df1_bulk = (df1 * dz1 + 0.35 * snowh) / (snowh + dz1)
    # layered snow: blend with the lowest snow layer (slot MSNOW-1)
    dz0 = dzsnso[MSNOW - 1]
    df1_lay = (df1 * dz1 + df[MSNOW - 1] * dz0) / jnp.maximum(dz0 + dz1, MPE)
    df = jnp.where(jnp.arange(df.shape[0]) == MSNOW,
                   jnp.where(nsnow == 0, df1_bulk, df1_lay), df)

    return ThermoOut(df, hcpct, fact, snow.snicev, snow.snliqv, snow.epore)
