"""State, forcing and flux pytrees.

Schema follows the reference's prognostic/forcing/flux enumeration
(core/module_noahmp_type.f90:10-116 and the inout list of noahmp_sflx,
core/module_noahmp_func.f90:142-171,286-295).  Everything is a NamedTuple
of arrays; physics is written for a single column (0-d scalars plus small
fixed-size layer vectors) and batched with ``jax.vmap``, so batched
containers simply carry a leading land-point axis.

Snow/soil layer indexing: the reference indexes layers -MSNOW+1..NSOIL
with ISNOW <= 0 counting active snow layers downward.  Here combined
arrays have NLEVELS = MSNOW+NSOIL = 7 slots; python index
i = fortran_iz + MSNOW - 1.  Snow slots are 0..2 (bottom-aligned against
the soil: with ``nsnow`` active layers, slots MSNOW-nsnow..MSNOW-1 are
live), soil slots are 3..6.  ``nsnow = -ISNOW >= 0``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .constants import MSNOW, NSOIL, NLEVELS, TFRZ

# Default soil layer-bottom depths [m] (classic Noah 4-layer grid used by
# the reference offline case).
DEFAULT_ZSOIL = (-0.1, -0.4, -1.0, -2.0)


class Static(NamedTuple):
    """Time-invariant per-point attributes."""
    lat: jnp.ndarray      # latitude [radians]
    lutyp: jnp.ndarray    # land-use class (1-based int)
    sltyp: jnp.ndarray    # soil type (1-based int)
    slptyp: jnp.ndarray   # slope type (1-based int)
    isc: jnp.ndarray      # soil color class (1=lightest)
    ist: jnp.ndarray      # surface type: 1 soil, 2 lake
    ice: jnp.ndarray      # land-ice flag (1 = ice)
    zsoil: jnp.ndarray    # (NSOIL,) layer-bottom depth from surface [m], <0
    shdfac: jnp.ndarray   # green vegetation fraction [0-1]
    shdmax: jnp.ndarray   # yearly max vegetation fraction [0-1]
    tbot: jnp.ndarray     # deep soil temperature BC [K]
    zlvl: jnp.ndarray     # atmospheric reference height [m]


class Forcing(NamedTuple):
    """Per-step atmospheric forcing."""
    sfctmp: jnp.ndarray   # air temperature at zlvl [K]
    sfcprs: jnp.ndarray   # surface pressure [Pa]
    psfc: jnp.ndarray     # pressure at lowest model level [Pa]
    uu: jnp.ndarray       # eastward wind [m s-1]
    vv: jnp.ndarray       # northward wind [m s-1]
    q2: jnp.ndarray       # specific humidity [kg kg-1]
    soldn: jnp.ndarray    # downward shortwave [W m-2]
    lwdn: jnp.ndarray     # downward longwave [W m-2]
    prcp: jnp.ndarray     # precipitation rate [mm s-1]
    cosz: jnp.ndarray     # cosine of solar zenith angle
    co2air: jnp.ndarray   # CO2 partial pressure [Pa]
    o2air: jnp.ndarray    # O2 partial pressure [Pa]
    foln: jnp.ndarray     # foliage nitrogen [%]
    julian: jnp.ndarray   # fractional day of year [0, yearlen)
    yearlen: jnp.ndarray  # days in current year


class State(NamedTuple):
    """Prognostic (carried) state of one land column."""
    # canopy
    canliq: jnp.ndarray   # intercepted liquid [mm]
    canice: jnp.ndarray   # intercepted ice [mm]
    tv: jnp.ndarray       # vegetation temperature [K]
    eah: jnp.ndarray      # canopy air vapor pressure [Pa]
    tah: jnp.ndarray      # canopy air temperature [K]
    fwet: jnp.ndarray     # wetted/snowed canopy fraction
    lai: jnp.ndarray      # leaf area index (unburied)
    sai: jnp.ndarray      # stem area index (unburied)
    # surface
    tg: jnp.ndarray       # ground temperature [K]
    qsfc: jnp.ndarray     # surface specific humidity [kg kg-1]
    cm: jnp.ndarray       # momentum exchange coefficient
    ch: jnp.ndarray       # heat exchange coefficient
    # snow
    nsnow: jnp.ndarray    # active snow layers (int, 0..MSNOW)
    snowh: jnp.ndarray    # snow depth [m]
    sneqv: jnp.ndarray    # snow water equivalent [mm]
    sneqvo: jnp.ndarray   # SWE at previous step [mm]
    snice: jnp.ndarray    # (MSNOW,) snow layer ice [mm]
    snliq: jnp.ndarray    # (MSNOW,) snow layer liquid [mm]
    zsnso: jnp.ndarray    # (NLEVELS,) layer-bottom depth from snow surface [m]
    albold: jnp.ndarray   # previous snow albedo (CLASS scheme)
    tauss: jnp.ndarray    # non-dimensional snow age
    ficeold: jnp.ndarray  # (MSNOW,) snow ice fraction at previous step
    qsnow: jnp.ndarray    # snowfall rate on ground [mm s-1]
    # soil
    stc: jnp.ndarray      # (NLEVELS,) snow/soil temperature [K]
    swc: jnp.ndarray      # (NSOIL,) liquid soil water [m3 m-3] ("soilwat")
    smc: jnp.ndarray      # (NSOIL,) total soil water [m3 m-3]
    # groundwater
    zwt: jnp.ndarray      # water table depth [m]
    wa: jnp.ndarray       # aquifer storage [mm]
    wt: jnp.ndarray       # aquifer + saturated-soil storage [mm]
    wslake: jnp.ndarray   # lake water storage [mm]
    # carbon pools
    lfmass: jnp.ndarray   # leaf mass [g m-2]
    rtmass: jnp.ndarray   # fine-root mass [g m-2]
    stmass: jnp.ndarray   # stem mass [g m-2]
    wood: jnp.ndarray     # wood mass [g m-2]
    stblcp: jnp.ndarray   # stable soil carbon [g m-2]
    fastcp: jnp.ndarray   # fast soil carbon [g m-2]


class Flux(NamedTuple):
    """Per-step diagnostic outputs (the ~45 out-arguments of noahmp_sflx,
    core/module_noahmp_func.f90:173-278)."""
    fsa: jnp.ndarray      # absorbed solar [W m-2]
    fsr: jnp.ndarray      # reflected solar [W m-2]
    fira: jnp.ndarray     # net LW to atmosphere [W m-2]
    fsh: jnp.ndarray      # sensible heat to atmosphere [W m-2]
    fcev: jnp.ndarray     # canopy evaporation heat [W m-2]
    fgev: jnp.ndarray     # ground evaporation heat [W m-2]
    fctr: jnp.ndarray     # transpiration heat [W m-2]
    ssoil: jnp.ndarray    # ground heat flux [W m-2]
    trad: jnp.ndarray     # radiative temperature [K]
    ecan: jnp.ndarray     # canopy water evaporation [mm s-1]
    etran: jnp.ndarray    # transpiration [mm s-1]
    edir: jnp.ndarray     # soil surface evaporation [mm s-1]
    runsrf: jnp.ndarray   # surface runoff [mm s-1]
    runsub: jnp.ndarray   # subsurface runoff [mm s-1]
    apar: jnp.ndarray     # absorbed PAR [W m-2]
    psn: jnp.ndarray      # photosynthesis [umol CO2 m-2 s-1]
    sav: jnp.ndarray      # solar absorbed by canopy [W m-2]
    sag: jnp.ndarray      # solar absorbed by ground [W m-2]
    fsno: jnp.ndarray     # snow cover fraction
    nee: jnp.ndarray      # net ecosystem exchange [g m-2 s-1 CO2]
    gpp: jnp.ndarray      # gross primary production [g m-2 s-1 C]
    npp: jnp.ndarray      # net primary production [g m-2 s-1 C]
    fveg: jnp.ndarray     # effective vegetation fraction
    albedo: jnp.ndarray   # broadband surface albedo
    qsnbot: jnp.ndarray   # snowpack bottom outflow [mm s-1]
    ponding: jnp.ndarray  # surface ponding [mm]
    rssun: jnp.ndarray    # sunlit stomatal resistance [s m-1]
    rssha: jnp.ndarray    # shaded stomatal resistance [s m-1]
    bgap: jnp.ndarray     # between-crown gap fraction
    wgap: jnp.ndarray     # within-crown gap fraction
    tgv: jnp.ndarray      # vegetated-tile ground temperature [K]
    tgb: jnp.ndarray      # bare-tile ground temperature [K]
    chv: jnp.ndarray      # veg-tile exchange coefficient
    chb: jnp.ndarray      # bare-tile exchange coefficient
    emissi: jnp.ndarray   # surface emissivity
    t2mv: jnp.ndarray     # 2-m temperature, veg tile [K]
    t2mb: jnp.ndarray     # 2-m temperature, bare tile [K]
    q2v: jnp.ndarray      # 2-m humidity, veg tile
    q2b: jnp.ndarray      # 2-m humidity, bare tile
    fpice: jnp.ndarray    # snow fraction of precipitation
    # per-tile energy components (reference out-args func:252-263)
    irc: jnp.ndarray      # canopy net LW [W m-2, + to atm]
    irg: jnp.ndarray      # veg-tile ground net LW
    irb: jnp.ndarray      # bare-tile net LW
    shc: jnp.ndarray      # canopy sensible heat
    shg: jnp.ndarray      # veg-tile ground sensible heat
    shb: jnp.ndarray      # bare-tile sensible heat
    evc: jnp.ndarray      # canopy evaporation heat
    evg: jnp.ndarray      # veg-tile ground evaporation heat
    evb: jnp.ndarray      # bare-tile evaporation heat
    ghv: jnp.ndarray      # veg-tile ground heat flux
    ghb: jnp.ndarray      # bare-tile ground heat flux
    tr: jnp.ndarray       # transpiration heat
    chleaf: jnp.ndarray   # leaf exchange coefficient
    chuc: jnp.ndarray     # under-canopy exchange coefficient
    chv2: jnp.ndarray     # 2-m exchange coefficient, veg tile
    chb2: jnp.ndarray     # 2-m exchange coefficient, bare tile
    ponding1: jnp.ndarray # snow-collapse ponding [mm]
    ponding2: jnp.ndarray # shallow-pack collapse ponding [mm]
    # conservation diagnostics (reference aborts on |err|>0.01;
    # here returned for batched/psum checking, func:688-731)
    errwat: jnp.ndarray   # water balance residual [mm]
    errsw: jnp.ndarray    # shortwave budget residual [W m-2]
    erreng: jnp.ndarray   # energy budget residual [W m-2]


def init_static(n: int | None = None, *, lat=0.7, lutyp=7, sltyp=6,
                slptyp=1, isc=4, ist=1, ice=0, zsoil=DEFAULT_ZSOIL,
                shdfac=0.7, shdmax=0.8, tbot=285.0, zlvl=10.0) -> Static:
    """Build a Static container; scalars broadcast over ``n`` points.
    Leaves are host numpy arrays (broadcast views — near-zero memory)."""
    def rep(v, dtype=np.float32):
        a = np.asarray(v, dtype=dtype)
        return a if n is None else np.broadcast_to(a, (n,) + a.shape)
    return Static(
        lat=rep(lat), lutyp=rep(lutyp, np.int32), sltyp=rep(sltyp, np.int32),
        slptyp=rep(slptyp, np.int32), isc=rep(isc, np.int32),
        ist=rep(ist, np.int32), ice=rep(ice, np.int32),
        zsoil=rep(np.asarray(zsoil, np.float32)),
        shdfac=rep(shdfac), shdmax=rep(shdmax), tbot=rep(tbot),
        zlvl=rep(zlvl))


def init_state(n: int | None = None, *, tg=285.0, tv=285.0,
               swc=0.3, smc=0.3, stc_soil=285.0, zsoil=DEFAULT_ZSOIL,
               canliq=0.0, canice=0.0, sneqv=0.0, snowh=0.0,
               zwt=2.5, wa=4900.0, lai=2.0, sai=0.2) -> State:
    """Cold-start state.  Zero snow layers; aquifer near equilibrium
    (the reference's typical initialization for opt_run=1).
    Leaves are host numpy arrays; see ``init_static``."""
    def rep(v, dtype=np.float32):
        a = np.asarray(v, dtype=dtype)
        return a if n is None else np.broadcast_to(a, (n,) + a.shape)

    zsoil_arr = np.asarray(zsoil, np.float32)
    zsnso0 = np.concatenate([np.zeros(MSNOW, np.float32), zsoil_arr])
    stc0 = np.concatenate([np.full(MSNOW, TFRZ, np.float32),
                           np.full(NSOIL, stc_soil, np.float32)])
    return State(
        canliq=rep(canliq), canice=rep(canice), tv=rep(tv),
        eah=rep(1000.0), tah=rep(tv), fwet=rep(0.0),
        lai=rep(lai), sai=rep(sai),
        tg=rep(tg), qsfc=rep(0.01), cm=rep(0.01), ch=rep(0.01),
        nsnow=rep(0, np.int32), snowh=rep(snowh), sneqv=rep(sneqv),
        sneqvo=rep(sneqv),
        snice=rep(np.zeros(MSNOW)), snliq=rep(np.zeros(MSNOW)),
        zsnso=rep(zsnso0),
        albold=rep(0.65), tauss=rep(0.0),
        ficeold=rep(np.zeros(MSNOW)), qsnow=rep(0.0),
        stc=rep(stc0),
        swc=rep(np.full(NSOIL, swc)), smc=rep(np.full(NSOIL, smc)),
        zwt=rep(zwt), wa=rep(wa), wt=rep(wa), wslake=rep(0.0),
        lfmass=rep(50.0), rtmass=rep(500.0), stmass=rep(50.0),
        wood=rep(500.0), stblcp=rep(1000.0), fastcp=rep(1000.0),
    )
