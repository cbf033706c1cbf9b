"""ctypes binding to the native serial reference column
(native/noahmp_ref.cpp).  Used as the golden oracle for the masked JAX
implementation and as a CPU fallback.

The shared library is built on demand with g++ (cached next to the
sources)."""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
from typing import Optional

import numpy as np

from ..constants import MSNOW, NSOIL, NLEVELS
from ..options import Options
from ..state import State, Static, Forcing

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libnoahmp_ref.so")

f = ct.c_float
i32 = ct.c_int32


class CColParams(ct.Structure):
    _fields_ = [
        ("nroot", i32),
        ("canwmxp", f), ("dleaf", f), ("z0mvt", f), ("hvt", f),
        ("hvb", f), ("rcrown", f), ("cwpvt", f), ("xl", f),
        ("rhol", f * 2), ("rhos", f * 2), ("taul", f * 2),
        ("taus", f * 2),
        ("lai12m", f * 12), ("sai12m", f * 12),
        ("tmin", f),
        ("c3c4", i32),
        ("kc25", f), ("akc", f), ("ko25", f), ("ako", f),
        ("vcmx25", f), ("avcmx", f), ("bp", f), ("mp", f), ("qe25", f),
        ("folnmx", f),
        ("rgl", f), ("hs", f), ("rsmax", f), ("rsmin", f), ("topt", f),
        ("sla", f), ("dilefc", f), ("dilefw", f), ("fragr", f),
        ("ltovrc", f), ("wrrat", f), ("wdpool", f), ("tdlef", f),
        ("rmf25", f), ("rms25", f), ("rmr25", f), ("arm", f), ("mrp", f),
        ("is_urban", i32), ("is_water", i32), ("is_barren", i32),
        ("is_ice_class", i32), ("is_egblf", i32),
        ("bexp", f), ("smcmax", f), ("smcref", f), ("smcwlt", f),
        ("psisat", f), ("dksat", f), ("dwsat", f), ("quartz", f),
        ("kdt", f), ("frzx", f),
        ("albsat", f * 2), ("albdry", f * 2),
        ("csoil", f), ("zbot", f), ("czil", f), ("timean", f),
        ("fsatmax", f), ("mltfct", f), ("z0sno", f), ("ssi", f),
        ("swemax", f),
        ("albice", f * 2), ("alblake", f * 2), ("omegas", f * 2),
        ("betads", f), ("betais", f),
        ("emssoil", f), ("emslake", f), ("slope", f),
        ("lat", f),
        ("ist", i32), ("ice", i32), ("isc", i32), ("slptyp", i32),
        ("zsoil", f * NSOIL),
        ("shdfac", f), ("shdmax", f), ("tbot", f), ("zlvl_ref", f),
    ]


class COpts(ct.Structure):
    _fields_ = [(k, i32) for k in
                ("veg", "crs", "btr", "run", "sfc", "frz", "inf", "rad",
                 "alb", "snf", "tbot", "stc")]


class CForcing(ct.Structure):
    _fields_ = [(k, f) for k in
                ("sfctmp", "sfcprs", "psfc", "uu", "vv", "q2", "soldn",
                 "lwdn", "prcp", "cosz", "co2air", "o2air", "foln",
                 "julian", "yearlen")]


class CState(ct.Structure):
    _fields_ = [
        ("canliq", f), ("canice", f), ("tv", f), ("eah", f), ("tah", f),
        ("fwet", f), ("lai", f), ("sai", f),
        ("tg", f), ("qsfc", f), ("cm", f), ("ch", f),
        ("nsnow", i32),
        ("snowh", f), ("sneqv", f), ("sneqvo", f),
        ("snice", f * MSNOW), ("snliq", f * MSNOW),
        ("zsnso", f * NLEVELS),
        ("albold", f), ("tauss", f),
        ("ficeold", f * MSNOW),
        ("qsnow", f),
        ("stc", f * NLEVELS),
        ("swc", f * NSOIL), ("smc", f * NSOIL),
        ("zwt", f), ("wa", f), ("wt", f), ("wslake", f),
        ("lfmass", f), ("rtmass", f), ("stmass", f), ("wood", f),
        ("stblcp", f), ("fastcp", f),
    ]


FLUX_FIELDS = ("fsa", "fsr", "fira", "fsh", "fcev", "fgev", "fctr",
               "ssoil", "trad", "ecan", "etran", "edir", "runsrf",
               "runsub", "apar", "psn", "sav", "sag", "fsno", "nee",
               "gpp", "npp", "fveg", "albedo", "qsnbot", "ponding",
               "rssun", "rssha", "t2mv", "t2mb", "q2v", "q2b", "fpice",
               "errwat", "errsw", "erreng")


class CFlux(ct.Structure):
    _fields_ = [(k, f) for k in FLUX_FIELDS]


def build(force: bool = False) -> str:
    """Compile the shared library if missing/stale."""
    src = os.path.join(_NATIVE_DIR, "noahmp_ref.cpp")
    deps = [src] + [os.path.join(_NATIVE_DIR, n)
                    for n in ("noahmp_ref.hpp", "noahmp_ref2.inc",
                              "noahmp_ref3.inc", "noahmp_ref4.inc")]
    if (not force and os.path.exists(_SO_PATH)
            and all(os.path.getmtime(_SO_PATH) >= os.path.getmtime(d)
                    for d in deps)):
        return _SO_PATH
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-fopenmp", "-o",
           _SO_PATH, src]
    try:
        subprocess.run(cmd, check=True, cwd=_NATIVE_DIR)
    except subprocess.CalledProcessError:
        # toolchains without OpenMP: serial fallback
        cmd.remove("-fopenmp")
        subprocess.run(cmd, check=True, cwd=_NATIVE_DIR)
    return _SO_PATH


_lib: Optional[ct.CDLL] = None


def load() -> ct.CDLL:
    global _lib
    if _lib is None:
        lib = ct.CDLL(build())
        lib.noahmp_step.argtypes = [
            ct.POINTER(CColParams), ct.POINTER(COpts),
            ct.POINTER(CForcing), f, ct.POINTER(CState),
            ct.POINTER(CFlux)]
        lib.noahmp_step.restype = None
        _lib = lib
    return _lib


def gather_col_params(params, static: Static, i: int) -> CColParams:
    """Gather table values for column i into the flat C struct."""
    v, s, g = params.veg, params.soil, params.gen
    lu = int(np.asarray(static.lutyp)[i])
    sl = int(np.asarray(static.sltyp)[i])
    isc = int(np.asarray(static.isc)[i])
    slp = int(np.asarray(static.slptyp)[i])
    cp = CColParams()

    def arr(dst, src):
        for k, val in enumerate(np.asarray(src, np.float32).ravel()):
            dst[k] = float(val)

    cp.nroot = int(v.nroot[lu])
    for name in ("canwmxp", "dleaf", "z0mvt", "hvt", "hvb", "rcrown",
                 "cwpvt", "xl", "tmin", "kc25", "akc", "ko25", "ako",
                 "vcmx25", "avcmx", "bp", "mp", "qe25", "folnmx", "rgl",
                 "hs", "rsmax", "rsmin", "topt", "sla", "dilefc",
                 "dilefw", "fragr", "ltovrc", "wrrat", "wdpool",
                 "tdlef", "rmf25", "rms25", "rmr25", "arm", "mrp"):
        setattr(cp, name, float(getattr(v, name)[lu]))
    cp.c3c4 = int(v.c3c4[lu])
    arr(cp.rhol, v.rhol[lu]); arr(cp.rhos, v.rhos[lu])
    arr(cp.taul, v.taul[lu]); arr(cp.taus, v.taus[lu])
    arr(cp.lai12m, v.lai12m[lu]); arr(cp.sai12m, v.sai12m[lu])
    cp.is_urban = int(lu == int(v.isurban))
    cp.is_water = int(lu == int(v.iswater))
    cp.is_barren = int(lu == int(v.isbarren))
    cp.is_ice_class = int(lu == int(v.isice))
    cp.is_egblf = int(lu == int(v.isegblf))
    for name in ("bexp", "smcmax", "smcref", "smcwlt", "psisat",
                 "dksat", "dwsat", "quartz", "kdt", "frzx"):
        setattr(cp, name, float(getattr(s, name)[sl]))
    arr(cp.albsat, s.albsat[isc]); arr(cp.albdry, s.albdry[isc])
    for name in ("csoil", "zbot", "czil", "timean", "fsatmax", "mltfct",
                 "z0sno", "ssi", "swemax", "betads", "betais",
                 "emssoil", "emslake"):
        setattr(cp, name, float(getattr(g, name)))
    arr(cp.albice, g.albice); arr(cp.alblake, g.alblake)
    arr(cp.omegas, g.omegas)
    cp.slope = float(g.slope[slp])
    cp.lat = float(np.asarray(static.lat)[i])
    cp.ist = int(np.asarray(static.ist)[i])
    cp.ice = int(np.asarray(static.ice)[i])
    cp.isc = isc
    cp.slptyp = slp
    arr(cp.zsoil, np.asarray(static.zsoil)[i])
    cp.shdfac = float(np.asarray(static.shdfac)[i])
    cp.shdmax = float(np.asarray(static.shdmax)[i])
    cp.tbot = float(np.asarray(static.tbot)[i])
    cp.zlvl_ref = float(np.asarray(static.zlvl)[i])
    return cp


def opts_to_c(opts: Options) -> COpts:
    o = COpts()
    for name in o._fields_:
        setattr(o, name[0], int(getattr(opts, name[0])))
    return o


def forcing_to_c(forcing: Forcing, i: int) -> CForcing:
    cf = CForcing()
    for name, _ in cf._fields_:
        cf.__setattr__(name, float(np.asarray(
            getattr(forcing, name))[i]))
    return cf


def state_to_c(state: State, i: int) -> CState:
    cs = CState()
    for name, typ in cs._fields_:
        val = np.asarray(getattr(state, name))[i]
        if hasattr(typ, "_length_"):
            for k in range(typ._length_):
                getattr(cs, name)[k] = float(np.asarray(val).ravel()[k])
        elif typ is i32:
            setattr(cs, name, int(val))
        else:
            setattr(cs, name, float(val))
    return cs


def state_from_c(cs: CState) -> dict:
    out = {}
    for name, typ in cs._fields_:
        v = getattr(cs, name)
        if hasattr(typ, "_length_"):
            out[name] = np.asarray(list(v), np.float32)
        else:
            out[name] = v
    return out


def step_column(params, opts: Options, static: Static,
                forcing: Forcing, state: State, i: int, dt: float):
    """Advance column i with the native reference.  Returns
    (state_dict, flux_dict)."""
    lib = load()
    cp = gather_col_params(params, static, i)
    co = opts_to_c(opts)
    cf = forcing_to_c(forcing, i)
    cs = state_to_c(state, i)
    cx = CFlux()
    lib.noahmp_step(ct.byref(cp), ct.byref(co), ct.byref(cf),
                    f(dt), ct.byref(cs), ct.byref(cx))
    flux = {k: float(getattr(cx, k)) for k in FLUX_FIELDS}
    return state_from_c(cs), flux


def load_batch():
    lib = load()
    if not hasattr(lib.noahmp_step_batch, "_configured"):
        lib.noahmp_step_batch.argtypes = [
            ct.POINTER(CColParams), ct.POINTER(COpts),
            ct.POINTER(CForcing), f, ct.POINTER(CState),
            ct.POINTER(CFlux), ct.c_int64]
        lib.noahmp_step_batch.restype = None
        lib.noahmp_step_batch._configured = True
    return lib


def set_threads(n: int):
    """Set OpenMP thread count for noahmp_step_batch (no-op if the
    library was built without OpenMP)."""
    lib = load()
    try:
        lib.omp_set_num_threads(ct.c_int(n))
    except AttributeError:
        pass


def make_batch(params, opts: Options, static: Static,
               forcing: Forcing, state: State):
    """Build C arrays for a whole batch (one-time conversion cost)."""
    n = int(np.asarray(static.lat).shape[0])
    cp = (CColParams * n)()
    cf = (CForcing * n)()
    cs = (CState * n)()
    cx = (CFlux * n)()
    for i in range(n):
        cp[i] = gather_col_params(params, static, i)
        cf[i] = forcing_to_c(forcing, i)
        cs[i] = state_to_c(state, i)
    return opts_to_c(opts), cp, cf, cs, cx


def bench_native(params, opts: Options, static: Static,
                 forcing: Forcing, state: State, steps: int = 10,
                 threads: int = 1) -> float:
    """Measure native column-steps/sec (state advances in place)."""
    import time
    lib = load_batch()
    co, cp, cf, cs, cx = make_batch(params, opts, static, forcing,
                                    state)
    n = len(cp)
    set_threads(threads)
    lib.noahmp_step_batch(cp, ct.byref(co), cf, f(900.0), cs, cx, n)
    t0 = time.perf_counter()
    for _ in range(steps):
        lib.noahmp_step_batch(cp, ct.byref(co), cf, f(900.0), cs, cx, n)
    dt = time.perf_counter() - t0
    return n * steps / dt
