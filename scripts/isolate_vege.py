"""Compile ONLY vege_flux under Mosaic, through the exact tile-native
machinery the fused column kernel uses (pallas/column._split_batched /
_dvmap), so the one remaining full-kernel relayout can be bisected in
~30 s iterations instead of full-column compiles.

Usage: python scripts/isolate_vege.py [unroll]
Env:   NOAHMP_VEGE_TRUNC=<n> truncates vege_flux after stage n
       (read by physics/flux.py at trace time).
Prints COMPILE_OK/FAIL; full Mosaic error lands in
/tmp/mosaic_err_vegeiso_t<trunc>.log.
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from noahmp_tpu.numerics import transcend  # noqa: E402
from noahmp_tpu import tuning  # noqa: E402
from noahmp_tpu.pallas.column import (_split_batched, _rebuild, _dvmap,
                                      _to_tiles)  # noqa: E402
from noahmp_tpu.params.gathered import gather_params  # noqa: E402
from noahmp_tpu.physics import flux as flux_mod  # noqa: E402
from noahmp_tpu.physics.flux import VegeFluxOut  # noqa: E402

BS, LANE = 8, 128
N = BS * LANE

# plausible warm vegetated-tile scalars (order = vege_flux positional
# args after veg/gen/lutyp/opts/dt); mild per-point spread so no input
# is a splat constant
SCALARS = dict(
    sav=120.0, sag=80.0, lwdn=350.0, ur=3.0, uu=2.0, vv=1.5,
    sfctmp=295.0, thair=296.0, qair=0.01, eair=1500.0, rhoair=1.15,
    snowh=0.02, vai=2.2, gammav=57.9, gammag=57.9, fwet=0.1,
    laisun=1.0, laisha=1.0, cwp=0.18, htop=10.0, zlvl=10.0, zpd=6.5,
    z0m=0.5, fveg=0.8, z0mg=0.01, emv=0.95, emg=0.97, canliq=0.1,
    canice=0.0, stc_top=294.0, df_top=1.2, dz_top=0.1, rsurf=100.0,
    latheav=2.51e6, latheag=2.51e6, parsun=100.0, parsha=50.0,
    igs=1.0, foln=1.0, co2air=35.0, o2air=20900.0, btran=0.8,
    sfcprs=90000.0, rhsur=0.9, psfc=90000.0, eah0=1400.0, tah0=295.0,
    tv0=295.0, tg0=296.0, cm0=0.01, ch0=0.01,
)


def main():
    unroll = (sys.argv[1] not in ("0", "false")) if len(sys.argv) > 1 \
        else False
    trunc = os.environ.get("NOAHMP_VEGE_TRUNC", "0")

    from __graft_entry__ import _build
    params, opts, static, _forcing, _state = _build(N)
    gathered = gather_params(params, static.lutyp, static.sltyp,
                             static.isc, static.slptyp)

    gp_b, gp_t = _split_batched(gathered, N, LANE)
    axes_params = jax.tree_util.tree_unflatten(
        gp_t[0], [-1 if k == "b" else None for k, _i, _s in gp_t[1]])
    kinds = [None] * len(gp_b)
    for kind, idx, _shape in gp_t[1]:
        kinds[idx] = kind

    lut_t = _to_tiles(static.lutyp, LANE)
    rng = np.random.default_rng(0)
    sc_arrays = []
    for name, v in SCALARS.items():
        spread = np.float32(v) * (1.0 + 0.02 * rng.standard_normal(
            N).astype(np.float32))
        sc_arrays.append(_to_tiles(jnp.asarray(spread), LANE))

    names = list(SCALARS)
    in_arrays = gp_b + [lut_t] + sc_arrays
    in_kinds = kinds + ["b"] * (1 + len(sc_arrays))

    def col(gp, lut, *scals):
        kw = dict(zip(names, scals))
        return flux_mod.vege_flux(
            gp.veg, gp.gen, lut, opts, jnp.float32(900.0),
            kw["sav"], kw["sag"], kw["lwdn"], kw["ur"], kw["uu"],
            kw["vv"], kw["sfctmp"], kw["thair"], kw["qair"],
            kw["eair"], kw["rhoair"], kw["snowh"], kw["vai"],
            kw["gammav"], kw["gammag"], kw["fwet"], kw["laisun"],
            kw["laisha"], kw["cwp"], kw["htop"], kw["zlvl"],
            kw["zpd"], kw["z0m"], kw["fveg"], kw["z0mg"], kw["emv"],
            kw["emg"], kw["canliq"], kw["canice"], kw["stc_top"],
            kw["df_top"], kw["dz_top"], kw["rsurf"], kw["latheav"],
            kw["latheag"], kw["parsun"], kw["parsha"], kw["igs"],
            kw["foln"], kw["co2air"], kw["o2air"], kw["btran"],
            kw["sfcprs"], kw["rhsur"], kw["psfc"], kw["eah0"],
            kw["tah0"], kw["tv0"], kw["tg0"], kw["cm0"], kw["ch0"])

    n_in = len(in_arrays)

    def kernel(*refs):
        vals = [r[:] if k == "b" else r[0]
                for r, k in zip(refs[:n_in], in_kinds)]
        outs = refs[n_in:]
        gp = _rebuild(gp_t, vals[:len(gp_b)])
        lut = vals[len(gp_b)]
        scals = vals[len(gp_b) + 1:]
        res = _dvmap(col, (axes_params, -1) + (-1,) * len(scals),
                     -1)(gp, lut, *scals)
        for o_ref, leaf in zip(outs, res):
            o_ref[:] = leaf

    def bspec(shape):
        ix = (lambda *_a, _n=len(shape): (0,) * _n)
        return pl.BlockSpec(shape, ix, memory_space=pltpu.VMEM)

    def sspec(shape):
        ix = (lambda *_a, _n=len(shape): (0,) * _n)
        return pl.BlockSpec(shape, ix, memory_space=pltpu.SMEM)

    out_shapes = [jax.ShapeDtypeStruct((BS, LANE), jnp.float32)
                  for _ in VegeFluxOut._fields]

    t0 = time.time()
    try:
        with transcend.mosaic_safe(), tuning.unroll_override(unroll):
            fn = pl.pallas_call(
                kernel,
                in_specs=[bspec(a.shape) if k == "b" else
                          sspec(a.shape)
                          for a, k in zip(in_arrays, in_kinds)],
                out_specs=[bspec(s.shape) for s in out_shapes],
                out_shape=out_shapes,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
            )
            jfn = jax.jit(fn)
            lowered = jfn.lower(*in_arrays)
        print(f"traced+lowered ({time.time()-t0:.1f}s)", flush=True)
        lowered.compile()
        print(f"compiled ({time.time()-t0:.1f}s)", flush=True)
        outs = jfn(*in_arrays)
        tv = np.asarray(outs[0])
        print(f"COMPILE_OK trunc={trunc} unroll={unroll} "
              f"({time.time()-t0:.1f}s) tv[0,0]={tv[0, 0]:.3f} "
              f"finite={np.isfinite(tv).all()}", flush=True)
    except Exception as e:
        msg = str(e)
        tail = [ln for ln in msg.splitlines()
                if "relayout" in ln.lower() or "Mosaic" in ln
                or "error:" in ln.lower()][:4]
        print(f"FAIL trunc={trunc} unroll={unroll} "
              f"({time.time()-t0:.1f}s)", flush=True)
        print("\n".join(tail) if tail else msg[-800:], flush=True)
        path = f"/tmp/mosaic_err_vegeiso_t{trunc}.log"
        with open(path, "w") as fh:
            fh.write(msg)
        print(f"full error -> {path}", flush=True)


if __name__ == "__main__":
    main()
