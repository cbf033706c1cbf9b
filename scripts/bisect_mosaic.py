"""Bisect which physics stage breaks the Mosaic compile of the fused
column kernel: stub out stages (shape-correct passthroughs) and try to
compile on the TPU.

Usage: python scripts/bisect_mosaic.py <stubs>
  <stubs>: comma list from {phen,energy,water,vege,bare,rad,tsnosoi,
           phase,canwater,snowwater,soilh2o,groundwater} or "none"
Prints COMPILE_OK or the Mosaic error tail.
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def install_stubs(stubs):
    from noahmp_tpu.physics import (energy as EN, water as WA,
                                    phenology as PH, flux as FL,
                                    radiation as RA, soiltemp as ST,
                                    snow as SN, soilwater as SW)

    if "phen" in stubs:
        def phen_stub(veg, lutyp, snowh, tv, lat, yearlen, julian,
                      lai, sai, opt_veg):
            one = jnp.ones_like(tv)
            return PH.PhenologyOut(lai=one * 2.0, sai=one * 0.2,
                                   elai=one * 2.0, esai=one * 0.2,
                                   igs=one, htop=one * 10.0)
        PH.phenology = phen_stub

    if "energy" in stubs:
        def energy_stub(params, opts, st, dt, *rest):
            z = jnp.zeros_like(st.tg)
            b = st.tg < 273.15
            i7 = jnp.zeros_like(st.stc).astype(jnp.int32)
            v4 = jnp.zeros_like(st.swc)
            vals = {f: z for f in EN.EnergyOut._fields}
            vals.update(dict(
                tv=st.tv, tg=st.tg, stc=st.stc, eah=st.eah, tah=st.tah,
                cm=st.cm, ch=st.ch, qsfc=st.qsfc, albold=st.albold,
                tauss=st.tauss, snice=st.snice, snliq=st.snliq,
                sneqv=st.sneqv, snowh=st.snowh, smc=st.smc, swc=st.swc,
                btrani=v4, imelt=i7, frozen_canopy=b, frozen_ground=b,
                latheag=z + 2.5e6, latheav=z + 2.5e6))
            return EN.EnergyOut(**vals)
        EN.energy = energy_stub
        import noahmp_tpu.physics.sflx as SX
        SX.energy_mod = EN

    if "water" in stubs:
        def water_stub(params, opts, lutyp, sltyp, slptyp, ist, dt,
                       zsoil, dzsnow, imelt_snow, uu, vv, fcev, fctr,
                       qprecc, qprecl, elai, esai, sfctmp, qvap, qdew,
                       btrani, ficeold, ponding, tg, fveg, latheav,
                       latheag, frozen_canopy, frozen_ground, nsnow,
                       canliq, canice, tv, snowh, sneqv, snice, snliq,
                       stc, swc, smc, zwt, wa, wt, wslake):
            z = jnp.zeros_like(tg)
            zsnso = jnp.concatenate([jnp.zeros_like(snice),
                                     zsoil]) * 1.0
            return WA.WaterOut(
                canliq=canliq, canice=canice, tv=tv, fwet=z,
                nsnow=nsnow, snowh=snowh, sneqv=sneqv, snice=snice,
                snliq=snliq, stc=stc, zsnso=zsnso,
                dzsnso=jnp.zeros_like(zsnso), swc=swc, smc=smc,
                zwt=zwt, wa=wa, wt=wt, wslake=wslake, cmc=z, ecan=z,
                etran=z, runsrf=z, runsub=z, qin=z, qdis=z, qsnow=z,
                ponding1=z, ponding2=z, qsnbot=z, fpice=z)
        WA.water = water_stub
        import noahmp_tpu.physics.sflx as SX
        SX.water_mod = WA

    # finer-grained stubs: shape-correct zeros via eval_shape (no
    # compute traced; values are garbage — only compilability matters)
    def stub_of(fn):
        def stub(*a, **k):
            def is_static(x):
                leaves = jax.tree.leaves(x)
                return all(isinstance(l, (bool, int, float, str))
                           for l in leaves)

            static = {i for i, x in enumerate(a) if is_static(x)}

            def call(dyn):
                full = [dyn[i] if i in dyn else a[i]
                        for i in range(len(a))]
                return fn(*full, **k)

            dyn = {i: x for i, x in enumerate(a) if i not in static}
            out = jax.eval_shape(call, dyn)
            return jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), out)
        return stub

    from noahmp_tpu.physics import thermo as TH

    from noahmp_tpu.physics import sfc as SFC

    targets = {
        "snowfall": (SN, "snowfall"),
        "compact": (SN, "compact"),
        "combine": (SN, "combine"),
        "divide": (SN, "divide"),
        "snowh2o": (SN, "snowh2o"),
        "thermo": (TH, "thermoprop"),
        "stomata": (SFC, "stomata"),
        "canres": (SFC, "canres"),
        "ragrb": (SFC, "ragrb"),
        "sfcdif1": (SFC, "sfcdif1"),
        "sfcdif2": (SFC, "sfcdif2"),
        "rad": (RA, "radiation"),
        "vege": (FL, "vege_flux"),
        "bare": (FL, "bare_flux"),
        "tsnosoi": (ST, "tsnosoi"),
        "phase": (ST, "phasechange"),
        "canwater": (WA, "canwater"),
        "snowwater": (WA, "snowwater_full"),
        "soilh2o": (SW, "soilh2o"),
        "groundwater": (SW, "groundwater"),
    }
    for key, (mod, name) in targets.items():
        if key in stubs and hasattr(mod, name):
            setattr(mod, name, stub_of(getattr(mod, name)))


def main():
    stubs = set((sys.argv[1] if len(sys.argv) > 1 else "none")
                .split(","))
    install_stubs(stubs)

    from __graft_entry__ import _build
    from noahmp_tpu.pallas.column import make_pallas_step

    block = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n = int(sys.argv[3]) if len(sys.argv) > 3 else max(block, 1024)
    params, opts, static, forcing, state = _build(n)
    step = make_pallas_step(params, opts, 900.0, static, block=block)
    jstep = jax.jit(step)
    t0 = time.time()
    try:
        # staged, so a log shows whether time went to client tracing
        # or the remote Mosaic compile (the latter runs 10s of minutes
        # on a cache miss through the relay)
        lowered = jstep.lower(forcing, state)
        print(f"traced+lowered ({time.time()-t0:.1f}s)", flush=True)
        lowered.compile()
        print(f"compiled ({time.time()-t0:.1f}s)", flush=True)
        s1, f1 = jstep(forcing, state)
        jax.block_until_ready(s1)
        print(f"COMPILE_OK stubs={sorted(stubs)} "
              f"({time.time()-t0:.1f}s) tg0={float(np.asarray(s1.tg)[0]):.2f}",
              flush=True)
    except Exception as e:
        msg = str(e)
        key = msg.splitlines()
        tail = [ln for ln in key if "relayout" in ln.lower()
                or "Mosaic" in ln or "error:" in ln.lower()][:4]
        print(f"FAIL stubs={sorted(stubs)} ({time.time()-t0:.1f}s)",
              flush=True)
        print("\n".join(tail) if tail else msg[-800:], flush=True)
        # full error (with MLIR source locations) for offline diagnosis
        tag = "-".join(sorted(stubs)) or "none"
        trunc = os.environ.get("NOAHMP_VEGE_TRUNC", "0")
        path = f"/tmp/mosaic_err_{tag}_t{trunc}.log"
        with open(path, "w") as fh:
            fh.write(msg)
        print(f"full error -> {path}", flush=True)


if __name__ == "__main__":
    main()
