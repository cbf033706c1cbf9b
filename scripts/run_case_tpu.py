"""The reference's intended workflow, end-to-end on the TPU at scale
(VERDICT r2 missing #2/#3): heterogeneous CONUS-flavored domain over
all veg/soil/color classes, real NetCDF hourly ldasin, 3-hourly
ldasout, daily restart — run uninterrupted, then again as
day-1 + restart + resume, and check the two final states agree
bitwise.  Writes CASE_r05.json at the repo root.

Usage: python scripts/run_case_tpu.py [n] [days] [--keep] [--step]
               [--chunk-steps=T]
(--step: per-step dispatch; --chunk-steps=T: pipelined chunk dispatch
with the scan length capped at T — T=1 keeps the async forcing/output
pipeline while sidestepping the axon relay's pathological scan-compile
times at large n)
"""

import datetime
import json
import os
import shutil
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "examples"))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def state_digest(state):
    import hashlib
    h = hashlib.sha256()
    for name in state._fields:
        h.update(np.ascontiguousarray(
            np.asarray(getattr(state, name))).tobytes())
    return h.hexdigest()[:16]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 131072
    days = int(args[1]) if len(args) > 1 else 2
    keep = "--keep" in sys.argv
    dispatch = "step" if "--step" in sys.argv else "chunk"
    forcing_mode = "compact" if "--compact" in sys.argv else "exact"
    chunk_steps = 0
    for a in sys.argv[1:]:
        if a.startswith("--chunk-steps="):
            chunk_steps = int(a.split("=", 1)[1])

    import make_case
    from noahmp_tpu.driver.config import Config
    from noahmp_tpu.driver.run import run_offline
    from noahmp_tpu.driver import io as io_mod

    base = os.path.join("/tmp", f"conus_case_{n}")
    if os.path.exists(base):
        shutil.rmtree(base)

    t0 = time.time()
    make_case.conus(n, seed=7, days=days, outdir=base, fmt="nc")
    gen_s = time.time() - t0
    print(f"[case gen {gen_s:.1f}s]", flush=True)

    dom = io_mod.load_arrays(os.path.join(base, "domain.nc"))
    classes = {
        "n": n,
        "n_veg_classes": int(len(np.unique(dom["lutyp"]))),
        "n_soil_types": int(len(np.unique(dom["sltyp"]))),
        "n_urban": int((dom["lutyp"] == make_case.ISURBAN).sum()),
        "n_water": int((dom["lutyp"] == make_case.ISWATER).sum()),
        "n_barren": int((dom["lutyp"] == make_case.ISBARREN).sum()),
        "n_ice": int((dom["lutyp"] == make_case.ISICE).sum()),
    }
    print("domain:", classes, flush=True)

    def fresh_cfg(tag):
        cfg = Config.from_namelist(os.path.join(base, "case.nml"))
        cfg.outdir = os.path.join(base, "ldasout_" + tag)
        cfg.resdir = os.path.join(base, "restart_" + tag)
        return cfg

    backend = jax.devices()[0].platform

    # --- run A: uninterrupted, full span -------------------------------
    cfg = fresh_cfg("a")
    t0 = time.time()
    st_a, files_a = run_offline(cfg, verbose=True,
                                check_budgets_every=12,
                                dispatch=dispatch,
                                chunk_steps=chunk_steps,
                                forcing_mode=forcing_mode)
    a_s = time.time() - t0
    nsteps = cfg.nsteps
    print(f"[run A {a_s:.1f}s: {nsteps} steps x {n}]", flush=True)

    # --- run B: stop at day 1, restart, resume to the end --------------
    cfg = fresh_cfg("b")
    end_full = cfg.enddatetime
    cfg.enddatetime = cfg.begdatetime + datetime.timedelta(days=1)
    t0 = time.time()
    run_offline(cfg, verbose=False, check_budgets_every=0,
                dispatch=dispatch, chunk_steps=chunk_steps,
                forcing_mode=forcing_mode)
    b1_s = time.time() - t0
    res_files = [f for f in os.listdir(cfg.resdir)
                 if f.startswith("restart_")]
    assert res_files, "no restart written at day-1 boundary"

    cfg = fresh_cfg("b")
    cfg.enddatetime = end_full
    cfg.restart = True
    cfg.resfile = sorted(res_files)[-1]
    t0 = time.time()
    st_b, _ = run_offline(cfg, verbose=False, check_budgets_every=0,
                          dispatch=dispatch, chunk_steps=chunk_steps,
                          forcing_mode=forcing_mode)
    b2_s = time.time() - t0
    print(f"[run B {b1_s:.1f}+{b2_s:.1f}s, resumed from "
          f"{cfg.resfile}]", flush=True)

    dig_a, dig_b = state_digest(st_a), state_digest(st_b)
    match = bool(dig_a == dig_b)
    print(f"final-state digests: A={dig_a} B={dig_b} match={match}",
          flush=True)

    # residuals of the last output window of run A
    last = io_mod.load_arrays(files_a[-1])
    finite = {k: bool(np.isfinite(last[k]).all()) for k in
              ("fsh", "fsa", "trad", "tg", "smc")}

    out = {
        "config": "BASELINE.md #3 (heterogeneous ~100k, real files)",
        "backend": backend,
        "domain": classes,
        "days": days,
        "steps": nsteps,
        "case_gen_s": round(gen_s, 1),
        "run_uninterrupted_s": round(a_s, 1),
        "point_steps_per_s_wall": round(n * nsteps / a_s, 1),
        "run_resumed_s": [round(b1_s, 1), round(b2_s, 1)],
        "restart_resume_bitwise_match": match,
        "n_output_files": len(files_a),
        "outputs_finite": finite,
        "budget_asserts": "every 12 steps (errsw/erreng/errwat)",
        "dispatch": dispatch,
        "chunk_steps_cap": chunk_steps,
        "forcing_mode": forcing_mode,
    }
    print(json.dumps(out, indent=2), flush=True)
    with open(os.path.join(_REPO, "CASE_r05.json"), "w") as f:
        json.dump(out, f, indent=2)
    if not keep:
        shutil.rmtree(base)


if __name__ == "__main__":
    main()
