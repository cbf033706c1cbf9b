"""Offline time loop: the runnable driver the reference only stubbed
(core/module_noahmp_engine.f90:5-10, run/main.py).

Reads the namelist config, loads (or synthesizes) domain/init/forcing,
advances the jitted batched step from start to end datetime, writes
outputs at output_frequency and restarts at restart_frequency.
"""

from __future__ import annotations

import datetime
import os
import time

import numpy as np

from ..params import load_params
from ..state import init_state, init_static
from .config import Config
from .step import make_step
from . import io as io_mod


def run_offline(cfg: Config, verbose=True, forcing_provider=None,
                static=None, state=None, n_points=None,
                check_budgets_every: int = 0):
    """Run the offline case described by ``cfg``.  Returns
    (final_state, output_files).  ``check_budgets_every`` > 0 asserts
    the conservation residuals every N steps (the reference's runtime
    self-checks, SURVEY.md section 4)."""
    params = load_params(cfg.veg_scheme, cfg.soil_scheme)

    if static is None:
        if os.path.exists(io_mod._npz_path(cfg.constfile)):
            static = io_mod.load_domain(cfg.constfile)
        else:
            static = init_static(n_points or 1)
    n = static.lat.shape[0]

    when = cfg.begdatetime
    if state is None:
        respath = os.path.join(cfg.resdir, cfg.resfile)
        if cfg.restart and os.path.exists(io_mod._npz_path(respath)):
            state, when = io_mod.load_restart(respath)
        elif os.path.exists(io_mod._npz_path(cfg.initfile)):
            state = io_mod.load_init(cfg.initfile, n)
        else:
            state = init_state(n)

    if forcing_provider is None:
        if os.path.isdir(cfg.indir) and os.listdir(cfg.indir):
            forcing_provider = io_mod.FileForcing(cfg.indir, cfg.infreq,
                                                  static)
        else:
            forcing_provider = io_mod.SyntheticForcing(static)

    writer = io_mod.OutputWriter(cfg.outdir, cfg.outfreq)
    step = make_step(params, cfg.options, cfg.dt, donate=False)

    res_secs = cfg.resfreq.total_seconds()
    t0 = time.perf_counter()
    nsteps = 0
    while when < cfg.enddatetime:
        forcing = forcing_provider(when)
        state, flux = step(static, forcing, state)
        when = when + cfg.timestep
        nsteps += 1
        if check_budgets_every and nsteps % check_budgets_every == 0:
            from .. import utils
            utils.check_budgets(flux, ist=static.ist)
        writer.push(when, flux, state)
        if (when.timestamp() % res_secs) == 0:
            io_mod.save_restart(
                os.path.join(cfg.resdir,
                             "restart_" + when.strftime("%Y%m%d%H%M")
                             + ".npz"), state, when)
    elapsed = time.perf_counter() - t0

    if verbose:
        rate = n * nsteps / max(elapsed, 1e-9)
        print(f"noahmp_tpu: {nsteps} steps x {n} points in "
              f"{elapsed:.2f}s  ({rate:,.0f} point-steps/s)")
        print(f"  max |errwat| last step: "
              f"{float(np.max(np.abs(np.asarray(flux.errwat)))):.3e} mm")
    return state, writer._files
