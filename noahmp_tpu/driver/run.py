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
                check_budgets_every: int = 0, mesh=None,
                use_orbax=None):
    """Run the offline case described by ``cfg``.  Returns
    (final_state, output_files).  ``check_budgets_every`` > 0 asserts
    the conservation residuals every N steps (the reference's runtime
    self-checks, SURVEY.md section 4).

    ``mesh``: a jax.sharding.Mesh to shard the land-point axis over
    (multi-chip/multi-host SPMD; see examples/multihost.py).
    ``use_orbax``: write restarts with the async orbax checkpointer
    (sharded-array capable) instead of single-host restart files;
    defaults to True exactly when running sharded and orbax is present.
    Orbax checkpoint steps are epoch seconds of the model time, so a
    restarted run resumes at the checkpointed timestamp.
    """
    params = load_params(cfg.veg_scheme, cfg.soil_scheme)

    if static is None:
        if os.path.exists(io_mod._npz_path(cfg.constfile)):
            static = io_mod.load_domain(cfg.constfile)
        else:
            static = init_static(n_points or 1)
    n = static.lat.shape[0]

    from ..dist import checkpoint as ckpt_mod
    if use_orbax is None:
        use_orbax = mesh is not None and ckpt_mod.HAVE_ORBAX
    ckpt = ckpt_mod.CheckpointManager(
        os.path.join(cfg.resdir, "orbax")) if use_orbax else None

    when = cfg.begdatetime
    if state is None:
        respath = os.path.join(cfg.resdir, cfg.resfile)
        if cfg.restart and os.path.exists(io_mod._npz_path(respath)):
            state, when = io_mod.load_restart(respath)
        elif os.path.exists(io_mod._npz_path(cfg.initfile)):
            state = io_mod.load_init(cfg.initfile, n)
        else:
            state = init_state(n)

    if mesh is not None:
        from ..dist.mesh import make_sharded_step, shard_batch
        static = shard_batch(static, mesh)
        state = shard_batch(state, mesh)
        sharded = make_sharded_step(params, cfg.options, cfg.dt, mesh,
                                    donate=False)
        step = lambda st, f, s: sharded(st, f, s)[:2]  # noqa: E731
    else:
        import jax
        # one transfer for the loop-invariant static fields (otherwise
        # every step re-uploads them from the host numpy views)
        static = jax.device_put(static)
        step = make_step(params, cfg.options, cfg.dt, donate=False)

    from .config import _ANCHOR
    if cfg.restart and ckpt is not None \
            and ckpt.latest_step() is not None:
        state = ckpt.restore(template=state)
        # checkpoint steps are naive model-calendar seconds since the
        # anchor (timezone-independent, unlike epoch timestamps)
        when = _ANCHOR + datetime.timedelta(seconds=ckpt.latest_step())

    if forcing_provider is None:
        if os.path.isdir(cfg.indir) and os.listdir(cfg.indir):
            forcing_provider = io_mod.FileForcing(cfg.indir, cfg.infreq,
                                                  static)
        else:
            forcing_provider = io_mod.SyntheticForcing(static)

    writer = io_mod.OutputWriter(cfg.outdir, cfg.outfreq)

    from .config import as_cadence
    res_cad = as_cadence(cfg.resfreq)
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
        if res_cad.due(when):
            if ckpt is not None:
                # async save overlaps the next model steps
                ckpt.save(int((when - _ANCHOR).total_seconds()), state)
            else:
                io_mod.save_restart(
                    os.path.join(
                        cfg.resdir,
                        "restart_" + when.strftime("%Y%m%d%H%M")
                        + ".nc"), state, when)
    if ckpt is not None:
        ckpt.close()
    elapsed = time.perf_counter() - t0

    if verbose:
        rate = n * nsteps / max(elapsed, 1e-9)
        print(f"noahmp_tpu: {nsteps} steps x {n} points in "
              f"{elapsed:.2f}s  ({rate:,.0f} point-steps/s)")
        print(f"  max |errwat| last step: "
              f"{float(np.max(np.abs(np.asarray(flux.errwat)))):.3e} mm")
    return state, writer._files
