"""Batched, jitted model step and time loop.

``make_step`` vmaps the column physics over the leading land-point axis
and jits with donated state buffers; ``simulate`` runs a ``lax.scan``
over timesteps with the state as carry (the time axis is inherently
sequential, SURVEY.md section 5).
"""

from functools import partial
import jax
import jax.numpy as jnp

from ..physics.sflx import column_step


def make_step(params, opts, dt, jit=True, donate=True, layout="major"):
    """Build step(static, forcing, state) -> (state, flux), batched over
    all inputs.  ``opts`` and ``dt`` are static.

    ``params`` is passed as an explicit jit argument on every call —
    NOT closed over.  Closure params become HLO constants, and lowering
    a device-resident constant forces a device->host fetch
    (mlir.ir_constant -> array._value); over a relayed TPU backend that
    fetch is pathologically slow and wedged the round-1 CLI.  As an
    argument, a device-resident table stays on device and the traced
    gathers are identical.

    ``layout``: "major" batches over the leading axis (default);
    "minor" batches over the trailing axis, which puts the land-point
    dimension on the TPU's 128-lane axis so the small layer arrays
    (L in {3,4,7}) tile as (sublanes=L, lanes=n) without padding
    (PERF.md lever 2).  Use ``batch_to_layout`` to convert pytrees.
    """
    ax = 0 if layout == "major" else -1

    def _step(params, static, forcing, state):
        col = lambda p, st, f, s: column_step(  # noqa: E731
            p, opts, st, f, s, jnp.asarray(dt, jnp.float32))
        batched = jax.vmap(col, in_axes=(None, ax, ax, ax),
                           out_axes=ax)
        return batched(params, static, forcing, state)

    if jit:
        jitted = jax.jit(_step, donate_argnums=(3,) if donate else ())
    else:
        jitted = _step

    def step(static, forcing, state):
        return jitted(params, static, forcing, state)

    step.jitted = jitted  # 4-arg form, for lowering inspection/tests
    step.params = params
    return step


def batch_to_layout(tree, layout):
    """Move the leading batch axis of every leaf to the layout's batch
    position ("major": unchanged; "minor": trailing)."""
    if layout == "major":
        return tree
    return jax.tree.map(
        lambda x: jnp.moveaxis(x, 0, -1) if jnp.ndim(x) > 1 else x,
        tree)


def simulate(params, opts, dt, static, forcings, state0,
             collect_fluxes=True):
    """Run a forcing sequence.  ``forcings`` is a Forcing pytree whose
    leaves have a leading time axis (then the batch axis).  Returns
    (final_state, fluxes-stacked-over-time or last flux).

    params/static are scan-invariant closure values here; callers who
    jit this should pass them through as jit arguments (see
    ``make_simulate``) so device-resident tables are never lowered as
    HLO constants."""

    def body(state, forcing):
        col = partial(column_step, params, opts)
        batched = jax.vmap(col, in_axes=(0, 0, 0, None))
        new_state, flux = batched(static, forcing, state,
                                  jnp.asarray(dt, jnp.float32))
        return new_state, (flux if collect_fluxes else None)

    final_state, fluxes = jax.lax.scan(body, state0, forcings)
    return final_state, fluxes


def make_chunk_step(params, opts, dt, acc_spec=(), donate=True,
                    mesh=None):
    """Multi-step dispatch for the offline driver: one jitted
    ``lax.scan`` advances a whole chunk of timesteps, accumulating
    flux statistics on device in the scan carry.

    Per-step dispatch costs one host->device round trip per step *plus*
    one per eager writer op; over a relayed TPU backend that latency
    dominates wall-clock at small batch (the round-1 CLI did 96 steps x
    16 points in ~64 s warm).  Chunking makes the production driver's
    dispatch profile match bench.py's: one call per chunk, forcing
    uploaded as stacked (T, n) leaves, accumulated statistics fetched
    only at cadence boundaries.

    ``acc_spec``: tuple of (flux_field, op) with op "sum" (for output
    window means) or "absmax" (for conservation budget checks).

    Returns chunk(static, forcings, state, acc) -> (state, acc) where
    ``forcings`` leaves are stacked (T, n) and ``acc`` is a tuple of
    per-field running statistics in acc_spec order.  The callable is
    cached per chunk length T by jit's shape cache.

    ``mesh``: shard the land-point axis (the stacked forcing leaves
    shard their second axis); params replicated, as in dist.mesh.
    """
    def _chunk(params, static, forcings, state, acc):
        def body(carry, forcing):
            st, acc = carry
            col = lambda p, s, f, x: column_step(  # noqa: E731
                p, opts, s, f, x, jnp.asarray(dt, jnp.float32))
            new_st, flux = jax.vmap(col, in_axes=(None, 0, 0, 0))(
                params, static, forcing, st)
            acc = tuple(
                a + getattr(flux, f) if op == "sum"
                else jnp.maximum(a, jnp.abs(getattr(flux, f)))
                for a, (f, op) in zip(acc, acc_spec))
            return (new_st, acc), None

        (state, acc), _ = jax.lax.scan(body, (state, acc), forcings)
        return state, acc

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..dist.mesh import batch_sharding, replicated, POINTS_AXIS
        sh_b = batch_sharding(mesh)
        sh_r = replicated(mesh)
        sh_t = NamedSharding(mesh, P(None, POINTS_AXIS))
        jitted = jax.jit(
            _chunk,
            in_shardings=(sh_r, sh_b, sh_t, sh_b, sh_b),
            donate_argnums=(3, 4) if donate else ())
    else:
        jitted = jax.jit(_chunk,
                         donate_argnums=(3, 4) if donate else ())

    def chunk(static, forcings, state, acc):
        return jitted(params, static, forcings, state, acc)

    chunk.jitted = jitted
    chunk.acc_spec = tuple(acc_spec)
    return chunk


def make_simulate(params, opts, dt, collect_fluxes=True, donate=True):
    """Jitted multi-step scan with params/static as explicit arguments
    (same closure-constant rationale as ``make_step``).  Returns
    sim(static, forcings, state0) -> (final_state, fluxes)."""

    def _sim(params, static, forcings, state0):
        return simulate(params, opts, dt, static, forcings, state0,
                        collect_fluxes=collect_fluxes)

    jitted = jax.jit(_sim, donate_argnums=(3,) if donate else ())

    def sim(static, forcings, state0):
        return jitted(params, static, forcings, state0)

    sim.jitted = jitted
    return sim
