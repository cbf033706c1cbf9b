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

    ``layout``: "major" batches over the leading axis (default);
    "minor" batches over the trailing axis, which puts the land-point
    dimension on the TPU's 128-lane axis so the small layer arrays
    (L in {3,4,7}) tile as (sublanes=L, lanes=n) without padding
    (PERF.md lever 2).  Use ``batch_to_layout`` to convert pytrees.
    """
    ax = 0 if layout == "major" else -1

    def _step(static, forcing, state):
        col = partial(column_step, params, opts)
        batched = jax.vmap(col, in_axes=(ax, ax, ax, None), out_axes=ax)
        return batched(static, forcing, state, jnp.asarray(
            dt, jnp.float32))

    if jit:
        return jax.jit(_step, donate_argnums=(2,) if donate else ())
    return _step


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
    (final_state, fluxes-stacked-over-time or last flux)."""

    col = partial(column_step, params, opts)
    batched = jax.vmap(col, in_axes=(0, 0, 0, None))

    def body(state, forcing):
        new_state, flux = batched(static, forcing, state,
                                  jnp.asarray(dt, jnp.float32))
        return new_state, (flux if collect_fluxes else None)

    final_state, fluxes = jax.lax.scan(body, state0, forcings)
    return final_state, fluxes
