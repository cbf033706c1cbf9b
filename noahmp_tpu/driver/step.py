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


def make_step(params, opts, dt, jit=True, donate=True):
    """Build step(static, forcing, state) -> (state, flux), batched over
    the leading axis of all inputs.  ``opts`` and ``dt`` are static."""

    def _step(static, forcing, state):
        col = partial(column_step, params, opts)
        batched = jax.vmap(col, in_axes=(0, 0, 0, None))
        return batched(static, forcing, state, jnp.asarray(
            dt, jnp.float32))

    if jit:
        return jax.jit(_step, donate_argnums=(2,) if donate else ())
    return _step


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
