"""Measure the PERF.md optimization levers, one variant per process
(so a pathological compile can be bounded with `timeout`):

    python benchmarks/tpu_levers.py major|minor|unroll|pallas [n] [steps]

Prints one JSON line: variant, n, compile seconds, steady ms/step,
point-steps/s.  Run on the target backend (real TPU, or
JAX_PLATFORMS=cpu for smoke).

Params/static/forcing are jit arguments (loop-invariant device
buffers), never closure constants: lowering a device-resident constant
forces a device->host fetch per table, which is what made round-1
lever compiles appear to never finish over the axon relay
(driver/step.py).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(variant="major", n=65536, nsteps=20):
    from __graft_entry__ import _build
    from noahmp_tpu.driver.step import batch_to_layout
    from noahmp_tpu.physics.sflx import column_step
    from noahmp_tpu import tuning

    if variant == "unroll":
        tuning.HOT_LOOP_UNROLL = True
    elif variant.startswith("unroll"):  # unroll2/unroll4/...: partial
        tuning.HOT_LOOP_UNROLL = int(variant[6:])

    params, opts, static, forcing, state = _build(n)

    if variant == "pallas":
        from noahmp_tpu.pallas.column import make_pallas_step
        pstep = make_pallas_step(params, opts, 900.0, static)
        step = jax.jit(lambda f, s: pstep(f, s)[0])
        forcing, state = jax.device_put((forcing, state))
        args = lambda st: (forcing, st)        # noqa: E731
    else:
        ax = -1 if variant == "minor" else 0
        if variant == "minor":
            static = batch_to_layout(static, "minor")
            forcing = batch_to_layout(forcing, "minor")
            state = batch_to_layout(state, "minor")

        def fn(params, static, forcing, state):
            col = lambda p, st, f, s: column_step(  # noqa: E731
                p, opts, st, f, s, jnp.float32(900.0))
            return jax.vmap(col, in_axes=(None, ax, ax, ax),
                            out_axes=ax)(params, static, forcing,
                                         state)[0]

        jitted = jax.jit(fn, donate_argnums=(3,))
        static, forcing = jax.device_put((static, forcing))
        step = lambda f, st: jitted(params, static, f, st)  # noqa: E731
        args = lambda st: (forcing, st)        # noqa: E731

    import numpy as np

    def sync(st):
        # scalar fetch = the only reliable completion barrier over
        # relayed backends (block_until_ready may return at
        # dispatch-acknowledge; measured ~200x inflation without this)
        leaf = jax.tree_util.tree_leaves(st)[0]
        return float(np.asarray(leaf.reshape(-1)[0]))

    t0 = time.perf_counter()
    st = step(*args(state))
    sync(st)
    compile_s = time.perf_counter() - t0

    for _ in range(3):   # warm: donated-buffer steady state
        st = step(*args(st))
    sync(st)

    t0 = time.perf_counter()
    for _ in range(nsteps):
        st = step(*args(st))
    sync(st)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "variant": variant, "n": n, "backend": jax.devices()[0].platform,
        "compile_s": round(compile_s, 1),
        "ms_per_step": round(1e3 * dt / nsteps, 2),
        "point_steps_per_s": round(n * nsteps / dt, 1),
    }))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "major",
         int(sys.argv[2]) if len(sys.argv) > 2 else 65536,
         int(sys.argv[3]) if len(sys.argv) > 3 else 20)
