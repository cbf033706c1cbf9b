"""Measure the PERF.md optimization levers, one variant per process
(so a pathological compile can be bounded with `timeout`):

    python benchmarks/tpu_levers.py major|minor|unroll|pallas [n] [steps]

Prints one JSON line: variant, n, compile seconds, steady ms/step,
point-steps/s.  Run on the target backend (real TPU, or
JAX_PLATFORMS=cpu for smoke).
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
    from noahmp_tpu.driver.step import make_step, batch_to_layout
    from noahmp_tpu import tuning

    if variant == "unroll":
        tuning.HOT_LOOP_UNROLL = True

    params, opts, static, forcing, state = _build(n)

    if variant == "pallas":
        from noahmp_tpu.pallas.column import make_pallas_step
        pstep = make_pallas_step(params, opts, 900.0, static)
        step = jax.jit(lambda f, s: pstep(f, s)[0])
        args = (forcing, state)
    elif variant == "minor":
        layout = "minor"
        static = batch_to_layout(static, layout)
        forcing = batch_to_layout(forcing, layout)
        state = batch_to_layout(state, layout)
        s = make_step(params, opts, 900.0, donate=False, layout=layout)
        step = jax.jit(lambda f, st: s(static, f, st)[0])
        args = (forcing, state)
    else:  # major / unroll
        s = make_step(params, opts, 900.0, donate=False)
        step = jax.jit(lambda f, st: s(static, f, st)[0])
        args = (forcing, state)

    t0 = time.perf_counter()
    st = step(*args)
    jax.block_until_ready(st)
    compile_s = time.perf_counter() - t0

    st = step(args[0], st)
    jax.block_until_ready(st)

    t0 = time.perf_counter()
    for _ in range(nsteps):
        st = step(args[0], st)
    jax.block_until_ready(st)
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
