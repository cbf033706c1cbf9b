"""Measure the XLA step with partial hot-loop unrolling on the chip.

``tuning.HOT_LOOP_UNROLL = k`` passes unroll=k to the fixed-trip
Newton/bisection fori_loops (canopy 19, bare/ground 5, stomata 20,
frh2o 10).  Each loop boundary materializes its carry to HBM every
iteration on the XLA path; a k-fold partial unroll cuts that
fusion-boundary traffic ~k-fold at ~k-fold body compile cost
(PERF.md lever 1 — measured ~40% fewer memory passes on CPU at full
unroll, never measured on the chip through the relay).

Usage: python scripts/try_unroll_tpu.py [k] [n]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

    from noahmp_tpu import tuning
    tuning.HOT_LOOP_UNROLL = True if k <= 0 else k

    from __graft_entry__ import _build
    from noahmp_tpu.physics.sflx import column_step

    t0 = time.time()
    params, opts, static, forcing, state = _build(n)
    static, forcing = jax.device_put((static, forcing))
    print(f"[{time.time()-t0:6.1f}s] built inputs n={n} unroll={k}",
          flush=True)

    def fn(params, static, forcing, state):
        col = lambda p, st, f, s: column_step(  # noqa: E731
            p, opts, st, f, s, jnp.float32(900.0))
        return jax.vmap(col, in_axes=(None, 0, 0, 0))(
            params, static, forcing, state)[0]

    step = jax.jit(fn, donate_argnums=(3,))

    state = step(params, static, forcing, state)
    float(jnp.asarray(state.tg[0]))
    print(f"[{time.time()-t0:6.1f}s] compiled+warm", flush=True)

    nsteps = 20
    t1 = time.perf_counter()
    for _ in range(nsteps):
        state = step(params, static, forcing, state)
    float(jnp.asarray(state.tg[0]))
    dt = time.perf_counter() - t1
    print(f"XLA unroll={k} n={n}: {dt/nsteps*1e3:.2f} ms/step, "
          f"{n*nsteps/dt:,.0f} point-steps/s", flush=True)


if __name__ == "__main__":
    main()
