"""Benchmark: land-point-steps/sec on one chip (the BASELINE.json
primary metric).  Prints one JSON line.

The reference publishes no numbers (BASELINE.md); vs_baseline is
reported against a single-column serial-equivalent throughput estimate
(the reference is a serial CPU column model, so the honest comparison is
raw points*steps/sec).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache (shared with the test suite)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    from __graft_entry__ import _build
    from noahmp_tpu.physics.sflx import column_step
    from noahmp_tpu import tuning

    n = 65536  # land points on one chip
    params, opts, static, forcing, state = _build(n)
    # one transfer up front so the timed loop passes device buffers
    static, forcing = jax.device_put((static, forcing))

    # params/static/forcing as jit args (loop-invariant buffers), not
    # closure constants — device-resident constants force a
    # device->host fetch at lowering time (driver/step.py).
    def fn(params, static, forcing, state):
        col = lambda p, st, f, s: column_step(  # noqa: E731
            p, opts, st, f, s, jnp.float32(900.0))
        return jax.vmap(col, in_axes=(None, 0, 0, 0))(
            params, static, forcing, state)[0]

    use_pallas = os.environ.get(
        "NOAHMP_BENCH_PALLAS",
        "1" if tuning.USE_PALLAS_STEP else "0") not in ("0", "false")
    if use_pallas:
        # fused Pallas column kernel (pallas/column.py, PERF.md lever 3)
        from noahmp_tpu.driver.step import make_fused_step
        block = int(os.environ.get("NOAHMP_BENCH_BLOCK", "8192"))
        fused = make_fused_step(params, opts, 900.0, static,
                                block=block)

        def step(params, static, forcing, state):
            return fused(static, forcing, state)[0]
    else:
        step = jax.jit(fn, donate_argnums=(3,))

    def sync(state):
        # a scalar device->host fetch is the only reliable completion
        # barrier over relayed backends (block_until_ready can return
        # at dispatch-acknowledge, inflating rates ~200x — measured)
        return float(jnp.asarray(state.tg[0]))

    state = step(params, static, forcing, state)   # compile + warm
    state = step(params, static, forcing, state)
    sync(state)

    nsteps = 20
    t0 = time.perf_counter()
    for _ in range(nsteps):
        state = step(params, static, forcing, state)
    sync(state)
    dt = time.perf_counter() - t0

    pts_per_sec = n * nsteps / dt

    # baseline: the serial C++ reference column on one host CPU core
    # (the reference model is a serial CPU column; measured live)
    try:
        from noahmp_tpu import native
        pb, ob, sb, fb, stb = (params, opts,
                               jax.tree.map(lambda x: x[:256], static),
                               jax.tree.map(lambda x: x[:256], forcing),
                               jax.tree.map(lambda x: x[:256], state))
        baseline = native.bench_native(pb, ob, sb, fb, stb, steps=5,
                                       threads=1)
    except Exception:
        baseline = 2.5e5  # measured fallback (PERF.md)

    print(json.dumps({
        "metric": "land-point-steps/sec/chip",
        "value": round(pts_per_sec, 1),
        "unit": "point-steps/s",
        "vs_baseline": round(pts_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
