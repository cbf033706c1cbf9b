"""Validate the fused Pallas column kernel against the XLA step on the
real chip: same params/static/forcing/state, K steps each, compare
every state leaf and the conservation residuals.

Usage: python scripts/compare_pallas_tpu.py [n] [block] [steps]

Tolerances: the Pallas path's only value-level deviations from the XLA
step are the Cephes atan polynomial (~1 ulp, numerics/transcend.py) and
f32 reassociation differences from Mosaic's fusion order, both of which
bound per-step state differences at the 1e-4 level; the conservation
residuals must stay inside the reference's 0.01 W/m2 budget on BOTH
paths.
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    from __graft_entry__ import _build
    from noahmp_tpu.pallas.column import make_pallas_step
    from noahmp_tpu.driver.step import make_step

    t0 = time.time()
    params, opts, static, forcing, state = _build(n)
    xla_step = make_step(params, opts, 900.0, donate=False)
    pl_step = jax.jit(make_pallas_step(params, opts, 900.0, static,
                                       block=block))

    forcing = jax.device_put(forcing)
    sx = sp = jax.device_put(state)
    static_d = jax.device_put(static)

    print(f"[{time.time()-t0:.1f}s] compiling+running XLA x{steps}",
          flush=True)
    fx = None
    for _ in range(steps):
        sx, fx = xla_step(static_d, forcing, sx)
    jax.block_until_ready(sx)
    print(f"[{time.time()-t0:.1f}s] compiling+running Pallas x{steps}",
          flush=True)
    fp = None
    for _ in range(steps):
        sp, fp = pl_step(forcing, sp)
    jax.block_until_ready(sp)
    print(f"[{time.time()-t0:.1f}s] comparing", flush=True)

    worst = {}
    bad = {}
    for name in sx._fields:
        a = np.asarray(getattr(sx, name), np.float64)
        b = np.asarray(getattr(sp, name), np.float64)
        worst[name] = d = float(np.max(np.abs(a - b)))
        # scale-aware: 1e-3 absolute for O(1) fields, relative for
        # large-magnitude ones (eah/sfcprs are O(1e3) Pa — an absolute
        # 1e-3 Pa would demand ~2 ulp agreement from a kernel with a
        # different f32 fusion order)
        scale = max(1.0, float(np.max(np.abs(a))))
        if d > 1e-3 * scale:
            bad[name] = d
    top = sorted(worst.items(), key=lambda kv: -kv[1])[:8]
    print("top state diffs:",
          " ".join(f"{k}={v:.2e}" for k, v in top), flush=True)

    for tag, f in (("xla", fx), ("pallas", fp)):
        err = {r: float(np.max(np.abs(np.asarray(getattr(f, r)))))
               for r in ("errsw", "erreng", "errwat")}
        print(f"{tag} residuals:",
              " ".join(f"{k}={v:.2e}" for k, v in err.items()),
              flush=True)
        assert err["errsw"] < 0.01 and err["erreng"] < 0.01, \
            f"{tag} violates the reference budget"

    if bad:
        print(f"DIFFER beyond scale-aware 1e-3 after {steps} steps: "
              f"{bad}", flush=True)
    else:
        print(f"MATCH: all state leaves within scale-aware 1e-3 after "
              f"{steps} steps", flush=True)

    # timed head-to-head on the same executables (one scalar fetch as
    # the completion barrier — block_until_ready can return at
    # dispatch-acknowledge over the relay, PERF.md)
    import jax.numpy as jnp
    iters = 20
    for tag, stp, s in (("xla", lambda st: xla_step(static_d, forcing,
                                                    st), sx),
                        ("pallas", lambda st: pl_step(forcing, st),
                         sp)):
        s, _ = stp(s)
        float(jnp.asarray(s.tg[0]))
        t1 = time.time()
        for _ in range(iters):
            s, _ = stp(s)
        float(jnp.asarray(s.tg[0]))
        dtm = (time.time() - t1) / iters
        print(f"TIMED {tag}: {dtm*1e3:.2f} ms/step, "
              f"{n/dtm:,.0f} point-steps/s", flush=True)

    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
