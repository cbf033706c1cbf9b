"""Attempt the Mosaic (real-TPU) compile of the fused Pallas column
kernel (PERF.md lever 3) and measure it against the XLA step.

Usage: python scripts/try_pallas_tpu.py [n] [block]
Prints timing stages so a wedged compile is diagnosable from the log.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    sys.path.insert(0, _REPO)
    from __graft_entry__ import _build
    from noahmp_tpu.pallas.column import make_pallas_step

    t0 = time.time()
    params, opts, static, forcing, state = _build(n)
    print(f"[{time.time()-t0:7.1f}s] built inputs n={n}", flush=True)

    step = make_pallas_step(params, opts, 900.0, static, block=block)
    jstep = jax.jit(step, donate_argnums=(1,))

    print(f"[{time.time()-t0:7.1f}s] tracing+compiling...", flush=True)
    t1 = time.time()
    s1, f1 = jstep(forcing, state)
    jax.block_until_ready(s1)
    print(f"[{time.time()-t0:7.1f}s] first call done "
          f"(compile+run {time.time()-t1:.1f}s)", flush=True)

    # timed loop
    iters = 20
    t2 = time.time()
    s = s1
    for _ in range(iters):
        s, f = jstep(forcing, s)
    jax.block_until_ready(s)
    dt_ms = (time.time() - t2) / iters * 1e3
    rate = n / (dt_ms / 1e3)
    print(f"PALLAS n={n} block={block}: {dt_ms:.2f} ms/step, "
          f"{rate:,.0f} point-steps/s", flush=True)

    # sanity: tg finite, energy residual small
    import numpy as np
    tg = np.asarray(s.tg)
    erreng = np.asarray(f.erreng)
    print(f"tg range [{tg.min():.2f},{tg.max():.2f}] "
          f"max|erreng|={np.abs(erreng).max():.2e} "
          f"finite={np.isfinite(tg).all()}", flush=True)


if __name__ == "__main__":
    main()
