"""Smallest real-Mosaic check (VERDICT r2 #6): compile and run the
batched Thomas-solver Pallas kernel on the TPU and compare against the
XLA solver.  Fast (single small kernel), so it doubles as a canary for
the Mosaic toolchain before attempting the fused column kernel.

Usage: python scripts/mosaic_smoke.py
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    from noahmp_tpu.numerics.tridiag import thomas
    from noahmp_tpu.pallas.tridiag import thomas_pallas

    rng = np.random.default_rng(0)
    n, L = 8192, 7
    b = rng.uniform(1.5, 3.0, (n, L)).astype(np.float32)
    a = rng.uniform(-0.5, 0.5, (n, L)).astype(np.float32)
    c = rng.uniform(-0.5, 0.5, (n, L)).astype(np.float32)
    d = rng.uniform(-1.0, 1.0, (n, L)).astype(np.float32)
    a[:, 0] = 0.0
    c[:, -1] = 0.0
    args = tuple(jnp.asarray(x) for x in (a, b, c, d))

    t0 = time.time()
    x_ref = np.asarray(jax.jit(thomas)(*args))
    print(f"[{time.time()-t0:6.1f}s] XLA solve done", flush=True)

    t0 = time.time()
    x_pl = np.asarray(thomas_pallas(*args, block=512))
    print(f"[{time.time()-t0:6.1f}s] Mosaic compile+run done",
          flush=True)

    err = np.max(np.abs(x_pl - x_ref))
    print(f"max|mosaic - xla| = {err:.3e}", flush=True)
    assert err < 1e-5, err
    print("MOSAIC SMOKE OK on", jax.devices()[0], flush=True)


if __name__ == "__main__":
    main()
