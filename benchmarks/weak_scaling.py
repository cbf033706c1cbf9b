"""Sharding-overhead / weak-scaling measurement on the virtual device
mesh (VERDICT round-1 item 5).

Real multi-chip hardware is unavailable on this bench, so the honest
measurable quantity here is the *sharding overhead*: the model's only
collectives are the scalar diagnostics reductions (dist/mesh.py), so
weak scaling on a real slice is linear iff the sharded step costs the
same as the unsharded step for the same per-device load.  On this host
the virtual CPU "devices" share the physical cores, which makes the
classic fixed-per-device-load protocol measure core contention instead
of interconnect cost; we therefore hold the TOTAL load fixed and sweep
the mesh size 1/2/4/8 — every config uses the same physical cores, so
any wall-clock growth is sharding/collective overhead.

    python benchmarks/weak_scaling.py [--points N] [--steps S] [--out F]

Writes one JSON document (default WEAKSCALING.json) with the
per-mesh-size table and the derived overhead figures.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def measure(n_total, n_devices, nsteps):
    from noahmp_tpu.dist.mesh import make_mesh, make_sharded_step, \
        shard_batch
    from __graft_entry__ import _build

    params, opts, static, forcing, state = _build(n_total)
    mesh = make_mesh(jax.devices()[:n_devices])
    static = shard_batch(static, mesh)
    forcing = shard_batch(forcing, mesh)
    state = shard_batch(state, mesh)
    step = make_sharded_step(params, opts, 900.0, mesh, donate=False)

    t0 = time.perf_counter()
    state, flux, diags = step(static, forcing, state)
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(nsteps):
        state, flux, diags = step(static, forcing, state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    assert float(diags.max_abs_erreng) < 0.01  # reference abort bound
    return {
        "devices": n_devices,
        "points_total": n_total,
        "points_per_device": n_total // n_devices,
        "compile_s": round(compile_s, 1),
        "ms_per_step": round(1e3 * dt / nsteps, 2),
        "point_steps_per_s": round(n_total * nsteps / dt, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="WEAKSCALING.json")
    args = ap.parse_args()

    rows = [measure(args.points, d, args.steps) for d in (1, 2, 4, 8)]
    base = rows[0]["ms_per_step"]
    for r in rows:
        # <1.0 means the sharded step is cheaper than unsharded at the
        # same total load; >1.0 quantifies sharding/collective overhead
        r["overhead_vs_1dev"] = round(r["ms_per_step"] / base, 3)

    doc = {
        "protocol": "fixed-total-load mesh sweep on 8 virtual CPU "
                    "devices sharing 2 physical cores; wall-clock "
                    "growth vs the 1-device mesh isolates sharding/"
                    "collective overhead (the model's only collectives "
                    "are scalar diagnostics psums)",
        "host_physical_cores": os.cpu_count(),
        "rows": rows,
        "max_overhead_vs_1dev": max(r["overhead_vs_1dev"]
                                    for r in rows),
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc["rows"]))
    print("max overhead vs 1-device mesh:",
          doc["max_overhead_vs_1dev"])


if __name__ == "__main__":
    main()
