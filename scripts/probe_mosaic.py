"""Probe which per-column code patterns compile under Mosaic with the
fused kernel's nested-vmap tile layout.  Each pattern is a tiny column
function run through the same _dvmap/pallas machinery as the real
kernel.

Usage: python scripts/probe_mosaic.py p1,p2,... | all
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from noahmp_tpu.numerics import transcend  # noqa: E402
from noahmp_tpu.pallas.column import _dvmap  # noqa: E402

L = 7
BS, LANE = 8, 128


def run_pattern(name, col_fn, out_rank):
    """col_fn(scalar s, layer vec (L,)) -> value (scalar or (L,))."""
    n = BS * LANE
    s_in = jnp.linspace(1.0, 2.0, n, dtype=jnp.float32)
    v_in = jnp.linspace(0.0, 1.0, n * L,
                        dtype=jnp.float32).reshape(L, BS, LANE)
    s_t = s_in.reshape(BS, LANE)

    def kernel(s_ref, v_ref, o_ref):
        s, v = s_ref[:], v_ref[:]
        out = _dvmap(col_fn, (-1, -1), -1)(s, v)
        o_ref[:] = out

    oshape = ((BS, LANE) if out_rank == 0 else (L, BS, LANE))
    bspec2 = pl.BlockSpec((BS, LANE), lambda: (0, 0),
                          memory_space=pltpu.VMEM)
    bspec3 = pl.BlockSpec((L, BS, LANE), lambda: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    t0 = time.time()
    try:
        with transcend.mosaic_safe():
            out = pl.pallas_call(
                kernel,
                in_specs=[bspec2, bspec3],
                out_specs=bspec2 if out_rank == 0 else bspec3,
                out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(s_t, v_in)
        out = np.asarray(out)

        # reference: plain single-vmap on CPU-side XLA
        ref = jax.vmap(col_fn, in_axes=(0, 1),
                       out_axes=(0 if out_rank == 0 else 1))(
            s_in, v_in.reshape(L, n))
        ref = np.asarray(ref)
        got = out.reshape(-1) if out_rank == 0 else out.reshape(L, -1)
        ok = np.allclose(got, ref, rtol=1e-6, atol=1e-6)
        print(f"{name}: COMPILE_OK ({time.time()-t0:.1f}s) "
              f"values_{'OK' if ok else 'MISMATCH'}", flush=True)
    except Exception as e:
        lines = [ln for ln in str(e).splitlines()
                 if "Mosaic" in ln or "error" in ln.lower()][:2]
        print(f"{name}: FAIL ({time.time()-t0:.1f}s) "
              + (" | ".join(lines))[:300], flush=True)


PATTERNS = {}


def pattern(f):
    PATTERNS[f.__name__] = f
    return f


@pattern
def p1_elementwise(run):
    run("p1_elementwise", lambda s, v: jnp.sum(v * s), 0)


@pattern
def p2_arange_mask(run):
    def col(s, v):
        top = (s > 1.5).astype(jnp.int32) * 3
        active = jnp.arange(L) >= top
        return jnp.sum(jnp.where(active, v, 0.0))
    run("p2_arange_mask", col, 0)


@pattern
def p3_stack_mask(run):
    def col(s, v):
        top = (s > 1.5).astype(jnp.int32) * 3
        active = jnp.stack([jnp.asarray(i, jnp.int32) >= top
                            for i in range(L)])
        return jnp.sum(jnp.where(active, v, 0.0))
    run("p3_stack_mask", col, 0)


@pattern
def p4_concat_shift(run):
    def col(s, v):
        prev = jnp.concatenate([jnp.zeros(1, v.dtype), v[:-1]])
        return prev - v
    run("p4_concat_shift", col, 1)


@pattern
def p5_vsel(run):
    from noahmp_tpu.numerics.select import vsel

    def col(s, v):
        idx = (s > 1.5).astype(jnp.int32) * 2
        return vsel(v, idx)
    run("p5_vsel", col, 0)


@pattern
def p6_vset(run):
    from noahmp_tpu.numerics.select import vset

    def col(s, v):
        idx = (s > 1.5).astype(jnp.int32) * 2
        return vset(v, idx, s)
    run("p6_vset", col, 1)


@pattern
def p7_fori_carry(run):
    def col(s, v):
        def body(i, c):
            x, m = c
            x2 = x + 0.01 * jnp.sum(v) * jnp.exp(-x)
            m2 = transcend.carry_mask(
                (m != 0) | (jnp.abs(x2 - x) < 1e-3))
            return jnp.where(m2 != 0, x, x2), m2
        x, m = jax.lax.fori_loop(
            0, 5, body, (s, transcend.carry_mask(s > 1e9)))
        return x
    run("p7_fori_carry", col, 0)


@pattern
def p8_where_scalar_layer(run):
    def col(s, v):
        return jnp.where(s > 1.5, v * 2.0, v)
    run("p8_where_scalar_layer", col, 1)


@pattern
def p9_cumsum(run):
    from noahmp_tpu.numerics.select import cumsum_small

    def col(s, v):
        return cumsum_small(v)
    run("p9_cumsum", col, 1)


@pattern
def p10_vperm(run):
    from noahmp_tpu.numerics.select import vperm

    def col(s, v):
        shift = (s > 1.5).astype(jnp.int32)
        idx = jnp.clip(jnp.arange(L) + shift, 0, L - 1)
        return vperm(v, idx)
    run("p10_vperm", col, 1)


def main():
    which = (sys.argv[1] if len(sys.argv) > 1 else "all")
    names = sorted(PATTERNS) if which == "all" else which.split(",")
    for nm in names:
        key = nm if nm in PATTERNS else next(
            (k for k in PATTERNS if k.startswith(nm)), None)
        if key:
            PATTERNS[key](run_pattern)


if __name__ == "__main__":
    main()


def _register_vege_probes():
    import jax
    from jax import lax

    @pattern
    def p11_two_phase_loop(run):
        def col(s, v):
            def iteration(c, first, rs):
                x, m = c
                if rs is None:
                    rs = jnp.exp(-x)  # "stomata once"
                x2 = x + 0.1 * rs * jnp.sum(v) - 0.05 * x
                return (x2, m), rs
            c, rs = iteration((s, s * 0.0), True, None)

            def body(i, c):
                c2, _ = iteration(c, False, rs)
                return c2
            x, m = lax.fori_loop(0, 4, body, c)
            return x
        run("p11_two_phase_loop", col, 0)

    @pattern
    def p12_freeze_merge(run):
        def col(s, v):
            def iteration(c):
                x, done = c
                x2 = x + 0.1 * jnp.sum(v) * jnp.exp(-x)
                done_b = done != 0
                new = (x2, transcend.carry_mask(
                    done_b | (jnp.abs(x2 - x) < 1e-4)))
                return jax.tree.map(
                    lambda old, upd: jnp.where(done_b, old, upd),
                    c, new)

            def body(i, c):
                return iteration(c)
            x, _ = lax.fori_loop(
                0, 5, body, (s, transcend.carry_mask(s > 1e9)))
            return x
        run("p12_freeze_merge", col, 0)

    @pattern
    def p13_loop_index_mask(run):
        def col(s, v):
            def body(i, c):
                x, lit = c
                it_ge5 = (i + 2) >= 5   # uniform (unbatched) bool
                lit_b = lit != 0
                dx = 0.1 * jnp.sum(v) * jnp.exp(-x)
                lit2 = lit_b | (it_ge5 & (jnp.abs(dx) <= 0.01)
                                & ~lit_b)
                x2 = jnp.where(lit_b, x, x + dx)
                return x2, transcend.carry_mask(lit2)
            x, _ = lax.fori_loop(
                0, 8, body, (s, transcend.carry_mask(s > 1e9)))
            return x
        run("p13_loop_index_mask", col, 0)

    @pattern
    def p14_diag_log(run):
        def col(s, v):
            fv, fh2 = s * 0.1, s * 0.01
            cah2 = fv * 0.4 / (jnp.log((2.0 + 0.1) / 0.1) - fh2)
            small = cah2 < 1.0e-5
            return jnp.where(small, s,
                             s - jnp.sum(v) / jnp.maximum(cah2, 1e-6))
        run("p14_diag_log", col, 0)


_register_vege_probes()


if __name__ == "__main__":
    main()  # re-run with the late-registered probes included
