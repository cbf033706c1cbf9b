"""Pallas TPU kernel: batched tridiagonal (Thomas) solve.

Solves n independent L-row systems (L = 4 or 7; the soil-moisture and
snow/soil-heat systems).  Layout: coefficients arrive batch-major
(n, L); the kernel processes a block of points at a time entirely in
VMEM with the recurrence unrolled over L — the batch dimension rides
the 128-wide lanes, so each recurrence step is one fused VPU op chain.

The pure-XLA fallback (numerics/tridiag.py) produces identical math;
this kernel exists to (a) pin the solve into a single fusion with no
HBM round-trips and (b) serve as the template for the fused column
kernel (PERF.md lever 3).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 1024


def _thomas_kernel(a_ref, b_ref, c_ref, d_ref, x_ref):
    a = a_ref[:]      # (block, L)
    b = b_ref[:]
    c = c_ref[:]
    d = d_ref[:]
    L = a.shape[-1]
    p = [None] * L
    q = [None] * L
    p[0] = -c[:, 0] / b[:, 0]
    q[0] = d[:, 0] / b[:, 0]
    for k in range(1, L):
        denom = b[:, k] + a[:, k] * p[k - 1]
        p[k] = -c[:, k] / denom
        q[k] = (d[:, k] - a[:, k] * q[k - 1]) / denom
    x = [None] * L
    x[L - 1] = q[L - 1]
    for k in range(L - 2, -1, -1):
        x[k] = p[k] * x[k + 1] + q[k]
    x_ref[:] = jnp.stack(x, axis=-1)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def thomas_pallas(a, b, c, d, block: int = DEFAULT_BLOCK,
                  interpret: bool = False):
    """Batched Thomas solve of (n, L) systems.  n must be a multiple of
    ``block`` (pad with identity rows otherwise)."""
    n, L = a.shape
    if n % block:
        pad = block - n % block

        def padded(x, diag):
            fill = jnp.ones((pad, L), x.dtype) if diag \
                else jnp.zeros((pad, L), x.dtype)
            return jnp.concatenate([x, fill], axis=0)

        out = thomas_pallas(padded(a, False), padded(b, True),
                            padded(c, False), padded(d, False),
                            block=block, interpret=interpret)
        return out[:n]

    grid = (n // block,)
    spec = pl.BlockSpec((block, L), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct((n, L), a.dtype),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a, b, c, d)
