"""Tridiagonal (Thomas) solver.

The reference's rosr12 (core/module_noahmp_func.f90:4240-4288) solves a
<=7-row system per column with a variable top index.  Here the solve is
written over a fixed number of rows, fully unrolled (n is 4 or 7), as
pure elementwise ops — under ``vmap`` this becomes a batched solver with
perfect lockstep, which XLA fuses into a handful of vector ops; no Pallas
needed at these sizes.

Variable-top systems are handled by passing identity rows
(a=c=0, b=1, d=0) for inactive slots; because the first active row has
a=0, the forward elimination never mixes inactive rows into active ones.
"""

import jax.numpy as jnp


def thomas(a, b, c, d):
    """Solve the tridiagonal system along the last axis.

    a: sub-diagonal (a[...,0] ignored), b: diagonal, c: super-diagonal
    (c[...,n-1] ignored), d: right-hand side.  Returns x.
    """
    n = a.shape[-1]
    # forward elimination
    p = [None] * n
    q = [None] * n
    p[0] = -c[..., 0] / b[..., 0]
    q[0] = d[..., 0] / b[..., 0]
    for k in range(1, n):
        denom = b[..., k] + a[..., k] * p[k - 1]
        p[k] = -c[..., k] / denom
        q[k] = (d[..., k] - a[..., k] * q[k - 1]) / denom
    # back substitution
    x = [None] * n
    x[n - 1] = q[n - 1]
    for k in range(n - 2, -1, -1):
        x[k] = p[k] * x[k + 1] + q[k]
    return jnp.stack(x, axis=-1)


def masked_identity_rows(active, a, b, c, d):
    """Replace rows where ``active`` is False with identity rows so a
    variable-top system can run through the fixed-size solve."""
    a = jnp.where(active, a, 0.0)
    b = jnp.where(active, b, 1.0)
    c = jnp.where(active, c, 0.0)
    d = jnp.where(active, d, 0.0)
    return a, b, c, d
