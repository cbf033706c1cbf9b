"""Experimental fused column-step Pallas kernel.

One kernel invocation advances a block of land points entirely in VMEM:
state (~320 B/point) is loaded once, every intermediate of the column
physics lives on-chip, and the new state + fluxes are written once —
eliminating the materialized-intermediate HBM traffic that bounds the
XLA path (PERF.md lever 3).

Parameters are pre-gathered per point (params/gathered.py) so the
kernel contains no table gathers; scalar parameters are inlined as
constants.  The kernel body is the *same* column physics
(physics/sflx.py) vmapped over the block — no second implementation.

Status: numerically validated in interpret mode (tests/test_pallas.py);
Mosaic compilation on real TPUs is gated behind
``tuning.USE_PALLAS_STEP`` pending compile-time evaluation on a direct
(non-relay) TPU stack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params.gathered import gather_params, PreGathered
from ..physics.sflx import column_step
from ..state import Flux

DEFAULT_BLOCK = 256


def _split_batched(tree, n):
    """Flatten a pytree into kernel inputs.  Leaves already batched
    (leading dim n) pass through; scalar/replicated leaves are
    broadcast to a batched form (Pallas kernels may not capture array
    constants).  Returns (arrays, (treedef, spec)) where spec marks
    which leaves were broadcast."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    batched, spec = [], []
    for leaf in leaves:
        arr = jnp.asarray(leaf)
        if arr.ndim >= 1 and arr.shape[0] == n:
            spec.append(("b", len(batched)))
            batched.append(arr)
        else:
            spec.append(("r", len(batched)))
            batched.append(jnp.broadcast_to(arr, (n,) + arr.shape))
    return batched, (treedef, spec)


def _rebuild(template, blocks):
    treedef, spec = template
    leaves = []
    for kind, idx in spec:
        v = blocks[idx]
        leaves.append(v if kind == "b" else v[0])
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_pallas_step(params, opts, dt, static, block: int = DEFAULT_BLOCK,
                     interpret: bool = False):
    """Build a fused step(forcing, state) -> (state, flux) for a fixed
    domain ``static``.  n must be a multiple of ``block``."""
    n = static.lat.shape[0]
    assert n % block == 0, f"n={n} must be a multiple of block={block}"

    gathered = gather_params(params, static.lutyp, static.sltyp,
                             static.isc, static.slptyp)

    gp_b, gp_t = _split_batched(gathered, n)
    st_b, st_t = _split_batched(static, n)
    n_gp, n_st = len(gp_b), len(st_b)

    # vmap axes for the gathered params: PreGathered nodes carry axis 0
    axes_params = jax.tree_util.tree_map(
        lambda x: PreGathered(0) if isinstance(x, PreGathered) else None,
        gathered, is_leaf=lambda x: isinstance(x, PreGathered))

    def _column(params_g, static_c, forcing_c, state_c):
        return column_step(params_g, opts, static_c, forcing_c, state_c,
                           jnp.asarray(dt, jnp.float32))

    def kernel(*refs):
        # unpack refs: gathered params | static | forcing | state
        vals = [r[:] for r in refs[:len(in_arrays)]]
        outs = refs[len(in_arrays):]
        gp = _rebuild(gp_t, vals[:n_gp])
        stt = _rebuild(st_t, vals[n_gp:n_gp + n_st])
        k = n_gp + n_st
        fc = jax.tree_util.tree_unflatten(fo_tdef, vals[k:k + n_fo])
        sv = jax.tree_util.tree_unflatten(stv_tdef,
                                          vals[k + n_fo:])
        new_state, flux = jax.vmap(
            _column, in_axes=(axes_params, 0, 0, 0))(gp, stt, fc, sv)
        out_leaves = (jax.tree_util.tree_leaves(new_state)
                      + jax.tree_util.tree_leaves(flux))
        for o_ref, leaf in zip(outs, out_leaves):
            o_ref[:] = leaf

    def step(forcing, state):
        nonlocal in_arrays, fo_tdef, stv_tdef, n_fo
        fo_leaves, fo_tdef = jax.tree_util.tree_flatten(forcing)
        stv_leaves, stv_tdef = jax.tree_util.tree_flatten(state)
        n_fo = len(fo_leaves)
        in_arrays = gp_b + st_b + fo_leaves + stv_leaves

        def bspec(arr):
            shape = (block,) + arr.shape[1:]
            ix = (lambda i: (i,) + (0,) * (arr.ndim - 1))
            return pl.BlockSpec(shape, ix, memory_space=pltpu.VMEM)

        out_shapes = ([jax.ShapeDtypeStruct(x.shape, x.dtype)
                       for x in stv_leaves]
                      + [jax.ShapeDtypeStruct((n,), jnp.float32)
                         for _ in Flux._fields])
        out_specs = [bspec(jnp.zeros(s.shape, s.dtype))
                     for s in out_shapes]

        from ..numerics import transcend
        with transcend.mosaic_safe():
            outs = pl.pallas_call(
                kernel,
                grid=(n // block,),
                in_specs=[bspec(a) for a in in_arrays],
                out_specs=out_specs,
                out_shape=out_shapes,
                interpret=interpret,
            )(*in_arrays)

        n_state = len(stv_leaves)
        new_state = jax.tree_util.tree_unflatten(stv_tdef,
                                                 outs[:n_state])
        flux = Flux(*outs[n_state:])
        return new_state, flux

    in_arrays = None
    fo_tdef = stv_tdef = None
    n_fo = 0
    return step
