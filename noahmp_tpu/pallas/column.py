"""Fused column-step Pallas kernel.

One kernel invocation advances a block of land points entirely in VMEM:
state (~320 B/point) is loaded once, every intermediate of the column
physics lives on-chip, and the new state + fluxes are written once —
eliminating the materialized-intermediate HBM traffic that bounds the
XLA path (PERF.md lever 3).

Layout: **lane-major** — every array is rank-2 with the land-point
axis LAST, so a block tiles as (layers -> sublanes, points -> 128
lanes).  Per-point scalars are (1, n).  This is the natural TPU tiling
for layer vectors (L in {3,4,7,12} pads to 8/16 sublanes instead of
128 lanes) and it is required by Mosaic: rank-1 blocked operands fail
layout verification, and sub-32-bit (bool) minor-dim broadcasts are
unsupported (see numerics/transcend.mosaic_safe, which also reroutes
bool broadcasts through int32 — a measured Mosaic layout-pass hang
otherwise).

Parameters are pre-gathered per point (params/gathered.py) so the
kernel contains no table gathers; the kernel body is the *same* column
physics (physics/sflx.py) vmapped over the lane axis — no second
implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params.gathered import gather_params, PreGathered
from ..physics.sflx import column_step
from ..state import Flux
from ..numerics import transcend

DEFAULT_BLOCK = 256


def _to_lane(arr):
    """Batch-major (n, ...) leaf -> lane-major rank>=2 (..., n)."""
    arr = jnp.asarray(arr)
    if arr.ndim == 1:
        return arr.reshape(1, -1)
    return jnp.moveaxis(arr, 0, -1)


def _from_lane(arr, col_ndim):
    """Lane-major (..., n) -> batch-major (n, ...)."""
    if col_ndim == 0:
        return arr.reshape(-1)
    return jnp.moveaxis(arr, -1, 0)


def _split_batched(tree, n):
    """Flatten a pytree into lane-major kernel inputs.  Leaves already
    batched (leading dim n) are transposed to (..., n); scalar or
    replicated leaves are broadcast to (..., n) (Pallas kernels may
    not capture array constants).  Returns (arrays, (treedef, spec))
    where spec marks which leaves were broadcast."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    batched, spec = [], []
    for leaf in leaves:
        arr = jnp.asarray(leaf)
        if arr.ndim >= 1 and arr.shape[0] == n:
            spec.append(("b", len(batched), arr.shape[1:]))
            batched.append(_to_lane(arr))
        else:
            spec.append(("r", len(batched), arr.shape))
            wide = jnp.broadcast_to(arr[..., None], arr.shape + (n,))
            if wide.ndim == 1:
                wide = wide.reshape(1, -1)
            batched.append(wide)
    return batched, (treedef, spec)


def _rebuild(template, blocks, drop_replicated):
    """Kernel-side inverse of _split_batched.  Batched leaves pass
    through lane-major for in_axes=-1 consumption.  Replicated leaves
    either keep their broadcast lane axis (drop_replicated=False, for
    trees vmapped with a blanket -1) or slice lane 0 back to the
    original shape (drop_replicated=True, for trees whose vmap axes
    mark them None)."""
    treedef, spec = template
    leaves = []
    for kind, idx, shape in spec:
        v = blocks[idx]
        if kind == "r" and drop_replicated:
            v = v[..., 0].reshape(shape)
        elif kind == "b" and shape == ():
            # per-point scalars travel as (1, block) rank-2 at the
            # pallas boundary; the vmapped physics wants (block,)
            v = v.reshape(-1)
        leaves.append(v)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_pallas_step(params, opts, dt, static, block: int = DEFAULT_BLOCK,
                     interpret: bool = False):
    """Build a fused step(forcing, state) -> (state, flux) for a fixed
    domain ``static``.  n must be a multiple of ``block``.  Inputs and
    outputs use the standard batch-major (n, ...) convention; the
    lane-major transposes happen at the kernel boundary."""
    n = static.lat.shape[0]
    assert n % block == 0, f"n={n} must be a multiple of block={block}"

    gathered = gather_params(params, static.lutyp, static.sltyp,
                             static.isc, static.slptyp)

    gp_b, gp_t = _split_batched(gathered, n)
    st_b, st_t = _split_batched(static, n)
    n_gp, n_st = len(gp_b), len(st_b)

    # vmap axes: every lane-major leaf batches on -1 (PreGathered
    # wrappers carry the axis for the param sub-pytrees); replicated
    # leaves map None and are un-broadcast by _rebuild
    axes_params = jax.tree_util.tree_map(
        lambda x: PreGathered(-1) if isinstance(x, PreGathered) else None,
        gathered, is_leaf=lambda x: isinstance(x, PreGathered))
    st_axes = jax.tree_util.tree_unflatten(
        st_t[0], [-1 if k == "b" else None for k, _i, _s in st_t[1]])

    def _column(params_g, static_c, forcing_c, state_c):
        return column_step(params_g, opts, static_c, forcing_c, state_c,
                           jnp.asarray(dt, jnp.float32))

    def kernel(*refs):
        # unpack refs: gathered params | static | forcing | state
        vals = [r[:] for r in refs[:len(in_arrays)]]
        outs = refs[len(in_arrays):]
        gp = _rebuild(gp_t, vals[:n_gp], drop_replicated=True)
        stt = _rebuild(st_t, vals[n_gp:n_gp + n_st],
                       drop_replicated=True)
        k = n_gp + n_st
        fc = jax.tree_util.tree_unflatten(
            fo_tdef, [v.reshape(-1) if nd == 0 else v
                      for v, nd in zip(vals[k:k + n_fo], fo_ndims)])
        sv = jax.tree_util.tree_unflatten(
            stv_tdef, [v.reshape(-1) if nd == 0 else v
                       for v, nd in zip(vals[k + n_fo:], col_ndims)])
        new_state, flux = jax.vmap(
            _column, in_axes=(axes_params, st_axes, -1, -1),
            out_axes=-1)(gp, stt, fc, sv)
        out_leaves = (jax.tree_util.tree_leaves(new_state)
                      + jax.tree_util.tree_leaves(flux))
        for o_ref, leaf in zip(outs, out_leaves):
            o_ref[:] = leaf.reshape(1, -1) if leaf.ndim == 1 else leaf

    def step(forcing, state):
        nonlocal in_arrays, fo_tdef, stv_tdef, n_fo, fo_ndims, col_ndims
        fo_bm, fo_tdef = jax.tree_util.tree_flatten(forcing)
        stv_bm, stv_tdef = jax.tree_util.tree_flatten(state)
        fo_ndims = [jnp.ndim(x) - 1 for x in fo_bm]
        col_ndims = [jnp.ndim(x) - 1 for x in stv_bm]
        fo_leaves = [_to_lane(x) for x in fo_bm]
        stv_leaves = [_to_lane(x) for x in stv_bm]
        n_fo = len(fo_leaves)
        in_arrays = gp_b + st_b + fo_leaves + stv_leaves

        def bspec(shape):
            bshape = shape[:-1] + (block,)
            nlead = len(shape) - 1
            ix = (lambda i, _n=nlead: (0,) * _n + (i,))
            return pl.BlockSpec(bshape, ix, memory_space=pltpu.VMEM)

        out_shapes = ([jax.ShapeDtypeStruct(x.shape, x.dtype)
                       for x in stv_leaves]
                      + [jax.ShapeDtypeStruct((1, n), jnp.float32)
                         for _ in Flux._fields])
        out_specs = [bspec(s.shape) for s in out_shapes]

        with transcend.mosaic_safe():
            outs = pl.pallas_call(
                kernel,
                grid=(n // block,),
                in_specs=[bspec(a.shape) for a in in_arrays],
                out_specs=out_specs,
                out_shape=out_shapes,
                interpret=interpret,
            )(*in_arrays)

        n_state = len(stv_leaves)
        new_state = jax.tree_util.tree_unflatten(
            stv_tdef, [_from_lane(o, nd)
                       for o, nd in zip(outs[:n_state], col_ndims)])
        flux = Flux(*[o.reshape(-1) for o in outs[n_state:]])
        return new_state, flux

    in_arrays = None
    fo_tdef = stv_tdef = None
    n_fo = 0
    fo_ndims = col_ndims = ()
    return step
