"""Fused column-step Pallas kernel.

One kernel invocation advances a block of land points entirely in VMEM:
state (~320 B/point) is loaded once, every intermediate of the column
physics lives on-chip, and the new state + fluxes are written once —
eliminating the materialized-intermediate HBM traffic that bounds the
XLA path (71.7 KB/point per the TPU cost model, ROOFLINE_r03.json).

Layout: **tile-native rank >= 2** — the land-point axis is split into
(sublane-rows, 128 lanes), so a per-point scalar is a rank-2
``(bs, 128)`` tile and a layer vector is rank-3 ``(L, bs, 128)``.  The
column physics is double-vmapped over the two point axes, which means
*no rank-1 vectors exist anywhere in the kernel*: every operation
lowers onto full (8, 128) vregs with unambiguous layouts.  This is the
structural fix for the Mosaic "implicit dim" relayout failures that
plagued the lane-major rank-1 design (r2: i1 carries, bool broadcasts,
and finally an unlowerable ``"(8,128),-1" -> "(8,128),-2"`` relayout
in phenology) — those arose precisely from 1-D vectors whose layout
(lane-shaped vs sublane-replicated) Mosaic had to infer per op.

Parameters are pre-gathered per point (params/gathered.py) so the
kernel contains no table gathers; the kernel body is the *same* column
physics (physics/sflx.py) vmapped over the point tiles — no second
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

DEFAULT_BLOCK = 1024
LANE = 128


def _lane_of(n, block):
    """Lane width: 128 when shapes allow, else the block itself
    (small interpret-mode tests)."""
    return LANE if (block % LANE == 0 and n % LANE == 0) else block


def _to_tiles(arr, lane):
    """Batch-major (n, ...) leaf -> tile layout (..., n//lane, lane)."""
    arr = jnp.asarray(arr)
    n = arr.shape[0]
    lead = jnp.moveaxis(arr, 0, -1)          # (..., n)
    return lead.reshape(lead.shape[:-1] + (n // lane, lane))


def _from_tiles(arr, col_ndim):
    """Tile layout (..., ns, lane) -> batch-major (n, ...)."""
    flat = arr.reshape(arr.shape[:-2] + (-1,))
    if col_ndim == 0:
        return flat.reshape(-1)
    return jnp.moveaxis(flat, -1, 0)


def _split_batched(tree, n, lane):
    """Flatten a pytree into tile-layout kernel inputs.  Leaves already
    batched (leading dim n) are tiled to (..., ns, lane); scalar or
    replicated leaves travel as SMEM operands (Pallas kernels may not
    capture array constants, and extracting a scalar from a VMEM tile
    does not lower).  Returns (arrays, (treedef, spec)) where spec
    marks each leaf "b" (tiled) or "r" (SMEM scalar/vector)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    batched, spec = [], []
    for leaf in leaves:
        arr = jnp.asarray(leaf)
        if arr.ndim >= 1 and arr.shape[0] != n:
            # small replicated vectors (e.g. the (2,) per-band snow
            # omega/beta): broadcast per point so they tile uniformly
            # — SMEM only takes scalars, and a rank-1 kernel constant
            # would reintroduce the implicit-dim layout problem
            arr = jnp.broadcast_to(arr[None], (n,) + arr.shape)
        if arr.ndim >= 1 and arr.shape[0] == n:
            spec.append(("b", len(batched), arr.shape[1:]))
            batched.append(_to_tiles(arr, lane))
        else:
            spec.append(("r", len(batched), arr.shape))
            batched.append(arr.reshape(1))
    return batched, (treedef, spec)


def _rebuild(template, blocks):
    """Kernel-side inverse of _split_batched.  Batched leaves pass
    through in tile layout for double-vmap consumption; replicated
    (SMEM) leaves are reshaped back — a () scalar is read as value[0]
    so downstream arithmetic is scalar, not vector."""
    treedef, spec = template
    leaves = []
    for kind, idx, shape in spec:
        v = blocks[idx]
        if kind == "r":
            assert shape == (), ("non-scalar replicated leaves are "
                                 "not supported in the kernel")
        leaves.append(v)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _remap_axes(axes, to):
    """Replace every batched (-1) marker in an axes tree with ``to``,
    preserving None and the PreGathered wrappers."""
    return jax.tree_util.tree_map(
        lambda a: to if a == -1 else a, axes,
        is_leaf=lambda a: a is None or isinstance(a, int))


def _dvmap(f, in_axes, out_axes):
    """Double vmap over the two trailing point axes: outer maps the
    sublane-row axis (-2), inner the lane axis (-1), so the batch dims
    accumulate in tile order (bs, lane) and the boundary moveaxis is
    the identity — vmap boundary transposes do not lower on Mosaic.
    The column function still sees true scalars, identical semantics
    to the XLA path's single vmap."""
    inner = jax.vmap(f, in_axes=in_axes, out_axes=out_axes)
    return jax.vmap(inner, in_axes=_remap_axes(in_axes, -2),
                    out_axes=_remap_axes(out_axes, -2))


def make_pallas_step(params, opts, dt, static, block: int = DEFAULT_BLOCK,
                     interpret: bool = False):
    """Build a fused step(forcing, state) -> (state, flux) for a fixed
    domain ``static``.  n must be a multiple of ``block`` (and block a
    multiple of 128 for the Mosaic path).  Inputs and outputs use the
    standard batch-major (n, ...) convention; the tile-layout
    transposes happen at the kernel boundary."""
    n = static.lat.shape[0]
    assert n % block == 0, f"n={n} must be a multiple of block={block}"
    lane = _lane_of(n, block)
    # the (1, block) fallback tiles are only valid in interpret mode;
    # on the Mosaic path they produce an obscure lowering failure, so
    # reject them up front with an actionable message
    assert interpret or lane == LANE, (
        f"Mosaic path requires block ({block}) and n ({n}) to be "
        f"multiples of {LANE}; got lane={lane}. Use interpret=True for "
        f"small test shapes.")
    bs = block // lane

    gathered = gather_params(params, static.lutyp, static.sltyp,
                             static.isc, static.slptyp)

    gp_b, gp_t = _split_batched(gathered, n, lane)
    st_b, st_t = _split_batched(static, n, lane)
    n_gp, n_st = len(gp_b), len(st_b)

    def _kinds_of(template, arrays):
        ks = [None] * len(arrays)
        for kind, idx, _shape in template[1]:
            ks[idx] = kind
        return ks

    gp_st_kinds = _kinds_of(gp_t, gp_b) + _kinds_of(st_t, st_b)

    class _BKinds:
        """kinds for the full in_arrays list: gp/st prefix is known at
        build time; every forcing/state leaf is tiled ("b")."""
        def __getitem__(self, i):
            return gp_st_kinds[i] if i < len(gp_st_kinds) else "b"

        def __iter__(self):
            for i in range(len(in_arrays)):
                yield self[i]

    build_kinds = _BKinds()

    # vmap axes from the split spec: every tiled leaf batches on -1
    # (unflattening through the treedef rebuilds the PreGathered
    # wrappers around the axis), SMEM scalars map None
    axes_params = jax.tree_util.tree_unflatten(
        gp_t[0], [-1 if k == "b" else None for k, _i, _s in gp_t[1]])
    st_axes = jax.tree_util.tree_unflatten(
        st_t[0], [-1 if k == "b" else None for k, _i, _s in st_t[1]])

    def _column(params_g, static_c, forcing_c, state_c):
        return column_step(params_g, opts, static_c, forcing_c, state_c,
                           jnp.asarray(dt, jnp.float32))

    def kernel(*refs):
        # unpack refs: gathered params | static | forcing | state.
        # SMEM refs ("r") allow only scalar loads: read element 0 (all
        # replicated leaves are scalars; _split_batched flattens them).
        vals = [r[:] if k == "b" else r[0]
                for r, k in zip(refs[:len(in_arrays)], build_kinds)]
        outs = refs[len(in_arrays):]
        gp = _rebuild(gp_t, vals[:n_gp])
        stt = _rebuild(st_t, vals[n_gp:n_gp + n_st])
        k = n_gp + n_st
        fc = jax.tree_util.tree_unflatten(fo_tdef, vals[k:k + n_fo])
        sv = jax.tree_util.tree_unflatten(stv_tdef, vals[k + n_fo:])
        new_state, flux = _dvmap(
            _column, (axes_params, st_axes, -1, -1), -1)(gp, stt, fc, sv)
        out_leaves = (jax.tree_util.tree_leaves(new_state)
                      + jax.tree_util.tree_leaves(flux))
        for o_ref, leaf in zip(outs, out_leaves):
            o_ref[:] = leaf

    def step(forcing, state):
        nonlocal in_arrays, fo_tdef, stv_tdef, n_fo, col_ndims
        fo_bm, fo_tdef = jax.tree_util.tree_flatten(forcing)
        stv_bm, stv_tdef = jax.tree_util.tree_flatten(state)
        col_ndims = [jnp.ndim(x) - 1 for x in stv_bm]
        fo_leaves = [_to_tiles(x, lane) for x in fo_bm]
        stv_leaves = [_to_tiles(x, lane) for x in stv_bm]
        n_fo = len(fo_leaves)
        in_arrays = gp_b + st_b + fo_leaves + stv_leaves

        def bspec(shape):
            bshape = shape[:-2] + (bs, lane)
            nlead = len(shape) - 2
            ix = (lambda i, _n=nlead: (0,) * _n + (i, 0))
            return pl.BlockSpec(bshape, ix, memory_space=pltpu.VMEM)

        def sspec(shape):
            ix = (lambda i, _n=len(shape): (0,) * _n)
            return pl.BlockSpec(shape, ix, memory_space=pltpu.SMEM)

        in_kinds = list(build_kinds)

        out_shapes = ([jax.ShapeDtypeStruct(x.shape, x.dtype)
                       for x in stv_leaves]
                      + [jax.ShapeDtypeStruct((n // lane, lane),
                                              jnp.float32)
                         for _ in Flux._fields])
        out_specs = [bspec(s.shape) for s in out_shapes]

        import os
        from .. import tuning
        _dbg = os.environ.get("NOAHMP_PALLAS_DEBUG", "")
        # Rolled fori_loops are the default: the r5 splat-free
        # loop-carry inits (transcend.zeros_like) fixed the Mosaic
        # iter_arg relayouts that once forced full unrolling, and the
        # rolled kernel compiles ~50x faster with a far smaller scoped
        # VMEM stack.  NOAHMP_PALLAS_UNROLL=1 restores full unrolling
        # (straight-line body) for compilers where that wins.
        _unroll = os.environ.get("NOAHMP_PALLAS_UNROLL", "0") \
            not in ("0", "false")
        with transcend.mosaic_safe(), tuning.unroll_override(_unroll):
            outs = pl.pallas_call(
                kernel,
                grid=(n // block,),
                in_specs=[bspec(a.shape) if k == "b" else
                          sspec(a.shape)
                          for a, k in zip(in_arrays, in_kinds)],
                out_specs=out_specs,
                out_shape=out_shapes,
                interpret=interpret,
                debug=_dbg.lower() not in ("", "0", "false"),
                compiler_params=None if interpret else
                pltpu.CompilerParams(
                    # the column step's unrolled layer ops need more
                    # scoped VMEM stack than the 16 MiB default; v5e
                    # has 128 MiB VMEM per core, and the fully-unrolled
                    # straight-line body at bs=8 measures ~114 MiB of
                    # scoped stack — the limit and the block size trade
                    # off (halving the block halves the stack)
                    vmem_limit_bytes=int(os.environ.get(
                        "NOAHMP_PALLAS_VMEM_MB", "120")) * 1024 * 1024),
            )(*in_arrays)

        n_state = len(stv_leaves)
        new_state = jax.tree_util.tree_unflatten(
            stv_tdef, [_from_tiles(o, nd)
                       for o, nd in zip(outs[:n_state], col_ndims)])
        flux = Flux(*[_from_tiles(o, 0) for o in outs[n_state:]])
        return new_state, flux

    in_arrays = None
    fo_tdef = stv_tdef = None
    n_fo = 0
    col_ndims = ()
    return step
