"""One-hot select replacements for tiny-axis dynamic indexing.

The column physics indexes fixed, tiny vertical axes (MSNOW=3 snow
slots, NSOIL=4 soil layers, 12 climatology months) with *traced*
integers — the snow-layer shuffles (snow.py), the water-table layer
(soilwater.py groundwater), the phenology month.  Lowered naively these
become per-point gather/scatter HLOs: Mosaic (Pallas TPU) has no
general gather lowering, and under ``vmap`` XLA scatters serialize on
the TPU vector unit.  Over an axis of length 3–12, a one-hot
compare-and-select is both Mosaic-lowerable and faster: pure VPU
selects that fuse into the surrounding elementwise pipeline.

All helpers are exact (bit-identical to the gather/scatter they
replace): the index is assumed in-bounds, so exactly one lane matches
and the select/sum touches exactly the indexed element.
"""

import jax.numpy as jnp


def _iota(x):
    return jnp.arange(x.shape[-1])


def vsel(x, idx):
    """x[..., idx] with a traced in-bounds ``idx`` (scalar per column):
    one-hot masked sum over the tiny last axis."""
    return jnp.sum(jnp.where(_iota(x) == idx, x, 0), axis=-1)


def vset(x, idx, val):
    """x.at[..., idx].set(val) with a traced index."""
    return jnp.where(_iota(x) == idx, val, x)


def vadd(x, idx, val):
    """x.at[..., idx].add(val) with a traced index."""
    return jnp.where(_iota(x) == idx, x + val, x)


def cumsum_small(x):
    """Sequential prefix sum over the tiny last axis (3..100 elems):
    same left-to-right association as a serial cumsum, built from
    static slices + adds so Mosaic can lower it (no cumsum rule)."""
    outs = []
    acc = None
    for k in range(x.shape[-1]):
        acc = x[..., k] if acc is None else acc + x[..., k]
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


def vperm(x, idxvec):
    """x[idxvec] for a traced in-bounds index vector over the same tiny
    axis (the snow divide() top-aligned permutation): one-hot matrix
    select, L x L compares for axis length L."""
    onehot = idxvec[:, None] == _iota(x)[None, :]
    return jnp.sum(jnp.where(onehot, x[None, :], 0), axis=-1)
