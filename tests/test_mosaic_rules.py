"""The mosaic_safe() trace-time rewrites (bool broadcast reroute,
layout-preserving concatenate batcher, transpose decomposition,
concrete-iota splat expansion) must be value-preserving: any vmapped
program traced under mosaic_safe computes exactly what the stock rules
compute.  These run the rewrites on CPU (no Mosaic needed — the
patches act at trace time)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from noahmp_tpu.numerics import transcend
from noahmp_tpu.numerics.select import vsel, vset, vadd, vperm, \
    cumsum_small
from noahmp_tpu.pallas.column import _dvmap

L = 7
BS, LANE = 4, 8  # small tile for CPU


def _run(col_fn, out_rank):
    n = BS * LANE
    s = jnp.linspace(1.0, 2.0, n, dtype=jnp.float32)
    v = jnp.linspace(0.0, 1.0, n * L,
                     dtype=jnp.float32).reshape(L, BS, LANE)

    ref = jax.vmap(col_fn, in_axes=(0, 1),
                   out_axes=(0 if out_rank == 0 else 1))(
        s, v.reshape(L, n))

    with transcend.mosaic_safe():
        got = _dvmap(col_fn, (-1, -1), -1)(s.reshape(BS, LANE), v)
    got = np.asarray(got)
    got = got.reshape(-1) if out_rank == 0 else got.reshape(L, -1)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=0, atol=0)


CASES = {
    "shift_concat": (lambda s, v: jnp.concatenate(
        [jnp.zeros(1, v.dtype), v[:-1]]) - v, 1),
    "arange_mask": (lambda s, v: jnp.sum(jnp.where(
        jnp.arange(L) >= (s > 1.5).astype(jnp.int32) * 3, v, 0.0)), 0),
    "vsel": (lambda s, v: vsel(v, (s > 1.5).astype(jnp.int32) * 2), 0),
    "vset": (lambda s, v: vset(v, (s > 1.5).astype(jnp.int32) * 2, s),
             1),
    "vadd": (lambda s, v: vadd(v, (s > 1.2).astype(jnp.int32), s), 1),
    "vperm": (lambda s, v: vperm(v, jnp.clip(
        jnp.arange(L) + (s > 1.5).astype(jnp.int32), 0, L - 1)), 1),
    "cumsum": (lambda s, v: cumsum_small(v), 1),
    "stack": (lambda s, v: jnp.stack(
        [s, s * 2, jnp.sum(v)], axis=0) * 1.0, None),
    "bool_layer_where": (lambda s, v: jnp.where(
        (v > 0.5) & (s > 1.5), v, -v), 1),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_mosaic_rules_value_preserving(name):
    col, rank = CASES[name]
    if rank is None:  # stack case: (3,) output
        n = BS * LANE
        s = jnp.linspace(1.0, 2.0, n, dtype=jnp.float32)
        v = jnp.linspace(0.0, 1.0, n * L,
                         dtype=jnp.float32).reshape(L, BS, LANE)
        ref = jax.vmap(col, in_axes=(0, 1), out_axes=1)(
            s, v.reshape(L, n))
        with transcend.mosaic_safe():
            got = _dvmap(col, (-1, -1), -1)(s.reshape(BS, LANE), v)
        np.testing.assert_allclose(
            np.asarray(got).reshape(3, -1), np.asarray(ref),
            rtol=0, atol=0)
    else:
        _run(col, rank)


def test_patch_is_thread_confined():
    """Another thread tracing concurrently must see stock semantics."""
    import threading
    results = {}

    def other_thread():
        # concatenate under vmap without mosaic_safe on THIS thread
        f = lambda v: jnp.concatenate(  # noqa: E731
            [jnp.zeros(1, v.dtype), v[:-1]])
        x = jnp.arange(12.0, dtype=jnp.float32).reshape(3, 4)
        results["other"] = np.asarray(jax.vmap(f, 1, 1)(x))

    with transcend.mosaic_safe():
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
    x = np.arange(12.0, dtype=np.float32).reshape(3, 4)
    expect = np.stack([np.concatenate([[0.0], x[:-1, j]])
                       for j in range(4)], axis=1)
    np.testing.assert_array_equal(results["other"], expect)


def test_patch_refcount_restores():
    from jax import lax
    orig = lax.broadcast_in_dim_p.bind
    with transcend.mosaic_safe():
        with transcend.mosaic_safe():
            assert lax.broadcast_in_dim_p.bind is not orig
        assert lax.broadcast_in_dim_p.bind is not orig
    assert lax.broadcast_in_dim_p.bind is orig
