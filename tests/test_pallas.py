"""Pallas kernel tests (interpret mode on CPU; the same kernels compile
with Mosaic on real TPUs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from noahmp_tpu.numerics.tridiag import thomas
from noahmp_tpu.pallas.tridiag import thomas_pallas


@pytest.mark.parametrize("L", [4, 7])
def test_thomas_pallas_matches_xla(L):
    rng = np.random.default_rng(0)
    n = 2048
    b = rng.uniform(1.5, 3.0, (n, L)).astype(np.float32)
    a = rng.uniform(-0.5, 0.5, (n, L)).astype(np.float32)
    c = rng.uniform(-0.5, 0.5, (n, L)).astype(np.float32)
    d = rng.uniform(-1.0, 1.0, (n, L)).astype(np.float32)
    a[:, 0] = 0.0
    c[:, -1] = 0.0
    x_ref = np.asarray(thomas(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(c), jnp.asarray(d)))
    x_pl = np.asarray(thomas_pallas(jnp.asarray(a), jnp.asarray(b),
                                    jnp.asarray(c), jnp.asarray(d),
                                    block=512, interpret=True))
    np.testing.assert_allclose(x_pl, x_ref, rtol=1e-6, atol=1e-6)


def test_thomas_pallas_ragged_batch():
    """n not divisible by block pads with identity rows."""
    rng = np.random.default_rng(1)
    n, L = 700, 7
    b = rng.uniform(1.5, 3.0, (n, L)).astype(np.float32)
    a = np.zeros((n, L), np.float32)
    c = np.zeros((n, L), np.float32)
    d = rng.uniform(-1.0, 1.0, (n, L)).astype(np.float32)
    x = np.asarray(thomas_pallas(jnp.asarray(a), jnp.asarray(b),
                                 jnp.asarray(c), jnp.asarray(d),
                                 block=512, interpret=True))
    np.testing.assert_allclose(x, d / b, rtol=1e-6)


def test_fused_column_step_interpret():
    """The fused Pallas column kernel reproduces the XLA step exactly
    (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from noahmp_tpu.params import load_params
    from noahmp_tpu.options import Options
    from noahmp_tpu.state import init_state, init_static, Forcing
    from noahmp_tpu.driver.step import make_step
    from noahmp_tpu.pallas.column import make_pallas_step

    n = 8
    params = load_params()
    opts = Options()
    static = init_static(n, lutyp=7, sltyp=6)
    state = init_state(n)

    def rep(v):
        return jnp.broadcast_to(jnp.float32(v), (n,))
    forcing = Forcing(
        sfctmp=rep(293.0), sfcprs=rep(90000.0), psfc=rep(90000.0),
        uu=rep(3.0), vv=rep(1.0), q2=rep(0.007), soldn=rep(500.0),
        lwdn=rep(330.0), prcp=rep(0.001), cosz=rep(0.6),
        co2air=rep(39.0), o2air=rep(18900.0), foln=rep(1.0),
        julian=rep(180.0), yearlen=rep(366.0))

    ref_step = make_step(params, opts, 900.0, jit=False)
    s_ref, f_ref = ref_step(static, forcing, state)

    pl_step = make_pallas_step(params, opts, 900.0, static, block=4,
                               interpret=True)
    s_pl, f_pl = pl_step(forcing, state)

    # pre-gathered params change constant-folding order; agreement is
    # f32 round-off level, not bitwise
    for name in ("tg", "tv", "stc", "swc", "smc", "sneqv", "eah"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_pl, name)),
            np.asarray(getattr(s_ref, name)), rtol=1e-4, atol=5e-3,
            err_msg=name)
    for name in ("fsa", "fsh", "fgev", "ssoil"):
        np.testing.assert_allclose(
            np.asarray(getattr(f_pl, name)),
            np.asarray(getattr(f_ref, name)), rtol=1e-3, atol=0.5,
            err_msg=name)
    assert np.max(np.abs(np.asarray(f_pl.errwat))) < 0.01
    assert np.max(np.abs(np.asarray(f_pl.erreng))) < 0.05
