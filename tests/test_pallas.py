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


REGIMES = {
    # day, warm, light rain (round-1/2 regime)
    "warm_day": dict(sfctmp=293.0, q2=0.007, soldn=500.0, lwdn=330.0,
                     prcp=0.001, cosz=0.6, state={}),
    # night, subfreezing, snowing onto an existing shallow pack
    "cold_snow": dict(sfctmp=265.0, q2=0.002, soldn=0.0, lwdn=220.0,
                      prcp=0.002, cosz=-0.2,
                      state=dict(tg=268.0, tv=266.0, sneqv=25.0,
                                 snowh=0.12, stc_soil=271.0)),
    # frozen ground, clear morning, no precip
    "frozen_morning": dict(sfctmp=270.0, q2=0.003, soldn=300.0,
                           lwdn=250.0, prcp=0.0, cosz=0.35,
                           state=dict(tg=269.0, tv=269.0,
                                      stc_soil=270.0)),
    # hot dry bare-ish conditions (stomata/canres stress branch)
    "hot_dry": dict(sfctmp=310.0, q2=0.004, soldn=900.0, lwdn=400.0,
                    prcp=0.0, cosz=0.9,
                    state=dict(tg=312.0, tv=309.0, swc=0.08,
                               smc=0.08)),
}


# default run keeps one snow and one unfrozen regime; the other two
# (same code paths, different numbers) are CI-only --runslow
_DEFAULT_REGIMES = ("cold_snow", "frozen_morning")


@pytest.mark.parametrize(
    "regime",
    [r if r in _DEFAULT_REGIMES else pytest.param(r, marks=pytest.mark.slow)
     for r in sorted(REGIMES)])
def test_fused_column_step_interpret(regime):
    """The fused Pallas column kernel reproduces the XLA step
    (interpret mode) across forcing regimes — snow, frozen soil, hot
    dry stress — on a heterogeneous block including the special
    land-use classes (urban/water/barren/ice)."""
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
    # mixed classes: forest, grass, urban(1), water(16), barren(19),
    # ice(24), cropland, shrub
    static = init_static(n, lutyp=7, sltyp=6)._replace(
        lutyp=np.array([7, 10, 1, 16, 19, 24, 2, 8], np.int32),
        sltyp=np.array([6, 4, 9, 14, 16, 12, 3, 7], np.int32),
        ist=np.array([1, 1, 1, 2, 1, 1, 1, 1], np.int32),
        ice=np.array([0, 0, 0, 0, 0, 1, 0, 0], np.int32))
    r = REGIMES[regime]
    skw = dict(r["state"])
    stc_soil = skw.pop("stc_soil", None)
    state = init_state(n, **skw)
    if stc_soil is not None:
        stc = np.asarray(state.stc).copy()
        stc[:, 3:] = stc_soil
        state = state._replace(stc=stc)

    def rep(v):
        return jnp.broadcast_to(jnp.float32(v), (n,))
    forcing = Forcing(
        sfctmp=rep(r["sfctmp"]), sfcprs=rep(90000.0),
        psfc=rep(90000.0), uu=rep(3.0), vv=rep(1.0), q2=rep(r["q2"]),
        soldn=rep(r["soldn"]), lwdn=rep(r["lwdn"]),
        prcp=rep(r["prcp"]), cosz=rep(r["cosz"]),
        co2air=rep(39.0), o2air=rep(18900.0), foln=rep(1.0),
        julian=rep(180.0), yearlen=rep(366.0))

    ref_step = make_step(params, opts, 900.0, jit=False)
    s_ref, f_ref = ref_step(static, forcing, state)

    pl_step = make_pallas_step(params, opts, 900.0, static, block=4,
                               interpret=True)
    s_pl, f_pl = pl_step(forcing, state)

    # pre-gathered params change constant-folding order; agreement is
    # f32 round-off level, not bitwise.  Measured worst divergence
    # across these regimes is <2e-3 K on temperatures and <0.05 W/m2
    # on fluxes; tolerances are ~4x the measured values.
    for name in ("tg", "tv", "stc", "swc", "smc", "sneqv", "snowh",
                 "eah", "canliq", "canice", "snice", "snliq"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_pl, name)),
            np.asarray(getattr(s_ref, name)), rtol=1e-4, atol=8e-3,
            err_msg=name)
    for name in ("fsa", "fsh", "fgev", "fcev", "fctr", "ssoil",
                 "qsnbot", "runsrf"):
        np.testing.assert_allclose(
            np.asarray(getattr(f_pl, name)),
            np.asarray(getattr(f_ref, name)), rtol=1e-3, atol=0.2,
            err_msg=name)
    assert np.max(np.abs(np.asarray(f_pl.errwat))) < 0.01
    land = np.asarray(static.ist) == 1
    assert np.max(np.abs(np.asarray(f_pl.erreng)[land])) < 0.05


@pytest.mark.slow
def test_make_fused_step_wrapper():
    """driver.step.make_fused_step exposes the fused kernel with the
    XLA step's (static, forcing, state) calling convention."""
    from __graft_entry__ import _build
    from noahmp_tpu.driver.step import make_step, make_fused_step

    n = 256
    params, opts, static, forcing, state = _build(n)
    fused = make_fused_step(params, opts, 900.0, static, block=n,
                            donate=False, interpret=True)
    xla = make_step(params, opts, 900.0, donate=False)
    s1, _f1 = fused(static, forcing, state)
    s2, _f2 = xla(static, forcing, state)
    for name in s1._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name), np.float64),
            np.asarray(getattr(s2, name), np.float64),
            rtol=1e-6, atol=1e-6, err_msg=name)
