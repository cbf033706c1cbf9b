"""Transcendentals with Mosaic-lowerable fallbacks.

The Monin-Obukhov psi functions (physics/sfc.py) need arctan inside
the canopy/bare Newton loops.  Mosaic (Pallas TPU) has no lowering
rule for ``atan``, so the fused column kernel switches these helpers
to a Cephes-style polynomial (the same algorithm float32 libm atanf
uses: octant reduction at tan(pi/8)/tan(3pi/8) + a degree-4 minimax
polynomial in x^2; max error ~1 ulp).  The XLA path keeps
``jnp.arctan`` — bit-compat with the golden oracle is preserved there;
the Pallas path's ulp-level difference is covered by its own
comparison tolerances (tests/test_pallas.py).

Usage: ``transcend.atan(x)`` everywhere; ``mosaic_safe()`` context is
entered by the Pallas kernel builder at trace time.
"""

import contextlib
import threading

import jax.numpy as jnp

_STATE = threading.local()


def _in_mosaic():
    return getattr(_STATE, "mosaic", False)


@contextlib.contextmanager
def mosaic_safe():
    """Trace-time switch for tracing code destined for Mosaic (the
    Pallas TPU compiler):

    - atan() emits the Cephes polynomial instead of the atan primitive
      (no Mosaic lowering rule);
    - every non-trivial *bool* broadcast_in_dim is rerouted through
      int32 (broadcast in 32-bit, then != 0).  Mosaic cannot insert a
      minor dim on sub-32-bit types, and a measured repro shows i1
      major-dim broadcasts hang its layout pass outright — while the
      32-bit detour compiles.  jnp.where(scalar_cond, vec, vec), which
      saturates the vmapped column physics, hits this on every call.

    Thread safety: the ``broadcast_in_dim_p.bind`` patch is installed
    process-wide (primitives are global), but the patched bind defers
    to the original unless *this thread's* mosaic flag is set — a
    concurrent trace on another thread sees unpatched semantics.
    Install/uninstall is refcounted under a lock so nested or
    concurrent ``mosaic_safe`` contexts compose.
    """
    import jax

    prev = getattr(_STATE, "mosaic", False)
    _STATE.mosaic = True
    _install_bool_broadcast_patch()
    try:
        yield
    finally:
        _uninstall_bool_broadcast_patch()
        _STATE.mosaic = prev


_PATCH_LOCK = threading.Lock()
_PATCH_REFS = 0
_ORIG_BIND = None


def _install_bool_broadcast_patch():
    global _PATCH_REFS, _ORIG_BIND
    from jax import lax
    import jax

    with _PATCH_LOCK:
        _PATCH_REFS += 1
        if _PATCH_REFS > 1:
            return
        prim = lax.broadcast_in_dim_p
        _ORIG_BIND = orig_bind = prim.bind

        def patched_bind(x, *rest, **params):
            if not _in_mosaic():   # thread-local: other threads unaffected
                return orig_bind(x, *rest, **params)
            shape = params.get("shape")
            if (getattr(x, "dtype", None) == jnp.bool_
                    and tuple(getattr(x, "shape", ())) != tuple(shape)):
                y = orig_bind(jax.lax.convert_element_type(x, jnp.int32),
                              *rest, **params)
                return y != 0
            return orig_bind(x, *rest, **params)

        prim.bind = patched_bind


def _uninstall_bool_broadcast_patch():
    global _PATCH_REFS
    from jax import lax

    with _PATCH_LOCK:
        _PATCH_REFS -= 1
        if _PATCH_REFS == 0:
            lax.broadcast_in_dim_p.bind = _ORIG_BIND


_TAN_PI_8 = 0.4142135623730950  # tan(pi/8)
_TAN_3PI_8 = 2.414213562373095  # tan(3pi/8)
_PI_2 = 1.5707963267948966
_PI_4 = 0.7853981633974483


def atan_poly(x):
    """Cephes atanf: valid for all finite x, f32 accuracy ~1 ulp."""
    sign = jnp.sign(x)
    x = jnp.abs(x)

    big = x > _TAN_3PI_8
    mid = (~big) & (x > _TAN_PI_8)

    # guarded range reductions (both branches always evaluate)
    x_big = -1.0 / jnp.maximum(x, 1e-30)
    x_mid = (x - 1.0) / (x + 1.0)
    xr = jnp.where(big, x_big, jnp.where(mid, x_mid, x))
    y = jnp.where(big, _PI_2, jnp.where(mid, _PI_4, 0.0))

    z = xr * xr
    poly = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1) * z
    out = y + poly * xr + xr
    return sign * out


def atan(x):
    if _in_mosaic():
        return atan_poly(x)
    return jnp.arctan(x)


def carry_mask(m):
    """Make a bool mask safe to thread through a ``lax.fori_loop``
    carry.  Mosaic relayouts i1 loop-carry vectors through an i8
    round-trip and fails with "Unsupported target bitwidth for
    truncation" (arith.trunci vector<i8> -> vector<i1>); i32 carries
    hit an "Invalid relayout: replicated destination" at the loop
    boundary instead (both measured on the fused column kernel).  Under
    ``mosaic_safe()`` masks are therefore carried as float32 0/1 —
    the native TPU vector dtype.  Read sites compare ``!= 0``, which is
    the identity on the bool carry of the XLA path — bit-compat there
    is untouched.
    """
    if _in_mosaic():
        return m.astype(jnp.float32)
    return m


def carry_count(c):
    """Small integer loop-carry counter (e.g. sfcdif1 MOZSGN): carried
    as float32 under Mosaic for the same relayout reason as
    carry_mask; exact for counts far below 2**24."""
    if _in_mosaic():
        return c.astype(jnp.float32)
    return c
