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
    _check_jax_version()
    prev = getattr(_STATE, "mosaic", False)
    installed = False
    try:
        _STATE.mosaic = True
        _install_bool_broadcast_patch()
        installed = True
        yield
    finally:
        if installed:
            _uninstall_bool_broadcast_patch()
        _STATE.mosaic = prev


# The patches below reach into jax._src internals
# (fancy_primitive_batchers, Primitive.bind).  They are verified on
# this exact minor version; an untested upgrade must fail loudly here
# rather than silently mis-trace the fused kernel.
_SUPPORTED_JAX = ("0.9.",)


def _check_jax_version():
    import jax

    if not any(jax.__version__.startswith(p) for p in _SUPPORTED_JAX):
        raise RuntimeError(
            f"transcend.mosaic_safe patches jax internals and is only "
            f"validated on jax {_SUPPORTED_JAX}; found {jax.__version__}. "
            f"Re-run tests/test_mosaic_rules.py on the new version and "
            f"extend _SUPPORTED_JAX.")


_PATCH_LOCK = threading.Lock()
_PATCH_REFS = 0
_ORIG_BIND = None
_ORIG_CONCAT_RULE = None
_ORIG_TRANSPOSE_BIND = None


def _install_transpose_patch():
    """Mosaic cannot legalize most tpu.transpose shapes that vmap's
    batch-dim bookkeeping emits in the fused kernel.  Two rewrites
    cover every case the column physics produces:

    - permutations that only move singleton dims are pure reshapes;
    - permutations that move ONE small axis (the layer axis, size<=16)
      while keeping the rest in order decompose into per-layer slices
      (each a singleton reshape) concatenated at the target position —
      data movement Mosaic lowers fine.

    Installed process-wide, inert unless the tracing thread is inside
    mosaic_safe()."""
    global _ORIG_TRANSPOSE_BIND
    import jax
    from jax import lax

    prim = lax.transpose_p
    _ORIG_TRANSPOSE_BIND = orig = prim.bind

    def moved_axis(perm):
        """If perm moves exactly one axis (the others keep their
        relative order), return that axis, else None."""
        n = len(perm)
        for cand in range(n):
            rest = [p for p in perm if p != cand]
            if rest == [i for i in range(n) if i != cand]:
                return cand
        return None

    def patched(x, *, permutation, **params):
        if not _in_mosaic():
            return orig(x, permutation=permutation, **params)
        perm = tuple(permutation)
        if perm == tuple(range(len(perm))):
            return x
        if x.dtype == jnp.bool_:
            # reshape/slice of i1 vectors hits Mosaic's sub-32-bit
            # minor-dim limitation; do the move in 32-bit
            y = patched(jax.lax.convert_element_type(x, jnp.int32),
                        permutation=permutation, **params)
            return y != 0
        shape = tuple(x.shape)
        out_shape = tuple(shape[p] for p in perm)
        # singleton-only move -> reshape
        ns_in = [i for i in range(len(shape)) if shape[i] != 1]
        ns_perm = [p for p in perm if shape[p] != 1]
        if ns_perm == ns_in:
            return jax.lax.reshape(x, out_shape)
        a = moved_axis(perm)
        if a is not None and shape[a] <= 16:
            tpos = perm.index(a)
            pieces = []
            for k in range(shape[a]):
                sl = jax.lax.slice_in_dim(x, k, k + 1, axis=a)
                pshape = (out_shape[:tpos] + (1,)
                          + out_shape[tpos + 1:])
                pieces.append(jax.lax.reshape(sl, pshape))
            return jax.lax.concatenate(pieces, tpos)
        return orig(x, permutation=permutation, **params)

    prim.bind = patched


def _uninstall_transpose_patch():
    from jax import lax
    if _ORIG_TRANSPOSE_BIND is not None:
        lax.transpose_p.bind = _ORIG_TRANSPOSE_BIND


def _install_concat_batcher():
    """vmap's stock concatenate batching rule moves every batch dim to
    the FRONT and concatenates behind it; under the fused kernel's
    nested (sublane, lane) vmap that materializes layer-minor
    transposes ((L, bs, 128) -> (bs, 128, L) and back) which Mosaic
    cannot legalize (tpu.transpose).  This rule keeps batch dims where
    the operands already carry them, so per-column layer concatenates
    stay layer-major and no transposes are emitted.  Installed
    process-wide but inert unless the tracing thread is inside
    mosaic_safe()."""
    global _ORIG_CONCAT_RULE
    from jax import lax
    from jax._src.interpreters import batching as _b

    _ORIG_CONCAT_RULE = orig_rule = \
        _b.fancy_primitive_batchers[lax.concatenate_p]

    def rule(axis_data, args, dims, *, dimension, **params):
        if not _in_mosaic():
            return orig_rule(axis_data, args, dims,
                             dimension=dimension, **params)
        bds = [d for d in dims if d is not None]
        if not bds:
            return orig_rule(axis_data, args, dims,
                             dimension=dimension, **params)
        target = bds[0]
        size = [a.shape[d] for a, d in zip(args, dims)
                if d is not None][0]
        newargs = []
        for a, d in zip(args, dims):
            if d is None:
                bd = tuple(i if i < target else i + 1
                           for i in range(a.ndim))
                shp = (a.shape[:target] + (size,) + a.shape[target:])
                a = lax.broadcast_in_dim(a, shp, bd)
            elif d != target:
                a = _b.moveaxis(a, d, target)
            newargs.append(a)
        dim2 = dimension + (1 if dimension >= target else 0)
        return lax.concatenate(newargs, dim2), target

    _b.fancy_primitive_batchers[lax.concatenate_p] = rule


def _uninstall_concat_batcher():
    from jax import lax
    from jax._src.interpreters import batching as _b
    if _ORIG_CONCAT_RULE is not None:
        _b.fancy_primitive_batchers[lax.concatenate_p] = \
            _ORIG_CONCAT_RULE


def _install_bool_broadcast_patch():
    global _PATCH_REFS, _ORIG_BIND
    from jax import lax
    import jax

    with _PATCH_LOCK:
        _PATCH_REFS += 1
        if _PATCH_REFS > 1:
            return
        # atomic install: roll back any sub-patch that made it in if a
        # later one raises, so a failure can't leave globally-patched
        # primitives behind with the refcount claiming otherwise
        try:
            _install_concat_batcher()
            _install_transpose_patch()
        except BaseException:
            _uninstall_transpose_patch()
            _uninstall_concat_batcher()
            _PATCH_REFS -= 1
            raise
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
            # Concrete small rank-1 vector broadcast that APPENDS minor
            # dims (iota/arange constants meeting vmap batch dims):
            # Mosaic lowers the lanes->major move as tpu.transpose,
            # which fails to legalize.  Rewrite as a concat of scalar
            # splats — every piece constant-folds at trace time.
            bdims = params.get("broadcast_dimensions")
            import numpy as _np
            if (not isinstance(x, jax.core.Tracer)
                    and getattr(x, "ndim", None) == 1
                    and x.shape[0] <= 32
                    and len(shape) > 1
                    and bdims == (0,)
                    and shape[0] == x.shape[0]):
                xx = _np.asarray(x)
                tail = tuple(shape[1:])
                pieces = [jnp.broadcast_to(jnp.asarray(xx[i]),
                                           (1,) + tail)
                          for i in range(xx.shape[0])]
                return jnp.concatenate(pieces, axis=0)
            return orig_bind(x, *rest, **params)

        prim.bind = patched_bind


def _uninstall_bool_broadcast_patch():
    global _PATCH_REFS
    from jax import lax

    with _PATCH_LOCK:
        _PATCH_REFS -= 1
        if _PATCH_REFS == 0:
            lax.broadcast_in_dim_p.bind = _ORIG_BIND
            _uninstall_concat_batcher()
            _uninstall_transpose_patch()


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


def zeros_like(x):
    """Loop-carry-safe zeros_like.

    Under Mosaic, a ``jnp.zeros_like`` init for a ``fori_loop`` carry is
    a splat constant, and layout inference assigns the loop's iter_arg a
    *replicated* layout from it; the body then yields a computed
    (non-replicated) value and the required non-replicated -> replicated
    relayout is invalid ("Non-singleton logical dimension is replicated
    in destination but not in source" — measured on the vege_flux canopy
    loop).  ``x * 0.0`` is value-identical for finite x (the physics
    carries are temperatures/fluxes) but derives from a loaded tile, so
    the iter_arg gets a materialized layout.  XLA path: plain zeros.
    """
    if _in_mosaic():
        return x * 0.0
    return jnp.zeros_like(x)


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
