"""Performance tuning knobs.

HOT_LOOP_UNROLL: unroll the fixed-trip Newton/bisection loops
(canopy 19, bare 5, ground 5, stomata 20, frh2o 10).  Unrolling lets
XLA fuse across iterations and eliminates per-iteration carry
materialization (~40% fewer memory passes measured on CPU), but blows
up compile time on slow/remote TPU compilers (>20 min via the axon
relay vs ~35 s rolled).  ``lax.fori_loop`` accepts an *int* unroll
factor, so besides False/True this can be 2/4/... for a partial unroll
that cuts carry materialization k-fold at ~k-fold body compile cost.
Default off; set before building a step if your compiler is fast or
you amortize one compile over long runs.
"""

HOT_LOOP_UNROLL = False

import contextlib as _contextlib  # noqa: E402
import threading as _threading   # noqa: E402

_TLS = _threading.local()


def hot_loop_unroll():
    """bool or int unroll factor, passed straight to lax.fori_loop.
    A thread-local override (``unroll_override``) takes precedence —
    the fused Pallas kernel traces with full unrolling (Mosaic cannot
    lay out some physics loop carries, and straight-line code is the
    VMEM-optimal form anyway)."""
    ov = getattr(_TLS, "unroll", None)
    return HOT_LOOP_UNROLL if ov is None else ov


@_contextlib.contextmanager
def unroll_override(v):
    prev = getattr(_TLS, "unroll", None)
    _TLS.unroll = v
    try:
        yield
    finally:
        _TLS.unroll = prev


# Use the fused Pallas column kernel (pallas/column.py) instead of the
# XLA vmapped step.  Interpret-mode validated; Mosaic compilation on
# real TPUs pending evaluation (PERF.md lever 3).
USE_PALLAS_STEP = False


# Chen97 (opt_sfc=2) carry correction.  The reference divides the
# sfcdif2 conductances AKMS/AKHS by the wind speed after every call
# ("CM = CM / UR", func:2769-2771, 3155-3157) but feeds the now
# dimensionless CM/CH straight back in as conductances on the next
# iteration/timestep.  Default False reproduces that quirk bit-for-bit;
# True re-multiplies by UR when seeding the carry (dimensionally
# consistent Chen97).
CHEN97_FIXED_CARRY = False


def chen97_fixed_carry() -> bool:
    return CHEN97_FIXED_CARRY
