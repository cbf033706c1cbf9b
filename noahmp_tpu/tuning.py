"""Performance tuning knobs.

HOT_LOOP_UNROLL: unroll the fixed-trip Newton/bisection loops
(canopy 19, bare 5, ground 5, stomata 20, frh2o 10).  Unrolling lets
XLA fuse across iterations and eliminates per-iteration carry
materialization (~40% fewer memory passes measured on CPU), but blows
up compile time on slow/remote TPU compilers (>20 min via the axon
relay vs ~35 s rolled).  Default off; flip before building a step if
your compiler is fast or you amortize one compile over long runs.
"""

HOT_LOOP_UNROLL = False


def hot_loop_unroll() -> bool:
    return HOT_LOOP_UNROLL


# Use the fused Pallas column kernel (pallas/column.py) instead of the
# XLA vmapped step.  Interpret-mode validated; Mosaic compilation on
# real TPUs pending evaluation (PERF.md lever 3).
USE_PALLAS_STEP = False
