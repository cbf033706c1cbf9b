"""Command-line entry point (reference: run/main.py — which only parsed
the namelist and exited; here the time loop actually runs).

Usage: python -m noahmp_tpu.driver.cli [case.nml] [--points N]
"""

import argparse
import os

from .config import Config
from .run import run_offline

DEFAULT_NAMELIST_FILE = "case.nml"


def enable_compile_cache(cache_dir=None):
    """Persistent XLA compilation cache (same policy as bench.py):
    first compile of the step is tens of seconds on TPU; subsequent
    runs of the same case are cache hits."""
    import jax
    if cache_dir is None:
        cache_dir = os.environ.get(
            "NOAHMP_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "noahmp_tpu", "jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="NoahMP-TPU land surface model (offline driver)")
    parser.add_argument("nmlfile", nargs="?", type=str,
                        default=DEFAULT_NAMELIST_FILE,
                        help="configuration namelist file")
    parser.add_argument("--points", type=int, default=None,
                        help="number of land points when no domain file "
                        "is present")
    def _budgets(v):
        return v if v == "strict" else int(v)
    parser.add_argument("--check-budgets", type=_budgets, default=0,
                        metavar="N|strict",
                        help="assert energy/water conservation every N "
                        "steps (0 = off); 'strict' reproduces the "
                        "reference's fatal per-step 0.01 W/m2 abort "
                        "(func:688-721), checked device-side every step")
    parser.add_argument("--no-compile-cache", action="store_true",
                        help="disable the persistent XLA compile cache")
    parser.add_argument("--dispatch", choices=("auto", "chunk", "step"),
                        default="auto",
                        help="chunk: one scanned device call per "
                        "output window (default); step: per-step loop")
    parser.add_argument("--chunk-steps", type=int, default=0,
                        metavar="T",
                        help="cap the scanned chunk length at T steps "
                        "(0 = no cap); T=1 keeps the async pipeline "
                        "but dispatches per step — use when scan "
                        "compiles are pathologically slow (remote "
                        "compilers at large n)")
    args = parser.parse_args(argv)

    if not args.no_compile_cache:
        enable_compile_cache()
    cfg = Config.from_namelist(args.nmlfile)
    run_offline(cfg, n_points=args.points,
                check_budgets_every=args.check_budgets,
                dispatch=args.dispatch, chunk_steps=args.chunk_steps)


if __name__ == "__main__":
    main()
