"""Command-line entry point (reference: run/main.py — which only parsed
the namelist and exited; here the time loop actually runs).

Usage: python -m noahmp_tpu.driver.cli [case.nml] [--points N]
"""

import argparse

from .config import Config
from .run import run_offline

DEFAULT_NAMELIST_FILE = "case.nml"


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="NoahMP-TPU land surface model (offline driver)")
    parser.add_argument("nmlfile", nargs="?", type=str,
                        default=DEFAULT_NAMELIST_FILE,
                        help="configuration namelist file")
    parser.add_argument("--points", type=int, default=None,
                        help="number of land points when no domain file "
                        "is present")
    parser.add_argument("--check-budgets", type=int, default=0,
                        metavar="N",
                        help="assert energy/water conservation every N "
                        "steps (0 = off)")
    args = parser.parse_args(argv)

    cfg = Config.from_namelist(args.nmlfile)
    run_offline(cfg, n_points=args.points,
                check_budgets_every=args.check_budgets)


if __name__ == "__main__":
    main()
