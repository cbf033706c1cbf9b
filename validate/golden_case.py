"""Shared case definition for the Fortran golden harness.

Generates the idealized diurnal forcing (the NetCDF inputs referenced
by run/case.nml don't exist in the reference repo, SURVEY.md section 7
step 2) and writes the config + forcing.csv consumed by
validate/golden_driver.f90.  tests/test_golden_fortran.py uses the same
arrays on the JAX side, so both models see bit-identical inputs.

Standalone (on a gfortran host):
    python validate/golden_case.py /tmp/case     # writes cfg + csv
    validate/build_fortran.sh
    cd /root/reference/tbl && validate/build/golden_driver \
        /tmp/case/case.cfg /tmp/case/forcing.csv > traj.csv
"""

import os

import numpy as np

FIELDS = ("sfctmp", "sfcprs", "psfc", "uu", "vv", "q2", "soldn",
          "lwdn", "prcp", "cosz", "co2air", "o2air", "foln", "julian",
          "yearlen")


def diurnal_forcing(nsteps=96, dt=900.0, t_mean=288.0, t_amp=8.0,
                    prcp=0.0005, julian0=1.0):
    """Idealized clear-sky diurnal cycle, float32 (both oracles read
    the same decimal text, so round-trip through %.8e is exact)."""
    t = np.arange(nsteps, dtype=np.float64) * dt
    hour = (t / 3600.0) % 24.0
    # solar geometry: cosz peaks at local noon
    cosz = np.maximum(np.cos((hour - 12.0) / 12.0 * np.pi), -0.2)
    soldn = np.where(cosz > 0.0, 800.0 * cosz, 0.0)
    sfctmp = t_mean + t_amp * np.sin((hour - 9.0) / 24.0 * 2 * np.pi)
    lwdn = 250.0 + 1.2 * (sfctmp - 273.15)
    rows = {
        "sfctmp": sfctmp, "sfcprs": np.full(nsteps, 90000.0),
        "psfc": np.full(nsteps, 90000.0),
        "uu": 2.0 + 1.5 * np.sin(t / 7200.0), "vv": np.full(nsteps, 1.0),
        "q2": np.full(nsteps, 0.006), "soldn": soldn, "lwdn": lwdn,
        "prcp": np.where((hour > 14) & (hour < 17), prcp, 0.0),
        "cosz": cosz, "co2air": np.full(nsteps, 39.0),
        "o2air": np.full(nsteps, 18900.0), "foln": np.full(nsteps, 1.0),
        "julian": julian0 + t / 86400.0,
        "yearlen": np.full(nsteps, 366.0),
    }
    return {k: np.asarray(v, np.float32) for k, v in rows.items()}


def write_case(outdir, forcing_rows, config=None):
    """Write case.cfg + forcing.csv; returns their paths."""
    os.makedirs(outdir, exist_ok=True)
    nsteps = len(forcing_rows["sfctmp"])
    cfg = {"nsteps": nsteps, "dt": 900.0}
    cfg.update(config or {})
    cfgpath = os.path.join(outdir, "case.cfg")
    with open(cfgpath, "w") as f:
        for k, v in cfg.items():
            if isinstance(v, (tuple, list, np.ndarray)):
                f.write(f"{k} " + " ".join(repr(float(x)) for x in v)
                        + "\n")
            else:
                f.write(f"{k} {v}\n")
    csvpath = os.path.join(outdir, "forcing.csv")
    with open(csvpath, "w") as f:
        for i in range(nsteps):
            f.write(",".join("%.8e" % forcing_rows[name][i]
                             for name in FIELDS) + "\n")
    return cfgpath, csvpath


if __name__ == "__main__":
    import sys
    out = sys.argv[1] if len(sys.argv) > 1 else "validate/case"
    paths = write_case(out, diurnal_forcing())
    print("wrote", *paths)
