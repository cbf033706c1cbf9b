"""Produce committed golden trajectories from the ACTUAL reference
Fortran (run on any gfortran host; CI does this in the fortran-golden
job).  Writes validate/golden/<case>.csv — once committed,
tests/test_golden_fortran.py validates against these everywhere, with
no gfortran and no reference checkout needed.

Usage (gfortran host):
    validate/build_fortran.sh [REF_DIR]
    python validate/make_golden.py [REF_DIR]
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from golden_case import diurnal_forcing, write_case  # noqa: E402

# the four option/type cases tests/test_golden_fortran.py checks;
# keep in sync with its parametrization
CASES = [
    ("default_veg", dict(lutyp=7, sltyp=6), {}),
    ("forest_cold", dict(lutyp=14, sltyp=4, tg=270.0, tv=270.0,
                         stc_soil=272.0), {}),
    ("bare", dict(lutyp=19, sltyp=1, shdfac=0.0, shdmax=0.0), {}),
    ("runoff3_jarvis", dict(lutyp=11, sltyp=8),
     dict(crs=2, run=3, inf=2)),
]


def main():
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    driver = os.path.join(HERE, "build", "golden_driver")
    if not os.path.exists(driver):
        subprocess.run([os.path.join(HERE, "build_fortran.sh"), ref],
                       check=True)
    outdir = os.path.join(HERE, "golden")
    os.makedirs(outdir, exist_ok=True)
    rows = diurnal_forcing(nsteps=96)
    for name, config, opts_kw in CASES:
        fcfg = dict(config)
        for k, v in opts_kw.items():
            fcfg[f"opt_{k}"] = v
        casedir = os.path.join(outdir, "_tmp_" + name)
        cfgpath, csvpath = write_case(casedir, rows, fcfg)
        out = subprocess.run(
            [driver, os.path.abspath(cfgpath),
             os.path.abspath(csvpath)],
            cwd=os.path.join(ref, "tbl"), check=True,
            capture_output=True, text=True)
        dest = os.path.join(outdir, name + ".csv")
        with open(dest, "w") as f:
            f.write(out.stdout)
        nrows = len(out.stdout.strip().splitlines()) - 1
        print(f"wrote {dest} ({nrows} steps)")
        for p in (cfgpath, csvpath):
            os.remove(p)
        os.rmdir(casedir)


if __name__ == "__main__":
    main()
