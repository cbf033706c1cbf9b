"""Mechanical constants audit: C++ oracle vs the reference Fortran.

The serial C++ oracle (native/noahmp_ref.cpp + *.inc) is the
executable stand-in for the Fortran golden anchor (no gfortran in this
image — tests/test_golden_fortran.py skips).  Both sides were written
by the same author, so agreement alone cannot rule out a *shared*
misreading.  This tool removes one class of that risk mechanically:

For every Fortran subroutine of ``core/module_noahmp_func.f90`` it
extracts every REAL literal (thresholds, physical constants,
polynomial coefficients) from the Fortran text, locates the oracle
region implementing that subroutine, and verifies each literal appears
there (or in the shared-constants preamble).  A threshold the oracle
silently dropped — the class of the round-4 bug where the opt_stc=2
snow TG cap (func:1318-1330) was missing — shows up as a
"fortran-only" literal unless explicitly waived with a written
justification.

Run:  python validate/audit_constants.py            # writes AUDIT.md
      python validate/audit_constants.py --check    # exit 1 on new
                                                    # unwaived misses

The region map and waivers below are the only curated inputs; line
ranges and literals are extracted mechanically on every run, so the
audit stays current as either side changes.
"""

import argparse
import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
_FORTRAN = "/root/reference/core/module_noahmp_func.f90"
_NATIVE = os.path.join(_REPO, "native")

# ---------------------------------------------------------------------
# Region map: ordered (label, start_regex, [fortran subroutines]) per
# oracle file.  A region spans from its start marker to the next
# region's marker (or EOF).  "*" regions are shared preambles whose
# literals count as present for every subroutine.
# ---------------------------------------------------------------------
REGIONS = {
    "noahmp_ref.cpp": [
        ("constants", r"----- constants", ["*"]),
        ("esat", r"----- esat polynomials", ["esat"]),
        ("rosr12", r"----- tridiagonal Thomas", ["rosr12"]),
        ("atm", r"----- atm", ["atm"]),
        # green_fraction here implements the fveg selection inside
        # noahmp_sflx (func:366-380, the 0.52 LAI extinction), so the
        # region also claims noahmp_sflx
        ("phenology", r"----- phenology", ["phenology", "noahmp_sflx"]),
        ("thermo", r"----- thermal properties",
         ["thermoprop", "csnow", "tdfcnd"]),
        ("radiation", r"----- radiation",
         ["radiation", "albedo", "surrad", "snowage", "snowalb_bats",
          "snowalb_class", "groundalb", "twostream"]),
        ("stability", r"----- stability",
         ["ragrb", "sfcdif1", "sfcdif2"]),
        ("stomata", r"----- stomata / canres",
         ["stomata", "canres", "calhum"]),
    ],
    "noahmp_ref2.inc": [
        ("flux", r"----- vege_flux / bare_flux",
         ["vege_flux", "bare_flux"]),
        ("soiltemp", r"----- soil temperature \+ phase change",
         ["tsnosoi", "hrt", "hstep", "phasechange", "frh2o"]),
    ],
    "noahmp_ref3.inc": [
        ("canwater", r"----- canwater", ["canwater"]),
        ("snowlayers", r"----- snow layering",
         ["combine", "divide", "combo", "snowh2o"]),
        ("soilwater", r"----- soil water",
         ["soilh2o", "zwteq", "infil", "srt", "sstep", "wdfcnd1",
          "wdfcnd2", "groundwater"]),
        ("carbon", r"----- carbon", ["carbon", "co2flux"]),
    ],
    "noahmp_ref4.inc": [
        ("drivers", r"Continuation 3",
         ["energy", "water", "snowwater", "snowfall", "compact",
          "noahmp_sflx", "error"]),
    ],
}

# ---------------------------------------------------------------------
# Waivers: (subroutine, literal-as-written-in-fortran) -> justification.
# Every entry must say WHY the literal legitimately does not appear in
# the oracle region.  An unwaived miss fails --check.
# ---------------------------------------------------------------------
WAIVERS = {
    # --- declared-but-never-referenced parameters (verified by
    #     grepping the subroutine body for any non-declaration use) ---
    ("frh2o", "920.0"): "DICE=920.0 is declared in the parameter list "
        "(func:4533) but never referenced in the body — dead "
        "declaration.",
    ("co2flux", "40.0"): "RSDRYC=40.0 is declared (func:6870) and "
        "assigned (func:6886) but never read — dead; the soil-water "
        "respiration factor FSW uses 0.20/0.23 (func:7000), which the "
        "oracle has.",
    ("sfcdif2", "1.E-8"): "EPSA=1.e-8 is declared (func:3554) and "
        "never referenced in the body — dead declaration.",
    # --- sfcdif2: the ILECH=0 constant (func:3588) hard-selects the "
    #     Paulson psi functions; the Lech statement functions and their
    #     parameters are dead code the oracle does not carry ---
    ("sfcdif2", "0.183"): "RIC: used only by PSLMS/RFAC in the dead "
        "ILECH/=0 Lech branch (func:3559-3571, gated at func:3624).",
    ("sfcdif2", "0.191"): "RFC: dead Lech branch, as RIC.",
    ("sfcdif2", "0.8"): "FHNEU: dead Lech branch, as RIC.",
    ("sfcdif2", "0.96"): "PSLMU/PSLHU coefficient: dead Lech branch.",
    ("sfcdif2", "4.5"): "PSLMU/PSLHU coefficient: dead Lech branch.",
    ("sfcdif2", "2.076"): "PSLMS/PSLHS coefficient: dead Lech branch.",
    ("sfcdif2", "1.2"): "WWST=1.2 only feeds WWST2=WWST*WWST "
        "(func:3542); the oracle folds it to wwst2=1.44f "
        "(noahmp_ref.cpp:538).",
    # --- cross-region placements ---
    ("vege_flux", "0.1"): "FV=0.1 initialization (func:2692-class) is "
        "carried by the oracle's Sfc1 struct default "
        "(noahmp_ref.cpp:459, stability region).",
    ("bare_flux", "0.1"): "same FV=0.1 struct default as vege_flux.",
    ("energy", "0.378"): "the 0.378 in energy is Q1's veg-blended "
        "humidity (func:1260) — a write-only local in noahmp_sflx "
        "(func:210); the persisted QSFC is bare_flux's value via the "
        "shared inout alias (func:3218), which the oracle/JAX now "
        "mirror (see physics/energy.py qsfc aliasing note).  0.378 "
        "itself is audited in the flux region where it is live.",
}

# trivial literals that appear everywhere; presence proves nothing, so
# they are excluded from the audit on both sides
TRIVIAL = {0.0, 1.0, 2.0, 0.5, -1.0, 100.0, 3.0, 4.0}

_F_NUM = re.compile(
    r"(?<![\w.])("
    r"\d+\.\d*(?:[eEdD][-+]?\d+)?"
    r"|\.\d+(?:[eEdD][-+]?\d+)?"
    r"|\d+[eEdD][-+]?\d+"
    r")(?![\w.])")
_C_NUM = re.compile(
    r"(?<![\w.])("
    r"\d+\.\d*(?:[eE][-+]?\d+)?"
    r"|\.\d+(?:[eE][-+]?\d+)?"
    r"|\d+[eE][-+]?\d+"
    r")f?(?![\w.])")


def _fortran_subroutines(path):
    """name -> (start_line, end_line, [literal strings])"""
    subs = {}
    name = None
    start = 0
    body = []
    for i, line in enumerate(open(path), 1):
        m = re.match(r"\s*subroutine\s+(\w+)", line)
        code = line.split("!")[0]
        if m and name is None:
            name, start, body = m.group(1).lower(), i, []
        me = re.match(r"\s*end subroutine\s+(\w+)", line)
        if me and name == me.group(1).lower():
            subs[name] = (start, i, body)
            name = None
            continue
        if name is not None:
            body.extend(_F_NUM.findall(code))
    return subs


def _cpp_regions():
    """(file, label) -> (start_line, end_line, set of float values)"""
    out = {}
    for fname, regions in REGIONS.items():
        path = os.path.join(_NATIVE, fname)
        lines = open(path).read().split("\n")
        # find marker lines
        marks = []
        for label, pat, subs in regions:
            rx = re.compile(pat)
            hit = next((i + 1 for i, ln in enumerate(lines)
                        if rx.search(ln)), None)
            if hit is None:
                raise SystemExit(
                    f"audit region marker {label!r} ({pat}) not found "
                    f"in {fname} — update REGIONS")
            marks.append((hit, label, subs))
        marks.sort()
        for k, (lo, label, subs) in enumerate(marks):
            hi = marks[k + 1][0] - 1 if k + 1 < len(marks) else len(lines)
            vals = set()
            for ln in lines[lo - 1:hi]:
                code = ln.split("//")[0]
                for lit in _C_NUM.findall(code):
                    try:
                        vals.add(float(lit))
                    except ValueError:
                        pass
            out[(fname, label)] = (lo, hi, subs, vals)
    return out


def _norm(lit):
    return float(lit.lower().replace("d", "e"))


def run(check=False, write_md=True):
    subs = _fortran_subroutines(_FORTRAN)
    regions = _cpp_regions()

    # subroutine -> union of oracle values from every region that
    # claims it, plus shared preamble regions ("*")
    shared = set()
    claim = {}
    for (fname, label), (lo, hi, snames, vals) in regions.items():
        if snames == ["*"]:
            shared |= vals
            continue
        for s in snames:
            claim.setdefault(s, {"vals": set(), "regions": []})
            claim[s]["vals"] |= vals
            claim[s]["regions"].append(f"{fname}:{lo}-{hi}")

    rows = []
    misses = []
    for sname, (lo, hi, lits) in sorted(subs.items(),
                                        key=lambda kv: kv[1][0]):
        if sname not in claim:
            continue  # bvocflux (dead upstream) etc.
        have = claim[sname]["vals"] | shared
        uniq = {}
        for lit in lits:
            v = _norm(lit)
            if v in TRIVIAL or abs(v) in TRIVIAL:
                continue
            uniq.setdefault(v, lit)
        missing, waived = [], []
        for v, lit in sorted(uniq.items()):
            if any(abs(v - h) <= 1e-6 * max(abs(v), 1e-30)
                   for h in have):
                continue
            w = WAIVERS.get((sname, lit))
            if w is None:
                # try value-normalized waiver key
                w = next((j for (ws, wl), j in WAIVERS.items()
                          if ws == sname and _norm(wl) == v), None)
            (waived if w else missing).append(lit)
        rows.append((sname, lo, hi, len(uniq),
                     len(uniq) - len(missing) - len(waived),
                     waived, missing,
                     ", ".join(claim[sname]["regions"])))
        for lit in missing:
            misses.append((sname, lit))

    if write_md:
        with open(os.path.join(_HERE, "AUDIT.md"), "w") as f:
            f.write(
                "# Oracle constants audit (generated)\n\n"
                "`python validate/audit_constants.py` — for every "
                "Fortran subroutine: its `module_noahmp_func.f90` "
                "line range, the count of non-trivial REAL literals "
                "it contains, and whether each appears in the C++ "
                "oracle region implementing it "
                "(`native/noahmp_ref*.{cpp,inc}`).  A missing "
                "literal means a threshold/constant the oracle may "
                "have dropped — exactly the class of the round-4 "
                "opt_stc=2 snow-cap bug — and fails `--check` unless "
                "waived with a justification in WAIVERS.\n\n"
                "| subroutine | func.f90 | oracle region | literals "
                "| matched | waived | MISSING |\n"
                "|---|---|---|---|---|---|---|\n")
            for (s, lo, hi, nlit, nmatch, waived, missing,
                 reg) in rows:
                f.write(f"| {s} | {lo}-{hi} | {reg} | {nlit} "
                        f"| {nmatch} | "
                        f"{', '.join(waived) or '—'} | "
                        f"{', '.join(missing) or '—'} |\n")
            f.write("\n## Waiver justifications\n\n")
            for (s, lit), why in sorted(WAIVERS.items()):
                f.write(f"- **{s} / `{lit}`** — {why}\n")
            f.write(
                "\n## What this does not cover\n\n"
                "Literal presence cannot prove a *branch* exists or "
                "that an expression uses the literal correctly; that "
                "is covered dynamically by the resync fuzz "
                "(tests/test_golden_native.py), which compares the "
                "masked JAX model against the oracle per step across "
                "10 heterogeneous columns (incl. glacier/lake) and "
                f"{len(subs)} subroutines' worth of physics over "
                "every option family.\n")

    for sname, lit in misses:
        print(f"MISSING: {sname}: {lit}", file=sys.stderr)
    print(f"audited {len(rows)} subroutines; "
          f"{sum(r[3] for r in rows)} literals; "
          f"{len(misses)} unwaived misses")
    return 1 if (check and misses) else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    sys.exit(run(check=args.check))
