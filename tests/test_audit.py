"""The mechanical constants audit must stay clean: every non-trivial
REAL literal of every Fortran subroutine appears in the oracle region
implementing it, or carries a written waiver (validate/AUDIT.md)."""

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "validate"))


@pytest.mark.skipif(
    not os.path.exists("/root/reference/core/module_noahmp_func.f90"),
    reason="reference Fortran tree not present")
def test_oracle_constants_audit_clean():
    import audit_constants

    assert audit_constants.run(check=True, write_md=False) == 0
