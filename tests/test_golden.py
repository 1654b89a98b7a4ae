"""Golden-curve regression: committed artifacts vs the reference's.

Keeps PARITY.md's learning-curve claims continuously verified (SURVEY §4.2
3-seed protocol, made a regression test).
"""
from freerl_tpu.train.golden import SPECS, check_all


def test_golden_curves_hold():
    rows = check_all()
    fails = [r for r in rows if r["status"] == "FAIL"]
    assert not fails, fails
    # every spec must find BOTH artifacts (a silently-missing file would
    # otherwise pass vacuously)
    missing = [r for r in rows if r["status"] == "missing"]
    assert not missing, missing
    assert len(rows) == len(SPECS)
