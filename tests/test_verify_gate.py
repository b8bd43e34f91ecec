"""Self-tests for the local driver-replica gate (scripts/verify_entry.py).

The gate only protects the round if its own normalization matches the
driver's bitwise value hash.  Round 5 shipped a red driver row
(``ts_trend_slope``) because ``norm_value`` collapsed IEEE ``-0.0`` and
``+0.0`` while the driver distinguishes them — these tests pin the
sign-aware behavior so that class of local-green/driver-red can't recur.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

from scripts.verify_entry import norm_value  # noqa: E402


def test_negative_zero_is_distinct_from_positive_zero():
    assert norm_value(-0.0) != norm_value(0.0)
    assert norm_value(-0.0) == "-0.0"
    assert norm_value(0.0) == 0.0


def test_tiny_negative_rounds_to_signed_zero():
    # round(-1e-9, 6) == -0.0 in Python: the sign survives rounding, so
    # the gate must surface it, exactly as the driver's hash would.
    v = -1e-9
    assert round(v, 6) == 0.0 and math.copysign(1.0, round(v, 6)) < 0
    assert norm_value(v) == "-0.0"


def test_ordinary_floats_still_round():
    assert norm_value(1.23456789) == 1.234568
    assert norm_value(float("nan")) == "NaN"
    assert norm_value(-1.5) == -1.5
