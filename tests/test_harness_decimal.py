"""Pin the local-harness closure for the r12 failure class: a
DECIMAL(38,0) output past float64's 2^53 exact-integer range ships
locally-green (every float coercion maps distinct wide integers to the
same double) yet driver-red (the external driver coerces only ONE side
of its compare, corrupting the hash asymmetrically). r12's
price_quantile_sketch had EXACTLY equal values on both engines and
still failed. These tests plant that divergence and require both local
harnesses - scripts/verify_driver.py and tests/oracle.py - to refuse
it, so the class can never reach the driver again."""

from __future__ import annotations

import importlib.util
from decimal import Decimal

import pytest

WIDE = Decimal(1 << 60)  # same magnitude class as an h60 checksum sum


def _load_verify_driver():
    spec = importlib.util.spec_from_file_location(
        "verify_driver", "/root/repo/scripts/verify_driver.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_float_coercion_would_hide_the_divergence():
    # the mechanism under test: distinct >2^53 integers collapse to the
    # same float64, so any float-coercing compare calls them equal
    assert float(WIDE) == float(WIDE + 1)


def test_verify_driver_detects_planted_wide_decimal_divergence():
    vd = _load_verify_driver()
    a, b = vd.canon(WIDE), vd.canon(WIDE + 1)
    # canon must keep wide Decimals exact (the r12 coercion bug), and
    # values_match must then see the planted one-ulp divergence
    assert isinstance(a, Decimal) and isinstance(b, Decimal)
    assert not vd.values_match(a, b)
    # equal wide Decimals still compare equal locally...
    assert vd.values_match(vd.canon(WIDE), vd.canon(WIDE))
    # ...but compare() refuses the representation outright, because the
    # driver is red on it even when values agree exactly
    err = vd.wide_decimal_err([("x", WIDE)], "spark")
    assert err and "WIDE-DECIMAL" in err
    assert vd.wide_decimal_err([("x", Decimal(12345))], "spark") is None


def test_verify_driver_small_decimals_keep_isclose_tolerance():
    vd = _load_verify_driver()
    # the rounded-quotient lanes emit small decimals - ulp slop between
    # engines must still be tolerated there
    assert vd.values_match(Decimal("3.141592653"), 3.1415926530000004)
    assert vd.values_match(Decimal("3.1416"), Decimal("3.14160"))
    assert not vd.values_match(Decimal("3.1416"), Decimal("3.1417"))


def test_oracle_canon_refuses_wide_decimal():
    from tests.oracle import _canon

    with pytest.raises(AssertionError, match="2\\^53"):
        _canon(WIDE)
    # small decimals keep the float path (isclose tolerance)
    assert _canon(Decimal("3.1416")) == pytest.approx(3.1416)


def test_verify_driver_none_vs_decimal_reports_not_crashes():
    """r13 review: after canon kept Decimals exact, a NULL on one side
    against a Decimal on the other entered the mixed branch and blew
    up on float(None), aborting the whole verify run instead of
    reporting the per-query VALUE line."""
    vd = _load_verify_driver()
    assert not vd.values_match(None, Decimal("3.14"))
    assert not vd.values_match(WIDE, None)
    assert vd.values_match(None, None)
    # small decimals canon to float (isclose tolerance + aligned
    # rows_key string sort next to float columns); wide stay exact
    assert isinstance(vd.canon(Decimal("3.1416")), float)
    assert isinstance(vd.canon(WIDE), Decimal)
