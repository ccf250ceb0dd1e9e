"""Property-based tests (hypothesis) for the cleaning stage's contract.

The cleaning semantics (C1: sentinel -> 0.0, castable -> double,
garbage -> NULL; C2-C7: guarded ratios never divide by zero and never
produce NULL from non-NULL inputs) are the engine's foundation — every
downstream operator assumes them.  Generated inputs probe the corners
hand-written goldens miss: whitespace padding, signs, exponents, unicode
garbage, giant numbers.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_covid19_real_time_spark.functions.cleaning import clean_observations
from tests.conftest import frozen_clock, make_raw, obs

SENTINELS = ["", "null", "NULL"]

# strings Python/Java agree are parseable doubles (plain + exponent forms)
numeric_str = st.one_of(
    st.integers(-(10**12), 10**12).map(str),
    st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    ).map(lambda f: f"{f:.6f}"),
)
garbage_str = st.text(
    alphabet="abcXYZ#%&/ユニ", min_size=1, max_size=8
).filter(lambda s: s.strip() not in SENTINELS)
#: space padding only: Spark ``trim`` strips 0x20, NOT tabs/newlines —
#: the reference (trim + isin + cast) therefore sends a tab-padded
#: sentinel to NULL, and the engine reproduces that (pinned below)
padded = st.tuples(st.sampled_from(["", " ", "  "]), st.sampled_from(["", " ", "  "]))


def _clean_one(spark, **fields):
    raw = make_raw(spark, [obs(**fields)])
    return clean_observations(raw, clock=frozen_clock()).collect()[0]


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(v=numeric_str, pad=padded)
def test_castable_strings_parse_with_whitespace(spark, v, pad):
    row = _clean_one(spark, total_cases=pad[0] + v + pad[1])
    assert row["total_cases"] is not None
    assert math.isclose(row["total_cases"], float(v), rel_tol=1e-9)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(s=st.sampled_from(SENTINELS), pad=padded)
def test_sentinels_normalize_to_zero(spark, s, pad):
    row = _clean_one(spark, new_cases=pad[0] + s + pad[1])
    assert row["new_cases"] == 0.0


def test_tab_padded_sentinel_is_null_reference_parity(spark):
    """`trim` strips spaces only, so "null\\t" misses the sentinel list
    and falls through to the cast -> NULL.  Same chain as the reference
    (covid_streaming.py:121-132) — parity, pinned deliberately."""
    row = _clean_one(spark, new_cases="null\t")
    assert row["new_cases"] is None


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(g=garbage_str)
def test_garbage_becomes_null_and_rates_still_guarded(spark, g):
    row = _clean_one(spark, total_cases=g, population=g)
    assert row["total_cases"] is None  # uncastable -> SQL NULL (C1)
    # guarded ratios on NULL denominators fall to 0.0, never NULL/error
    assert row["death_rate"] == 0.0
    assert row["cases_per_million"] == 0.0
    assert row["cases_to_population_ratio"] == 0.0


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    cases=st.integers(1, 10**9),
    deaths=st.integers(0, 10**9),
    active=st.integers(0, 10**9),
)
def test_rate_identities(spark, cases, deaths, active):
    row = _clean_one(
        spark,
        total_cases=str(cases),
        total_deaths=str(deaths),
        active_cases=str(active),
        population="0",  # exercise the zero-population guard too
    )
    assert math.isclose(row["death_rate"], round(deaths / cases + 1e-9, 6), abs_tol=1e-9)
    assert math.isclose(
        row["recovery_rate"], round((cases - active - deaths) / cases + 1e-9, 6), abs_tol=1e-9
    )
    assert row["cases_per_million"] == 0.0  # population 0 -> guard
