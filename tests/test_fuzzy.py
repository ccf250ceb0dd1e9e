"""Edit-distance similarity join (operators/fuzzy.py): the q-gram
count filter + short-string fallback must be COMPLETE — output equals
brute-force lev<=k over all pairs, including the corners the filter
theory warns about (repetitive strings, very short strings, mixed
lengths)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_covid19_real_time_spark.operators.fuzzy import fuzzy_self_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _check(spark, words, k):
    df = spark.createDataFrame([(w,) for w in words], "name STRING")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_self_pairs(df, "name", max_dist=k).collect()
    }
    want = {
        (a, b, _lev(a, b))
        for a, b in combinations(sorted(set(words)), 2)
        if _lev(a, b) <= k
    }
    assert got == want


def test_known_pairs(spark):
    words = ["red plate", "hot plate", "red widget", "small widget", "red plates"]
    _check(spark, words, 3)


def test_repetitive_strings_not_missed(spark):
    # the distinct-gram formulation misses exactly this shape
    _check(spark, ["aaaaaaaa", "aaaabaaa", "aaaaaaab", "bbbbbbbb"], 2)


def test_short_strings_use_band_branch(spark):
    _check(spark, ["ab", "cd", "abc", "a", "xy", "abcd"], 2)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    words=st.sets(st.text(alphabet="abc", min_size=1, max_size=10), min_size=2, max_size=12),
    k=st.sampled_from([1, 2]),
)
def test_matches_bruteforce(spark, words, k):
    _check(spark, list(words), k)
