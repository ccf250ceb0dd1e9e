"""Relational Bloom runtime-filter semi-join (operators/bloom.py).

Covers: exactness vs a plain semi-join, the no-false-negative Bloom
invariant of the probe-only path, collision behavior at tiny ``m``, and
the physical plan (probe joins broadcast, fact never shuffled before
the probes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.bloom import (
    bloom_bits,
    bloom_probe,
    bloom_semi_join,
)


def _tables(spark):
    fact = spark.range(0, 5000).select(
        F.col("id").alias("fk"), (F.col("id") % 100).alias("payload")
    )
    dim = spark.range(0, 5000, 37).select(F.col("id").alias("dk"))  # ~2.7%
    return fact, dim


def test_exact_semi_join_equivalence(spark):
    fact, dim = _tables(spark)
    got = bloom_semi_join(fact, dim, "fk", "dk")
    want = fact.join(dim, fact["fk"] == dim["dk"], "left_semi")
    assert sorted(r.fk for r in got.collect()) == sorted(r.fk for r in want.collect())


def test_probe_superset_no_false_negatives(spark):
    fact, dim = _tables(spark)
    # Tiny m forces collisions: the probe-only result must still contain
    # every true match (Bloom filters never false-negative).
    pruned = bloom_semi_join(fact, dim, "fk", "dk", m=64, exact=False)
    true_keys = {r.dk for r in dim.collect()}
    kept = {r.fk for r in pruned.collect()}
    assert true_keys <= kept
    assert len(kept) < 5000  # and it did prune something even at m=64


def test_bits_bounded_by_m(spark):
    _, dim = _tables(spark)
    bits = bloom_bits(dim, "dk", m=16, n_hashes=2)
    rows = bits.collect()
    assert len(rows) <= 16 * 2
    assert all(0 <= r["__bucket"] < 16 for r in rows)


def test_probe_plan_broadcasts_and_keeps_fact_unshuffled(spark):
    fact, dim = _tables(spark)
    bits = bloom_bits(dim, "dk", n_hashes=2)
    plan = bloom_probe(fact, bits, "fk", n_hashes=2)._jdf.queryExecution().executedPlan().toString()
    # both probes are broadcast LEFT SEMI hash joins...
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftSemi" in plan
    # ...and the fact side reaches them without an exchange (only the
    # bit-table side builds broadcasts).
    assert "ShuffleExchange" not in plan.replace("BroadcastExchange", "")


def test_mixed_integral_key_widths_match(spark):
    """int vs bigint keys hash through different xxhash64 paths; the
    canonical widening must keep build and probe buckets aligned so the
    result still equals the plain semi-join."""
    fact, dim = _tables(spark)
    fact_int = fact.withColumn("fk", F.col("fk").cast("int"))  # dim stays bigint
    got = bloom_semi_join(fact_int, dim, "fk", "dk")
    want = fact_int.join(
        dim, fact_int["fk"] == dim["dk"], "left_semi"
    )
    assert sorted(r["fk"] for r in got.collect()) == sorted(
        r["fk"] for r in want.collect()
    )
    assert want.count() > 0


def test_incompatible_key_dtypes_rejected(spark):
    """string vs bigint cannot be reconciled by widening — fail loudly
    instead of silently dropping every matching row."""
    import pytest

    fact, dim = _tables(spark)
    fact_str = fact.withColumn("fk", F.col("fk").cast("string"))
    with pytest.raises(ValueError, match="dtype mismatch"):
        bloom_semi_join(fact_str, dim, "fk", "dk")
