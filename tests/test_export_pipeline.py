"""End-to-end training-data export: the full pipeline story, composed
from the real operators over the synthetic corpus.

    documents -> quality gate -> exact + near-dup dedup (clusters)
    -> leakage-free train/val split -> deterministic shuffle-shard
    -> snapshot publish -> re-read and audit

Each stage is unit/oracle-tested on its own; this test pins the
CONTRACTS BETWEEN stages: survivors of dedup are exactly one doc per
cluster, no near-dup cluster straddles splits, shards partition the
train split with dense positions, and the published snapshot
round-trips byte-identically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.components import dedup_clusters
from bigdata_covid19_real_time_spark.operators.minhash import minhash_lsh_pairs
from bigdata_covid19_real_time_spark.operators.quality import quality_filter
from bigdata_covid19_real_time_spark.operators.sampling import (
    leakage_free_splits,
    shuffle_shard_assignment,
)
from bigdata_covid19_real_time_spark.sinks.versioned import (
    publish_version,
    read_version,
)

SF_DIR = "/root/testdata/sf0.001"


def test_full_export_pipeline(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()

    # 1. quality gate
    verdict = quality_filter(docs, min_tokens=5, max_top_bigram_frac=1.0)
    kept = docs.join(
        verdict.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    ).persist()
    n_kept = kept.count()
    assert 0 < n_kept <= n_docs

    # 2. near-dup clusters over the kept docs; canonical survivor per cluster
    pairs = minhash_lsh_pairs(kept, threshold=0.6)
    clusters = dedup_clusters(pairs).persist()
    survivors = kept.join(
        clusters.filter(~F.col("is_canonical")).select(F.col("doc_id")),
        "doc_id",
        "left_anti",
    ).persist()
    n_surv = survivors.count()
    n_dupes = clusters.filter(~F.col("is_canonical")).count()
    assert n_surv == n_kept - n_dupes and n_dupes > 0

    # 3. leakage-free split of the SURVIVORS (clusters move as a unit)
    assign = clusters.select("doc_id", "cluster_id")
    splits = leakage_free_splits(
        survivors, assign, {"train": 0.8, "val": 0.2}
    ).persist()
    assert splits.count() == n_surv
    # no cluster straddles: every cluster maps to exactly one split
    straddlers = (
        splits.join(assign, "doc_id")
        .groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert straddlers.count() == 0

    # 4. shard the train split deterministically
    train = splits.filter(F.col("split") == "train").select("doc_id")
    shards = shuffle_shard_assignment(train, n_shards=4, seed=7)
    assert shards.count() == train.count()
    dense = shards.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx")
    )
    assert all(r.mx == r.n - 1 for r in dense.collect())

    # 5. publish the sharded export as an immutable snapshot and audit
    export = survivors.join(shards, "doc_id").join(
        splits.select("doc_id", "split"), "doc_id"
    )
    v = publish_version(export, str(tmp_path / "export"), partition_by=["shard"])
    back = read_version(spark, str(tmp_path / "export"), v)
    assert back.count() == train.count()
    assert set(back.columns) == set(export.columns)
    # round-trip determinism: re-computing the assignment matches the
    # published one row-for-row
    again = shuffle_shard_assignment(train, n_shards=4, seed=7)
    diff = (
        back.select("doc_id", "shard", "pos")
        .exceptAll(again.select("doc_id", "shard", "pos"))
        .count()
    )
    assert diff == 0
    for df in (kept, clusters, survivors, splits):
        df.unpersist()
