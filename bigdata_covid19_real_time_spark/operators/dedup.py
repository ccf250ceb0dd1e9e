"""Deduplication operators.

The reference dedups with ``dropDuplicates(keys)`` per micro-batch
(D1-D4, covid_streaming.py:153,159,179,188) — which keeps an *arbitrary*
row per key.  This module provides:

- ``drop_duplicates``: the reference-parity wrapper (arbitrary survivor,
  cheapest — partial aggregation keeps the first row seen per key
  map-side, so the shuffle carries at most one row per key per
  partition);
- ``dedup_latest``: deterministic keep-one via ``row_number`` over an
  explicit ordering — required whenever the surviving row's payload
  matters (sink idempotency, oracle-checked results).  Same single
  shuffle on the keys; adds a per-key sort that ``dropDuplicates``
  avoids, the price of determinism;
- ``canonicalize_duplicates``: exact duplicate-group detection for the
  training-data pipeline — hash-groupBy on content, one canonical id +
  multiplicity per group.

Scale: all three shuffle once on the dedup key.  For skewed keys prefer
``drop_duplicates`` (partial agg absorbs skew map-side) or pre-aggregate
with a salted key; ``dedup_latest``'s window sort concentrates each key
in one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_ROW_NUMBER_COL = "__rn"


def drop_duplicates(df: DataFrame, keys: list[str]) -> DataFrame:
    """Reference-parity dedup: arbitrary surviving row per key."""
    return df.dropDuplicates(keys)


def dedup_latest(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """Keep exactly one row per key, deterministically: the first row
    under ``order_by`` (pass ``F.desc(...)`` columns for "latest").

    The ordering must be total within each key group for the result to be
    deterministic — include a unique tie-break column.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_ROW_NUMBER_COL, F.row_number().over(w))
        .filter(F.col(_ROW_NUMBER_COL) == 1)
        .drop(_ROW_NUMBER_COL)
    )


def canonicalize_duplicates(
    df: DataFrame, content_cols: list[str], id_col: str
) -> DataFrame:
    """Exact-duplicate groups by content: one row per distinct content
    with the minimum id as canonical representative and the group size.

    At 100 TB, group directly on a 64-bit content hash instead of wide
    content columns to shrink shuffle payload: the caller can pass
    ``df.withColumn("h", F.xxhash64(*cols))`` and ``content_cols=["h"]``
    (collision rate 2^-64 per pair; use sha2 for cryptographic certainty).
    """
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("copies"),
    )


def jaccard_dedup_against_history(
    new: DataFrame,
    history: DataFrame,
    threshold: float = 0.6,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_shingles: bool = True,
) -> DataFrame:
    """Survivors of ``new`` after near-dup screening against ``history``
    — the continuous-ingest dedup step: each incoming batch is checked
    against the corpus already accepted, not against itself.

    A new document is dropped when its n-gram-shingle Jaccard similarity
    with ANY history document reaches ``threshold``; documents too short
    to shingle always survive (nothing to match on).  Returns ``new``'s
    rows unchanged (left_anti join against the dropped-id set).

    Scale shape: both sides stage to (id, n_set, shingle-hash) rows
    (``text.shingle_sets``), the intersection is a hashed-shingle
    equi-join new x history — never a self-join of the full corpus, so
    each increment costs |batch| x selectivity, and a real deployment
    persists the history shingle table once and appends to it per epoch
    instead of re-shingling (the join is against precisely that table).
    """
    from bigdata_covid19_real_time_spark.operators.text import shingle_sets

    # persist both shingle tables: constraint inference from the final
    # jaccard filter would otherwise push isnotnull(n_set) back into the
    # scans and re-inline the whole gram expression (the ~4x trap
    # documented on text.jaccard_pairs).  A real deployment persists the
    # history shingle table durably anyway — that IS the incremental
    # index.
    nh = shingle_sets(new, n, id_col, text_col, hash_shingles).persist()
    hh = (
        shingle_sets(history, n, id_col, text_col, hash_shingles)
        .select(
            F.col(id_col).alias("__hist_id"),
            F.col("n_set").alias("__n_h"),
            "shingle",
        )
        .persist()
    )
    inter = (
        nh.join(hh, "shingle")
        .groupBy(id_col, "__hist_id", "n_set", "__n_h")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    jac = F.col("__i") / (F.col("n_set") + F.col("__n_h") - F.col("__i"))
    dropped = inter.filter(jac >= threshold).select(id_col).distinct()
    return new.join(dropped, id_col, "left_anti")
