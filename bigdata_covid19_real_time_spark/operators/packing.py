"""Sequence packing: assign documents to fixed-token-budget training
sequences in a deterministic pseudo-random order.

Pretraining consumes the corpus as back-to-back token streams cut into
``budget``-sized sequences.  The assignment needs (a) a reproducible
global shuffle (so epoch N is re-creatable from the corpus alone) and
(b) each document's byte offset in the stream — i.e. an exclusive
running sum of token counts in shuffle order.

A naive ``Window.orderBy(shuffle_key)`` cumsum is a single-partition
sort — the classic scale killer (WindowExec warns and moves ALL rows to
one task).  This implements the standard two-pass distributed prefix
sum instead:

1. bucket by the first byte of the shuffle hash (a prefix of the sort
   key, so bucket order + intra-bucket order == global order);
2. per-bucket inclusive cumsum via a PARTITIONED window (parallel);
3. per-bucket totals (256 rows) prefix-summed on the driver side of a
   broadcast join — the only global step touches 256 rows, not the
   corpus.

The shuffle key is ``md5(id)`` — engine-portable (DuckDB replicates it
verbatim), uniform, and collision-free on distinct ids for any real
corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    token_count: Column,
    budget: int = 2048,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shuffle_pos, token_count, seq_id, seq_pos) for every row.

    ``seq_id`` is the training sequence the document STARTS in
    (``floor(exclusive_cumsum / budget)``) and ``seq_pos`` its token
    offset within that sequence; a document may straddle a boundary —
    the split itself happens at tokenization time, this operator pins
    the deterministic layout.
    """
    h = F.md5(F.col(id_col).cast("string"))
    per = df.select(
        F.col(id_col),
        h.alias("h"),
        F.substring(h, 1, 2).alias("bucket"),
        token_count.cast("long").alias("token_count"),
    )
    intra = Window.partitionBy("bucket").orderBy("h")
    per = per.withColumn("intra_cum", F.sum("token_count").over(intra)).withColumn(
        "intra_pos", F.row_number().over(intra)
    )

    # 256-row side table: tokens/docs before each bucket in hash order.
    bucket_order = Window.orderBy("bucket")
    totals = (
        per.groupBy("bucket")
        .agg(
            F.sum("token_count").alias("btok"),
            F.count(F.lit(1)).alias("bdocs"),
        )
        .withColumn(
            "tok_before",
            F.coalesce(
                F.sum("btok").over(bucket_order.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "docs_before",
            F.coalesce(
                F.sum("bdocs").over(bucket_order.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .select("bucket", "tok_before", "docs_before")
    )

    offset = F.col("tok_before") + F.col("intra_cum") - F.col("token_count")
    return (
        per.join(F.broadcast(totals), "bucket")
        .select(
            id_col,
            (F.col("docs_before") + F.col("intra_pos")).alias("shuffle_pos"),
            "token_count",
            F.floor(offset / budget).cast("long").alias("seq_id"),
            (offset % budget).cast("long").alias("seq_pos"),
        )
    )
