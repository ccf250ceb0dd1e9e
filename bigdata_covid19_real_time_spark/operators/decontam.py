"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

Not in the reference (its pipeline forwards everything); part of the
training-data extension surface.  Decontamination is a standard step in
LLM corpus construction: any training document that contains a long
n-gram from a held-out benchmark leaks the benchmark into the model, so
the pipeline reports (and usually drops) documents whose n-gram overlap
with the eval set is non-zero.

Scale shape (the part that matters at 100 TB):

- The training corpus is shingled once into ``(doc_id, n_set,
  shingle_hash)`` rows — a narrow map + explode, the same staged
  projection discipline as ``text.jaccard_pairs`` (Catalyst re-inlines
  fused array expressions catastrophically otherwise).
- The eval set is tiny relative to the corpus (benchmarks are MBs, the
  corpus is TBs), so its distinct shingle hashes are **broadcast**: the
  contamination check is a broadcast semi-join against every training
  shingle — no shuffle of the corpus at all.  With a huge eval set the
  same plan degrades gracefully to a shuffled equi-join on an 8-byte
  key.
- Join keys are ``xxhash64`` hashes (8 bytes), never shingle strings;
  collision odds are ~|eval shingles| * |train shingles| / 2^64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from bigdata_covid19_real_time_spark.operators.text import shingle_sets


def contamination_report(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    eval_id_col: str = "doc_id",
    text_col: str = "text",
    hash_shingles: bool = True,
) -> DataFrame:
    """Per-training-document benchmark overlap: ``(id_col, n_set,
    contaminated_ngrams, contamination_frac)`` for EVERY training doc
    (zero-filled when clean) — the artifact a drop/keep filter consumes.

    ``n`` is the match length in words; 5+ suppresses coincidental
    short-phrase overlap (measured on the synthetic corpus: n=3 flags
    84% of docs on a 40-word vocabulary, n=5 flags exactly the injected
    cross-source near-dups).
    """
    tr = shingle_sets(train, n, id_col, text_col, hash_shingles)
    ev = (
        shingle_sets(eval_docs, n, eval_id_col, text_col, hash_shingles)
        .select("shingle")
        .distinct()
    )
    hits = (
        tr.join(broadcast(ev), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("contaminated_ngrams"))
    )
    sizes = tr.groupBy(id_col).agg(F.max("n_set").alias("n_set"))
    return (
        sizes.join(hits, id_col, "left")
        .withColumn(
            "contaminated_ngrams", F.coalesce("contaminated_ngrams", F.lit(0))
        )
        .withColumn(
            "contamination_frac",
            F.col("contaminated_ngrams").cast("double") / F.col("n_set"),
        )
    )
