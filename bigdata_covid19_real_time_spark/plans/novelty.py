"""Per-source novelty attribution: which sources contribute NEW
content to the corpus, measured by first-occurrence ownership of
3-gram shingles (min-doc_id owner — deterministic, order-free).

The corpus-curation question this answers: when mixing sources, a
source whose grams are mostly owned elsewhere adds volume but little
novelty — the per-source novelty rate is the signal a temperature-mix
or dedup budget reads.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "docs_source_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t
      FROM documents WHERE text IS NOT NULL
    ),
    g AS (
      SELECT DISTINCT doc_id, source,
             t[i.i] || ' ' || t[i.i + 1] || ' ' || t[i.i + 2] AS gram
      FROM toks, unnest(range(1, len(t) - 1)) AS i(i)
      WHERE len(t) >= 3
    ),
    owner AS (
      SELECT gram, arg_min(source, doc_id) AS owner_source
      FROM g GROUP BY 1
    ),
    per_source AS (
      SELECT source, COUNT(DISTINCT gram) AS n_grams
      FROM g GROUP BY 1
    ),
    novel AS (
      SELECT owner_source AS source, COUNT(*) AS n_novel
      FROM owner GROUP BY 1
    )
    SELECT p.source,
           CAST(p.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
           ROUND(COALESCE(n.n_novel, 0) * 1.0 / p.n_grams + 1e-9, 6)
             AS novelty_rate
    FROM per_source p LEFT JOIN novel n USING (source)
    """,
)
def docs_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence gram ownership per source: a gram belongs to
    the source of its smallest doc_id; a source's novelty rate is the
    owned fraction of its distinct grams.  Staged narrow gram
    projection (the documented Catalyst anti-re-inlining discipline),
    one distinct + two partial-agg shuffles.  At 100 TB group on
    ``xxhash64(gram)`` so the shuffles carry 8-byte keys — the string
    form here keeps the oracle trivially equivalent."""
    # round-14 A/B: a scan fan-out REGRESSED this query (1.19x, no
    # overlap) — the gram distinct already pays a full shuffle right
    # after the map, so the extra exchange buys nothing; left un-fanned
    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 3)
    )
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("t"), i),
                    F.element_at(F.col("t"), i + 1),
                    F.element_at(F.col("t"), i + 2),
                ),
            )
        ).alias("gram"),
    ).distinct()
    owner = grams.groupBy("gram").agg(
        F.min_by("source", "doc_id").alias("owner_source")
    )
    per_source = grams.groupBy("source").agg(
        F.countDistinct("gram").alias("n_grams")
    )
    novel = owner.groupBy(F.col("owner_source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    return (
        per_source.join(novel, "source", "left")
        .select(
            "source",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
            stable_round(
                F.coalesce(F.col("n_novel"), F.lit(0)) / F.col("n_grams"), 6
            ).alias("novelty_rate"),
        )
    )
