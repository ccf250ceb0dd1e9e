"""Global exact-substring dedup query (Lee et al. 2021 recipe):
cross-document span REMOVAL, completing the span family —
``docs_duplicate_spans`` mines cross-doc spans, ``docs_repeated_span_
removal`` removes within one doc, this removes corpus-wide (every
duplicated 10-gram survives exactly once in the whole corpus).

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata_covid19_real_time_spark.plans.registry import query
from bigdata_covid19_real_time_spark.sources.batch import load_table

N = 10  # span length in tokens — matches docs_duplicate_spans' mining


@query(
    "docs_global_span_dedup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t
      FROM documents WHERE len(string_split(trim(text), ' ')) > 0
    ),
    tok AS (
      SELECT doc_id, u.i - 1 AS pos, t[u.i] AS tok
      FROM base, unnest(range(1, len(t) + 1)) AS u(i)
    ),
    grams AS (
      SELECT doc_id, u.i - 1 AS start,
             ('0x' || substr(md5(array_to_string(t[u.i:u.i+{N - 1}], ' ')),
                             1, 15))::BIGINT AS gh
      FROM base, unnest(range(1, len(t) - {N - 2})) AS u(i)
      WHERE len(t) >= {N}
    ),
    firsts AS (
      SELECT gh, doc_id AS fd, start AS fs
      FROM (
        SELECT gh, doc_id, start,
               ROW_NUMBER() OVER (PARTITION BY gh
                                  ORDER BY doc_id, start) AS rn
        FROM grams
      ) WHERE rn = 1
    ),
    removed AS (
      SELECT DISTINCT g.doc_id, g.start + u.o AS pos
      FROM grams g
      JOIN firsts f ON f.gh = g.gh, unnest(range(0, {N})) AS u(o)
      WHERE g.doc_id != f.fd OR g.start != f.fs
    ),
    kept AS (
      SELECT tk.doc_id, tk.pos, tk.tok FROM tok tk
      LEFT JOIN removed r ON r.doc_id = tk.doc_id AND r.pos = tk.pos
      WHERE r.pos IS NULL
    ),
    reb AS (
      SELECT doc_id, COUNT(*) AS tokens_after,
             ('0x' || substr(md5(string_agg(tok, ' ' ORDER BY pos)),
                             1, 15))::BIGINT AS cleaned_hash
      FROM kept GROUP BY 1
    ),
    bef AS (SELECT doc_id, len(t) AS tokens_before FROM base)
    SELECT b.doc_id, CAST(b.tokens_before AS BIGINT) AS tokens_before,
           CAST(b.tokens_before - COALESCE(r.tokens_after, 0) AS BIGINT)
             AS tokens_removed,
           CAST(COALESCE(r.tokens_after, 0) AS BIGINT) AS tokens_after,
           r.cleaned_hash
    FROM bef b LEFT JOIN reb r USING (doc_id)
    """,
)
def docs_global_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact-substring dedup over the documents table
    (operators/text.py::remove_global_repeated_spans): every duplicated
    10-token span keeps only its lexicographically-first (doc, start)
    occurrence; per-doc before/removed/after counts + cleaned-text
    fingerprint.  The one corpus-wide shuffle keys on the 8-byte gram
    hash (map-side partial min) — a hash-aggregate stand-in for the
    reference recipe's suffix-array global sort."""
    from bigdata_covid19_real_time_spark.operators.text import (
        remove_global_repeated_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    return remove_global_repeated_spans(docs, n=N)
