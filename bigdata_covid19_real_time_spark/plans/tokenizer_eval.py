"""Tokenizer evaluation: per-language BPE fertility.

Fertility (BPE tokens emitted per whitespace word) and its inverse
view (characters per token) are the standard way to judge how well a
trained tokenizer serves each language in a multilingual corpus — a
language with outsized fertility pays more sequence length per unit of
text, which skews both training cost and effective mixing weights.
This query trains the engine's 8-merge BPE on the documents corpus
(``operators/bpe.py:train_bpe_merges`` — the same certified hybrid
trainer behind ``docs_bpe_vocab``), encodes the corpus with
``apply_bpe``, and reports per-language word/token/char totals and the
two ratios.

Oracle: reuses the certified unrolled-trainer CTE chain
(``plans/tokenizer.py:_bpe_round_ctes`` with ``final_table=True`` —
the ``w8`` table IS the ``apply_bpe`` segmentation of every distinct
word), strips the bracket encoding back to the original word, and
joins per-(lang, word) counts — so a wrong merge order, a non-greedy
encoder scan, or a mis-weighted aggregation all surface as value
mismatches.

Scale: the trainer is the certified staged pipeline (distinct-word
staging + bounded merge loop); the encoder is one Arrow map; the
fertility aggregation is a narrow per-doc projection into a 5-row
groupBy — nothing here shuffles document text.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.plans.tokenizer import (
    _CL,
    _OP,
    _bpe_round_ctes,
)
from bigdata_covid19_real_time_spark.sources.batch import load_table

N_MERGES = 8

_FERTILITY_ORACLE = (
    "WITH "
    + ",\n    ".join(_bpe_round_ctes(N_MERGES, 2, final_table=True))
    + f""",
    seg AS (
      SELECT replace(replace(s, {_OP}, ''), {_CL}, '') AS w,
             len(string_split(trim(s, {_OP} || {_CL}),
                              {_CL} || {_OP})) AS n_toks
      FROM w{N_MERGES}
    ),
    lw AS (
      SELECT lang, u.w AS w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents, unnest(string_split(text, ' ')) AS u(w)
      WHERE text IS NOT NULL AND lang IS NOT NULL AND len(u.w) >= 1
      GROUP BY 1, 2
    )
    SELECT lang,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(SUM(cnt * n_toks) AS BIGINT) AS n_tokens,
           CAST(SUM(cnt * len(w)) AS BIGINT) AS n_chars,
           ROUND(SUM(cnt * n_toks) * 1.0 / SUM(cnt) + 1e-9, 6)
             AS fertility,
           ROUND(SUM(cnt * len(w)) * 1.0 / SUM(cnt * n_toks) + 1e-9, 6)
             AS chars_per_token
    FROM lw JOIN seg USING (w)
    GROUP BY 1"""
)


@query("docs_bpe_fertility", oracle=_FERTILITY_ORACLE)
def docs_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language fertility of the corpus-trained 8-merge BPE: word /
    token / character totals, tokens-per-word, and chars-per-token (see
    module docstring).  Plan shape: the certified trainer, one Arrow
    encode map, then a narrow per-doc projection (token count = array
    size, char count = whitespace-stripped length) aggregated into a
    |languages|-row frame."""
    from bigdata_covid19_real_time_spark.operators.bpe import (
        apply_bpe,
        train_bpe_merges,
    )

    # the trainer corpus is every non-null text (matching the oracle's
    # w0); the lang filter applies only to the per-language report
    corpus = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    merges = train_bpe_merges(corpus, n_merges=N_MERGES)
    docs = corpus.filter(F.col("lang").isNotNull())
    encoded = apply_bpe(docs, merges)
    per_doc = encoded.join(
        docs.select("doc_id", "lang", "text"), "doc_id"
    ).select(
        "lang",
        F.size("bpe_tokens").alias("n_toks"),
        # exclude empty words (consecutive/leading/trailing spaces) to
        # match the oracle's len(u.w) >= 1 filter — size(split(...))
        # would count them and skew fertility on non-single-spaced text
        F.size(
            F.filter(F.split("text", " "), lambda w: w != F.lit(""))
        ).alias("n_words"),
        F.length(F.translate("text", " ", "")).alias("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        stable_round(
            F.sum("n_toks") * F.lit(1.0) / F.sum("n_words"), 6
        ).alias("fertility"),
        stable_round(
            F.sum("n_chars") * F.lit(1.0) / F.sum("n_toks"), 6
        ).alias("chars_per_token"),
    )
