"""TF-IDF keyword extraction and token-distribution entropy.

Corpus-statistics operators for the training-data extension surface:
``tfidf_top_terms`` surfaces each document's most characteristic terms
(keyword extraction / topic tagging); ``unigram_entropy`` scores the
token distribution's Shannon entropy — a low-entropy document is
repetitive boilerplate even when its raw token count looks healthy
(complements operators/text.py::repetition_stats' TTR/coverage
signals).

Both are pure DataFrame compositions over the one exploded
``(doc_id, term)`` table:

- TF is one groupBy on (doc_id, term) with map-side partial
  aggregation; DF is one groupBy on term over the collapsed TF table.
  The TF<->DF join shuffles on the term; at 100 TB group on
  ``xxhash64(term)`` instead to shuffle 8-byte keys (the gate keys on
  the string so the DuckDB oracle can replicate membership).
- The corpus size N joins in as a broadcast single-row frame — no
  driver-side ``.count()`` action at plan-build time.
- Entropy needs no join at all: ``H = ln(n) - sum(tf*ln(tf))/n`` turns
  the per-document normalization into a single aggregate pass over the
  TF table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.operators.text import tokens


def _term_freq(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, term) with its occurrence count."""
    from bigdata_covid19_real_time_spark.operators.fanout import fan_out_scan

    # scale-adaptive fan-out (no-op on session-parallel or derived
    # inputs), keyed so this groupBy and per-doc rollups reuse it
    staged = fan_out_scan(
        df.select(F.col(id_col), F.col(text_col)), key=id_col
    )
    term_rows = staged.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    return term_rows.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF.

    ``tfidf = tf * ln((N + 1) / (doc_freq + 1))`` (smoothed IDF).  The
    per-document ranking orders by the 6-decimal-rounded score (the two
    engines' ``ln`` can differ in the last ulp; rounding before ranking
    makes the order — not just the output — cross-engine stable) with
    the term string as the deterministic tie-break.

    Output: ``(id_col, term, tf, doc_freq, tfidf, term_rank)``.
    """
    tf = _term_freq(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("doc_freq") + F.lit(1.0)))
                + F.lit(1e-9),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", "tfidf", "term_rank")
    )


def unigram_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy of the unigram distribution (nats).

    ``H = -sum(p_i ln p_i) = ln(n) - sum(tf_i ln tf_i) / n`` — the
    rewrite needs no second pass for the normalizer, so the whole
    operator is explode -> groupBy(doc, term) -> groupBy(doc).

    Output: ``(id_col, token_total, distinct_terms, entropy)``.
    """
    tf = _term_freq(df, id_col, text_col)
    agg = tf.groupBy(id_col).agg(
        F.sum("tf").alias("token_total"),
        F.count(F.lit(1)).alias("distinct_terms"),
        F.sum(F.col("tf") * F.log("tf")).alias("__s"),
    )
    n = F.col("token_total")
    return agg.select(
        F.col(id_col),
        "token_total",
        "distinct_terms",
        F.round(F.log(n) - F.col("__s") / n + F.lit(1e-9), 6).alias("entropy"),
    )


def unigram_lm_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document cross entropy (nats/token) against an add-one-
    smoothed unigram LM trained on the same corpus:
    ``p(w) = (c(w) + 1) / (N + V)``, ``H = -sum(tf_w ln p(w)) / n``.

    The CCNet/Gopher perplexity-filter shape with the n-gram LM reduced
    to its unigram case — high ``cross_entropy`` documents are
    out-of-distribution for the corpus (gibberish, wrong language);
    anomalously low ones are boilerplate.

    Scale: training is one term-keyed aggregate over the exploded TF
    table (map-side partials collapse each partition to its distinct
    terms); (N, V) is a broadcast single-row frame; scoring re-joins TF
    to the count table on the term — at 100 TB key that join on
    ``xxhash64(term)`` to shuffle 8-byte keys.  Two shuffles total on
    top of the TF table, no driver-side state.

    Output: ``(id_col, token_total, cross_entropy)`` (entropy rounded
    to 6 decimals, cross-engine stable).
    """
    tf = _term_freq(df, id_col, text_col)
    counts = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n_tokens"), F.count(F.lit(1)).alias("vocab")
    )
    log_p = F.log(
        (F.col("c") + F.lit(1.0)) / (F.col("n_tokens") + F.col("vocab"))
    )
    return (
        tf.join(counts, "term")
        .join(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("token_total"),
            F.round(
                -F.sum(F.col("tf") * log_p) / F.sum("tf") + F.lit(1e-9), 6
            ).alias("cross_entropy"),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross entropy against an interpolated bigram LM
    trained on the same corpus:
    ``p(w2|w1) = lam * c(w1 w2)/c(w1) + (1-lam) * (c(w2)+1)/(N+V)``
    (bigram MLE backed off to the add-one unigram; ``c`` are corpus
    counts).  Documents shorter than 2 tokens emit no row.

    The production perplexity-filter shape (CCNet uses a 5-gram KenLM;
    the bigram case carries the same join structure): a lower entropy
    than the unigram scorer's on fluent text, a sharper spike on
    shuffled/garbled text where unigram stats look normal.

    Scale: corpus bigram counts are one partial-agg groupBy over the
    exploded pair table; scoring joins per-doc pair counts to the
    corpus tables on (w1, w2) / w1 / w2 — three term-keyed shuffles
    (hash the terms at 100 TB for 8-byte keys); (N, V) broadcasts.

    Output: ``(id_col, bigram_total, cross_entropy)``.
    """
    from bigdata_covid19_real_time_spark.operators.fanout import fan_out_scan

    toks = fan_out_scan(
        df.select(F.col(id_col), tokens(text_col).alias("__t")).filter(
            F.size("__t") >= 2
        ),
        key=id_col,
    )
    pair_rows = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__t") - 1),
                lambda i: F.struct(
                    F.element_at("__t", i).alias("w1"),
                    F.element_at("__t", i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select(id_col, "p.w1", "p.w2")
    tf12 = pair_rows.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("tf")
    )
    c12 = tf12.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))

    uni = _term_freq(df, id_col, text_col).groupBy("term").agg(
        F.sum("tf").alias("c1")
    )
    totals = uni.agg(F.sum("c1").alias("n_tokens"), F.count(F.lit(1)).alias("vocab"))

    p = F.lit(lam) * F.col("c12") / F.col("__cw1") + F.lit(1.0 - lam) * (
        (F.col("__cw2") + F.lit(1.0)) / (F.col("n_tokens") + F.col("vocab"))
    )
    return (
        tf12.join(c12, ["w1", "w2"])
        .join(uni.select(F.col("term").alias("w1"), F.col("c1").alias("__cw1")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("c1").alias("__cw2")), "w2")
        .join(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("bigram_total"),
            F.round(
                -F.sum(F.col("tf") * F.log(p)) / F.sum("tf") + F.lit(1e-9), 6
            ).alias("cross_entropy"),
        )
    )
