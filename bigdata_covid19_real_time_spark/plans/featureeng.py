"""Feature-engineering and index-building batch: EWMA smoothing, SCD2
dimension build, winsorized robust stats, k-fold split balance audit,
corpus readability, and an inverted bigram posting-list index.

Extends the analytics family (SURVEY.md §2 extension brief — the
reference's feature surface ends at trailing averages and growth rates,
``covid_streaming.py:120-180``) with the remaining closed-form feature
and curation primitives a training-data pipeline runs before modeling.
Every estimator here is exactly SQL-expressible, so each query carries
a full DuckDB oracle.

Scale shapes:

- ``events_value_ewma``: the exponentially weighted mean is recursive
  (s_t = a*x_t + (1-a)*s_{t-1}) but has the closed form
  s_t = (1-r) * r^t * cumsum(x_i * r^-i) / (1 - r^t) with r = 1-a, so
  it runs as ONE cumulative window per user — no iteration, no UDF.
  Conditioning bound: r^-i stays inside double range/precision for
  ~1300 steps at r=0.8; a longer per-key history would re-base the
  index per year-segment (the weight below any 1300-step horizon is
  < 1e-120 and numerically irrelevant).
- ``customer_priority_scd2``: one lag window finds change points, one
  lead window closes intervals — both over the same (custkey, date)
  sort, so Spark runs them in a single exchange.
- ``brand_winsorized_stats``: exact per-brand percentiles (one
  shuffle), then the clip pass re-joins the 25-row boundary frame by
  broadcast.  Clipping compares against the ROUNDED boundary in both
  engines so a 1-ulp percentile difference cannot flip a row's
  clipped/kept status.
- ``customer_kfold_balance``: fold assignment is the documented
  md5-bucket hash (no rand()), so folds are reproducible across
  engines, runs, and cluster sizes; the audit output is 5 rows.
- ``docs_readability``: three narrow per-row expressions (token count,
  vowel-group count, sentence-mark count) feed a per-language moment
  rollup — corpus-level totals, not per-doc averages, so the result is
  mergeable and one shuffle.
- ``docs_posting_lists``: the inverted-index build BM25 serves from —
  bigram -> sorted posting list, bounded by the [DF_MIN, DF_MAX]
  document-frequency band (rarer is noise, commoner belongs in a
  stopword/impact-ordered tier), so no posting list exceeds DF_MAX
  ids regardless of corpus size.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.operators.sampling import hash_bucket
from bigdata_covid19_real_time_spark.operators.text import tokens
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: EWMA decay: s_t = EWMA_ALPHA*x_t + (1-EWMA_ALPHA)*s_{t-1}.
EWMA_ALPHA = 0.2

#: k-fold split cardinality and its hash seed.
KFOLD_K = 5
KFOLD_SEED = 77

#: Winsorization clip quantiles.
WINSOR_LO = 0.05
WINSOR_HI = 0.95

#: Posting-list document-frequency band (inclusive).
POSTING_DF_MIN = 5
POSTING_DF_MAX = 25


@query(
    "events_value_ewma",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(value) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    idx AS (
      SELECT user_id, day, x,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS t
      FROM daily
    ),
    cum AS (
      SELECT user_id, day, x, t,
             SUM(x * POWER({1 - EWMA_ALPHA}, -t)) OVER (
               PARTITION BY user_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM idx
    )
    SELECT user_id, day, ROUND(x + 1e-9, 4) AS day_value,
           ROUND(POWER({1 - EWMA_ALPHA}, t) * c * {EWMA_ALPHA}
                 / (1 - POWER({1 - EWMA_ALPHA}, t)) + 1e-9, 4) AS ewma
    FROM cum
    """,
)
def events_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of each user's daily value
    total (the standard ``pandas ewm(adjust=True)`` estimator).  The
    recursion is rewritten in closed form — one cumulative window sum
    of x_i * r^-i, re-scaled by r^t — so the whole curve is a single
    window pass per user with no iteration (see module docstring for
    the conditioning bound)."""
    r = 1.0 - EWMA_ALPHA
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("x"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    cumw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    idx = daily.withColumn("t", F.row_number().over(w))
    c = F.sum(F.col("x") * F.pow(F.lit(r), -F.col("t"))).over(cumw)
    return idx.select(
        "user_id",
        "day",
        stable_round(F.col("x"), 4).alias("day_value"),
        stable_round(
            F.pow(F.lit(r), F.col("t"))
            * c
            * F.lit(EWMA_ALPHA)
            / (F.lit(1.0) - F.pow(F.lit(r), F.col("t"))),
            4,
        ).alias("ewma"),
    )


@query(
    "customer_priority_scd2",
    oracle="""
    WITH s AS (
      SELECT o_custkey, o_orderpriority AS p, o_orderdate, o_orderkey,
             LAG(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS pp
      FROM orders
    ),
    chg AS (SELECT * FROM s WHERE pp IS NULL OR pp != p)
    SELECT o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           p AS priority,
           CAST(o_orderdate AS DATE) AS valid_from,
           CAST(LEAD(o_orderdate) OVER w AS DATE) AS valid_to,
           LEAD(o_orderdate) OVER w IS NULL AS is_current
    FROM chg
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def customer_priority_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: each customer's order
    priority becomes a versioned validity interval — a new version
    opens at every order whose priority differs from the previous
    order's, closes at the next change (``valid_to`` NULL + is_current
    on the open one).  This is the lakehouse dimension-build primitive
    (Kimball SCD2) derived purely from the fact stream: one lag window
    to find change points, one lead window to close intervals, both
    over the same partition sort so they share a single exchange."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    s = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
        .withColumn("pp", F.lag("o_orderpriority").over(w))
    )
    chg = s.filter(
        F.col("pp").isNull() | (F.col("pp") != F.col("o_orderpriority"))
    )
    nxt = F.lead("o_orderdate").over(w)
    return chg.select(
        "o_custkey",
        F.row_number().over(w).cast("long").alias("version"),
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("valid_from"),
        F.to_date(nxt).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "brand_winsorized_stats",
    oracle=f"""
    WITH li AS (
      SELECT p.p_brand, l.l_extendedprice AS price
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    pct AS (
      SELECT p_brand,
             ROUND(quantile_cont(price, {WINSOR_LO}) + 1e-9, 4) AS p_lo,
             ROUND(quantile_cont(price, {WINSOR_HI}) + 1e-9, 4) AS p_hi
      FROM li GROUP BY 1
    ),
    clip AS (
      SELECT li.p_brand,
             GREATEST(p_lo, LEAST(p_hi, price)) AS w,
             CASE WHEN price < p_lo OR price > p_hi THEN 1 ELSE 0 END AS c
      FROM li JOIN pct ON pct.p_brand = li.p_brand
    ),
    m AS (
      SELECT p_brand, COUNT(*) AS n, SUM(c) AS nc,
             SUM(w) AS s, SUM(w * w) AS ss
      FROM clip GROUP BY 1
    )
    SELECT m.p_brand, CAST(n AS BIGINT) AS n_items,
           pct.p_lo, pct.p_hi, CAST(nc AS BIGINT) AS n_clipped,
           ROUND(s / n + 1e-9, 4) AS win_mean,
           ROUND(CASE WHEN n > 1
                      THEN SQRT((ss - s * s / n) / (n - 1)) ELSE 0.0 END
                 + 1e-9, 4) AS win_std
    FROM m JOIN pct ON pct.p_brand = m.p_brand
    """,
)
def brand_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped-tail) price statistics per brand: exact
    p05/p95 boundaries, tails clipped to them, then mean/std of the
    clipped sample — the outlier-robust feature-scaling pass.  Two
    passes over the fact table: one percentile shuffle, then a clip
    pass that re-joins the 25-row boundary frame by broadcast.  Rows
    clip against the ROUNDED boundary in BOTH engines so a 1-ulp
    percentile difference cannot flip a boundary row's status; std
    comes from explicit mergeable moments so both engines accumulate
    identically."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_brand", F.col("l_extendedprice").alias("price"))
    )
    pct = li.groupBy("p_brand").agg(
        stable_round(F.expr(f"percentile(price, {WINSOR_LO})"), 4).alias("p_lo"),
        stable_round(F.expr(f"percentile(price, {WINSOR_HI})"), 4).alias("p_hi"),
    )
    clip = li.join(F.broadcast(pct), "p_brand").select(
        "p_brand",
        "p_lo",
        "p_hi",
        F.greatest("p_lo", F.least("p_hi", F.col("price"))).alias("w"),
        F.when(
            (F.col("price") < F.col("p_lo")) | (F.col("price") > F.col("p_hi")),
            1,
        )
        .otherwise(0)
        .alias("c"),
    )
    m = clip.groupBy("p_brand", "p_lo", "p_hi").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("nc"),
        F.sum("w").alias("s"),
        F.sum(F.col("w") * F.col("w")).alias("ss"),
    )
    return m.select(
        "p_brand",
        F.col("n").cast("long").alias("n_items"),
        "p_lo",
        "p_hi",
        F.col("nc").cast("long").alias("n_clipped"),
        stable_round(F.col("s") / F.col("n"), 4).alias("win_mean"),
        stable_round(
            F.when(
                F.col("n") > 1,
                F.sqrt(
                    (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
                    / (F.col("n") - 1)
                ),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("win_std"),
    )


@query(
    "customer_kfold_balance",
    oracle=f"""
    WITH folds AS (
      SELECT c_custkey,
             (('0x' || substr(md5('{KFOLD_SEED}:' || CAST(c_custkey AS VARCHAR)),
                              1, 15))::BIGINT % 1000000) % {KFOLD_K} AS fold
      FROM customer
    ),
    j AS (
      SELECT f.fold, f.c_custkey, o.o_orderkey, o.o_totalprice
      FROM folds f LEFT JOIN orders o ON o.o_custkey = f.c_custkey
    ),
    agg AS (
      SELECT fold, COUNT(DISTINCT c_custkey) AS n_customers,
             COUNT(o_orderkey) AS n_orders,
             COALESCE(SUM(o_totalprice), 0.0) AS revenue
      FROM j GROUP BY 1
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(n_orders AS BIGINT) AS n_orders,
           ROUND(revenue + 1e-9, 2) AS revenue,
           ROUND(revenue / SUM(revenue) OVER () + 1e-9, 6) AS revenue_share
    FROM agg
    """,
)
def customer_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment with a balance audit: every
    customer lands in one of {KFOLD_K} folds by the documented
    md5-bucket hash (deterministic across engines, runs, and cluster
    sizes — never ``rand()``), all their orders follow (group-aware,
    so no customer leaks across folds), and the audit reports per-fold
    customer/order/revenue balance.  One customer-key join; the audit
    output is {KFOLD_K} rows."""
    folds = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.pmod(hash_bucket(F.col("c_custkey"), KFOLD_SEED), F.lit(KFOLD_K)).alias(
            "fold"
        ),
    )
    j = folds.join(
        load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_totalprice"
        ),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    )
    agg = j.groupBy("fold").agg(
        F.countDistinct("c_custkey").alias("n_customers"),
        F.count("o_orderkey").alias("n_orders"),
        F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("revenue"),
    )
    return agg.select(
        F.col("fold").cast("long").alias("fold"),
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("n_orders").cast("long").alias("n_orders"),
        stable_round(F.col("revenue"), 2).alias("revenue"),
        stable_round(
            F.col("revenue") / F.sum("revenue").over(Window.partitionBy()), 6
        ).alias("revenue_share"),
    )


@query(
    "docs_readability",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             len(string_split(trim(text), ' ')) AS words,
             length(lower(text))
               - length(replace(regexp_replace(lower(text), '[aeiou]+', 'V', 'g'),
                                'V', '')) AS vgroups,
             length(text) - length(translate(text, '.!?', '')) AS smarks
      FROM documents WHERE lang IS NOT NULL
    ),
    m AS (
      SELECT lang, COUNT(*) AS n_docs, SUM(words) AS w,
             SUM(vgroups) AS v, GREATEST(1, SUM(smarks)) AS s
      FROM per_doc GROUP BY 1
    )
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           ROUND(w * 1.0 / s + 1e-9, 4) AS words_per_sentence,
           ROUND(v * 1.0 / w + 1e-9, 4) AS syllables_per_word,
           ROUND(206.835 - 1.015 * (w * 1.0 / s) - 84.6 * (v * 1.0 / w)
                 + 1e-9, 4) AS flesch
    FROM m
    """,
)
def docs_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus readability per language: Flesch reading-ease from
    corpus-level totals — words (whitespace tokens), sentences
    (terminal-punctuation marks, floored at 1), and a syllable proxy
    (maximal vowel groups, the standard dictionary-free estimator).
    Three narrow per-row expressions feed one mergeable per-language
    rollup; totals (not per-doc averages) keep the estimator exactly
    mergeable across partitions.  Quality-filter companion to
    ``docs_quality_filter``: readability drift flags template or
    machine-generated text."""
    lowered = F.lower(F.col("text"))
    vg = F.regexp_replace(lowered, "[aeiou]+", "V")
    per_doc = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull())
        .select(
            "lang",
            F.size(tokens("text")).alias("words"),
            (F.length(lowered) - F.length(F.regexp_replace(vg, "V", ""))).alias(
                "vgroups"
            ),
            (F.length("text") - F.length(F.translate("text", ".!?", ""))).alias(
                "smarks"
            ),
        )
    )
    m = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").alias("w"),
        F.sum("vgroups").alias("v"),
        F.greatest(F.lit(1).cast("long"), F.sum("smarks")).alias("s"),
    )
    wps = F.col("w") * F.lit(1.0) / F.col("s")
    spw = F.col("v") * F.lit(1.0) / F.col("w")
    return m.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        stable_round(wps, 4).alias("words_per_sentence"),
        stable_round(spw, 4).alias("syllables_per_word"),
        stable_round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4
        ).alias("flesch"),
    )


@query(
    "docs_posting_lists",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents
    ),
    big AS (
      SELECT DISTINCT doc_id, tk[u.i] || ' ' || tk[u.i + 1] AS bigram
      FROM toks, unnest(range(1, len(tk))) AS u(i)
      WHERE len(tk) >= 2
    ),
    tf AS (
      SELECT tk[u.i] || ' ' || tk[u.i + 1] AS bigram, COUNT(*) AS tf_total
      FROM toks, unnest(range(1, len(tk))) AS u(i)
      WHERE len(tk) >= 2 GROUP BY 1
    ),
    pl AS (
      SELECT bigram, COUNT(*) AS df,
             array_to_string(list_sort(list(doc_id)), ',') AS postings
      FROM big GROUP BY 1
      HAVING COUNT(*) BETWEEN {POSTING_DF_MIN} AND {POSTING_DF_MAX}
    )
    SELECT pl.bigram, CAST(df AS BIGINT) AS df,
           CAST(tf.tf_total AS BIGINT) AS tf_total, postings
    FROM pl JOIN tf ON tf.bigram = pl.bigram
    """,
)
def docs_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: bigram -> sorted posting list of doc ids,
    for terms inside the [{POSTING_DF_MIN}, {POSTING_DF_MAX}]
    document-frequency band — the physical index a BM25/impact-ordered
    retrieval tier serves from (``docs_bm25_topk`` recomputes scores
    from raw text; this materializes the reusable index).  The DF band
    bounds every posting list at {POSTING_DF_MAX} ids regardless of
    corpus size (commoner terms belong in a stopword/impact tier,
    rarer are noise), so the output never carries an unbounded array.
    One bigram explode, one distinct, one groupBy.

    The posting list is emitted as a comma-joined STRING (numerically
    sorted before joining) rather than ``array<string>``: the driver's
    oracle harness canonicalizes results via pandas ``sort_values``,
    which cannot hash list cells (round-6 ``err`` row), and all
    registered queries therefore return scalar columns only
    (pinned by ``tests/test_entry_contract.py``)."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("__t")
    )
    big = (
        toks.filter(F.size("__t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("__t", i), F.element_at("__t", i + 1)
                    ),
                )
            ).alias("bigram"),
        )
    )
    tf = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("tf_total"))
    pl = (
        big.distinct()
        .groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df").between(POSTING_DF_MIN, POSTING_DF_MAX))
    )
    return pl.join(tf, "bigram").select(
        "bigram",
        F.col("df").cast("long").alias("df"),
        F.col("tf_total").cast("long").alias("tf_total"),
        "postings",
    )
