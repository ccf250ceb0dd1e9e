"""Tokenizer-induction statistics: the distributed primitive inside a
BPE trainer — corpus-wide adjacent-symbol-pair counting.

A BPE vocabulary build loops: count all adjacent symbol pairs across
the corpus, take the global argmax, broadcast the merge, repeat.  The
loop is driver-cheap (one argmax + a broadcast map per round); the
expensive distributed step is the pair count, which is what this query
exercises end-to-end over the documents table: explode words, explode
each word's adjacent character pairs (a narrow staged projection —
no Python), one partial-aggregated groupBy, deterministic top-25.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.registry import query
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "docs_bpe_pair_counts",
    oracle="""
    WITH w AS (
      SELECT u.w AS w
      FROM documents, unnest(string_split(text, ' ')) AS u(w)
      WHERE text IS NOT NULL
    ),
    p AS (
      SELECT substr(w, i.i, 2) AS pair
      FROM w, unnest(range(1, len(w))) AS i(i)
      WHERE len(w) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM p GROUP BY 1
    ORDER BY cnt DESC, pair ASC LIMIT 25
    """,
)
def docs_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 adjacent character pairs across all corpus words — BPE's
    first merge-round statistic.  Words and their pairs are staged
    narrow projections (split -> explode -> substr over a sequence);
    the only shuffle is the partial-aggregated pair count, and the
    top-25 is a TakeOrderedAndProject, not a global sort."""
    words = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(25)
    )


#: Bracket codepoints for the unrolled BPE oracles — both below the
#: corpus char range (32..121), so symbols never contain them.
_OP, _CL = "chr(30)", "chr(31)"


def _bpe_round_ctes(n_merges: int, min_count: int, final_table: bool) -> list[str]:
    """CTE chain for an unrolled ``n_merges``-round BPE trainer.

    ``n_merges`` is a fixed constant of each gated query, so the driver
    loop is finitely unrollable as chained CTEs (the same
    fixed-iteration pattern the PageRank and IVF-PQ oracles use).
    Encoding: each word's symbol sequence is a string of bracket-wrapped
    symbols ``chr(30)+sym+chr(31)``.  With that encoding the merge step
    — replace adjacent pair (a,b) with a||b, greedy left-to-right
    non-overlapping, exactly operators/bpe.py:_merge_kernel — is a
    single SQL ``replace(s, ⟨a⟩⟨b⟩, ⟨ab⟩)``: the brackets anchor both
    match ends at symbol boundaries (no mid-symbol matches), and SQL
    ``replace`` scans greedy left-to-right non-overlapping like the
    kernel.  The ``cnt >= min_count`` guard inside each argmax CTE makes
    early-stop cascade: an empty argmax empties every later round via
    CROSS JOIN.

    ``final_table=True`` additionally emits ``w{n_merges}`` (the word
    table with ALL merges applied) — which is precisely the
    ``apply_bpe`` tokenization of the corpus, since applying the learned
    rules in training order to each word is the encoder's definition.
    """
    op, cl = _OP, _CL
    parts = [
        f"""w0 AS (
      SELECT {op} || array_to_string(string_split(u.w, ''), {cl} || {op})
               || {cl} AS s,
             CAST(COUNT(*) AS BIGINT) AS weight
      FROM documents, unnest(string_split(text, ' ')) AS u(w)
      WHERE text IS NOT NULL AND len(u.w) >= 1
      GROUP BY 1
    )"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(f"""p{k} AS (
      SELECT l[i.i] AS a, l[i.i + 1] AS b, SUM(weight) AS cnt
      FROM (
        SELECT string_split(trim(s, {op} || {cl}), {cl} || {op}) AS l,
               weight
        FROM w{k - 1}
      ) t, unnest(range(1, len(l))) AS i(i)
      WHERE len(l) >= 2
      GROUP BY 1, 2
    ),
    m{k} AS (
      SELECT a, b, CAST(cnt AS BIGINT) AS cnt
      FROM p{k} WHERE cnt >= {min_count}
      ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    )""")
        if k < n_merges or final_table:
            parts.append(f"""w{k} AS (
      SELECT replace(w.s,
                     {op} || m.a || {cl} || {op} || m.b || {cl},
                     {op} || m.a || m.b || {cl}) AS s,
             w.weight
      FROM w{k - 1} w CROSS JOIN m{k} m
    )""")
    return parts


def _bpe_vocab_oracle(n_merges: int = 8, min_count: int = 2) -> str:
    """Unrolled BPE-trainer oracle: the 8 learned merge rules."""
    parts = _bpe_round_ctes(n_merges, min_count, final_table=False)
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({k} AS INTEGER) AS merge_rank, a AS \"left\","
        f" b AS \"right\", cnt AS pair_count FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT * FROM (\n      {union}\n    ) ORDER BY merge_rank"
    )


def _bpe_tokenize_oracle(n_merges: int = 8, min_count: int = 2) -> str:
    """Unrolled trainer + encoder oracle: corpus-wide token counts
    after applying all learned merges (top-25, deterministic order)."""
    parts = _bpe_round_ctes(n_merges, min_count, final_table=True)
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    toks AS (
      SELECT unnest(string_split(trim(s, {_OP} || {_CL}),
                                 {_CL} || {_OP})) AS token,
             weight
      FROM w{n_merges}
    )
    SELECT token, CAST(SUM(weight) AS BIGINT) AS cnt
    FROM toks GROUP BY 1
    ORDER BY cnt DESC, token ASC LIMIT 25"""
    )


@query("docs_bpe_vocab", oracle=_bpe_vocab_oracle(n_merges=8))
def docs_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight BPE merge rules learned from the documents corpus
    (operators/bpe.py:train_bpe_merges — distributed corpus scan +
    distinct-word staging, then the hybrid merge loop: driver-side
    under LOCAL_TRAIN_MAX_WORDS distinct words, per-round distributed
    pair count + broadcast merge kernel above it; deterministic
    tie-breaks, so the output is a pure function of the corpus)."""
    from bigdata_covid19_real_time_spark.operators.bpe import train_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs, n_merges=8)
    return spark.createDataFrame(
        [
            (i + 1, a, b, cnt)
            for i, (a, b, cnt) in enumerate(merges)
        ],
        "merge_rank int, left string, right string, pair_count long",
    )


@query("docs_bpe_tokenize", oracle=_bpe_tokenize_oracle(n_merges=8))
def docs_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 8 BPE merges, ENCODE the whole corpus with them
    (operators/bpe.py:apply_bpe — one Arrow map, rules
    closure-captured), and return the top-25 tokens by corpus count.
    Gates the encoder half of the BPE pair: the oracle replays the
    unrolled trainer AND applies the merges to the distinct-word table
    (training-order rule application to each word IS the encoder), so a
    wrong merge order, a non-greedy scan, or a phantom symbol in
    apply_bpe all surface as a hash mismatch."""
    from bigdata_covid19_real_time_spark.operators.bpe import (
        apply_bpe,
        train_bpe_merges,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs, n_merges=8)
    encoded = apply_bpe(docs, merges)
    return (
        encoded.select(F.explode("bpe_tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(25)
    )
