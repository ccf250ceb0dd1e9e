"""Bloom-style runtime-filter semi-join: prune a fact scan against a
selective dimension subset *before* the exact join.

Not in the reference (covid_streaming.py has no joins); this is the
classic "runtime filter" / "join pruning" capability every 100 TB
engine needs: when a semi-join keeps only a small fraction of the fact
table, shipping every fact row to the join is wasted shuffle.  Spark's
own bloom pushdown (``bloom_filter_agg`` / ``might_contain``) is an
internal-only rule in 4.x — not callable from the public API — so this
module builds the same structure *relationally*:

- **build**: hash the dim keys into ``m`` buckets with ``n_hashes``
  independent ``xxhash64`` seeds and keep the DISTINCT bucket ids —
  a "bit table" of at most ``m * n_hashes`` 8-byte rows (the set bits
  of a Bloom filter, stored as data instead of a bitmap);
- **probe**: the fact side computes the same bucket ids and LEFT-SEMI
  broadcast-joins against the bit table once per seed.  A fact row
  survives only if ALL its buckets are set — exactly Bloom semantics,
  false positives possible, false negatives impossible;
- **exact pass** (default on): a final semi-join on the real key
  removes the false positives, so the operator's result is EXACTLY the
  plain semi-join — the bloom stage is pure plan improvement.

Design for 100 TB: the bit table is bounded by ``m`` rows regardless of
dim cardinality (DISTINCT collapses collisions), so the broadcast is
``O(m)`` — at the default ``m = 1<<20`` that is ≤8 MiB per seed, the
same budget Spark's own runtime filters use.  Probe joins are broadcast
hash semi-joins on a single long column (codegen, no shuffle of the
fact side); only the pre-filtered survivors reach the exact join.  With
a selective dim (say 0.1% of keys), the exact join's shuffle shrinks
~1000x for two broadcast probes' worth of map-side work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default number of buckets (~1M). FP rate for n distinct keys with k
#: hashes is ~(1 - e^(-k*n/m))^k; at n=100k, k=2, m=1M that is ~3%.
DEFAULT_M = 1 << 20


def _bucket(col, seed: int, m: int):
    # xxhash64's seed parameter must be a foldable literal; pmod keeps
    # the bucket non-negative (hash % m in Java can be negative).
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m))


#: xxhash64 hashes ints through a 4-byte path and longs through an
#: 8-byte path, so int(7) and bigint(7) hash DIFFERENTLY — a dtype
#: mismatch between build and probe keys would silently drop every
#: matching fact row (false negatives the exact pass cannot recover).
#: Keys therefore normalize to a canonical type before hashing.
_WIDEN = {"tinyint": "bigint", "smallint": "bigint", "int": "bigint",
          "bigint": "bigint", "float": "double", "double": "double"}


def _norm_key(df: DataFrame, key_col: str):
    """The key column widened to its canonical hash type (integral ->
    bigint, fractional -> double, everything else unchanged); returns
    (column, canonical dtype name)."""
    dtype = dict(df.dtypes)[key_col]
    canon = _WIDEN.get(dtype)
    if canon is None:
        return F.col(key_col), dtype
    return F.col(key_col).cast(canon), canon


def bloom_bits(dim: DataFrame, key_col: str, m: int = DEFAULT_M, n_hashes: int = 2) -> DataFrame:
    """The "set bits" of a Bloom filter over ``dim[key_col]`` as a
    DataFrame of (seed, bucket) rows — at most ``m * n_hashes`` rows of
    two numeric columns, deduplicated map-side by partial aggregation.
    """
    key, _ = _norm_key(dim, key_col)
    per_seed = [
        dim.select(
            F.lit(s).alias("__seed"), _bucket(key, s, m).alias("__bucket")
        )
        for s in range(n_hashes)
    ]
    bits = per_seed[0]
    for frame in per_seed[1:]:
        bits = bits.unionByName(frame)
    return bits.distinct()


def bloom_probe(
    fact: DataFrame,
    bits: DataFrame,
    key_col: str,
    m: int = DEFAULT_M,
    n_hashes: int = 2,
) -> DataFrame:
    """Keep fact rows whose key *may* be in the filter (all buckets
    set).  One broadcast LEFT SEMI join per seed; each probe carries
    only the 8-byte bucket column, so the fact side is never shuffled.
    """
    key, _ = _norm_key(fact, key_col)
    out = fact
    for s in range(n_hashes):
        seed_bits = F.broadcast(
            bits.filter(F.col("__seed") == s).select("__bucket")
        )
        out = out.join(
            seed_bits,
            _bucket(key, s, m) == seed_bits["__bucket"],
            "left_semi",
        )
    return out


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = DEFAULT_M,
    n_hashes: int = 2,
    exact: bool = True,
) -> DataFrame:
    """Semi-join ``fact`` to ``dim`` with a Bloom pre-filter.

    With ``exact=True`` (default) the result equals the plain
    ``fact SEMI JOIN dim`` bit-for-bit: the bloom stage only reduces the
    rows reaching the exact join.  ``exact=False`` returns the
    pre-filter output alone (a superset containing false positives) —
    useful when a downstream exact join exists anyway.
    """
    _, fact_canon = _norm_key(fact, fact_key)
    _, dim_canon = _norm_key(dim, dim_key)
    if fact_canon != dim_canon:
        # e.g. string vs bigint: widening cannot reconcile these and the
        # probe would false-negative every row — fail loudly instead
        raise ValueError(
            f"bloom_semi_join key dtype mismatch: {fact_key} hashes as "
            f"{fact_canon}, {dim_key} as {dim_canon}; cast one side"
        )
    bits = bloom_bits(dim, dim_key, m=m, n_hashes=n_hashes)
    pruned = bloom_probe(fact, bits, fact_key, m=m, n_hashes=n_hashes)
    if not exact:
        return pruned
    # The exact pass is deliberately NOT forced to broadcast: when the
    # dim subset is small Catalyst/AQE broadcasts it anyway, and when it
    # is too big to broadcast (the case the bloom stage exists for) the
    # shuffle now carries only the pre-filtered survivors.
    keys = dim.select(F.col(dim_key).alias("__exact_key")).distinct()
    return pruned.join(
        keys, F.col(fact_key) == F.col("__exact_key"), "left_semi"
    )
