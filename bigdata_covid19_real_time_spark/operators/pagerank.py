"""Fixed-iteration PageRank over an edge list — DataFrame-only.

Graph centrality over entity graphs derived from the corpus (the
quality signal web-corpus pipelines compute over the domain link graph
— harmonic/PageRank centrality feeds crawl prioritization and
quality weighting).  No GraphX/GraphFrames dependency: the power
iteration is a join+groupBy per round, the same discipline as
``components.connected_components``.

Semantics (the gate's SQL oracle replicates exactly):
- ranks init to 1/N over the node set (sources ∪ destinations);
- per round: ``rank = (1-d)/N + d * (in_contrib + dangling_mass/N)``
  where ``in_contrib`` sums ``rank/out_degree`` over in-edges and
  ``dangling_mass`` is the rank held by nodes with no out-edges;
- a FIXED iteration count (deterministic output, oracle-expressible),
  not a convergence loop.

Scale: each round shuffles the edge list once on ``src`` (join ranks)
and once on ``dst`` (sum contributions) — rows are (long, long, double);
N and the dangling mass ride as broadcast 1-row frames, never a
driver-side collect in the loop.  Lineage truncates per round
(``localCheckpoint``) exactly like connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank) after ``n_iters`` power iterations over the
    directed ``edges`` frame.  Ranks sum to 1 (dangling mass is
    redistributed uniformly)."""
    # LAZY lineage truncation (the components.connected_components
    # pattern): each localCheckpoint still cuts the Catalyst plan at the
    # RDD boundary immediately, but materialization folds into the
    # caller's own action instead of running one eager job per call —
    # the eager form cost a job per checkpoint (5+ extra scheduling
    # rounds for 3 iterations) with identical total work.
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_frame = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__out"))
    # Loop-invariant hoist: the (src, dst, out_degree) frame does not
    # change across iterations — joining deg inside the loop re-ran the
    # degree aggregate + join every round.
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    # The dangling-node SET is loop-invariant too (nodes with no
    # out-edge); only the rank mass over it changes per round.
    dangling_nodes = nodes.join(
        deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=False)

    ranks = nodes.join(n_frame).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(n_iters):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("__out")).alias("__m"))
        )
        dangling = F.broadcast(
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .join(dangling)
            .join(n_frame)
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__m"), F.lit(0.0))
                        + F.col("__dm") / F.col("__n")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
