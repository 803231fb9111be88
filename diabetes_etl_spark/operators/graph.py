"""Fixed-iteration PageRank over an edge DataFrame — the second
iterative-graph operator next to connected components
(operators/components.py), showing the general driver-side-loop /
executor-side-data pattern for algorithms Catalyst can't express in
one plan.

Determinism contract: contribution sums fold through fixed-scale
DECIMAL (functions/numeric.py rationale), so ranks are bit-identical
across partitionings AND against a SQL oracle that unrolls the same
iterations — which makes even this iterative operator hash-checkable,
unlike the typical float PageRank whose result depends on reduction
order.

Scale notes (100 TB lens):
- state per iteration is (node, rank) — two longs' worth per node,
  never edges × anything;
- each iteration is ONE join (edges ⋈ ranks on src — the join the
  next aggregation needs anyway) + ONE aggregate on dst; out-degrees
  are computed once up front and travel WITH the rank row (joined
  once, not per iteration);
- the iteration count is fixed (power iteration converges
  geometrically at damping^k; 10-20 rounds is production practice —
  web-graph PageRank, not an unbounded loop);
- lineage is truncated per round via eager materialization of the
  small rank table (same executor-loss-safe parquet-checkpoint
  pattern as components.py when `checkpoint_dir` is given; plain
  persist otherwise — ranks are O(nodes), cheap to rebuild).

Dangling nodes: the caller chooses — `symmetric=True` doubles each
edge so no node dangles (undirected interpretation); with directed
edges, dangling mass is dropped (ranks then sum to < 1, the
"simplified PageRank" convention) — both conventions replicate
exactly in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diabetes_etl_spark.functions.numeric import dec_cast, dec_sum

_SCALE = 12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    symmetric: bool = True,
) -> DataFrame:
    """(node, rank) after ``iterations`` of power iteration at 12
    decimal digits.  Ranks start uniform at 1/N (N computed IN-PLAN
    via a broadcast 1-row aggregate — no driver collect)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if symmetric:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_total = nodes.agg(F.count("*").alias("__n"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = (
        nodes.crossJoin(F.broadcast(n_total))
        .select(
            "node",
            dec_cast(F.lit(1.0) / F.col("__n"), _SCALE).alias("rank"),
            F.col("__n"),
        )
        .persist()
    )
    ranks.count()  # materialize the base
    for _ in range(iterations):
        contribs = (
            e.join(
                ranks.select(
                    F.col("node").alias("src"), "rank", F.col("__n")
                ),
                "src",
            )
            .join(F.broadcast(outdeg), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
                F.col("__n"),
            )
            .groupBy("node", "__n")
            # fold at scale 15 (not the output's 12): a 12-decimal rank
            # divided by a small integer degree can land EXACTLY on a
            # 13th-decimal 5, where Spark's HALF_UP and a SQL oracle's
            # half-even decimal casts disagree; three extra digits put
            # the cast far below any exactly-representable tie
            .agg(dec_sum(F.col("c"), _SCALE + 3, 38).alias("in_mass"))
        )
        new_ranks = (
            ranks.select("node", "__n")
            .join(contribs.select("node", "in_mass"), "node", "left")
            .select(
                "node",
                dec_cast(
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("in_mass"), F.lit(0.0)),
                    _SCALE,
                ).alias("rank"),
                F.col("__n"),
            )
            .persist()
        )
        new_ranks.count()  # materialize before unpersisting the parent
        ranks.unpersist()
        ranks = new_ranks
    return ranks.select("node", "rank")
