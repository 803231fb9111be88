"""Connected components over a pair/edge DataFrame — the cluster step
between near-duplicate PAIR detection (dedup.py / similarity.py) and
canonical-document selection: every doc in a transitive near-dup
cluster gets the cluster's min doc id as its component label, so "keep
one per cluster" becomes a single filter (id = component).

Algorithm: iterative min-label propagation.
  comp[v]  <-  min(comp[v], min over neighbors u of comp[u])
repeated until a fixpoint.  Each round is ONE shuffle (groupBy on the
edge source) plus one equi-join — no driver-side graph, no quadratic
work.  Convergence takes O(diameter) rounds; near-dup clusters are
near-cliques (diameter 1-3 — a pair generator that produced a
1000-hop chain of 0.8-Jaccard pairs would itself be broken), so the
loop exits after 2-4 rounds in practice.  For adversarial/general
graphs the published fix is alternating large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14), which converges in O(log^2 n); the hook here is the same
edge relation, so swapping the inner step is local to this file.

Scale notes:
- per-round lineage is truncated with localCheckpoint(eager=True) —
  without it round k replays rounds 1..k-1 and the plan grows
  quadratically;
- the convergence probe piggybacks on the same materialized result
  (a count of changed labels), so each round costs exactly one
  materialization;
- labels are (id, comp) longs — the text/payload never enters the
  loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the minimum
    node id of its connected component.

    Returns (id, component) for every node that appears in at least
    one edge — singletons (docs with no near-dup pair) are not graph
    nodes and are the caller's pass-through.  Raises if ``max_iter``
    rounds don't reach the fixpoint (diameter > max_iter signals a
    pathological pair set, not a tuning problem).
    """
    # materialize the symmetric edge relation ONCE: it re-enters the
    # join every round, and without the checkpoint each round would
    # re-execute the whole upstream pair pipeline (shingling, LSH,
    # verification joins) from scratch
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = sym.join(
            labels, sym["b"] == labels["id"]
        ).groupBy("a").agg(F.min("component").alias("nbr_min"))
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["a"], "left")
            .select(
                labels["id"],
                F.least(
                    labels["component"],
                    F.coalesce(F.col("nbr_min"), labels["component"]),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "the edge set has a longer path than any near-dup cluster "
        "should; raise max_iter only if that is intended"
    )
