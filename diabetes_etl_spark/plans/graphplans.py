"""Registered PageRank query (operators/graph.py) over the
supplier↔customer trade graph (distinct supplier→customer pairs from
lineitem⋈orders, made symmetric so no node dangles).

The oracle UNROLLS the same three power iterations as SQL CTE layers
with the same decimal-folded contribution sums — an iterative
algorithm under the gate-style hash comparison, which a float
implementation could never pass (reduction order would leak into the
last ulp; the decimal fold is what pins it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diabetes_etl_spark.operators.graph import pagerank
from diabetes_etl_spark.plans.registry import register
from diabetes_etl_spark.sources.tables import load_table

_D = 0.85
_ITERS = 3
_OFFSET = 1.0 - _D  # same python float the operator uses


def _iter_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT nd.node,
    CAST(CAST(CAST({_OFFSET!r} AS DOUBLE) / nn.n
              + CAST({_D} AS DOUBLE) * COALESCE(m.mass, 0.0)
         AS DECIMAL(18,12)) AS DOUBLE) AS rank
  FROM nodes nd
  CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node,
      CAST(SUM(CAST(p.rank / deg.deg AS DECIMAL(38,15))) AS DOUBLE) AS mass
    FROM e
    JOIN {prev} p ON e.src = p.node
    JOIN deg ON e.src = deg.src
    GROUP BY e.dst
  ) m ON nd.node = m.node
)"""


_PR_ORACLE = (
    """
WITH raw AS (
  SELECT DISTINCT l_suppkey AS s, o_custkey + 1000000 AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS (SELECT s AS src, c AS dst FROM raw
      UNION SELECT c AS src, s AS dst FROM raw),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
r0 AS (
  SELECT node,
    CAST(CAST(CAST(1.0 AS DOUBLE) / nn.n AS DECIMAL(18,12)) AS DOUBLE)
      AS rank
  FROM nodes CROSS JOIN nn
),"""
    + ",".join(_iter_sql(f"r{i}", f"r{i + 1}") for i in range(_ITERS))
    + f"""
SELECT node, rank FROM r{_ITERS} ORDER BY node
"""
)


@register(
    "graph_pagerank_trade",
    oracle=_PR_ORACLE,
    doc=f"PageRank ({_ITERS} power iterations, damping {_D}) over the "
    "symmetric supplier↔customer trade graph.  Per iteration: one "
    "edges⋈ranks join + one decimal-folded aggregate on dst; rank "
    "state is O(nodes) and materialized each round (lineage "
    "truncation — the components.py pattern).  The oracle unrolls "
    "identical iterations as CTE layers, so the hash pins every "
    "intermediate round, not just the fixed point.",
    tags=("graph", "iterative", "pagerank", "extension"),
    extended=False,  # promoted to the gate round 6 (see registry._EXTENDED rationale)
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(
        edges, iterations=_ITERS, damping=_D, symmetric=True
    )
    return ranks.orderBy("node")


@register(
    "graph_triangle_count",
    oracle="""
WITH co AS (
  SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
),
wedges AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM co e1 JOIN co e2 ON e1.b = e2.a
),
tri AS (
  SELECT w.a, w.b, w.c FROM wedges w JOIN co e3
    ON w.a = e3.a AND w.c = e3.b
)
SELECT
  (SELECT COUNT(*) FROM co)     AS n_edges,
  (SELECT COUNT(*) FROM wedges) AS n_wedges,
  (SELECT COUNT(*) FROM tri)    AS n_triangles,
  (SELECT COUNT(*) FROM tri) * (CAST(3 AS DOUBLE) /
    (SELECT COUNT(*) FROM wedges)) AS closure_ratio
""",
    doc="Triangle counting over the supplier co-purchase graph "
    "(suppliers sharing an order): canonical id-ordered edges "
    "(a < b < c), one self-join builds wedges, one membership join "
    "closes them — the standard two-join MapReduce triangle count.  "
    "At scale the orientation would be by DEGREE (low -> high), which "
    "bounds per-node join fan-out by sqrt(m) and kills hub skew; the "
    "id orientation keeps the oracle byte-identical, and the "
    "degree-ordered variant changes only the orientation expression.  "
    "closure_ratio (global clustering coefficient numerator 3T/W) is "
    "one IEEE division + multiply — bit-identical cross-engine.",
    tags=("graph", "triangles", "extension"),
    extended=True,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    a = li.alias("a")
    b = li.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("a"), F.col("b.l_suppkey").alias("b")
        )
        .distinct()
    )
    e1 = co.alias("e1")
    e2 = co.alias("e2")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a")).select(
        F.col("e1.a").alias("a"),
        F.col("e1.b").alias("b"),
        F.col("e2.b").alias("c"),
    )
    e3 = co.select(
        F.col("a").alias("ea"), F.col("b").alias("eb")
    )
    tri = wedges.join(
        e3, (F.col("a") == F.col("ea")) & (F.col("c") == F.col("eb"))
    ).select("a", "b", "c")
    n_edges = co.agg(F.count("*").alias("n_edges"))
    n_wedges = wedges.agg(F.count("*").alias("n_wedges"))
    n_tri = tri.agg(F.count("*").alias("n_triangles"))
    return (
        n_edges.crossJoin(F.broadcast(n_wedges))
        .crossJoin(F.broadcast(n_tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                F.col("n_triangles")
                * (F.lit(3).cast("double") / F.col("n_wedges"))
            ).alias("closure_ratio"),
        )
    )
