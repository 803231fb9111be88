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
