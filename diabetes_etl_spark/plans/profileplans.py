"""Registered column-profiling query (operators/profile.py) over the
``part`` fixture — the ANALYZE-pass shape: every statistic for every
column in ONE scan, then unpivoted to (column, metric) rows.

The DuckDB oracle recomputes each column's statistics independently
(one CTE, one UNION ALL arm per column) with the same decimal-folded
mean, so any drift in null handling, distinct counting, or the
fold-order of the mean shows up as a hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from diabetes_etl_spark.functions.numeric import sql_dec_cast, sql_dec_sum
from diabetes_etl_spark.operators.profile import profile_table
from diabetes_etl_spark.plans.registry import register
from diabetes_etl_spark.sources.tables import load_table

_NUMERIC = {"p_partkey", "p_size", "p_retailprice"}
_STRING = {"p_name", "p_brand", "p_type"}
_COLS = ("p_brand", "p_name", "p_partkey", "p_retailprice", "p_size", "p_type")


def _mean_sql(col: str) -> str:
    return sql_dec_cast(
        f"{sql_dec_sum(f'CAST({col} AS DOUBLE)', 6)} / COUNT({col})", 6
    )


def _avglen_sql(col: str) -> str:
    return sql_dec_cast(
        f"{sql_dec_sum(f'CAST(length({col}) AS DOUBLE)', 4)} / COUNT({col})", 4
    )


def _arm(col: str) -> str:
    if col in _NUMERIC:
        mn = f"CAST(MIN({col}) AS DOUBLE)"
        mx = f"CAST(MAX({col}) AS DOUBLE)"
        mean = _mean_sql(col)
    else:
        mn = mx = mean = "CAST(NULL AS DOUBLE)"
    avglen = _avglen_sql(col) if col in _STRING else "CAST(NULL AS DOUBLE)"
    return f"""
  SELECT '{col}' AS "column", COUNT(*) AS n_rows,
    CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_nulls,
    COUNT(DISTINCT {col}) AS n_distinct,
    {mn} AS min_value, {mx} AS max_value, {mean} AS mean_value,
    {avglen} AS avg_length
  FROM part"""


_PROFILE_ORACLE = "\nUNION ALL".join(_arm(c) for c in _COLS) + '\nORDER BY "column"'


@register(
    "profile_part_columns",
    oracle=_PROFILE_ORACLE,
    doc="Column profile of the part table: null counts, exact distinct "
    "cardinality, numeric min/max/decimal-folded mean, string average "
    "length — ALL columns in one aggregate pass over one scan "
    "(operators/profile.py; the oracle recomputes per column).  The "
    "approx=True variant swaps exact distincts for HLL sketches — the "
    "100 TB profile, where per-column exact-distinct shuffles are the "
    "dominant cost.",
    tags=("profile", "agg", "stats", "extension"),
    extended=False,  # promoted to the gate round 6 (see registry._EXTENDED rationale)
)
def profile_part_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(load_table(spark, sf_dir, "part"))
