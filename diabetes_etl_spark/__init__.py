"""diabetes_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference `manjunathBase2/diabetes-etl` pipeline
(a Databricks DLT medallion ETL — see SURVEY.md), extended with the
operator families a large-scale training-data pipeline needs
(dedup, similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    : tuned SparkSession factory (AQE, UTC, Arrow).
- ``sources``    : fixture/table loaders, batch CSV ingest with audit columns.
- ``functions``  : deterministic numeric helpers (decimal-exact sums/avgs),
                   bucketing helpers shared by plans and the diabetes pipeline.
- ``operators``  : reusable compound operators (as-of join, top-k, dedup
                   family, similarity search, text analysis, sessionization).
- ``plans``      : the named query registry that backs ``__spark_entry__``:
                   each query = a PySpark builder + a DuckDB oracle SQL twin.
- ``pipeline``   : the medallion pipeline engine (dlt-style @table/@view
                   decorators, expectations, topo-sorted materialization).
- ``streaming``  : Structured Streaming ingest + windowed/stateful ops.
- ``diabetes``   : the reference pipeline rebuilt on this engine.
"""

__version__ = "0.1.0"
