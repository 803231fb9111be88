"""Event-time query plans: tumbling/sliding/session windows, as-of join,
and Structured Streaming variants (SURVEY.md §2.8 + extensions §7.5).

The batch window queries have exact DuckDB oracles (tumbling =
date_trunc; sliding = offset expansion; session = gaps-and-islands).
The streaming variants run the same logical plans through real
Structured Streaming with availableNow, checked rows-only by the
driver and more deeply in tests/test_streaming.py.

Session semantics: a new session starts when the gap since the previous
event is >= the 30-minute timeout — matching Spark's end-exclusive
``session_window`` so the native operator and the SQL formulation agree.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diabetes_etl_spark.functions.numeric import dec_sum, sql_dec_sum
from diabetes_etl_spark.functions.stats import (
    exact_cov,
    exact_cov_num,
    exact_var,
    sql_exact_cov,
    sql_exact_cov_num,
    sql_exact_var,
)
from diabetes_etl_spark.operators.asof import asof_join
from diabetes_etl_spark.plans.registry import register
from diabetes_etl_spark.sources.tables import load_events_stream, load_table
from diabetes_etl_spark.streaming.ingest import stream_snapshot

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_DUCK_FMT = "%Y-%m-%d %H:%M:%S"


@register(
    "events_tumbling_hourly",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '{_DUCK_FMT}') AS hour_start,
  event_type, COUNT(*) AS n_events,
  {sql_dec_sum("value", 2)} AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
    doc="Tumbling 1-hour event-time windows (batch form of the streaming "
    "windowed agg; Spark window() aligns to the epoch = date_trunc).",
    tags=("events", "window-time"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dec_sum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("hour_start", "event_type")
    )


@register(
    "events_sliding_windows",
    oracle=f"""
WITH base AS (
  SELECT value,
    CAST(to_timestamp(900 * CAST(floor(epoch(ts) / 900) AS BIGINT)) AS TIMESTAMP) AS slot
  FROM events
), expanded AS (
  SELECT slot - (k * INTERVAL 15 MINUTE) AS window_start, value
  FROM base, (VALUES (0), (1), (2), (3)) off(k)
)
SELECT strftime(window_start, '{_DUCK_FMT}') AS window_start,
  COUNT(*) AS n_events,
  {sql_dec_sum("value", 2)} AS total_value
FROM expanded
GROUP BY 1
ORDER BY 1
""",
    doc="Sliding windows (1h length, 15min slide): each event lands in 4 "
    "overlapping windows; oracle expands the same 4 offsets explicitly.",
    tags=("events", "window-time"),
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dec_sum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


_SESSION_ORACLE = f"""
WITH g AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS is_new
  FROM events
), s AS (
  SELECT user_id, ts, value,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS session_seq
  FROM g
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
  strftime(MIN(ts), '{_DUCK_FMT}') AS session_start,
  {sql_dec_sum("value", 2)} AS total_value
FROM s
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


@register(
    "events_sessionize_sql",
    oracle=_SESSION_ORACLE,
    doc="Batch sessionization via gaps-and-islands (lag + running sum), "
    "30-minute inactivity timeout.",
    tags=("events", "session"),
)
def events_sessionize_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    # Same logical SQL as the oracle, with Spark's date_format in place
    # of DuckDB's strftime.
    return spark.sql(
        _SESSION_ORACLE.replace(
            f"strftime(MIN(ts), '{_DUCK_FMT}')", f"date_format(MIN(ts), '{_TS_FMT}')"
        )
    )


@register(
    "events_session_native",
    oracle=f"""
WITH g AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS is_new
  FROM events
), s AS (
  SELECT user_id, ts, value,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM g
)
SELECT user_id,
  strftime(MIN(ts), '{_DUCK_FMT}') AS session_start,
  COUNT(*) AS n_events,
  {sql_dec_sum("value", 2)} AS total_value
FROM s
GROUP BY user_id, session_seq
ORDER BY user_id, session_start
""",
    doc="Native session_window operator (30-minute gap); oracle is the "
    "equivalent gaps-and-islands SQL.",
    tags=("events", "session"),
)
def events_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            dec_sum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT).alias("session_start"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "asof_purchase_last_click",
    oracle=f"""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, p.user_id,
  strftime(p.ts, '{_DUCK_FMT}') AS purchase_ts,
  strftime(c.ts, '{_DUCK_FMT}') AS last_click_ts,
  c.value AS last_click_value
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND c.ts <= p.ts
""",
    doc="As-of join: for each purchase, the user's most recent click at or "
    "before it (operators/asof.py union+window formulation; oracle is "
    "DuckDB's native ASOF LEFT JOIN).",
    tags=("events", "asof", "join"),
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols={"ts": "click_ts", "value": "last_click_value"},
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.date_format("click_ts", _TS_FMT).alias("last_click_ts"),
        "last_click_value",
    )


# ---------------------------------------------------------------------------
# Structured Streaming variants — real readStream plans driven to
# completion with availableNow.  Rows-only in the driver gate (streaming
# is not SQL-expressible); exactly-once and watermark behavior asserted
# in tests/test_streaming.py.
# ---------------------------------------------------------------------------


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_events_stream(spark, sf_dir)


@register(
    "stream_tumbling_hourly",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '{_DUCK_FMT}') AS hour_start,
  event_type, COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
""",
    doc="Streaming tumbling-window count with a 1-hour watermark, driven "
    "by availableNow through a real readStream source; on bounded input "
    "the complete-mode result equals the batch oracle.",
    tags=("streaming", "window-time"),
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    snap = stream_snapshot(spark, agg, output_mode="complete")
    return snap.select(
        F.date_format(F.col("w.start"), _TS_FMT).alias("hour_start"),
        "event_type",
        "n_events",
    )


@register(
    "stream_ingest_events",
    oracle="SELECT COUNT(*) AS n_rows, COUNT(DISTINCT event_id) AS n_ids FROM events",
    doc="Exactly-once incremental file ingest (availableNow + checkpoint): "
    "ingests the events parquet through a streaming source and reports "
    "row/id counts (reference Autoloader analogue, pipeline:57-74).",
    tags=("streaming", "ingest"),
)
def stream_ingest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    snap = stream_snapshot(spark, _events_stream(spark, sf_dir))
    return snap.agg(
        F.count("*").alias("n_rows"), F.countDistinct("event_id").alias("n_ids")
    )


@register(
    "stream_static_enrich",
    oracle=f"""
SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_events,
  {sql_dec_sum("e.value", 2)} AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
""",
    doc="Stream-static join: the event stream enriched against a "
    "broadcast dimension table mid-stream (the 100 TB pattern — the "
    "static side is planned per micro-batch, never shuffled), then a "
    "streaming aggregate; bounded input makes the complete-mode result "
    "equal the batch oracle.",
    tags=("streaming", "join"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = _events_stream(spark, sf_dir).join(
        F.broadcast(dim), F.col("user_id") == F.col("c_custkey")
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        dec_sum(F.col("value"), 2).alias("total_value"),
    )
    snap = stream_snapshot(spark, agg, output_mode="complete")
    return snap.select(
        F.col("c_mktsegment").alias("mktsegment"), "n_events", "total_value"
    )


@register(
    "stream_stream_join",
    oracle=f"""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
  strftime(p.ts, '{_DUCK_FMT}') AS purchase_ts,
  strftime(c.ts, '{_DUCK_FMT}') AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
""",
    doc="Stream-stream interval join: purchases matched to same-user "
    "clicks within the preceding hour; watermarks on both sides bound "
    "the join state (state holds only the last hour per side at scale), "
    "inner join emits matches as they occur — on bounded input the "
    "append-mode result equals the batch oracle.",
    tags=("streaming", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND "
            "c_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"
        ),
    )
    snap = stream_snapshot(spark, joined)
    return snap.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.date_format("p_ts", _TS_FMT).alias("purchase_ts"),
        F.date_format("c_ts", _TS_FMT).alias("click_ts"),
    )


@register(
    "stream_stateful_user_profiles",
    oracle=f"""
SELECT user_id,
  COUNT(*) AS n_events,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_purchases,
  MAX(value) AS max_value,
  strftime(MAX(ts), '{_DUCK_FMT}') AS last_ts
FROM events
GROUP BY user_id
""",
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user running profile (counts/extrema) as arbitrary per-key "
    "state across micro-batches; on bounded input the final state "
    "equals the batch groupBy, so even this non-SQL operator is "
    "oracle-checked (streaming/stateful.py).",
    tags=("streaming", "stateful", "extension"),
)
def stream_stateful_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.streaming.stateful import (
        latest_profiles,
        running_user_profiles,
    )

    prof = running_user_profiles(_events_stream(spark, sf_dir))
    snap = stream_snapshot(spark, prof, output_mode="update")
    return latest_profiles(snap).select(
        "user_id",
        "n_events",
        "n_purchases",
        "max_value",
        F.date_format(
            F.timestamp_micros(F.col("last_ts_micros")), _TS_FMT
        ).alias("last_ts"),
    )


@register(
    "stream_dedup_events",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
  COUNT(DISTINCT event_id) AS n_ids
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    doc="Streaming deduplication: the event stream unioned with itself "
    "(every event arrives twice, the at-least-once delivery shape) is "
    "deduplicated with dropDuplicatesWithinWatermark(event_id) under a "
    "1-hour watermark — state holds only keys inside the watermark "
    "horizon, so it is bounded at scale (plain dropDuplicates would "
    "grow state forever).  Post-dedup counts per type equal the batch "
    "DISTINCT oracle on the single corpus.",
    tags=("streaming", "dedup", "extension"),
    extended=True,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    doubled = _events_stream(spark, sf_dir).unionByName(
        _events_stream(spark, sf_dir)
    )
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    snap = stream_snapshot(spark, deduped)
    return (
        snap.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_id").alias("n_ids"),
        )
        .orderBy("event_type")
    )


@register(
    "cdc_scd1_user_state",
    oracle=f"""
SELECT user_id, event_id AS last_event_id,
  strftime(ts, '{_DUCK_FMT}') AS last_ts, value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
ORDER BY user_id
""",
    doc="CDC apply-changes (SCD type 1): the event stream applied as "
    "keyed upserts (key=user_id, sequence=ts, tiebreak=event_id) into "
    "a bucket-partitioned parquet target via foreachBatch "
    "(streaming/cdc.py — the DLT apply_changes analogue; per-batch "
    "merge touches only the buckets the batch names).  Final state "
    "equals the batch latest-row-per-key oracle.",
    tags=("streaming", "cdc", "extension"),
)
def cdc_scd1_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from diabetes_etl_spark.streaming.cdc import apply_changes_scd1

    # per-invocation PRIVATE workspace (mkdtemp): a fixed path keyed on
    # sf_dir would let concurrent runs (gate + audit, parallel CI) rmtree
    # each other's live target mid-stream.  The query is a from-scratch
    # replay (incremental catch-up behavior is tests/test_cdc.py's job);
    # cleanup is deferred to process exit (atexit) because the returned
    # DataFrame lazily reads the target until the caller collects it.
    import atexit
    import shutil

    base = tempfile.mkdtemp(prefix="spark_graft_cdc1_")
    atexit.register(shutil.rmtree, base, True)
    final = apply_changes_scd1(
        spark,
        _events_stream(spark, sf_dir),
        target_dir=os.path.join(base, "target"),
        keys=["user_id"],
        sequence_col="ts",
        tiebreak_cols=["event_id"],
        checkpoint=os.path.join(base, "ck"),
    )
    return final.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.date_format("ts", _TS_FMT).alias("last_ts"),
        F.col("value").alias("last_value"),
    ).orderBy("user_id")


@register(
    "cdc_scd2_user_history",
    oracle=f"""
SELECT user_id, event_id, value,
  strftime(ts, '{_DUCK_FMT}') AS start_at,
  strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
           '{_DUCK_FMT}') AS end_at
FROM events
ORDER BY user_id, start_at, event_id
""",
    doc="CDC apply-changes (SCD type 2): every change version kept "
    "with __start_at/__end_at validity bounds (streaming/cdc.py:"
    "apply_changes_scd2, DLT stored_as_scd_type=2 contract); the "
    "current version per key has end_at NULL.  Oracle = the lead() "
    "window over the raw changes.  Gate-tier since round 5 (SCD2 is "
    "the flagship stored_as_scd_type=2 surface) and committed through "
    "the object-store-safe MANIFEST protocol, so the gate exercises "
    "the commit path a cloud warehouse would use.",
    tags=("streaming", "cdc", "extension"),
)
def cdc_scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from diabetes_etl_spark.streaming.cdc import apply_changes_scd2

    # per-invocation private workspace — see cdc_scd1_user_state
    import atexit
    import shutil

    base = tempfile.mkdtemp(prefix="spark_graft_cdc2_")
    atexit.register(shutil.rmtree, base, True)
    hist = apply_changes_scd2(
        spark,
        _events_stream(spark, sf_dir),
        target_dir=os.path.join(base, "target"),
        keys=["user_id"],
        sequence_col="ts",
        tiebreak_cols=["event_id"],
        checkpoint=os.path.join(base, "ck"),
        commit_mode="manifest",
    )
    return hist.select(
        "user_id",
        "event_id",
        "value",
        F.date_format("__start_at", _TS_FMT).alias("start_at"),
        F.date_format("__end_at", _TS_FMT).alias("end_at"),
    ).orderBy("user_id", "start_at", "event_id")


@register(
    "events_json_props",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS sum_k_schemaless
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    doc="Semi-structured extraction: the JSON props payload parsed "
    "in-plan with from_json (schema-on-read, JVM-native — no Python, "
    "no double scan) and aggregated; a second expression shows the "
    "schemaless get_json_object path agrees.  At 100 TB the parse "
    "happens inside the scan stage's codegen, so JSON columns cost "
    "one pass like any other column.",
    tags=("events", "json", "extension"),
    extended=True,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k int")["k"].cast("long")
    k2 = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"), k2.alias("k2"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k2").alias("sum_k_schemaless"),
        )
        .orderBy("event_type")
    )


@register(
    "events_daily_users",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS first_day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
    COUNT(*) AS n_events,
    COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY 1
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.n_events, d.dau,
  CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users
FROM daily d
LEFT JOIN (
  SELECT first_day, COUNT(*) AS new_users FROM firsts GROUP BY first_day
) n ON n.first_day = d.day
ORDER BY d.day
""",
    doc="Product-analytics composite: daily events, exact DAU "
    "(countDistinct), and new-vs-returning split via each user's "
    "first-seen day — two grouped aggregates and one small left join "
    "on the day key (the day dimension is tiny, so the join "
    "broadcasts; the heavy work is the two partial-aggregated scans).",
    tags=("events", "analytics", "extension"),
    extended=True,
)
def events_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    daily = ev.groupBy(day.alias("day")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("dau"),
    )
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("first_day")
    )
    new_per_day = firsts.groupBy("first_day").agg(
        F.count("*").alias("new_users")
    )
    return (
        daily.join(
            F.broadcast(new_per_day),
            daily["day"] == new_per_day["first_day"],
            "left",
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "dau",
            F.coalesce(F.col("new_users"), F.lit(0))
            .cast("long")
            .alias("new_users"),
        )
        .orderBy("day")
    )


@register(
    "events_weekly_cohort_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
    CAST(floor(date_diff('day', f.cohort_week,
                         CAST(date_trunc('week', e.ts) AS DATE)) / 7.0)
         AS BIGINT) AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
  COUNT(*) AS active_users
FROM activity
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
    doc="Cohort retention matrix: users grouped by first-seen week, "
    "counted per week-offset of later activity — the canonical "
    "retention triangle.  One aggregate builds the cohort dim (small: "
    "one row per user), re-joined to events on user_id (AQE broadcasts "
    "it at fixture scale; at 100 TB it shuffles on user_id exactly "
    "once), then DISTINCT collapses (user, offset) before the final "
    "count so the last shuffle carries the matrix, not the events.",
    tags=("events", "analytics", "cohort", "extension"),
    extended=True,
)
def events_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7.0
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("active_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "active_users",
        )
        .orderBy("cohort_week", "week_offset")
    )


# -- ordered funnel + calendar gap-fill (round 5) ---------------------------

_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT stage, n_users FROM (
  SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
  UNION ALL SELECT '2_click', COUNT(*) FROM c
  UNION ALL SELECT '3_purchase', COUNT(*) FROM p
) stages
ORDER BY stage
"""

@register(
    "events_funnel_conversion",
    oracle=_FUNNEL_SQL,
    doc="Ordered funnel: users whose first view precedes a click that "
    "precedes a purchase (strict event-time ordering, not mere "
    "presence).  Three cascaded keyed MIN-aggregates, each a shuffle "
    "on user_id over an ALREADY type-filtered slice (the event_type "
    "predicate pushes into each scan), each stage's population "
    "shrinking — the standard product-analytics shape that a "
    "presence-only join would get wrong for users who purchased "
    "before ever clicking.",
    tags=("events", "analytics", "funnel", "extension"),
    extended=True,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(_FUNNEL_SQL)


_GAPFILL_SQL = f"""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
),
hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT strftime(s.h, '{_DUCK_FMT}') AS hour_start,
  CAST(COALESCE(y.n, 0) AS BIGINT) AS n_purchases,
  CAST(CASE WHEN y.n IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap,
  CAST(SUM(COALESCE(y.n, 0)) OVER (ORDER BY s.h) AS BIGINT) AS cum_purchases
FROM spine s LEFT JOIN hourly y ON s.h = y.h
ORDER BY s.h
"""

@register(
    "events_hourly_gapfill",
    oracle=_GAPFILL_SQL,
    doc="Calendar gap-fill: a generated hourly spine (sequence + "
    "explode — the distributed replacement for a calendar dim table) "
    "left-joined to per-hour purchase counts, zero-filled, with a "
    "running cumulative sum.  The spine is O(hours) — tiny — so the "
    "join broadcasts and the unpartitioned running-total window "
    "orders hours, not events; the only event-sized operation is the "
    "pushed-down filtered aggregate.  Dashboards need the explicit "
    "zero rows (a missing hour is data, not absence of data).",
    tags=("events", "calendar", "window", "extension"),
    extended=True,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    hourly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy("h")
    return (
        spine.join(hourly, "h", "left")
        .select(
            F.col("h"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_purchases"),
            F.col("n").isNull().cast("int").alias("is_gap"),
        )
        .withColumn("cum_purchases", F.sum("n_purchases").over(w))
        .select(
            F.date_format("h", _TS_FMT).alias("hour_start"),
            "n_purchases",
            "is_gap",
            "cum_purchases",
        )
        .orderBy("hour_start")
    )


_LOCF_ORACLE = """
WITH st AS (
  SELECT user_id,
    CASE WHEN event_type = 'purchase' THEN value END AS sparse,
    last_value(CASE WHEN event_type = 'purchase' THEN value END
               IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
  FROM events
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CASE WHEN sparse IS NULL AND filled IS NOT NULL
           THEN 1 ELSE 0 END) AS BIGINT) AS n_carried,
  CAST(SUM(CASE WHEN filled IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unfilled,
  CAST(SUM(CASE WHEN sparse IS NULL
           THEN CAST(filled AS DECIMAL(18,2)) END) AS DOUBLE)
    AS carried_value_sum
FROM st GROUP BY user_id ORDER BY user_id
"""


@register(
    "events_locf_fill",
    oracle=_LOCF_ORACLE,
    doc="Last-observation-carried-forward fill "
    "(operators/timeseries.py:locf_fill): the purchase price is a "
    "SPARSE series (null on every non-purchase event); each user's "
    "most recent prior purchase value is carried onto their "
    "click/view/error rows via one running last(ignorenulls) window "
    "over (ts, event_id) — one key-partition exchange + sort, no "
    "self-join, no per-gap lookup.  Rows before a user's first "
    "purchase stay null (LOCF has nothing to carry).  Per-user "
    "tallies pin the whole fill sequence: carried-row count, "
    "unfilled-prefix count, and the decimal-exact sum of carried "
    "values.",
    tags=("events", "timeseries", "window", "extension"),
    extended=True,
)
def events_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.operators.timeseries import locf_fill

    ev = load_table(spark, sf_dir, "events")
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    st = locf_fill(
        ev,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        fill_cols=[sparse],
        out_names=["price"],
    ).select("user_id", sparse.alias("sparse"), "price_filled")
    return (
        st.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                (
                    F.col("sparse").isNull()
                    & F.col("price_filled").isNotNull()
                ).cast("int")
            ).cast("long").alias("n_carried"),
            F.sum(F.col("price_filled").isNull().cast("int"))
            .cast("long")
            .alias("n_unfilled"),
            dec_sum(
                F.when(F.col("sparse").isNull(), F.col("price_filled")), 2
            ).alias("carried_value_sum"),
        )
        .orderBy("user_id")
    )


_DRIFT_ORACLE = """
WITH spine AS (SELECT unnest(generate_series(0, 19)) AS bin),
r AS (
  SELECT CAST(FLOOR(LEAST(19.0, GREATEST(0.0, (value - 0.0) / 5.0))) AS INT)
           AS bin,
         COUNT(*) AS n
  FROM events WHERE value IS NOT NULL AND event_id % 2 = 0 GROUP BY 1),
c AS (
  SELECT CAST(FLOOR(LEAST(19.0, GREATEST(0.0, (value - 0.0) / 5.0))) AS INT)
           AS bin,
         COUNT(*) AS n
  FROM events WHERE value IS NOT NULL AND event_id % 2 = 1 GROUP BY 1),
j AS (
  SELECT spine.bin, COALESCE(r.n, 0) AS ref_n, COALESCE(c.n, 0) AS cur_n
  FROM spine LEFT JOIN r ON spine.bin = r.bin
  LEFT JOIN c ON spine.bin = c.bin),
t AS (SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct FROM j),
p AS (
  SELECT bin, ref_n, cur_n,
    CAST(ref_n AS DOUBLE) / rt AS ref_frac,
    CAST(cur_n AS DOUBLE) / ct AS cur_frac,
    ABS(CAST(ref_n AS DOUBLE) / rt - CAST(cur_n AS DOUBLE) / ct)
      AS abs_diff
  FROM j CROSS JOIN t),
tv AS (SELECT CAST(SUM(CAST(abs_diff AS DECIMAL(38,15))) AS DOUBLE) / 2
         AS tv_distance FROM p)
SELECT p.bin, CAST(p.ref_n AS BIGINT) AS ref_n,
  CAST(p.cur_n AS BIGINT) AS cur_n, p.ref_frac, p.cur_frac, p.abs_diff,
  tv.tv_distance
FROM p, tv ORDER BY p.bin
"""


@register(
    "events_value_drift",
    oracle=_DRIFT_ORACLE,
    doc="Distribution-drift monitoring (operators/drift.py): the "
    "event-value distribution of one population half vs the other "
    "(deterministic id-parity split standing in for "
    "week-over-week), as a 20-bin equi-width histogram with clamped "
    "outlier bins, per-bin mass attribution, and the total-variation "
    "distance (exact-integer bin ratios, DECIMAL-folded cross-bin "
    "sum — hash-checkable, unlike ln-based PSI/KL).  Each side is one "
    "map-side-combined aggregate onto <= bins rows — constant "
    "comparison cost at any input size, the scheduled schema-"
    "preserving-breakage alarm row-level expectations cannot raise.",
    tags=("events", "quality", "drift", "extension"),
    extended=True,
)
def events_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.operators.drift import drift_profile

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    return drift_profile(ref, cur, "value", 0.0, 5.0, 20).orderBy("bin")


_ZSCORE_ORACLE = """
WITH scored AS (
  SELECT user_id,
    COUNT(value) OVER w AS n,
    CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS s,
    CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sq,
    value
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
),
flagged AS (
  SELECT user_id,
    CASE WHEN n = 10 THEN 1 ELSE 0 END AS scored,
    CASE WHEN n = 10 THEN
      CASE WHEN sqrt(GREATEST((sq - s * s / n) / (n - 1), 0.0)) > 0 THEN
        CASE WHEN ABS(value - s / n)
                  > 2.0 * sqrt(GREATEST((sq - s * s / n) / (n - 1), 0.0))
             THEN 1 ELSE 0 END
      ELSE CASE WHEN value != s / n THEN 1 ELSE 0 END END
    ELSE 0 END AS anom
  FROM scored
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(scored) AS BIGINT) AS n_scored,
  CAST(SUM(anom) AS BIGINT) AS n_anomalies
FROM flagged GROUP BY user_id ORDER BY user_id
"""


@register(
    "events_rolling_anomalies",
    oracle=_ZSCORE_ORACLE,
    doc="Rolling z-score anomaly detection "
    "(operators/timeseries.py:rolling_zscore): each event's value "
    "scores against the mean/std of its 10 PRECEDING events per user "
    "(current row excluded — an outlier must not dilute its own "
    "baseline; partial windows honestly NULL).  Window sum and "
    "sum-of-squares fold through DECIMAL, mean/variance derive in "
    "IEEE from exact operands — the oracle replays the identical "
    "expression shape.  One (user, time) window exchange, no "
    "self-join.  Per-user scored/anomaly tallies.",
    tags=("events", "timeseries", "anomaly", "extension"),
    extended=True,
)
def events_rolling_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.operators.timeseries import rolling_zscore

    ev = load_table(spark, sf_dir, "events")
    scored = rolling_zscore(
        ev, ["user_id"], ["ts", "event_id"], "value", window_rows=10, z=2.0
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("base_mean").isNotNull().cast("int"))
            .cast("long")
            .alias("n_scored"),
            F.sum(F.coalesce(F.col("is_anomaly").cast("int"), F.lit(0)))
            .cast("long")
            .alias("n_anomalies"),
        )
        .orderBy("user_id")
    )


@register(
    "events_temporal_state_join",
    oracle="""
WITH clicks AS (
  SELECT user_id, event_id, value, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS end_ts
  FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
),
j AS (
  SELECT p.user_id, p.event_id,
         c.event_id AS state_event_id, c.value AS state_value
  FROM purch p LEFT JOIN clicks c
    ON p.user_id = c.user_id
   AND c.ts <= p.ts AND (c.end_ts IS NULL OR p.ts < c.end_ts)
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_purchases,
  CAST(SUM(CASE WHEN state_event_id IS NOT NULL THEN 1 ELSE 0 END)
    AS BIGINT) AS n_with_state,
  CAST(COALESCE(SUM(CAST(state_value AS DECIMAL(28,2))), 0)
    AS DOUBLE) AS sum_state_value
FROM j GROUP BY user_id ORDER BY user_id
""",
    doc="Temporal (SCD2 validity-interval) join "
    "(operators/temporal.py): per-user click events become type-2 "
    "history versions in-plan (start = ts, end = next version's start "
    "— the same lead() window the CDC SCD2 sink commits), and every "
    "purchase joins the version valid AT ITS OWN EVENT TIME — one "
    "equi-join on the key with the interval predicate as join "
    "residual, at most one match by the partition-of-time invariant "
    "(no dedup pass, no fact-side window).  The interval formulation "
    "of the as-of join; facts before any version carry NULLs.",
    tags=("events", "temporal", "cdc", "extension"),
    extended=True,
)
def events_temporal_state_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from diabetes_etl_spark.operators.temporal import temporal_join

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    history = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("state_event_id"),
            F.col("value").alias("state_value"),
            F.col("ts").alias("__start_at"),
            F.lead("ts").over(w).alias("__end_at"),
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    joined = temporal_join(facts, history, ["user_id"], "ts")
    return (
        joined.groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(
                F.col("state_event_id").isNotNull().cast("int")
            ).cast("long").alias("n_with_state"),
            F.coalesce(
                F.sum(F.col("state_value").cast("decimal(28,2)")),
                F.lit(0),
            ).cast("double").alias("sum_state_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_variant_props",
    oracle="""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS sum_k,
  CAST(COUNT(CASE WHEN json_extract_string(props, '$.missing') IS NOT NULL
        THEN 1 END) AS BIGINT) AS n_with_missing_field
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    doc="VARIANT semi-structured extraction (Spark 4's open-format "
    "binary JSON type): props parsed ONCE into a variant column with "
    "parse_json, fields extracted with typed variant_get paths — the "
    "shredded-storage-ready successor to from_json/get_json_object "
    "for schema-fluid payloads (no schema declaration, no per-field "
    "re-parse; at scale variant's binary encoding skips the repeated "
    "JSON text tokenization the string path pays).  try_variant_get "
    "on an absent path returns NULL rather than failing under ANSI — "
    "counted here to pin that contract.  Oracle replays through "
    "DuckDB's JSON extraction.",
    tags=("events", "json", "variant", "extension"),
    extended=True,
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "long")
    missing = F.try_variant_get(v, "$.missing", "string")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.count("m").alias("n_with_missing_field"),
        )
        .orderBy("event_type")
    )


@register(
    "events_ema_value",
    oracle="""
WITH packed AS (
  SELECT user_id,
    list_sort(list({'ts': ts, 'eid': event_id, 'value': value})) AS s
  FROM events GROUP BY user_id
)
SELECT user_id,
  list_reduce(
    list_prepend(CAST(NULL AS DOUBLE), list_transform(s, x -> x.value)),
    (acc, v) -> CASE
      WHEN v IS NULL THEN acc
      WHEN acc IS NULL THEN CAST(v AS DOUBLE)
      ELSE CAST(0.25 AS DOUBLE) * CAST(v AS DOUBLE)
           + CAST(0.75 AS DOUBLE) * acc END
  ) AS ema
FROM packed ORDER BY user_id
""",
    doc="Per-user exponential moving average of event values "
    "(operators/timeseries.py:ema, alpha=0.25): the sequential "
    "recursion folds in-plan over each key's sorted series (one key "
    "exchange; no window frame can express a recursion), NULLs carry "
    "state.  Bit-exact cross-engine because the fold is a fixed-order "
    "chain of IEEE ops — the oracle runs the identical list_reduce.",
    tags=("events", "timeseries", "extension"),
    extended=True,
)
def events_ema_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.operators.timeseries import ema

    ev = load_table(spark, sf_dir, "events")
    return ema(
        ev, ["user_id"], ["ts", "event_id"], "value", alpha=0.25
    ).orderBy("user_id")


# -- grouped OLS trend (round 8) --------------------------------------------

_TREND_ORACLE = """
WITH pts AS (
  SELECT event_type,
    CAST(floor(epoch(ts)) AS BIGINT) AS x, value AS y
  FROM events
),
mus AS (
  SELECT event_type,
    ROUND(CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
      AS mux,
    ROUND(CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
      AS muy,
    COUNT(*) AS n
  FROM pts GROUP BY event_type
),
moms AS (
  SELECT p.event_type, m.n, m.mux, m.muy,
    CAST(SUM(CAST((p.x - m.mux) * (p.y - m.muy) AS DECIMAL(38,12)))
         AS DOUBLE) AS sxy,
    CAST(SUM(CAST((p.x - m.mux) * (p.x - m.mux) AS DECIMAL(38,12)))
         AS DOUBLE) AS sxx
  FROM pts p JOIN mus m USING (event_type)
  GROUP BY p.event_type, m.n, m.mux, m.muy
)
SELECT event_type, CAST(n AS BIGINT) AS n_rows,
  ROUND(sxy / sxx, 12) AS slope,
  ROUND(muy - ROUND(sxy / sxx, 12) * mux, 6) AS intercept
FROM moms ORDER BY event_type
"""

from diabetes_etl_spark.plans.diabetesplans import _mimic_spark_round

_TREND_ORACLE = _mimic_spark_round(_TREND_ORACLE)


@register(
    "events_linear_trend",
    oracle=_TREND_ORACLE,
    doc="Per-group ordinary-least-squares trend (value over event "
    "time) fitted ENTIRELY in-plan — no driver loop, no UDF: pass 1 "
    "computes per-group decimal-pinned means, pass 2 folds the "
    "CENTERED cross/self moments through DECIMAL(38,12) (centering "
    "kills the catastrophic n*Sxx - Sx^2 cancellation raw-moment OLS "
    "hits on epoch-scale x), and slope/intercept are two IEEE "
    "divisions quantized via the established string-first ROUND "
    "mimic.  The regression-analytics sibling of the iterative GD "
    "trainer: closed form where one exists, so 100 TB costs two "
    "aggregate passes.",
    tags=("events", "regression", "analytics", "extension"),
    extended=True,
)
def events_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pts = events.select(
        "event_type",
        F.floor(F.col("ts").cast("double")).cast("long").alias("x"),
        F.col("value").alias("y"),
    )
    mus = pts.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(28,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mux"),
        F.round(
            F.sum(F.col("y").cast("decimal(28,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("muy"),
        F.count("*").alias("n"),
    )
    moms = (
        pts.join(F.broadcast(mus), "event_type")
        .groupBy("event_type", "n", "mux", "muy")
        .agg(
            F.sum(
                ((F.col("x") - F.col("mux")) * (F.col("y") - F.col("muy")))
                .cast("decimal(38,12)")
            ).cast("double").alias("sxy"),
            F.sum(
                ((F.col("x") - F.col("mux")) * (F.col("x") - F.col("mux")))
                .cast("decimal(38,12)")
            ).cast("double").alias("sxx"),
        )
    )
    slope = F.round(F.col("sxy") / F.col("sxx"), 12)
    return moms.select(
        "event_type",
        F.col("n").cast("long").alias("n_rows"),
        slope.alias("slope"),
        F.round(F.col("muy") - slope * F.col("mux"), 6).alias("intercept"),
    ).orderBy("event_type")


# -- winsorized robust stats (round 8) --------------------------------------


@register(
    "events_winsorized_stats",
    oracle="""
WITH cuts AS (
  SELECT event_type,
    ROUND(quantile_cont(value, 0.01), 6) AS p01,
    ROUND(quantile_cont(value, 0.99), 6) AS p99
  FROM events GROUP BY event_type
),
clipped AS (
  SELECT e.event_type, c.p01, c.p99,
    CASE WHEN e.value < c.p01 THEN c.p01
         WHEN e.value > c.p99 THEN c.p99
         ELSE e.value END AS w,
    CASE WHEN e.value < c.p01 OR e.value > c.p99 THEN 1 ELSE 0 END
      AS is_clipped
  FROM events e JOIN cuts c USING (event_type)
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(is_clipped) AS BIGINT) AS n_clipped,
  MAX(p01) AS p01, MAX(p99) AS p99,
  CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS sum_winsorized
FROM clipped GROUP BY event_type ORDER BY event_type
""",
    doc="Winsorization — per-group 1%/99% exact-percentile clipping "
    "with clip accounting and the decimal-folded clipped mass: the "
    "outlier-taming step feature pipelines run before training "
    "statistics.  Two passes: one exact-percentile aggregate (the "
    "interpolated-percentile parity of quantiles_by_flag; the approx "
    "sketch is the 100 TB path), its tiny per-group cut table "
    "broadcast back over one corpus scan — clipping itself is a "
    "scan-local CASE in codegen, no UDF, no extra shuffle.",
    tags=("events", "quality", "winsorize", "extension"),
    extended=True,
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cuts = events.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.01), 6).alias("p01"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
    )
    clipped = events.join(F.broadcast(cuts), "event_type").select(
        "event_type", "p01", "p99",
        F.when(F.col("value") < F.col("p01"), F.col("p01"))
        .when(F.col("value") > F.col("p99"), F.col("p99"))
        .otherwise(F.col("value"))
        .alias("w"),
        F.when(
            (F.col("value") < F.col("p01")) | (F.col("value") > F.col("p99")),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("is_clipped"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("is_clipped").cast("long").alias("n_clipped"),
            F.max("p01").alias("p01"),
            F.max("p99").alias("p99"),
            F.sum(F.col("w").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_winsorized"),
        )
        .orderBy("event_type")
    )


@register(
    "events_robust_outliers",
    oracle="""
WITH med AS (
  SELECT event_type, ROUND(median(value), 6) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, m.med,
    ROUND(median(abs(e.value - m.med)), 6) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type, m.med
)
SELECT e.event_type,
  MAX(m.med) AS med, MAX(m.mad) AS mad,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN abs(e.value - m.med)
                     > 3 * CAST(1.4826 AS DOUBLE) * m.mad
            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN mad m USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
""",
    doc="Robust outlier detection per group: median + MAD (median "
    "absolute deviation) with the 3-sigma-equivalent 1.4826 scaling — "
    "the heavy-tail-safe alternative to mean/stddev z-scores (one "
    "wild value moves a mean arbitrarily; it moves a median not at "
    "all).  Three passes, each one exact-percentile aggregate whose "
    "tiny per-group result broadcasts into the next scan — the "
    "outlier test itself is scan-local codegen.  Exact percentiles "
    "are the oracle-parity tier; percentile_approx is the 100 TB "
    "sketch path (quantile_sketch_by_flag precedent).",
    tags=("events", "quality", "outliers", "extension"),
    extended=True,
)
def events_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.round(F.median("value"), 6).alias("med")
    )
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.round(
                F.median(F.abs(F.col("value") - F.col("med"))), 6
            ).alias("mad")
        )
    )
    return (
        events.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(3) * F.lit(1.4826) * F.col("mad"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# -- cohort retention (round 8) ---------------------------------------------


@register(
    "events_cohort_retention",
    oracle="""
WITH weeks AS (
  SELECT user_id,
    CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
  FROM events GROUP BY user_id, week
),
cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id
)
SELECT c.cohort_week,
  CAST(w.week - c.cohort_week AS BIGINT) AS week_offset,
  CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_active
FROM weeks w JOIN cohort c USING (user_id)
GROUP BY c.cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
    doc="Weekly cohort retention matrix — the canonical product-"
    "analytics rollup: users cohorted by FIRST active epoch-week, "
    "activity re-expressed as offsets from the cohort week, distinct "
    "actives per (cohort, offset) cell.  Shape: the (user, week) "
    "activity grid is pre-deduplicated map-side (one groupBy), the "
    "cohort table is one min-aggregate re-joined on user_id, and the "
    "cell counts are a distinct-aggregate over the already-thin "
    "grid — events volume collapses before any wide shuffle.  "
    "Epoch-week bucketing (floor(epoch/604800)) is integer "
    "arithmetic, identical cross-engine (no calendar/locale "
    "dependence).",
    tags=("events", "cohort", "analytics", "extension"),
    extended=True,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    weeks = (
        events.select(
            "user_id",
            F.floor(F.col("ts").cast("double") / F.lit(604800))
            .cast("long")
            .alias("week"),
        )
        .groupBy("user_id", "week")
        .agg(F.lit(1).alias("__x"))
        .drop("__x")
    )
    cohort = weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    return (
        weeks.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week"))
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


_PATH_ORACLE = f"""
WITH g AS (
  SELECT user_id, ts, event_id, event_type, value,
    CASE WHEN epoch_us(ts)
              - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
              >= 1800000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
), s AS (
  SELECT user_id, ts, event_id, event_type, value,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_seq
  FROM g
), r AS (
  SELECT user_id, session_seq, event_type, value,
    row_number() OVER (PARTITION BY user_id, session_seq
                       ORDER BY ts, event_id) AS rn
  FROM s
), p AS (
  SELECT user_id, session_seq,
    string_agg(CASE WHEN rn <= 5 THEN event_type END, '>' ORDER BY rn)
      AS path,
    COUNT(*) AS n_events,
    {sql_dec_sum("value", 2)} AS sess_value
  FROM r GROUP BY user_id, session_seq
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS avg_events,
  {sql_dec_sum("sess_value", 2)} AS total_value
FROM p GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 20
"""


@register(
    "events_path_mining",
    oracle=_PATH_ORACLE,
    doc="Top-20 session journey paths: gaps-and-islands sessionization "
    "(30-min inactivity), each session reduced to its first-5 ordered "
    "event-type path (sort_array over (rn, type) structs — "
    "collect_list order is NOT deterministic under parallel merge, "
    "the sort is what pins it), then path-level frequency / mean "
    "length / decimal-folded value.  Two windows over the same "
    "(user_id) partitioning reuse one shuffle; the path aggregate "
    "shuffles one short string + two numbers per session, never "
    "events; top-20 is a TakeOrdered, not a full sort.",
    tags=("events", "session", "path", "analytics", "extension"),
    extended=True,
)
def events_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    is_new = (
        us - F.lag(us).over(w_user) >= 1800 * 1_000_000
    ).cast("int")
    s = ev.select(
        "user_id", "ts", "event_id", "event_type", "value",
        F.coalesce(is_new, F.lit(0)).alias("is_new"),
    ).withColumn(
        "session_seq",
        F.sum("is_new").over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    r = s.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id", "session_seq").orderBy(
                "ts", "event_id"
            )
        ),
    )
    per_session = r.groupBy("user_id", "session_seq").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                1,
                5,
            ),
        ).alias("path"),
        F.count("*").alias("n_events"),
        dec_sum(F.col("value"), 2).alias("sess_value"),
    )
    return (
        per_session.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            (F.sum("n_events").cast("double") / F.count("*")).alias(
                "avg_events"
            ),
            dec_sum(F.col("sess_value"), 2).alias("total_value"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


def _markov_oracle(rounds: int) -> str:
    # unroll the power iteration as chained CTEs (the PageRank-oracle
    # pattern): each round folds through DECIMAL(38,15) then pins at
    # 12 digits, so Spark and DuckDB agree bit-for-bit round by round
    pis = []
    prev = "pi0"
    for k in range(1, rounds + 1):
        pis.append(f"""
pi{k} AS (
  SELECT s.state, COALESCE(x.pi, CAST(0.0 AS DOUBLE)) AS pi
  FROM states s LEFT JOIN (
    SELECT p.nxt AS state,
      CAST(CAST(CAST(SUM(CAST({prev}.pi * p.pv AS DECIMAL(38,15)))
           AS DOUBLE) AS DECIMAL(18,12)) AS DOUBLE) AS pi
    FROM {prev} JOIN p ON {prev}.state = p.cur GROUP BY p.nxt
  ) x ON s.state = x.state
)""")
        prev = f"pi{k}"
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS nxt
  FROM events
),
t2 AS (SELECT event_type AS cur, nxt, COUNT(*) AS cnt2 FROM seq
       WHERE nxt IS NOT NULL GROUP BY cur, nxt),
c1 AS (SELECT cur, CAST(SUM(cnt2) AS BIGINT) AS cnt1 FROM t2 GROUP BY cur),
p AS (SELECT t2.cur, t2.nxt, CAST(t2.cnt2 AS DOUBLE) / c1.cnt1 AS pv
      FROM t2 JOIN c1 ON t2.cur = c1.cur),
states AS (SELECT DISTINCT cur AS state FROM t2),
n AS (SELECT COUNT(*) AS n FROM states),
pi0 AS (SELECT state, CAST(1.0 AS DOUBLE) / n.n AS pi
        FROM states CROSS JOIN n),
{",".join(pis)},
emp AS (SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM events)
SELECT s.state AS event_type, {prev}.pi AS stationary_prob,
  CAST(emp.cnt AS DOUBLE) / tot.t AS empirical_share
FROM states s JOIN {prev} ON s.state = {prev}.state
JOIN emp ON emp.event_type = s.state CROSS JOIN tot
ORDER BY event_type
"""


_MARKOV_ROUNDS = 8


@register(
    "events_markov_stationary",
    oracle=_markov_oracle(_MARKOV_ROUNDS),
    doc="Steady-state user-behavior distribution: per-user consecutive "
    "event-type transitions -> row-stochastic matrix (exact rational "
    "cells), then 8 power-iteration rounds from uniform, each round's "
    "mass decimal-folded and 12-digit-pinned (bit-identical to the "
    "unrolled-CTE oracle).  The iteration runs on the TYPE-level "
    "matrix (|types|^2 rows, ~25 here) — events are touched exactly "
    "twice (transition count + empirical share), every join "
    "broadcast-sized.  States with no outgoing edges would absorb "
    "mass; documented, and absent in this event stream.",
    tags=("events", "markov", "graph", "analytics", "extension"),
    extended=True,
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from diabetes_etl_spark.functions.numeric import dec_cast, dec_sum as _ds

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    t2 = seq.groupBy("cur", "nxt").agg(F.count("*").alias("cnt2"))
    c1 = t2.groupBy("cur").agg(F.sum("cnt2").alias("cnt1"))
    p = t2.join(c1, "cur").select(
        "cur", "nxt",
        (F.col("cnt2").cast("double") / F.col("cnt1")).alias("pv"),
    )
    states = t2.select(F.col("cur").alias("state")).distinct()
    n = states.count()  # |event types| — a handful; bounded driver value
    pi = states.select(
        "state", (F.lit(1.0) / F.lit(n).cast("long")).alias("pi")
    )
    p_r = p.select(
        F.col("cur").alias("p_cur"),
        F.col("nxt").alias("p_nxt"),
        "pv",
    )
    for _ in range(_MARKOV_ROUNDS):
        nxt_pi = (
            pi.join(p_r, F.col("state") == F.col("p_cur"))
            .groupBy(F.col("p_nxt").alias("state"))
            .agg(
                dec_cast(
                    _ds(F.col("pi") * F.col("pv"), 15, 38), 12
                ).alias("next_pi")
            )
        )
        pi = states.join(nxt_pi, "state", "left").select(
            "state", F.coalesce(F.col("next_pi"), F.lit(0.0)).alias("pi")
        )
    emp = ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
    tot = ev.agg(F.count("*").alias("t"))
    return (
        states.join(pi, "state")
        .join(emp, states["state"] == emp["event_type"])
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("state").alias("event_type"),
            F.col("pi").alias("stationary_prob"),
            (F.col("cnt").cast("double") / F.col("t")).alias(
                "empirical_share"
            ),
        )
        .orderBy("event_type")
    )


# -- exponentially decayed trending -------------------------------------------

_DECAY_HL_US = 86_400_000_000  # half-life: 1 day of event time


@register(
    "events_decayed_trending",
    oracle=f"""
WITH mx AS (SELECT MAX(epoch_us(ts)) AS _mx FROM events),
w AS (
  SELECT event_type, value,
    ROUND(pow(CAST(2 AS DOUBLE),
              -CAST(_mx - epoch_us(ts) AS DOUBLE)
              / CAST({_DECAY_HL_US} AS DOUBLE)), 9) AS w
  FROM events, mx
)
SELECT event_type, COUNT(*) AS n_events,
  ROUND(CAST(SUM(CAST(w AS DECIMAL(38,12))) AS DOUBLE), 9)
    AS decayed_count,
  ROUND(CAST(SUM(CAST(w * value AS DECIMAL(38,9))) AS DOUBLE), 6)
    AS decayed_value
FROM w GROUP BY event_type
""",
    doc="Exponentially time-decayed trending aggregates (half-life = "
    "1 day of event time, anchored at the corpus max timestamp): the "
    "'what is hot NOW' rollup that a plain windowed count cannot "
    "express — every event contributes 2^(-age/halflife).  The "
    "1-row max-timestamp aggregate broadcasts (scalar-attach "
    "pattern, no global window over the corpus); weights quantize "
    "to 9 decimals at the source (libm pow — the BM25 ln precedent) "
    "and fold through DECIMAL, so the sums are order-independent "
    "and cross-engine exact.",
    tags=("events", "decay", "trending", "extension"),
    extended=True,
)
def events_decayed_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.functions.numeric import dec_sum

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.unix_micros(F.col("ts"))).alias("_mx"))
    w = F.round(
        F.pow(
            F.lit(2.0),
            -(F.col("_mx") - F.unix_micros(F.col("ts"))).cast("double")
            / F.lit(float(_DECAY_HL_US)),
        ),
        9,
    )
    return (
        ev.crossJoin(F.broadcast(mx))
        .withColumn("w", w)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(dec_sum(F.col("w"), 12, 38), 9).alias("decayed_count"),
            F.round(
                dec_sum(F.col("w") * F.col("value"), 9, 38), 6
            ).alias("decayed_value"),
        )
    )


# -- multi-touch attribution ---------------------------------------------------

_ATTR_WIN_US = 3_600_000_000  # 1 hour lookback


@register(
    "events_multitouch_attribution",
    oracle=f"""
WITH p AS (
  SELECT event_id AS pid, user_id, epoch_us(ts) AS pts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS cid, user_id, epoch_us(ts) AS cts,
    CAST(hour(ts) AS INT) AS click_hour
  FROM events WHERE event_type = 'click'
),
touch AS (
  SELECT p.pid, c.cid, c.click_hour,
    row_number() OVER (PARTITION BY p.pid ORDER BY c.cts, c.cid) AS pos,
    COUNT(*) OVER (PARTITION BY p.pid) AS n
  FROM p JOIN c ON p.user_id = c.user_id
    AND c.cts >= p.pts - {_ATTR_WIN_US} AND c.cts < p.pts
),
credit AS (
  SELECT click_hour,
    CASE WHEN n = 1 THEN CAST(1 AS DOUBLE)
         WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
         WHEN pos = 1 OR pos = n THEN CAST(0.4 AS DOUBLE)
         ELSE CAST(0.2 AS DOUBLE) / (n - 2) END AS w
  FROM touch
)
SELECT click_hour, CAST(COUNT(*) AS BIGINT) AS n_touches,
  CAST(SUM(CAST(w AS DECIMAL(38,12))) AS DOUBLE) AS credit
FROM credit GROUP BY click_hour
""",
    doc="U-shaped (position-based) multi-touch attribution: every "
    "purchase distributes 1.0 of credit across the clicks in its "
    "1-hour lookback — 40% first touch, 40% last, 20% split over the "
    "middles (single touch 100%, two touches 50/50) — rolled up by "
    "click hour-of-day.  The touch join is the bounded interval "
    "join; position/count are one window over each purchase's "
    "touches; weights are exact rationals (one IEEE division for "
    "middles) folded through DECIMAL.  The asof join gives "
    "last-touch; THIS is the multi-touch upgrade marketing analytics "
    "actually runs.",
    tags=("events", "attribution", "extension"),
    extended=True,
)
def events_multitouch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from diabetes_etl_spark.functions.numeric import dec_sum

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        us.alias("pts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("c_user"),
        us.alias("cts"),
        F.hour(F.col("ts")).cast("int").alias("click_hour"),
    )
    touch = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("cts") >= F.col("pts") - _ATTR_WIN_US)
        & (F.col("cts") < F.col("pts")),
    )
    from pyspark.sql import Window

    wp = Window.partitionBy("pid")
    touch = touch.withColumn(
        "pos",
        F.row_number().over(wp.orderBy(F.col("cts"), F.col("cid"))),
    ).withColumn("n", F.count("*").over(wp))
    w = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n")), F.lit(0.4)
        )
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return (
        touch.withColumn("w", w)
        .groupBy("click_hour")
        .agg(
            F.count("*").alias("n_touches"),
            dec_sum(F.col("w"), 12, 38).alias("credit"),
        )
    )


# -- inter-arrival burstiness ----------------------------------------------


@register(
    "events_burstiness_profile",
    oracle="""
WITH gaps AS (
  SELECT user_id,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
per_user AS (
  SELECT user_id, COUNT(gap) AS n_gaps,
    SUM(CAST(gap AS DECIMAL(38,0))) AS s,
    SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0))) AS q
  FROM gaps WHERE gap IS NOT NULL
  GROUP BY user_id HAVING COUNT(gap) >= 2
),
b AS (
  SELECT user_id,
    CAST(s AS DOUBLE) / n_gaps AS mu,
    sqrt((CAST(q AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_gaps)
         / (n_gaps - 1)) AS sigma
  FROM per_user
),
bb AS (
  SELECT user_id,
    CASE WHEN sigma + mu = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
         ELSE (sigma - mu) / (sigma + mu) END AS burst
  FROM b
)
SELECT CAST(least(greatest(floor((burst + 1) * 5),
                           0), 9) AS INT) AS bin,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(CAST(burst AS DECIMAL(38,12))) AS DOUBLE) AS burst_mass
FROM bb GROUP BY bin
""",
    doc="Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) of "
    "each user's inter-event gaps (B -> -1 periodic, 0 Poisson, "
    "+1 bursty), profiled as a 10-bin histogram over [-1, 1] — the "
    "standard temporal-pattern diagnostic for bot/burst detection.  "
    "One lag window per user, exact-integer microsecond gap sums "
    "(DECIMAL folds), one IEEE sqrt/division pair per user, and the "
    "bin floor runs on (burst+1)*5 whose inputs are bit-identical "
    "cross-engine.",
    tags=("events", "temporal", "extension"),
    extended=True,
)
def events_burstiness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    per_user = (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.sum(F.col("gap").cast("decimal(38,0)")).alias("s"),
            F.sum(
                F.col("gap").cast("decimal(19,0)")
                * F.col("gap").cast("decimal(19,0)")
            ).alias("q"),
        )
        .filter(F.col("n_gaps") >= 2)
    )
    mu = F.col("s").cast("double") / F.col("n_gaps")
    sigma = F.sqrt(
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n_gaps")
        )
        / (F.col("n_gaps") - 1)
    )
    burst = F.when(sigma + mu == 0.0, F.lit(0.0)).otherwise(
        (sigma - mu) / (sigma + mu)
    )
    return (
        per_user.select(burst.alias("burst"))
        .select(
            F.least(
                F.greatest(F.floor((F.col("burst") + 1) * 5), F.lit(0)),
                F.lit(9),
            ).cast("int").alias("bin"),
            "burst",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.col("burst").cast("decimal(38,12)"))
            .cast("double")
            .alias("burst_mass"),
        )
    )


# -- sweep-line peak concurrency -------------------------------------------

_CONC_DUR_US = 300_000_000  # each event holds a 5-minute session slot


@register(
    "events_peak_concurrency",
    oracle=f"""
WITH bounds AS (
  SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + {_CONC_DUR_US}, -1 FROM events
),
running AS (
  SELECT event_type,
    SUM(delta) OVER (PARTITION BY event_type
      ORDER BY t, delta
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS load
  FROM bounds
)
SELECT event_type,
  CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals,
  CAST(MAX(load) AS BIGINT) AS peak_concurrent
FROM running GROUP BY event_type
""",
    doc="Sweep-line peak concurrency: each event occupies a 5-minute "
    "slot [ts, ts+5m); the classic +1/-1 boundary scan with ends "
    "processed BEFORE starts at equal instants (ORDER BY t, delta — "
    "half-open intervals never double-count a touch-boundary "
    "handoff) gives the running load, whose max is the capacity "
    "answer a self-join formulation needs O(n^2) to reach.  One "
    "exchange per event type, two rows per event, exact integers.",
    tags=("events", "sweepline", "extension"),
    extended=True,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    starts = ev.select(
        "event_type", us.alias("t"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "event_type",
        (us + _CONC_DUR_US).alias("t"),
        F.lit(-1).alias("delta"),
    )
    bounds = starts.unionByName(ends)
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("t"), F.col("delta"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = bounds.withColumn("load", F.sum("delta").over(w))
    return running.groupBy("event_type").agg(
        (F.count("*") / 2).cast("long").alias("n_intervals"),
        F.max("load").cast("long").alias("peak_concurrent"),
    )


# -- lag-k autocorrelation ----------------------------------------------------


@register(
    "orders_daily_autocorrelation",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY d
),
lagged AS (
  SELECT c,
    lag(c, 1) OVER (ORDER BY d) AS c1,
    lag(c, 2) OVER (ORDER BY d) AS c2,
    lag(c, 3) OVER (ORDER BY d) AS c3
  FROM daily
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(c AS DECIMAL(38,0))) AS sc,
    SUM(CAST(c * c AS DECIMAL(38,0))) AS scc,
    SUM(CAST(c * c1 AS DECIMAL(38,0))) AS s1,
    CAST(COUNT(c1) AS BIGINT) AS n1,
    SUM(CAST(c * c2 AS DECIMAL(38,0))) AS s2,
    CAST(COUNT(c2) AS BIGINT) AS n2,
    SUM(CAST(c * c3 AS DECIMAL(38,0))) AS s3,
    CAST(COUNT(c3) AS BIGINT) AS n3
  FROM lagged
),
m AS (
  SELECT n, n1, n2, n3,
    CAST(sc AS DOUBLE) / n AS mu,
    CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n
      AS ss,
    CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
    CAST(s3 AS DOUBLE) AS s3,
    CAST(sc AS DOUBLE) AS sc
  FROM s
)
SELECT n AS n_days,
  ROUND(mu, 9) AS mean_daily,
  ROUND((s1 - CAST(n1 AS DOUBLE) * mu * mu) / ss, 9) AS acf_approx_1,
  ROUND((s2 - CAST(n2 AS DOUBLE) * mu * mu) / ss, 9) AS acf_approx_2,
  ROUND((s3 - CAST(n3 AS DOUBLE) * mu * mu) / ss, 9) AS acf_approx_3
FROM m
""",
    doc="Lag-1..3 autocorrelation of the daily order-count series "
    "(the standard ACF approximation: lag products centered by the "
    "global mean, normalized by the total sum of squares — "
    "Box-Jenkins' r_k): tells a forecaster whether daily volume "
    "carries memory.  Exact integer count/cross-product sums via one "
    "day rollup + one ordered window; the mean/normalization are the "
    "only IEEE steps, identically ordered on both engines.",
    tags=("events", "timeseries", "acf", "extension"),
    extended=True,
)
def orders_daily_autocorrelation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    w = Window.orderBy("d")
    lagged = daily.select(
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 2).over(w).alias("c2"),
        F.lag("c", 3).over(w).alias("c3"),
    )
    s = lagged.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("sc"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("scc"),
        F.sum((F.col("c") * F.col("c1")).cast("decimal(38,0)")).alias("s1"),
        F.count("c1").cast("long").alias("n1"),
        F.sum((F.col("c") * F.col("c2")).cast("decimal(38,0)")).alias("s2"),
        F.count("c2").cast("long").alias("n2"),
        F.sum((F.col("c") * F.col("c3")).cast("decimal(38,0)")).alias("s3"),
        F.count("c3").cast("long").alias("n3"),
    )
    mu = F.col("sc").cast("double") / F.col("n")
    ss = (
        F.col("scc").cast("double")
        - F.col("sc").cast("double") * F.col("sc").cast("double")
        / F.col("n")
    )

    def acf(sk: str, nk: str):
        return F.round(
            (F.col(sk).cast("double") - F.col(nk).cast("double") * mu * mu)
            / ss,
            9,
        )

    return s.select(
        F.col("n").alias("n_days"),
        F.round(mu, 9).alias("mean_daily"),
        acf("s1", "n1").alias("acf_approx_1"),
        acf("s2", "n2").alias("acf_approx_2"),
        acf("s3", "n3").alias("acf_approx_3"),
    )


# -- CUSUM change-point --------------------------------------------------------


@register(
    "events_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY d
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS sc, COUNT(*) AS n FROM daily),
cus AS (
  SELECT d, c,
    SUM(CAST(tot.n * c AS DECIMAL(38,0)) - tot.sc) OVER (
      ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS s_scaled,
    tot.n AS n, tot.sc AS sc
  FROM daily, tot
),
pick AS (
  SELECT d, c, s_scaled, n, sc,
    row_number() OVER (ORDER BY abs(s_scaled) DESC, d) AS rn
  FROM cus
)
SELECT CAST(n AS BIGINT) AS n_days, d AS change_day,
  CAST(c AS BIGINT) AS day_count,
  CAST(s_scaled AS DOUBLE) AS cusum_scaled,
  ROUND(CAST(s_scaled AS DOUBLE) / n, 9) AS cusum
FROM pick WHERE rn = 1
""",
    doc="CUSUM change-point detection on the daily event-count "
    "series: the cumulative sum of mean-deviations peaks (in "
    "magnitude) at the most likely level-shift day (Page 1954).  "
    "Deviations are kept EXACT by scaling with n — "
    "n*c_i - sum(c) is an integer, so the running sum, the |argmax| "
    "and its tie-break (earliest day) involve no floats at all; the "
    "reported cusum divides once at the end.  One day rollup + one "
    "ordered window.",
    tags=("events", "changepoint", "extension"),
    extended=True,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    wa = Window.partitionBy()
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cus = (
        daily.withColumn("sc", F.sum("c").over(wa))
        .withColumn("n", F.count("*").over(wa))
        .withColumn(
            "s_scaled",
            F.sum(
                (F.col("n") * F.col("c")).cast("decimal(38,0)")
                - F.col("sc")
            ).over(w),
        )
    )
    pick = cus.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.abs(F.col("s_scaled")).desc(), F.col("d"))
        ),
    ).filter(F.col("rn") == 1)
    return pick.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("d").alias("change_day"),
        F.col("c").cast("long").alias("day_count"),
        F.col("s_scaled").cast("double").alias("cusum_scaled"),
        F.round(
            F.col("s_scaled").cast("double") / F.col("n"), 9
        ).alias("cusum"),
    )


# -- Wilson-bound conversion ranking -------------------------------------------

_WILSON_Z2 = 3.8416  # z = 1.96 squared, exact double literal


@register(
    "events_wilson_conversion",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
    CAST(hour(min(ts)) AS INT) AS first_hour
  FROM events GROUP BY user_id
),
g AS (
  SELECT first_hour, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(conv) AS BIGINT) AS k
  FROM per_user GROUP BY first_hour
)
SELECT first_hour, n AS n_users, k AS n_converted,
  ROUND(CAST(k AS DOUBLE) / n, 9) AS rate,
  ROUND((CAST(k AS DOUBLE) / n + CAST({_WILSON_Z2!r} AS DOUBLE) / (2 * n)
         - sqrt(CAST({_WILSON_Z2!r} AS DOUBLE))
           * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n
                  + CAST({_WILSON_Z2!r} AS DOUBLE) / (4.0 * n * n)))
        / (1 + CAST({_WILSON_Z2!r} AS DOUBLE) / n), 9) AS wilson_lower
FROM g
""",
    doc="Conversion rate per first-seen-hour cohort — the hour-of-day "
    "of each user's EARLIEST event, hour(min(ts)), not min of hour "
    "across all events (round-8 ADVICE low: a user first seen at "
    "23:00 with a later 01:00 event belongs in cohort 23, not 1) — "
    "with the WILSON score "
    "lower bound (z = 1.96) — the rank-by-lower-bound rule that "
    "stops a 1/1 cohort outranking a 180/200 one (Agresti-Coull "
    "family; Evan Miller's 'how not to sort by average rating').  "
    "Exact integer (n, k) from two rollups; the bound is IEEE "
    "arithmetic with identical literals and op order, two "
    "correctly-rounded sqrts.",
    tags=("events", "wilson", "extension"),
    extended=True,
)
def events_wilson_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
        F.hour(F.min(F.col("ts"))).cast("int").alias("first_hour"),
    )
    g = per_user.groupBy("first_hour").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conv").cast("long").alias("k"),
    )
    z2 = F.lit(_WILSON_Z2)
    p = F.col("k").cast("double") / F.col("n")
    n = F.col("n")
    lower = (
        p + z2 / (2 * n)
        - F.sqrt(z2) * F.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
    ) / (1 + z2 / n)
    return g.select(
        "first_hour",
        F.col("n").alias("n_users"),
        F.col("k").alias("n_converted"),
        F.round(p, 9).alias("rate"),
        F.round(lower, 9).alias("wilson_lower"),
    )


# -- seasonal decomposition + robust anomalies (round 9) ---------------------
#
# Classical additive decomposition of the daily volume series:
# trend = 7-row centered moving average, seasonal = per-weekday MEDIAN
# of the detrended series (median, not mean, so one spike day cannot
# contaminate its weekday's seasonal estimate), residual = n - trend -
# seasonal, and a robust MAD flag (|residual - median| > 3 * MAD) —
# the monitoring-stack shape (STL-lite) over exact window arithmetic.
# Weekday convention: Spark weekday() == DuckDB isodow - 1 (Monday=0).

_SEAS_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
),
tr AS (
  SELECT day, n,
    ROUND(CAST(SUM(n) OVER w AS DOUBLE) / COUNT(*) OVER w, 9) AS trend,
    isodow(day) - 1 AS dow
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
seas AS (
  SELECT dow, ROUND(median(n - trend), 9) AS seasonal
  FROM tr GROUP BY dow
),
res AS (
  SELECT t.day, t.n, t.trend, s.seasonal,
    ROUND(t.n - t.trend - s.seasonal, 9) AS residual
  FROM tr t JOIN seas s ON s.dow = t.dow
),
med AS (
  SELECT ROUND(median(residual), 9) AS m FROM res
),
mad AS (
  SELECT ROUND(median(ABS(res.residual - med.m)), 9) AS mad
  FROM res, med
)
SELECT strftime(r.day, '%Y-%m-%d') AS day,
  CAST(r.n AS BIGINT) AS n_events, r.trend, r.seasonal, r.residual,
  CAST(ABS(r.residual - med.m) > 3 * mad.mad AS BOOLEAN) AS is_anomaly
FROM res r, med, mad
ORDER BY r.day
"""


@register(
    "events_seasonal_anomalies",
    oracle=_SEAS_ORACLE,
    doc="Seasonal decomposition + robust anomaly flags on the daily "
    "event volume (STL-lite): 7-row centered moving-average trend, "
    "per-weekday seasonal MEDIANS over the detrended series (median "
    "so a spike day cannot drag its own weekday's seasonal estimate), "
    "residuals, and a 3-MAD-from-median flag — medians exact, every "
    "float rounded where it is born so the flags are "
    "engine-identical.  "
    "Scale: the day dimension is tiny after the one grouped scan of "
    "events; all window/median work runs on O(days) rows.",
    tags=("events", "timeseries", "seasonal", "anomaly", "extension"),
    extended=False,  # promoted to the gate (round-9 session rotation, see registry._EXTENDED)
)
def events_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "n",
        F.round(
            F.sum("n").over(w).cast("double") / F.count("*").over(w), 9
        ).alias("trend"),
        F.expr("weekday(day)").alias("dow"),
    )
    seas = tr.groupBy("dow").agg(
        F.round(
            F.median(F.col("n") - F.col("trend")), 9
        ).alias("seasonal")
    )
    res = tr.join(F.broadcast(seas), "dow").select(
        "day",
        "n",
        "trend",
        "seasonal",
        F.round(
            F.col("n") - F.col("trend") - F.col("seasonal"), 9
        ).alias("residual"),
    )
    med = res.agg(F.round(F.median("residual"), 9).alias("m"))
    mad = (
        res.crossJoin(F.broadcast(med))
        .agg(
            F.round(
                F.median(F.abs(F.col("residual") - F.col("m"))), 9
            ).alias("mad")
        )
    )
    return (
        res.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n_events"),
            "trend",
            "seasonal",
            "residual",
            (
                F.abs(F.col("residual") - F.col("m"))
                > F.lit(3) * F.col("mad")
            ).alias("is_anomaly"),
        )
        .orderBy("day")
    )


# -- Theil-Sen robust trend (round 9) ----------------------------------------
#
# The median-of-pair-slopes estimator (Theil 1950 / Sen 1968): immune
# to up to ~29% outlier days, unlike OLS.  Exact form: ALL O(days^2)
# pairs — the quadratic runs on the tiny day dimension (one grouped
# scan of orders reduces the corpus first), never on raw rows.  Pair
# slopes are single IEEE divisions of exact integers (identical in
# both engines), medians are exact, and every derived float is
# rounded where it is born.  The OLS slope from exact DECIMAL sums
# rides along so the robust-vs-least-squares gap is visible.

_THEIL_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
idx AS (
  SELECT datediff('day', (SELECT MIN(day) FROM daily), day) AS d, c
  FROM daily
),
pairs AS (
  SELECT CAST(b.c - a.c AS DOUBLE) / (b.d - a.d) AS s
  FROM idx a JOIN idx b ON a.d < b.d
),
ts AS (
  SELECT ROUND(median(s), 9) AS slope,
    CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs
),
icept AS (
  SELECT ROUND(median(i.c - ts.slope * i.d), 9) AS intercept
  FROM idx i, ts
),
ols AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(d AS DECIMAL(38,0))) AS sd,
    SUM(CAST(c AS DECIMAL(38,0))) AS sc,
    SUM(CAST(d * c AS DECIMAL(38,0))) AS sdc,
    SUM(CAST(d * d AS DECIMAL(38,0))) AS sdd
  FROM idx
)
SELECT ols.n AS n_days, ts.n_pairs, ts.slope AS ts_slope,
  icept.intercept AS ts_intercept,
  ROUND(CAST(ols.n * ols.sdc - ols.sd * ols.sc AS DOUBLE)
        / CAST(ols.n * ols.sdd - ols.sd * ols.sd AS DOUBLE), 9)
    AS ols_slope
FROM ts, icept, ols
"""


@register(
    "orders_theil_sen_trend",
    oracle=_THEIL_ORACLE,
    doc="Theil-Sen robust trend of daily order volume: the median of "
    "all pair slopes (exact estimator, breakdown point ~29%) plus "
    "the median intercept and the exact-DECIMAL-sum OLS slope for "
    "comparison.  Pair slopes are IEEE divisions of exact integers; "
    "medians exact; slope rounded at source before the intercept "
    "uses it.  Scale: the O(days^2) pair join runs on the day "
    "dimension AFTER one grouped corpus scan — ~2.4k days -> ~3M "
    "pairs regardless of row count; for multi-decade horizons the "
    "documented fallback is the repeated-median / sampled variant.",
    tags=("events", "timeseries", "robust", "trend", "extension"),
    extended=True,
)
def orders_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    mind = daily.agg(F.min("day").alias("d0"))
    idx = daily.crossJoin(F.broadcast(mind)).select(
        F.datediff(F.col("day"), F.col("d0")).alias("d"), "c"
    )
    a = idx.alias("a")
    b = idx.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.d") < F.col("b.d")
    ).select(
        (
            (F.col("b.c") - F.col("a.c")).cast("double")
            / (F.col("b.d") - F.col("a.d"))
        ).alias("s")
    )
    ts = pairs.agg(
        F.round(F.median("s"), 9).alias("slope"),
        F.count("*").cast("long").alias("n_pairs"),
    )
    icept = idx.crossJoin(F.broadcast(ts)).agg(
        F.round(
            F.median(F.col("c") - F.col("slope") * F.col("d")), 9
        ).alias("intercept")
    )
    ols = idx.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("d").cast("decimal(38,0)")).alias("sd"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("sc"),
        F.sum((F.col("d") * F.col("c")).cast("decimal(38,0)")).alias("sdc"),
        F.sum((F.col("d") * F.col("d")).cast("decimal(38,0)")).alias("sdd"),
    )
    return (
        ols.crossJoin(F.broadcast(ts))
        .crossJoin(F.broadcast(icept))
        .select(
            F.col("n").alias("n_days"),
            "n_pairs",
            F.col("slope").alias("ts_slope"),
            F.col("intercept").alias("ts_intercept"),
            F.round(
                (
                    F.col("n") * F.col("sdc") - F.col("sd") * F.col("sc")
                ).cast("double")
                / (
                    F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")
                ).cast("double"),
                9,
            ).alias("ols_slope"),
        )
    )


# -- Kaplan-Meier user-lifetime survival (round 9) ---------------------------
#
# The product-limit estimator (Kaplan & Meier 1958) over user
# "lifetimes": a user's observed span = days between first and last
# event; users silent for >= 7 days at corpus end are observed churns
# (deaths at their span), everyone else is right-CENSORED — exactly
# the estimator retention curves need when the corpus ends mid-story.
# Survival is kept in LOG space (cumulative decimal-folded sum of
# ln(1 - d/n) terms, each quantized to 9 decimals at source — the
# BM25 ln rule) so both engines agree bit-for-bit; exp() is left to
# the consumer.  n_risk arithmetic is exact integers.

_KM_ORACLE = """
WITH ed AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
per_user AS (
  SELECT user_id, MIN(day) AS f, MAX(day) AS l FROM ed GROUP BY user_id
),
mx AS (SELECT MAX(l) AS maxd FROM per_user),
users AS (
  SELECT datediff('day', f, l) AS t,
    CASE WHEN l <= maxd - INTERVAL 7 DAY THEN 1 ELSE 0 END AS dead
  FROM per_user, mx
),
grp AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS m,
    CAST(SUM(dead) AS BIGINT) AS d
  FROM users GROUP BY t
),
risk AS (
  SELECT t, m, d,
    SUM(m) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS upto,
    SUM(m) OVER () AS total
  FROM grp
),
terms AS (
  SELECT t, m, d, total - upto + m AS n_risk,
    CASE WHEN d < total - upto + m
      THEN ROUND(ln(1 - CAST(d AS DOUBLE) / (total - upto + m)), 9)
      ELSE NULL END AS lnterm,
    MAX(CASE WHEN d >= total - upto + m THEN 1 ELSE 0 END)
      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS zeroed
  FROM risk
)
SELECT CAST(t AS BIGINT) AS t_days,
  CAST(n_risk AS BIGINT) AS n_risk,
  d AS n_deaths, m - d AS n_censored,
  CASE WHEN zeroed = 1 THEN NULL
    ELSE ROUND(CAST(SUM(CAST(lnterm AS DECIMAL(20,12)))
      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS DOUBLE), 9) END AS log_survival
FROM terms
ORDER BY t
"""


@register(
    "events_km_survival",
    oracle=_KM_ORACLE,
    doc="Kaplan-Meier product-limit survival of user lifetimes "
    "(observed span first->last event; silent >= 7 days at corpus "
    "end = churn/death, else right-censored): per distinct lifetime "
    "t the at-risk count, deaths, censored, and the log-survival "
    "curve — cumulative decimal-folded sum of ln(1 - d/n) hazard "
    "terms quantized at source, NULL once survival hits zero.  "
    "Scale: one grouped scan of events to per-user spans, then all "
    "window work on the O(distinct lifetimes) dimension; the 1-row "
    "corpus-end date attaches by broadcast.",
    tags=("events", "survival", "timeseries", "extension"),
    extended=True,
)
def events_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts")).cast("date")).alias("f"),
        F.max(F.date_trunc("day", F.col("ts")).cast("date")).alias("l"),
    )
    mx = per_user.agg(F.max("l").alias("maxd"))
    users = per_user.crossJoin(F.broadcast(mx)).select(
        F.datediff("l", "f").alias("t"),
        F.when(
            F.col("l") <= F.date_sub(F.col("maxd"), 7), F.lit(1)
        ).otherwise(F.lit(0)).alias("dead"),
    )
    grp = users.groupBy("t").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("dead").cast("long").alias("d"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    risk = grp.select(
        "t",
        "m",
        "d",
        (
            F.sum("m").over(wall) - F.sum("m").over(wcum) + F.col("m")
        ).alias("n_risk"),
    )
    terms = risk.select(
        "t",
        "m",
        "d",
        "n_risk",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.round(
                F.log(
                    F.lit(1.0)
                    - F.col("d").cast("double") / F.col("n_risk")
                ),
                9,
            ),
        ).alias("lnterm"),
        F.max(
            F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
        ).over(wcum).alias("zeroed"),
    )
    return terms.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("n_deaths"),
        (F.col("m") - F.col("d")).alias("n_censored"),
        F.when(
            F.col("zeroed") == 1, F.lit(None).cast("double")
        ).otherwise(
            F.round(
                F.sum(
                    F.col("lnterm").cast("decimal(20,12)")
                ).over(wcum).cast("double"),
                9,
            )
        ).alias("log_survival"),
    ).orderBy("t_days")


# -- Holt double-exponential smoothing (round 9) -----------------------------
#
# Holt's linear-trend method (Holt 1957) over the daily order-volume
# series: level/trend recurrences with alpha=0.3, beta=0.1, seeded at
# the first observation (trend 0) so every engine starts identically.
# The recurrence is inherently sequential, but the sequence is the
# O(days) dimension after one grouped corpus scan: the Spark side
# folds the ordered daily array with a native `aggregate` lambda (no
# Python), the oracle replays the IDENTICAL per-step arithmetic in a
# recursive CTE.  Every level/trend/error is rounded to 9 decimals
# the moment it is produced and the explicit complements (0.7, 0.9)
# are spelled out on both sides, so the two engines walk bit-identical
# states; squared errors fold through DECIMAL.

_HOLT_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS i,
    CAST(c AS DOUBLE) AS y
  FROM daily
),
hw AS (
  SELECT i, y AS lvl, CAST(0 AS DOUBLE) AS tr,
    CAST(0 AS DOUBLE) AS sq
  FROM idx WHERE i = 0
  UNION ALL
  SELECT d.i,
    ROUND(CAST(0.3 AS DOUBLE) * d.y
          + CAST(0.7 AS DOUBLE) * (hw.lvl + hw.tr), 9),
    ROUND(CAST(0.1 AS DOUBLE)
            * (ROUND(CAST(0.3 AS DOUBLE) * d.y
                     + CAST(0.7 AS DOUBLE) * (hw.lvl + hw.tr), 9)
               - hw.lvl)
          + CAST(0.9 AS DOUBLE) * hw.tr, 9),
    hw.sq + ROUND(d.y - ROUND(hw.lvl + hw.tr, 9), 9)
            * ROUND(d.y - ROUND(hw.lvl + hw.tr, 9), 9)
  FROM hw JOIN idx d ON d.i = hw.i + 1
)
SELECT CAST(i + 1 AS BIGINT) AS n_days,
  lvl AS level, tr AS trend,
  ROUND(lvl + tr, 9) AS forecast_1,
  ROUND(lvl + CAST(7 AS DOUBLE) * tr, 9) AS forecast_7,
  CASE WHEN i > 0 THEN ROUND(sq / i, 9) END AS mse_1step
FROM hw
WHERE i = (SELECT MAX(i) FROM idx)
"""


@register(
    "orders_holt_smoothing",
    oracle=_HOLT_ORACLE,
    doc="Holt double-exponential smoothing of daily order volume "
    "(alpha=0.3, beta=0.1, seeded level=y0/trend=0): final level and "
    "trend, 1- and 7-day-ahead forecasts, and the one-step-ahead "
    "mean squared error (raw-double sequential accumulation, rounded "
    "once on the mean).  Each level/trend/error is "
    "rounded to 9 decimals at the step that produces it with "
    "explicit complements, so the Spark native-aggregate fold and "
    "the oracle's recursive CTE walk bit-identical states.  Scale: "
    "one grouped corpus scan; the sequential fold runs over the "
    "O(days) array on a single row.",
    tags=("events", "timeseries", "forecast", "extension"),
    extended=True,
)
def orders_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    series = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda s: s.c.cast("double"),
        ).alias("ys")
    )
    zero = F.lit(0).cast("double")
    # sq accumulates RAW err*err doubles: the fold is strictly
    # sequential in both engines, so plain IEEE accumulation is
    # order-identical; quantizing err^2 (magnitude up to ~1e5) at 9
    # decimals is exactly the last-ulp-unstable pattern the playbook
    # bans, so the rounding happens once, on the ~magnitude-10 MEAN.
    acc0 = F.struct(
        zero.alias("lvl"),
        zero.alias("tr"),
        zero.alias("sq"),
        F.lit(0).alias("n"),
    )

    def step(acc, y):
        first = acc.n == 0
        lvl_new = F.round(
            F.lit(0.3) * y + F.lit(0.7) * (acc.lvl + acc.tr), 9
        )
        tr_new = F.round(
            F.lit(0.1) * (lvl_new - acc.lvl) + F.lit(0.9) * acc.tr, 9
        )
        err = F.round(y - F.round(acc.lvl + acc.tr, 9), 9)
        return F.struct(
            F.when(first, y).otherwise(lvl_new).alias("lvl"),
            F.when(first, zero).otherwise(tr_new).alias("tr"),
            F.when(first, acc.sq)
            .otherwise(acc.sq + err * err)
            .alias("sq"),
            (acc.n + 1).alias("n"),
        )

    return series.select(
        F.aggregate(
            F.col("ys"),
            acc0,
            step,
            lambda acc: F.struct(
                acc.n.cast("long").alias("n_days"),
                acc.lvl.alias("level"),
                acc.tr.alias("trend"),
                F.round(acc.lvl + acc.tr, 9).alias("forecast_1"),
                F.round(acc.lvl + F.lit(7.0) * acc.tr, 9).alias(
                    "forecast_7"
                ),
                F.when(
                    acc.n > 1,
                    F.round(acc.sq / (acc.n - 1), 9),
                ).alias("mse_1step"),
            ),
        ).alias("hw")
    ).select("hw.*")


# -- seasonal-naive backtest / MASE (round 9) --------------------------------

_MASE_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT c,
    lag(c, 1) OVER (ORDER BY day) AS c1,
    lag(c, 7) OVER (ORDER BY day) AS c7
  FROM daily
),
s AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n_days,
    CAST(COUNT(c1) AS BIGINT) AS n1,
    CAST(COUNT(c7) AS BIGINT) AS n7,
    SUM(CAST(ABS(c - c1) AS DECIMAL(38,0))) AS ae1,
    SUM(CAST(ABS(c - c7) AS DECIMAL(38,0))) AS ae7
  FROM lagged
)
SELECT n_days,
  ROUND(CAST(ae1 AS DOUBLE) / n1, 9) AS mae_naive1,
  ROUND(CAST(ae7 AS DOUBLE) / n7, 9) AS mae_seasonal7,
  ROUND((CAST(ae7 AS DOUBLE) / n7) / (CAST(ae1 AS DOUBLE) / n1), 9)
    AS mase_seasonal
FROM s
"""


@register(
    "orders_mase_backtest",
    oracle=_MASE_ORACLE,
    doc="Seasonal-naive forecast backtest with MASE (Hyndman & "
    "Koehler 2006): MAE of the lag-7 seasonal-naive forecast scaled "
    "by the MAE of the one-step naive — MASE < 1 means weekly "
    "seasonality genuinely helps, the scale-free way to say so.  "
    "Absolute errors are exact integers summed through DECIMAL; the "
    "two divisions and the ratio are the only IEEE steps, identical "
    "op order both engines.  Scale: one grouped corpus scan, then "
    "O(days) window work.",
    tags=("events", "timeseries", "forecast", "backtest", "extension"),
    extended=True,
)
def orders_mase_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    w = Window.orderBy("day")
    lagged = daily.select(
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 7).over(w).alias("c7"),
    )
    s = lagged.agg(
        F.count("*").cast("long").alias("n_days"),
        F.count("c1").cast("long").alias("n1"),
        F.count("c7").cast("long").alias("n7"),
        F.sum(
            F.abs(F.col("c") - F.col("c1")).cast("decimal(38,0)")
        ).alias("ae1"),
        F.sum(
            F.abs(F.col("c") - F.col("c7")).cast("decimal(38,0)")
        ).alias("ae7"),
    )
    mae1 = F.col("ae1").cast("double") / F.col("n1")
    mae7 = F.col("ae7").cast("double") / F.col("n7")
    return s.select(
        "n_days",
        F.round(mae1, 9).alias("mae_naive1"),
        F.round(mae7, 9).alias("mae_seasonal7"),
        F.round(mae7 / mae1, 9).alias("mase_seasonal"),
    )


# -- exactly-once stream -> versioned table (round 9) ------------------------


@register(
    "stream_versioned_sink",
    oracle="""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc="Exactly-once streaming sink into the versioned table "
    "(streaming/versioned_sink.py): the events stream drains via "
    "foreachBatch with the Delta-style app-transaction handshake "
    "(app_txn committed atomically WITH the data in one manifest), "
    "then the SAME drain runs a second time over the same checkpoint "
    "— the result aggregates the table after both runs, so any "
    "duplication or loss hash-mismatches the oracle.  This is the "
    "standard Structured-Streaming exactly-once recipe expressed "
    "against the repo's object-store-native ACID commits.  Scale: "
    "the guard reads one manifest field; the append writes each "
    "micro-batch once.",
    tags=("streaming", "versioned", "exactly-once", "extension"),
    extended=True,
)
def stream_versioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from diabetes_etl_spark.sources.tables import load_events_stream
    from diabetes_etl_spark.sources.versioned import VersionedTable
    from diabetes_etl_spark.streaming.versioned_sink import (
        stream_append_versioned,
    )

    work = tempfile.mkdtemp(prefix="vsink_")
    vt = VersionedTable(spark, f"{work}/tbl")
    ck = f"{work}/ck"
    stream = load_events_stream(spark, sf_dir)
    stream_append_versioned(stream, vt, "events-ingest", ck)
    # replay over the same checkpoint: must be a no-op (exactly once)
    stream_append_versioned(
        load_events_stream(spark, sf_dir), vt, "events-ingest", ck
    )
    return (
        vt.read()
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("event_type")
    )


# -- A/B experiment readout (round 9) -----------------------------------------


@register(
    "events_ab_experiment",
    oracle="""
WITH users AS (
  SELECT user_id,
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
      % 2 AS INT) AS variant,
    MAX(CASE WHEN event_type = 'purchase' AND value >= 150
        THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
v AS (
  SELECT variant, COUNT(*) AS n, SUM(conv) AS c
  FROM users GROUP BY variant
),
w AS (
  SELECT
    MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
    MAX(CASE WHEN variant = 0 THEN c END) AS c_a,
    MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
    MAX(CASE WHEN variant = 1 THEN c END) AS c_b
  FROM v
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS conv_a,
  CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS conv_b,
  CAST(c_a AS DOUBLE) / n_a AS rate_a,
  CAST(c_b AS DOUBLE) / n_b AS rate_b,
  CAST(c_b * n_a AS DOUBLE) / (c_a * n_b) - CAST(1 AS DOUBLE)
    AS rel_uplift,
  (CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
    / SQRT(CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)
           * (CAST(1 AS DOUBLE)
              - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
           * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
    AS z_score,
  CAST(n_a + n_b AS DOUBLE)
    * CAST(c_a * (n_b - c_b) - c_b * (n_a - c_a) AS DOUBLE)
    * CAST(c_a * (n_b - c_b) - c_b * (n_a - c_a) AS DOUBLE)
    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
       * CAST(c_a + c_b AS DOUBLE)
       * CAST(n_a - c_a + n_b - c_b AS DOUBLE)) AS chi2
FROM w
""",
    doc="A/B experiment readout: users bucket deterministically into "
    "two variants by md5-prefix hash (the bucketing an "
    "experimentation platform does — stable under re-runs and across "
    "engines, never RAND), per-variant user-level conversion "
    "(a purchase of value >= 150 — thresholded so the rate is "
    "non-degenerate at every fixture scale) rates, exact-integer relative uplift "
    "(c_b*n_a)/(c_a*n_b) - 1, the pooled two-proportion z statistic, "
    "and the 2x2 chi-square via N*(ad-bc)^2 / row/col products — "
    "every input an exact BIGINT, divisions and the one SQRT "
    "(IEEE-correctly-rounded, not libm-variable) in pinned order so "
    "both engines emit identical doubles.  No p-value on purpose: "
    "erf IS libm-variable; downstream compares |z| to fixed critical "
    "values.  Scale: one grouped pass to user grain (map-side "
    "combine), then a 2-row epilogue.",
    tags=("events", "abtest", "statistics", "extension"),
    extended=True,
)
def events_ab_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        )
        .cast("int")
        .alias("variant"),
        "conv",
    )
    v = users.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("c"))).alias("c_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("c"))).alias("c_b"),
    )
    n_a, c_a = F.col("n_a"), F.col("c_a")
    n_b, c_b = F.col("n_b"), F.col("c_b")
    one = F.lit(1).cast("double")
    rate_a = c_a.cast("double") / n_a
    rate_b = c_b.cast("double") / n_b
    pool = (c_a + c_b).cast("double") / (n_a + n_b)
    diff = (c_a * (n_b - c_b) - c_b * (n_a - c_a)).cast("double")
    return w.select(
        n_a.cast("long").alias("n_a"),
        c_a.cast("long").alias("conv_a"),
        n_b.cast("long").alias("n_b"),
        c_b.cast("long").alias("conv_b"),
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        ((c_b * n_a).cast("double") / (c_a * n_b) - one).alias(
            "rel_uplift"
        ),
        (
            (rate_b - rate_a)
            / F.sqrt(pool * (one - pool) * (one / n_a + one / n_b))
        ).alias("z_score"),
        (
            (n_a + n_b).cast("double")
            * diff
            * diff
            / (
                n_a.cast("double")
                * n_b.cast("double")
                * (c_a + c_b).cast("double")
                * (n_a - c_a + n_b - c_b).cast("double")
            )
        ).alias("chi2"),
    )


@register(
    "events_ab_ks_values",
    oracle="""
WITH s AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      ::BIGINT % 2 AS INT) AS variant,
    value AS v
  FROM events WHERE event_type = 'purchase'
),
g AS (
  SELECT v,
    SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na_v,
    SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb_v
  FROM s GROUP BY v
),
c AS (
  SELECT
    SUM(na_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
    SUM(nb_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb,
    SUM(na_v) OVER () AS na, SUM(nb_v) OVER () AS nb
  FROM g
)
SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
  CAST(MAX(ABS(ca * nb - cb * na)) AS DOUBLE)
    / (MAX(na) * MAX(nb)) AS ks_d,
  SQRT(CAST(MAX(na) AS DOUBLE) * MAX(nb) / (MAX(na) + MAX(nb)))
    * (CAST(MAX(ABS(ca * nb - cb * na)) AS DOUBLE)
       / (MAX(na) * MAX(nb))) AS ks_scaled
FROM c
""",
    doc="Two-sample Kolmogorov-Smirnov test between the A/B variants' "
    "purchase-value distributions — the distribution-shift companion "
    "to events_ab_experiment's rate test (an experiment can leave the "
    "conversion rate flat while shifting the spend distribution).  "
    "Exact rank algebra: values group by distinct amount (2-decimal "
    "money — the grouped table is bounded by the value domain, not "
    "the event count), ECDF gaps evaluate CROSS-MULTIPLIED as "
    "|ca*nb - cb*na| so the max runs on exact BIGINTs; one division "
    "and one IEEE sqrt at the end.  ks_scaled = sqrt(na*nb/(na+nb)) "
    "* D is the statistic compared to Kolmogorov critical values "
    "(1.358 at alpha=0.05) — no p-value on purpose (the Kolmogorov "
    "series is libm territory).",
    tags=("events", "abtest", "statistics", "extension"),
    extended=True,
)
def events_ab_ks_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "purchase").select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).cast("int").alias("variant"),
        F.col("value").alias("v"),
    )
    g = s.groupBy("v").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("na_v"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("nb_v"),
    )
    w_cum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        F.sum("na_v").over(w_cum).alias("ca"),
        F.sum("nb_v").over(w_cum).alias("cb"),
        F.sum("na_v").over(w_all).alias("na"),
        F.sum("nb_v").over(w_all).alias("nb"),
    )
    a = c.agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.max(
            F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
        ).alias("dmax"),
    )
    na, nb = F.col("na"), F.col("nb")
    d = a.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        (F.col("dmax").cast("double") / (na * nb)).alias("ks_d"),
        (
            F.sqrt(na.cast("double") * nb / (na + nb))
            * (F.col("dmax").cast("double") / (na * nb))
        ).alias("ks_scaled"),
    )
    return d


@register(
    "events_ab_cuped",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
      % 2 AS INT) AS variant,
    CAST(SUM(CASE WHEN event_type = 'purchase'
          AND ts < TIMESTAMP '2024-01-15 00:00:00'
        THEN CAST(value AS DECIMAL(38,2)) ELSE CAST(0 AS DECIMAL(38,2))
        END) AS DECIMAL(38,2)) AS x,
    CAST(SUM(CASE WHEN event_type = 'purchase'
          AND ts >= TIMESTAMP '2024-01-15 00:00:00'
        THEN CAST(value AS DECIMAL(38,2)) ELSE CAST(0 AS DECIMAL(38,2))
        END) AS DECIMAL(38,2)) AS y
  FROM events GROUP BY user_id
),
s AS (
  SELECT COUNT(*) AS n,
    SUM(CAST(x AS DECIMAL(38,6))) AS sx,
    SUM(CAST(y AS DECIMAL(38,6))) AS sy,
    SUM(CAST(x * x AS DECIMAL(38,6))) AS sxx,
    SUM(CAST(y * y AS DECIMAL(38,6))) AS syy,
    SUM(CAST(x * y AS DECIMAL(38,6))) AS sxy,
    SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
    SUM(CASE WHEN variant = 0 THEN CAST(x AS DECIMAL(38,6))
        ELSE CAST(0 AS DECIMAL(38,6)) END) AS sx_a,
    SUM(CASE WHEN variant = 0 THEN CAST(y AS DECIMAL(38,6))
        ELSE CAST(0 AS DECIMAL(38,6)) END) AS sy_a,
    SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
    SUM(CASE WHEN variant = 1 THEN CAST(x AS DECIMAL(38,6))
        ELSE CAST(0 AS DECIMAL(38,6)) END) AS sx_b,
    SUM(CASE WHEN variant = 1 THEN CAST(y AS DECIMAL(38,6))
        ELSE CAST(0 AS DECIMAL(38,6)) END) AS sy_b
  FROM per_user
),
d AS (
  SELECT CAST(n AS BIGINT) AS n_users,
    CAST({sql_exact_cov_num("sx", "sy", "sxy", "n", 6, None, 6)} AS DOUBLE)
      AS covn,
    CAST({sql_exact_cov_num("sx", "sx", "sxx", "n", 6, None, 6)} AS DOUBLE)
      AS varxn,
    CAST({sql_exact_cov_num("sy", "sy", "syy", "n", 6, None, 6)} AS DOUBLE)
      AS varyn,
    CAST(sy_b AS DOUBLE) / n_b - CAST(sy_a AS DOUBLE) / n_a
      AS delta_raw,
    CAST(sx_b AS DOUBLE) / n_b - CAST(sx_a AS DOUBLE) / n_a
      AS delta_x
  FROM s
)
SELECT n_users,
  ROUND(covn / varxn, 9) AS theta,
  ROUND(covn * covn / (varxn * varyn), 9) AS var_reduction,
  ROUND(delta_raw, 6) AS delta_raw,
  ROUND(delta_raw - covn / varxn * delta_x, 6) AS delta_cuped
FROM d
""",
    doc="CUPED variance reduction (Deng et al., WSDM'13 — the "
    "standard experimentation-platform adjustment): per-user PRE-"
    "period purchase spend (Jan 1-14) is the covariate X, POST-period "
    "spend (Jan 15-30) the metric Y; theta = cov(X,Y)/var(X) from "
    "exact DECIMAL-folded sums (2-decimal money — the fold is exact; "
    "one grouped pass to user grain, one 1-row epilogue), the "
    "adjusted treatment effect delta_cuped = delta_raw - theta * "
    "delta_X, and var_reduction = rho^2 (the fraction of metric "
    "variance the covariate removes).  All engine divergence risk "
    "sits in 6 scalar double ops on identical exact inputs.  At "
    "100 TB this is one fact scan + constants — CUPED is free at any "
    "scale, which is why every platform runs it.",
    tags=("events", "abtest", "statistics", "cuped", "extension"),
    extended=False,  # promoted to the gate round 9 (registry._EXTENDED rationale)
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    dec0 = F.lit(0).cast("decimal(38,2)")
    x = F.sum(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") < cut),
            F.col("value").cast("decimal(38,2)"),
        ).otherwise(dec0)
    ).cast("decimal(38,2)")
    y = F.sum(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= cut),
            F.col("value").cast("decimal(38,2)"),
        ).otherwise(dec0)
    ).cast("decimal(38,2)")
    per_user = ev.groupBy("user_id").agg(
        x.alias("x"), y.alias("y")
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).cast("int").alias("variant"),
        "x",
        "y",
    )
    dec6 = lambda c: c.cast("decimal(38,6)")
    z6 = F.lit(0).cast("decimal(38,6)")
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec6(F.col("x"))).alias("sx"),
        F.sum(dec6(F.col("y"))).alias("sy"),
        F.sum(dec6(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec6(F.col("y") * F.col("y"))).alias("syy"),
        F.sum(dec6(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(
            F.when(F.col("variant") == 0, dec6(F.col("x"))).otherwise(z6)
        ).alias("sx_a"),
        F.sum(
            F.when(F.col("variant") == 0, dec6(F.col("y"))).otherwise(z6)
        ).alias("sy_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("variant") == 1, dec6(F.col("x"))).otherwise(z6)
        ).alias("sx_b"),
        F.sum(
            F.when(F.col("variant") == 1, dec6(F.col("y"))).otherwise(z6)
        ).alias("sy_b"),
    )
    n = F.col("n")
    # theta / rho^2 are RATIOS of second-moment folds, so the exact
    # DECIMAL numerators (functions/stats.py exact_cov_num — the
    # round-11 "What's wrong #2" fix) divide directly: the common
    # n*1e12 scale cancels and the one rounding left is the ratio
    covn = exact_cov_num(
        F.col("sx"), F.col("sy"), F.col("sxy"), n, frac_digits=6,
        frac_xy=6,  # products quantized at (38,6) when folded
    ).cast("double")
    varxn = exact_cov_num(
        F.col("sx"), F.col("sx"), F.col("sxx"), n, frac_digits=6,
        frac_xy=6,
    ).cast("double")
    varyn = exact_cov_num(
        F.col("sy"), F.col("sy"), F.col("syy"), n, frac_digits=6,
        frac_xy=6,
    ).cast("double")
    delta_raw = F.col("sy_b").cast("double") / F.col("n_b") - F.col(
        "sy_a"
    ).cast("double") / F.col("n_a")
    delta_x = F.col("sx_b").cast("double") / F.col("n_b") - F.col(
        "sx_a"
    ).cast("double") / F.col("n_a")
    return s.select(
        n.cast("long").alias("n_users"),
        F.round(covn / varxn, 9).alias("theta"),
        F.round(covn * covn / (varxn * varyn), 9).alias("var_reduction"),
        F.round(delta_raw, 6).alias("delta_raw"),
        F.round(delta_raw - covn / varxn * delta_x, 6).alias(
            "delta_cuped"
        ),
    )


@register(
    "events_psi_drift",
    oracle="""
WITH s AS (
  SELECT CAST(least(floor(value / 25.0), 19) AS INT) AS bin,
    user_id % 2 AS side
  FROM events WHERE event_type = 'purchase' AND value >= 0
),
b AS (
  SELECT bin,
    SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS a,
    SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS e
  FROM s GROUP BY bin
),
t AS (
  SELECT bin, a, e,
    SUM(a) OVER () AS at, SUM(e) OVER () AS et
  FROM b
),
w AS (
  SELECT bin, a, e,
    CASE WHEN a > 0 AND e > 0 THEN
      CAST(ROUND((CAST(a AS DOUBLE) / at - CAST(e AS DOUBLE) / et)
        * ROUND(LN(CAST(a * et AS DOUBLE) / (e * at)), 9), 12)
        AS DECIMAL(28,12))
    ELSE CAST(0 AS DECIMAL(28,12)) END AS term,
    CASE WHEN a = 0 OR e = 0 THEN 1 ELSE 0 END AS degenerate
  FROM t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
  CAST(SUM(degenerate) AS BIGINT) AS n_degenerate_bins,
  CAST(SUM(term) AS DOUBLE) AS psi
FROM w
""",
    doc="Population-stability index between the two deterministic "
    "population halves of purchase values (the ln-based drift score "
    "events_value_drift deliberately avoided before the repo's "
    "9-decimal ln quantization precedent existed): per 20-bin "
    "equi-width cell, PSI_b = (p_b - q_b) * ln(p_b/q_b) with the ln "
    "evaluated on ONE exact-integer cross-ratio (a*et)/(e*at), terms "
    "12dp-quantized and DECIMAL-folded so the bin sum is order-"
    "independent; one-sided-empty bins are COUNTED as degenerate and "
    "contribute 0 (the auditable guard — silent epsilon-smoothing "
    "changes the score).  PSI > 0.25 is the standard retrain alarm.  "
    "Scale: two map-side-combined histogram passes onto <= 20 rows.",
    tags=("events", "drift", "psi", "extension"),
    extended=False,  # gate (round-10 rotation)
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    s = ev.where(
        (F.col("event_type") == "purchase") & (F.col("value") >= 0)
    ).select(
        F.least(F.floor(F.col("value") / 25.0), F.lit(19))
        .cast("int")
        .alias("bin"),
        (F.col("user_id") % 2).alias("side"),
    )
    b = s.groupBy("bin").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("e"),
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = b.select(
        "bin", "a", "e",
        F.sum("a").over(w_all).alias("at"),
        F.sum("e").over(w_all).alias("et"),
    )
    term = F.when(
        (F.col("a") > 0) & (F.col("e") > 0),
        F.round(
            (
                F.col("a").cast("double") / F.col("at")
                - F.col("e").cast("double") / F.col("et")
            )
            * F.round(
                F.log(
                    (F.col("a") * F.col("et")).cast("double")
                    / (F.col("e") * F.col("at"))
                ),
                9,
            ),
            12,
        ).cast("decimal(28,12)"),
    ).otherwise(F.lit(0).cast("decimal(28,12)"))
    degen = F.when(
        (F.col("a") == 0) | (F.col("e") == 0), 1
    ).otherwise(0)
    return t.select(term.alias("term"), degen.alias("degenerate")).agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("degenerate").cast("long").alias("n_degenerate_bins"),
        F.sum("term").cast("double").alias("psi"),
    )


@register(
    "events_time_weighted_avg",
    oracle="""
WITH seg AS (
  SELECT user_id, value,
    CAST(epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts,
        event_id) - ts) AS BIGINT) AS dur_us
  FROM events WHERE event_type = 'purchase'
),
agg AS (
  SELECT user_id,
    SUM(CASE WHEN dur_us IS NOT NULL
        THEN CAST(value * dur_us AS DECIMAL(38,2))
        ELSE CAST(0 AS DECIMAL(38,2)) END) AS wsum,
    SUM(CASE WHEN dur_us IS NOT NULL THEN dur_us ELSE 0 END) AS tot_us,
    COUNT(*) AS n_events
  FROM seg GROUP BY user_id
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
  CAST(tot_us AS BIGINT) AS span_us,
  ROUND(CAST(wsum AS DOUBLE) / tot_us, 9) AS twa_value
FROM agg WHERE tot_us > 0
ORDER BY user_id
""",
    doc="Time-weighted average purchase value per user — the "
    "IoT/finance aggregate where each observation holds until the "
    "next one (step interpolation): segment durations come from "
    "LEAD(ts) per user in event order (deterministic event_id "
    "tie-break), weights are EXACT integer microseconds, the "
    "value x duration products fold through DECIMAL(38,2) — exact "
    "while value_cents x gap_micros < 2^53 (~100 days at the value "
    "ceiling; longer gaps would need the duration split into "
    "seconds + remainder first), identical-double cross-engine "
    "regardless — and the last open-ended "
    "observation is excluded (standard TWA convention, stated rather "
    "than fudged).  One window pass + one grouped pass; at 100 TB "
    "both key on user_id — a single shuffle.",
    tags=("events", "temporal", "twa", "extension"),
    extended=True,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w))
            - F.unix_micros(F.col("ts"))
        ).alias("dur_us"),
    )
    agg = seg.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("dur_us").isNotNull(),
                (F.col("value") * F.col("dur_us")).cast("decimal(38,2)"),
            ).otherwise(F.lit(0).cast("decimal(38,2)"))
        ).alias("wsum"),
        F.sum(
            F.when(F.col("dur_us").isNotNull(), F.col("dur_us")).otherwise(
                0
            )
        ).alias("tot_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        agg.where(F.col("tot_us") > 0)
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("tot_us").cast("long").alias("span_us"),
            F.round(
                F.col("wsum").cast("double") / F.col("tot_us"), 9
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_eb_shrunken_rates",
    oracle="""
WITH per_user AS (
  SELECT user_id,
    CAST(user_id % 24 AS INT) AS cohort,
    MAX(CASE WHEN event_type = 'purchase' AND value >= 150
        THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
g AS (
  SELECT cohort, COUNT(*) AS n, SUM(conv) AS k FROM per_user
  GROUP BY cohort
),
r AS (
  SELECT cohort, n, k,
    CAST(ROUND(CAST(k AS DOUBLE) / n, 9) AS DECIMAL(10,9)) AS rate
  FROM g
),
m AS (
  SELECT COUNT(*) AS c,
    CAST(SUM(rate) AS DOUBLE) AS sr,
    CAST(SUM(rate * rate) AS DOUBLE) AS srr
  FROM r
),
ab AS (
  SELECT
    (sr / c) AS mu,
    (srr - sr * sr / c) / (c - 1) AS v
  FROM m
),
p AS (
  SELECT mu, v,
    CASE WHEN v > 0 AND mu * (1 - mu) > v
      THEN mu * (mu * (1 - mu) / v - 1) ELSE CAST(1 AS DOUBLE) END
      AS alpha,
    CASE WHEN v > 0 AND mu * (1 - mu) > v
      THEN (1 - mu) * (mu * (1 - mu) / v - 1) ELSE CAST(1 AS DOUBLE) END
      AS beta
  FROM ab
)
SELECT r.cohort, CAST(r.n AS BIGINT) AS n_users,
  CAST(r.k AS BIGINT) AS n_conv,
  CAST(r.rate AS DOUBLE) AS raw_rate,
  ROUND((r.k + p.alpha) / (r.n + p.alpha + p.beta), 9)
    AS shrunken_rate
FROM r, p
ORDER BY r.cohort
""",
    doc="Empirical-Bayes (beta-binomial) shrinkage of per-cohort "
    "conversion rates — the method-of-moments James-Stein treatment "
    "that stops a 2/3 cohort outranking 180/500 (the prior pulls "
    "small-n cohorts toward the grand mean; the Wilson query is the "
    "confidence-bound alternative, this is the posterior-mean one): "
    "cohort rates quantize to 9 decimals and fold through DECIMAL so "
    "the across-cohort moment sums are order-independent; alpha/beta "
    "come from mu*(mu(1-mu)/v - 1) with a stated uniform-prior "
    "fallback when the moment estimate degenerates; the posterior "
    "mean (k+alpha)/(n+alpha+beta) is pinned IEEE arithmetic.  "
    "Scale: one user-grain pass, one O(cohorts) epilogue.",
    tags=("events", "abtest", "empirical-bayes", "extension"),
    extended=True,
)
def events_eb_shrunken_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select(
        (F.col("user_id") % 24).cast("int").alias("cohort"), "conv"
    )
    g = per_user.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")
    )
    r = g.withColumn(
        "rate",
        F.round(F.col("k").cast("double") / F.col("n"), 9).cast(
            "decimal(10,9)"
        ),
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r2 = r.select(
        "cohort", "n", "k", "rate",
        F.count(F.lit(1)).over(w_all).alias("c"),
        F.sum("rate").over(w_all).cast("double").alias("sr"),
        F.sum(F.col("rate") * F.col("rate"))
        .over(w_all)
        .cast("double")
        .alias("srr"),
    )
    mu = F.col("sr") / F.col("c")
    v = (F.col("srr") - F.col("sr") * F.col("sr") / F.col("c")) / (
        F.col("c") - 1
    )
    ok = (v > 0) & (mu * (1 - mu) > v)
    alpha = F.when(ok, mu * (mu * (1 - mu) / v - 1)).otherwise(
        F.lit(1.0)
    )
    beta = F.when(ok, (1 - mu) * (mu * (1 - mu) / v - 1)).otherwise(
        F.lit(1.0)
    )
    return r2.select(
        "cohort",
        F.col("n").cast("long").alias("n_users"),
        F.col("k").cast("long").alias("n_conv"),
        F.col("rate").cast("double").alias("raw_rate"),
        F.round(
            (F.col("k") + alpha) / (F.col("n") + alpha + beta), 9
        ).alias("shrunken_rate"),
    ).orderBy("cohort")


@register(
    "events_ab_diff_in_diff",
    oracle="""
WITH per_user AS (
  SELECT user_id,
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
      % 2 AS INT) AS variant,
    CAST(SUM(CASE WHEN event_type = 'purchase'
          AND ts < TIMESTAMP '2024-01-15 00:00:00'
        THEN CAST(value AS DECIMAL(38,2)) ELSE CAST(0 AS DECIMAL(38,2))
        END) AS DECIMAL(38,2)) AS pre,
    CAST(SUM(CASE WHEN event_type = 'purchase'
          AND ts >= TIMESTAMP '2024-01-15 00:00:00'
        THEN CAST(value AS DECIMAL(38,2)) ELSE CAST(0 AS DECIMAL(38,2))
        END) AS DECIMAL(38,2)) AS post
  FROM events GROUP BY user_id
),
g AS (
  SELECT variant, COUNT(*) AS n,
    SUM(CAST(pre AS DECIMAL(38,6))) AS sp,
    SUM(CAST(post AS DECIMAL(38,6))) AS sq
  FROM per_user GROUP BY variant
),
w AS (
  SELECT
    MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
    MAX(CASE WHEN variant = 0 THEN CAST(sp AS DOUBLE) END) AS sp_a,
    MAX(CASE WHEN variant = 0 THEN CAST(sq AS DOUBLE) END) AS sq_a,
    MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
    MAX(CASE WHEN variant = 1 THEN CAST(sp AS DOUBLE) END) AS sp_b,
    MAX(CASE WHEN variant = 1 THEN CAST(sq AS DOUBLE) END) AS sq_b
  FROM g
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  ROUND(sq_a / n_a - sp_a / n_a, 6) AS delta_a,
  ROUND(sq_b / n_b - sp_b / n_b, 6) AS delta_b,
  ROUND((sq_b / n_b - sp_b / n_b) - (sq_a / n_a - sp_a / n_a), 6)
    AS did_estimate
FROM w
""",
    doc="Difference-in-differences treatment-effect estimate: per-"
    "variant pre/post per-user spend means from exact DECIMAL folds, "
    "DiD = (post_B - pre_B) - (post_A - pre_A) — the parallel-trends "
    "causal estimator that removes any level difference between the "
    "hash-bucketed groups (the additive-bias companion to CUPED's "
    "variance reduction; same sufficient statistics, different "
    "identification assumption).  One user-grain pass + a 2-row "
    "epilogue; pinned division order.",
    tags=("events", "abtest", "causal", "extension"),
    extended=True,
)
def events_ab_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    dec0 = F.lit(0).cast("decimal(38,2)")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") < cut),
                F.col("value").cast("decimal(38,2)"),
            ).otherwise(dec0)
        ).cast("decimal(38,2)").alias("pre"),
        F.sum(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= cut),
                F.col("value").cast("decimal(38,2)"),
            ).otherwise(dec0)
        ).cast("decimal(38,2)").alias("post"),
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).cast("int").alias("variant"),
        "pre",
        "post",
    )
    g = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("pre").cast("decimal(38,6)")).alias("sp"),
        F.sum(F.col("post").cast("decimal(38,6)")).alias("sq"),
    )
    w = g.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(
            F.when(F.col("variant") == 0, F.col("sp").cast("double"))
        ).alias("sp_a"),
        F.max(
            F.when(F.col("variant") == 0, F.col("sq").cast("double"))
        ).alias("sq_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(
            F.when(F.col("variant") == 1, F.col("sp").cast("double"))
        ).alias("sp_b"),
        F.max(
            F.when(F.col("variant") == 1, F.col("sq").cast("double"))
        ).alias("sq_b"),
    )
    da = F.col("sq_a") / F.col("n_a") - F.col("sp_a") / F.col("n_a")
    db = F.col("sq_b") / F.col("n_b") - F.col("sp_b") / F.col("n_b")
    return w.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(da, 6).alias("delta_a"),
        F.round(db, 6).alias("delta_b"),
        F.round(db - da, 6).alias("did_estimate"),
    )


@register(
    "events_ab_power_mde",
    oracle="""
WITH users AS (
  SELECT user_id,
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
      % 2 AS INT) AS variant,
    MAX(CASE WHEN event_type = 'purchase' AND value >= 150
        THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
v AS (
  SELECT COUNT(*) AS n, SUM(conv) AS c FROM users
)
SELECT CAST(n AS BIGINT) AS n_users,
  ROUND(CAST(c AS DOUBLE) / n, 9) AS base_rate,
  ROUND((CAST(1.959963985 AS DOUBLE) + CAST(0.841621234 AS DOUBLE))
    * SQRT(CAST(2 AS DOUBLE) * (CAST(c AS DOUBLE) / n)
           * (CAST(1 AS DOUBLE) - CAST(c AS DOUBLE) / n)
           / (CAST(n AS DOUBLE) / 2)), 9) AS mde_abs,
  ROUND((CAST(1.959963985 AS DOUBLE) + CAST(0.841621234 AS DOUBLE))
    * SQRT(CAST(2 AS DOUBLE) * (CAST(c AS DOUBLE) / n)
           * (CAST(1 AS DOUBLE) - CAST(c AS DOUBLE) / n)
           / (CAST(n AS DOUBLE) / 2))
    / (CAST(c AS DOUBLE) / n), 9) AS mde_rel
FROM v
""",
    doc="Experiment power analysis: the minimum detectable effect at "
    "alpha=0.05 (two-sided) and 80% power for the current user count "
    "and base conversion rate — MDE = (z_0.975 + z_0.8) * "
    "sqrt(2 p (1-p) / (n/2)), with the two z quantiles as PINNED "
    "9-decimal literals (1.959963985, 0.841621234 — constants, not "
    "libm calls, same rationale as the Wilson query's 1.96).  The "
    "planning readout every experimentation platform shows next to "
    "a result: an uplift below mde_rel was never detectable at this "
    "n, so a null readout is uninformative rather than negative.  "
    "One user-grain pass + a 1-row epilogue.",
    tags=("events", "abtest", "power", "extension"),
    extended=True,
)
def events_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    )
    v = users.agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    n, c = F.col("n"), F.col("c")
    p = c.cast("double") / n
    z = F.lit(1.959963985) + F.lit(0.841621234)
    mde = z * F.sqrt(
        F.lit(2.0) * p * (F.lit(1.0) - p) / (n.cast("double") / 2)
    )
    return v.select(
        n.cast("long").alias("n_users"),
        F.round(p, 9).alias("base_rate"),
        F.round(mde, 9).alias("mde_abs"),
        F.round(mde / p, 9).alias("mde_rel"),
    )


_RAND_B = 128


@register(
    "events_ab_randomization_test",
    oracle=f"""
WITH users AS (
  SELECT user_id,
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
      % 2 AS INT) AS variant,
    MAX(CASE WHEN event_type = 'purchase' AND value >= 150
        THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
obs AS (
  SELECT
    SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS c_b,
    SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
    SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS c_a,
    SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a
  FROM users
),
rep AS (
  SELECT u.conv, b.b AS b,
    CAST(('0x' || substr(md5('perm#' || CAST(u.user_id AS VARCHAR)
      || '#' || CAST(b.b AS VARCHAR)), 1, 8))::BIGINT % 2 AS INT)
      AS relabel
  FROM users u,
    (SELECT UNNEST(generate_series(0, {_RAND_B - 1})) AS b) b
),
perm AS (
  SELECT b,
    SUM(CASE WHEN relabel = 1 THEN conv ELSE 0 END) AS c1,
    SUM(CASE WHEN relabel = 1 THEN 1 ELSE 0 END) AS n1,
    SUM(CASE WHEN relabel = 0 THEN conv ELSE 0 END) AS c0,
    SUM(CASE WHEN relabel = 0 THEN 1 ELSE 0 END) AS n0
  FROM rep GROUP BY b
),
cmp AS (
  SELECT p.b,
    CASE WHEN n1 = 0 OR n0 = 0 THEN 1
      WHEN ABS(CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
        >= ABS(CAST(o.c_b AS DOUBLE) / o.n_b
               - CAST(o.c_a AS DOUBLE) / o.n_a)
      THEN 1 ELSE 0 END AS extreme
  FROM perm p, obs o
)
SELECT (SELECT CAST(n_a AS BIGINT) FROM obs) AS n_a,
  (SELECT CAST(n_b AS BIGINT) FROM obs) AS n_b,
  ROUND((SELECT CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a
    FROM obs), 9) AS observed_diff,
  CAST(SUM(extreme) AS BIGINT) AS n_extreme,
  ROUND(CAST(1 + SUM(extreme) AS DOUBLE) / ({_RAND_B} + 1), 9)
    AS p_value
FROM cmp
""",
    doc=f"Randomization (permutation-style) test of the A/B "
    f"conversion difference: {_RAND_B} deterministic RE-LABELINGS of "
    "the user-grain table (relabel = md5('perm#'||user||'#'||b) % 2 "
    "— the seeded-replicate pattern shared with the Poisson "
    "bootstrap), each replicate's rate difference compared to the "
    "observed one, p = (1 + #extreme)/(B+1) — the add-one form that "
    "keeps the test exact-level.  Everything is exact integers until "
    "per-replicate rate divisions of identical operands; no "
    "distributional assumption, the model-free cross-check of "
    "events_ab_experiment's z test.  Scale: the corpus collapses to "
    "user grain in ONE pass; the B-fold fan-out runs on the USER "
    "table (users x B rows, map-side combined to B rows) — never on "
    "raw events.",
    tags=("events", "abtest", "randomization", "extension"),
    extended=False,  # gate (round-10 rotation)
)
def events_ab_randomization_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select(
        "user_id",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).cast("int").alias("variant"),
        "conv",
    )
    obs = users.agg(
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0))
        .alias("c_b"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0))
        .alias("c_a"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
    )
    rep = users.select(
        "user_id",
        "conv",
        F.explode(F.sequence(F.lit(0), F.lit(_RAND_B - 1))).alias("b"),
    ).select(
        "conv",
        "b",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("perm#"),
                            F.col("user_id").cast("string"),
                            F.lit("#"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).cast("int").alias("relabel"),
    )
    perm = rep.groupBy("b").agg(
        F.sum(F.when(F.col("relabel") == 1, F.col("conv")).otherwise(0))
        .alias("c1"),
        F.sum(F.when(F.col("relabel") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("relabel") == 0, F.col("conv")).otherwise(0))
        .alias("c0"),
        F.sum(F.when(F.col("relabel") == 0, 1).otherwise(0)).alias("n0"),
    )
    j = perm.crossJoin(F.broadcast(obs))
    obs_diff = F.col("c_b").cast("double") / F.col("n_b") - F.col(
        "c_a"
    ).cast("double") / F.col("n_a")
    extreme = F.when(
        (F.col("n1") == 0) | (F.col("n0") == 0), F.lit(1)
    ).otherwise(
        F.when(
            F.abs(
                F.col("c1").cast("double") / F.col("n1")
                - F.col("c0").cast("double") / F.col("n0")
            )
            >= F.abs(obs_diff),
            1,
        ).otherwise(0)
    )
    agg = j.select(
        extreme.alias("extreme"),
        F.col("n_a"), F.col("n_b"),
        obs_diff.alias("od"),
    ).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max("od").alias("od"),
        F.sum("extreme").alias("n_extreme"),
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.col("od"), 9).alias("observed_diff"),
        F.col("n_extreme").cast("long").alias("n_extreme"),
        F.round(
            (1 + F.col("n_extreme")).cast("double") / (_RAND_B + 1), 9
        ).alias("p_value"),
    )


# -- MAD robust outliers (round 10) --------------------------------------------


def _mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    wg = Window.partitionBy("event_type")
    w1 = wg.orderBy("value", "event_id")
    r1 = ev.select(
        "event_type",
        "value",
        F.row_number().over(w1).alias("rk"),
        F.count(F.lit(1)).over(wg).alias("n"),
    )
    mid = (F.col("n") + 1).cast("double") / 2
    med = (
        r1.withColumn("m1", F.floor(mid).cast("long"))
        .withColumn("m2", F.ceil(mid).cast("long"))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            (
                (
                    F.max(F.when(F.col("rk") == F.col("m1"), F.col("value")))
                    + F.max(F.when(F.col("rk") == F.col("m2"), F.col("value")))
                )
                / 2
            ).alias("med"),
        )
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "value",
        "n",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    w2 = wg.orderBy("dev", "event_id")
    r2 = dev.select(
        "event_type", "value", "n", "med", "dev",
        F.row_number().over(w2).alias("rk"),
    )
    mad = (
        r2.withColumn("m1", F.floor(mid).cast("long"))
        .withColumn("m2", F.ceil(mid).cast("long"))
        .groupBy("event_type")
        .agg(
            (
                (
                    F.max(F.when(F.col("rk") == F.col("m1"), F.col("dev")))
                    + F.max(F.when(F.col("rk") == F.col("m2"), F.col("dev")))
                )
                / 2
            ).alias("mad"),
        )
    )
    flagged = dev.join(F.broadcast(mad), "event_type").select(
        "event_type", "n", "med", "mad",
        F.when(
            F.col("dev") > F.lit(3.0) * F.lit(1.4826) * F.col("mad"), 1
        ).otherwise(0).alias("is_out"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.round(F.max("med"), 9).alias("median_value"),
            F.round(F.max("mad"), 9).alias("mad"),
            F.sum("is_out").cast("long").alias("n_outliers"),
            F.round(
                F.sum("is_out").cast("double") / F.max("n"), 9
            ).alias("outlier_share"),
        )
        .orderBy("event_type")
    )


register(
    "events_mad_outliers",
    oracle="""
WITH r1 AS (
  SELECT event_type, event_id, value,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY value, event_id) AS rk,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type, MAX(n) AS n,
    (MAX(CASE WHEN rk = CAST(floor(CAST(n + 1 AS DOUBLE) / 2) AS BIGINT)
              THEN value END)
   + MAX(CASE WHEN rk = CAST(ceil(CAST(n + 1 AS DOUBLE) / 2) AS BIGINT)
              THEN value END)) / 2 AS med
  FROM r1 GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.event_id, e.value, m.n, m.med,
    ABS(e.value - m.med) AS dev
  FROM events e JOIN med m ON e.event_type = m.event_type
),
r2 AS (
  SELECT event_type, n, med, dev,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY dev, event_id) AS rk
  FROM dev
),
mad AS (
  SELECT event_type,
    (MAX(CASE WHEN rk = CAST(floor(CAST(n + 1 AS DOUBLE) / 2) AS BIGINT)
              THEN dev END)
   + MAX(CASE WHEN rk = CAST(ceil(CAST(n + 1 AS DOUBLE) / 2) AS BIGINT)
              THEN dev END)) / 2 AS mad
  FROM r2 GROUP BY event_type
)
SELECT d.event_type,
  CAST(MAX(d.n) AS BIGINT) AS n_events,
  ROUND(MAX(d.med), 9) AS median_value,
  ROUND(MAX(a.mad), 9) AS mad,
  CAST(SUM(CASE WHEN d.dev > CAST(3.0 AS DOUBLE)
                             * CAST(1.4826 AS DOUBLE) * a.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  ROUND(CAST(SUM(CASE WHEN d.dev > CAST(3.0 AS DOUBLE)
                                   * CAST(1.4826 AS DOUBLE) * a.mad
                      THEN 1 ELSE 0 END) AS DOUBLE) / MAX(d.n), 9)
    AS outlier_share
FROM dev d JOIN mad a ON d.event_type = a.event_type
GROUP BY d.event_type
ORDER BY d.event_type
""",
    doc="Robust per-segment outlier detection via MEDIAN ABSOLUTE "
    "DEVIATION: per event_type the exact median (averaged order "
    "statistics under a deterministic (value, id) sort), the exact "
    "MAD (median of absolute deviations, same machinery), and the "
    "count/share of events beyond 3 x 1.4826 x MAD — the robust "
    "z-score rule that, unlike mean/stddev fences, a few extreme "
    "values cannot drag (the consistency constant 1.4826 scales MAD "
    "to sigma under normality).  All comparisons are IEEE doubles "
    "computed in pinned identical order on both engines; medians are "
    "exact order statistics, never percentile_approx.  Fixture form "
    "sorts within each segment (few segments, window per group); the "
    "100 TB twin fetches the two order statistics per group with the "
    "iterative exact-selection operator (the "
    "stats_median_ci_orderstats precedent) — no per-group global "
    "sort, no skewed single partition.",
    tags=("statistics", "robust", "outliers", "extension"),
    extended=True,
)(_mad_outliers)


# -- linear interpolation of a sparse series (round 10) -------------------------


def _linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.operators.timeseries import linear_interpolate

    ev = load_table(spark, sf_dir, "events")
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    st = linear_interpolate(
        ev.select("user_id", "ts", "event_id", sparse.alias("sparse")),
        key_cols=["user_id"],
        ts_col="ts",
        order_cols=["ts", "event_id"],
        value="sparse",
        out_name="interp",
    )
    filled = F.col("sparse").isNull() & F.col("interp").isNotNull()
    return (
        st.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(filled.cast("int")).cast("long").alias("n_interpolated"),
            F.sum(
                (F.col("interp").isNull()).cast("int")
            ).cast("long").alias("n_edge_unfilled"),
            F.sum(
                F.when(
                    filled,
                    F.round(F.col("interp"), 9).cast("decimal(28,9)"),
                )
            ).cast("double").alias("interp_value_sum"),
        )
        .orderBy("user_id")
    )


register(
    "events_linear_interpolate",
    oracle="""
WITH base AS (
  SELECT user_id, ts, event_id,
    CASE WHEN event_type = 'purchase' THEN value END AS sparse
  FROM events
),
st AS (
  SELECT user_id, sparse,
    epoch_us(ts) AS tus,
    last_value(sparse IGNORE NULLS) OVER w_fwd AS prev_v,
    last_value(CASE WHEN sparse IS NOT NULL THEN epoch_us(ts) END
               IGNORE NULLS) OVER w_fwd AS prev_t,
    first_value(sparse IGNORE NULLS) OVER w_bwd AS next_v,
    first_value(CASE WHEN sparse IS NOT NULL THEN epoch_us(ts) END
                IGNORE NULLS) OVER w_bwd AS next_t
  FROM base
  WINDOW
    w_fwd AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_bwd AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
it AS (
  SELECT user_id, sparse,
    CASE WHEN sparse IS NOT NULL THEN CAST(sparse AS DOUBLE)
         WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
           CAST(prev_v AS DOUBLE)
           + (CAST(next_v AS DOUBLE) - CAST(prev_v AS DOUBLE))
             * (CASE WHEN next_t > prev_t
                     THEN CAST(tus - prev_t AS DOUBLE)
                          / CAST(next_t - prev_t AS DOUBLE)
                     ELSE CAST(0.0 AS DOUBLE) END)
    END AS interp
  FROM st
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CASE WHEN sparse IS NULL AND interp IS NOT NULL
           THEN 1 ELSE 0 END) AS BIGINT) AS n_interpolated,
  CAST(SUM(CASE WHEN interp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_edge_unfilled,
  CAST(SUM(CASE WHEN sparse IS NULL AND interp IS NOT NULL
           THEN CAST(ROUND(interp, 9) AS DECIMAL(28,9)) END) AS DOUBLE)
    AS interp_value_sum
FROM it GROUP BY user_id ORDER BY user_id
""",
    doc="Time-weighted LINEAR interpolation of the sparse purchase "
    "price onto every intermediate event "
    "(operators/timeseries.py:linear_interpolate): v_prev + "
    "(v_next - v_prev) * (t - t_prev)/(t_next - t_prev), neighbours "
    "found with one forward and one backward running ignore-nulls "
    "window over the SAME (user, ts, id) sort — one exchange, one "
    "sort, no self-join, no per-gap lookup (the events_locf_fill "
    "contract extended with the backward pass).  Edges stay NULL "
    "(no extrapolation).  Time fractions divide BIGINT epoch-micro "
    "differences in pinned IEEE order; interpolated values are "
    "9dp-quantized then DECIMAL-folded so the per-user sum is "
    "order-independent and engine-exact.",
    tags=("events", "timeseries", "window", "extension"),
    extended=True,
)(_linear_interp)


# -- exact 1-D Wasserstein distance (round 10) ----------------------------------


def _wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    tagged = ev.select(
        F.col("value").cast("decimal(18,6)").alias("x"),
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("a"),
        F.when(F.col("event_id") % 2 == 1, 1).otherwise(0).alias("b"),
    )
    # one row per distinct value with per-sample counts: the merged
    # support, O(distinct values) after the aggregate
    pts = tagged.groupBy("x").agg(
        F.sum("a").alias("ca"), F.sum("b").alias("cb")
    )
    w = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wl = Window.orderBy("x")
    cum = pts.select(
        "x",
        F.sum("ca").over(w).alias("fa"),
        F.sum("cb").over(w).alias("fb"),
        F.lead("x").over(wl).alias("x_next"),
    )
    tot = tagged.agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    # integral of |F_a - F_b| dx over the merged support, kept EXACT
    # until one final division: |fa*nb - fb*na| is an exact BIGINT,
    # (x_next - x) an exact DECIMAL gap, their product DECIMAL-folds
    seg = cum.crossJoin(F.broadcast(tot)).select(
        (
            F.abs(
                F.col("fa") * F.col("nb") - F.col("fb") * F.col("na")
            ).cast("decimal(20,0)")
            * (F.col("x_next") - F.col("x"))
        ).alias("area"),
        "na",
        "nb",
    )
    return seg.agg(
        F.max("na").cast("long").alias("n_ref"),
        F.max("nb").cast("long").alias("n_cur"),
        F.round(
            F.sum("area").cast("double")
            / (F.max("na") * F.max("nb")).cast("double"),
            9,
        ).alias("wasserstein_1"),
    )


register(
    "events_wasserstein_drift",
    oracle="""
WITH tagged AS (
  SELECT CAST(value AS DECIMAL(18,6)) AS x,
    CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS a,
    CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS b
  FROM events WHERE value IS NOT NULL
),
pts AS (
  SELECT x, SUM(a) AS ca, SUM(b) AS cb FROM tagged GROUP BY x
),
cum AS (
  SELECT x,
    SUM(ca) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS fa,
    SUM(cb) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS fb,
    LEAD(x) OVER (ORDER BY x) AS x_next
  FROM pts
),
tot AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM tagged),
seg AS (
  SELECT CAST(ABS(fa * nb - fb * na) AS DECIMAL(20,0))
           * (x_next - x) AS area,
         na, nb
  FROM cum CROSS JOIN tot
)
SELECT CAST(MAX(na) AS BIGINT) AS n_ref,
  CAST(MAX(nb) AS BIGINT) AS n_cur,
  ROUND(CAST(SUM(area) AS DOUBLE)
        / CAST(MAX(na) * MAX(nb) AS DOUBLE), 9) AS wasserstein_1
FROM seg
""",
    doc="EXACT 1-D Wasserstein-1 (earth mover's) distance between the "
    "even- and odd-id halves of the event value distribution — the "
    "drift metric that, unlike PSI/TV/KS (all already here), weighs "
    "HOW FAR mass moved, not just how much: W1 = integral "
    "|F_ref - F_cur| dx over the merged support.  Arithmetic is "
    "exact until ONE final division: at each support gap the CDF "
    "difference is the exact integer |fa*nb - fb*na|, the gap an "
    "exact DECIMAL, and their products DECIMAL-fold; no sampling, "
    "no binning, no interpolation.  Scale shape: one aggregate to "
    "the distinct-value support, one sort-window over it (money-"
    "grain support is bounded: ~1e4 distinct cents-values regardless "
    "of row count), everything after is support-sized.  Binned "
    "variants (PSI's 20-bucket spine) remain the knob when the "
    "support itself is unbounded.",
    tags=("statistics", "drift", "wasserstein", "extension"),
    extended=True,
)(_wasserstein_drift)


# -- McNemar paired test (round 10) ---------------------------------------------


def _mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    half = ev.select(
        "user_id",
        "event_type",
        "value",
        (
            F.row_number().over(w) * 2 <= F.count(F.lit(1)).over(wn)
        ).alias("early"),
    )
    hi = (F.col("event_type") == "purchase") & (F.col("value") > 90)
    per_user = half.groupBy("user_id").agg(
        F.max((F.col("early") & hi).cast("int")).alias("e"),
        F.max(((~F.col("early")) & hi).cast("int")).alias("l"),
    )
    agg = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum((F.col("e") * F.col("l"))).alias("n_both"),
        F.sum(F.col("e") * (1 - F.col("l"))).alias("b"),
        F.sum((1 - F.col("e")) * F.col("l")).alias("c"),
        F.sum((1 - F.col("e")) * (1 - F.col("l"))).alias("n_neither"),
    )
    b, c = F.col("b"), F.col("c")
    return agg.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_both").cast("long").alias("n_both"),
        b.cast("long").alias("n_early_only"),
        c.cast("long").alias("n_late_only"),
        F.col("n_neither").cast("long").alias("n_neither"),
        F.when(
            b + c > 0,
            F.round(
                (
                    F.greatest(F.abs(b - c) - 1, F.lit(0))
                    * F.greatest(F.abs(b - c) - 1, F.lit(0))
                ).cast("double")
                / (b + c),
                9,
            ),
        ).alias("mcnemar_chi2_cc"),
    )


register(
    "events_mcnemar_purchase_shift",
    oracle="""
WITH half AS (
  SELECT user_id, event_type, value,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) * 2
      <= COUNT(*) OVER (PARTITION BY user_id) AS early
  FROM events
),
per_user AS (
  SELECT user_id,
    MAX(CASE WHEN early AND event_type = 'purchase' AND value > 90
        THEN 1 ELSE 0 END) AS e,
    MAX(CASE WHEN NOT early AND event_type = 'purchase' AND value > 90
        THEN 1 ELSE 0 END) AS l
  FROM half GROUP BY user_id
),
agg AS (
  SELECT COUNT(*) AS n_users,
    SUM(e * l) AS n_both,
    SUM(e * (1 - l)) AS b,
    SUM((1 - e) * l) AS c,
    SUM((1 - e) * (1 - l)) AS n_neither
  FROM per_user
)
SELECT CAST(n_users AS BIGINT) AS n_users,
  CAST(n_both AS BIGINT) AS n_both,
  CAST(b AS BIGINT) AS n_early_only,
  CAST(c AS BIGINT) AS n_late_only,
  CAST(n_neither AS BIGINT) AS n_neither,
  CASE WHEN b + c > 0 THEN
    ROUND(CAST(GREATEST(ABS(b - c) - 1, 0)
               * GREATEST(ABS(b - c) - 1, 0) AS DOUBLE)
          / (b + c), 9) END AS mcnemar_chi2_cc
FROM agg
""",
    doc="McNemar's test for a PAIRED binary shift: did users' "
    "HIGH-VALUE (value > 90) purchasing behaviour change between the "
    "first and second half of their own event history (each user is their own control — "
    "the within-subject design the independent-sample z/chi-square "
    "tests in this family cannot touch)?  The 2x2 paired table "
    "(both / early-only / late-only / neither) comes from one "
    "windowed per-user split + one grouped aggregate; the "
    "continuity-corrected statistic max(|b-c|-1, 0)^2/(b+c) (Edwards CC, floored at 0 so b = c scores exactly 0) uses only the "
    "DISCORDANT cells — exact integers until one final division, "
    "NULL when no user changed (the degenerate-NULL convention).  "
    "Reference chi-square(1) criticals apply (3.841 at 5%).",
    tags=("statistics", "ab-testing", "paired", "extension"),
    extended=True,
)(_mcnemar_paired)


# -- Mann-Whitney U rank-sum + Hodges-Lehmann shift (round 10) -----------------


def _mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    tagged = ev.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("variant"),
        F.col("value").alias("v"),
    )
    # support grain: one row per distinct value -- bounded at money
    # grain (~1e4 cents-values) regardless of event count, the same
    # spine events_wasserstein_drift rides.
    pts = tagged.groupBy("v").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("na_v"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("nb_v"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    t = F.col("na_v") + F.col("nb_v")
    ranked = pts.select(
        "na_v",
        "nb_v",
        t.alias("t"),
        (F.sum(t).over(w) - t).alias("cum_before"),
    )
    # 2*R_a and the tie term are exact integers, but BIGINT overflows
    # once n_a*n (r2_a) or a hot value's t^3 (tie_term) passes ~9.2e18
    # — n ~ 2.09M rows on one value already cubes past the long range,
    # silently wrapping with ANSI off.  Accumulate in DECIMAL(38,0)
    # (HUGEINT on the oracle side): exact to 1e38, so any real event
    # volume fits; the variance factor n^3 - n is consumed as a double
    # and is computed in doubles outright.
    dec = lambda c: c.cast("decimal(38,0)")
    agg = ranked.agg(
        F.sum("na_v").alias("n_a"),
        F.sum("nb_v").alias("n_b"),
        # 2*R_a is an exact integer even under midpoint tie ranks
        F.sum(
            dec(F.col("na_v")) * (2 * F.col("cum_before") + F.col("t") + 1)
        ).alias("r2_a"),
        F.sum(
            dec(F.col("t")) * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_term"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    n = n_a + n_b
    u2_a = F.col("r2_a") - dec(n_a) * (n_a + 1)  # == 2*U_a, exact decimal
    # var(U) with tie correction; z = (2U - n_a n_b) / (2 sqrt(var)).
    # All-double arithmetic in pinned order, mirrored in the oracle.
    nd = n.cast("double")
    var_u = (
        n_a.cast("double") * n_b.cast("double")
        / (F.lit(12.0) * nd * (nd - F.lit(1.0)))
        * (nd * nd * nd - nd - F.col("tie_term").cast("double"))
    )
    return agg.select(
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        # diagnostics OUT as DOUBLE: a long cast here would
        # wrap/NULL at exactly the scale the decimal accumulation
        # protects (t^3 ~ 9.2e18 at ~2.1M rows on one value); the
        # decimal->double conversion is round-to-nearest from an EXACT
        # value on both engines, so it stays hash-stable at any scale
        # (exact below 2^53, deterministically rounded above)
        u2_a.cast("double").alias("u2_a"),
        F.col("tie_term").cast("double").alias("tie_term"),
        F.when(
            (n_a > 0) & (n_b > 0) & (var_u > 0),
            F.round(
                (u2_a - dec(n_a) * n_b).cast("double")
                / (2 * F.sqrt(var_u)),
                9,
            ),
        ).alias("z_mw"),
    )


register(
    "events_ab_mann_whitney",
    oracle="""
WITH s AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      ::BIGINT % 2 AS INT) AS variant, value AS v
  FROM events WHERE event_type = 'purchase'
),
pts AS (
  SELECT v,
    SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na_v,
    SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb_v
  FROM s GROUP BY v
),
ranked AS (
  SELECT na_v, nb_v, na_v + nb_v AS t,
    SUM(na_v + nb_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      - (na_v + nb_v) AS cum_before
  FROM pts
),
agg AS (
  SELECT SUM(na_v) AS n_a, SUM(nb_v) AS n_b,
    SUM(CAST(na_v AS HUGEINT) * (2 * cum_before + t + 1)) AS r2_a,
    SUM(CAST(t AS HUGEINT) * t * t - t) AS tie_term
  FROM ranked
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  CAST(r2_a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE) AS u2_a,
  CAST(tie_term AS DOUBLE) AS tie_term,
  CASE WHEN n_a > 0 AND n_b > 0 AND
    CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      / (12 * CAST(n_a + n_b AS DOUBLE)
         * (CAST(n_a + n_b AS DOUBLE) - 1))
      * (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)
           * CAST(n_a + n_b AS DOUBLE)
         - CAST(n_a + n_b AS DOUBLE) - CAST(tie_term AS DOUBLE)) > 0
  THEN ROUND(
    CAST(r2_a - CAST(n_a AS HUGEINT) * (n_a + 1)
         - CAST(n_a AS HUGEINT) * n_b AS DOUBLE)
    / (2 * SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        / (12 * CAST(n_a + n_b AS DOUBLE)
           * (CAST(n_a + n_b AS DOUBLE) - 1))
        * (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)
             * CAST(n_a + n_b AS DOUBLE)
           - CAST(n_a + n_b AS DOUBLE)
           - CAST(tie_term AS DOUBLE)))), 9)
  END AS z_mw
FROM agg
""",
    doc="Mann-Whitney U rank-sum test between the two hash-bucketed "
    "variants' purchase values — the DISTRIBUTION-FREE location test "
    "this family lacked (the z/chi-square pair tests rates, KS tests "
    "shape, Welch below tests means; MW is the robust workhorse when "
    "values are skewed and outliers poison the mean).  Ranks never "
    "materialize per row: on the distinct-value support, the midpoint "
    "tie rank times 2 (2*cum_before + t + 1) is an exact integer, so "
    "2*R_a, 2*U_a and the tie term sum(t^3 - t) accumulate EXACTLY "
    "in DECIMAL(38,0)/HUGEINT (BIGINT wraps once a hot value's t^3 "
    "passes ~9.2e18); the diagnostics then output as deterministic "
    "round-to-nearest doubles, and the only other doubles are the "
    "tie-corrected variance and one SQRT in pinned order.  Degenerate inputs (either side empty, or "
    "all values tied so var = 0) yield NULL z per the house "
    "convention.  Scale: one grouped pass to the bounded money-grain "
    "support, one sort-window over it — identical shape to "
    "events_wasserstein_drift; nothing is per-row after the first "
    "aggregate.",
    tags=("statistics", "ab-testing", "nonparametric", "extension"),
    extended=False,  # demoted round 12 — registry._EXTENDED wins (rationale there)
)(_mann_whitney)


# -- Hodges-Lehmann shift estimator (round 10) ---------------------------------


# Past this many distinct values the HL pair grid quantizes onto a
# uniform grid of the same size: the grid stays support x support
# bounded even for genuinely CONTINUOUS value columns (where the raw
# support would equal the row count and the count-product grid would
# go quadratic).  Error bound: each value moves < (max-min)/cap, so
# every pairwise difference — and hence the weighted median — moves
# < 2*(max-min)/cap.  The money-grain fixture (~1e4 cents-values)
# never trips it; the trigger is mirrored EXACTLY in the oracle SQL,
# so the pairing stays hash-exact whether or not it fires.
_HL_SUPPORT_CAP = 20000


def hl_shift_from_tagged(tagged: DataFrame, cap: int = _HL_SUPPORT_CAP) -> DataFrame:
    """Hodges-Lehmann shift from a (variant in {0,1}, v) relation via
    the support-grain count-product grid; see events_ab_hodges_lehmann
    for the full contract.  ``cap`` bounds the value support (floor-
    grid quantization past it — deterministic IEEE arithmetic, no
    round-tie hazard)."""
    from pyspark.sql import Window

    stats = tagged.agg(
        F.countDistinct("v").alias("ns"),
        F.min("v").alias("vlo"),
        F.max("v").alias("vhi"),
    )
    step = (F.col("vhi") - F.col("vlo")) / cap
    vq = F.when(
        (F.col("ns") > cap) & (step > 0),
        F.col("vlo")
        + F.floor((F.col("v") - F.col("vlo")) / step) * step,
    ).otherwise(F.col("v"))
    tagged = tagged.crossJoin(F.broadcast(stats)).select(
        "variant", vq.alias("v")
    )
    sa = (
        tagged.where(F.col("variant") == 0)
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("wa"))
        .select(F.col("v").alias("va"), "wa")
    )
    sb = (
        tagged.where(F.col("variant") == 1)
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("wb"))
        .select(F.col("v").alias("vb"), "wb")
    )
    # support x support pair grid: money-grain support is bounded
    # (~1e4 distinct cents-values regardless of row count), so the
    # grid is ~1e8 cells worst case and the broadcast side tiny --
    # never an n^2 row blowup.  Weighted by count products it
    # reproduces the FULL n_a*n_b pairwise-difference multiset.
    diffs = (
        sa.crossJoin(F.broadcast(sb))
        .groupBy((F.col("vb") - F.col("va")).alias("diff"))
        .agg(F.sum(F.col("wa").cast("long") * F.col("wb")).alias("w"))
    )
    win = Window.orderBy("diff").rowsBetween(Window.unboundedPreceding, 0)
    cum = diffs.select(
        "diff", "w", F.sum("w").over(win).alias("cw")
    ).select("diff", (F.col("cw") - F.col("w")).alias("pw"), "cw")
    tot = diffs.agg(F.sum("w").alias("n_pairs"))
    j = cum.crossJoin(F.broadcast(tot))
    k1 = F.floor((F.col("n_pairs") + 1) / 2)
    k2 = F.floor(F.col("n_pairs") / 2) + 1
    picked = j.agg(
        F.max(F.col("n_pairs")).alias("n_pairs"),
        F.max(
            F.when(
                (F.col("pw") < k1) & (k1 <= F.col("cw")), F.col("diff")
            )
        ).alias("lo"),
        F.max(
            F.when(
                (F.col("pw") < k2) & (k2 <= F.col("cw")), F.col("diff")
            )
        ).alias("hi"),
    )
    return picked.select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round((F.col("lo") + F.col("hi")) / 2, 9).alias("hl_shift"),
    )


def _hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    tagged = ev.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("variant"),
        F.col("value").alias("v"),
    )
    return hl_shift_from_tagged(tagged)


register(
    "events_ab_hodges_lehmann",
    oracle=f"""
WITH s0 AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      ::BIGINT % 2 AS INT) AS variant, value AS v
  FROM events WHERE event_type = 'purchase'
),
st AS (
  SELECT COUNT(DISTINCT v) AS ns, MIN(v) AS vlo, MAX(v) AS vhi FROM s0
),
s AS (
  SELECT variant,
    CASE WHEN st.ns > {_HL_SUPPORT_CAP}
           AND (st.vhi - st.vlo) / {_HL_SUPPORT_CAP} > 0
      THEN st.vlo
        + FLOOR((v - st.vlo) / ((st.vhi - st.vlo) / {_HL_SUPPORT_CAP}))
          * ((st.vhi - st.vlo) / {_HL_SUPPORT_CAP})
      ELSE v END AS v
  FROM s0 CROSS JOIN st
),
sa AS (SELECT v AS va, COUNT(*) AS wa FROM s WHERE variant = 0 GROUP BY v),
sb AS (SELECT v AS vb, COUNT(*) AS wb FROM s WHERE variant = 1 GROUP BY v),
diffs AS (
  SELECT vb - va AS diff, SUM(CAST(wa AS BIGINT) * wb) AS w
  FROM sa CROSS JOIN sb GROUP BY vb - va
),
cum AS (
  SELECT diff,
    SUM(w) OVER (ORDER BY diff ROWS UNBOUNDED PRECEDING) - w AS pw,
    SUM(w) OVER (ORDER BY diff ROWS UNBOUNDED PRECEDING) AS cw
  FROM diffs
),
tot AS (SELECT SUM(w) AS n_pairs FROM diffs),
j AS (SELECT * FROM cum CROSS JOIN tot)
SELECT CAST(MAX(n_pairs) AS BIGINT) AS n_pairs,
  ROUND((MAX(CASE WHEN pw < CAST(FLOOR((n_pairs + 1) / 2) AS BIGINT)
          AND CAST(FLOOR((n_pairs + 1) / 2) AS BIGINT) <= cw
          THEN diff END)
       + MAX(CASE WHEN pw < CAST(FLOOR(n_pairs / 2) + 1 AS BIGINT)
          AND CAST(FLOOR(n_pairs / 2) + 1 AS BIGINT) <= cw
          THEN diff END)) / 2, 9) AS hl_shift
FROM j
""",
    doc="Hodges-Lehmann shift estimator between the two hash-bucketed "
    "variants' purchase values: the median of ALL n_a x n_b pairwise "
    "differences (v_b - v_a) — the robust effect size that pairs with "
    "events_ab_mann_whitney's z the way a mean difference pairs with "
    "Welch's t (30% gross-error breakdown, no moment assumptions).  "
    "The quadratic pair multiset never materializes per row: both "
    "samples first collapse to their bounded money-grain value "
    "support (~1e4 distinct values at any corpus size), the "
    "difference grid is support x support with COUNT-PRODUCT weights "
    "(exact BIGINTs), and the weighted median picks order statistics "
    "floor((N+1)/2) / floor(N/2)+1 off one cumulative window — the "
    "classical even/odd midpoint rule, exact until the final /2.  "
    "GUARD: a genuinely continuous value column (support ~ row "
    "count) would defeat the grid, so past _HL_SUPPORT_CAP distinct "
    "values both samples floor-quantize onto a shared cap-sized "
    "uniform grid (each diff moves < 2*(max-min)/cap; trigger and "
    "grid arithmetic mirrored exactly in the oracle, so the pairing "
    "stays hash-exact whether or not it fires — the fixture never "
    "trips it).  Scale: two grouped passes + one bounded broadcast "
    "grid; the window runs over the diff support only.",
    tags=("statistics", "ab-testing", "nonparametric", "extension"),
    extended=True,
)(_hodges_lehmann)


# -- Welch's unequal-variance t test (round 10) --------------------------------


def _welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    tagged = ev.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("variant"),
        F.col("value").alias("v"),
    )
    per = tagged.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(38,6)")).alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,6)")).alias("s2"),
    )
    w = per.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("s1"))).alias("s1_a"),
        F.max(F.when(F.col("variant") == 0, F.col("s2"))).alias("s2_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("s1"))).alias("s1_b"),
        F.max(F.when(F.col("variant") == 1, F.col("s2"))).alias("s2_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    m_a = F.col("s1_a").cast("double") / n_a
    m_b = F.col("s1_b").cast("double") / n_b
    # cancellation-proof fold (round-11 VERDICT "What's wrong #2"):
    # n*s2 - s1^2 exact at the 1e-6 money grain, one double cast —
    # functions/stats.py, mirrored in the oracle
    var_a = exact_var(
        F.col("s1_a"), F.col("s2_a"), n_a, frac_digits=6, frac_s2=6
    )
    var_b = exact_var(
        F.col("s1_b"), F.col("s2_b"), n_b, frac_digits=6, frac_s2=6
    )
    se2_a = var_a / n_a
    se2_b = var_b / n_b
    se2 = se2_a + se2_b
    ok = (n_a > 1) & (n_b > 1) & (se2 > 0)
    return w.select(
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        F.round(m_a, 9).alias("mean_a"),
        F.round(m_b, 9).alias("mean_b"),
        F.round(var_a, 9).alias("var_a"),
        F.round(var_b, 9).alias("var_b"),
        F.when(ok, F.round((m_b - m_a) / F.sqrt(se2), 9)).alias("t_welch"),
        F.when(
            ok,
            F.round(
                se2
                * se2
                / (
                    se2_a * se2_a / (n_a - 1)
                    + se2_b * se2_b / (n_b - 1)
                ),
                6,
            ),
        ).alias("df_welch"),
    )


register(
    "events_ab_welch_ttest",
    oracle=f"""
WITH s AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      ::BIGINT % 2 AS INT) AS variant, value AS v
  FROM events WHERE event_type = 'purchase'
),
per AS (
  SELECT variant, COUNT(*) AS n,
    SUM(CAST(v AS DECIMAL(38,6))) AS s1,
    SUM(CAST(v * v AS DECIMAL(38,6))) AS s2
  FROM s GROUP BY variant
),
w AS (
  SELECT
    MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
    MAX(CASE WHEN variant = 0 THEN s1 END) AS s1_a,
    MAX(CASE WHEN variant = 0 THEN s2 END) AS s2_a,
    MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
    MAX(CASE WHEN variant = 1 THEN s1 END) AS s1_b,
    MAX(CASE WHEN variant = 1 THEN s2 END) AS s2_b
  FROM per
),
d AS (
  SELECT n_a, n_b,
    CAST(s1_a AS DOUBLE) / n_a AS m_a,
    CAST(s1_b AS DOUBLE) / n_b AS m_b,
    {sql_exact_var("s1_a", "s2_a", "n_a", 6, 6)} AS var_a,
    {sql_exact_var("s1_b", "s2_b", "n_b", 6, 6)} AS var_b
  FROM w
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  ROUND(m_a, 9) AS mean_a, ROUND(m_b, 9) AS mean_b,
  ROUND(var_a, 9) AS var_a, ROUND(var_b, 9) AS var_b,
  CASE WHEN n_a > 1 AND n_b > 1 AND var_a / n_a + var_b / n_b > 0
  THEN ROUND((m_b - m_a) / SQRT(var_a / n_a + var_b / n_b), 9)
  END AS t_welch,
  CASE WHEN n_a > 1 AND n_b > 1 AND var_a / n_a + var_b / n_b > 0
  THEN ROUND((var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b)
    / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
       + (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 6)
  END AS df_welch
FROM d
""",
    doc="Welch's unequal-variance t test on the two hash-bucketed "
    "variants' purchase VALUES — the mean-shift test that completes "
    "the A/B battery (z/chi-square = rates, KS = shape, Mann-Whitney "
    "= robust location, Welch = means without the pooled-variance "
    "assumption Student's t makes and real traffic always violates).  "
    "Moments come from exact order-independent DECIMAL(38,6) folds "
    "of v and v*v (the corr/stddev precedent), so both engines see "
    "identical sums; mean/variance/t and the Welch-Satterthwaite df "
    "are then pinned-order double arithmetic with one SQRT.  "
    "Degenerate inputs (a side with <2 rows, or zero pooled standard "
    "error) yield NULL t/df per the house convention.  No p-value on "
    "purpose: erf is libm-variable; compare |t| to fixed criticals "
    "at df_welch.  Scale: one grouped map-side-combinable pass to a "
    "2-row table, then an epilogue.",
    tags=("statistics", "ab-testing", "extension"),
    extended=True,
)(_welch_ttest)


# -- log-rank test between the variants' survival curves (round 10) ------------


def _logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts")).cast("date")).alias("f"),
        F.min(
            F.when(
                F.col("event_type") == "purchase",
                F.date_trunc("day", F.col("ts")).cast("date"),
            )
        ).alias("p"),
        F.max(F.date_trunc("day", F.col("ts")).cast("date")).alias("l"),
    )
    mx = per_user.agg(F.max("l").alias("maxd"))
    users = per_user.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("p").isNotNull(), F.datediff("p", "f")
        ).otherwise(F.datediff("maxd", "f")).alias("t"),
        F.col("p").isNotNull().cast("int").alias("dead"),
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("variant"),
    )
    grp = users.groupBy("t").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("m1"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("m2"),
        F.sum(
            F.when(F.col("variant") == 0, F.col("dead")).otherwise(0)
        ).alias("d1"),
        F.sum(
            F.when(F.col("variant") == 1, F.col("dead")).otherwise(0)
        ).alias("d2"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    risk = grp.select(
        "d1",
        "d2",
        (
            F.sum("m1").over(wall) - F.sum("m1").over(wcum) + F.col("m1")
        ).alias("n1"),
        (
            F.sum("m2").over(wall) - F.sum("m2").over(wcum) + F.col("m2")
        ).alias("n2"),
    ).where(F.col("d1") + F.col("d2") > 0)
    n, dt = F.col("n1") + F.col("n2"), F.col("d1") + F.col("d2")
    terms = risk.select(
        "d1",
        "d2",
        "n1",
        "n2",
        # per-time expected/variance terms quantized at source (the KM
        # lnterm pattern) so the decimal folds see identical doubles
        F.round(
            dt.cast("double") * F.col("n1").cast("double") / n, 12
        ).alias("e1"),
        F.when(
            n > 1,
            F.round(
                dt.cast("double")
                * (F.col("n1").cast("double") / n)
                * (F.lit(1.0) - F.col("n1").cast("double") / n)
                * (n - dt).cast("double")
                / (n - 1),
                12,
            ),
        ).otherwise(F.lit(0.0)).alias("v"),
    )
    agg = terms.agg(
        F.max("n1").cast("long").alias("n_a"),
        F.max("n2").cast("long").alias("n_b"),
        F.sum("d1").cast("long").alias("deaths_a"),
        F.sum("d2").cast("long").alias("deaths_b"),
        F.sum(F.col("e1").cast("decimal(28,12)"))
        .cast("double")
        .alias("e_a"),
        F.sum(F.col("v").cast("decimal(28,12)"))
        .cast("double")
        .alias("var_o"),
    )
    return agg.select(
        "n_a",
        "n_b",
        "deaths_a",
        "deaths_b",
        F.round("e_a", 9).alias("expected_a"),
        F.round("var_o", 9).alias("variance"),
        F.when(
            F.col("var_o") > 0,
            F.round(
                (F.col("deaths_a") - F.col("e_a")) / F.sqrt("var_o"), 9
            ),
        ).alias("z_logrank"),
    )


register(
    "events_ab_logrank",
    oracle="""
WITH per_user AS (
  SELECT user_id,
    MIN(CAST(date_trunc('day', ts) AS DATE)) AS f,
    MIN(CASE WHEN event_type = 'purchase'
        THEN CAST(date_trunc('day', ts) AS DATE) END) AS p,
    MAX(CAST(date_trunc('day', ts) AS DATE)) AS l
  FROM events GROUP BY user_id
),
mx AS (SELECT MAX(l) AS maxd FROM per_user),
users AS (
  SELECT CASE WHEN p IS NOT NULL THEN datediff('day', f, p)
              ELSE datediff('day', f, maxd) END AS t,
    CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS dead,
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      ::BIGINT % 2 AS INT) AS variant
  FROM per_user CROSS JOIN mx
),
grp AS (
  SELECT t,
    SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS m1,
    SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS m2,
    SUM(CASE WHEN variant = 0 THEN dead ELSE 0 END) AS d1,
    SUM(CASE WHEN variant = 1 THEN dead ELSE 0 END) AS d2
  FROM users GROUP BY t
),
risk AS (
  SELECT d1, d2,
    SUM(m1) OVER () - SUM(m1) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
      + m1 AS n1,
    SUM(m2) OVER () - SUM(m2) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
      + m2 AS n2
  FROM grp
),
terms AS (
  SELECT d1, d2, n1, n2,
    ROUND(CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE) / (n1 + n2), 12)
      AS e1,
    CASE WHEN n1 + n2 > 1 THEN
      ROUND(CAST(d1 + d2 AS DOUBLE)
        * (CAST(n1 AS DOUBLE) / (n1 + n2))
        * (CAST(1 AS DOUBLE) - CAST(n1 AS DOUBLE) / (n1 + n2))
        * CAST(n1 + n2 - d1 - d2 AS DOUBLE) / (n1 + n2 - 1), 12)
    ELSE CAST(0 AS DOUBLE) END AS v
  FROM risk WHERE d1 + d2 > 0
),
agg AS (
  SELECT CAST(MAX(n1) AS BIGINT) AS n_a, CAST(MAX(n2) AS BIGINT) AS n_b,
    CAST(SUM(d1) AS BIGINT) AS deaths_a,
    CAST(SUM(d2) AS BIGINT) AS deaths_b,
    CAST(SUM(CAST(e1 AS DECIMAL(28,12))) AS DOUBLE) AS e_a,
    CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) AS var_o
  FROM terms
)
SELECT n_a, n_b, deaths_a, deaths_b,
  ROUND(e_a, 9) AS expected_a,
  ROUND(var_o, 9) AS variance,
  CASE WHEN var_o > 0
    THEN ROUND((deaths_a - e_a) / SQRT(var_o), 9) END AS z_logrank
FROM agg
""",
    doc="Log-rank (Mantel-Cox) test between the two hash-bucketed "
    "variants' TIME-TO-FIRST-PURCHASE survival curves (event = first "
    "purchase day since first activity; users who never purchase are "
    "right-censored at corpus end) — the inferential companion to "
    "events_km_survival's descriptive machinery, on the conversion "
    "clock where this fixture actually has events (the lifetime/"
    "churn clock is degenerate here: users stay active to the end): "
    "at each distinct conversion time, observed group-A events vs the "
    "hypergeometric expectation d*n1/n and variance "
    "d*(n1/n)(1-n1/n)(n-d)/(n-1); z = (O-E)/sqrt(V).  Counts are "
    "exact integers; each per-time E/V term is one pinned-order "
    "double expression quantized at source (the KM lnterm pattern) "
    "and DECIMAL-folded so the sums are order-independent; degenerate "
    "V = 0 yields NULL z.  Scale: one grouped scan to user spans, "
    "then every window runs on the O(distinct lifetimes) dimension; "
    "the corpus-end date attaches by broadcast.",
    tags=("events", "survival", "ab-testing", "statistics", "extension"),
    extended=False,  # demoted round 12b — registry._EXTENDED wins (rationale there)
)(_logrank_test)


# -- experiment health: SRM + covariate balance (round 10) ---------------------


def _ab_srm_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    users = per_user.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("variant"),
        F.col("n_events"),
    )
    per = users.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    w = per.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("s1"))).alias("s1_a"),
        F.max(F.when(F.col("variant") == 0, F.col("s2"))).alias("s2_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("s1"))).alias("s1_b"),
        F.max(F.when(F.col("variant") == 1, F.col("s2"))).alias("s2_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    # SRM chi-square vs the designed 50/50 split: (n_a - n_b)^2 / N,
    # exact integers until one division
    srm = ((n_a - n_b) * (n_a - n_b)).cast("double") / (n_a + n_b)
    m_a = F.col("s1_a").cast("double") / n_a
    m_b = F.col("s1_b").cast("double") / n_b
    # cancellation-proof fold (round-11 VERDICT "What's wrong #2"):
    # n*s2 - s1^2 exact in DECIMAL(38,0)/HUGEINT, one double cast —
    # functions/stats.py, mirrored in the oracle
    var_a = exact_var(F.col("s1_a"), F.col("s2_a"), n_a)
    var_b = exact_var(F.col("s1_b"), F.col("s2_b"), n_b)
    pooled = (var_a + var_b) / 2
    ok = (n_a > 1) & (n_b > 1) & (pooled > 0)
    return w.select(
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        F.round(srm, 9).alias("srm_chi2"),
        (srm > F.lit(3.841)).alias("srm_flag"),
        F.round(m_a, 9).alias("events_mean_a"),
        F.round(m_b, 9).alias("events_mean_b"),
        F.when(
            ok, F.round((m_b - m_a) / F.sqrt(pooled), 9)
        ).alias("smd_events"),
        F.when(ok, F.abs((m_b - m_a) / F.sqrt(pooled)) > 0.1).alias(
            "imbalance_flag"
        ),
    )


register(
    "events_ab_srm_health",
    oracle=f"""
WITH users AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      ::BIGINT % 2 AS INT) AS variant,
    COUNT(*) AS n_events
  FROM events GROUP BY user_id
),
per AS (
  SELECT variant, COUNT(*) AS n, SUM(n_events) AS s1,
    SUM(n_events * n_events) AS s2
  FROM users GROUP BY variant
),
w AS (
  SELECT
    MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
    MAX(CASE WHEN variant = 0 THEN s1 END) AS s1_a,
    MAX(CASE WHEN variant = 0 THEN s2 END) AS s2_a,
    MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
    MAX(CASE WHEN variant = 1 THEN s1 END) AS s1_b,
    MAX(CASE WHEN variant = 1 THEN s2 END) AS s2_b
  FROM per
),
d AS (
  SELECT n_a, n_b,
    CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b) AS srm,
    CAST(s1_a AS DOUBLE) / n_a AS m_a,
    CAST(s1_b AS DOUBLE) / n_b AS m_b,
    ({sql_exact_var("s1_a", "s2_a", "n_a")}
     + {sql_exact_var("s1_b", "s2_b", "n_b")}
    ) / 2 AS pooled
  FROM w
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  ROUND(srm, 9) AS srm_chi2,
  srm > CAST(3.841 AS DOUBLE) AS srm_flag,
  ROUND(m_a, 9) AS events_mean_a,
  ROUND(m_b, 9) AS events_mean_b,
  CASE WHEN n_a > 1 AND n_b > 1 AND pooled > 0
    THEN ROUND((m_b - m_a) / SQRT(pooled), 9) END AS smd_events,
  CASE WHEN n_a > 1 AND n_b > 1 AND pooled > 0
    THEN ABS((m_b - m_a) / SQRT(pooled)) > CAST(0.1 AS DOUBLE) END
    AS imbalance_flag
FROM d
""",
    doc="Experiment health guardrails, the checks run BEFORE reading "
    "any treatment metric: (1) sample-ratio mismatch — chi-square "
    "(n_a - n_b)^2 / N of the observed split against the designed "
    "50/50 hash allocation, flagged at the 3.841 (5%, 1 df) critical "
    "(an SRM means broken bucketing/logging and invalidates the "
    "experiment regardless of lift); (2) covariate balance — the "
    "standardized mean difference of per-user activity volume "
    "between arms ((m_b - m_a)/sqrt((v_a + v_b)/2)), flagged at the "
    "conventional |SMD| > 0.1.  Exact integer counts and activity "
    "sums until the final divisions; degenerate inputs NULL out per "
    "the house convention.  Scale: one user-grain grouped pass "
    "(map-side combined) to a 2-row table, then an epilogue.",
    tags=("events", "ab-testing", "statistics", "extension"),
    extended=False,  # demoted round 12b — registry._EXTENDED wins (rationale there)
)(_ab_srm_health)


# -- streaming online MG heavy users (round 10) --------------------------------


def _stream_mg_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from diabetes_etl_spark.streaming.stateful import (
        running_mg_heavy_users,
    )

    summ = running_mg_heavy_users(_events_stream(spark, sf_dir))
    snap = stream_snapshot(spark, summ, output_mode="update")
    wlast = Window.partitionBy("event_type").orderBy(
        F.col("n_total").desc()
    )
    latest = (
        snap.withColumn("_rn", F.row_number().over(wlast))
        .filter(F.col("_rn") == 1)
        .select("event_type", "uids", "counts")
    )
    exploded = latest.select(
        "event_type",
        F.explode(F.arrays_zip("uids", "counts")).alias("z"),
    ).select(
        "event_type",
        F.col("z.uids").alias("user_id"),
        F.col("z.counts").alias("n_events"),
    )
    wtop = Window.partitionBy("event_type").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    return (
        exploded.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= 10)
        .select(
            "event_type",
            F.col("user_id").cast("long").alias("user_id"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


register(
    "stream_mg_heavy_users",
    oracle="""
SELECT event_type, user_id, n_events, rk FROM (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
      ORDER BY COUNT(*) DESC, user_id) AS INT) AS rk
  FROM events GROUP BY event_type, user_id
) WHERE rk <= 10
""",
    doc="ONLINE SKETCH as streaming state: a Misra-Gries heavy-hitter "
    "summary of per-user activity per event type maintained across "
    "micro-batches via applyInPandasWithState — state is a bounded "
    "k = 512 array-typed summary (never the full per-user table), "
    "the shape that keeps stateful streaming viable when key "
    "cardinality inside a group is unbounded.  At fixture scale k "
    "covers every distinct user so the final counts are EXACT and "
    "the top-10-per-type result equals the batch groupBy oracle "
    "(the covering-parameter discipline); the eviction/merge path "
    "(subtract (k+1)-th largest, drop <= 0 — Agarwal et al. 2012) "
    "is exercised with a tiny k in tests/test_round10b_stats.py.  "
    "Update-mode emissions collapse to the newest summary per key "
    "by the cumulative n_total.",
    tags=("streaming", "stateful", "sketch", "extension"),
    extended=False,  # gate (round-11 rotation)
)(_stream_mg_heavy_users)


# -- Poisson overdispersion check on daily counts (round 10) -------------------


def _overdispersion_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    agg = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    n = F.col("n")
    mean = F.col("s1").cast("double") / n
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / n
    ) / (n - 1)
    chi2 = (n - 1) * var / mean
    z = (chi2 - (n - 1)) / F.sqrt(2 * (n - 1).cast("double"))
    ok = (n > 1) & (F.col("s1") > 0)
    return agg.select(
        n.cast("long").alias("n_days"),
        F.col("s1").cast("long").alias("n_events"),
        F.round(mean, 9).alias("mean_daily"),
        F.when(ok, F.round(var, 9)).alias("var_daily"),
        F.when(ok, F.round(var / mean, 9)).alias("dispersion_index"),
        F.when(ok, F.round(chi2, 9)).alias("chi2_stat"),
        F.when(ok, F.round(z, 9)).alias("z_dispersion"),
        F.when(ok, z > 1.645).alias("overdispersed_flag"),
    )


register(
    "events_overdispersion_check",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS c
  FROM events GROUP BY 1
),
agg AS (
  SELECT COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2 FROM daily
),
d AS (
  SELECT n, s1,
    CAST(s1 AS DOUBLE) / n AS mean,
    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
      / (n - 1) AS var
  FROM agg
)
SELECT CAST(n AS BIGINT) AS n_days, CAST(s1 AS BIGINT) AS n_events,
  ROUND(mean, 9) AS mean_daily,
  CASE WHEN n > 1 AND s1 > 0 THEN ROUND(var, 9) END AS var_daily,
  CASE WHEN n > 1 AND s1 > 0 THEN ROUND(var / mean, 9) END
    AS dispersion_index,
  CASE WHEN n > 1 AND s1 > 0 THEN ROUND((n - 1) * var / mean, 9) END
    AS chi2_stat,
  CASE WHEN n > 1 AND s1 > 0 THEN
    ROUND(((n - 1) * var / mean - (n - 1))
          / SQRT(CAST(2 * (n - 1) AS DOUBLE)), 9) END AS z_dispersion,
  CASE WHEN n > 1 AND s1 > 0 THEN
    ((n - 1) * var / mean - (n - 1))
      / SQRT(CAST(2 * (n - 1) AS DOUBLE)) > CAST(1.645 AS DOUBLE) END
    AS overdispersed_flag
FROM d
""",
    doc="Poisson overdispersion check on daily event counts — the "
    "count-data diagnostic that decides whether Poisson-based "
    "alerting/forecasting assumptions hold (variance = mean) or the "
    "series is clumpy (bursts, bots, batch replays): dispersion "
    "index s^2/m, the chi-square dispersion statistic (n-1)s^2/m, "
    "and its normal-approximation z flagged at 1.645 (one-sided 5%).  "
    "Daily counts and their squares fold as exact BIGINTs (counts "
    "are integers — no decimal scale needed), divisions and one "
    "SQRT pinned at the end, degenerate-NULL.  Scale: one grouped "
    "scan to the O(days) spine, then a 1-row epilogue.",
    tags=("events", "statistics", "timeseries", "extension"),
    extended=True,
)(_overdispersion_check)


# -- delta-method ratio metric (round 10) --------------------------------------


def _ab_ratio_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("value")
            ).otherwise(0.0).cast("decimal(38,6)")
        ).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    users = per_user.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("variant"),
        "x",
        "y",
    )
    per = users.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,6)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,6)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,6)")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,6)")).alias("sxy"),
    )

    def side(tag, v):
        return [
            F.max(F.when(F.col("variant") == v, F.col(c))).alias(f"{c}_{tag}")
            for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
        ]

    w = per.agg(*(side("a", 0) + side("b", 1)))

    def ratio_stats(tag):
        n = F.col(f"n_{tag}")
        sx_raw, sy_raw = F.col(f"sx_{tag}"), F.col(f"sy_{tag}")
        sx = sx_raw.cast("double")
        sy = sy_raw.cast("double")
        r = sx / sy
        my = sy / n
        # cancellation-proof folds (round-11 VERDICT "What's wrong
        # #2"): n*sxy - sx*sy exact at the 1e-6 grain, one double
        # cast — functions/stats.py, mirrored in the oracle
        # per-factor grains (functions/stats.py): x is money (6),
        # y is a per-user COUNT folded as integer-valued decimal —
        # frac 0 for y keeps the exact numerator 1e6 narrower
        vx = exact_var(
            sx_raw, F.col(f"sxx_{tag}"), n, frac_digits=6, frac_s2=6
        )
        vy = exact_var(sy_raw, F.col(f"syy_{tag}"), n, frac_digits=0)
        cxy = exact_cov(
            sx_raw, sy_raw, F.col(f"sxy_{tag}"), n,
            frac_digits=6, frac_y=0,
        )
        # Deng et al. delta method: Var(R) ~ (vx - 2R cxy + R^2 vy)
        #                                   / (n * my^2)
        var_r = (vx - 2 * r * cxy + r * r * vy) / (n * my * my)
        return r, var_r, n

    r_a, v_a, n_a = ratio_stats("a")
    r_b, v_b, n_b = ratio_stats("b")
    ok = (n_a > 1) & (n_b > 1) & (v_a + v_b > 0)
    return w.select(
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        F.round(r_a, 9).alias("ratio_a"),
        F.round(r_b, 9).alias("ratio_b"),
        F.when(ok, F.round(F.sqrt(v_a), 9)).alias("se_a"),
        F.when(ok, F.round(F.sqrt(v_b), 9)).alias("se_b"),
        F.when(
            ok, F.round((r_b - r_a) / F.sqrt(v_a + v_b), 9)
        ).alias("z_ratio"),
    )


register(
    "events_ab_ratio_delta",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
    SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
        ELSE CAST(0.0 AS DOUBLE) END AS DECIMAL(38,6))) AS x,
    COUNT(*) AS y
  FROM events GROUP BY user_id
),
users AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      ::BIGINT % 2 AS INT) AS variant, x, y
  FROM per_user
),
per AS (
  SELECT variant, COUNT(*) AS n, SUM(x) AS sx,
    SUM(CAST(y AS DECIMAL(38,6))) AS sy,
    SUM(CAST(x * x AS DECIMAL(38,6))) AS sxx,
    SUM(CAST(y * y AS DECIMAL(38,6))) AS syy,
    SUM(CAST(x * y AS DECIMAL(38,6))) AS sxy
  FROM users GROUP BY variant
),
w AS (
  SELECT
    MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
    MAX(CASE WHEN variant = 0 THEN sx END) AS sx_a,
    MAX(CASE WHEN variant = 0 THEN sy END) AS sy_a,
    MAX(CASE WHEN variant = 0 THEN sxx END) AS sxx_a,
    MAX(CASE WHEN variant = 0 THEN syy END) AS syy_a,
    MAX(CASE WHEN variant = 0 THEN sxy END) AS sxy_a,
    MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
    MAX(CASE WHEN variant = 1 THEN sx END) AS sx_b,
    MAX(CASE WHEN variant = 1 THEN sy END) AS sy_b,
    MAX(CASE WHEN variant = 1 THEN sxx END) AS sxx_b,
    MAX(CASE WHEN variant = 1 THEN syy END) AS syy_b,
    MAX(CASE WHEN variant = 1 THEN sxy END) AS sxy_b
  FROM per
),
d AS (
  SELECT n_a, n_b,
    CAST(sx_a AS DOUBLE) / CAST(sy_a AS DOUBLE) AS r_a,
    CAST(sx_b AS DOUBLE) / CAST(sy_b AS DOUBLE) AS r_b,
    (({sql_exact_var("sx_a", "sxx_a", "n_a", 6, 6)})
     - 2 * (CAST(sx_a AS DOUBLE) / CAST(sy_a AS DOUBLE))
       * ({sql_exact_cov("sx_a", "sy_a", "sxy_a", "n_a", 6, 0)})
     + (CAST(sx_a AS DOUBLE) / CAST(sy_a AS DOUBLE)) * (CAST(sx_a AS DOUBLE) / CAST(sy_a AS DOUBLE))
       * ({sql_exact_var("sy_a", "syy_a", "n_a", 0)}))
    / (n_a * (CAST(sy_a AS DOUBLE) / n_a) * (CAST(sy_a AS DOUBLE) / n_a)) AS v_a,
    (({sql_exact_var("sx_b", "sxx_b", "n_b", 6, 6)})
     - 2 * (CAST(sx_b AS DOUBLE) / CAST(sy_b AS DOUBLE))
       * ({sql_exact_cov("sx_b", "sy_b", "sxy_b", "n_b", 6, 0)})
     + (CAST(sx_b AS DOUBLE) / CAST(sy_b AS DOUBLE)) * (CAST(sx_b AS DOUBLE) / CAST(sy_b AS DOUBLE))
       * ({sql_exact_var("sy_b", "syy_b", "n_b", 0)}))
    / (n_b * (CAST(sy_b AS DOUBLE) / n_b) * (CAST(sy_b AS DOUBLE) / n_b)) AS v_b
  FROM w
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  ROUND(r_a, 9) AS ratio_a, ROUND(r_b, 9) AS ratio_b,
  CASE WHEN n_a > 1 AND n_b > 1 AND v_a + v_b > 0
    THEN ROUND(SQRT(v_a), 9) END AS se_a,
  CASE WHEN n_a > 1 AND n_b > 1 AND v_a + v_b > 0
    THEN ROUND(SQRT(v_b), 9) END AS se_b,
  CASE WHEN n_a > 1 AND n_b > 1 AND v_a + v_b > 0
    THEN ROUND((r_b - r_a) / SQRT(v_a + v_b), 9) END AS z_ratio
FROM d
""",
    doc="Delta-method inference for a RATIO metric — revenue per "
    "event, R = sum(x)/sum(y) per variant — the metric form most "
    "real experiments ship and the one a naive per-user t-test gets "
    "WRONG (users are the randomization unit, so R is a ratio of "
    "sums with correlated numerator/denominator; Deng, Knoblich & "
    "Lu 2018): Var(R) ~ (s_x^2 - 2R s_xy + R^2 s_y^2) / (n ybar^2) "
    "from the five exact DECIMAL(38,6)-folded moments, z on the "
    "difference with independent-arm variances.  Pinned-order "
    "doubles after the folds, degenerate-NULL.  Scale: one "
    "user-grain grouped pass (map-side combined) to a 2-row table, "
    "then an epilogue.",
    tags=("events", "ab-testing", "statistics", "extension"),
    extended=True,
)(_ab_ratio_delta)


# -- A/B healthcheck composite: one scan, whole readout (round 11) -------------


def _ab_healthcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    v = F.col("value")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("y"),
        F.sum(F.when(is_p, 1).otherwise(0)).alias("pn"),
        F.sum(
            F.when(is_p, v).otherwise(0.0).cast("decimal(38,6)")
        ).alias("x"),
        F.sum(
            F.when(is_p, v * v).otherwise(0.0).cast("decimal(38,6)")
        ).alias("x2"),
    )
    users = per_user.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("variant"),
        "y",
        "pn",
        "x",
        "x2",
    )
    per = users.groupBy("variant").agg(
        # SRM / balance moments (user grain, exact integers)
        F.count(F.lit(1)).alias("nu"),
        F.sum("y").alias("su1"),
        F.sum(F.col("y") * F.col("y")).alias("su2"),
        # Welch moments (purchase-row grain, recovered exactly from the
        # per-user decimal partials — decimal addition is associative)
        F.sum("pn").alias("np"),
        F.sum("x").alias("sp1"),
        F.sum("x2").alias("sp2"),
        # ratio-metric moments (user grain, the Deng et al. five)
        F.sum(F.col("y").cast("decimal(38,6)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,6)")).alias(
            "sxx"
        ),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,6)")).alias(
            "syy"
        ),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,6)")).alias(
            "sxy"
        ),
    )

    def side(tag, val):
        return [
            F.max(F.when(F.col("variant") == val, F.col(c))).alias(
                f"{c}_{tag}"
            )
            for c in (
                "nu", "su1", "su2", "np", "sp1", "sp2", "sy", "sxx",
                "syy", "sxy",
            )
        ]

    w = per.agg(*(side("a", 0) + side("b", 1)))
    # --- SRM + covariate balance (events_ab_srm_health algebra)
    nu_a, nu_b = F.col("nu_a"), F.col("nu_b")
    srm = ((nu_a - nu_b) * (nu_a - nu_b)).cast("double") / (nu_a + nu_b)
    mu_a = F.col("su1_a").cast("double") / nu_a
    mu_b = F.col("su1_b").cast("double") / nu_b
    # every second-moment fold below goes through the
    # cancellation-proof exact-numerator helpers (round-11 VERDICT
    # "What's wrong #2"): n*s2 - s1^2 / n*sxy - sx*sy exact in
    # DECIMAL(38,0)/HUGEINT, one double cast — functions/stats.py,
    # mirrored in the oracle AND in the three standalone twins so
    # the field-for-field equality pins (tests/test_round11.py)
    # keep holding
    vu_a = exact_var(F.col("su1_a"), F.col("su2_a"), nu_a)
    vu_b = exact_var(F.col("su1_b"), F.col("su2_b"), nu_b)
    pooled = (vu_a + vu_b) / 2
    ok_bal = (nu_a > 1) & (nu_b > 1) & (pooled > 0)
    # --- Welch t on purchase values (events_ab_welch_ttest algebra)
    np_a, np_b = F.col("np_a"), F.col("np_b")
    mp_a = F.col("sp1_a").cast("double") / np_a
    mp_b = F.col("sp1_b").cast("double") / np_b
    vp_a = exact_var(
        F.col("sp1_a"), F.col("sp2_a"), np_a, frac_digits=6, frac_s2=6
    )
    vp_b = exact_var(
        F.col("sp1_b"), F.col("sp2_b"), np_b, frac_digits=6, frac_s2=6
    )
    se2_a = vp_a / np_a
    se2_b = vp_b / np_b
    se2 = se2_a + se2_b
    ok_w = (np_a > 1) & (np_b > 1) & (se2 > 0)

    # --- delta-method ratio (events_ab_ratio_delta algebra)
    def ratio_stats(tag):
        n = F.col(f"nu_{tag}")
        sx_raw, sy_raw = F.col(f"sp1_{tag}"), F.col(f"sy_{tag}")
        sx = sx_raw.cast("double")
        sy = sy_raw.cast("double")
        r = sx / sy
        my = sy / n
        vx = exact_var(
            sx_raw, F.col(f"sxx_{tag}"), n, frac_digits=6, frac_s2=6
        )
        vy = exact_var(sy_raw, F.col(f"syy_{tag}"), n, frac_digits=0)
        cxy = exact_cov(
            sx_raw, sy_raw, F.col(f"sxy_{tag}"), n,
            frac_digits=6, frac_y=0,
        )
        var_r = (vx - 2 * r * cxy + r * r * vy) / (n * my * my)
        return r, var_r

    r_a, v_a = ratio_stats("a")
    r_b, v_b = ratio_stats("b")
    ok_r = (nu_a > 1) & (nu_b > 1) & (v_a + v_b > 0)
    return w.select(
        nu_a.cast("long").alias("n_users_a"),
        nu_b.cast("long").alias("n_users_b"),
        F.round(srm, 9).alias("srm_chi2"),
        (srm > F.lit(3.841)).alias("srm_flag"),
        F.when(
            ok_bal, F.round((mu_b - mu_a) / F.sqrt(pooled), 9)
        ).alias("smd_events"),
        F.when(
            ok_bal, F.abs((mu_b - mu_a) / F.sqrt(pooled)) > 0.1
        ).alias("imbalance_flag"),
        np_a.cast("long").alias("n_purch_a"),
        np_b.cast("long").alias("n_purch_b"),
        F.round(mp_a, 9).alias("mean_value_a"),
        F.round(mp_b, 9).alias("mean_value_b"),
        F.when(ok_w, F.round((mp_b - mp_a) / F.sqrt(se2), 9)).alias(
            "t_welch"
        ),
        F.when(
            ok_w,
            F.round(
                se2
                * se2
                / (
                    se2_a * se2_a / (np_a - 1)
                    + se2_b * se2_b / (np_b - 1)
                ),
                6,
            ),
        ).alias("df_welch"),
        F.round(r_a, 9).alias("ratio_a"),
        F.round(r_b, 9).alias("ratio_b"),
        F.when(
            ok_r, F.round((r_b - r_a) / F.sqrt(v_a + v_b), 9)
        ).alias("z_ratio"),
    )


register(
    "events_ab_healthcheck",
    oracle=f"""
WITH per_user AS (
  SELECT user_id, COUNT(*) AS y,
    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pn,
    SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
        ELSE CAST(0.0 AS DOUBLE) END AS DECIMAL(38,6))) AS x,
    SUM(CAST(CASE WHEN event_type = 'purchase' THEN value * value
        ELSE CAST(0.0 AS DOUBLE) END AS DECIMAL(38,6))) AS x2
  FROM events GROUP BY user_id
),
users AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      ::BIGINT % 2 AS INT) AS variant, y, pn, x, x2
  FROM per_user
),
per AS (
  SELECT variant, COUNT(*) AS nu, SUM(y) AS su1, SUM(y * y) AS su2,
    SUM(pn) AS np, SUM(x) AS sp1, SUM(x2) AS sp2,
    SUM(CAST(y AS DECIMAL(38,6))) AS sy,
    SUM(CAST(x * x AS DECIMAL(38,6))) AS sxx,
    SUM(CAST(y * y AS DECIMAL(38,6))) AS syy,
    SUM(CAST(x * y AS DECIMAL(38,6))) AS sxy
  FROM users GROUP BY variant
),
w AS (
  SELECT
    MAX(CASE WHEN variant = 0 THEN nu END) AS nu_a,
    MAX(CASE WHEN variant = 0 THEN su1 END) AS su1_a,
    MAX(CASE WHEN variant = 0 THEN su2 END) AS su2_a,
    MAX(CASE WHEN variant = 0 THEN np END) AS np_a,
    MAX(CASE WHEN variant = 0 THEN sp1 END) AS sp1_a,
    MAX(CASE WHEN variant = 0 THEN sp2 END) AS sp2_a,
    MAX(CASE WHEN variant = 0 THEN sy END) AS sy_a,
    MAX(CASE WHEN variant = 0 THEN sxx END) AS sxx_a,
    MAX(CASE WHEN variant = 0 THEN syy END) AS syy_a,
    MAX(CASE WHEN variant = 0 THEN sxy END) AS sxy_a,
    MAX(CASE WHEN variant = 1 THEN nu END) AS nu_b,
    MAX(CASE WHEN variant = 1 THEN su1 END) AS su1_b,
    MAX(CASE WHEN variant = 1 THEN su2 END) AS su2_b,
    MAX(CASE WHEN variant = 1 THEN np END) AS np_b,
    MAX(CASE WHEN variant = 1 THEN sp1 END) AS sp1_b,
    MAX(CASE WHEN variant = 1 THEN sp2 END) AS sp2_b,
    MAX(CASE WHEN variant = 1 THEN sy END) AS sy_b,
    MAX(CASE WHEN variant = 1 THEN sxx END) AS sxx_b,
    MAX(CASE WHEN variant = 1 THEN syy END) AS syy_b,
    MAX(CASE WHEN variant = 1 THEN sxy END) AS sxy_b
  FROM per
),
d AS (
  SELECT nu_a, nu_b, np_a, np_b,
    CAST((nu_a - nu_b) * (nu_a - nu_b) AS DOUBLE) / (nu_a + nu_b)
      AS srm,
    CAST(su1_a AS DOUBLE) / nu_a AS mu_a,
    CAST(su1_b AS DOUBLE) / nu_b AS mu_b,
    ({sql_exact_var("su1_a", "su2_a", "nu_a")}
     + {sql_exact_var("su1_b", "su2_b", "nu_b")}
    ) / 2 AS pooled,
    CAST(sp1_a AS DOUBLE) / np_a AS mp_a,
    CAST(sp1_b AS DOUBLE) / np_b AS mp_b,
    ({sql_exact_var("sp1_a", "sp2_a", "np_a", 6, 6)}) / np_a AS se2_a,
    ({sql_exact_var("sp1_b", "sp2_b", "np_b", 6, 6)}) / np_b AS se2_b,
    CAST(sp1_a AS DOUBLE) / CAST(sy_a AS DOUBLE) AS r_a,
    CAST(sp1_b AS DOUBLE) / CAST(sy_b AS DOUBLE) AS r_b,
    (({sql_exact_var("sp1_a", "sxx_a", "nu_a", 6, 6)})
     - 2 * (CAST(sp1_a AS DOUBLE) / CAST(sy_a AS DOUBLE))
       * ({sql_exact_cov("sp1_a", "sy_a", "sxy_a", "nu_a", 6, 0)})
     + (CAST(sp1_a AS DOUBLE) / CAST(sy_a AS DOUBLE)) * (CAST(sp1_a AS DOUBLE) / CAST(sy_a AS DOUBLE))
       * ({sql_exact_var("sy_a", "syy_a", "nu_a", 0)}))
    / (nu_a * (CAST(sy_a AS DOUBLE) / nu_a) * (CAST(sy_a AS DOUBLE) / nu_a)) AS v_a,
    (({sql_exact_var("sp1_b", "sxx_b", "nu_b", 6, 6)})
     - 2 * (CAST(sp1_b AS DOUBLE) / CAST(sy_b AS DOUBLE))
       * ({sql_exact_cov("sp1_b", "sy_b", "sxy_b", "nu_b", 6, 0)})
     + (CAST(sp1_b AS DOUBLE) / CAST(sy_b AS DOUBLE)) * (CAST(sp1_b AS DOUBLE) / CAST(sy_b AS DOUBLE))
       * ({sql_exact_var("sy_b", "syy_b", "nu_b", 0)}))
    / (nu_b * (CAST(sy_b AS DOUBLE) / nu_b) * (CAST(sy_b AS DOUBLE) / nu_b)) AS v_b
  FROM w
)
SELECT CAST(nu_a AS BIGINT) AS n_users_a,
  CAST(nu_b AS BIGINT) AS n_users_b,
  ROUND(srm, 9) AS srm_chi2,
  srm > CAST(3.841 AS DOUBLE) AS srm_flag,
  CASE WHEN nu_a > 1 AND nu_b > 1 AND pooled > 0
    THEN ROUND((mu_b - mu_a) / SQRT(pooled), 9) END AS smd_events,
  CASE WHEN nu_a > 1 AND nu_b > 1 AND pooled > 0
    THEN ABS((mu_b - mu_a) / SQRT(pooled)) > CAST(0.1 AS DOUBLE) END
    AS imbalance_flag,
  CAST(np_a AS BIGINT) AS n_purch_a,
  CAST(np_b AS BIGINT) AS n_purch_b,
  ROUND(mp_a, 9) AS mean_value_a,
  ROUND(mp_b, 9) AS mean_value_b,
  CASE WHEN np_a > 1 AND np_b > 1 AND se2_a + se2_b > 0
    THEN ROUND((mp_b - mp_a) / SQRT(se2_a + se2_b), 9) END AS t_welch,
  CASE WHEN np_a > 1 AND np_b > 1 AND se2_a + se2_b > 0
    THEN ROUND((se2_a + se2_b) * (se2_a + se2_b)
      / (se2_a * se2_a / (np_a - 1) + se2_b * se2_b / (np_b - 1)), 6)
    END AS df_welch,
  ROUND(r_a, 9) AS ratio_a,
  ROUND(r_b, 9) AS ratio_b,
  CASE WHEN nu_a > 1 AND nu_b > 1 AND v_a + v_b > 0
    THEN ROUND((r_b - r_a) / SQRT(v_a + v_b), 9) END AS z_ratio
FROM d
""",
    doc="A/B experiment-readout composite: SRM + covariate balance "
    "(events_ab_srm_health), Welch's t on purchase values "
    "(events_ab_welch_ttest) and the delta-method ratio metric "
    "(events_ab_ratio_delta) — all from ONE events scan instead of "
    "three (round-10 VERDICT #8).  The user-grain pass carries every "
    "needed moment: per-user event count (SRM/balance + ratio "
    "denominator), per-user purchase-row count and DECIMAL partial "
    "sums of value and value^2 (Welch — decimal addition is "
    "associative, so the two-level fold reproduces the single-level "
    "row fold EXACTLY).  The three standalone queries stay "
    "registered as oracle twins, and tests pin field-for-field "
    "equality between this composite and each single.  Scale: one "
    "user-grain grouped pass (map-side combined) to a 2-row table, "
    "then a 1-row epilogue; strictly cheaper than the three "
    "constituent scans it replaces.",
    tags=("events", "ab-testing", "statistics", "composite", "extension"),
    extended=False,  # gate (round-12 rotation)
)(_ab_healthcheck)


# -- CUSUM drift monitor (round 13) -------------------------------------------

# Tabular CUSUM tuning: reference value (allowance) kappa and decision
# interval h, both on the daily purchase-share scale.  kappa absorbs
# in-control noise; h is the alarm threshold on the accumulated
# deviation.  Pinned literals so both engines fold identical doubles.
_CUSUM_KAPPA = 0.005
_CUSUM_H = 0.05
_CUSUM_BASELINE_DAYS = 7


def _cusum_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided tabular CUSUM over the daily purchase-share path.

    The classic recurrence S+_d = max(0, S+_{d-1} + (x_d - mu0 - k))
    is not directly window-expressible, but its closed form is:
    S+_d = M_d - min(0, min_{j<=d} M_j) where M is the running sum of
    z_d = x_d - mu0 - k (Lindley's recursion / reflected random walk).
    Both the running sum and the running min ARE windows, so the whole
    monitor is two ordered window passes over the O(days) spine — no
    recursion, no driver loop, no UDF.

    mu0 is the pooled purchase share of the first
    ``_CUSUM_BASELINE_DAYS`` days (the burn-in), read off the same
    spine via two 1-row broadcast cross-joins (the in-plan
    scalar-extraction pattern of SURVEY §7.4) — no second events scan.

    Scale shape: ONE map-side-combinable grouped pass over events
    collapses the corpus to the O(days) daily grid; every window after
    that is spine-sized (30 rows here, ~365 rows/year at any data
    scale).  The same shape as events_psi_drift / the mSPRT monitors.

    Exactness: daily shares and z-increments are rounded to 9dp and
    accumulated as DECIMAL(38,9) — the running sum and running min are
    exact and order-independent, so Spark and DuckDB agree bit-for-bit.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("x"),
    )

    d0 = daily.agg(F.min("d").alias("d0"))
    with_base = daily.crossJoin(F.broadcast(d0)).select(
        "d",
        "n",
        "x",
        (
            F.col("d") < F.date_add(F.col("d0"), _CUSUM_BASELINE_DAYS)
        ).alias("is_base"),
    )
    mu = with_base.agg(
        F.round(
            F.sum(F.when(F.col("is_base"), F.col("x"))).cast("double")
            / F.sum(F.when(F.col("is_base"), F.col("n"))),
            9,
        ).alias("mu0")
    )
    with_mu = with_base.crossJoin(F.broadcast(mu))

    zq = "decimal(38,9)"
    rate = F.round(F.col("x").cast("double") / F.col("n"), 9)
    mon = with_mu.where(~F.col("is_base")).select(
        "d",
        "n",
        "x",
        "mu0",
        rate.alias("rate"),
        F.round(rate - F.col("mu0") - F.lit(_CUSUM_KAPPA), 9)
        .cast(zq)
        .alias("z_hi"),
        F.round(F.col("mu0") - rate - F.lit(_CUSUM_KAPPA), 9)
        .cast(zq)
        .alias("z_lo"),
    )

    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = mon.select(
        "d",
        "n",
        "x",
        "mu0",
        "rate",
        F.sum("z_hi").over(wc).alias("m_hi"),
        F.sum("z_lo").over(wc).alias("m_lo"),
    )
    # The subtraction operands are re-cast to DECIMAL(20,9) first:
    # Spark's DECIMAL(38,9) - DECIMAL(38,9) needs precision 39, which
    # clamps back to (38,8) under the default precision-loss rule and
    # silently drops the 9th decimal.  |m| <= days * max|z| < 1e3, so
    # 11 integer digits of headroom are ample at any horizon.
    nq = "decimal(20,9)"
    zero = F.lit(0).cast(nq)
    m_hi = F.col("m_hi").cast(nq)
    m_lo = F.col("m_lo").cast(nq)
    s = cum.select(
        "d",
        "n",
        "x",
        "mu0",
        "rate",
        (m_hi - F.least(zero, F.min(m_hi).over(wc))).alias("s_hi"),
        (m_lo - F.least(zero, F.min(m_lo).over(wc))).alias("s_lo"),
    )
    alarm_hi = F.col("s_hi").cast("double") > F.lit(_CUSUM_H)
    alarm_lo = F.col("s_lo").cast("double") > F.lit(_CUSUM_H)
    return s.select(
        "d",
        "n",
        "x",
        "mu0",
        "rate",
        F.round(F.col("s_hi").cast("double"), 9).alias("s_hi"),
        F.round(F.col("s_lo").cast("double"), 9).alias("s_lo"),
        alarm_hi.alias("alarm_hi"),
        alarm_lo.alias("alarm_lo"),
        F.max((alarm_hi | alarm_lo).cast("int"))
        .over(wc)
        .cast("boolean")
        .alias("drift_decided"),
    ).orderBy("d")


_CUSUM_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
    COUNT(*) AS n,
    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
  FROM events GROUP BY 1
),
d0 AS (SELECT MIN(d) AS d0 FROM daily),
with_base AS (
  SELECT d, n, x,
    d < d0 + INTERVAL {_CUSUM_BASELINE_DAYS} DAY AS is_base
  FROM daily, d0
),
mu AS (
  SELECT ROUND(CAST(SUM(CASE WHEN is_base THEN x END) AS DOUBLE)
               / SUM(CASE WHEN is_base THEN n END), 9) AS mu0
  FROM with_base
),
with_mu AS (SELECT d, n, x, is_base, mu0 FROM with_base, mu),
mon AS (
  SELECT d, n, x, mu0,
    ROUND(CAST(x AS DOUBLE) / n, 9) AS rate,
    CAST(ROUND(ROUND(CAST(x AS DOUBLE) / n, 9) - mu0 - {_CUSUM_KAPPA}, 9)
         AS DECIMAL(38,9)) AS z_hi,
    CAST(ROUND(mu0 - ROUND(CAST(x AS DOUBLE) / n, 9) - {_CUSUM_KAPPA}, 9)
         AS DECIMAL(38,9)) AS z_lo
  FROM with_mu WHERE NOT is_base
),
cum AS (
  SELECT d, n, x, mu0, rate,
    SUM(z_hi) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS m_hi,
    SUM(z_lo) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS m_lo
  FROM mon
),
s AS (
  SELECT d, n, x, mu0, rate,
    m_hi - LEAST(CAST(0 AS DECIMAL(38,9)),
                 MIN(m_hi) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING))
      AS s_hi,
    m_lo - LEAST(CAST(0 AS DECIMAL(38,9)),
                 MIN(m_lo) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING))
      AS s_lo
  FROM cum
)
SELECT d, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x, mu0, rate,
  ROUND(CAST(s_hi AS DOUBLE), 9) AS s_hi,
  ROUND(CAST(s_lo AS DOUBLE), 9) AS s_lo,
  CAST(s_hi AS DOUBLE) > {_CUSUM_H} AS alarm_hi,
  CAST(s_lo AS DOUBLE) > {_CUSUM_H} AS alarm_lo,
  CAST(MAX(CASE WHEN CAST(s_hi AS DOUBLE) > {_CUSUM_H}
                  OR CAST(s_lo AS DOUBLE) > {_CUSUM_H}
            THEN 1 ELSE 0 END)
       OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BOOLEAN)
    AS drift_decided
FROM s
ORDER BY d
"""


register(
    "events_cusum_drift_monitor",
    oracle=_CUSUM_ORACLE,
    doc="Two-sided tabular CUSUM control chart over the daily "
    "purchase-share path: the sequential drift monitor that detects "
    "SMALL persistent shifts PSI/Wasserstein snapshots miss and the "
    "mSPRT (tuned for A/B lift) is not built for.  The recurrence "
    "S_d = max(0, S_{d-1} + z_d) is re-expressed in its Lindley "
    "closed form S_d = M_d - min(0, min_{j<=d} M_j), turning the "
    "sequential loop into two ordered windows (running DECIMAL(38,9) "
    "sum + running min) over the O(days) spine.  mu0 burns in on the "
    f"first {_CUSUM_BASELINE_DAYS} days of the SAME spine (no second "
    "events scan); alarms at S > h with a monotone decided-by-day "
    "cumulative-max readout, the events_ab_sequential_msprt "
    "discipline.  Scale: one map-side-combinable grouped pass over "
    "events, then spine-sized windows only.",
    tags=("statistics", "drift", "cusum", "sequential", "extension"),
    extended=True,
)(_cusum_drift_monitor)


# -- offline changepoint detection: binary segmentation (round 13) -----------

_BINSEG_MIN = 5  # min days on each side of any cut


def _binseg_level_splits(df: DataFrame, level: int) -> DataFrame:
    """Best SSE-reducing cut per segment of ``df`` = (seg, d, n, x, y)
    with y the 1e9-scaled daily rate.  For a cut after rank t the
    piecewise-constant objective maximizes
    f(t) = S_l^2/L_l + S_r^2/L_r (equivalently minimizes the two-sided
    SSE), computed as ONE exact DECIMAL(38,0) numerator
    fnum = S_l^2*L_r + S_r^2*L_l over denom = L_l*L_r, with a single
    IEEE division for the argmax comparison — both engines see
    identical doubles, and ties break on the earlier day.  The split
    gain SSE_parent - SSE_children = (fnum*D - S^2*denom)/(denom*D)
    keeps an exact integer numerator too (headroom: S <= 1e13 at 1e4
    days, so fnum*D <= 2e34 << 1e38).

    All windows partition BY SEGMENT over the O(days) spine — the
    bounded-spine discipline of the CUSUM/mSPRT monitors."""
    from pyspark.sql import Window

    dq = "decimal(38,0)"
    wo = Window.partitionBy("seg").orderBy("d")
    w = wo.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("seg")
    c = df.select(
        "seg",
        "d",
        F.row_number().over(wo).alias("rn"),
        F.sum(F.col("y").cast(dq)).over(w).alias("s_l"),
        F.count(F.lit(1)).over(wall).alias("dd"),
        F.sum(F.col("y").cast(dq)).over(wall).alias("s_tot"),
        F.min("d").over(wall).alias("d_lo"),
        F.max("d").over(wall).alias("d_hi"),
    )
    cand = c.where(
        (F.col("rn") >= _BINSEG_MIN)
        & (F.col("rn") <= F.col("dd") - _BINSEG_MIN)
    ).select(
        "seg",
        "d",
        "d_lo",
        "d_hi",
        "dd",
        "s_tot",
        "s_l",
        F.col("rn").cast("long").alias("l_l"),
        (F.col("dd") - F.col("rn")).cast("long").alias("l_r"),
        (F.col("s_tot") - F.col("s_l")).alias("s_r"),
    )
    f = cand.select(
        "*",
        (
            F.col("s_l") * F.col("s_l") * F.col("l_r")
            + F.col("s_r") * F.col("s_r") * F.col("l_l")
        ).alias("fnum"),
        (F.col("l_l") * F.col("l_r")).alias("denom"),
    ).withColumn(
        "f_cmp", F.col("fnum").cast("double") / F.col("denom")
    )
    pick = (
        f.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("seg").orderBy(
                    F.col("f_cmp").desc(), F.col("d").asc()
                )
            ),
        )
        .where(F.col("rk") == 1)
    )
    return pick.select(
        F.lit(level).cast("int").alias("level"),
        F.col("seg").cast("long").alias("seg"),
        "d_lo",
        "d_hi",
        F.col("d").alias("cp_d"),
        F.col("l_l").alias("left_days"),
        F.col("l_r").alias("right_days"),
        F.round(
            F.col("s_l").cast("double") / F.col("l_l") / F.lit(1e9), 9
        ).alias("left_mean"),
        F.round(
            F.col("s_r").cast("double") / F.col("l_r") / F.lit(1e9), 9
        ).alias("right_mean"),
        F.round(
            (
                F.col("fnum") * F.col("dd")
                - F.col("s_tot") * F.col("s_tot") * F.col("denom")
            ).cast("double")
            / F.col("denom")
            / F.col("dd")
            / F.lit(1e18),
            12,
        ).alias("gain_rate2"),
    )


def _binseg_assign(df: DataFrame, splits: DataFrame) -> DataFrame:
    """Child segment ids after applying ``splits``: seg*2 (+1 right of
    the cut).  The split table is O(segments) — an intentional tiny
    broadcast join."""
    s = splits.select("seg", "cp_d")
    return df.join(F.broadcast(s), "seg", "left").select(
        (
            F.col("seg") * 2
            + F.when(
                F.col("cp_d").isNotNull() & (F.col("d") > F.col("cp_d")), 1
            ).otherwise(0)
        ).alias("seg"),
        "d",
        "n",
        "x",
        "y",
    )


def _changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline changepoint detection on the daily purchase-share path
    via DEPTH-2 BINARY SEGMENTATION (Scott & Knott 1974 lineage; the
    standard offline complement to the sequential CUSUM monitor):
    find the single cut that most reduces the piecewise-constant SSE,
    then recurse once into each side, each side keeping at least
    ``_BINSEG_MIN`` days.

    Output: one row per EXECUTED split — (level, seg, parent range,
    cut day, side lengths, side means, SSE gain in rate^2 units).

    Scale shape: ONE map-side-combinable grouped pass collapses the
    corpus to the O(days) spine; every window after that partitions
    by segment over that spine (30 rows here, ~365/year at any data
    scale).  Rates quantize to 9dp at birth and scale to exact 1e9
    integers, so every prefix sum and objective numerator folds as
    exact DECIMAL(38,0)/HUGEINT integers; the only IEEE steps are the
    argmax comparison and the final reported divisions, identical op
    order in the SQL twin."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("x"),
    )
    rate = F.round(F.col("x").cast("double") / F.col("n"), 9)
    y0 = daily.select(
        F.lit(0).cast("long").alias("seg"),
        "d",
        "n",
        "x",
        F.round(rate * F.lit(1e9), 0).cast("long").alias("y"),
    )
    s1 = _binseg_level_splits(y0, 1)
    a2 = _binseg_assign(y0, s1)
    s2 = _binseg_level_splits(a2, 2)
    return s1.unionByName(s2).orderBy("level", "cp_d")


def _binseg_level_sql(src: str, seg_expr: str, part: str, level: int) -> str:
    """One binseg level as mirrored SQL.  ``part`` is the window
    partition clause ('' for the root level)."""
    over_all = f"OVER ({part})" if part else "OVER ()"
    over_ord = (
        f"OVER ({part} ORDER BY d ROWS UNBOUNDED PRECEDING)"
        if part
        else "OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)"
    )
    pb = part if part else ""
    return f"""
c{level} AS (
  SELECT {seg_expr} AS seg, d,
    row_number() {over_ord} AS rn,
    SUM(CAST(y AS HUGEINT)) {over_ord} AS s_l,
    COUNT(*) {over_all} AS dd,
    SUM(CAST(y AS HUGEINT)) {over_all} AS s_tot,
    MIN(d) {over_all} AS d_lo,
    MAX(d) {over_all} AS d_hi
  FROM {src}
),
f{level} AS (
  SELECT seg, d, d_lo, d_hi, dd, s_tot, s_l,
    CAST(rn AS BIGINT) AS l_l,
    CAST(dd - rn AS BIGINT) AS l_r,
    s_tot - s_l AS s_r,
    s_l*s_l*(dd - rn) + (s_tot - s_l)*(s_tot - s_l)*rn AS fnum,
    CAST(rn AS BIGINT)*(dd - rn) AS denom,
    CAST(s_l*s_l*(dd - rn) + (s_tot - s_l)*(s_tot - s_l)*rn AS DOUBLE)
      / (CAST(rn AS BIGINT)*(dd - rn)) AS f_cmp
  FROM c{level}
  WHERE rn >= {_BINSEG_MIN} AND rn <= dd - {_BINSEG_MIN}
),
split{level} AS (
  SELECT CAST({level} AS INT) AS level, CAST(seg AS BIGINT) AS seg,
    d_lo, d_hi, d AS cp_d, l_l AS left_days, l_r AS right_days,
    ROUND(CAST(s_l AS DOUBLE) / l_l / CAST(1e9 AS DOUBLE), 9)
      AS left_mean,
    ROUND(CAST(s_r AS DOUBLE) / l_r / CAST(1e9 AS DOUBLE), 9)
      AS right_mean,
    ROUND(CAST(fnum*dd - s_tot*s_tot*denom AS DOUBLE)
          / denom / dd / CAST(1e18 AS DOUBLE), 12) AS gain_rate2,
    d AS _cp
  FROM (
    SELECT *,
      row_number() OVER ({pb + " " if pb else ""}ORDER BY f_cmp DESC, d)
        AS rk
    FROM f{level}
  ) WHERE rk = 1
)"""


_BINSEG_ORACLE = (
    f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
    COUNT(*) AS n,
    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
  FROM events GROUP BY 1
),
y0 AS (
  SELECT CAST(0 AS BIGINT) AS seg, d, n, x,
    CAST(ROUND(ROUND(CAST(x AS DOUBLE) / n, 9) * CAST(1e9 AS DOUBLE), 0)
         AS BIGINT) AS y
  FROM daily
),"""
    + _binseg_level_sql("y0", "seg", "", 1)
    + """,
a2 AS (
  SELECT CASE WHEN s._cp IS NOT NULL AND y0.d > s._cp
              THEN y0.seg * 2 + 1 ELSE y0.seg * 2 END AS seg,
    y0.d, y0.n, y0.x, y0.y
  FROM y0 LEFT JOIN split1 s ON TRUE
),"""
    + _binseg_level_sql("a2", "seg", "PARTITION BY seg", 2)
    + """
SELECT level, seg, d_lo, d_hi, cp_d, left_days, right_days,
  left_mean, right_mean, gain_rate2
FROM (
  SELECT * FROM split1
  UNION ALL
  SELECT * FROM split2
) ORDER BY level, cp_d
"""
)


register(
    "events_changepoint_binseg",
    oracle=_BINSEG_ORACLE,
    doc="Offline changepoint detection on the daily purchase-share "
    "path: depth-2 BINARY SEGMENTATION minimizing piecewise-constant "
    "SSE — the retrospective 'when did the metric actually shift?' "
    "complement to the sequential CUSUM/mSPRT monitors.  Per "
    "segment, the best cut maximizes S_l^2/L_l + S_r^2/L_r, carried "
    "as ONE exact DECIMAL(38,0)/HUGEINT numerator over an integer "
    "denominator with a single IEEE division for the argmax "
    "(earlier-day tiebreak); split gains keep exact integer "
    f"numerators too.  Cuts keep >= {_BINSEG_MIN} days per side.  "
    "Scale: one map-side-combinable grouped pass to the O(days) "
    "spine, then segment-partitioned windows on that spine only — "
    "no corpus window, no UDF, no collect.",
    tags=("events", "statistics", "changepoint", "drift", "extension"),
    extended=False,  # gate (round-13b rotation)
)(_changepoint_binseg)


# -- Nelson-Aalen cumulative hazard (round 13) -------------------------------


def _nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm Nelson-Aalen cumulative-hazard curve H(t) = sum d_i/n_i
    on the time-to-first-purchase spine (the events_ab_logrank /
    events_ab_rmst survival setup: t = days from first-seen to first
    purchase, censored at the last observed day; arms = the md5 user
    hash), with the standard variance estimate sum d_i/n_i^2 and the
    Fleming-Harrington survival transform exp(-H) — the
    hazard-accumulation view the KM product-limit curve cannot give
    (hazards ADD across time and across cause decompositions; KM
    multiplies).

    Exactness: per-time increments quantize to 12dp at source and
    fold through DECIMAL(28,12) windows (order-independent); exp is
    the ONE libm call, 9dp-quantized in and 9dp-rounded out (the
    sigmoid discipline).  Risk sets come from the same
    reverse-cumulative window identity as the log-rank plan — no
    self-join, no corpus window: everything after the ONE user-grain
    grouped pass rides the O(arms x distinct event times) spine."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    per_user = ev.groupBy("user_id").agg(
        F.min(day).alias("f"),
        F.min(
            F.when(F.col("event_type") == "purchase", day)
        ).alias("p"),
        F.max(day).alias("l"),
    )
    mx = per_user.agg(F.max("l").alias("maxd"))
    users = per_user.crossJoin(F.broadcast(mx)).select(
        F.when(F.col("p").isNotNull(), F.datediff("p", "f"))
        .otherwise(F.datediff("maxd", "f"))
        .alias("t"),
        F.col("p").isNotNull().cast("int").alias("dead"),
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("variant"),
    )
    grp = users.groupBy("variant", "t").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dead").alias("d"),
    )
    wcum = (
        Window.partitionBy("variant")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = (
        Window.partitionBy("variant")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    risk = grp.select(
        "variant",
        "t",
        "d",
        (
            F.sum("m").over(wall) - F.sum("m").over(wcum) + F.col("m")
        ).alias("n_risk"),
    ).where(F.col("d") > 0)
    nd = F.col("n_risk").cast("double")
    inc = risk.select(
        "variant",
        "t",
        "n_risk",
        "d",
        F.round(F.col("d").cast("double") / nd, 12).alias("dh"),
        F.round(F.col("d").cast("double") / nd / nd, 12).alias("dv"),
    )
    dq = "decimal(28,12)"
    cum = inc.select(
        "variant",
        "t",
        "n_risk",
        "d",
        "dh",
        F.sum(F.col("dh").cast(dq)).over(wcum).cast("double").alias("ch"),
        F.sum(F.col("dv").cast(dq)).over(wcum).cast("double").alias("cv"),
    )
    return cum.select(
        F.col("variant").cast("long").alias("variant"),
        F.col("t").cast("int").alias("t"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_events"),
        "dh",
        F.round("ch", 9).alias("cum_hazard"),
        F.round(F.sqrt("cv"), 9).alias("se_hazard"),
        F.round(F.exp(-F.round(F.col("ch"), 9)), 9).alias("surv_fh"),
    ).orderBy("variant", "t")


register(
    "events_survival_nelson_aalen",
    oracle="""
WITH per_user AS (
  SELECT user_id,
    MIN(CAST(date_trunc('day', ts) AS DATE)) AS f,
    MIN(CASE WHEN event_type = 'purchase'
        THEN CAST(date_trunc('day', ts) AS DATE) END) AS p,
    MAX(CAST(date_trunc('day', ts) AS DATE)) AS l
  FROM events GROUP BY user_id
),
mx AS (SELECT MAX(l) AS maxd FROM per_user),
users AS (
  SELECT CASE WHEN p IS NOT NULL THEN datediff('day', f, p)
              ELSE datediff('day', f, maxd) END AS t,
    CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS dead,
    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2
      AS variant
  FROM per_user, mx
),
grp AS (
  SELECT variant, t, COUNT(*) AS m, SUM(dead) AS d
  FROM users GROUP BY variant, t
),
risk AS (
  SELECT variant, t, d,
    SUM(m) OVER (PARTITION BY variant)
      - SUM(m) OVER (PARTITION BY variant ORDER BY t
                     ROWS UNBOUNDED PRECEDING)
      + m AS n_risk
  FROM grp
),
inc AS (
  SELECT variant, t, n_risk, d,
    ROUND(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE), 12) AS dh,
    ROUND(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
          / CAST(n_risk AS DOUBLE), 12) AS dv
  FROM risk WHERE d > 0
),
cum AS (
  SELECT variant, t, n_risk, d, dh,
    CAST(SUM(CAST(dh AS DECIMAL(28,12)))
         OVER (PARTITION BY variant ORDER BY t ROWS UNBOUNDED PRECEDING)
         AS DOUBLE) AS ch,
    CAST(SUM(CAST(dv AS DECIMAL(28,12)))
         OVER (PARTITION BY variant ORDER BY t ROWS UNBOUNDED PRECEDING)
         AS DOUBLE) AS cv
  FROM inc
)
SELECT CAST(variant AS BIGINT) AS variant,
  CAST(t AS INT) AS t,
  CAST(n_risk AS BIGINT) AS n_risk,
  CAST(d AS BIGINT) AS d_events,
  dh,
  ROUND(ch, 9) AS cum_hazard,
  ROUND(sqrt(cv), 9) AS se_hazard,
  ROUND(exp(-ROUND(ch, 9)), 9) AS surv_fh
FROM cum ORDER BY variant, t
""",
    doc="Per-arm Nelson-Aalen cumulative-hazard curve on the "
    "time-to-first-purchase spine (the events_ab_logrank / "
    "events_ab_rmst setup) — completes the survival family: KM "
    "product-limit (curve), log-rank (test), RMST (effect size), and "
    "now the hazard-scale view where increments ADD: H(t) = sum "
    "d_i/n_i with variance sum d_i/n_i^2 and the Fleming-Harrington "
    "survival transform exp(-H).  Per-time increments quantize to "
    "12dp at source and fold through DECIMAL(28,12) windows; risk "
    "sets from the reverse-cumulative window identity (no "
    "self-join); exp is the one libm call, 9dp in/out.  Scale: ONE "
    "user-grain grouped pass, then O(arms x distinct event times) "
    "spine windows only.",
    tags=("events", "survival", "statistics", "extension"),
    extended=True,
)(_nelson_aalen)


# -- length-2 sequential patterns with unbounded gap (round 13) --------------


def _seq_pair_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user support of every ordered event-type pair
    'A then later B' (any gap): the GSP/PrefixSpan length-2 pattern
    table — the piece the ADJACENT-transition Markov matrix and the
    one fixed-path funnel cannot give (a user who clicks, browses for
    a week, then purchases supports click->purchase here but never as
    an adjacent bigram).

    A user supports (A, B) iff their FIRST A precedes their LAST B —
    an exact existence test computed from the (user, type) first/last
    timestamps, so the corpus collapses in ONE map-side-combinable
    grouped pass and the pair stage fans out at most |types|^2 = 25
    rows per user.  Same-type pairs (A, A) read as 'A recurs'.
    support = users(A->B)/users_total, confidence = users(A->B)/
    users(A), lift = support / (P(A) x P(B)) as one pinned-order
    division chain over exact BIGINT counts.

    Scale shape: user-keyed equi-join of two projections of the same
    bounded (user, type) table — shuffle linear in users x types;
    marginals and the user total attach as tiny broadcasts; output is
    O(|types|^2)."""
    ev = load_table(spark, sf_dir, "events")
    fl = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    tot = ev.agg(
        F.countDistinct("user_id").cast("long").alias("users_total")
    )
    marg = fl.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    ante = fl.select(
        "user_id",
        F.col("event_type").alias("a"),
        F.col("first_ts").alias("a_first"),
    )
    cons = fl.select(
        "user_id",
        F.col("event_type").alias("b"),
        F.col("last_ts").alias("b_last"),
    )
    seq = (
        ante.join(cons, "user_id")
        .where(F.col("a_first") < F.col("b_last"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_seq"))
    )
    out = (
        seq.join(
            F.broadcast(
                marg.select(
                    F.col("event_type").alias("a"),
                    F.col("n_t").alias("n_a"),
                )
            ),
            "a",
        )
        .join(
            F.broadcast(
                marg.select(
                    F.col("event_type").alias("b"),
                    F.col("n_t").alias("n_b"),
                )
            ),
            "b",
        )
        .crossJoin(F.broadcast(tot))
    )
    return out.select(
        "a",
        "b",
        F.col("n_seq").cast("long").alias("n_seq"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "users_total",
        F.round(
            F.col("n_seq").cast("double") / F.col("users_total"), 9
        ).alias("support"),
        F.round(F.col("n_seq").cast("double") / F.col("n_a"), 9).alias(
            "confidence"
        ),
        F.round(
            F.col("n_seq").cast("double")
            * F.col("users_total")
            / F.col("n_a")
            / F.col("n_b"),
            6,
        ).alias("lift"),
    ).orderBy("a", "b")


register(
    "events_seq_pair_rules",
    oracle="""
WITH fl AS (
  SELECT user_id, event_type,
    MIN(ts) AS first_ts, MAX(ts) AS last_ts
  FROM events GROUP BY user_id, event_type
),
tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_total
        FROM events),
marg AS (SELECT event_type, COUNT(*) AS n_t FROM fl GROUP BY event_type),
seq AS (
  SELECT a.event_type AS a, b.event_type AS b, COUNT(*) AS n_seq
  FROM fl a JOIN fl b ON a.user_id = b.user_id
  WHERE a.first_ts < b.last_ts
  GROUP BY 1, 2
)
SELECT s.a, s.b,
  CAST(s.n_seq AS BIGINT) AS n_seq,
  CAST(ma.n_t AS BIGINT) AS n_a,
  CAST(mb.n_t AS BIGINT) AS n_b,
  tot.users_total,
  ROUND(CAST(s.n_seq AS DOUBLE) / tot.users_total, 9) AS support,
  ROUND(CAST(s.n_seq AS DOUBLE) / ma.n_t, 9) AS confidence,
  ROUND(CAST(s.n_seq AS DOUBLE) * tot.users_total / ma.n_t / mb.n_t, 6)
    AS lift
FROM seq s
JOIN marg ma ON ma.event_type = s.a
JOIN marg mb ON mb.event_type = s.b
CROSS JOIN tot
ORDER BY s.a, s.b
""",
    doc="Length-2 sequential-pattern rule table with UNBOUNDED gap "
    "(GSP/PrefixSpan's k=2 stage): distinct-user support of every "
    "ordered 'A then later B' event-type pair via the exact "
    "first(A) < last(B) existence test on per-(user, type) first/"
    "last timestamps — the non-adjacent sequence evidence the "
    "Markov transition matrix (adjacent only) and the fixed-path "
    "funnel cannot express.  support/confidence/lift from exact "
    "BIGINT counts with pinned-order final divisions; same-type "
    "rows read as recurrence.  Scale: one map-side-combinable "
    "(user, type) pass, user-keyed pair join bounded at |types|^2 "
    "rows per user, O(|types|^2) output with broadcast marginals.",
    tags=("events", "sequence", "mining", "analytics", "extension"),
    extended=True,
)(_seq_pair_rules)


# -- inter-arrival burstiness + memory (round 13) ----------------------------


def _burstiness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi (2008) burstiness/memory profile of per-user
    inter-event times: B = (sigma - mu)/(sigma + mu) per user over
    integer-second gaps (-1 = perfectly regular, 0 = Poisson, -> 1 =
    bursty), averaged across users, plus the pooled memory
    coefficient M = corr(g_i, g_{i+1}) over consecutive-gap pairs —
    together they place the event stream on the burstiness-memory
    plane (human activity: B > 0, M ~ 0; periodic machines: B < 0).

    Exactness: gaps are exact epoch-second differences (floor
    division of exact micros); per-user B = (sqrt(nQ - S^2) - S) /
    (sqrt(nQ - S^2) + S) has an exact DECIMAL(38,0) radicand
    (population sigma; the n's cancel), one correctly-rounded sqrt
    and one division, 9dp-rounded at birth then DECIMAL-folded for
    the mean; the memory Pearson keeps every moment exact (seconds
    keep n*Sxy under 1e37 at 1e12 pooled pairs) with divisions in
    pinned order.  Scale: ONE user-partitioned window pass (shuffle
    linear in events), one map-side-combinable per-user aggregate,
    then 1-row epilogues."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    sec = F.expr("unix_micros(ts) DIV 1000000")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", sec.alias("t"), "ts", "event_id")
        .select(
            "user_id",
            (F.col("t") - F.lag("t").over(w)).alias("g"),
            (F.lead("t").over(w) - F.col("t")).alias("g2"),
        )
        .where(F.col("g").isNotNull())
    )
    dq = "decimal(38,0)"
    per_user = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("s"),
        F.sum((F.col("g") * F.col("g")).cast(dq)).alias("q"),
    )
    rad = (
        F.col("n").cast(dq) * F.col("q")
        - F.col("s").cast(dq) * F.col("s").cast(dq)
    )
    sq = F.sqrt(rad.cast("double"))
    b_user = per_user.where(F.col("s") > 0).select(
        F.round(
            (sq - F.col("s").cast("double"))
            / (sq + F.col("s").cast("double")),
            9,
        ).alias("b"),
        "n",
        "s",
    )
    bstats = b_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("n_gaps"),
        F.round(
            F.sum(F.col("b").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mean_burstiness"),
        F.round(
            F.sum(F.when(F.col("b") > 0, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("frac_bursty"),
        F.round(
            F.sum("s").cast("double") / F.sum("n"), 6
        ).alias("mean_gap_sec"),
    )
    pairs = gaps.where(F.col("g2").isNotNull())
    mem = pairs.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("g").alias("sx"),
        F.sum("g2").alias("sy"),
        F.sum((F.col("g") * F.col("g2")).cast(dq)).alias("sxy"),
        F.sum((F.col("g") * F.col("g")).cast(dq)).alias("sxx"),
        F.sum((F.col("g2") * F.col("g2")).cast(dq)).alias("syy"),
    )
    npd = F.col("np").cast(dq)
    cnum = npd * F.col("sxy") - F.col("sx").cast(dq) * F.col("sy").cast(dq)
    vx = npd * F.col("sxx") - F.col("sx").cast(dq) * F.col("sx").cast(dq)
    vy = npd * F.col("syy") - F.col("sy").cast(dq) * F.col("sy").cast(dq)
    memrow = mem.select(
        F.col("np").cast("long").alias("n_pairs"),
        F.when(
            (vx.cast("double") > 0) & (vy.cast("double") > 0),
            F.round(
                cnum.cast("double")
                / F.sqrt(vx.cast("double"))
                / F.sqrt(vy.cast("double")),
                9,
            ),
        ).alias("memory_coeff"),
    )
    return bstats.crossJoin(F.broadcast(memrow))


register(
    "events_burstiness_memory",
    oracle="""
WITH seqd AS (
  SELECT user_id,
    epoch_us(ts) // 1000000 AS t,
    ts, event_id
  FROM events
),
gaps_all AS (
  SELECT user_id,
    t - lag(t) OVER w AS g,
    lead(t) OVER w - t AS g2
  FROM seqd
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
gaps AS (SELECT * FROM gaps_all WHERE g IS NOT NULL),
per_user AS (
  SELECT user_id, COUNT(*) AS n, SUM(g) AS s,
    SUM(CAST(g AS HUGEINT) * g) AS q
  FROM gaps GROUP BY user_id
),
b_user AS (
  SELECT
    ROUND((sqrt(CAST(CAST(n AS HUGEINT) * q
                     - CAST(s AS HUGEINT) * s AS DOUBLE))
           - CAST(s AS DOUBLE))
          / (sqrt(CAST(CAST(n AS HUGEINT) * q
                       - CAST(s AS HUGEINT) * s AS DOUBLE))
             + CAST(s AS DOUBLE)), 9) AS b,
    n, s
  FROM per_user WHERE s > 0
),
bstats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
    CAST(SUM(n) AS BIGINT) AS n_gaps,
    ROUND(CAST(SUM(CAST(b AS DECIMAL(28,12))) AS DOUBLE)
          / COUNT(*), 9) AS mean_burstiness,
    ROUND(CAST(SUM(CASE WHEN b > 0 THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*), 9) AS frac_bursty,
    ROUND(CAST(SUM(s) AS DOUBLE) / SUM(n), 6) AS mean_gap_sec
  FROM b_user
),
pairs AS (SELECT g, g2 FROM gaps WHERE g2 IS NOT NULL),
mem AS (
  SELECT COUNT(*) AS np, SUM(g) AS sx, SUM(g2) AS sy,
    SUM(CAST(g AS HUGEINT) * g2) AS sxy,
    SUM(CAST(g AS HUGEINT) * g) AS sxx,
    SUM(CAST(g2 AS HUGEINT) * g2) AS syy
  FROM pairs
),
memrow AS (
  SELECT CAST(np AS BIGINT) AS n_pairs,
    CASE WHEN CAST(CAST(np AS HUGEINT) * sxx
                   - CAST(sx AS HUGEINT) * sx AS DOUBLE) > 0
          AND CAST(CAST(np AS HUGEINT) * syy
                   - CAST(sy AS HUGEINT) * sy AS DOUBLE) > 0
      THEN ROUND(CAST(CAST(np AS HUGEINT) * sxy
                      - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / sqrt(CAST(CAST(np AS HUGEINT) * sxx
                             - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                 / sqrt(CAST(CAST(np AS HUGEINT) * syy
                             - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 9)
      END AS memory_coeff
  FROM mem
)
SELECT * FROM bstats CROSS JOIN memrow
""",
    doc="Goh-Barabasi burstiness-memory profile of per-user "
    "inter-event times: mean per-user B = (sigma - mu)/(sigma + mu) "
    "over exact integer-second gaps (population sigma with an exact "
    "DECIMAL(38,0)/HUGEINT radicand — the n's cancel), the bursty "
    "share, and the pooled memory coefficient corr(g_i, g_{i+1}) "
    "from exact moment folds — the temporal-texture diagnostic "
    "(human traffic is bursty with weak memory; periodic machine "
    "traffic is the opposite) that mean-rate and seasonality "
    "queries cannot see.  Scale: one user-partitioned window pass "
    "(lag + two leads, shuffle linear), one map-side-combinable "
    "per-user aggregate, 1-row epilogues broadcast-joined.",
    tags=("events", "statistics", "temporal", "extension"),
    extended=True,
)(_burstiness_profile)


# -- Markov removal-effect attribution (round 13) ----------------------------

_MK_TR = ("click", "error", "signup", "view")  # transient channel states
_MK_A = ("start",) + _MK_TR  # states with outgoing transitions
_MK_B = _MK_TR + ("purchase", "nil")  # successor states
_MK_K = 12  # fixed absorption horizon (mass beyond quantizes to ~0)


def _mk_prob_exprs() -> list[str]:
    """Transition-probability expressions over the pivoted count
    columns: p_a_b = c_a_b / t_a (9dp at birth), 0 for states with
    no outgoing mass.  Pure SQL text valid in BOTH engines."""
    out = []
    for a in _MK_A:
        tot = " + ".join(f"c_{a}_{b}" for b in _MK_B)
        out.append(f"({tot}) AS t_{a}")
    for a in _MK_A:
        for b in _MK_B:
            out.append(
                f"CASE WHEN ({' + '.join(f'c_{a}_{bb}' for bb in _MK_B)})"
                f" = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
                f"ROUND(CAST(c_{a}_{b} AS DOUBLE) / "
                f"({' + '.join(f'c_{a}_{bb}' for bb in _MK_B)}), 9) END"
                f" AS p_{a}_{b}"
            )
    return out


def _mk_variants() -> list[str]:
    return ["full"] + [f"no_{c}" for c in _MK_TR]


def _mk_init_exprs() -> list[str]:
    """Iteration-0 state: v = p(start -> s), conv = p(start ->
    purchase); a removed channel starts (and stays) at mass 0."""
    out = []
    for var in _mk_variants():
        removed = var[3:] if var.startswith("no_") else None
        for s in _MK_TR:
            val = "CAST(0.0 AS DOUBLE)" if s == removed else f"p_start_{s}"
            out.append(f"{val} AS v_{var}_{s}")
        out.append(f"p_start_purchase AS conv_{var}")
    return out


def _mk_step_exprs() -> list[str]:
    """One absorption step per variant: fixed alphabetical term
    order, every product 12dp at birth, every sum 12dp."""
    out = []
    for var in _mk_variants():
        removed = var[3:] if var.startswith("no_") else None
        srcs = [a for a in _MK_TR if a != removed]
        for s in _MK_TR:
            if s == removed:
                out.append(f"CAST(0.0 AS DOUBLE) AS v_{var}_{s}")
                continue
            terms = " + ".join(
                f"ROUND(v_{var}_{a} * p_{a}_{s}, 12)" for a in srcs
            )
            out.append(f"ROUND({terms}, 12) AS v_{var}_{s}")
        conv_terms = " + ".join(
            f"ROUND(v_{var}_{a} * p_{a}_purchase, 12)" for a in srcs
        )
        out.append(
            f"ROUND(conv_{var} + {conv_terms}, 12) AS conv_{var}"
        )
    return out


def _mk_final_exprs() -> list[str]:
    """Per-channel readout: removal effect 1 - p_rem/p_full and the
    share over positive effects only (a negative effect means the
    channel was net harmful and earns zero credit)."""
    res = []
    for c in _MK_TR:
        res.append(
            f"CASE WHEN conv_full > 0 THEN "
            f"ROUND(1 - conv_no_{c} / conv_full, 9) END AS re_{c}"
        )
    pos = " + ".join(
        f"CASE WHEN re_{c} > 0 THEN re_{c} ELSE CAST(0.0 AS DOUBLE) END"
        for c in _MK_TR
    )
    res.append(f"({pos}) AS re_pos_total")
    return res


_MK_COUNT_COLS = [f"c_{a}_{b}" for a in _MK_A for b in _MK_B]
_MK_COUNT_KEEP = ", ".join(_MK_COUNT_COLS)


def _markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al. 2014):
    sessionized event paths (30-min gap, truncated at the first
    purchase) become a first-order chain over the four channel
    states with absorbing purchase/abandon states; conversion
    probability from start is computed by a fixed {K}-step
    absorption iteration, once for the full chain and once per
    channel with that channel removed (its inbound mass abandons).
    A channel's credit is its removal effect 1 - p_removed/p_full,
    shared over positive effects.

    The data-driven upgrade of the positional attribution family:
    last-click (asof_purchase_last_click) and U-shaped
    (events_multitouch_attribution) assign credit by rule; the
    removal effect asks the chain what actually breaks without the
    channel.

    Scale shape: two user-partitioned window passes (sessionize +
    order/truncate) and ONE map-side-combinable conditional
    aggregate collapse the corpus to a 30-column 1-row transition
    table; the entire absorption iteration (5 variants x {K} steps)
    is scalar expressions on that single row — the oracle replays
    every layer as a CTE, so each intermediate mass vector is
    hash-pinned.  Every product/sum quantizes where born in fixed
    alphabetical term order, so both engines walk identical doubles.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    us = F.expr("unix_micros(ts)")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(
            F.when(
                (us - F.lag(us).over(w_user)) >= 1800 * 1_000_000, 1
            )
            .otherwise(0)
            .cast("long")
        )
        .over(w_user.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess"),
    )
    w_sess = Window.partitionBy("user_id", "sess").orderBy(
        "ts", "event_id"
    )
    w_all = Window.partitionBy("user_id", "sess")
    rn = sess.select(
        "user_id",
        "sess",
        "event_type",
        F.row_number().over(w_sess).alias("rn"),
    )
    marked = rn.select(
        "user_id",
        "sess",
        "event_type",
        "rn",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        )
        .over(w_all)
        .alias("p_rn"),
        F.max("rn").over(w_all).alias("max_rn"),
    )
    w_rn = Window.partitionBy("user_id", "sess").orderBy("rn")
    kept_a = marked.where(
        F.col("rn") <= F.coalesce(F.col("p_rn"), F.col("max_rn"))
    ).select(
        "user_id",
        "sess",
        "event_type",
        F.row_number().over(w_rn).alias("rn2"),
        F.lag("event_type").over(w_rn).alias("prev"),
    )
    kept = kept_a.select(
        "user_id",
        "sess",
        "event_type",
        "rn2",
        "prev",
        F.max("rn2").over(w_all).alias("last_rn"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .over(w_all)
        .alias("has_p"),
    )
    edges = (
        kept.where(F.col("rn2") == 1)
        .select(F.lit("start").alias("a"), F.col("event_type").alias("b"))
        .unionByName(
            kept.where(F.col("rn2") > 1).select(
                F.col("prev").alias("a"), F.col("event_type").alias("b")
            )
        )
        .unionByName(
            kept.where(
                (F.col("rn2") == F.col("last_rn")) & (F.col("has_p") == 0)
            ).select(
                F.col("event_type").alias("a"), F.lit("nil").alias("b")
            )
        )
    )
    one = edges.agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("a") == a) & (F.col("b") == b), 1
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"c_{a}_{b}")
            for a in _MK_A
            for b in _MK_B
        ]
    )
    probs = one.selectExpr(*_MK_COUNT_COLS, *_mk_prob_exprs())
    state = probs.selectExpr("*", *_mk_init_exprs())
    for step in range(_MK_K):
        keep = (
            _MK_COUNT_COLS
            + [f"t_{a}" for a in _MK_A]
            + [f"p_{a}_{b}" for a in _MK_A for b in _MK_B]
        )
        state = state.selectExpr(*keep, *_mk_step_exprs())
        # codegen stage barrier (round-14, verdict-r13 #5): the
        # 93-projection chain fused into ONE WholeStageCodegen method
        # that exceeded the JVM's 64KB limit — every run paid ~10
        # failed janino compilations of a multi-MB source and then
        # executed the whole chain interpreted.  A repartition(1) on
        # this one-row state every 3 steps is a WSCG boundary: each
        # stage now holds <= 3 absorption layers and compiles.  Values
        # are untouched (same ROUND expressions, same single row; an
        # exchange of one row is microseconds) — the oracle CTE replay
        # pins every layer either way.
        if step % 3 == 2 and step != _MK_K - 1:
            state = state.repartition(1)
    final = state.selectExpr("*", *_mk_final_exprs())
    parts = []
    for c in _MK_TR:
        parts.append(
            final.selectExpr(
                f"'{c}' AS channel",
                f"CAST(t_{c} AS BIGINT) AS n_out",
                "conv_full AS p_conversion",
                f"conv_no_{c} AS p_conversion_removed",
                f"re_{c} AS removal_effect",
                f"CASE WHEN re_pos_total > 0 AND re_{c} > 0 THEN "
                f"ROUND(re_{c} / re_pos_total, 9) "
                f"WHEN re_pos_total > 0 THEN CAST(0.0 AS DOUBLE) END "
                f"AS attribution_share",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("channel")


_markov_attribution.__doc__ = _markov_attribution.__doc__.replace(
    "{K}", str(_MK_K)
)


def _mk_oracle() -> str:
    counts = ",\n    ".join(
        f"CAST(COALESCE(SUM(CASE WHEN a = '{a}' AND b = '{b}' "
        f"THEN 1 END), 0) AS BIGINT) AS c_{a}_{b}"
        for a in _MK_A
        for b in _MK_B
    )
    layers = []
    prev = "it0"
    keep = (
        [_MK_COUNT_KEEP]
        + [f"t_{a}" for a in _MK_A]
        + [f"p_{a}_{b}" for a in _MK_A for b in _MK_B]
    )
    for k in range(1, _MK_K + 1):
        layers.append(
            f"it{k} AS (SELECT {', '.join(keep)}, "
            + ", ".join(_mk_step_exprs())
            + f" FROM {prev})"
        )
        prev = f"it{k}"
    chan_rows = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS channel, CAST(t_{c} AS BIGINT) AS n_out,
  conv_full AS p_conversion,
  conv_no_{c} AS p_conversion_removed,
  re_{c} AS removal_effect,
  CASE WHEN re_pos_total > 0 AND re_{c} > 0
       THEN ROUND(re_{c} / re_pos_total, 9)
       WHEN re_pos_total > 0 THEN CAST(0.0 AS DOUBLE) END
    AS attribution_share
FROM fin"""
        for c in _MK_TR
    )
    return f"""
WITH brk AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
          OVER (PARTITION BY user_id ORDER BY ts, event_id)
          >= 1800000000 THEN 1 ELSE 0 END AS is_brk
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
    SUM(is_brk)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sess
  FROM brk
),
rn AS (
  SELECT user_id, sess, event_type,
    row_number() OVER (PARTITION BY user_id, sess
                       ORDER BY ts, event_id) AS rn,
    ts, event_id
  FROM sess
),
marked AS (
  SELECT *,
    MIN(CASE WHEN event_type = 'purchase' THEN rn END)
      OVER (PARTITION BY user_id, sess) AS p_rn,
    MAX(rn) OVER (PARTITION BY user_id, sess) AS max_rn
  FROM rn
),
kept_a AS (
  SELECT user_id, sess, event_type,
    row_number() OVER (PARTITION BY user_id, sess ORDER BY rn) AS rn2,
    lag(event_type) OVER (PARTITION BY user_id, sess ORDER BY rn)
      AS prev
  FROM marked WHERE rn <= COALESCE(p_rn, max_rn)
),
kept AS (
  SELECT user_id, sess, event_type, rn2, prev,
    MAX(rn2) OVER (PARTITION BY user_id, sess) AS last_rn,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id, sess) AS has_p
  FROM kept_a
),
edges AS (
  SELECT 'start' AS a, event_type AS b FROM kept WHERE rn2 = 1
  UNION ALL
  SELECT prev AS a, event_type AS b FROM kept WHERE rn2 > 1
  UNION ALL
  SELECT event_type AS a, 'nil' AS b FROM kept
  WHERE rn2 = last_rn AND has_p = 0
),
one AS (
  SELECT
    {counts}
  FROM edges
),
probs AS (SELECT {_MK_COUNT_KEEP}, {', '.join(_mk_prob_exprs())}
          FROM one),
it0 AS (SELECT *, {', '.join(_mk_init_exprs())} FROM probs),
{','.join(layers)},
fin AS (SELECT *, {', '.join(_mk_final_exprs())} FROM {prev})
{chan_rows}
ORDER BY channel
"""


register(
    "events_markov_attribution",
    oracle=_mk_oracle(),
    doc="Markov-chain removal-effect attribution (Anderl et al. "
    "2014): sessionized paths (30-min gap, truncated at first "
    "purchase) as a first-order chain over the four channel states "
    "with absorbing purchase/abandon; conversion-from-start via a "
    f"fixed {_MK_K}-step absorption iteration, re-run with each "
    "channel removed; credit = removal effect 1 - p_rem/p_full "
    "shared over positive effects.  The data-driven member of the "
    "attribution family beside last-click and U-shaped positional.  "
    "Scale: two user-partitioned window passes + ONE conditional "
    "aggregate to a 30-column 1-row transition table; the whole "
    "iteration is scalar expressions on that row, every "
    "product/sum 12dp at birth in fixed term order, and the oracle "
    "replays each of the 5x12 absorption layers as CTEs — every "
    "intermediate mass vector hash-pinned.",
    tags=("events", "attribution", "markov", "analytics", "extension"),
    extended=True,
)(_markov_attribution)
