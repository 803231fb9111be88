"""Medallion pipeline engine — the open-source replacement for the
reference's Databricks DLT layer (SURVEY.md §7.3).

The reference declares its dataflow with `@dlt.table` / `@dlt.view`
decorators and wires the DAG implicitly through `dlt.read(name)`
(reference: src/diabetes_etl_pipeline.py:46-92 and passim).  This module
provides the same declarative surface on stock PySpark:

- ``Pipeline.table`` / ``Pipeline.view`` register named dataset builders;
- ``ctx.read(name)`` inside a builder resolves an upstream dataset,
  materializing it on demand (memoized) — demand-driven topological
  execution without an explicit sort;
- expectations (`expect_or_drop`, `expect_all`, `expect_or_fail`)
  mirror DLT data-quality semantics (reference: pipeline:54,109-113):
  drop → filter, warn → pass-through + side metrics, fail → assert;
- two materialization modes: ``views`` (temp views, zero I/O — used by
  the correctness gate) and ``warehouse`` (parquet tables on disk,
  optionally partitioned — the production shape).

Scale notes: a dataset read by several downstream tables (the silver
fan-out, reference pipeline:280-643) is cached once via ``cache=``;
warehouse writes can partition by a date column so downstream scans
partition-prune.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ExpectationFailed(RuntimeError):
    """Raised when an ``expect_or_fail`` expectation is violated
    (DLT semantics: the pipeline update aborts)."""


def _sql_str(s: str) -> str:
    """Escape a Python string for embedding in a single-quoted SQL
    literal (comments and table properties are user-authored text)."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def delta_available(spark: SparkSession) -> bool:
    """True when the Delta Lake runtime is on the session's classpath.

    The reference's table_properties (`pipelines.autoOptimize.managed`,
    src/diabetes_etl_pipeline.py:49-52) imply Delta-backed managed
    tables on Databricks; stock-Spark deployments add the
    `delta-spark` package to get the same format.  This probe gates the
    optional `table_format="delta"` sink path so environments without
    the package (like this sandbox) fall back to parquet with a clear
    error instead of a classpath stack trace mid-write.

    Status note (round 5): installing `delta-spark` was re-evaluated
    and remains unavailable — this sandbox disallows package
    installation (`import delta` fails; no pip access), so the gate
    stays and the Delta path stays exercised only via this probe's
    negative branch.  On a real deployment the same code path lights
    up by launching Spark with the delta-spark package + catalog conf;
    apply_changes then maps onto Delta MERGE (streaming/cdc.py keeps
    the format-independent semantics, including the manifest commit
    protocol for object stores, which Delta's own log subsumes).
    """
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.delta.DeltaLog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def _committed_sink_files(sink_dir: str) -> set[str] | None:
    """File names the streaming file sink has durably committed, parsed
    from its ``_spark_metadata`` log (v1: one JSON SinkFileStatus per
    line).  Returns None when no log exists (not a file-sink dir) —
    callers then fall back to the raw listing.  Filtering the publish
    step through this log means a task file left behind by a failed
    batch can never be published."""
    meta = os.path.join(sink_dir, "_spark_metadata")
    if not os.path.isdir(meta):
        return None
    import json  # noqa: PLC0415

    names: set[str] = set()
    for lf in sorted(os.listdir(meta)):
        if lf.startswith(".") or lf.endswith(".crc"):
            continue
        try:
            with open(os.path.join(meta, lf)) as fh:
                for line in fh:
                    line = line.strip()
                    if not line or line.startswith("v"):
                        continue
                    try:
                        obj = json.loads(line)
                    except ValueError:
                        continue
                    if obj.get("action") == "delete":
                        names.discard(os.path.basename(obj.get("path", "")))
                    elif obj.get("path"):
                        names.add(os.path.basename(obj["path"]))
        except OSError:
            continue
    return names


@dataclass(frozen=True)
class Expectation:
    name: str
    condition: str  # SQL boolean expression
    action: str  # "drop" | "warn" | "fail"


@dataclass(frozen=True)
class CdcSpec:
    """apply_changes configuration (the dlt.apply_changes argument set)."""

    keys: tuple[str, ...]
    sequence_by: str
    scd_type: int = 1
    tiebreak_by: tuple[str, ...] = ()
    apply_as_deletes: str | None = None
    n_buckets: int = 16
    commit_mode: str = "rename"


@dataclass
class Dataset:
    name: str
    fn: Callable[["PipelineContext"], DataFrame]
    kind: str  # "table" | "view"
    comment: str = ""
    expectations: tuple[Expectation, ...] = ()
    streaming: bool = False
    partition_by: tuple[str, ...] = ()
    table_properties: dict[str, str] = field(default_factory=dict)
    cdc: CdcSpec | None = None


class Pipeline:
    """A named collection of dataset builders forming a DAG."""

    def __init__(self, name: str):
        self.name = name
        self.datasets: dict[str, Dataset] = {}

    def _register(self, kind: str, name: str | None, comment: str,
                  expectations: tuple[Expectation, ...], streaming: bool,
                  partition_by: tuple[str, ...],
                  table_properties: dict[str, str] | None = None):
        def deco(fn):
            ds_name = name or fn.__name__
            if ds_name in self.datasets:
                raise ValueError(f"duplicate dataset {ds_name!r}")
            exps = tuple(expectations) + tuple(getattr(fn, "__expectations__", ()))
            self.datasets[ds_name] = Dataset(
                name=ds_name, fn=fn, kind=kind, comment=comment,
                expectations=exps, streaming=streaming,
                partition_by=tuple(partition_by),
                table_properties=dict(table_properties or {}),
            )
            return fn

        return deco

    def table(self, name: str | None = None, comment: str = "",
              streaming: bool = False, partition_by: tuple[str, ...] = (),
              table_properties: dict[str, str] | None = None):
        return self._register("table", name, comment, (), streaming,
                              partition_by, table_properties)

    def view(self, name: str | None = None, comment: str = ""):
        return self._register("view", name, comment, (), False, ())

    def apply_changes(
        self,
        target: str,
        source: str | Callable[["PipelineContext"], DataFrame],
        keys: list[str] | tuple[str, ...],
        sequence_by: str,
        scd_type: int = 1,
        tiebreak_by: tuple[str, ...] = (),
        apply_as_deletes: str | None = None,
        n_buckets: int = 16,
        comment: str = "",
        commit_mode: str = "rename",
    ) -> None:
        """Register a CDC target fed by a change stream — the engine's
        ``dlt.apply_changes``.  ``source`` is either the name of another
        registered (streaming) dataset, whose RAW builder output feeds
        the merge (it is not separately materialized), or a callable
        producing the change stream.  scd_type 1 keeps latest-wins
        state; 2 keeps full version history with __start_at/__end_at
        (streaming/cdc.py has the semantics and the scale notes).
        ``commit_mode="manifest"`` publishes buckets through the
        object-store-safe manifest protocol instead of directory
        renames — required when the warehouse lives on s3/abfss-style
        storage where rename is not atomic.
        """
        if scd_type not in (1, 2):
            raise ValueError(f"unsupported scd_type {scd_type}")

        if callable(source):
            fn = source
        else:

            def fn(ctx: "PipelineContext") -> DataFrame:
                src = self.datasets.get(source)
                if src is None:
                    raise KeyError(
                        f"apply_changes source dataset {source!r} not found"
                    )
                return src.fn(ctx)

        if target in self.datasets:
            raise ValueError(f"duplicate dataset {target!r}")
        self.datasets[target] = Dataset(
            name=target,
            fn=fn,
            kind="table",
            comment=comment,
            streaming=True,
            cdc=CdcSpec(
                keys=tuple(keys),
                sequence_by=sequence_by,
                scd_type=scd_type,
                tiebreak_by=tuple(tiebreak_by),
                apply_as_deletes=apply_as_deletes,
                n_buckets=n_buckets,
                commit_mode=commit_mode,
            ),
        )

    # -- expectation decorators (stack under @table, like dlt) ------------

    @staticmethod
    def expect_or_drop(name: str, condition: str):
        return _attach_expectation(Expectation(name, condition, "drop"))

    @staticmethod
    def expect_all(conds: dict[str, str]):
        def deco(fn):
            for n, c in conds.items():
                _attach_expectation(Expectation(n, c, "warn"))(fn)
            return fn

        return deco

    @staticmethod
    def expect_or_fail(name: str, condition: str):
        return _attach_expectation(Expectation(name, condition, "fail"))


def _attach_expectation(exp: Expectation):
    def deco(fn):
        exps = list(getattr(fn, "__expectations__", ()))
        exps.append(exp)
        fn.__expectations__ = tuple(exps)
        return fn

    return deco


class PipelineContext:
    def __init__(self, runner: "PipelineRunner"):
        self._runner = runner
        self.spark = runner.spark

    def read(self, name: str) -> DataFrame:
        """Resolve an upstream dataset (the dlt.read equivalent)."""
        return self._runner.materialize(name)


class PipelineRunner:
    def __init__(
        self,
        pipeline: Pipeline,
        spark: SparkSession,
        mode: str = "views",
        warehouse: str | None = None,
        checkpoint_dir: str | None = None,
        cache: tuple[str, ...] = (),
        view_prefix: str = "",
        table_format: str = "parquet",
    ):
        if mode not in ("views", "warehouse"):
            raise ValueError(mode)
        if mode == "warehouse" and not warehouse:
            raise ValueError("warehouse mode requires a warehouse dir")
        if table_format not in ("parquet", "delta"):
            raise ValueError(f"unsupported table_format {table_format!r}")
        if table_format == "delta" and not delta_available(spark):
            raise RuntimeError(
                "table_format='delta' requires the Delta Lake runtime "
                "(delta-spark) on the Spark classpath; this session does "
                "not have it — use the parquet default"
            )
        self.table_format = table_format
        self.pipeline = pipeline
        self.spark = spark
        self.mode = mode
        self.warehouse = warehouse
        self.checkpoint_dir = checkpoint_dir or (
            os.path.join(warehouse, "_checkpoints") if warehouse else None
        )
        self.cache = set(cache)
        self.view_prefix = view_prefix
        self._done: dict[str, DataFrame] = {}
        self._in_progress: set[str] = set()
        # single-pass warn metrics (pyspark Observation): observe nodes
        # attached in _apply_expectations land here as "pending"; once
        # a materialization ACTION has run over the observed plan they
        # move to _observed and expectation_metrics() reads them for
        # free (Observation.get blocks until an action — never read a
        # pending one)
        self._pending_obs: dict[str, tuple] = {}
        self._observed: dict[str, tuple] = {}

    # -- execution --------------------------------------------------------

    def run(self, targets: list[str] | None = None) -> dict[str, DataFrame]:
        for name in targets or list(self.pipeline.datasets):
            self.materialize(name)
        return dict(self._done)

    def materialize(self, name: str) -> DataFrame:
        if name in self._done:
            return self._done[name]
        if name in self._in_progress:
            raise ValueError(f"dependency cycle at dataset {name!r}")
        ds = self.pipeline.datasets.get(name)
        if ds is None:
            raise KeyError(f"unknown dataset {name!r}")
        self._in_progress.add(name)
        try:
            df = ds.fn(PipelineContext(self))
            df = self._apply_expectations(ds, df)
            if ds.kind == "view":
                df.createOrReplaceTempView(self.view_prefix + name)
            elif ds.cdc is not None:
                df = self._materialize_cdc(ds, df)
            elif ds.streaming and df.isStreaming:
                df = self._materialize_stream(ds, df)
            elif self.mode == "warehouse":
                df = self._materialize_batch(ds, df)
            else:
                if name in self.cache:
                    df = df.cache()
                df.createOrReplaceTempView(self.view_prefix + name)
            self._done[name] = df
            return df
        finally:
            self._in_progress.discard(name)

    def _apply_expectations(self, ds: Dataset, df: DataFrame) -> DataFrame:
        fail_exps = [e for e in ds.expectations if e.action == "fail"]
        if fail_exps and not df.isStreaming:
            # DLT expect_or_fail semantics: ANY row whose condition is
            # not TRUE (false OR NULL) aborts the update — NULL results
            # are violations, same as expect_or_drop's filter(cond)
            # dropping them.  One combined existence probe (limit(1)
            # keeps it a short-circuit scan, no full count) for all fail
            # conditions, then per-expectation attribution only on the
            # failure path.
            combined = " OR ".join(
                f"NOT coalesce(({e.condition}), false)" for e in fail_exps
            )
            if df.filter(F.expr(combined)).limit(1).count() > 0:
                for e in fail_exps:
                    n_bad = df.filter(
                        F.expr(f"NOT coalesce(({e.condition}), false)")
                    ).count()
                    if n_bad:
                        raise ExpectationFailed(
                            f"dataset {ds.name!r}: expectation {e.name!r} "
                            f"({e.condition}) violated by {n_bad} row(s)"
                        )
        for exp in ds.expectations:
            if exp.action == "drop":
                df = df.filter(F.expr(exp.condition))
        warn = [e for e in ds.expectations if e.action == "warn"]
        if warn and not df.isStreaming:
            # attach a CollectMetrics node so the warn counts ride the
            # materialization scan itself — expectation_metrics() then
            # costs ZERO extra passes for datasets whose write action
            # ran (the DLT event-log behavior; the reference's
            # data_validation_summary re-derives them with a second
            # aggregate, pipeline:645-667).  Attached AFTER the
            # fail-probe and drop filters: rows_checked counts the
            # PUBLISHED rows, and the short-circuit fail probe must not
            # consume the one-shot observation.
            from pyspark.sql import Observation

            obs = Observation()
            df = df.observe(
                obs,
                F.count(F.lit(1)).alias("rows_checked"),
                *[
                    F.sum(
                        F.when(
                            F.expr(
                                f"NOT coalesce(({e.condition}), false)"
                            ),
                            1,
                        ).otherwise(0)
                    ).alias(f"__v_{i}")
                    for i, e in enumerate(warn)
                ],
            )
            self._pending_obs[ds.name] = (obs, warn)
        return df

    def _materialize_cdc(self, ds: Dataset, df: DataFrame) -> DataFrame:
        """Drive an apply_changes dataset: merge the change stream into
        its bucket-partitioned target and expose the resulting state as
        a temp view.  In warehouse mode the target (and checkpoint) are
        durable, so re-runs process only new change files and merge them
        against the previously applied state; in views mode a
        runner-lifetime temp dir gives the same semantics per session.
        """
        import tempfile

        from diabetes_etl_spark.streaming import cdc as cdc_ops

        if not df.isStreaming:
            raise ValueError(
                f"apply_changes dataset {ds.name!r} needs a streaming source"
            )
        if self.warehouse:
            base = self.warehouse
        else:
            if not hasattr(self, "_cdc_tmp"):
                self._cdc_tmp = tempfile.mkdtemp(prefix="cdc_pipeline_")
            base = self._cdc_tmp
        target = os.path.join(base, ds.name)
        ck = os.path.join(
            self.checkpoint_dir or os.path.join(base, "_checkpoints"),
            ds.name,
        )
        spec = ds.cdc
        apply = (
            cdc_ops.apply_changes_scd1
            if spec.scd_type == 1
            else cdc_ops.apply_changes_scd2
        )
        out = apply(
            self.spark,
            df,
            target_dir=target,
            keys=list(spec.keys),
            sequence_col=spec.sequence_by,
            tiebreak_cols=list(spec.tiebreak_by),
            delete_expr=spec.apply_as_deletes,
            n_buckets=spec.n_buckets,
            checkpoint=ck,
            commit_mode=spec.commit_mode,
        )
        if out is None:
            # no changes ever applied: empty state typed EXACTLY like
            # the non-empty output (SCD2 adds validity/tombstone
            # columns), so downstream selects don't flap between runs
            from pyspark.sql.types import BooleanType, StructField, StructType

            fields = list(df.schema.fields)
            if spec.scd_type == 2:
                seq_type = df.schema[spec.sequence_by].dataType
                fields += [
                    StructField("__deleted", BooleanType()),
                    StructField("__start_at", seq_type),
                    StructField("__end_at", seq_type),
                ]
            out = self.spark.createDataFrame([], StructType(fields))
        out.createOrReplaceTempView(self.view_prefix + ds.name)
        return out

    def _materialize_batch(self, ds: Dataset, df: DataFrame) -> DataFrame:
        path = os.path.join(self.warehouse, ds.name)
        writer = df.write.mode("overwrite").format(self.table_format)
        if ds.partition_by:
            writer = writer.partitionBy(*ds.partition_by)
        writer.save(path)
        if ds.name in self._pending_obs:
            # the write was the action over the observed plan — the
            # metrics are now available without any further scan
            self._observed[ds.name] = self._pending_obs.pop(ds.name)
        out = self.spark.read.format(self.table_format).load(path)
        self._register_catalog_table(ds, path)
        out.createOrReplaceTempView(self.view_prefix + ds.name)
        return out

    def _register_catalog_table(
        self, ds: Dataset, path: str, schema=None
    ) -> None:
        """Persist the dataset as an external catalog table over its
        parquet location, carrying the declared ``comment`` and
        ``table_properties`` — the reference declares both on every
        table (src/diabetes_etl_pipeline.py:46-53,82-85) and DLT
        surfaces them through the catalog.  ``DESCRIBE TABLE EXTENDED``
        / ``SHOW TBLPROPERTIES`` show them here the same way.
        """
        # database-qualified so the same-named temp view (which shadows
        # unqualified names) never intercepts the DDL
        fmt = self.table_format
        ident = f"`default`.`{self.view_prefix + ds.name}`"
        self.spark.sql(f"DROP TABLE IF EXISTS {ident}")
        # ONE DDL construction.  Explicit columns are used whenever a
        # schema is available or derivable: required when the location
        # holds no files yet (a streaming table's empty first run —
        # parquet inference throws), and required to declare partition
        # columns.  A schema passed by the caller always wins — the
        # partitioned branch must NOT re-infer from the (possibly
        # empty) location, which was exactly the empty-first-run bug.
        if schema is None and ds.partition_by and fmt == "parquet":
            schema = self.spark.read.format(fmt).load(path).schema
        cols_sql = (
            "("
            + ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema
            )
            + ") "
            if schema is not None
            else ""
        )
        ddl = f"CREATE TABLE {ident} {cols_sql}USING {fmt}"
        if ds.comment:
            ddl += f" COMMENT '{_sql_str(ds.comment)}'"
        if ds.partition_by and fmt == "parquet":
            part = ", ".join(f"`{c}`" for c in ds.partition_by)
            ddl += f" PARTITIONED BY ({part})"
        ddl += f" LOCATION '{_sql_str(path)}'"
        self.spark.sql(ddl)
        if ds.partition_by and fmt == "parquet":
            self.spark.sql(f"ALTER TABLE {ident} RECOVER PARTITIONS")
        if ds.table_properties:
            kv = ", ".join(
                f"'{_sql_str(k)}' = '{_sql_str(str(v))}'"
                for k, v in ds.table_properties.items()
            )
            self.spark.sql(f"ALTER TABLE {ident} SET TBLPROPERTIES ({kv})")

    def _materialize_stream(self, ds: Dataset, df: DataFrame) -> DataFrame:
        """Run a streaming dataset to completion with availableNow —
        the OSS equivalent of the reference's bounded Autoloader ingest
        ("halts after reading available files", pipeline:57-69).
        The checkpoint gives exactly-once across re-runs.

        Fail expectations can't be probed on the unbounded plan (no
        count on a streaming DataFrame), so the stream lands in a
        STAGING sink (the checkpoint's stable partner); each update's
        not-yet-published files are validated there and published to
        the table path only on success — DLT semantics: a failed update
        aborts WITHOUT committing the bad data, and the table keeps its
        last good contents.  Publishing is per-file (unique sink file
        names), so it is idempotent and only the new delta is ever
        validated or moved — no full-table rewrite or rescan per update.

        The staged publish assumes a local-POSIX warehouse path
        (os.listdir + os.link/copy); on an object store the equivalent
        is a manifest-commit protocol (what Delta's transaction log
        provides — see the table_format gate below).
        """
        if self.mode != "warehouse":
            raise ValueError(
                f"streaming dataset {ds.name!r} requires warehouse mode"
            )
        if self.table_format != "parquet":
            # Delta's transactional log is its own commit protocol; the
            # per-file staged publish below is parquet-specific.  A
            # delta streaming sink would validate via time travel +
            # RESTORE instead — not implemented (no delta runtime in
            # this environment to test against).
            raise NotImplementedError(
                "streaming datasets currently support only the parquet "
                "table_format"
            )
        path = os.path.join(self.warehouse, ds.name)
        staging = os.path.join(self.warehouse, "_staging", ds.name)
        checkpoint = os.path.join(self.checkpoint_dir, ds.name)
        q = (
            df.writeStream.format("parquet")
            .option("path", staging)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        os.makedirs(path, exist_ok=True)
        published = set(os.listdir(path))
        committed = _committed_sink_files(staging)
        pending = [
            f
            for f in sorted(os.listdir(staging))
            if f.endswith(".parquet")
            and f not in published
            and (committed is None or f in committed)
        ]
        fail_exps = tuple(
            e for e in ds.expectations if e.action == "fail"
        )
        if fail_exps and pending:
            delta = self.spark.read.parquet(
                *[os.path.join(staging, f) for f in pending]
            )
            # raises ExpectationFailed on violation: nothing published,
            # the table keeps its previous contents; the next run
            # re-validates the same pending files (stays red until the
            # operator intervenes, like a failed DLT update).
            self._apply_expectations(
                Dataset(name=ds.name, fn=ds.fn, kind=ds.kind,
                        expectations=fail_exps),
                delta,
            )
        import shutil  # noqa: PLC0415

        for f in pending:
            # hard-link when possible (atomic, zero-copy), copy as the
            # cross-device fallback
            src, dst = os.path.join(staging, f), os.path.join(path, f)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
        if any(f.endswith(".parquet") for f in os.listdir(path)):
            out = self.spark.read.parquet(path)
            self._register_catalog_table(ds, path)
        else:
            # first run with zero input files: nothing staged or
            # published, and parquet can't infer a schema from an empty
            # dir — fall back to an empty frame with the STREAM's
            # (known) schema so downstream datasets see the right
            # columns instead of an AnalysisException, and register the
            # catalog table with explicit columns for the same reason.
            out = self.spark.createDataFrame([], df.schema)
            self._register_catalog_table(ds, path, schema=df.schema)
        out.createOrReplaceTempView(self.view_prefix + ds.name)
        return out

    # -- data-quality metrics (reference: pipeline:109-113,631-672) -------

    def expectation_metrics(self) -> DataFrame | None:
        """One row per (dataset, expectation): rows checked / violations.

        Computed as a single aggregate per dataset (conditional sums),
        mirroring how the reference re-derives its warn metrics in
        `data_validation_summary` (pipeline:645-667).
        """
        parts = []
        for name, ds in self.pipeline.datasets.items():
            warn = [e for e in ds.expectations if e.action == "warn"]
            if not warn or name not in self._done:
                continue
            if name in self._observed:
                # metrics captured DURING the materialization write —
                # no re-scan; safe to read because the action provably
                # ran (the pending->observed move happens after save())
                obs, warn_obs = self._observed[name]
                vals = obs.get
                rows = [
                    (
                        name,
                        e.name,
                        int(vals["rows_checked"]),
                        int(vals[f"__v_{i}"]),
                    )
                    for i, e in enumerate(warn_obs)
                ]
                parts.append(
                    self.spark.createDataFrame(
                        rows,
                        "dataset string, expectation string, "
                        "rows_checked bigint, violations bigint",
                    )
                )
                continue
            df = self._done[name]
            agg = df.agg(
                F.count(F.lit(1)).alias("rows_checked"),
                *[
                    # non-TRUE (false or NULL) counts as a violation,
                    # matching the fail/drop paths and DLT
                    F.sum(
                        F.when(
                            F.expr(
                                f"NOT coalesce(({e.condition}), false)"
                            ),
                            1,
                        ).otherwise(0)
                    ).alias(f"__v_{i}")
                    for i, e in enumerate(warn)
                ],
            )
            long = agg.select(
                F.expr(
                    "stack("
                    + str(len(warn))
                    + ", "
                    + ", ".join(
                        f"'{e.name}', __v_{i}" for i, e in enumerate(warn)
                    )
                    + ") AS (expectation, violations)"
                ),
                F.col("rows_checked"),
            ).select(
                F.lit(name).alias("dataset"),
                "expectation",
                "rows_checked",
                "violations",
            )
            parts.append(long)
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
