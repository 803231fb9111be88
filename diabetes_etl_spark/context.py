"""Injectable run context: clock + run-id (SURVEY.md §7.4).

The reference stamps every table with `current_timestamp()` /
`current_date()` and a `uuid()` run id (reference:
src/diabetes_etl_pipeline.py:70,72,182,299,340,385-386,523) — all
nondeterministic, which breaks value-hash comparisons.  Production uses
the real clock; tests inject a fixed instant and run id so outputs are
bit-reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RunContext:
    """Provides the nondeterministic columns, injectably."""

    fixed_now: str | None = None  # "YYYY-MM-DD HH:MM:SS" or None = real clock
    fixed_run_id: str | None = None

    def now(self) -> Column:
        if self.fixed_now is None:
            return F.current_timestamp()
        return F.lit(self.fixed_now).cast("timestamp")

    def today(self) -> Column:
        if self.fixed_now is None:
            return F.current_date()
        return F.lit(self.fixed_now).cast("timestamp").cast("date")

    def run_id(self) -> Column:
        if self.fixed_run_id is None:
            return F.expr("uuid()")
        return F.lit(self.fixed_run_id)


REAL = RunContext()
