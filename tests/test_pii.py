"""PII operators (operators/pii.py): pattern coverage, redaction
order contract, and engine/oracle regex-dialect agreement."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from diabetes_etl_spark.operators.pii import (
    PII_PATTERNS,
    REDACTION_TOKENS,
    redact_pii,
    with_pii_counts,
)

CASES = [
    ("mail me at jane.doe+spam@mail.example.co today", {"email": 1}),
    ("two mails a@b.io c.d@e-f.org", {"email": 2}),
    ("ssn 123-45-6789 on file", {"ssn": 1}),
    ("call 555-867-5309 or +1 444.555.6666?", {"phone": 2}),
    ("host 192.168.0.1 and 10.0.0.255", {"ipv4": 2}),
    ("clean text, no identifiers here", {}),
    # phone must NOT eat an SSN (3-2-4 grouping != 3-3-4)
    ("id 123-45-6789", {"ssn": 1, "phone": 0}),
]


def _spark_counts(spark, text: str) -> dict[str, int]:
    df = spark.createDataFrame([(text,)], "text string")
    row = with_pii_counts(df).collect()[0]
    return {c: row[f"n_{c}"] for c in PII_PATTERNS}


@pytest.mark.parametrize("text,expect", CASES)
def test_detection_counts(spark, text, expect):
    got = _spark_counts(spark, text)
    for cls in PII_PATTERNS:
        assert got[cls] == expect.get(cls, 0), (cls, text, got)


@pytest.mark.parametrize("text,expect", CASES)
def test_python_re_agrees_with_spark(spark, text, expect):
    """The patterns are written in the Java-regex ∩ RE2 common subset;
    Python's re engine is a third dialect — agreement across all three
    is the portability contract the module docstring promises."""
    got = _spark_counts(spark, text)
    for cls, pat in PII_PATTERNS.items():
        assert len(re.findall(pat, text)) == got[cls], (cls, text)


def test_redaction_replaces_all_and_is_idempotent(spark):
    text = (
        "jane@example.com met 123-45-6789 at 10.1.2.3, "
        "call 555-123-4567 or mail bob@corp.net"
    )
    df = spark.createDataFrame([(text,)], "text string")
    once = df.select(redact_pii(F.col("text")).alias("r")).collect()[0].r
    for tok in REDACTION_TOKENS.values():
        assert tok in once
    for pat in PII_PATTERNS.values():
        assert not re.search(pat, once), (pat, once)
    twice = (
        spark.createDataFrame([(once,)], "text string")
        .select(redact_pii(F.col("text")).alias("r"))
        .collect()[0]
        .r
    )
    assert twice == once


def test_duckdb_dialect_agrees(duck):
    """Every pattern must compile and match identically under RE2
    (DuckDB) — the oracle-side engine for the registered queries."""
    text = (
        "jane@example.com met 123-45-6789 at 10.1.2.3, call 555-123-4567"
    )
    for cls, pat in PII_PATTERNS.items():
        esc = pat.replace("'", "''")
        n = duck.execute(
            f"SELECT len(regexp_extract_all('{text}', '{esc}'))"
        ).fetchone()[0]
        assert n == len(re.findall(pat, text)), cls


# -- k-anonymity / l-diversity (kanonymity_profile) -------------------------


def test_kanonymity_flags_small_and_homogeneous_groups(spark):
    from diabetes_etl_spark.operators.pii import kanonymity_profile

    rows = [("a", 1, "x")] * 5          # big, diverse below
    rows += [("a", 1, "y")] * 3
    rows += [("b", 2, "x")] * 2         # small (risky), homogeneous
    df = spark.createDataFrame(rows, "zip string, age int, diag string")
    out = {
        (r.zip, r.age): r
        for r in kanonymity_profile(
            df, ["zip", "age"], k=4, sensitive_col="diag"
        ).collect()
    }
    big, small = out[("a", 1)], out[("b", 2)]
    assert (big.n_rows, big.is_risky) == (8, False)
    assert (big.l_diversity, big.is_homogeneous) == (2, False)
    assert (small.n_rows, small.is_risky) == (2, True)
    assert (small.l_diversity, small.is_homogeneous) == (1, True)


def test_kanonymity_without_sensitive_col_has_no_diversity_columns(spark):
    from diabetes_etl_spark.operators.pii import kanonymity_profile

    df = spark.createDataFrame([("a", 1)] * 3, "zip string, age int")
    out = kanonymity_profile(df, ["zip"], k=2)
    assert out.columns == ["zip", "n_rows", "is_risky"]


# -- DP noisy counts (round 9) --------------------------------------------------


def test_dp_noise_matches_inverse_cdf_reference(spark, sf_dir):
    """Replays the seeded Laplace draw in pure Python and checks the
    released values; also sanity-bounds noise magnitude."""
    import hashlib
    import math

    from diabetes_etl_spark.plans import all_queries
    from diabetes_etl_spark.sources.tables import load_table

    rows = (
        all_queries(include_extended=True)["pii_dp_noisy_counts"]
        .fn(spark, sf_dir)
        .collect()
    )
    truth = {
        r["c_nationkey"]: r["n"]
        for r in load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for r in rows:
        k = r["c_nationkey"]
        u = int(
            hashlib.md5(f"dp#{k}".encode()).hexdigest()[:8], 16
        ) / 2**32
        if u < 0.5:
            noise = round(math.log(2 * u), 9)
        else:
            noise = -round(math.log(2 * (1 - u)), 9)
        expected = round(truth[k] + noise, 6)
        assert abs(r["noisy_count"] - expected) < 1e-9
        # Laplace(1) noise beyond |12| has probability ~6e-6
        assert abs(r["noisy_count"] - truth[k]) < 12


def test_dp_rerun_releases_identical_values(spark, sf_dir):
    from diabetes_etl_spark.plans import all_queries

    q = all_queries(include_extended=True)["pii_dp_noisy_counts"].fn
    a = sorted(map(tuple, q(spark, sf_dir).collect()))
    b = sorted(map(tuple, q(spark, sf_dir).collect()))
    assert a == b
