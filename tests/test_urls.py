"""URL operators (operators/urls.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diabetes_etl_spark.operators.urls import (
    registrable_domain,
    url_host,
    with_url_parts,
)

CASES = [
    ("https://www.example.com/a/b?ref=x", "www.example.com", "example.com", "/a/b", "x"),
    ("https://cdn.shop.example.co.uk:8080/p", "cdn.shop.example.co.uk", "example.co.uk", "/p", None),
    ("http://example.org", "example.org", "example.org", "", None),
    ("https://a.b.c.site.com.au/x?ref=y&z=1", "a.b.c.site.com.au", "site.com.au", "/x", "y"),
    ("https://co.uk/odd", "co.uk", "co.uk", "/odd", None),
    ("https://EXAMPLE.NET/Q", "example.net", "example.net", "/Q", None),
]


@pytest.mark.parametrize("url,host,domain,path,ref", CASES)
def test_url_parts(spark, url, host, domain, path, ref):
    df = spark.createDataFrame([(url,)], "url string")
    row = with_url_parts(df).collect()[0]
    assert row.host == host
    assert row.domain == domain
    assert (row.path or "") == path
    assert row.ref == ref


def test_registrable_domain_is_scan_local(spark):
    """No shuffle, no UDF: the projection must stay inside one
    whole-stage-codegen span over the scan."""
    df = spark.range(10).select(
        F.concat(F.lit("https://w.ex"), F.col("id").cast("string"), F.lit(".co.uk/p")).alias("url")
    )
    out = with_url_parts(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_host_strips_port_and_lowercases(spark):
    df = spark.createDataFrame([("https://WWW.Ex.COM:9443/a",)], "url string")
    assert df.select(url_host(F.col("url")).alias("h")).collect()[0].h == "www.ex.com"


def test_bare_multilabel_suffix_degenerates_gracefully(spark):
    df = spark.createDataFrame([("ex.co.uk",), ("x.com",)], "host string")
    got = [r.d for r in df.select(registrable_domain(F.col("host")).alias("d")).collect()]
    assert got == ["ex.co.uk", "x.com"]
