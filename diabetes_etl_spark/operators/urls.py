"""URL normalization / host analytics — the web-crawl slice of a
training-data pipeline (per-domain budgets, suffix filtering, dedup by
canonical URL all start from these parts).

All native expressions: ``parse_url`` (JVM, codegen) splits
scheme/host/path/query, and registrable-domain extraction is a
suffix-list match over the host labels — no UDF, no shuffle; at
100 TB this is a scan-local projection feeding whatever per-domain
aggregate comes next.

The registrable-domain rule uses a SMALL embedded public-suffix
subset (enough for the multi-label suffixes that actually appear in
crawl heads: co.uk/com.au/co.jp/...) — the honest contract is
"longest matching suffix from the configured list, else the last
label", which is exactly how the full PSL algorithm works; swap in
the complete list for production crawls.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Multi-label public suffixes recognized by the demo list; single-label
# suffixes (com/org/net/...) need no list — the fallback rule covers
# them.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp", "com.br",
    "co.in", "com.cn", "com.mx",
)


def url_host(url: Column) -> Column:
    return F.lower(F.parse_url(url, F.lit("HOST")))


def url_path(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def url_query_param(url: Column, key: str) -> Column:
    return F.parse_url(url, F.lit("QUERY"), F.lit(key))


def registrable_domain(host: Column) -> Column:
    """example.co.uk from www.example.co.uk; example.com from
    a.b.example.com (longest configured multi-label suffix wins, else
    last-two-labels)."""
    out = None
    for suf in MULTI_LABEL_SUFFIXES:
        n = suf.count(".") + 2  # labels in suffix + 1 for the domain
        cond = host.endswith("." + suf) | (host == suf)
        dom = _last_labels(host, n)
        out = F.when(cond, dom) if out is None else out.when(cond, dom)
    return out.otherwise(_last_labels(host, 2))


def _last_labels(host: Column, n: int) -> Column:
    parts = F.split(host, r"\.")
    sz = F.size(parts)
    return F.concat_ws(
        ".", F.slice(parts, F.greatest(sz - (n - 1), F.lit(1)), F.lit(n))
    )


def with_url_parts(df, url_col: str = "url"):
    """df + host / domain / path / ref (the canonical projection)."""
    url = F.col(url_col)
    host = url_host(url)
    return (
        df.withColumn("host", host)
        .withColumn("domain", registrable_domain(host))
        .withColumn("path", url_path(url))
        .withColumn("ref", url_query_param(url, "ref"))
    )


# Case-insensitive, and matches VALUELESS params too ("?gclid",
# "?UTM_SOURCE=x" — both appear in real crawls; the query string is
# not lowercased by canonicalization, only the authority is).
_TRACKING_RE = r"(?i)^(utm_[^=&]*|gclid|fbclid)(=.*)?$"


def canonical_url(url: Column) -> Column:
    """Crawl-dedup URL canonicalization, all native expressions:

    - scheme pinned https, authority lowercased, default ``:443``
      stripped (non-default ports kept);
    - fragment dropped (parse_url QUERY already excludes it);
    - tracking params (``utm_*``, ``gclid``, ``fbclid``) removed,
      survivors SORTED so param order cannot split a dup group;
    - single trailing slash stripped from the path.

    The canonical form is a pure per-row function — a narrow
    projection in any plan; dedup is then an ordinary groupBy on the
    canonical string.
    """
    auth = F.regexp_replace(
        F.lower(F.parse_url(url, F.lit("AUTHORITY"))), ":443$", ""
    )
    path = F.regexp_replace(
        F.parse_url(url, F.lit("PATH")), "/$", ""
    )
    params = F.filter(
        F.split(F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit("")), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        F.lit("https://"),
        auth,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(
            F.lit("")
        ),
    )
