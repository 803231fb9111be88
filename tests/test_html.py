"""HTML -> text extraction (operators/html.py) unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from diabetes_etl_spark.operators.html import (
    build_test_page,
    count_links,
    html_to_text,
)


def _extract(spark, html: str) -> str:
    return (
        spark.range(1)
        .select(html_to_text(F.lit(html)).alias("t"))
        .collect()[0]
        .t
    )


def test_scripts_styles_comments_removed_even_with_brackets(spark):
    html = (
        "<p>keep</p><script>if (1 < 2) { s = '</div>'; }</script>"
        "<style>a > b { x: 1 }</style><!-- <p>gone</p> --><p>also</p>"
    )
    assert _extract(spark, html) == "keep\nalso"


def test_block_closers_become_newlines_inline_tags_vanish(spark):
    html = "<h1>Title</h1><p>one <b>bold</b> word</p><p>two</p>"
    assert _extract(spark, html) == "Title\none bold word\ntwo"


def test_entities_decode_once_amp_last(spark):
    html = "<p>a &amp; b &lt;tag&gt; &quot;q&quot; it&#39;s&nbsp;x</p>"
    assert _extract(spark, html) == "a & b <tag> \"q\" it's x"
    # double-escape decodes exactly one level
    assert _extract(spark, "<p>&amp;lt;</p>") == "&lt;"


def test_whitespace_collapses(spark):
    html = "<div>  a   b  </div>\n\n\n<div>\t c </div>"
    assert _extract(spark, html) == "a b\nc"


def test_self_closing_br_hr_break_lines(spark):
    assert _extract(spark, "x<br/>y<hr class='z'>w") == "x\ny\nw"


def test_full_test_page_roundtrip(spark):
    row = (
        spark.createDataFrame([("hello world", "My Title")], "t string, h string")
        .select(
            html_to_text(build_test_page(F.col("t"), F.col("h"))).alias("x"),
            count_links(build_test_page(F.col("t"), F.col("h"))).alias("nl"),
        )
        .collect()[0]
    )
    assert row.x == (
        "My Title\nHome & Start\nAbout\nMy Title\nhello world\n"
        "(c) 1999 \"Corp's\" r & d"
    )
    assert row.nl == 2
