"""HTML -> text extraction as native column expressions.

The web-corpus front door: strip script/style/comment blocks, turn
block-level closers into newlines, drop the remaining tags, decode the
core named entities, and collapse whitespace — the trafilatura-ish
step every public-web training pipeline runs before quality scoring
and dedup, expressed entirely in JVM-side `regexp_replace` chains (no
Python in the hot path).

Every pattern is written in the Java-regex/RE2 COMMON SUBSET — no
backreferences, no lookaround — so the DuckDB oracle can run the
byte-identical pipeline (`duck_html_to_text_sql` emits it) and hash
results against the Spark side.

Entity handling is the standard fixed set (&lt; &gt; &quot; &#39;
&nbsp; &copy; and LAST &amp;, so double-escapes decode once exactly);
numeric character references beyond &#39; are out of scope (regex
replacement cannot synthesize arbitrary codepoints natively) and are
left verbatim, documented here rather than silently mangled.

Scale: each step is one vectorized regexp pass over the column inside
whole-stage codegen — linear, no shuffle, no UDF.  Reference parity:
the reference pipeline ingests pre-extracted text (no HTML stage);
this operator is part of the LLM-data-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied in order.  Kept in one table so the
# Spark chain and the DuckDB SQL emitter cannot drift apart.
_STEPS: list[tuple[str, str]] = [
    # 1. remove non-content blocks wholesale (dotall, non-greedy)
    (r"(?is)<script[^>]*>.*?</script>", ""),
    (r"(?is)<style[^>]*>.*?</style>", ""),
    (r"(?s)<!--.*?-->", ""),
    # 2. block-level boundaries become newlines BEFORE tags vanish
    (
        r"(?i)</(p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|nav|table|tr|title|"
        r"header|footer|section|article|blockquote)>",
        "\n",
    ),
    (r"(?i)<(br|hr)[^>]*>", "\n"),
    # 3. drop every remaining tag
    (r"<[^>]+>", ""),
    # 4. decode the fixed entity set; &amp; LAST so a literal
    #    "&amp;lt;" decodes to "&lt;" (one level), not "<"
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&copy;", "(c)"),
    (r"&amp;", "&"),
    # 5. whitespace discipline: strip line-leading/trailing blanks,
    #    collapse runs of spaces/tabs, collapse blank-line runs
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    # 6. strip edge whitespace (trim() only eats spaces, not \n; the
    #    patterns below behave identically in Java regex and RE2 after
    #    the blank-run collapse above)
    (r"^\s+", ""),
    (r"\s+$", ""),
]


def html_to_text(col: Column) -> Column:
    """The full extraction chain as one nested native expression."""
    out = col
    for pat, rep in _STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def duck_html_to_text_sql(expr: str) -> str:
    """The byte-identical pipeline as a DuckDB SQL expression over
    `expr` — same pattern table, same order."""
    out = expr
    for pat, rep in _STEPS:
        # standard-SQL string literals keep backslashes verbatim —
        # only quotes need escaping (doubling them would corrupt \t
        # into a [backslash,t] class that eats literal "t"s)
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"


def count_links(col: Column) -> Column:
    """Number of <a ...> anchors in the raw HTML (pre-extraction)."""
    return F.size(F.regexp_extract_all(col, F.lit(r"(?i)<a[\s>]"), 0))


def duck_count_links_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '(?i)<a[\\s>]'))"


def build_test_page(text: Column, title: Column) -> Column:
    """Encoder twin: wrap a text column in a deterministic HTML page
    with the hazards the extractor must survive — script/style with
    angle brackets inside, comments, nav boilerplate, entities, and
    attribute-laden tags.  Pure concat, so both engines build the
    byte-identical page from the same fixture row."""
    return F.concat(
        F.lit(
            "<!DOCTYPE html><html><head><title>"
        ),
        title,
        F.lit(
            "</title><style>body { color: #fff; }</style>"
            "<script>if (1 < 2 && 3 > 2) { x = '</div>'; }</script>"
            "</head><body><!-- layout v2 -->"
            '<nav><ul><li><a href="/home">Home &amp; Start</a></li>'
            '<li><a href="/about">About</a></li></ul></nav>'
            "<h1>"
        ),
        title,
        F.lit("</h1><p>"),
        text,
        F.lit(
            "</p><footer>&copy; 1999 &quot;Corp&#39;s&quot; "
            "r&nbsp;&amp;&nbsp;d</footer></body></html>"
        ),
    )


def duck_build_test_page_sql(text_expr: str, title_expr: str) -> str:
    """The same page builder as DuckDB SQL."""
    return (
        "'<!DOCTYPE html><html><head><title>' || " + title_expr + " || "
        "'</title><style>body { color: #fff; }</style>"
        "<script>if (1 < 2 && 3 > 2) { x = ''</div>''; }</script>"
        "</head><body><!-- layout v2 -->"
        "<nav><ul><li><a href=\"/home\">Home &amp; Start</a></li>"
        "<li><a href=\"/about\">About</a></li></ul></nav>"
        "<h1>' || " + title_expr + " || '</h1><p>' || " + text_expr + " || "
        "'</p><footer>&copy; 1999 &quot;Corp&#39;s&quot; "
        "r&nbsp;&amp;&nbsp;d</footer></body></html>'"
    )
