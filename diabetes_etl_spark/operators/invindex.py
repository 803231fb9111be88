"""Inverted-index construction and boolean retrieval — the indexing
slice of the text stack (BM25 in operators/ranking.py scores against
term statistics; this materializes the postings themselves, the
structure a search/dedup/audit pipeline stores).

Scale shape (100 TB lens): the only shuffle carries (term, doc_id)
pairs for DISTINCT terms per document — text never moves.  Postings
aggregate per term with map-side combine; a hot term's full posting
list is the one per-group structure that grows with corpus size, so
``max_postings_per_row`` SHARDS a term's postings into bounded chunks
keyed (term, chunk_idx) — the row-group-sized posting segments a real
index stores (readers merge chunks by doc-id order; chunk boundaries
are deterministic, assigned by ascending doc id).  Conjunctive
retrieval never materializes postings at all: it filters the exploded
pairs to the query terms (a broadcast-size isin) and keeps documents
whose matched-term count equals the query length — one shuffle of
query-matching pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from diabetes_etl_spark.operators.text import tokens
from diabetes_etl_spark.operators.util import widen

_MOD = 1_000_000_007


def _doc_terms(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, term) pairs, distinct per document, lowercased
    whitespace tokens — the exploded index input."""
    return widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(tokens(F.lower(F.col(text_col))))
        ).alias("term"),
    ).filter(F.length("term") > 0)


def postings_checksum(sorted_ids: Column) -> Column:
    """Order-sensitive rolling hash of a sorted posting array —
    pins the EXACT posting list content through a scalar (no
    cross-engine array-serialization ambiguity)."""
    return F.aggregate(
        sorted_ids,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(131) + x) % F.lit(_MOD),
    )


def inverted_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings_per_row: int | None = None,
) -> DataFrame:
    """The inverted index: per term, document frequency and the
    doc-id-sorted posting list with its checksum.

    ``max_postings_per_row=None`` emits one row per term (term, df,
    doc_lo, doc_hi, postings, postings_checksum).  With a bound, a
    term's postings shard into ceil(df/bound)-many (term, chunk_idx)
    rows of at most ``bound`` ids each, chunked by ascending doc id —
    bounded per-row state no matter how hot the term."""
    pairs = _doc_terms(docs, id_col, text_col)
    if max_postings_per_row is None:
        return (
            pairs.groupBy("term")
            .agg(
                F.count("*").alias("df"),
                F.min("doc_id").alias("doc_lo"),
                F.max("doc_id").alias("doc_hi"),
                F.sort_array(F.collect_list("doc_id")).alias("postings"),
            )
            .withColumn("postings_checksum", postings_checksum(F.col("postings")))
        )
    from pyspark.sql.window import Window

    w = Window.partitionBy("term").orderBy("doc_id")
    chunked = pairs.withColumn(
        "chunk_idx",
        ((F.row_number().over(w) - 1) / max_postings_per_row).cast("int"),
    )
    return (
        chunked.groupBy("term", "chunk_idx")
        .agg(
            F.count("*").alias("df"),
            F.min("doc_id").alias("doc_lo"),
            F.max("doc_id").alias("doc_hi"),
            F.sort_array(F.collect_list("doc_id")).alias("postings"),
        )
        .withColumn("postings_checksum", postings_checksum(F.col("postings")))
    )


def conjunctive_search(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents containing ALL query terms (boolean AND): the
    posting-intersection result computed without materializing
    postings — filter the (doc, distinct-term) pairs to the query set,
    count matches per doc, keep count == |terms|.  Returns doc_id
    rows."""
    if not terms:
        raise ValueError("conjunctive_search needs at least one term")
    pairs = _doc_terms(docs, id_col, text_col)
    return (
        pairs.filter(F.col("term").isin([t.lower() for t in terms]))
        .groupBy("doc_id")
        .agg(F.count("*").alias("__hits"))
        .filter(F.col("__hits") == len(set(t.lower() for t in terms)))
        .select("doc_id")
    )


# -- incremental index maintenance (segment model) ---------------------------
#
# The continuous-ingest form mirrors how real search engines grow: a
# batch APPENDS its own posting segment (cost ∝ batch — the stored
# index is never read, let alone rewritten), readers MERGE segments
# per term on the fly, and a scheduled COMPACTION folds segments back
# into canonical bounded chunks (cost ∝ index, run like OPTIMIZE).
# Storage is the VersionedTable, so every append/compaction is one
# atomic manifest commit and `app_txn` gives exactly-once when driven
# from a change feed cursor.


def append_posting_segment(
    store,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings_per_row: int | None = None,
    app_txn: tuple[str, int] | None = None,
) -> int:
    """Append one insert-only batch's postings as a NEW segment.
    Doc-id spaces must be disjoint across batches (insert-only
    contract, like the aggmaint fact deltas)."""
    seg = inverted_postings(docs, id_col, text_col, max_postings_per_row)
    if "chunk_idx" not in seg.columns:
        seg = seg.withColumn("chunk_idx", F.lit(0))
    seg = seg.select(
        "term", "chunk_idx", "df", "doc_lo", "doc_hi",
        "postings", "postings_checksum",
    )
    if store.history():
        return store.append(seg, app_txn=app_txn)
    return store.overwrite(seg, app_txn=app_txn)


def merged_postings(store) -> DataFrame:
    """Reader-side segment merge: per term, the union of every
    segment's postings as one sorted list + checksum — row-identical
    to a from-scratch :func:`inverted_postings` over all ingested
    documents (pinned in tests).  Cost ∝ postings read; terms are the
    shuffle key."""
    return (
        store.read()
        .select("term", F.explode("postings").alias("doc_id"))
        .groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.min("doc_id").alias("doc_lo"),
            F.max("doc_id").alias("doc_hi"),
            F.sort_array(F.collect_list("doc_id")).alias("postings"),
        )
        .withColumn("postings_checksum", postings_checksum(F.col("postings")))
    )


def compact_postings(
    store, max_postings_per_row: int | None = None
) -> int:
    """Fold all segments back into canonical bounded chunks (the
    OPTIMIZE step): one atomic overwrite; time travel keeps the
    pre-compaction segment layout readable."""
    from pyspark.sql.window import Window

    pairs = store.read().select(
        "term", F.explode("postings").alias("doc_id")
    )
    if max_postings_per_row is None:
        canon = (
            pairs.groupBy("term")
            .agg(
                F.count("*").alias("df"),
                F.min("doc_id").alias("doc_lo"),
                F.max("doc_id").alias("doc_hi"),
                F.sort_array(F.collect_list("doc_id")).alias("postings"),
            )
            .withColumn("chunk_idx", F.lit(0))
        )
    else:
        w = Window.partitionBy("term").orderBy("doc_id")
        canon = (
            pairs.withColumn(
                "chunk_idx",
                ((F.row_number().over(w) - 1) / max_postings_per_row).cast(
                    "int"
                ),
            )
            .groupBy("term", "chunk_idx")
            .agg(
                F.count("*").alias("df"),
                F.min("doc_id").alias("doc_lo"),
                F.max("doc_id").alias("doc_hi"),
                F.sort_array(F.collect_list("doc_id")).alias("postings"),
            )
        )
    canon = canon.select(
        "term", "chunk_idx", "df", "doc_lo", "doc_hi", "postings",
        postings_checksum(F.col("postings")).alias("postings_checksum"),
    )
    return store.overwrite(canon)
