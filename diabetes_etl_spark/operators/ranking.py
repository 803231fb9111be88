"""BM25 relevance ranking over a document corpus — the lexical
retrieval operator (Robertson-Walker Okapi BM25, the default scorer
of Lucene/Elasticsearch and the classic hybrid-search partner of the
embedding ANN family in operators/similarity.py).

score(d, q) = sum over query terms t of
    idf(t) * tf(t,d) * (k1 + 1) / (tf(t,d) + k1 * (1 - b + b*|d|/avgdl))
with idf(t) = ln((N - df(t) + 0.5) / (df(t) + 0.5) + 1)  (Lucene form,
always positive).

Scale shape (100 TB lens): the corpus side is ONE tokenize pass —
per-doc term frequencies for the query terms only (the isin filter
prunes the explode before the aggregate), plus a per-doc length
projection.  Everything query-sized (term dictionary, df counts, idf
weights, the 1-row (N, avgdl) stats) BROADCASTS; the only O(corpus)
shuffle carries (doc_id, term, tf) for matching docs.  Top-k is the
rank-limit pattern from operators/topk.py.

Determinism contract: ln is the one libm call — NOT bit-stable across
engines (measured: ~5% of idf-shaped inputs differ in the last ulp
between the JVM and glibc), so idf is quantized to 9 decimals the
moment it is computed, per-term scores are quantized to 9 decimals,
and the cross-term sum folds through DECIMAL(18,9) — order-free and
exact.  A cross-engine flip would need an idf to land within one ulp
of a 1e-9 rounding boundary (~1e-7 per distinct query term);
the oracle pairing is verified on the pinned fixtures.  All other
arithmetic is IEEE doubles with identical literals and operation
order on both engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from diabetes_etl_spark.operators.text import tokens


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, bm25_score) for every document matching >= 1 query term
    (non-matching docs score 0 and are join-reduced away — at corpus
    scale they are the overwhelming majority and never shuffle)."""
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.size(tokens(F.col(text_col))).alias("__dl"),
    )
    stats = base.agg(
        F.count("*").alias("__n"),
        F.sum("__dl").alias("__total_dl"),
    ).select(
        "__n",
        (F.col("__total_dl").cast("double") / F.col("__n")).alias("__avgdl"),
    )
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    ).filter(F.col("__tok").isin(list(terms)))
    tf = toks.groupBy("__id", "__tok").agg(F.count("*").alias("__tf"))
    df_t = tf.groupBy("__tok").agg(F.count("*").alias("__df"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "__tok",
        F.round(
            F.log(
                (F.col("__n") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
                + F.lit(1.0)
            ),
            9,
        ).alias("__idf"),
    )
    per_term = (
        tf.join(F.broadcast(idf), "__tok")
        .join(base, "__id")
        .crossJoin(F.broadcast(stats))
        .select(
            "__id",
            F.round(
                F.col("__idf")
                * (F.col("__tf") * F.lit(k1 + 1.0))
                / (
                    F.col("__tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b)
                        * F.col("__dl").cast("double")
                        / F.col("__avgdl")
                    )
                ),
                9,
            ).alias("__w"),
        )
    )
    return per_term.groupBy("__id").agg(
        F.sum(F.col("__w").cast("decimal(18,9)"))
        .cast("double")
        .alias("bm25_score")
    ).select(F.col("__id").alias(id_col), "bm25_score")


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k docs by BM25 with a total (score DESC, id ASC) tiebreak —
    deterministic like every ranked output in this repo."""
    scored = bm25_scores(docs, terms, id_col, text_col, k1, b)
    return (
        scored.orderBy(F.desc("bm25_score"), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            "bm25_score",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25_score"), F.col(id_col)))
            .alias("bm25_rank"),
        )
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    of N ranked candidate lists into one hybrid ranking:

        rrf_score(d) = sum over lists L containing d of 1 / (k + rank_L(d))

    — the standard score-free combiner for hybrid retrieval (BM25
    lexical x embedding ANN), robust because it consumes only RANKS,
    so the incomparable score scales of the fused retrievers never
    meet.  ``k_rrf`` = 60 is the paper's constant.

    Scale shape (100 TB lens): every input is a RETRIEVER OUTPUT —
    top-k lists, i.e. query-sized, thousands of rows at most — so the
    fusion is a union of tiny frames plus one bounded groupBy; nothing
    here ever touches the corpus.  The corpus-scale work lives in the
    retrievers being fused (bm25_topk's isin-pruned scan, the LSH/IVF
    ANN profiles), which is exactly the decomposition a production
    hybrid-search stack uses.

    Determinism contract: rank is an INT, so 1/(k+rank) is one IEEE
    division with integer-exact operands — bit-identical cross-engine
    — quantized to 9 decimals at the source (the BM25 ln precedent)
    and summed through DECIMAL(18,9), an order-free exact fold.  Ties
    break (rrf_score DESC, id ASC).

    Output: (id_col, rrf_score, n_lists, rrf_rank); ``topk`` keeps the
    head if given.  Lists must carry distinct ids each (retriever
    outputs do); a doc absent from a list simply contributes nothing.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = [
        r.select(
            F.col(id_col).alias("__id"),
            F.round(
                F.lit(1.0)
                / (F.lit(k_rrf) + F.col(rank_col).cast("int")),
                9,
            )
            .cast("decimal(18,9)")
            .alias("__c"),
        )
        for r in rankings
    ]
    all_c = contribs[0]
    for c in contribs[1:]:
        all_c = all_c.unionByName(c)
    fused = all_c.groupBy("__id").agg(
        F.sum("__c").cast("double").alias("rrf_score"),
        F.count("*").cast("int").alias("n_lists"),
    )
    w = Window.orderBy(F.desc("rrf_score"), F.col("__id"))
    out = fused.select(
        F.col("__id").alias(id_col),
        "rrf_score",
        "n_lists",
        F.row_number().over(w).alias("rrf_rank"),
    )
    if topk is not None:
        out = out.filter(F.col("rrf_rank") <= topk)
    return out
