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
from diabetes_etl_spark.operators.util import scratch_dir


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


def mmr_topk(
    df: "DataFrame",
    query_ids: "Column",
    k: int = 5,
    lam: float = 0.7,
    pool: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Maximal-Marginal-Relevance diversified top-k (Carbonell &
    Goldstein, SIGIR 1998): per query, greedily select ``k`` vectors
    maximizing ``lam * rel(q, d) - (1 - lam) * max_{s in selected}
    sim(d, s)`` — the standard re-rank that trades pure relevance for
    coverage, used to de-redundantize retrieval shortlists and to
    pick diverse exemplars from a training corpus.

    Output: (query_id, selected_id, mmr_score, mmr_rank), rank 1..k
    in selection order; round 1 scores ``lam * rel`` (empty penalty).

    Scale shape (100 TB lens): the corpus is touched EXACTLY ONCE —
    one broadcast-queries pass computes relevance and the per-query
    top-``pool`` shortlist (rank-limit pattern, no full sort), which
    is materialized; every MMR round after that runs on the
    q x pool shortlist only (a few thousand rows regardless of corpus
    size), joining it against the <= q*k broadcast selected set.  The
    greedy argmax is inherently sequential in k — k is small by
    definition (this is a re-ranker), and each round is one broadcast
    join + one map-side-combined max per shortlist row, never a
    corpus operation.

    Determinism contract: relevance and pairwise similarities are the
    decimal-folded cosines of operators/similarity.py rounded to 9
    digits; ``lam`` multiplies as an IEEE double with the identical
    literal on both engines; argmax ties break on the smaller
    candidate id.
    """

    from diabetes_etl_spark.operators.similarity import dot_exact, with_norm

    spark = df.sparkSession
    base = with_norm(df, vec_col)
    queries = base.filter(query_ids).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    cands = base.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("c_vec"),
        F.col("_norm").alias("c_norm"),
    )
    rel = (
        cands.crossJoin(F.broadcast(queries))
        .filter(F.col("cid") != F.col("qid"))
        .withColumn(
            "rel",
            F.round(
                dot_exact("q_vec", "c_vec")
                / (F.col("q_norm") * F.col("c_norm")),
                9,
            ),
        )
    )
    w_pool = Window.partitionBy("qid").orderBy(
        F.col("rel").desc(), F.col("cid")
    )
    shortlist = (
        rel.withColumn("_rn", F.row_number().over(w_pool))
        .filter(F.col("_rn") <= pool)
        .select("qid", "cid", "rel", "c_vec", "c_norm")
    )
    # one corpus pass: the shortlist (q x pool rows) is the only thing
    # the k greedy rounds ever read
    pool_dir = scratch_dir(spark, "spark_mmr_")
    shortlist.write.mode("overwrite").parquet(pool_dir)
    P = spark.read.parquet(pool_dir)

    lam_c = F.lit(float(lam))
    one_m = F.lit(float(1.0 - lam))
    w_pick = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("cid")
    )

    first = (
        P.withColumn("score", lam_c * F.col("rel"))
        .withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
        .select(
            "qid",
            F.col("cid").alias("sid"),
            F.col("c_vec").alias("s_vec"),
            F.col("c_norm").alias("s_norm"),
            F.col("score").alias("mmr_score"),
            F.lit(1).alias("mmr_rank"),
        )
    )
    selected = first
    for r in range(2, k + 1):
        remaining = P.join(
            selected.select("qid", F.col("sid").alias("cid")),
            ["qid", "cid"],
            "left_anti",
        )
        penal = (
            remaining.join(F.broadcast(selected.select(
                "qid", "sid", "s_vec", "s_norm")), "qid")
            .withColumn(
                "sim",
                F.round(
                    dot_exact("c_vec", "s_vec")
                    / (F.col("c_norm") * F.col("s_norm")),
                    9,
                ),
            )
            .groupBy("qid", "cid", "rel", "c_vec", "c_norm")
            .agg(F.max("sim").alias("maxsim"))
        )
        pick = (
            penal.withColumn(
                "score", lam_c * F.col("rel") - one_m * F.col("maxsim")
            )
            .withColumn("_rn", F.row_number().over(w_pick))
            .filter(F.col("_rn") == 1)
            .select(
                "qid",
                F.col("cid").alias("sid"),
                F.col("c_vec").alias("s_vec"),
                F.col("c_norm").alias("s_norm"),
                F.col("score").alias("mmr_score"),
                F.lit(r).alias("mmr_rank"),
            )
        )
        selected = selected.unionByName(pick)
    return selected.select(
        F.col("qid").alias("query_id"),
        F.col("sid").alias("selected_id"),
        F.round(F.col("mmr_score"), 9).alias("mmr_score"),
        F.col("mmr_rank").cast("int").alias("mmr_rank"),
    )


def rocchio_prf_topk(
    docs: DataFrame,
    terms: Sequence[str],
    fb_k: int = 5,
    exp_k: int = 4,
    beta: float = 0.5,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Rocchio-style pseudo-relevance feedback (Rocchio 1971 /
    Robertson term selection): BM25 with the original query, take the
    top `fb_k` docs as pseudo-relevant, select the `exp_k` strongest
    expansion terms by Robertson offer weight r_t * idf(t) (r_t =
    feedback docs containing t, global idf), and re-score with the
    expanded query where expansion terms carry weight `beta` — the
    classic recall lever of a lexical retrieval stack.

    FULLY relational: the expansion terms never visit the driver —
    they flow as a small DataFrame broadcast into the second scoring
    pass.  Scale shape: one tokenize pass builds (doc, term, tf) and
    doc lengths; term df/idf stay token-KEYED (never a vocabulary
    broadcast); both scoring passes join the corpus tf table against
    a broadcast query frame, so the only corpus-sized shuffles are
    the tf build and the per-doc score fold.  Every float (idf, w,
    offer weight) is ln-quantized/rounded at source and scores fold
    through DECIMAL — ranking is hash-checkable cross-engine.
    """
    spark = docs.sparkSession
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.size(tokens(F.col(text_col))).alias("__dl"),
    )
    stats = base.agg(
        F.count("*").alias("__n"),
        (
            F.sum("__dl").cast("double") / F.count("*")
        ).alias("__avgdl"),
    )
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    )
    tf_all = toks.groupBy("__id", "__tok").agg(
        F.count("*").alias("__tf")
    )
    df_all = tf_all.groupBy("__tok").agg(F.count("*").alias("__df"))
    idf_all = df_all.crossJoin(F.broadcast(stats)).select(
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

    def score(qterms: DataFrame) -> DataFrame:
        per_term = (
            tf_all.join(F.broadcast(qterms), "__tok")
            .join(idf_all, "__tok")
            .join(base, "__id")
            .crossJoin(F.broadcast(stats))
            .select(
                "__id",
                F.round(
                    F.col("__qw")
                    * F.round(
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
                    ),
                    9,
                ).alias("__w"),
            )
        )
        return per_term.groupBy("__id").agg(
            F.sum(F.col("__w").cast("decimal(18,9)"))
            .cast("double")
            .alias("__score")
        )

    q0 = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t) for t in terms])
        ).alias("__tok"),
        F.lit(1.0).alias("__qw"),
    )
    s0 = score(q0)
    fb = (
        s0.orderBy(F.desc("__score"), F.col("__id"))
        .limit(fb_k)
        .select("__id")
    )
    cand = (
        toks.join(F.broadcast(fb), "__id")
        .select("__id", "__tok")
        .distinct()
        .groupBy("__tok")
        .agg(F.count("*").alias("__r"))
        .join(F.broadcast(q0.select("__tok")), "__tok", "left_anti")
        .join(idf_all, "__tok")
        .select(
            "__tok",
            F.round(F.col("__r") * F.col("__idf"), 9).alias("__offer"),
        )
    )
    exp = (
        cand.orderBy(F.desc("__offer"), F.col("__tok"))
        .limit(exp_k)
        .select("__tok", F.lit(beta).alias("__qw"))
    )
    q1 = q0.unionByName(exp)
    s1 = score(q1)
    exp_terms = exp.agg(
        F.array_join(F.array_sort(F.collect_list("__tok")), ",").alias(
            "__exp_terms"
        )
    )
    ranked = (
        s1.orderBy(F.desc("__score"), F.col("__id"))
        .limit(k)
        .select(
            F.col("__id").alias(id_col),
            F.col("__score").alias("prf_score"),
            F.row_number()
            .over(Window.orderBy(F.desc("__score"), F.col("__id")))
            .alias("prf_rank"),
        )
    )
    return ranked.crossJoin(F.broadcast(exp_terms)).select(
        id_col,
        "prf_score",
        "prf_rank",
        F.col("__exp_terms").alias("exp_terms"),
    )


# -- NDCG@k (round 10) --------------------------------------------------------


def ndcg_discounts(k: int) -> list[float]:
    """The k positional discounts log2(pos+1), 12dp-quantized at BUILD
    time so both engines consume identical literals — transcendental
    log2 never evaluates inside either engine (the ln-quantization
    precedent, applied one step earlier)."""
    import math

    return [round(math.log2(pos + 1), 12) for pos in range(1, k + 1)]


def ndcg_at_k(
    scored: DataFrame,
    k: int = 10,
    query_col: str = "query",
    id_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """NDCG@k per query over a (query, doc, score, graded-rel) table:

        DCG@k  = sum_{pos<=k} (2^rel - 1) / log2(pos + 1)   [score order]
        IDCG@k = the same sum under the IDEAL (rel-sorted) order
        NDCG@k = DCG / IDCG   (NULL when IDCG = 0 — no relevant docs)

    Determinism: gains are exact integers (shiftleft, rel bounded by
    the caller's grading), discounts are 12dp build-time literals,
    each term is 12dp-quantized and DECIMAL-folded so the per-query
    sums are order-independent; both rankings carry a total
    (key DESC, id ASC) tiebreak.

    Scale shape: the input is retrieval OUTPUT (per-query candidate
    lists), so everything here is query-sized — two row_number
    windows per query partition and one grouped fold; the corpus
    never enters.
    """
    disc = ndcg_discounts(k)
    darr = F.array(*[F.lit(d) for d in disc])
    # shiftleft's bit count must be a Column here (graded rel), which
    # the pyspark wrapper rejects — go through the SQL parser
    gain = (F.expr(f"shiftleft(1, {rel_col})") - 1).cast("double")
    w_s = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    w_i = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col)
    )
    ranked = scored.select(
        query_col,
        gain.alias("__g"),
        F.row_number().over(w_s).alias("__rs"),
        F.row_number().over(w_i).alias("__ri"),
    )
    term = lambda rank_col: F.when(  # noqa: E731
        F.col(rank_col) <= k,
        F.round(
            F.col("__g") / F.element_at(darr, F.col(rank_col)), 12
        ).cast("decimal(28,12)"),
    )
    return (
        ranked.groupBy(query_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored"),
            F.sum(term("__rs")).cast("double").alias("dcg"),
            F.sum(term("__ri")).cast("double").alias("idcg"),
        )
        .select(
            query_col,
            "n_scored",
            F.round("dcg", 9).alias("dcg"),
            F.round("idcg", 9).alias("idcg"),
            F.when(
                F.col("idcg") > 0,
                F.round(F.col("dcg") / F.col("idcg"), 9),
            ).alias("ndcg"),
        )
    )
