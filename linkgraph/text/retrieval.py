"""BM25 full-text retrieval over an inverted index — the classic sparse
ranking function (Robertson & Zaragoza 2009) re-expressed as three hash
aggregations and one posting-list join.

Reference N/A (the cuGraph fork has no text layer); this rounds out the
engine's similarity-search family (emb_topk / emb_lsh_topk / emb_ivf_topk
are the dense tier, BM25 is the sparse tier a webtext corpus actually
ships with).

100-TB shape:
- postings (term, doc, tf) are ONE map-side-combined shuffle of the token
  stream; document lengths ride the same scan; df(term) is a partial agg
  over postings keyed by term (already co-partitioned after the postings
  shuffle — no second wide exchange).
- the query side is tiny (Q queries x ~10 terms) and is BROADCAST against
  the postings table, so the corpus-scale side is filtered to postings of
  query terms before anything wider happens; scoring is one
  (query, doc)-keyed agg bounded by those postings, never corpus-wide.
- top-k per query is a window over the bounded candidate set (partitions
  = queries), not a global sort.

Integer-exact mode (``exact_int=True``, the driver-oracle tier): all
score arithmetic is BIGINT with explicit DIV steps so DuckDB replays it
bit-for-bit. The idf is the RATIONAL variant
``IDF_SCALE * (2*(N-df)+1) DIV (2*df+1)`` (the argument of Robertson's
log, scaled — same ordering for any fixed corpus); the saturation term
multiplies through by ``1000 * PREC * total_tokens`` so ``dl/avgdl``
stays rational. Float mode (``exact_int=False``) is the textbook
``ln``-idf BM25 for production ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDF_SCALE = 1_000_000
PREC = 1_000_000


def build_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Inverted index: (postings DF[term, doc, tf], doclen DF[doc, dl]).

    One explode + one map-side-combined shuffle keyed by (term, doc);
    doc lengths are a map over the same tokenization.
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.split(F.trim(F.col(text_col)), " ").alias("w"),
    )
    doclen = toks.select("doc", F.size("w").alias("dl"))
    postings = (
        toks.select("doc", F.explode("w").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term", "doc")
        .agg(F.count("*").alias("tf"))
    )
    return postings, doclen


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    qtext_col: str = "text",
    k1_milli: int = 1200,
    b_milli: int = 750,
    exact_int: bool = True,
) -> DataFrame:
    """Top-k BM25 hits per query.

    Returns DF[query_id, rank, doc_id, score] — ``score`` is a BIGINT in
    exact-int mode, DOUBLE otherwise; ties break on doc id ascending so
    the ranking is total and deterministic in both modes.

    ``k1_milli``/``b_milli`` are k1 and b in thousandths (defaults 1.2 /
    0.75, the standard Okapi setting) so exact-int mode never touches a
    float.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    if not (0 <= b_milli <= 1000) or k1_milli < 0:
        raise ValueError("k1_milli must be >= 0 and b_milli in [0, 1000]")

    postings, doclen = build_postings(docs, text_col=text_col, id_col=id_col)
    # df(term) is co-partitioned with postings after the (term, doc)
    # shuffle; stats are two scalar aggregates.
    dft = postings.groupBy("term").agg(F.count("*").alias("df"))
    n_docs, tot_tokens, max_dl = doclen.agg(
        F.count("*"), F.sum("dl"), F.max("dl")
    ).collect()[0]

    if exact_int:
        # BIGINT headroom guards: the saturation numerator is bounded by
        # max_dl (tf <= dl) and the final product by idf_max * part_max.
        numer_max = max_dl * (k1_milli + 1000) * 1000 * PREC * tot_tokens
        part_max = (k1_milli + 1000) * PREC  # numer/denom < (k1+1)*PREC
        if numer_max >= 2**63 or IDF_SCALE * (2 * n_docs + 1) * part_max >= 2**63:
            raise ValueError(
                "exact_int BM25 would overflow BIGINT at this corpus size; "
                "use exact_int=False (float ln-idf mode) for production scale"
            )

    qterms = (
        queries.select(
            F.col(qid_col).alias("qid"),
            F.explode(F.split(F.trim(F.col(qtext_col)), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    # broadcast the tiny query-term list: the corpus-scale postings table
    # is cut to query-term posting lists before any wider op.
    cand = (
        postings.join(F.broadcast(qterms), on="term")
        .join(dft, on="term")
        .join(doclen, on="doc")
    )

    if exact_int:
        # Spark's `/` is float division; the integer DIV chain goes
        # through expr so both engines execute identical BIGINT steps.
        numer = f"tf * CAST({k1_milli + 1000} AS BIGINT) * 1000 * {PREC} * {tot_tokens}"
        denom = (
            f"tf * CAST(1000000 AS BIGINT) * {tot_tokens} + "
            f"{k1_milli} * (({1000 - b_milli}) * CAST({tot_tokens} AS BIGINT) "
            f"+ {b_milli} * dl * {n_docs})"
        )
        idf_s = f"CAST({IDF_SCALE} AS BIGINT) * (2*({n_docs} - df) + 1) DIV (2*df + 1)"
        term_score = F.expr(f"({idf_s}) * (({numer}) DIV ({denom}))")
        score_col = F.sum(term_score).alias("score")
    else:
        idf = F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        avgdl = float(tot_tokens) / float(n_docs)
        k1 = k1_milli / 1000.0
        b = b_milli / 1000.0
        sat = (F.col("tf") * (k1 + 1.0)) / (
            F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
        )
        score_col = F.sum(idf * sat).alias("score")

    scored = cand.groupBy("qid", "doc").agg(score_col)
    rn = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc"))
    )
    return (
        scored.select("qid", "doc", "score", rn.alias("rank"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(qid_col),
            F.col("rank").cast("long").alias("rank"),
            F.col("doc").alias(id_col),
            "score",
        )
    )
