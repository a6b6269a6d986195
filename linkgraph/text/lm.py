"""Corpus n-gram language-model count tables.

The artifact every web-corpus LM pipeline materializes before training or
filtering (CCNet/KenLM-style): per-order n-gram counts plus Kneser-Ney
continuation counts (number of DISTINCT left contexts, the numerator of
the KN lower-order distribution). `text/pipeline.py:ccnet_perplexity`
scores documents against a hashed bigram model; this module produces the
raw count tables themselves, over the real token strings.

Reference N/A (no corpus-LM tooling in the 2021 cuGraph fork); semantics
follow Kneser-Ney 1995 / Chen-Goodman 1998 continuation counts.

Physical shape at 100 TB:
- gram construction is an array transform over the whitespace token
  array — zero shuffles, no self-joins, no windows on the corpus;
- ONE map-side-combined (ord, gram) count aggregation for the corpus
  pass (duplicate grams collapse in partial agg, so hot grams — "the",
  "of the" — never concentrate rows on one reducer);
- continuation counts derive from the ALREADY-AGGREGATED (k+1)-gram
  table (vocabulary-scale, not corpus-scale): each aggregated row is a
  distinct gram string, so "distinct left contexts of a suffix" is a
  plain count(*) grouped by the suffix — no countDistinct shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grams(toks: Column, k: int) -> Column:
    """array<string> of order-``k`` grams (space-joined); empty when the
    doc has fewer than ``k`` tokens (sequence(1, n) DESCENDS for n < 1,
    so the position list is gated)."""
    n = F.size(toks) - F.lit(k - 1)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_lm_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """DF[ord, gram, cnt, cont_cnt] — corpus n-gram counts for orders
    1..``n_max`` over lowercased whitespace tokens, with Kneser-Ney
    continuation counts (distinct left-context tokens, 0 for the top
    order where no (k+1)-gram table exists).

    ``min_count`` filters the OUTPUT only; continuation counts are
    derived from the unfiltered (k+1)-gram vocabulary, as KN requires.
    """
    if n_max < 1:
        raise ValueError("n_max must be >= 1")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    toks = F.split(F.lower(F.trim(F.col(text_col))), " ")
    per_order = [
        df.select(
            F.lit(k).cast("long").alias("ord"),
            F.explode(_grams(toks, k)).alias("gram"),
        )
        for k in range(1, n_max + 1)
    ]
    allg = per_order[0]
    for p in per_order[1:]:
        allg = allg.unionByName(p)
    cnts = allg.groupBy("ord", "gram").agg(F.count("*").alias("cnt"))

    # continuation: every aggregated (k+1)-gram row is a DISTINCT gram
    # string -> count(*) by suffix == countDistinct(first token)
    higher = cnts.filter(F.col("ord") >= 2)
    cont = (
        higher.select(
            (F.col("ord") - 1).alias("ord"),
            F.expr("substring(gram, instr(gram, ' ') + 1)").alias("gram"),
        )
        .groupBy("ord", "gram")
        .agg(F.count("*").alias("cont_cnt"))
    )
    out = (
        cnts.join(cont, on=["ord", "gram"], how="left")
        .select(
            "ord",
            "gram",
            F.col("cnt").cast("long").alias("cnt"),
            F.coalesce(F.col("cont_cnt"), F.lit(0)).cast("long").alias("cont_cnt"),
        )
    )
    if min_count > 1:
        out = out.filter(F.col("cnt") >= min_count)
    return out
