"""Text analysis ops for training-data pipelines over a documents table.

All pure built-in-expression implementations (JVM-side, whole-stage codegen)
— no Python in the hot path. These are the engine-level general forms; the
driver-contract queries (linkgraph/queries.py) pin specific parameters so
their DuckDB oracles stay byte-equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LANG_MARKERS: list[tuple[str, str]] = [
    ("en", " the "),
    ("de", " der "),
    ("fr", " les "),
    ("es", " los "),
]


def token_count(text: Column | str) -> Column:
    """Whitespace token count (single-space tokenizer, trim first)."""
    return F.size(F.split(F.trim(text), " ")).cast("long")


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish subword proxy: word-boundary pieces + digit runs + punctuation
    as separate tokens (a regex approximation of byte-pair segmentation used
    for cheap token budgeting)."""
    pieces = F.regexp_extract_all(
        F.col(text) if isinstance(text, str) else text,
        F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"),
        0,
    )
    return F.size(pieces).cast("long")


def marker_count(text: Column | str, marker: str) -> Column:
    """Occurrences of a fixed marker substring (length-difference trick —
    exact, vectorized, and expressible identically in ANSI SQL)."""
    t = F.col(text) if isinstance(text, str) else text
    return ((F.length(t) - F.length(F.replace(t, F.lit(marker)))) / len(marker)).cast(
        "long"
    )


def language_id(
    text: Column | str, markers: list[tuple[str, str]] | None = None
) -> Column:
    """Marker-occurrence language heuristic; argmax with fixed priority
    order, 'unknown' when no marker occurs."""
    markers = markers or DEFAULT_LANG_MARKERS
    counts = {lang: marker_count(text, m) for lang, m in markers}
    mx = F.greatest(*counts.values())
    pred = F.when(mx <= 0, F.lit("unknown"))
    for lang, _ in markers:
        pred = pred.when(counts[lang] == mx, F.lit(lang))
    return pred


def fingerprint(text: Column | str) -> Column:
    """Whitespace-normalized lowercase md5 document fingerprint."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(t), r"\s+", " "))


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: char/token counts, mean token length,
    punctuation & digit ratios, and a composite is_low_quality flag (the
    usual pretraining-filter heuristics)."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tok = token_count(t)
    n_punct = F.size(
        F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0)
    ).cast("long")
    n_digit = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), 0)).cast("long")
    out = df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        (n_chars / F.greatest(n_tok, F.lit(1))).alias("mean_token_len"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (n_digit / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
    )
    return out.withColumn(
        "is_low_quality",
        (F.col("n_tokens") < 5)
        | (F.col("mean_token_len") > 20)
        | (F.col("punct_ratio") > 0.3)
        | (F.col("digit_ratio") > 0.5),
    )


def word_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Distinct word k-gram shingles: DF[id, shingle]. Built-in sequence +
    slice + explode — the shingle explosion never leaves the JVM."""
    w = F.split(F.trim(text_col), " ")
    return (
        df.select(id_col, w.alias("w"))
        .select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.greatest(F.size("w") - (k - 1), F.lit(1)))).alias("i"),
            "w",
        )
        .select(id_col, F.concat_ws(" ", F.slice("w", F.col("i"), k)).alias("shingle"))
        .distinct()
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models", table A1; same family as the C4 filters):

      n_words        — whitespace token count
      top_word_e5    — 1e5 × (occurrences of the most frequent word / n_words)
      distinct_e5    — 1e5 × (distinct words / n_words)
      top_bigram_e5  — 1e5 × (occurrences of the most frequent word bigram
                        / (n_words − 1)); 0 for single-word docs

    Ratios are integer-exact ((1e5·cnt) DIV total — floor division on
    BIGINTs, bit-identical in any engine, never a float boundary).
    Plan: one explode + hash-agg per signal (map-side combined), joined
    back on the id — no windows over unbounded keys, no UDFs; the bigram
    explode is arrays_zip over two slices of the same split, so the text
    is tokenized once per branch and never leaves the JVM.
    """
    w = F.split(F.trim(F.col(text_col)), " ")
    base = df.select(id_col, w.alias("w")).select(
        id_col, "w", F.size("w").cast("long").alias("n_words")
    )
    top_word = (
        base.select(id_col, "n_words", F.explode("w").alias("word"))
        .groupBy(id_col, "n_words", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col, "n_words")
        .agg(F.max("c").alias("top_c"))
        .select(
            id_col,
            "n_words",
            F.expr("CAST(100000 * top_c AS BIGINT) DIV n_words").alias("top_word_e5"),
        )
    )
    distinct_ratio = (
        base.select(id_col, "n_words", F.explode("w").alias("word"))
        .groupBy(id_col, "n_words")
        .agg(F.count_distinct("word").alias("d"))
        .select(
            id_col,
            "n_words",
            F.expr("CAST(100000 * d AS BIGINT) DIV n_words").alias("distinct_e5"),
        )
    )
    bg_arr = F.zip_with(
        F.expr("slice(w, 1, greatest(size(w) - 1, 0))"),
        F.expr("slice(w, 2, greatest(size(w) - 1, 0))"),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bigrams = base.select(id_col, "n_words", F.explode(bg_arr).alias("bg"))
    top_bigram = (
        bigrams.groupBy(id_col, "n_words", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col, "n_words")
        .agg(F.max("c").alias("top_c"))
        .select(
            id_col,
            F.expr(
                "CAST(100000 * top_c AS BIGINT) DIV greatest(n_words - 1, 1)"
            ).alias("top_bigram_e5"),
        )
    )
    return (
        top_word.join(distinct_ratio.drop("n_words"), on=id_col)
        .join(top_bigram, on=id_col, how="left")
        .select(
            id_col,
            "n_words",
            "top_word_e5",
            "distinct_e5",
            F.coalesce("top_bigram_e5", F.lit(0)).cast("long").alias("top_bigram_e5"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """DF[id, term, tf, score_e6, rnk] — top-``k`` terms per document by
    tf·idf (idf = ln(N/df), smoothing-free), the standard keyword-extraction
    pass of a training-data pipeline (beyond the reference — cuGraph has no
    text layer). Deterministic: ranking compares the QUANTIZED integer
    score (round(tf·idf·1e6)) with term-lexicographic ties, so result order
    is engine-independent. Whole pipeline is built-in expressions (same
    single-space tokenizer as ``token_count``); two hash-agg shuffles
    (term frequencies, document frequencies) + one broadcast-joined window.
    """
    spark = df.sparkSession
    n_docs = df.count()
    toks = (
        df.select(id_col, F.explode(F.split(F.trim(text_col), " ")).alias("term"))
        .filter(F.length("term") > 0)
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfc"))
    score = F.round(
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("dfc")) * F.lit(1e6)
    ).cast("long")
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("score_e6"), F.asc("term"))
    return (
        tf.join(dfreq, on="term")
        .select(id_col, "term", F.col("tf").cast("long").alias("tf"),
                score.alias("score_e6"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "score_e6", "rnk")
    )


# ---------------------------------------------------------------------------
# FM distinct-count sketches (corpus cardinality without countDistinct)
# ---------------------------------------------------------------------------


def fm_distinct_sketches(
    df: DataFrame,
    group_col: str,
    item_col: str,
    num_registers: int = 8,
    seed: int = 42,
) -> DataFrame:
    """DF[group, j, mask] — Flajolet-Martin registers estimating the
    DISTINCT item count per group (vocabulary size per language, distinct
    shingles per source, ...) in ONE map-side-combined BIT_OR pass.

    `count(distinct)` shuffles every distinct item; at corpus scale the
    item set IS the data. The sketch shuffles `#groups x num_registers`
    longs instead — duplicates collapse in partial aggregation, so a
    billion repeats of "the" cost one register OR per map partition.

    Items hash through the shared char-LCG fold (dedup.py dialect) and the
    exact-integer FM mix from algorithms/anf.py (`lcg_fm_mask`) — the same
    two primitives the driver oracles already replay, so every register
    mask is bit-checkable in SQL. Derive the scalar estimate with
    `fm_distinct_estimate` (float, Flajolet-Martin 2^R/phi — kept OUT of
    the exact driver contract like anf's curve).
    """
    from ..algorithms.anf import lcg_fm_mask
    from .dedup import MH_LCG_A, MH_LCG_B, MH_LCG_P

    if num_registers < 1:
        raise ValueError("num_registers must be >= 1")
    h0 = F.expr(
        f"aggregate(sequence(1, length({item_col})), cast(0 as bigint), "
        f"(acc, i) -> (acc + ascii(substring({item_col}, i, 1)) * "
        f"((cast({MH_LCG_A} as bigint) * i + {MH_LCG_B}) % {MH_LCG_P})) % {MH_LCG_P})"
    )
    regs = F.explode(F.sequence(F.lit(0), F.lit(num_registers - 1))).alias("j")
    base = df.select(F.col(group_col).alias("grp"), h0.alias("h0")).select(
        "grp", "h0", regs
    )
    return (
        base.select(
            "grp", "j", lcg_fm_mask(F.col("h0"), F.col("j"), seed).alias("mask")
        )
        .groupBy("grp", "j")
        .agg(F.bit_or("mask").alias("mask"))
        .select(F.col("grp").alias(group_col), "j", "mask")
    )


def fm_distinct_estimate(
    sketches: DataFrame, group_col: str = "grp", phi: float = 0.77351
) -> DataFrame:
    """DF[group, distinct_est] from `fm_distinct_sketches` output:
    2^(mean lowest-zero position) / phi (Flajolet-Martin 1985)."""
    lz = F.bit_count(
        F.col("mask").bitwiseAND(F.bitwise_not(F.col("mask") + F.lit(1)))
    ).cast("double")
    cols = [c for c in sketches.columns if c not in ("j", "mask")]
    return (
        sketches.select(*cols, lz.alias("lz"))
        .groupBy(*cols)
        .agg(
            (F.pow(F.lit(2.0), F.avg("lz")) / F.lit(phi)).alias("distinct_est")
        )
    )
