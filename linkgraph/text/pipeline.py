"""Training-data pipeline ops: PII redaction, benchmark decontamination,
deterministic stratified sampling, and training-shard export planning.

Like text/analysis.py, every hot path is built-in-expression only (JVM
whole-stage codegen, zero Python) and every decision that must replay in an
external oracle is integer arithmetic — regex counts on the raw text, a
31-bit LCG for sampling/sharding — so the driver-contract queries mirror
byte-for-byte in DuckDB.

Scale notes (100 TB):
- `pii_redact` is a map-only projection — no shuffle at any scale.
- `decontaminate` shuffles on the shingle hash once; the benchmark side is
  a fixed eval suite (MBs, not TBs), so it is broadcast when small — the
  common case is therefore map-side only.
- `stratified_sample` / `shard_assignment` are map-only filters/projections;
  `write_shards` pays exactly ONE placement shuffle (the same amortization
  argument as storage.py's bucketed tables).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .analysis import token_count, word_shingles

# Non-backtracking patterns in the shared Java-regex ∩ RE2 dialect (no
# backreferences, no lookaround) so Spark and DuckDB scan identically:
# both engines match left-to-right, non-overlapping.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]

# Same 31-bit LCG family as algorithms/anf.py (glibc constants) — integer
# exact in any engine with 64-bit arithmetic.
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2**31


def _lcg(key: Column) -> Column:
    return (key.cast("long") * F.lit(LCG_A) + F.lit(LCG_C)) % F.lit(LCG_M)


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """DF[id, n_<kind>..., redacted] — per-kind match counts on the RAW
    text plus the text with every match replaced by ``<PII:kind>``.

    Replacements apply in declared order (emails first so an address is
    never half-eaten by the looser patterns). Map-only: one projection,
    no shuffle, no Python.
    """
    patterns = patterns or PII_PATTERNS
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long").alias(f"n_{kind}")
        for kind, pat in patterns
    ]
    red = t
    for kind, pat in patterns:
        red = F.regexp_replace(red, pat, f"<PII:{kind}>")
    return df.select(id_col, *counts, red.alias("redacted"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    broadcast_bench_max: int = 5_000_000,
) -> DataFrame:
    """Benchmark decontamination by word n-gram overlap (the GPT-3 appendix
    C / PaLM protocol: a training doc is contaminated if it shares any
    n-gram with an eval benchmark; n=13 is the published default).

    Returns DF[id, n_contaminated, contaminated] for EVERY doc in ``docs``
    (zero rows kept, so the result is a filterable column, not a drop).

    Plan: one distinct-shingle explosion per side, one equi-join on the
    shingle. The benchmark is a fixed eval suite — when its distinct
    shingle count is under ``broadcast_bench_max`` the join broadcasts and
    the whole operator is map-side over the 100-TB corpus.
    """
    doc_sh = word_shingles(docs, text_col, id_col, k=n)
    bench_sh = word_shingles(benchmark, text_col, id_col, k=n).select(
        "shingle"
    ).distinct()
    cnt = bench_sh.count()
    if cnt <= broadcast_bench_max:
        bench_sh = F.broadcast(bench_sh)
    hits = (
        doc_sh.join(bench_sh, on="shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        docs.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample — the training-mix
    operator ("keep 100% of en, 30% of de, 5% of the rest").

    The keep decision is ``lcg(key) mod 2^31 < rate * 2^31``: a pure
    integer predicate on the row key, so (a) it is reproducible run-over-run
    and engine-over-engine, (b) re-running on a grown corpus keeps the same
    rows it kept before (stable sampling for incremental pipelines), and
    (c) it pushes down as a filter — map-only, no shuffle, no RNG state.
    """
    u = _lcg(F.col(key_col))
    expr = None
    for stratum, rate in rates.items():
        thr = F.lit(int(rate * LCG_M))
        cond = F.col(strata_col) == stratum
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    thr_col = (
        expr.otherwise(F.lit(int(default_rate * LCG_M)))
        if expr is not None
        else F.lit(int(default_rate * LCG_M))
    )
    return df.filter(u < thr_col)


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    text_col: str = "text",
    default_budget: int = 0,
    bucket_bits: int = 8,
) -> DataFrame:
    """Deterministic per-stratum TOKEN-budget sample — the mix-assembly
    operator ("fill 40 B en tokens, 8 B de tokens, 1 B of everything else").

    Docs are ordered inside each stratum by ``(lcg(key), key)`` (a
    deterministic shuffle) and taken greedily while the token total of the
    docs BEFORE them is < the stratum budget; the last kept doc may
    overshoot by at most its own length. Re-running on a grown corpus keeps
    a prefix-stable sample: previously kept docs stay kept unless new docs
    land earlier in LCG order.

    Scale (100 TB): the naive form is one window over each FULL stratum —
    a single task per language at corpus scale. Instead the cutoff is
    located with the same two-level histogram scheme as
    structure/renumber.py: docs hash into ``2**bucket_bits`` LCG-prefix
    buckets, ONE tiny (stratum, bucket) token-sum aggregate (map-side
    combined) gives cumulative offsets, buckets wholly below the budget are
    kept by a map-only broadcast-join filter, buckets wholly past it are
    dropped the same way, and only the ONE straddling bucket per stratum
    (~1/2**bucket_bits of the data) pays a window. The driver oracle
    replays the naive full-window form in SQL.
    """
    if default_budget < 0 or any(b < 0 for b in budgets.values()):
        raise ValueError("token budgets must be >= 0")
    shift = 31 - bucket_bits
    if shift < 0:
        raise ValueError("bucket_bits must be <= 31")

    u = _lcg(F.col(key_col))
    base = df.withColumn("_u", u).withColumn(
        "_toks", token_count(F.col(text_col))
    ).withColumn("_bkt", F.shiftright(F.col("_u"), shift))

    expr = None
    for stratum, budget in budgets.items():
        cond = F.col(strata_col) == stratum
        lit = F.lit(int(budget))
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
    budget_col = (
        expr.otherwise(F.lit(int(default_budget)))
        if expr is not None
        else F.lit(int(default_budget))
    )
    base = base.withColumn("_budget", budget_col)

    # tiny: at most (#strata x 2**bucket_bits) rows, map-side combined
    hist = base.groupBy(strata_col, "_bkt").agg(F.sum("_toks").alias("_bsum"))
    w_off = (
        Window.partitionBy(strata_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = hist.select(
        strata_col, "_bkt",
        F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)).alias("_base"),
        F.col("_bsum"),
    )
    # eqNullSafe on the stratum key: a NULL stratum is a real stratum (its
    # own partition with the default budget — matching the naive-window
    # semantics and the oracle's PARTITION BY); a plain equi-join would
    # silently drop every NULL-keyed row
    ob = F.broadcast(offsets).withColumnsRenamed(
        {strata_col: "_o_stratum", "_bkt": "_o_bkt"}
    )
    tagged = base.join(
        ob,
        F.col(strata_col).eqNullSafe(F.col("_o_stratum"))
        & (F.col("_bkt") == F.col("_o_bkt")),
    ).drop("_o_stratum", "_o_bkt")

    keep_all = tagged.filter(F.col("_base") + F.col("_bsum") <= F.col("_budget"))
    boundary = tagged.filter(
        (F.col("_base") < F.col("_budget"))
        & (F.col("_base") + F.col("_bsum") > F.col("_budget"))
    )
    # only the straddling bucket flows here: bounded by max bucket size,
    # not stratum size
    w_doc = (
        Window.partitionBy(strata_col)
        .orderBy("_u", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary_kept = boundary.withColumn(
        "_prefix", F.col("_base") + F.coalesce(F.sum("_toks").over(w_doc), F.lit(0))
    ).filter(F.col("_prefix") < F.col("_budget")).drop("_prefix")

    helpers = ["_u", "_toks", "_bkt", "_budget", "_base", "_bsum"]
    return keep_all.unionByName(boundary_kept).drop(*helpers)


def pack_sequences(
    df: DataFrame,
    window: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_bits: int = 8,
    weight_col: str | None = None,
) -> DataFrame:
    """Concat-then-chunk training-window packing manifest (the GPT-style
    sequence assembly: shuffle docs deterministically, concatenate their
    token streams, cut into fixed ``window``-token chunks).

    Returns DF[chunk_id, doc_id, doc_off, chunk_off, n_toks]: chunk
    ``chunk_id`` is assembled by copying ``n_toks`` tokens starting at
    ``doc_off`` of ``doc_id`` into chunk position ``chunk_off``. Every doc
    token lands in exactly one chunk (the trailing chunk may be ragged —
    callers drop ``chunk_id = max`` for strict fixed-length training).
    Docs are ordered by ``(lcg(id), id)`` — the same deterministic shuffle
    as :func:`token_budget_sample`, so re-running is stable and the oracle
    replays the order exactly.

    Scale (100 TB): the naive form needs a GLOBAL running token total — one
    unpartitioned window over the corpus. Instead the prefix sum uses the
    renumber.py two-level histogram: docs hash into ``2**bucket_bits`` LCG-
    prefix buckets, ONE tiny bucket token-sum aggregate (map-side combined,
    <= 2**bucket_bits rows) gives cross-bucket offsets, and the per-doc
    prefix is a window PARTITIONED by bucket. The chunk fan-out is a
    map-side ``sequence`` explode bounded by toks/window + 1 rows per doc.
    No corpus-scale sort, no single-task window anywhere.

    ``weight_col`` generalizes the span length from whitespace token counts
    to any positive integer column (e.g. vertex degrees) — the manifest
    then partitions the concatenated WEIGHT stream, which is what
    inverse-CDF samplers (``algorithms.random_walks.negative_samples``)
    point-look-up into.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    shift = 31 - bucket_bits
    if shift < 0:
        raise ValueError("bucket_bits must be <= 31")

    size = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else token_count(F.col(text_col))
    )
    u = _lcg(F.col(id_col))
    base = (
        df.select(F.col(id_col), u.alias("_u"), size.alias("_toks"))
        .withColumn("_bkt", F.shiftright(F.col("_u"), shift))
    )
    hist = base.groupBy("_bkt").agg(F.sum("_toks").alias("_bsum"))
    # tiny frame (<= 2**bucket_bits rows): the unpartitioned window is fine
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = hist.select(
        "_bkt", F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)).alias("_base")
    )
    w_doc = (
        Window.partitionBy("_bkt")
        .orderBy("_u", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pos = (
        base.join(F.broadcast(offsets), on="_bkt")
        .withColumn(
            "_start",
            F.col("_base") + F.coalesce(F.sum("_toks").over(w_doc), F.lit(0)),
        )
    )
    wl = F.lit(int(window))
    # BIGINT DIV, not float floor: the float path is exact only below 2^53
    # total tokens (~9 PB of text) — integer division has no cliff
    c0 = F.expr(f"_start DIV {int(window)}")
    c1 = F.expr(f"(_start + _toks - 1) DIV {int(window)}")
    lo = F.col("chunk_id") * wl  # chunk token span [lo, lo + window)
    # zero-length spans (reachable via a zero-valued weight_col) contribute
    # nothing to the concatenated stream: drop them BEFORE the explode —
    # when _start is an exact window multiple, c1 < c0 would make
    # F.sequence run DESCENDING and emit spurious n_toks=0 manifest rows
    pos = pos.filter(F.col("_toks") > 0)
    return pos.select(
        id_col, "_start", "_toks", F.explode(F.sequence(c0, c1)).alias("chunk_id")
    ).select(
        F.col("chunk_id").cast("long"),
        F.col(id_col),
        F.greatest(lo - F.col("_start"), F.lit(0)).cast("long").alias("doc_off"),
        F.greatest(F.col("_start") - lo, F.lit(0)).cast("long").alias("chunk_off"),
        (
            F.least(lo + wl, F.col("_start") + F.col("_toks"))
            - F.greatest(lo, F.col("_start"))
        ).cast("long").alias("n_toks"),
    )


def shard_assignment(
    df: DataFrame, n_shards: int, key_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic shard id per row: ``lcg(key) mod n_shards``. Pure
    projection; the LCG decorrelates shard from key order so shards are
    balanced even when keys arrive range-clustered."""
    return df.withColumn(shard_col, (_lcg(F.col(key_col)) % F.lit(n_shards)).cast("long"))


def shard_plan(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    size_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest: DF[shard, n_docs, bytes, min_key, max_key] —
    the planning/validation half of training-shard export (balance check
    before paying the write shuffle). One map-side-combined aggregation."""
    a = shard_assignment(df, n_shards, key_col)
    aggs = [
        F.count("*").alias("n_docs"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
    ]
    if size_col is not None:
        aggs.insert(1, F.sum(size_col).cast("long").alias("bytes"))
    return a.groupBy("shard").agg(*aggs)


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    mode: str = "error",
) -> None:
    """Materialize training shards: ``path/shard=K/`` parquet directories,
    rows sorted by key inside each shard (reproducible batch order for the
    data loader). Exactly ONE shuffle — the repartition on the shard id —
    then a sorted streaming write; reading one shard back never touches the
    others (partition pruning on the shard directory)."""
    out = (
        shard_assignment(df, n_shards, key_col)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", key_col)
    )
    out.write.partitionBy("shard").mode(mode).parquet(path)


# --- Bloom-filter decontamination tier ---------------------------------------
# Above the broadcast gate, plain decontaminate falls back to shuffling the
# CORPUS shingle explosion on the shingle string — an E-scale string shuffle
# at 100 TB. The bloom tier replaces it with: (1) one bit_or aggregation
# that packs the benchmark shingles into a ~bits_per_item·n bitmap (the
# ANF/FM-sketch pattern, anf.py), (2) a map-side membership test over the
# corpus (Arrow-batched numpy gather), (3) an exact-confirm join on ONLY
# the survivors (true hits + ~0.1% false positives), so the final output is
# EXACT — identical to plain decontaminate, which is what the driver oracle
# checks. Spark's own bloom_filter_agg/might_contain pair is not in the
# public function registry, hence the self-contained build.

BLOOM_K = 10  # hash functions; with bits_per_item=14 -> fpp ~ 8e-4


def _bloom_positions(col: Column, m_bits: int) -> Column:
    """Array of BLOOM_K bit positions for ``col`` — k INDEPENDENT
    xxhash64(col, i) draws (no Kirsch-Mitzenmacher combination: Spark 4
    ANSI long arithmetic would need overflow-wrapping; independent seeded
    hashes avoid arithmetic entirely and replay trivially in numpy)."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(BLOOM_K)]
    )


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    bits_per_item: int = 14,
) -> DataFrame:
    """Exact decontamination via bloom prefilter + exact confirm.

    Same output contract as :func:`decontaminate` (DF[id, n_contaminated,
    contaminated] over every doc). The benchmark bitmap costs
    ``bits_per_item`` bits per distinct benchmark shingle (14 -> fpp
    ~8e-4 with k=10) and is built with one map-side-combined bit_or
    shuffle of at most m/64 words; only the packed words reach the driver
    (the inherent size of the filter itself). The corpus-side test is one
    whole-stage-codegen hash projection + one Arrow-batched numpy gather —
    the corpus shingle table is never shuffled; only survivors (true hits
    + ~fpp of the corpus) pay the exact-confirm join.
    """
    import math
    from typing import Iterator

    import numpy as np
    import pandas as pd

    spark = docs.sparkSession
    bench_sh_cached = (
        word_shingles(benchmark, text_col, id_col, k=n)
        .select("shingle").distinct().persist()
    )
    n_items = bench_sh_cached.count()
    bench_sh = bench_sh_cached
    if n_items == 0:
        bench_sh.unpersist()
        return docs.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_contaminated"),
            F.lit(0).cast("int").alias("contaminated"),
        )
    m_bits = 1 << max(6, int(math.ceil(math.log2(max(64, n_items * bits_per_item)))))

    # distributed bitmap build: position -> (word, mask), bit_or per word
    words = (
        bench_sh.select(
            F.explode(_bloom_positions(F.col("shingle"), m_bits)).alias("pos")
        )
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .toPandas()
    )
    bitmap = np.zeros(m_bits // 64, dtype=np.int64)
    bitmap[words["word"].to_numpy()] = words["bits"].to_numpy()
    bc = spark.sparkContext.broadcast(bitmap)
    # the bitmap build (the only consumer that reads the cached table more
    # than once) is done — release the cache NOW and let the exact-confirm
    # join recompute the bench shingles lazily at action time (bench-scale,
    # one pass); otherwise the cache leaks until context shutdown because
    # the returned plan is lazy
    bench_sh = word_shingles(benchmark, text_col, id_col, k=n).select(
        "shingle"
    ).distinct()
    bench_sh_cached.unpersist()

    doc_sh = word_shingles(docs, text_col, id_col, k=n).select(
        id_col,
        "shingle",
        _bloom_positions(F.col("shingle"), m_bits).alias("pos"),
    )
    id_type = dict(docs.dtypes)[id_col]
    schema = f"{id_col} {id_type}, shingle string"

    def prefilter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pos = np.array(pdf["pos"].tolist(), dtype=np.int64)  # n x k
            hit = (
                (bm[pos >> 6] >> (pos & 63)) & 1
            ).all(axis=1)
            out = pdf.loc[hit, [id_col, "shingle"]]
            if len(out):
                yield out

    survivors = doc_sh.mapInPandas(prefilter, schema)
    hits = (
        survivors.join(bench_sh, on="shingle")  # exact confirm
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    out = (
        docs.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )
    return out


# --- DSIR: data selection via importance resampling ---------------------------
# Xie et al. 2023 ("Data Selection for Language Models via Importance
# Resampling"): fit bag-of-hashed-ngram unigram models on a small TARGET
# corpus and on the RAW corpus, then score every raw document by its log
# importance weight
#     log w(doc) = sum_b count_b(doc) * (log p_target[b] - log p_raw[b])
# over B hash buckets, and resample proportionally. The bucket models are
# B-row aggregates (B ~ 1e4 in the paper), so the whole estimator is two
# corpus passes + one broadcast map — the canonical pretraining-data
# selection op.
#
# Exactness: n-gram -> integer codes reuse minhash's character LCG fold
# (dedup.py minhash_lcg_buckets — replicable operator-for-operator in SQL);
# the per-bucket integer score table s_e = round(1e6 * log-ratio) is
# computed ONCE driver-side from the two collected count tables and shipped
# to both engines (sidecar parquet for the oracle), so every per-document
# weight is an exact BIGINT dot product. The oracle re-derives the ct/cr
# count tables from scratch and fails loudly if they disagree with the
# sidecar — only the log() evaluation itself is python-only.

DSIR_SCALE = 1_000_000
_DSIR_MAX_BUCKETS = 1 << 20  # driver holds 4 small columns per bucket


def _ngram_bucket_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_max: int,
    num_buckets: int,
) -> DataFrame:
    """DF[id, bucket, cnt] — hashed word n-gram OCCURRENCE counts for
    n = 1..n_max (word_shingles' slice convention: documents shorter than n
    words contribute their full text once per n). Entirely built-in
    expressions; the bucket hash runs map-side per OCCURRENCE so the only
    shuffle carries (id, bucket) integer pairs — bounded by docs x buckets
    rows after partial aggregation — instead of a corpus-scale distinct
    (doc, gram) STRING shuffle (guide §2.3: shuffle fewer, narrower bytes;
    measured 2.4 -> 1.1 s warm at sf0.1, identical output)."""
    from .dedup import MH_LCG_A, MH_LCG_B, MH_LCG_P

    w = F.split(F.trim(text_col), " ")
    grams = None
    for n in range(1, n_max + 1):
        gn = (
            df.select(id_col, w.alias("w"))
            .select(
                id_col,
                F.explode(
                    F.sequence(F.lit(1), F.greatest(F.size("w") - (n - 1), F.lit(1)))
                ).alias("i"),
                "w",
            )
            .select(id_col, F.concat_ws(" ", F.slice("w", F.col("i"), n)).alias("g"))
        )
        grams = gn if grams is None else grams.unionByName(gn)
    code = F.expr(
        f"aggregate(sequence(1, length(g)), cast(0 as bigint), (acc, i) -> "
        f"(acc + ascii(substring(g, i, 1)) * "
        f"((cast({MH_LCG_A} as bigint) * i + {MH_LCG_B}) % {MH_LCG_P})) % {MH_LCG_P})"
    )
    return (
        grams.filter(F.length("g") > 0)
        .select(id_col, (code % num_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    alpha: float = 1.0,
    n_max: int = 2,
):
    """Returns ``(weights, buckets)``: per-document DSIR importance weights
    ``DF[id, dsir_w_e, dsir_logw]`` (``dsir_w_e`` the exact scaled-integer
    dot product, ``dsir_logw = dsir_w_e / 1e6``) and the B-row bucket model
    table ``[(bucket, ct, cr, s_e), ...]`` used to score (for audit /
    oracle sidecar).

    Physical plan: one corpus n-gram pass + one target n-gram pass (each a
    map-side-combined hash agg), a B-row collect per side, then ONE
    broadcast join + hash agg over the corpus's (doc, bucket) counts. The
    corpus is never shuffled on anything wider than (doc, bucket)."""
    import math

    if not 1 <= num_buckets <= _DSIR_MAX_BUCKETS:
        raise ValueError(f"num_buckets must be in [1, {_DSIR_MAX_BUCKETS}]")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (smoothing)")
    spark = corpus.sparkSession
    doc_counts = _ngram_bucket_counts(
        corpus, text_col, id_col, n_max, num_buckets
    ).persist()
    cr = {
        r["bucket"]: r["tot"]
        for r in doc_counts.groupBy("bucket").agg(F.sum("cnt").alias("tot")).collect()
    }
    ct = {
        r["bucket"]: r["tot"]
        for r in _ngram_bucket_counts(target, text_col, id_col, n_max, num_buckets)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("tot"))
        .collect()
    }
    Ct = sum(ct.values()) + alpha * num_buckets
    Cr = sum(cr.values()) + alpha * num_buckets
    buckets = [
        (
            b,
            int(ct.get(b, 0)),
            int(cr.get(b, 0)),
            int(round(DSIR_SCALE * (
                math.log((ct.get(b, 0) + alpha) / Ct)
                - math.log((cr.get(b, 0) + alpha) / Cr)
            ))),
        )
        for b in range(num_buckets)
    ]
    stable = spark.createDataFrame(buckets, "bucket long, ct long, cr long, s_e long")
    dots = (
        doc_counts.join(F.broadcast(stable.select("bucket", "s_e")), on="bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("s_e")).alias("dsir_w_e"))
    )
    weights = (
        corpus.select(id_col)
        .distinct()
        .join(dots, on=id_col, how="left")
        .fillna(0, subset=["dsir_w_e"])
        .select(
            id_col,
            "dsir_w_e",
            (F.col("dsir_w_e") / F.lit(float(DSIR_SCALE))).alias("dsir_logw"),
        )
    )
    doc_counts.unpersist()
    return weights, buckets


def dsir_gumbel_topk(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    temperature: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Gumbel-top-k resampling over DSIR log-weights (the paper's sampler):
    perturb logw/T with deterministic LCG-seeded Gumbel noise, take the k
    largest. Distributed partial top-k (TakeOrdered) — the driver holds k
    rows, so k must be driver-bounded; for corpus-scale selections use a
    threshold filter on ``dsir_logw`` instead."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    u = (_lcg(F.col(id_col) + F.lit(seed)) + 1.0) / float(LCG_M + 1)
    gumbel = -F.log(-F.log(u))
    key = F.col("dsir_logw") / F.lit(temperature) + gumbel
    return (
        weights.select(id_col, "dsir_w_e", "dsir_logw", key.alias("gumbel_key"))
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_words: int = 5,
    min_lines: int = 3,
    terminal_punct: str = ".!?\"",
    line_blocklist: tuple[str, ...] = ("javascript",),
    doc_blocklist: tuple[str, ...] = ("lorem ipsum", "{"),
) -> DataFrame:
    """The C4 heuristic cleaning pass (Raffel et al. 2020, appendix):

    line rules — a line survives iff it ends in a terminal punctuation
    mark, contains >= ``min_words`` whitespace words, and contains no
    ``line_blocklist`` phrase (case-insensitive);
    page rules — a page is kept iff >= ``min_lines`` lines survive and the
    ORIGINAL text contains no ``doc_blocklist`` phrase ("lorem ipsum",
    code braces).

    Returns DF[id, text_clean, n_kept, n_dropped, kept] with every input
    doc present (kept=0 rows carry their cleaned text so downstream audit
    queries can see what was dropped and why — production pipelines log
    exactly this).

    100-TB shape: a SINGLE map-only pass of built-in expressions — split,
    one array filter with pure lambdas, re-join. Zero UDFs, zero shuffles,
    zero driver state; whole-stage codegen end to end, trivially
    embarrassingly parallel and filter-pushdown-transparent. Deterministic
    and exactly SQL-replicable (driver query ``doc_c4_filter``).

    Reference N/A (no text layer in the cuGraph fork); rules per the C4
    paper's published list.
    """
    if min_words < 1:
        raise ValueError("min_words must be >= 1")
    if min_lines < 0:
        raise ValueError("min_lines must be >= 0")
    if not terminal_punct:
        raise ValueError("terminal_punct must be non-empty")

    def line_ok(line: Column) -> Column:
        rt = F.rtrim(line)
        punct = F.substring(rt, -1, 1).isin(*list(terminal_punct))
        words = F.size(F.filter(F.split(line, " "), lambda w: w != "")) >= min_words
        ok = punct & words
        for phrase in line_blocklist:
            ok = ok & ~F.contains(F.lower(line), F.lit(phrase.lower()))
        return ok

    doc_ok = F.lit(True)
    for phrase in doc_blocklist:
        doc_ok = doc_ok & ~F.contains(F.lower(F.col(text_col)), F.lit(phrase.lower()))

    lines = F.split(F.col(text_col), sep)
    kept_lines = F.filter(lines, line_ok)
    n_kept = F.size(kept_lines)
    return df.select(
        F.col(id_col),
        F.array_join(kept_lines, sep).alias("text_clean"),
        n_kept.cast("long").alias("n_kept"),
        (F.size(lines) - n_kept).cast("long").alias("n_dropped"),
        ((n_kept >= min_lines) & doc_ok).cast("long").alias("kept"),
    )


# ---------------------------------------------------------------------------
# CCNet-style LM perplexity filtering (Wenzek et al. 2020, arXiv:1911.00359)
# ---------------------------------------------------------------------------

CCNET_SCALE = 1_000_000
_CCNET_MAX_BUCKETS = 1024  # observed-transition table <= B^2 rows on driver


def _bucket_codes(text_col: str, num_buckets: int):
    """array<bigint> — the POSITIONAL token->bucket sequence (order
    preserved; every whitespace-split position is a token, the shared
    char-LCG fold maps it to a bucket)."""
    from .dedup import MH_LCG_A, MH_LCG_B, MH_LCG_P

    return F.expr(
        f"transform(split(trim({text_col}), ' '), tok -> "
        f"aggregate(sequence(1, length(tok)), cast(0 as bigint), (acc, i) -> "
        f"(acc + ascii(substring(tok, i, 1)) * "
        f"((cast({MH_LCG_A} as bigint) * i + {MH_LCG_B}) % {MH_LCG_P})) % {MH_LCG_P})"
        f" % {num_buckets})"
    )


def _transition_counts(df: DataFrame, text_col: str, id_col: str, num_buckets: int):
    """DF[id, bp, bc, cnt] — positional bigram bucket transitions.
    Zero-shuffle until the final (id, bp, bc) map-side-combined agg; the
    pair construction is an array transform, never a self-join or window."""
    cs = _bucket_codes(text_col, num_buckets)
    pairs = (
        df.select(F.col(id_col).alias("id"), cs.alias("cs"))
        .select(
            "id",
            F.explode(
                # sequence(1, 0) DESCENDS in Spark, so the pair list is
                # built with length-clamped slices (empty for 1-token docs)
                F.arrays_zip(
                    F.expr("slice(cs, 1, size(cs) - 1)"),
                    F.expr("slice(cs, 2, size(cs) - 1)"),
                )
            ).alias("t"),
        )
        .select("id", F.col("t.`0`").alias("bp"), F.col("t.`1`").alias("bc"))
    )
    return pairs.groupBy("id", "bp", "bc").agg(F.count("*").alias("cnt"))


def hashed_linear_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    threshold_e3: int = 0,
    use_bigrams: bool = True,
) -> DataFrame:
    """fastText-shaped linear quality scorer: DF[id, n_features, score, keep].

    Features are hashed unigram buckets (the shared char-LCG fold from
    ``_bucket_codes``) plus positional bigram buckets
    ``bp * num_buckets + bc``; each feature contributes an integer weight
    ``((a*f + c) mod 2^31) mod 257 - 128`` and the doc score is the plain
    sum — the exact compute shape of a hashed-bag-of-ngrams linear
    classifier (fastText / CCNet's quality head), with the LCG fold
    standing in for trained weights. Swapping in learned weights is a
    broadcast join against a (bucket, weight) table; nothing else moves.

    ``keep`` = 1 iff ``score * 1000 >= threshold_e3 * n_features`` (mean
    weight >= threshold_e3/1000 by integer cross-multiplication — exact in
    any 64-bit engine; |score| <= 128 * n_features so no overflow at any
    doc length).

    Scale (100 TB): map-only — every feature, weight, and sum is a single
    array expression inside whole-stage codegen; no explode, no shuffle,
    no UDF. Bigrams never materialize as rows.
    """
    if num_buckets < 2:
        raise ValueError("num_buckets must be >= 2")
    from .dedup import MH_LCG_A, MH_LCG_B, MH_LCG_P

    w = (
        f"(((cast({LCG_A} as bigint) * f + {LCG_C}) % {LCG_M}) % 257 - 128)"
    )
    cs = (
        f"transform(split(trim({text_col}), ' '), tok -> "
        f"aggregate(sequence(1, length(tok)), cast(0 as bigint), (acc, i) -> "
        f"(acc + ascii(substring(tok, i, 1)) * "
        f"((cast({MH_LCG_A} as bigint) * i + {MH_LCG_B}) % {MH_LCG_P})) % {MH_LCG_P})"
        f" % {num_buckets})"
    )
    uni_sum = (
        f"aggregate(transform(cs, f -> {w}), cast(0 as bigint), (s, x) -> s + x)"
    )
    bi_sum = (
        f"aggregate(transform(zip_with(slice(cs, 1, size(cs) - 1), "
        f"slice(cs, 2, size(cs) - 1), (bp, bc) -> bp * {num_buckets} + bc), "
        f"f -> {w}), cast(0 as bigint), (s, x) -> s + x)"
    )
    nf = (
        f"size(cs) + greatest(size(cs) - 1, 0)" if use_bigrams else "size(cs)"
    )
    score = f"({uni_sum} + {bi_sum})" if use_bigrams else uni_sum
    return (
        df.select(F.col(id_col).alias("id"), F.expr(cs).alias("cs"))
        .select(
            "id",
            F.expr(nf).cast("long").alias("n_features"),
            F.expr(score).cast("long").alias("score"),
        )
        .withColumn(
            "keep",
            (
                F.col("score") * F.lit(1000)
                >= F.lit(int(threshold_e3)) * F.col("n_features")
            ).cast("long"),
        )
    )


def ccnet_perplexity(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 128,
    alpha: float = 1.0,
):
    """CCNet's quality signal re-expressed Spark-first: score every corpus
    document by its average negative log-probability under a hashed-bucket
    BIGRAM language model trained on ``reference`` (CCNet trains a KenLM
    5-gram on Wikipedia; the hashed-bucket bigram is this engine's
    bounded-driver-state, SQL-replayable counterpart — same filtering
    semantics: low avg_nlogp = reference-like "head", high = "tail").

    Returns ``(scores, trans_model, ctx_model)``:

    - scores: DF[id_col, sum_e, n_terms, avg_nlogp_e6] where
      ``sum_e = Σ cnt · s_e`` is the EXACT scaled-integer log-prob sum,
      ``n_terms`` the bigram count, and ``avg_nlogp_e6 =
      round(-sum_e / n_terms)`` (null for docs under two tokens);
    - trans_model: [(bp, bc, c2, s_e)] observed reference transitions with
      ``s_e = round(1e6·ln((c2+α)/(c1+αB)))``;
    - ctx_model: [(bp, c1, s_unseen_e)] per observed context with the
      unseen-transition fallback ``round(1e6·ln(α/(c1+αB)))``; contexts
      never seen in the reference fall back to ``round(1e6·ln(1/B))``
      (the α-free uniform bigram).

    Physical plan: one reference transition pass + one corpus transition
    pass (each: array-transform pair construction — NO self-join, NO
    window — then a map-side-combined (doc, bp, bc) agg), the reference
    model collected to the driver (≤ B² + B rows, the bounded-driver-state
    pattern shared with DSIR/IVF), and ONE broadcast join + hash agg over
    corpus transition counts. The corpus is never shuffled on anything
    wider than (doc, bp, bc). Log evaluation happens ONCE on the driver
    over exact integers and ships as scaled-int literals, so both engines
    sum identical BIGINTs — the oracle replays every score bit-for-bit
    (ln itself is never evaluated inside either engine's expressions,
    avoiding cross-engine libm divergence).
    """
    import math

    if not 2 <= num_buckets <= _CCNET_MAX_BUCKETS:
        raise ValueError(f"num_buckets must be in [2, {_CCNET_MAX_BUCKETS}]")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (smoothing)")
    spark = corpus.sparkSession
    B = num_buckets

    ref = _transition_counts(reference, text_col, id_col, B)
    c2_rows = ref.groupBy("bp", "bc").agg(F.sum("cnt").alias("c2")).collect()
    c1 = {}
    for r in c2_rows:
        c1[r.bp] = c1.get(r.bp, 0) + r.c2
    trans_model = [
        (
            int(r.bp),
            int(r.bc),
            int(r.c2),
            int(round(CCNET_SCALE * math.log((r.c2 + alpha) / (c1[r.bp] + alpha * B)))),
        )
        for r in c2_rows
    ]
    ctx_model = [
        (
            int(bp),
            int(tot),
            int(round(CCNET_SCALE * math.log(alpha / (tot + alpha * B)))),
        )
        for bp, tot in sorted(c1.items())
    ]
    s0 = int(round(CCNET_SCALE * math.log(1.0 / B)))

    tdf = spark.createDataFrame(
        trans_model or [(-1, -1, 0, 0)], "bp long, bc long, c2 long, s_e long"
    )
    cdf = spark.createDataFrame(
        ctx_model or [(-1, 0, 0)], "bp long, c1 long, s_unseen_e long"
    )

    doc_t = _transition_counts(corpus, text_col, id_col, B)
    scored = (
        doc_t.join(F.broadcast(tdf.select("bp", "bc", "s_e")), on=["bp", "bc"], how="left")
        .join(F.broadcast(cdf.select("bp", "s_unseen_e")), on="bp", how="left")
        .withColumn(
            "s", F.coalesce("s_e", "s_unseen_e", F.lit(s0).cast("long"))
        )
        .groupBy("id")
        .agg(
            F.sum(F.col("cnt") * F.col("s")).alias("sum_e"),
            F.sum("cnt").alias("n_terms"),
        )
    )
    scores = (
        corpus.select(F.col(id_col).alias("id"))
        .distinct()
        .join(scored, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("sum_e", F.lit(0)).cast("long").alias("sum_e"),
            F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
            F.when(
                F.coalesce("n_terms", F.lit(0)) > 0,
                F.round(
                    -F.col("sum_e").cast("double") / F.col("n_terms")
                ).cast("long"),
            ).alias("avg_nlogp_e6"),
        )
    )
    return scores, trans_model, ctx_model
