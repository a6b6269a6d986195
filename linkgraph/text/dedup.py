"""Deduplication for web-scale training corpora.

Four tiers, cheapest first (each a standard published technique):
- exact: hash-groupBy on the full text (one shuffle with map-side combine);
- ngram_jaccard: exact word-shingle Jaccard over candidate pairs produced by
  a shingle self-join (exact but O(shared-shingle pairs));
- minhash_lsh: MinHash signatures (Broder 1997) + banded LSH
  (Indyk-Motwani / Leskovec et al., MMDS ch.3) — shingle→minhash→band→
  bucket-join; candidates verified with exact Jaccard, then duplicate
  clusters are the CONNECTED COMPONENTS of the duplicate-pair graph — we
  reuse this engine's own WCC superstep machinery for that;
- simhash (Charikar 2002, the Google near-dup detector): 64-bit weighted
  sign-fingerprint; near-dup candidates from 16-bit band buckets, verified
  by Hamming distance with bit_count (JVM-side popcount).

The only Python crossing is the vectorized MinHash signature UDF (numpy over
Arrow batches); everything else is built-in expressions + hash shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..structure.graph import Graph
from .analysis import word_shingles

_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """DF[id, keep] — keep=True for the minimum id per identical text."""
    h = F.md5(F.col(text_col)).alias("__h__")
    keep = df.select(id_col, h).groupBy("__h__").agg(F.min(id_col).alias("__keep__"))
    return (
        df.select(id_col, h)
        .join(keep, on="__h__")
        .select(id_col, (F.col(id_col) == F.col("__keep__")).alias("keep"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-k-gram Jaccard >= threshold pairs: DF[id_a, id_b, jaccard].
    Integer cross-multiplied filter (no float compare at the boundary)."""
    sh = word_shingles(df, text_col, id_col, k)
    per_doc = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    thr_num, thr_den = int(round(threshold * 1_000_000)), 1_000_000
    return (
        common.join(per_doc.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na")), on="id_a")
        .join(per_doc.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb")), on="id_b")
        .withColumn("union_sh", F.col("na") + F.col("nb") - F.col("common"))
        .filter(F.col("common") * thr_den >= F.lit(thr_num) * F.col("union_sh"))
        .select("id_a", "id_b", (F.col("common") / F.col("union_sh")).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
    seed: int = 42,
) -> DataFrame:
    """DF[id, sig:array<long>] — MinHash over word k-gram shingles.

    Vectorized: per Arrow batch, shingle base-hashes (blake2b-8byte) are
    combined with num_perm universal-hash (a*x+b mod p) permutations in one
    numpy matrix op per document.
    """
    # a,b < 2^31 and base hashes < 2^32 keep a*x+b < 2^63: the permutation
    # matrix op stays in native int64 (no object-dtype bigint fallback)
    rng = np.random.default_rng(seed)
    A = rng.integers(1, (1 << 31) - 1, size=num_perm, dtype=np.int64)
    B = rng.integers(0, (1 << 31) - 1, size=num_perm, dtype=np.int64)

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = str(text).strip().split(" ")
                if len(toks) < k:
                    sh = {" ".join(toks)}
                else:
                    sh = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
                hs = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.blake2b(s.encode(), digest_size=4).digest(), "big"
                        )
                        for s in sh
                    ),
                    dtype=np.int64,
                    count=len(sh),
                )
                # (num_perm, n_shingles) universal hashes; min along shingles
                m = ((A[:, None] * hs[None, :] + B[:, None]) % _MERSENNE).min(axis=1)
                ids.append(doc_id)
                sigs.append([int(x) for x in m])
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return df.select(id_col, text_col).mapInPandas(
        sig_batches, f"{id_col} long, sig array<long>"
    )


# hash_mode="lcg" constants — plain BIGINT arithmetic so a DuckDB oracle
# replays shingle codes, permutations, and band buckets value-for-value
# (blake2b/numpy have no SQL twin); same design as the random-walk and
# LSH-plane LCG modes. blake2b stays the default for hash quality.
MH_LCG_A = 1103515245
MH_LCG_B = 12345
MH_LCG_C = 2654435761
MH_LCG_P = 2147483647


def minhash_lcg_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """DF[id, band, bucket] — banded MinHash buckets in exact integer
    arithmetic, entirely JVM-side expressions:

    - shingle code  = Σ_i ascii(char_i) · ((A·i + B) mod P)  mod P
    - permutation j = (a_j·code + b_j) mod P, a_j/b_j LCG-derived from j
    - band bucket   = base-31 positional fold of the band's min-hashes

    Each step is replicated verbatim by the ``doc_minhash_dedup`` DuckDB
    oracle; products stay < 2^63 (a_j, code < P = 2^31-1)."""
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    r = num_perm // bands
    sh = word_shingles(df, text_col, id_col, k)
    code = F.expr(
        f"aggregate(sequence(1, length(shingle)), cast(0 as bigint), (acc, i) -> "
        f"(acc + ascii(substring(shingle, i, 1)) * "
        f"((cast({MH_LCG_A} as bigint) * i + {MH_LCG_B}) % {MH_LCG_P})) % {MH_LCG_P})"
    )
    m = sh.select(id_col, code.alias("code")).select(
        id_col,
        "code",
        F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("j"),
    )
    aj = F.lit(1).cast("long") + (
        F.lit(MH_LCG_A).cast("long") * (F.col("j") + 1) + F.lit(MH_LCG_B)
    ) % F.lit(MH_LCG_P - 1)
    bj = (
        F.lit(MH_LCG_C).cast("long") * (F.col("j") + 1) + F.lit(seed)
    ) % F.lit(MH_LCG_P)
    mh = (aj * F.col("code") + bj) % F.lit(MH_LCG_P)
    mins = (
        m.select(id_col, "j", mh.alias("h"))
        .groupBy(id_col, "j")
        .agg(F.min("h").alias("mh"))
    )
    weights = F.array(*[F.lit(31 ** (r - 1 - p)).cast("long") for p in range(r)])
    return (
        mins.select(
            id_col,
            F.floor(F.col("j") / r).cast("int").alias("band"),
            (
                F.col("mh")
                * F.element_at(weights, (F.col("j") % r).cast("int") + 1)
            ).alias("t"),
        )
        .groupBy(id_col, "band")
        .agg(F.sum("t").alias("bucket"))
    )


def _band_pair_join(banded: DataFrame, id_col: str) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any (band, bucket)."""
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_candidates(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 16
) -> DataFrame:
    """Banded LSH: equal band-slices of the signature land in one bucket;
    DF[id_a, id_b] distinct candidate pairs (id_a < id_b)."""
    num_perm_col = F.size("sig")
    rows_per_band = (num_perm_col / bands).cast("int")
    banded = sigs.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "sig",
    ).select(
        id_col,
        "band",
        F.md5(
            F.concat_ws(
                ",",
                F.slice("sig", F.col("band") * rows_per_band + 1, rows_per_band),
            )
        ).alias("bucket"),
    )
    return _band_pair_join(banded, id_col)


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    hash_mode: str = "blake2b",
) -> DataFrame:
    """End-to-end near-dup dedup: DF[id, cluster, keep].

    minhash -> banded LSH candidates -> exact-Jaccard verification ->
    duplicate clusters = connected components of the verified pair graph
    (this engine's own WCC) -> keep = min id per cluster.

    ``hash_mode``: "blake2b" (default — vectorized Arrow UDF signatures)
    or "lcg" (exact-integer JVM expressions, SQL-replicable — the variant
    the driver oracle value-checks; see ``minhash_lcg_buckets``).
    """
    if hash_mode == "lcg":
        cand = _band_pair_join(
            minhash_lcg_buckets(df, text_col, id_col, k, num_perm, bands, seed),
            id_col,
        )
    else:
        sigs = minhash_signatures(df, text_col, id_col, k, num_perm, seed)
        cand = minhash_lsh_candidates(sigs, id_col, bands)
    # verify candidates with exact shingle Jaccard
    sh = word_shingles(df, text_col, id_col, k)
    per_doc = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        cand.join(a, on="id_a")
        .join(b, on=["id_b", "shingle"], how="leftsemi")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    thr_num = int(round(threshold * 1_000_000))
    verified = (
        common.join(per_doc.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na")), on="id_a")
        .join(per_doc.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb")), on="id_b")
        .filter(
            F.col("common") * 1_000_000
            >= F.lit(thr_num) * (F.col("na") + F.col("nb") - F.col("common"))
        )
        .select("id_a", "id_b")
    )
    # duplicate clusters = WCC over the verified duplicate-pair graph
    from ..algorithms.wcc import weakly_connected_components

    ids = df.select(F.col(id_col).alias("vertex"))
    pair_edges = verified.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    g = Graph.from_edgelist(
        pair_edges, directed=False, renumber=True, vertices=ids
    )
    comp = weakly_connected_components(g)
    # canonicalize cluster ids to the min external doc id per component
    canon = comp.groupBy("labels").agg(F.min("vertex").alias("cluster"))
    out = (
        comp.join(canon, on="labels")
        .select(
            F.col("vertex").alias(id_col),
            "cluster",
            (F.col("vertex") == F.col("cluster")).alias("keep"),
        )
    )
    return out


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """DF[id, simhash:long] — 64-bit Charikar simhash over whitespace tokens
    weighted by term frequency. Pure built-in expressions: per-token xxhash64
    bits are summed signed per bit position via explode + agg."""
    toks = df.select(
        id_col, F.explode(F.split(F.trim(text_col), " ")).alias("tok")
    ).groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    toks = toks.withColumn("h", F.xxhash64("tok"))
    bit_cols = []
    for i in range(64):
        bit = F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1))
        bit_cols.append(
            F.sum(F.when(bit == 1, F.col("tf")).otherwise(-F.col("tf"))).alias(f"b{i}")
        )
    agg = toks.groupBy(id_col).agg(*bit_cols)
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
    return agg.select(id_col, sim.alias("simhash"))


def simhash_near_pairs(
    sigs: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """DF[id_a, id_b, hamming] — pairs within Hamming distance via 16-bit
    band buckets (a 4-band LSH: any pair with hamming <= 3 shares at least
    one exact 16-bit band) then exact bit_count verification."""
    bands = [
        (i, F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)))
        for i in range(4)
    ]
    banded = None
    for i, expr in bands:
        part = sigs.select(
            F.col(id_col).alias("id"), F.lit(i).alias("band"), expr.alias("bucket"), "simhash"
        )
        banded = part if banded is None else banded.unionByName(part)
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket", F.col("simhash").alias("sa"))
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket", F.col("simhash").alias("sb"))
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


SIMHASH_BITS = 62  # two 31-bit LCG halves -> non-negative BIGINT signatures


def simhash_lcg_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """DF[id, simhash:long] — Charikar simhash in the repo's exact-integer
    LCG dialect (hash_mode="lcg" twin of `simhash_signatures`, whose
    xxhash64 bits have no SQL replica): token hash = two 31-bit
    (a·code + b) mod P halves over the shared char-LCG fold, packed into a
    62-bit non-negative BIGINT, then tf-weighted signed bit sums.

    100-TB shape: one token-tf map-side-combined agg + ONE 62-column
    groupBy(doc) agg (bit sums never explode the token table 62x); the
    signature table is doc-scale.
    """
    toks = (
        df.select(id_col, F.explode(F.split(F.trim(text_col), " ")).alias("tok"))
        .filter(F.length("tok") >= 1)
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("tf"))
    )
    code = F.expr(
        f"aggregate(sequence(1, length(tok)), cast(0 as bigint), (acc, i) -> "
        f"(acc + ascii(substring(tok, i, 1)) * "
        f"((cast({MH_LCG_A} as bigint) * i + {MH_LCG_B}) % {MH_LCG_P})) % {MH_LCG_P})"
    )
    h1 = (F.lit(MH_LCG_A).cast("long") * F.col("code") + F.lit(MH_LCG_B)) % F.lit(
        MH_LCG_P
    )
    h2 = (
        F.lit(MH_LCG_C % MH_LCG_P).cast("long") * F.col("code") + F.lit(54321)
    ) % F.lit(MH_LCG_P)
    toks = toks.withColumn("code", code).withColumn(
        "h", h1 + h2 * F.lit(1 << 31).cast("long")
    )
    bit_cols = []
    for i in range(SIMHASH_BITS):
        bit = F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1))
        bit_cols.append(
            F.sum(F.when(bit == 1, F.col("tf")).otherwise(-F.col("tf"))).alias(f"b{i}")
        )
    agg = toks.groupBy(id_col).agg(*bit_cols)
    sim = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        ).cast("long")
    return agg.select(id_col, sim.alias("simhash"))


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    hash_spans: bool = False,
) -> DataFrame:
    """Exact duplicate-SPAN removal — the ExactSubstr dedup of Lee et al.
    2021 ("Deduplicating Training Data Makes Language Models Better"),
    re-expressed relationally at word granularity instead of suffix arrays:

    - every window of ``w`` consecutive tokens is a span;
    - a span string occurring at >= 2 positions corpus-wide keeps only its
      CANONICAL occurrence (minimum (doc, position));
    - every token covered by a non-canonical occurrence of a duplicated
      span is dropped, and each document is reassembled from the
      survivors in original order.

    Deterministic and exactly SQL-replicable (the driver oracle replays it
    verbatim in DuckDB). Returns DF[id, text_dedup, n_tokens, n_removed].

    100-TB shape: ONE map-side-combined shuffle keyed by the span string
    (count + min-occurrence per span), one duplicate-scale join back to the
    occurrence table, a bounded w-fold position explode of non-canonical
    occurrences only, one anti-join on (doc, position), and one per-doc
    reassembly agg bounded by document length. No all-pairs stage.

    Physical plan (only TWO corpus-scale shuffles): the canonical-vs-not
    decision is ONE window pass over the span-keyed occurrence table
    (row_number per span, groups = duplicate count, bounded — not a hub
    window), and document reassembly is a MAP over the original token
    arrays guided by a duplicate-scale per-doc cut-position set, so the
    token table is never exploded, anti-joined, or re-collected. (The
    first version paid groupBy(span) + join-back + token anti-join +
    collect_list — five corpus-scale shuffles; measured 4→16 scaling on
    the string shuffle motivated the rewrite.)

    ``hash_spans=True`` is the petabyte tier: the span shuffle key becomes
    ``xxhash64(span)`` (8 bytes instead of the ~w·word_len-byte string —
    measurably lighter shuffle/spill). Two spans colliding (~n²/2⁶⁵) could
    merge two unrelated duplicate groups, so the default stays the raw
    string and the driver oracle runs collision-free by construction.
    """
    from pyspark.sql import Window

    if w < 2:
        raise ValueError("span window w must be >= 2 tokens")

    base = df.select(
        F.col(id_col).alias("doc"),
        F.split(F.trim(F.col(text_col)), " ").alias("toks"),
    ).select("doc", "toks", F.size("toks").alias("n"))

    occ = (
        base.filter(F.col("n") >= w)
        .select(
            "doc",
            F.explode(F.sequence(F.lit(1), F.col("n") - (w - 1))).alias("i"),
            "toks",
        )
        .select("doc", "i", F.concat_ws(" ", F.slice("toks", F.col("i"), w)).alias("span"))
    )
    if hash_spans:
        occ = occ.select("doc", "i", F.xxhash64("span").alias("span"))

    # one span-keyed shuffle: occurrence rank within each span group —
    # rank 1 is the canonical (min doc, min pos) occurrence, the rest are
    # cut. Window groups are duplicate counts per span, not hub-sized.
    rn = F.row_number().over(Window.partitionBy("span").orderBy("doc", "i"))
    noncanon = (
        occ.select("doc", "i", rn.alias("rn"))
        .filter(F.col("rn") > 1)
        .select("doc", "i")
    )
    covered = noncanon.select(
        "doc", F.explode(F.sequence(F.col("i"), F.col("i") + (w - 1))).alias("pos")
    ).distinct()
    # duplicate-scale per-doc cut set; corpus-scale docs join it once
    cut_doc = covered.groupBy("doc").agg(F.collect_set("pos").alias("cut"))

    cut = F.coalesce(F.col("cut"), F.expr("array()").cast("array<int>"))
    kept = F.filter(
        F.transform(
            "toks", lambda t, i: F.struct((i + 1).cast("int").alias("p"), t.alias("t"))
        ),
        lambda s: ~F.array_contains(cut, s.p),
    )
    return (
        base.join(cut_doc, on="doc", how="left")
        .select(
            F.col("doc").alias(id_col),
            F.concat_ws(" ", F.transform(kept, lambda s: s.t)).alias("text_dedup"),
            F.col("n").alias("n_tokens"),
            F.coalesce(F.size("cut"), F.lit(0)).alias("n_removed"),
        )
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
    hash_lines: bool = False,
) -> DataFrame:
    """Corpus-wide exact LINE deduplication — the line-level pass of C4
    (Raffel et al. 2020, "three-sentence span" variant simplified to the
    line) and RefinedWeb/Gopher pipelines: a line whose trimmed length is
    >= ``min_chars`` and that occurs at >= 2 (doc, position) places
    corpus-wide keeps only its CANONICAL occurrence (minimum (doc, line
    index)); every other occurrence is dropped and documents are
    reassembled from the surviving lines in original order. Lines shorter
    than ``min_chars`` (blank separators, "Home", nav stubs) are exempt —
    deduping them would tear page structure, matching production practice.

    Deterministic and exactly SQL-replicable (driver query
    ``doc_line_dedup`` replays it verbatim in DuckDB). Returns
    DF[id, text_dedup, n_lines, n_removed].

    100-TB shape (same audited plan family as :func:`span_dedup`, one
    granularity up): ONE corpus-scale shuffle keyed by the line string
    (row_number per line group — group sizes are duplicate counts, never
    hub-sized), a duplicate-scale per-doc cut-index set, and a map-side
    array-filter rebuild. The line table is never anti-joined or
    re-collected; docs that lose nothing join a cut set that only
    duplicate-bearing docs populate. ``hash_lines=True`` is the petabyte
    tier: the shuffle key becomes ``xxhash64(line)`` (8 bytes vs the full
    line — same collision caveat as span_dedup's ``hash_spans``).

    Reference N/A (the cuGraph fork has no text layer); technique per C4
    appendix + Penedo et al. 2023 (RefinedWeb) §3.
    """
    from pyspark.sql import Window

    if min_chars < 0:
        raise ValueError("min_chars must be >= 0")

    base = df.select(
        F.col(id_col).alias("doc"),
        F.split(F.col(text_col), sep).alias("lines"),
    ).select("doc", "lines", F.size("lines").alias("n"))

    occ = (
        base.select("doc", F.posexplode("lines").alias("i", "line"))
        .filter(F.length(F.trim("line")) >= min_chars)
        .select("doc", (F.col("i") + 1).alias("i"), "line")
    )
    if hash_lines:
        occ = occ.select("doc", "i", F.xxhash64("line").alias("line"))

    rn = F.row_number().over(Window.partitionBy("line").orderBy("doc", "i"))
    cut_doc = (
        occ.select("doc", "i", rn.alias("rn"))
        .filter(F.col("rn") > 1)
        .groupBy("doc")
        .agg(F.collect_set("i").alias("cut"))
    )

    cut = F.coalesce(F.col("cut"), F.expr("array()").cast("array<int>"))
    kept = F.filter(
        F.transform(
            "lines", lambda t, i: F.struct((i + 1).cast("int").alias("p"), t.alias("t"))
        ),
        lambda s: ~F.array_contains(cut, s.p),
    )
    return base.join(cut_doc, on="doc", how="left").select(
        F.col("doc").alias(id_col),
        F.array_join(F.transform(kept, lambda s: s.t), sep).alias("text_dedup"),
        F.col("n").alias("n_lines"),
        F.coalesce(F.size("cut"), F.lit(0)).alias("n_removed"),
    )
