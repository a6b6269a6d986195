"""URL canonicalization + canonical-URL dedup — the stage every
Common-Crawl-style corpus pipeline runs BEFORE content dedup (the same
page is crawled under http/https, with/without www, with tracking
params, fragments, default ports, and trailing slashes; treating those
as distinct documents inflates the corpus and skews all downstream
frequency statistics).

The reference has no URL surface (its inputs are already edge lists);
this is a beyond-reference pipeline operator in the same family as
text/pipeline.py. Rules follow the common subset of RFC 3986 §6
syntax-based normalization plus the pragmatic conventions crawl
pipelines add on top:

1. trim surrounding whitespace;
2. scheme and host lowercased (path/query case is significant);
3. fragment removed;
4. default ports dropped (``:80`` for http, ``:443`` for https);
5. a leading ``www.`` label dropped from the host;
6. tracking parameters removed from the query string — names matching
   ``utm_*`` plus the exact set {fbclid, gclid, msclkid, igshid, ref,
   mc_eid} — and the surviving parameters sorted byte-wise so parameter
   order never distinguishes two urls; an emptied query drops its ``?``;
7. trailing slashes stripped from a non-root path; an empty path
   becomes ``/``.

Percent-encoding normalization and IDN/punycode folding are documented
non-goals (they need a full codec, not a column expression). Strings
that do not parse as ``scheme://authority...`` are returned trimmed but
otherwise untouched — a canonicalizer must never destroy keys it does
not understand.

100-TB shape: everything below is built-in column expressions (regexp,
split, higher-order filter, array_sort) — whole-stage codegen, zero
Python, zero shuffle; ``url_dedup`` adds exactly one map-side-combined
groupBy(canonical) shuffle, the same shape as exact text dedup
(text/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# exact-name tracking params (utm_* is matched by prefix)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "igshid", "ref", "mc_eid")

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of ``url`` per the module rules — one built-in
    column expression (codegen, no UDF)."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)

    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    auth = F.regexp_extract(u, _URL_RE, 2)
    path = F.regexp_extract(u, _URL_RE, 3)
    query = F.regexp_extract(u, _URL_RE, 4)

    # authority = [userinfo@]host[:port] — userinfo (rare but present in
    # real crawl data) is preserved verbatim, case-significant; only the
    # host is folded. Without this split, 'user:pw@host' would parse the
    # username as the host and collapse distinct hosts into one key.
    userinfo = F.regexp_extract(auth, r"^([^@]*)@", 1)
    user_part = F.when(userinfo != "", F.concat(userinfo, F.lit("@"))).otherwise(
        F.lit("")
    )
    hostport = F.regexp_replace(auth, r"^[^@]*@", "")
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    port_part = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))

    npath = F.when(
        F.regexp_replace(path, r"/+$", "") == "", F.lit("/")
    ).otherwise(F.regexp_replace(path, r"/+$", ""))

    def _name(p: Column) -> Column:
        return F.substring_index(p, "=", 1)

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~_name(p).startswith("utm_")
        & ~_name(p).isin(*TRACKING_PARAMS),
    )
    nquery = F.array_join(F.array_sort(params), "&")
    query_part = F.when(nquery != "", F.concat(F.lit("?"), nquery)).otherwise(
        F.lit("")
    )

    canon = F.concat(
        scheme, F.lit("://"), user_part, host, port_part, npath, query_part
    )
    # non-URL strings pass through trimmed (regexp_extract yields '' on
    # no-match, so scheme=='' identifies them); NULL stays NULL
    return F.when(scheme == "", u).otherwise(canon)


def canonicalize_url_sql(expr: str) -> str:
    """The DuckDB-dialect twin of :func:`canonicalize_url` over the SQL
    expression ``expr`` — used by the driver oracle so both engines apply
    the IDENTICAL rules. Kept adjacent to the Spark form so the two are
    reviewed together; RE2 (DuckDB) and Java regex agree on every pattern
    used here (no backreferences/lookaround)."""
    u = f"trim({expr})"
    re = _URL_RE.replace("'", "''")
    scheme = f"lower(regexp_extract({u}, '{re}', 1))"
    auth = f"regexp_extract({u}, '{re}', 2)"
    path = f"regexp_extract({u}, '{re}', 3)"
    query = f"regexp_extract({u}, '{re}', 4)"
    userinfo = f"regexp_extract({auth}, '^([^@]*)@', 1)"
    user_part = f"CASE WHEN {userinfo} <> '' THEN {userinfo} || '@' ELSE '' END"
    hostport = f"regexp_replace({auth}, '^[^@]*@', '')"
    host = f"regexp_replace(lower(regexp_extract({hostport}, '^([^:]*)', 1)), '^www\\.', '')"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    port_part = (
        f"CASE WHEN {port} <> '' AND NOT ({scheme} = 'http' AND {port} = '80') "
        f"AND NOT ({scheme} = 'https' AND {port} = '443') "
        f"THEN ':' || {port} ELSE '' END"
    )
    stripped = f"regexp_replace({path}, '/+$', '')"
    npath = f"CASE WHEN {stripped} = '' THEN '/' ELSE {stripped} END"
    track = " OR ".join(
        f"split_part(p, '=', 1) = '{t}'" for t in TRACKING_PARAMS
    )
    params = (
        f"list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT starts_with(split_part(p, '=', 1), 'utm_') "
        f"AND NOT ({track}))"
    )
    nquery = f"array_to_string(list_sort({params}), '&')"
    query_part = f"CASE WHEN {nquery} <> '' THEN '?' || {nquery} ELSE '' END"
    canon = (
        f"{scheme} || '://' || {user_part} || {host} || {port_part} "
        f"|| {npath} || {query_part}"
    )
    return f"CASE WHEN {scheme} = '' THEN {u} ELSE {canon} END"


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """DF[id, url, canonical_url, is_canonical] — ``is_canonical`` marks
    the keeper (min id) per canonical-url group, the same keep-min rule
    as exact text dedup (text/dedup.py). One map-side-combined shuffle on
    the canonical url."""
    c = df.select(
        F.col(id_col), F.col(url_col), canonicalize_url(url_col).alias("canonical_url")
    )
    # NULL urls cannot be canonicalized, so each is its own group (kept);
    # an equi-join would silently DROP them (NULL != NULL), so they bypass
    # the group join entirely.
    nulls = c.filter(F.col("canonical_url").isNull()).select(
        id_col, url_col, "canonical_url", F.lit(True).alias("is_canonical")
    )
    c = c.filter(F.col("canonical_url").isNotNull())
    keeper = c.groupBy("canonical_url").agg(F.min(id_col).alias("__keep__"))
    return (
        c.join(keeper, on="canonical_url")
        .select(
            id_col,
            url_col,
            "canonical_url",
            (F.col(id_col) == F.col("__keep__")).alias("is_canonical"),
        )
        .unionByName(nulls)
    )
