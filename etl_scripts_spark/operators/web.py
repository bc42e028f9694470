"""URL / domain-layer curation operators.

The layer every crawl-derived training corpus needs before text-level
dedup even starts: canonicalize URLs (scheme/host case, default ports,
tracking params, fragments, trailing slashes), dedup at the URL level,
and roll document statistics up to the registrable domain so a
blocklist / quality threshold can drop whole domains cheaply.

Everything here is pure Catalyst (regexp + higher-order array
functions) — no Python stages, so at 100 TB the canonicalization is a
map-side projection fused into the scan, URL dedup is ONE shuffle on
the canonical string (md5-uniform keyspace: billions of distinct URLs,
no hot key), and the domain rollup is ONE shuffle on the domain with
map-side partial aggregation.  The blocklist is a broadcast anti-join
— domain lists are small by construction (≤ millions of rows).

Reference parity: the reference has no crawl layer; this implements the
standard published pipeline stage (CCNet / RefinedWeb / C4 URL rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: params stripped during canonicalization (click-tracking noise that
#: makes byte-distinct URLs refer to the same resource)
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid)($|=)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an http(s) URL, as one Catalyst expression.

    Rules (the common-denominator of C4/CCNet-style crawl pipelines):
    lowercase scheme and host, strip a leading ``www.``, drop the
    scheme's default port (80/443 — explicit non-default ports are
    identity), drop the fragment, drop tracking params
    (``utm_*``/``gclid``/``fbclid``), sort surviving query params,
    collapse trailing slashes on the path.

    Scale: map-side only — fuses into whole-stage codegen over the scan;
    the downstream dedup shuffle keys on the RESULT, so canonicalization
    never adds an exchange of its own.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    hostport = F.lower(F.regexp_extract(url, r"://([^/?#]+)", 1))
    hostport = F.when(scheme == "http", F.regexp_replace(hostport, r":80$", "")).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    host = F.regexp_replace(hostport, r"^www\.", "")
    path = F.regexp_replace(
        F.regexp_extract(url, r"://[^/?#]*([^?#]*)", 1), r"/+$", ""
    )
    qparts = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(url, r"\?([^#]*)", 1), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.array_join(qparts, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def url_domain(canonical: Column) -> Column:
    """Registrable host of an already-canonical URL (port kept if
    non-default — it names a different origin)."""
    return F.regexp_extract(canonical, r"://([^/?#]+)", 1)


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """URL-level exact dedup: canonicalize, group, keep the smallest id.

    ONE shuffle, keyed on the canonical URL string — a uniform keyspace
    (no salting needed; the long tail of the web IS the key
    distribution), with map-side partial min/count.
    """
    return (
        df.select(F.col(id_col), canonicalize_url(F.col(url_col)).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_variants"),
            F.min(id_col).alias("keep_doc_id"),
        )
    )


def domain_rollup(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    quality: Column | None = None,
) -> DataFrame:
    """Per-domain corpus statistics: doc count, token count, mean quality,
    and URL-duplicate rate — the inputs to a domain-level keep/drop
    decision.

    The per-doc columns (tokens, quality, canonical URL) are all
    scan-fused projections.  dup_rate needs COUNT(DISTINCT url) per
    domain: Catalyst plans the distinct agg as partial dedup on
    (domain, url) map-side before the final domain aggregate, so the
    exchange moves deduplicated pairs, not raw rows.  At 100 TB, if the
    two-phase distinct ever dominates, swap in approx_count_distinct —
    an HLL partial merges in ONE phase and a ±2% estimate cannot flip a
    blocklist decision driven by order-of-magnitude dup rates; the
    exact form is kept here because the DuckDB oracle compares values.
    """
    from etl_scripts_spark.operators import text as textops

    canon = canonicalize_url(F.col(url_col))
    q = quality if quality is not None else textops.quality_score(F.col(text_col))
    per_doc = df.select(
        url_domain(canon).alias("domain"),
        canon.alias("canonical_url"),
        F.size(textops.words(F.col(text_col))).alias("n_tokens"),
        q.alias("quality"),
    )
    return per_doc.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        # DECIMAL sum → order-independent and exact (repo float discipline:
        # per-doc quality is already rounded to 4 dp), ONE double division
        F.round(
            F.sum(F.col("quality").cast("decimal(18,4)")).cast("double")
            / F.count("*"),
            4,
        ).alias("mean_quality"),
        F.round(
            F.lit(1.0) - F.countDistinct("canonical_url") / F.count("*"), 4
        ).alias("dup_rate"),
    )


def drop_blocklisted_domains(
    df: DataFrame, blocklist: DataFrame, domain_col: str = "domain"
) -> DataFrame:
    """Anti-join against a (small) domain blocklist — explicitly
    broadcast: the blocklist side is bounded (curated lists top out at
    millions of rows), so no shuffle of the corpus-sized left side."""
    return df.join(
        F.broadcast(blocklist),
        df[domain_col] == blocklist[domain_col],
        "left_anti",
    )
