"""URL normalization, domain extraction, and per-domain caps.

Web-scale corpora (Common-Crawl-derived pipelines: C4, RefinedWeb,
FineWeb) key curation decisions on the URL: normalize it so trivially
different spellings of the same page dedup together, extract the host for
blocklists and per-domain statistics, and CAP the number of documents any
single domain contributes so a few mega-domains cannot dominate the
training mix (RefinedWeb §3.1 applies exactly this per-domain limit).

Engine/scale notes:
  * ``normalize_url`` / ``url_host`` are pure regexp projections in
    WholeStageCodegen — zero shuffles, written in the Java-regex ∩ RE2
    subset so the DuckDB oracle reproduces them byte-for-byte.
  * ``cap_per_domain`` is ONE shuffle (hash-partition by domain) feeding a
    window ``row_number`` ordered by a salted md5 of the doc id — the keep
    set is therefore deterministic, insertion-order-free, and re-runnable
    (the same doc survives the cap on every engine and every run). Project
    down to (id, domain) BEFORE the window and re-attach payload columns
    after the filter, so the sort under the window moves ids, not
    documents. Mega-domain skew is handled BY THE PLAN: because the filter
    is ``row_number() <= k``, Catalyst inserts a PARTIAL WindowGroupLimit
    on the map side (verified in the physical plan — Sort+WindowGroupLimit
    Partial BEFORE the Exchange), so every map partition forwards at most
    k rows per domain and a domain with 10^9 docs ships k x n_map_partitions
    rows through the shuffle, never its full mass. The reduce side then
    takes the exact global top-k per domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCHEME = r"^[a-z][a-z0-9+.-]*://"
_WWW = r"^www\."
_QUERY_FRAGMENT = r"[?#].*$"
_TRAILING_SLASH = r"/+$"


def normalize_url(url: Column) -> Column:
    """Lowercase, strip scheme, leading ``www.``, query/fragment, and
    trailing slashes. Null-safe (null -> empty string)."""
    u = F.lower(F.coalesce(url, F.lit("")))
    u = F.regexp_replace(u, _SCHEME, "")
    u = F.regexp_replace(u, _WWW, "")
    u = F.regexp_replace(u, _QUERY_FRAGMENT, "")
    u = F.regexp_replace(u, _TRAILING_SLASH, "")
    return u


def url_host(url_norm: Column) -> Column:
    """Host of an already-normalized URL: everything before the first
    '/' (ports kept — strip with a second extract if needed)."""
    return F.regexp_extract(url_norm, r"^([^/]+)", 1)


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    max_per_domain: int,
    salt: str = "domaincap",
) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per domain, chosen
    deterministically by salted-md5 order of the id (ties broken by id) —
    NOT by arrival order, so the surviving set is stable across runs,
    engines, and partitionings. Adds ``keep_rank`` (1-based rank among the
    domain's survivors)."""
    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
    order_key = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    w = (
        Window.partitionBy(domain_col)
        .orderBy(order_key.asc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("keep_rank", F.row_number().over(w))
        .filter(F.col("keep_rank") <= max_per_domain)
    )


def domain_stats(df: DataFrame, domain_col: str) -> DataFrame:
    """Per-domain doc counts — the table a blocklist/cap policy reads.
    Map-side-combinable hash aggregate; one shuffle on domain."""
    return df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))


def filter_blocked_domains(
    df: DataFrame, blocklist: DataFrame, domain_col: str
) -> DataFrame:
    """Drop every row whose domain appears in ``blocklist`` (a one-column
    DataFrame named ``domain_col``). Blocklists are small (10^4-10^6
    domains) next to a 100 TB corpus, so broadcast the blocklist and
    anti-join — no shuffle of the corpus side."""
    b = F.broadcast(blocklist.select(domain_col).distinct())
    return df.join(b, on=domain_col, how="left_anti")
