"""URL normalization for corpus pipelines — pure column expressions.

Web-scale curation dedupes and filters by URL before ever touching
document bytes (the CCNet / RefinedWeb recipe): a canonical URL key
collapses the crawl's `HTTPS://User@Host:443//a//b?utm_source=x&b=2&a=1#f`
noise onto one representative so URL-level dedup, domain blocklists and
per-domain caps are cheap hash-groupBys. Everything here is a JVM
regexp/array expression chain (no UDFs) written against portable regex
syntax, so the DuckDB oracle re-implements the identical spec
(operators/registry.py ex_warc_docs 'urls' branch hash-checks the two).

Canonicalization spec (applied in order):

1. trim; URLs without a `scheme://` pass through trimmed (relative refs
   are not crawl keys).
2. scheme and host lowercased; userinfo (`user@`) dropped.
3. default ports dropped (http:80, https:443); other ports kept.
4. path: runs of `/` collapsed, trailing `/` dropped (root stays `/`,
   empty path becomes `/`).
5. query: parameters split on `&`, empties and tracking params dropped
   (`utm_*`, `fbclid`, `gclid`, `msclkid`, `ref`), the rest SORTED so
   parameter order never splits a dedup group; empty result drops the
   `?` entirely.
6. fragment dropped.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking parameters dropped from canonical queries (name= prefix match)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_host(url: Column) -> Column:
    """Lowercased host (userinfo and port stripped); '' when the input has
    no ``scheme://``."""
    hp = F.regexp_replace(
        F.regexp_extract(url, _HOSTPORT_RE, 1), r"^[^@]*@", ""
    )
    return F.lower(F.regexp_replace(hp, r":[0-9]+$", ""))


def url_domain(url: Column) -> Column:
    """Registrable-domain HEURISTIC: the last two dot-labels of the host
    (``a.b.example.com`` → ``example.com``). Deliberately not a public-
    suffix-list lookup — good enough for per-domain caps/blocklists on
    generic TLDs; swap in a PSL join for ccTLD-exact behavior."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def canonical_url(url: Column) -> Column:
    """The canonical crawl key per the module spec — a deterministic pure
    expression both Spark and the DuckDB oracle implement identically."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.regexp_replace(
        F.regexp_extract(u, _HOSTPORT_RE, 1), r"^[^@]*@", ""
    )
    host = F.lower(F.regexp_replace(hostport, r":[0-9]+$", ""))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"(.)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qcanon = F.array_join(F.sort_array(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(rebuilt)


def cap_per_domain(df, cap: int, url_col: str = "url", id_col: str = "doc_id"):
    """Keep at most ``cap`` documents per registrable domain (lowest ids
    win — deterministic, layout-invariant). The standard anti-dominance
    stage: without it a handful of template-heavy hosts (forums, wikis,
    link farms) swamp the corpus mix.

    Shape: one shuffle on the domain key + a bounded per-key sort — the
    window never materializes more than a partition, and domain
    cardinality is huge relative to ``cap`` so no key is hot. For
    corpus-scale runs where even per-key ordering is too much, swap the
    row_number for a deterministic hash-sample (sampling.py) — this form
    is the exact-semantics one."""
    from pyspark.sql import Window

    w = Window.partitionBy("_dom").orderBy(F.col(id_col))
    return (
        df.withColumn("_dom", url_domain(F.col(url_col)))
        .withColumn("keep_domain_cap", F.row_number().over(w) <= cap)
        .withColumnRenamed("_dom", "domain")
    )


def dedup_by_url(df, url_col: str = "url", id_col: str = "doc_id"):
    """URL-level exact dedup: keep the lowest id per canonical URL.

    Same scale shape as content dedup (operators/dedup.py): the URL-keyed
    shuffles move only (id, canonical_url) pairs — document bytes NEVER
    travel on the URL key. The per-id keep flags then join back on
    ``id_col``, the pipeline's standard co-partition key, so docs stored
    bucketed by id (io/sinks.write_bucketed) take the flag join without
    shuffling text at all. URL dedup runs FIRST in a crawl pipeline — it
    deletes refetches before any text processing pays for them."""
    keys = df.select(
        F.col(id_col), canonical_url(F.col(url_col)).alias("canonical_url")
    )
    keep = keys.groupBy("canonical_url").agg(F.min(id_col).alias("_keep"))
    flags = keys.join(keep, "canonical_url").select(
        id_col,
        "canonical_url",
        (F.col(id_col) == F.col("_keep")).alias("keep_url"),
    )
    return df.join(flags, id_col)
