"""URL canonicalization — pure JVM column expressions, no UDFs.

Web-crawl corpora dedup on the *canonical* URL before ever touching
page text: scheme/host case, default ports, ``www.`` prefixes, tracking
parameters, parameter order, and trailing slashes all vary across
re-crawls of the same resource. Canonicalizing first collapses those
variants so URL-level dedup (the cheapest dedup there is — no content
needed) catches them.

Rules applied (the common crawl-pipeline set; each is a plain Spark SQL
expression so Catalyst keeps the whole thing in whole-stage codegen):

1. drop the fragment (``#...`` never reaches the server);
2. lowercase scheme and host (RFC 3986 §6.2.2.1), path case preserved;
3. strip the default port (``:80`` http, ``:443`` https);
4. strip a leading ``www.`` (aggressive but standard in crawl dedup);
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``) and sort the survivors byte-wise;
6. collapse trailing slashes; empty path becomes ``/``.

Every rule has a byte-identical DuckDB spelling (``_SQL_CANONICAL_URL``
below), so URL operators stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|ref)="


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL column (rules above)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _AUTHORITY_RE, 1)), r"^www\.", ""
    )
    host = (
        F.when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .otherwise(host)
    )
    path = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(url, _QUERY_RE, 1), "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def sql_canonical_url(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` applied to SQL expression
    ``expr`` (kept in lockstep rule-for-rule)."""
    scheme = f"lower(regexp_extract({expr}, '{_SCHEME_RE}', 1))"
    host0 = f"lower(regexp_extract({expr}, '{_AUTHORITY_RE}', 1))"
    host1 = f"regexp_replace({host0}, '^www\\.', '')"
    host = (
        f"CASE WHEN {scheme} = 'https' THEN regexp_replace({host1}, ':443$', '') "
        f"WHEN {scheme} = 'http' THEN regexp_replace({host1}, ':80$', '') "
        f"ELSE {host1} END"
    )
    path0 = f"regexp_replace(regexp_extract({expr}, '{_PATH_RE}', 1), '/+$', '')"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    # COALESCE: DuckDB's array_to_string returns NULL on an empty list
    # (Spark's array_join returns ''), so an all-tracking query string
    # would otherwise null out the whole URL.
    qs = (
        "COALESCE(array_to_string(list_sort(list_filter("
        f"string_split(regexp_extract({expr}, '\\?([^#]*)', 1), '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_PARAM_RE}'))), '&'), '')"
    )
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END"
    )
