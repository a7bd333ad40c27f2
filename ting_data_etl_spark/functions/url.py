"""URL canonicalization — the web-corpus dedup key (CCNet / RefinedWeb).

Web-scale pipelines dedup by canonicalized URL BEFORE content dedup: the
same page is crawled under scheme/host case variants, default ports,
fragments, and tracking-parameter decorations, and collapsing those is far
cheaper than any content comparison. ``canonical_url`` is the Spark Column
form; ``sql_canonical_url`` is its DuckDB twin built from the same regex
fragments (shared RE2/Java-safe subset, the pii-module convention).

Canonicalization steps (order matters):

1. trim; drop the fragment (``#...``);
2. lowercase the scheme and the host[:port] (path/query case preserved —
   paths are case-sensitive per RFC 3986);
3. strip the scheme's default port (``:80`` http, ``:443`` https);
4. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
   preserving the relative order of the surviving parameters (order is
   semantic for some endpoints; sorting is a lossier variant some
   pipelines choose — documented, not done);
5. empty path → ``/``; empty surviving query → no ``?``.

The reference engine (ting-data-etl) has no URL handling; this extends the
LLM-pipeline dedup family per the round-7 verdict.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scheme prefix matcher (RFC 3986 scheme chars) — shared subset, no \s
_SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://"
#: tracking parameters dropped by step 4
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]+|fbclid|gclid|ref)="


def canonical_url(col: Column | str) -> Column:
    """Canonical form of a URL string column (see module docstring)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    u = F.regexp_replace(u, "#.*", "")  # fragment off first
    scheme = F.lower(F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]+)", 1))
    host = (
        F.when(
            scheme == "https", F.regexp_replace(hostport, ":443$", "")
        )
        .when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qjoin = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qjoin != "", F.concat(F.lit("?"), qjoin)).otherwise(F.lit("")),
    )


def sql_canonical_url(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` — same steps, same regexes.

    DuckDB's ``regexp_replace`` replaces only the FIRST match by default —
    every pattern here anchors (``^``) or consumes to end (``#.*``), so
    first-match and global behavior coincide with Spark's replace-all.
    ``regexp_extract`` returns ``''`` on no-match in BOTH engines (probed).
    """
    u = f"regexp_replace(trim({expr}), '#.*', '')"
    scheme = f"lower(regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '{_SCHEME_RE}', '')"
    hostport = f"lower(regexp_extract({rest}, '^([^/?]+)', 1))"
    host = (
        f"CASE WHEN {scheme} = 'https' "
        f"THEN regexp_replace({hostport}, ':443$', '') "
        f"WHEN {scheme} = 'http' "
        f"THEN regexp_replace({hostport}, ':80$', '') "
        f"ELSE {hostport} END"
    )
    pathq = f"regexp_replace({rest}, '^[^/?]*', '')"
    path_raw = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    path = f"CASE WHEN {path_raw} = '' THEN '/' ELSE {path_raw} END"
    query = f"regexp_extract({pathq}, '\\?(.*)$', 1)"
    qjoin = (
        f"array_to_string(list_filter(str_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')), '&')"
    )
    return (
        f"({scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {qjoin} <> '' THEN '?' || {qjoin} ELSE '' END)"
    )
