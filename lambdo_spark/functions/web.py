"""URL canonicalization — the Common-Crawl dedup precursor.

Exact-dedup and keep-latest-crawl dedup (functions/dedup.py) key on
the url; raw crawl urls are noisy (tracking params, fragments, case,
default ports, ``www.``), so the same page appears under many keys.
Canonicalization folds those variants BEFORE the dedup groupBy — at
10^12 docs this is the difference between one group per page and a
handful.

Everything here is a composition of JVM scalar expressions
(``lower`` / ``regexp_replace`` / ``regexp_extract``) — no Python in
the path, whole-stage-codegen friendly, and replicable in ANSI SQL
with the same regexes (the driver oracle runs the identical chain in
DuckDB; patterns avoid backrefs/lookaround so Java regex and RE2
agree).

Reference analog: lambdo computes derived key columns with arbitrary
per-row callables (/root/reference/lambdo/Column.py:170-260 calculate);
this is that shape for the crawl-key domain, kept declarative.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# query params that never identify content (ad/campaign trackers)
TRACKING_PARAMS = r"(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|ref_src)"


def canonical_url(col: Column) -> Column:
    """Normalize a crawl url to its canonical content key.

    Steps (order matters):

    1. drop the fragment (``#...`` never reaches the server),
    2. drop tracking query params (``utm_*``, click ids) and mend the
       separators they leave behind (``?&`` / ``&&`` / trailing ``?``),
    3. lowercase the scheme and host (path/query stay case-sensitive
       per RFC 3986), drop a default port (:80/:443) and a leading
       ``www.``,
    4. collapse a bare trailing ``/`` on the root path.
    """
    u = F.regexp_replace(col, r"#.*$", "")
    # tracking params: as first param (keep the '?'), or a later param
    # (strip the preceding '&')
    u = F.regexp_replace(u, r"([?&])" + TRACKING_PARAMS + r"=[^&#]*", "$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    host = F.regexp_replace(host, r":(80|443)$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_replace(rest, r"^/$", "")
    # non-url-shaped input (no scheme) passes through untouched
    return F.when(scheme == "", col).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def url_host(col: Column) -> Column:
    """Lowercased host of a url ('' when not url-shaped), port and
    ``www.`` stripped — the shuffle/salting key for per-site rollups."""
    host = F.lower(F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(host, r":[0-9]+$", "")
    return F.regexp_replace(host, r"^www\.", "")


def registered_domain(col: Column) -> Column:
    """Last two dot-labels of the host — the skew-aware partitioning
    unit for crawl data (heuristic; a public-suffix list refines it
    where available, the column shape is identical)."""
    return F.regexp_extract(url_host(col), r"([^.]+\.[^.]+)$", 1)
