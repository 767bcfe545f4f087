"""URL canonicalization for web-corpus deduplication and partitioning.

A 100 TB web crawl's first dedup key is the URL, and raw URLs are noisy:
the same page appears as ``HTTP://WWW.Example.COM:80/a//b/?utm_source=x&
b=2&a=1#frag`` and ``http://example.com/a/b?a=1&b=2``. Canonicalizing
before the URL-level groupBy collapses those variants WITHOUT any text
comparison — it is the cheapest dedup stage and runs first in every
published crawl pipeline (cf. the URL normalization steps described for
Common Crawl processing in the CCNet paper, Wenzek et al., LREC 2020,
and RFC 3986 §6's normalization ladder, which is the spec this module
follows where it is deterministic).

Everything here is a pure Catalyst ``Column`` expression — regexps,
``split``/``array_sort``/``array_join`` — so canonicalization rides the
scan inside WholeStageCodegen with zero shuffle and zero Python, and a
SQL engine (DuckDB twin, chk='url' fold in ``__spark_entry__``) can
replay every step bit-for-bit.

Steps applied by :func:`canonicalize_url` (each RFC-3986-safe or a
documented crawl-pipeline convention):

1. trim; scheme and host lowercased (RFC 3986 §6.2.2.1)
2. userinfo stripped (crawler convention — credentials never key a page)
3. leading ``www.`` and trailing ``.`` stripped from the host
4. default ports removed: ``:80`` for http, ``:443`` for https (§6.2.3)
5. path: duplicate ``//`` collapsed, trailing ``/`` dropped (non-root),
   empty path -> ``/`` (§6.2.3)
6. query: tracking params dropped (``utm_*``, ``gclid``, ``fbclid``,
   ``mc_cid``, ``mc_eid``, ``ref``), remaining params byte-sorted,
   empty query dropped
7. fragment dropped (never sent to the server, §3.5)

Reference-repo parity: the reference has no URL layer (its P9
description normalizer strips URLs from text,
``/root/reference/src/preprocessing/clean.py``); this extends the P8/P9
normalization surface to the URL column a web-scale corpus carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters every major crawl pipeline strips: they vary per
# click, never per page. Kept to a fixed public list so the DuckDB twin
# can embed the same regex literally.
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|gclid|fbclid|mc_cid|mc_eid|ref)="


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col) -> Column:
    """Lowercased scheme, '' when the URL has none."""
    return F.lower(F.regexp_extract(F.trim(_c(col)), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(col) -> Column:
    """Canonical host: lowercased authority minus userinfo, port,
    leading ``www.`` and trailing dot."""
    auth = F.regexp_extract(F.trim(_c(col)), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host = F.regexp_replace(F.lower(auth), r"^[^@]*@", "")  # userinfo
    host = F.regexp_replace(host, r":[0-9]*$", "")  # port (canon re-adds non-default)
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r"\.$", "")


def url_port(col) -> Column:
    """Explicit port string ('' when absent)."""
    auth = F.regexp_extract(F.trim(_c(col)), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    return F.regexp_extract(auth, r":([0-9]+)$", 1)


def url_path(col) -> Column:
    """Canonical path: ``//`` collapsed, trailing slash dropped unless
    root, empty -> ``/``."""
    p = F.regexp_extract(
        F.trim(_c(col)), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    p = F.regexp_replace(p, r"/{2,}", "/")
    p = F.regexp_replace(p, r"(.)/$", r"$1")
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query_canonical(col) -> Column:
    """Canonical query string (no leading ``?``): tracking params
    dropped, remaining ``k=v`` units byte-sorted, '' when nothing
    survives."""
    q = F.regexp_extract(F.trim(_c(col)), r"\?([^#]*)", 1)
    parts = F.split(q, "&")
    kept = F.filter(
        parts,
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(kept), "&")


def canonicalize_url(col) -> Column:
    """Full canonical URL (see module docstring for the step list).

    Rows that do not parse as ``scheme://host...`` canonicalize to NULL
    so malformed records never collide into one giant dedup group.
    Idempotent: ``canonicalize_url(canonicalize_url(u)) ==
    canonicalize_url(u)`` (pinned by ``test_urls.py``).
    """
    c = _c(col)
    scheme, host, port, path = url_scheme(c), url_host(c), url_port(c), url_path(c)
    q = url_query_canonical(c)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when(
        (port == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        portpart,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when((scheme == "") | (host == ""), F.lit(None).cast("string")).otherwise(
        out
    )


def host_reversed(col) -> Column:
    """Host with labels reversed (``news.example.com`` ->
    ``com.example.news``) — the standard web-table sort key: rows from
    one registrable domain become CONTIGUOUS, so range-partitioning the
    crawl by this key gives per-domain locality (domain-level stats,
    politeness grouping) without a shuffle per analysis."""
    return F.array_join(F.reverse(F.split(url_host(col), r"\.")), ".")


def registrable_domain(col) -> Column:
    """Public-suffix-LITE registrable domain: last two host labels, or
    last three when the second-to-last is a well-known second-level
    suffix (``co``, ``com``, ``org``, ``net``, ``ac``, ``gov``, ``edu``
    under a 2-letter ccTLD — covers ``co.uk``-style hierarchies).
    A full Public Suffix List lookup is a broadcast-join against the
    published table in production; the heuristic keeps this sandbox
    dependency-free and is exact on the synthetic corpus."""
    labels = F.split(url_host(col), r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    three = (
        (n >= 3)
        & (F.length(tld) == 2)
        & second.isin("co", "com", "org", "net", "ac", "gov", "edu")
    )
    take = F.when(three, F.lit(3)).otherwise(F.lit(2))
    return F.when(n <= 2, F.array_join(labels, ".")).otherwise(
        F.array_join(F.slice(labels, n - take + 1, take), ".")
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    order_by: list[Column] | None = None,
    keep_col: str = "canonical_url",
) -> DataFrame:
    """URL-level dedup: canonicalize, keep ONE row per canonical URL.

    ``order_by`` ranks the survivors (default: the raw URL ascending —
    deterministic only when raw URLs are unique per canonical group;
    pass a total order, e.g. ``[url, id]``, when exact raw duplicates
    can coexist); rows whose URL fails to parse
    (canonical NULL) are all kept, since nothing proves them equal.
    One hash shuffle on the canonical key; the window never sees more
    than one group per task.
    """
    from pyspark.sql import Window

    canon = canonicalize_url(url_col)
    out = df.withColumn(keep_col, canon)
    order = order_by if order_by is not None else [F.col(url_col).asc()]
    w = Window.partitionBy(keep_col).orderBy(*order)
    ranked = out.withColumn("_rn", F.row_number().over(w))
    return ranked.filter(F.col(keep_col).isNull() | (F.col("_rn") == 1)).drop("_rn")
