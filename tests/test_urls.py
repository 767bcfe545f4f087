from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.functions.urls import (
    canonicalize_url,
    host_reversed,
    registrable_domain,
    url_dedup,
)


CASES = [
    # (raw, expected canonical)
    ("http://example.com", "http://example.com/"),
    ("HTTP://WWW.Example.COM:80/a//b/?utm_source=x&b=2&a=1#frag",
     "http://example.com/a/b?a=1&b=2"),
    ("https://example.com:443/x/", "https://example.com/x"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://user:pw@example.com./p?fbclid=1&gclid=2", "http://example.com/p"),
    ("http://example.com/p?z=1&a=2&m=3", "http://example.com/p?a=2&m=3&z=1"),
    ("http://example.com/#only-frag", "http://example.com/"),
    ("not a url", None),
    ("/relative/path", None),
    ("ftp://Files.Example.net/pub/", "ftp://files.example.net/pub"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(CASES)], "i int, url string")
    got = {
        r.i: r.c
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: got {got[i]!r}, want {want!r}"


def test_canonicalize_url_idempotent(spark):
    df = spark.createDataFrame([(r,) for r, w in CASES if w], "url string")
    once = df.select(canonicalize_url("url").alias("c"))
    twice = once.select(F.col("c").alias("orig"), canonicalize_url("c").alias("again"))
    for r in twice.collect():
        assert r.again == r.orig


def test_host_reversed_and_registrable_domain(spark):
    rows = [
        ("http://news.bbc.co.uk/x", "uk.co.bbc.news", "bbc.co.uk"),
        ("https://www.example.com/", "com.example", "example.com"),
        ("http://a.b.c.example.org/", "org.example.c.b.a", "example.org"),
        ("http://localhost/", "localhost", "localhost"),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in rows], "url string")
    got = df.select(
        "url",
        host_reversed("url").alias("hr"),
        registrable_domain("url").alias("rd"),
    ).collect()
    want = {u: (hr, rd) for u, hr, rd in rows}
    for r in got:
        assert (r.hr, r.rd) == want[r.url]


def test_url_dedup_keeps_one_per_canonical_and_all_malformed(spark):
    df = spark.createDataFrame(
        [
            (1, "http://example.com/a?b=2&a=1"),
            (2, "HTTP://WWW.EXAMPLE.COM:80/a?a=1&b=2&utm_source=t"),
            (3, "http://example.com/a?a=1&b=2#f"),
            (4, "http://other.com/a"),
            (5, "garbage one"),
            (6, "garbage two"),
        ],
        "id int, url string",
    )
    kept = url_dedup(df, "url").collect()
    ids = sorted(r.id for r in kept)
    # the three example.com/a variants collapse to the lexically-first raw
    assert ids == [2, 4, 5, 6]


def test_url_dedup_is_partitioning_invariant(spark):
    rows = [(i, f"http://site{i % 7}.com/p{i % 3}?utm_x=1&k={i % 2}") for i in range(200)]
    a = spark.createDataFrame(rows, "id int, url string").repartition(2)
    b = spark.createDataFrame(rows, "id int, url string").repartition(17)
    order = [F.col("url").asc(), F.col("id").asc()]  # total order: ties exist
    da = url_dedup(a, "url", order_by=order).select("id", "canonical_url")
    db = url_dedup(b, "url", order_by=order).select("id", "canonical_url")
    assert da.exceptAll(db).count() == 0
    assert db.exceptAll(da).count() == 0


def test_canonicalize_is_pure_catalyst(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    out = df.select(canonicalize_url("url").alias("c"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_duckdb_twin_parity(spark):
    """The exact canonicalization DuckDB replays in the chk='url' oracle
    fold — Spark and DuckDB must agree on every case (this is what makes
    the window fold a real value check, not a rows-only one)."""
    import duckdb

    raws = [r for r, _ in CASES]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    got_spark = [
        r.c for r in df.select(canonicalize_url("url").alias("c")).orderBy("url").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE u AS SELECT * FROM (VALUES " + ",".join("(?)" for _ in raws) + ") t(url)", raws)
    sql = _duck_canon_sql()
    got_duck = [r[0] for r in con.execute(
        f"SELECT {sql} AS c FROM u ORDER BY url"
    ).fetchall()]
    assert got_spark == got_duck


def _duck_canon_sql(col: str = "url") -> str:
    """DuckDB replay of canonicalize_url — kept in the test so drift
    between this and the __spark_entry__ fold is caught here first."""
    from record_linkage_spark.functions.urls import TRACKING_PARAM_RE

    t = f"trim({col})"
    scheme = f"lower(regexp_extract({t}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    auth = f"regexp_extract({t}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)"
    host = (
        f"regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"lower({auth}), '^[^@]*@', ''), ':[0-9]*$', ''), '^www\\.', ''), '\\.$', '')"
    )
    port = f"regexp_extract({auth}, ':([0-9]+)$', 1)"
    path0 = f"regexp_extract({t}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    path1 = f"regexp_replace(regexp_replace({path0}, '/{{2,}}', '/'), '(.)/$', '\\1')"
    path = f"CASE WHEN {path1} = '' THEN '/' ELSE {path1} END"
    q0 = f"regexp_extract({t}, '\\?([^#]*)', 1)"
    kept = (
        f"list_sort(list_filter(string_split({q0}, '&'), "
        f"x -> x != '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')))"
    )
    # DuckDB: array_to_string([]) is NULL, Spark's array_join is ''
    q = f"coalesce(array_to_string({kept}, '&'), '')"
    dflt = (
        f"(({scheme} = 'http' AND {port} = '80') OR ({scheme} = 'https' AND {port} = '443'))"
    )
    portpart = f"CASE WHEN {port} = '' OR {dflt} THEN '' ELSE ':' || {port} END"
    return (
        f"CASE WHEN {scheme} = '' OR {host} = '' THEN NULL ELSE "
        f"{scheme} || '://' || {host} || {portpart} || {path} || "
        f"CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END END"
    )
