"""URL/domain blocklist operator (round-11): domain extraction edge
cases, subdomain (suffix-chain) semantics, document-granularity
dropping, and banned-term regexes."""

from pyspark.sql import functions as F

from openmsistream_spark.llm.blocklist import (
    blocklist_filter,
    domain_suffixes,
    extract_domain,
)


def test_extract_domain_edges(spark):
    cases = [
        ("https://www.Example.COM/path?q=1", "example.com"),
        ("http://sub.a.example.com:8080/x", "sub.a.example.com"),
        ("https://user:pw@secret.example.org/login", "secret.example.org"),
        ("ftp://files.example.net", "files.example.net"),
        ("https://example.com", "example.com"),
        ("not a url at all", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["d"] for r in df.select(extract_domain(F.col("url")).alias("d")).collect()]
    assert got == [want for _, want in cases]


def test_domain_suffixes_chain(spark):
    df = spark.createDataFrame([("a.b.c",), ("solo",)], "d string")
    got = {
        r["d"]: r["s"]
        for r in df.select("d", domain_suffixes(F.col("d")).alias("s")).collect()
    }
    assert got["a.b.c"] == ["a.b.c", "b.c", "c"]
    assert got["solo"] == ["solo"]


def test_blocklist_document_granularity(spark):
    """A doc whose domain has ANY blocked suffix is dropped entirely —
    the round-11 review point: an exploded anti-join alone would let a
    doc survive via its other (non-matching) suffix rows."""
    docs = spark.createDataFrame(
        [
            (1, "https://ads.bad.net/x"),  # subdomain of blocked parent
            (2, "https://bad.net/y"),  # blocked exactly
            (3, "https://good.net/z"),  # sibling zone — NOT blocked
            (4, "https://bad.net.evil.org/w"),  # 'bad.net' is a LABEL PREFIX,
            # not a suffix — must survive (suffix chain never matches)
            (5, "https://www.fine.com/forbidden-page"),  # banned term
            (6, "https://www.fine.com/ok"),
        ],
        "doc_id long, url string",
    )
    blocked = spark.createDataFrame([("bad.net",)], "domain string")
    kept = sorted(
        r["doc_id"]
        for r in blocklist_filter(
            docs, blocked, banned_url_terms=["forbidden"]
        ).collect()
    )
    assert kept == [3, 4, 6]


def test_survivors_keep_all_columns_plus_domain(spark):
    docs = spark.createDataFrame(
        [(1, "https://ok.com/a", 42)], "doc_id long, url string, extra long"
    )
    blocked = spark.createDataFrame([("blocked.com",)], "domain string")
    row = blocklist_filter(docs, blocked).collect()[0]
    assert (row["doc_id"], row["extra"], row["domain"]) == (1, 42, "ok.com")


def test_blocklist_plan_is_broadcast_only(spark):
    """Corpus side must never shuffle: both joins broadcast."""
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://h"), F.col("id") % 50, F.lit(".com/p")).alias("url"),
    )
    blocked = spark.createDataFrame([("h3.com",), ("h7.com",)], "domain string")
    plan = (
        blocklist_filter(docs, blocked)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
