"""URL / domain blocklist filtering — the RefinedWeb §3.1 device
(Penedo et al. 2023): before any content-based quality signal, drop
documents whose source URL matches a curated blocklist of domains
(adult/fraud/spam lists run to ~4.6M domains) or whose URL contains
banned terms.

Spark shape: the blocklist is broadcast-sized next to the corpus (a few
hundred MB at worst vs 100 TB of text), so the filter is ONE broadcast
anti-join on the extracted registrable domain — with subdomain
semantics (blocking ``example.com`` also blocks ``ads.example.com``)
expressed as an equi-join on the domain's SUFFIX CHAIN rather than a
non-equi ``endswith`` join: each URL explodes into its O(label-count)
candidate suffixes (``a.b.c`` -> ``a.b.c``, ``b.c``, ``c``), which
keeps the join broadcast-hash instead of nested-loop. URL-term bans are
whole-stage-codegen regex — zero extra passes.

Everything is engine-portable string arithmetic (regexp_extract /
split), so a SQL oracle reproduces every verdict.

Reference parity: same filter family as the reference's filepath-regex
consumer gate (F2, data_file_stream_processor.py metadata filtering) —
a broadcastable deny-list applied before expensive processing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://host[:port]/...  -> host, lowercased; a leading www. is not a
# meaningful label for blocking purposes
_DOMAIN_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"


def extract_domain(url: Column) -> Column:
    """Registrable host of a URL: scheme and userinfo stripped, port
    dropped, lowercased, leading ``www.`` removed. Pure codegen regex —
    identical in DuckDB as ``regexp_extract(.., 1)`` + replaces."""
    host = F.lower(F.regexp_extract(url, _DOMAIN_RE, 1))
    return F.regexp_replace(host, r"^www\.", "")


def domain_suffixes(domain: Column) -> Column:
    """All dot-suffix chains of a domain as an array —
    ``a.b.c -> [a.b.c, b.c, c]`` — so subdomain blocking is an
    EQUI-join against the blocklist instead of an endswith scan."""
    labels = F.split(domain, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def blocklist_filter(
    df: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    banned_url_terms: list[str] | None = None,
    domain_out: str = "domain",
) -> DataFrame:
    """Documents that SURVIVE the blocklist: URL domain (and every
    parent domain) not in ``blocked_domains`` (one column ``domain``),
    and URL matching none of ``banned_url_terms`` (case-insensitive
    regexes, codegen-side).

    A document is dropped if ANY of its domain's suffixes is blocked,
    so the match must resolve at DOCUMENT granularity: broadcast
    semi-join of the exploded suffix chain -> blocked ``id_col`` set
    (blocked-set-sized), then one anti-join back. The corpus side never
    shuffles (both joins broadcast — the blocklist by hint, the blocked
    ids by AQE size estimate); appends ``domain_out`` for downstream
    per-domain statistics."""
    url = F.col(url_col)
    out = df.withColumn(domain_out, extract_domain(url))
    if banned_url_terms:
        pat = "(?i)(" + "|".join(banned_url_terms) + ")"
        out = out.filter(~url.rlike(pat))
    blocked_ids = (
        out.select(
            id_col, F.explode(domain_suffixes(F.col(domain_out))).alias("_sfx")
        )
        .join(
            F.broadcast(blocked_domains.select(F.col("domain").alias("_sfx"))),
            "_sfx",
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    return out.join(blocked_ids, id_col, "left_anti")
