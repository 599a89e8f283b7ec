"""URL/host canonicalization + host-level dedup profile (r10).

Every crawl-derived training corpus starts here: the same page is
fetched as ``HTTP://WWW.Site.com:80/page/index.html?utm_source=feed#x``
and ``https://site.com/page`` and must collapse to ONE canonical key
before any content-level dedup runs (the C4/CCNet pipelines
canonicalize URLs before text dedup; the VERDICT r9 gap list named
this the one LLM-data family with zero coverage).

The documents fixture has no url column, so the URL is *derived* from
``doc_id`` with a single SQL template valid in BOTH Spark SQL and
DuckDB (the sources/cdc_fixture.py discipline) — the derivation is
deliberately adversarial: mixed-case schemes and hosts, www prefixes,
default and non-default ports, ``/index.html`` and trailing-slash
suffixes, tracking params in three arrangements, and fragments, all
keyed to residues of doc_id so every canonicalization rule fires on a
known subset and collides into known duplicate groups (residues
2,7,20,5,10 all divide 140, so doc_ids congruent mod 140 share one
canonical URL while their RAW urls differ — groups of 3-4 at the
fixture's 500 docs).

Canonicalization (each step an engine built-in, regex-extracted so the
DuckDB oracle applies the IDENTICAL patterns):

- scheme lowercased
- host lowercased, leading ``www.`` stripped
- default port stripped (``:80`` for http, ``:443`` for https);
  non-default ports kept
- trailing ``/index.html`` or ``/`` stripped from the path
- tracking params dropped (``utm_*``, ``fbclid``, ``gclid``),
  remaining params kept in original order
- fragment dropped

Scale shape: canonicalization is a pure map stage (regex on short
strings, whole-stage codegen); both profile queries are ONE map-side-
combined aggregate each, keyed on canonical_url / host — both
corpus-cardinality keys, so NOTHING broadcasts and the single shuffle
per query carries only short canonical strings + counters. At 100 TB
the hot-host skew (a crawl is Zipfian over hosts) lands in the
aggregate, where map-side combine pre-collapses it — the same reason
the sketch rollups aggregate rather than window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- fixture derivation: one template, both dialects ----------------------
# (STRING is a VARCHAR alias in DuckDB, so the cast text is shared.)
URL_EXPR = """
CASE doc_id % 4 WHEN 0 THEN 'http://' WHEN 1 THEN 'https://'
     WHEN 2 THEN 'HTTP://' ELSE 'HTTPS://' END
|| CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
|| CASE WHEN doc_id % 5 = 0
        THEN upper('h' || CAST(doc_id % 7 AS STRING) || '.example.com')
        ELSE 'h' || CAST(doc_id % 7 AS STRING) || '.example.com' END
|| CASE doc_id % 10 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
        WHEN 5 THEN ':8080' ELSE '' END
|| '/page' || CAST(doc_id % 20 AS STRING)
|| CASE doc_id % 7 WHEN 0 THEN '/index.html' WHEN 1 THEN '/' ELSE '' END
|| CASE doc_id % 5
        WHEN 0 THEN '?utm_source=feed&ref=' || CAST(doc_id % 20 AS STRING)
        WHEN 1 THEN '?ref=' || CAST(doc_id % 20 AS STRING) || '&utm_campaign=x'
        WHEN 2 THEN '?ref=' || CAST(doc_id % 20 AS STRING)
        ELSE '' END
|| CASE WHEN doc_id % 8 = 0 THEN '#sec2' ELSE '' END
""".strip().replace("\n", " ")

# Shared regex vocabulary (Java and RE2 agree on all of these —
# character classes, anchors, alternation; tests/test_regex_dialect.py
# is the standing guard for the dialect line).
_RE_SCHEME = "^([A-Za-z]+)://"
_RE_AUTHORITY = "^[A-Za-z]+://([^/?#]*)"
_RE_PATH = "^[A-Za-z]+://[^/?#]*([^?#]*)"
_RE_QUERY = r"\?([^#]*)"
_RE_PORT = ":([0-9]+)$"
_RE_TRACKING = "^(utm_|fbclid=|gclid=)"


def doc_urls(docs: DataFrame) -> DataFrame:
    """(doc_id, source, url): the derived raw-URL relation."""
    return docs.select("doc_id", "source", F.expr(URL_EXPR).alias("url"))


def url_canonicalize(docs: DataFrame) -> DataFrame:
    """Adds (scheme, host, canonical_url) to the raw-URL relation —
    the pure map stage every downstream profile shares. Every step is
    a regexp/string built-in (JVM-side, codegen); the DuckDB oracle
    applies the identical regex chain, so a dialect divergence in any
    pattern breaks parity at the fixture."""
    u = F.col("url")
    scheme = F.lower(F.regexp_extract(u, _RE_SCHEME, 1))
    auth = F.regexp_extract(u, _RE_AUTHORITY, 1)
    host = F.regexp_replace(
        F.regexp_replace(F.lower(auth), _RE_PORT, ""), r"^www\.", ""
    )
    port = F.regexp_extract(auth, _RE_PORT, 1)
    port_c = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(u, _RE_PATH, 1)
    path_c0 = F.regexp_replace(path, r"(/index\.html|/)$", "")
    path_c = F.when(path_c0 == "", F.lit("/")).otherwise(path_c0)
    query = F.regexp_extract(u, _RE_QUERY, 1)
    query_c = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda t: (t != "") & ~t.rlike(_RE_TRACKING),
        ),
        "&",
    )
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        port_c,
        path_c,
        F.when(query_c == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query_c)
        ),
    )
    return doc_urls(docs).select(
        "doc_id",
        "source",
        "url",
        host.alias("host"),
        canonical.alias("canonical_url"),
    )


def url_canonical_dedup(docs: DataFrame) -> DataFrame:
    """Duplicate-URL groups after canonicalization: every canonical
    URL fetched under >= 2 raw spellings/doc_ids, with the group size,
    the number of distinct RAW variants collapsed, and the surviving
    (min) doc_id — the crawl-layer twin of exact_dedup's content-hash
    groups, and the first pass a 100 TB crawl runs because it needs NO
    content reads at all (URL strings only).

    Plan: map-stage canonicalization -> ONE canonical_url-keyed
    aggregate (map-side combined; count-distinct over the raw url
    expands to the standard two-phase partial) -> group-size filter.
    No broadcast (canonical_url is corpus-cardinality), no window, no
    join."""
    return (
        url_canonicalize(docs)
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("url").cast("bigint").alias("n_raw_variants"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def host_profile(docs: DataFrame) -> DataFrame:
    """Per-host crawl profile: doc count, distinct canonical URLs,
    duplicate-doc count (docs minus canonicals — the host's
    URL-level dup mass), dup ratio, and distinct sources fetched from
    the host — the readout a mixture designer uses to spot mirror
    hosts (high dup_ratio) and single-source hosts before content
    dedup spends anything on them.

    Plan: the same map stage -> ONE host-keyed aggregate (two
    count-distincts expand into Spark's standard partial phases) ->
    arithmetic projection. Host is corpus-cardinality: no broadcast,
    one shuffle."""
    return (
        url_canonicalize(docs)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("canonical_url")
            .cast("bigint")
            .alias("n_canonical_urls"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
        .select(
            "host",
            "n_docs",
            "n_canonical_urls",
            (F.col("n_docs") - F.col("n_canonical_urls"))
            .cast("bigint")
            .alias("n_dup_docs"),
            (
                (F.col("n_docs") - F.col("n_canonical_urls")).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_ratio"),
            "n_sources",
        )
    )


# First-match-wins URL blocklist (the C4 pipeline's URL-filter pass;
# the crawl-side sibling of the CDC regex router's ordered-rule
# semantics). Rules are a module literal mirrored verbatim in the
# oracle — rule 1 drops a known mirror host, rule 2 a spam path
# family, rule 3 a blocked query param; first match wins, so the
# per-rule counts are a PARTITION of the corpus (all = blocked
# rows + allowed), which is what makes the report auditable.
BLOCKLIST = [
    ("blocked_mirror_host", "host = h3.example.com"),
    ("blocked_spam_path", "path ~ /page1[0-9]$"),
    ("blocked_param", "query has ref=7"),
]


def url_blocklist_report(docs: DataFrame) -> DataFrame:
    """Per-rule first-match block counts over CANONICAL urls (filter
    AFTER canonicalization, the production order — a blocklist applied
    to raw URLs is trivially evaded by case/www/port spelling): rows
    (rule_no, rule, n_docs) with the corpus total first and the
    surviving-allowed count last — the same self-normalizing report
    shape as gopher_quality_rules, with ROUTING (first-match)
    semantics rather than independent flags.

    Scale shape: the canonicalization map stage + a CASE chain (zero
    shuffles of their own), ONE global conditional aggregate, 5
    fixed-width output rows via stack. No join, no broadcast, no
    window."""
    c = url_canonicalize(docs)
    rule = (
        F.when(F.col("host") == "h3.example.com", F.lit(1))
        .when(F.col("canonical_url").rlike("/page1[0-9]([?]|$)"), F.lit(2))
        .when(F.col("canonical_url").rlike("[?&]ref=7($|&)"), F.lit(3))
        .otherwise(F.lit(0))
    )
    agg = c.select(rule.alias("r")).agg(
        F.count(F.lit(1)).alias("n0"),
        *[
            F.sum((F.col("r") == i).cast("long")).alias(f"n{i}")
            for i in (1, 2, 3)
        ],
        F.sum((F.col("r") == 0).cast("long")).alias("n4"),
    )
    return agg.select(
        F.expr(
            "stack(5, 0, 'all', n0, 1, 'blocked_mirror_host', n1, "
            "2, 'blocked_spam_path', n2, 3, 'blocked_param', n3, "
            "4, 'allowed', n4) AS (rule_no, rule, n_docs)"
        )
    )
