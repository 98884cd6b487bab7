"""URL canonicalization + URL-level dedup — the FIRST dedup pass of any
Common-Crawl-scale pipeline (cheaper than any content hash: collapse
the scheme/host-case, www-prefix, default-port, fragment, tracking-param
and trailing-slash variants of the same resource before fetching or
hashing anything).

The crawl engine already canonicalizes its frontier with the exact
reference-parity pass (extract/urlutil.frontier_triple — an Arrow
``mapInPandas`` with a regex fast path); THIS operator is the
relational, whole-stage-codegen form for batch URL tables: every step
is a built-in ``regexp_replace``/``lower`` with explicit character
classes chosen to parse identically under Java regex and RE2. The
PATTERNS are byte-identical in both engines; the one step that needs a
backreference spells the replacement in each dialect (Spark ``$1``,
DuckDB/RE2 ``\\1``) — that pair is carried per step in ``_REST_STEPS``
so the SQL oracle stays a literal twin.

Steps (documented contract, in order):

1. scheme and host lowercased; userinfo is out of scope (crawl URLs);
2. the scheme's OWN default port stripped from the host — ``:80`` only
   for http, ``:443`` only for https (``https://h:80/`` is a distinct
   resource and is preserved);
3. ``www.`` prefix stripped;
4. fragment stripped;
5. ``utm_*`` tracking parameters stripped, anchored to a real ``?``/``&``
   separator so a parameter VALUE embedding ``utm_x=v&`` is untouched
   (two global passes: a maximal separator-led utm run followed by
   ``&`` re-emits the separator, then a trailing separator-led run is
   dropped);
6. ONE trailing slash stripped from the path tail.

Scale shape: scan → codegen projection → ONE hash aggregate on the
canonical key. No UDF, no second shuffle; at 10^10 URLs the aggregate
is the only exchange and its key is a short string.

Demo input: variant URLs derived deterministically from ``doc_id`` by
SQL-expressible arithmetic (both engines build the identical table from
``documents`` — same trick as the sampling ops' md5 keys), covering all
six canonicalization steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (pattern, spark_replacement, duckdb_replacement) — applied in order to
# the part AFTER scheme://host. Patterns are engine-identical; only the
# backreference SPELLING differs (Java $1 vs RE2 \1).
_REST_STEPS = (
    ("#.*", "", ""),  # 4. fragment
    # 5a. a ?/&-led maximal run of utm params followed by another param:
    #     drop the run, re-emit the leading separator
    ("([?&])utm_[a-z]+=[^&#]*(&utm_[a-z]+=[^&#]*)*&", "$1", "\\1"),
    # 5b. a ?/&-led trailing run of utm params: drop it with its separator
    ("[?&]utm_[a-z]+=[^&#]*(&utm_[a-z]+=[^&#]*)*$", "", ""),
    ("/$", "", ""),  # 6. one trailing slash
)
_WWW_STEP = ("^www\\.", "")


def variant_urls(docs: DataFrame) -> DataFrame:
    """doc_id → a raw URL exercising every canonicalization step; pure
    integer arithmetic so the DuckDB oracle rebuilds the same table."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    host = F.when(
        d % 3 == 0,
        F.concat(F.lit("WWW.Host"), s(d % 7), F.lit(".Example.COM")),
    ).otherwise(F.concat(F.lit("host"), s(d % 7), F.lit(".example.com")))
    scheme = (
        F.when(d % 11 == 0, F.lit("HTTPS"))
        .when(d % 11 == 3, F.lit("http"))  # :80 strips, :443 survives
        .otherwise(F.lit("https"))
    )
    port = (
        F.when(d % 13 == 2, F.lit(":443"))
        .when(d % 13 == 5, F.lit(":80"))  # survives on https hosts
        .otherwise(F.lit(""))
    )
    suffix = (
        F.when(d % 5 == 1, F.concat(F.lit("?utm_source=feed&utm_campaign=c"), s(d % 4)))
        .when(d % 5 == 2, F.concat(F.lit("#sec-"), s(d % 4)))
        .when(d % 5 == 3, F.lit("/"))
        .when(d % 5 == 4, F.concat(F.lit("?id="), s(d % 3), F.lit("&utm_medium=email")))
        .when(d % 7 == 3, F.lit("?next=utm_a=1&b=2"))  # utm embedded in a VALUE — kept
        .otherwise(F.lit(""))
    )
    url = F.concat(scheme, F.lit("://"), host, port, F.lit("/p/"), s(d % 12), suffix)
    return docs.select("doc_id", url.alias("url"))


def canonicalize(urls: DataFrame, col: str = "url") -> DataFrame:
    """Adds ``canonical_url`` via the 6-step codegen chain above."""
    u = F.col(col)
    scheme = F.lower(F.regexp_extract(u, "^[A-Za-z]+", 0))
    after = F.regexp_replace(u, "^[A-Za-z]+://", "")
    hostport = F.lower(F.regexp_extract(after, "^[^/?#]+", 0))
    # 2. strip only the scheme's OWN default port (https://h:80 is distinct)
    deported = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_replace(deported, *_WWW_STEP)
    rest = F.expr(f"substring(regexp_replace({col}, '^[A-Za-z]+://', ''), "
                  f"length(regexp_extract(regexp_replace({col}, '^[A-Za-z]+://', ''), '^[^/?#]+', 0)) + 1)")
    for pat, rep, _duck in _REST_STEPS:
        rest = F.regexp_replace(rest, pat, rep)
    return urls.withColumn(
        "canonical_url", F.concat(scheme, F.lit("://"), host, rest)
    )


def url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant URLs → one row per canonical URL: how many raw variants
    and distinct spellings collapsed onto it, plus the first doc."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    canon = canonicalize(variant_urls(docs))
    return canon.groupBy("canonical_url").agg(
        F.count("*").alias("n_variants"),
        F.countDistinct("url").alias("n_spellings"),
        F.min("doc_id").alias("first_doc_id"),
    )


def url_dedup_oracle_sql() -> str:
    """DuckDB twin: identical arithmetic, identical regex patterns (RE2
    'g'-flag replaces globally == Spark's regexp_replace; backreference
    spelled \\1 where Spark spells $1)."""
    rest_steps = ""
    rest = ("substr(after, length(regexp_extract(after, '^[^/?#]+')) + 1)")
    for pat, _spark, rep in _REST_STEPS:
        rest = f"regexp_replace({rest}, '{pat}', '{rep}', 'g')"
        rest_steps = rest
    return f"""
        WITH v AS (
            SELECT doc_id,
                   (CASE WHEN doc_id % 11 = 0 THEN 'HTTPS'
                         WHEN doc_id % 11 = 3 THEN 'http'
                         ELSE 'https' END)
                   || '://'
                   || (CASE WHEN doc_id % 3 = 0
                            THEN 'WWW.Host' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM'
                            ELSE 'host' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' END)
                   || (CASE WHEN doc_id % 13 = 2 THEN ':443'
                            WHEN doc_id % 13 = 5 THEN ':80'
                            ELSE '' END)
                   || '/p/' || CAST(doc_id % 12 AS VARCHAR)
                   || (CASE
                        WHEN doc_id % 5 = 1 THEN '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 4 AS VARCHAR)
                        WHEN doc_id % 5 = 2 THEN '#sec-' || CAST(doc_id % 4 AS VARCHAR)
                        WHEN doc_id % 5 = 3 THEN '/'
                        WHEN doc_id % 5 = 4 THEN '?id=' || CAST(doc_id % 3 AS VARCHAR) || '&utm_medium=email'
                        WHEN doc_id % 7 = 3 THEN '?next=utm_a=1&b=2'
                        ELSE '' END) AS url
            FROM documents),
        parts AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url, '^[A-Za-z]+')) AS scheme,
                   regexp_replace(url, '^[A-Za-z]+://', '') AS after
            FROM v),
        hp AS (
            SELECT doc_id, url, scheme, after,
                   lower(regexp_extract(after, '^[^/?#]+')) AS hostport
            FROM parts),
        c AS (
            SELECT doc_id, url,
                   scheme || '://'
                   || regexp_replace(
                          CASE WHEN scheme = 'http'
                                   THEN regexp_replace(hostport, ':80$', '')
                               WHEN scheme = 'https'
                                   THEN regexp_replace(hostport, ':443$', '')
                               ELSE hostport END,
                          '^www\\.', '')
                   || {rest_steps} AS canonical_url
            FROM hp)
        SELECT canonical_url,
               COUNT(*) AS n_variants,
               COUNT(DISTINCT url) AS n_spellings,
               MIN(doc_id) AS first_doc_id
        FROM c GROUP BY canonical_url
    """
