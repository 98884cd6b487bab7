"""Table schemas for the crawl engine.

``PAGES`` follows BASELINE.json input_hint exactly:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

The frontier / seen / records / counters tables are the Spark-native
replacement for goskyr's in-memory state:

* frontier       ← goskyr's implicit work list (the pagination loop variable
                   at ``/root/reference/scrape/scrape.go:647-674`` plus the
                   detail-URL list at ``scrape/scrape.go:2327-2403``)
* seen           ← the ``visited`` map ``/root/reference/scrape/scrape.go:640``
* records        ← ``output.Records`` ``/root/reference/output/record.go:10``
* lineage        ← new (north_rule): per-round per-partition counts, read
                   from the delta files' parquet footers
                   (``observability.parquet_lineage``).
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),          # canonical URL
        T.StructField("url_hash", T.LongType(), False),       # xxhash64(url)
        T.StructField("host", T.StringType(), False),
        T.StructField("domain", T.StringType(), False),       # registrable domain
        T.StructField("priority", T.DoubleType(), False),     # lower = sooner
        T.StructField("depth", T.IntegerType(), False),       # BFS depth from seed
        T.StructField("round_added", T.IntegerType(), False),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("round_added", T.IntegerType(), False),
    ]
)

RECORDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("record_idx", T.IntegerType(), False),
        T.StructField("record", T.StringType(), False),       # JSON object
        T.StructField("round_id", T.IntegerType(), False),
    ]
)

PARSED_PAGE = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("records", T.ArrayType(T.StringType()), True),
        T.StructField("next_url", T.StringType(), True),
        T.StructField("detail_urls", T.ArrayType(T.StringType()), True),
        T.StructField("link_urls", T.ArrayType(T.StringType()), True),
    ]
)

# Per-partition lineage lives in the written parquet footers since
# round 2 (observability.LINEAGE_SCHEMA); no separate counters table.

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("robots_txt", T.StringType(), True),
    ]
)
