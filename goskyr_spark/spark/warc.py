"""WARC (ISO 28500) source: write and read Common-Crawl-style WARC
files as a distributed Spark job.

The reference fetches live pages one at a time
(``/root/reference/fetch/fetcher.go``); at 100 TB the input is WARC
archives (Common Crawl's interchange format), so the engine needs a
source that turns raw WARC bytes into the ``pages`` table
(url, warc_ts, html, …) without any driver-side parsing.

Layout per record (WARC/1.0, response records only — the subset the
pipeline consumes; request/metadata records are skipped by type):

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: 2026-01-01T00:00:00Z\r\n
    Content-Type: application/http; msgtype=response\r\n
    Content-Length: <n>\r\n
    \r\n
    HTTP/1.1 200 OK\r\n...\r\n\r\n<html bytes>   (n bytes total)
    \r\n\r\n

Scale shape: files are generated AND parsed one-per-task with
``mapInPandas`` over Arrow batches of (file_id, content) — no shuffle,
no state across files, so the reader partitions by file exactly like a
real ``spark.read`` of a WARC bucket would. Content-Length is honored
byte-exactly (payloads may contain ``WARC/1.0`` substrings; a
split-on-marker parser is wrong — this one walks lengths).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_FILE_SCHEMA = "file_id int, content binary"
WARC_RECORD_SCHEMA = "url string, warc_ts timestamp, html binary"

_CRLF = b"\r\n"


def _http_response(html: bytes) -> bytes:
    head = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
    )
    return head + html


def warc_record(url: str, ts_iso: str, html: bytes) -> bytes:
    payload = _http_response(html)
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + ts_iso.encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response\r\n"
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        + _CRLF
    )
    return head + payload + _CRLF + _CRLF


def warc_file_bytes(spec, file_id: int, pages_per_file: int) -> bytes:
    """Pure function (spec, file_id) → file content: the WARC records of
    the corpus pages with ordinals [file_id·k, file_id·k + k)."""
    lo = file_id * pages_per_file
    hi = min(lo + pages_per_file, spec.total_pages)
    out = []
    for i in range(lo, hi):
        url, ts, html, _text, _lang = spec.page_for_ordinal(i)
        out.append(warc_record(url, ts.strftime("%Y-%m-%dT%H:%M:%SZ"), html))
    return b"".join(out)


def generate_warc_files(
    spark: SparkSession, spec, pages_per_file: int = 50
) -> DataFrame:
    """Distributed writer: one task slice per batch of file ids, each
    file's bytes a pure function of (seed, file_id) — zero shuffle."""
    from .corpus import CorpusSpec

    n_files = -(-spec.total_pages // pages_per_file)
    args = (spec.n_hosts, spec.list_pages_per_host, spec.items_per_page,
            spec.mega_factor, spec.seed, spec.body_words)

    def gen(batches):
        sp = CorpusSpec(*args)
        for pdf in batches:
            rows = [
                (int(i), warc_file_bytes(sp, int(i), pages_per_file))
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["file_id", "content"])

    parts = min(n_files, max(8, spark.sparkContext.defaultParallelism))
    return spark.range(0, n_files, numPartitions=parts).mapInPandas(
        gen, schema=WARC_FILE_SCHEMA
    )


def parse_warc_bytes(content: bytes) -> list[tuple[str, str, bytes]]:
    """Pure parser: one WARC file → [(url, warc_date_iso, html_bytes)].
    Walks Content-Length (never splits on the WARC/1.0 marker); skips
    non-response records and non-200 payloads."""
    out = []
    pos = 0
    n = len(content)
    while pos < n:
        if content.startswith(_CRLF, pos):  # inter-record padding
            pos += 2
            continue
        hdr_end = content.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        lines = content[pos:hdr_end].split(_CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            break  # malformed — stop rather than resync heuristically
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            # Malformed Content-Length: we can't frame this record, so
            # resync at the next record marker instead of failing the file.
            nxt = content.find(b"\r\nWARC/", hdr_end + 4)
            if nxt < 0:
                break
            pos = nxt + 2
            continue
        payload = content[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") != "response":
            continue
        body_at = payload.find(b"\r\n\r\n")
        status = payload.split(_CRLF, 1)[0]
        if body_at < 0 or b" 200 " not in status + b" ":
            continue
        out.append(
            (headers.get("warc-target-uri", ""), headers.get("warc-date", ""),
             payload[body_at + 4 :])
        )
    return out


def read_warc(files: DataFrame) -> DataFrame:
    """files(file_id, content) → (url, warc_ts, html): the pages-table
    source path. One Arrow pass, record order preserved within a file."""
    def run(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for url, date_iso, html in parse_warc_bytes(bytes(content)):
                    iso = date_iso or "1970-01-01T00:00:00Z"  # missing WARC-Date → epoch
                    try:
                        ts = pd.Timestamp(iso.replace("Z", "+00:00")).tz_convert(None)
                    except (ValueError, TypeError):
                        continue  # unparseable date: skip the record, not the file
                    rows.append((url, ts, html))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return files.select("content").mapInPandas(run, schema=WARC_RECORD_SCHEMA)


def write_warc_dir(
    spark: SparkSession, spec, out_dir: str, pages_per_file: int = 50
) -> int:
    """Materialize the corpus as REAL ``.warc`` files on disk (the
    Common-Crawl replay fixture): each task writes its slice of files —
    distributed side-effect write onto a shared filesystem, exactly how
    a fetch fleet lands archives in production. Returns the file count."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    files = generate_warc_files(spark, spec, pages_per_file)

    def dump(batches):
        for pdf in batches:
            for fid, content in zip(pdf["file_id"], pdf["content"]):
                tmp = os.path.join(out_dir, f".crawl-{int(fid):06d}.warc.tmp")
                with open(tmp, "wb") as fh:
                    fh.write(bytes(content))
                os.replace(tmp, os.path.join(out_dir, f"crawl-{int(fid):06d}.warc"))
            yield pd.DataFrame({"n": [len(pdf)]})

    n = files.mapInPandas(dump, schema="n int").agg({"n": "sum"}).first()[0]
    return int(n or 0)


def pages_from_warc_dir(spark: SparkSession, warc_dir: str) -> DataFrame:
    """The Common-Crawl replay source: a directory of ``.warc`` files →
    the pages table (url, warc_ts, html). ``binaryFile`` gives one row
    per file (whole-file bytes — WARC records are not line-splittable),
    so parsing parallelizes per file with NO shuffle, the same task
    shape as ``read_warc`` over generated bytes. Feed the result
    straight into ``CrawlRun(pages=…)`` — the fetch join needs only
    (url, html)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc")
        .load(warc_dir)
        .select(F.col("content"))
    )
    return read_warc(files)
