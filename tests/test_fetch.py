"""Production fetch stage: reference client semantics (pinned UA,
no-redirect-follow with Location capture, dead-fetch degradation) and
pages-join ↔ transport equivalence for the full crawl engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goskyr_spark.crawl.bloom import BloomSpec
from goskyr_spark.crawl.fetch import (
    USER_AGENT,
    MappingTransport,
    fetch_one,
    fetch_stage,
    resolved_url_table,
)
from goskyr_spark.crawl.rounds import CrawlRun
from goskyr_spark.spark.corpus import CorpusSpec, generate_pages


def test_fetch_one_reference_semantics():
    t = MappingTransport(
        {"http://h/ok": "<html>x</html>"},
        redirects={"http://h/moved": "http://h/ok"},
    )
    # 200: body returned, resolved_url = requested url (fetcher.go:196-200)
    s, c, r, b = fetch_one(t, "http://h/ok")
    assert (s, r) == (200, "http://h/ok") and b == b"<html>x</html>"
    # 3xx: NOT followed; Location captured, no body (fetcher.go:134-141,202-205)
    s, c, r, b = fetch_one(t, "http://h/moved")
    assert (s, r, b) == (301, "http://h/ok", None)
    # 404: no body, resolved to itself
    s, c, r, b = fetch_one(t, "http://h/gone")
    assert (s, b) == (404, None)
    # pinned UA + Accept on every request (fetcher.go:154-160)
    assert all(h["User-Agent"] == USER_AGENT and h["Accept"] == "*/*"
               for h in t.request_log_headers)
    assert "Chrome/127" in USER_AGENT


def test_fetch_stage_per_host_groups(spark):
    t = MappingTransport({f"http://h{i}.x/p{j}": f"<html>{i}-{j}</html>"
                          for i in range(3) for j in range(4)})
    rows = [(f"http://h{i}.x/p{j}", f"h{i}.x", j + 1) for i in range(3) for j in range(4)]
    rows.append(("http://h0.x/missing", "h0.x", 5))
    sel = spark.createDataFrame(rows, "url string, host string, visit_rank int")
    out = fetch_stage(sel, t).cache()
    assert out.count() == 13
    assert out.filter("status = 200").count() == 12
    # dead fetch degrades to a row, not a job failure
    dead = out.filter("url = 'http://h0.x/missing'").first()
    assert dead["status"] == 404 and dead["html"] is None
    # resolved-url table mirrors memory_cache: one row per request
    res = resolved_url_table(out)
    assert res.filter("resolved_url = url").count() == 13


def test_crawl_transport_equals_pages_join(spark, tmp_path):
    """The VERDICT gate: swapping the pages-table join for the mocked
    HTTP transport must produce the identical visit log and records."""
    spec = CorpusSpec(n_hosts=3, list_pages_per_host=2, items_per_page=3,
                      mega_factor=2, seed=31)
    pages = generate_pages(spark, spec).cache()
    page_map = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    cfg = spec.config_yaml().replace("id: n08a", "id: n08a\n  field: link")

    def crawl(wh, transport):
        run = CrawlRun(
            spark, wh, pages, cfg, robots=None,
            bloom_spec=BloomSpec(n_buckets=8, bits_per_bucket=1 << 14),
            default_budget=8, n_salts=4, follow_links=True,
            transport=transport,
        )
        run.init(spec.seed_urls())
        run.run(max_rounds=20)
        visits = run.visit_log().orderBy("round_id", "host", "visit_rank").toPandas()
        recs = run.all_records().orderBy("url", "record_idx").toPandas()
        return visits, recs

    v_join, r_join = crawl(str(tmp_path / "wj"), None)
    v_http, r_http = crawl(str(tmp_path / "wh"), MappingTransport(page_map))
    assert v_join[["url", "round_id", "visit_rank"]].values.tolist() == \
        v_http[["url", "round_id", "visit_rank"]].values.tolist()
    assert r_join[["url", "record_idx", "record"]].values.tolist() == \
        r_http[["url", "record_idx", "record"]].values.tolist()


def test_urllib_transport_is_picklable():
    import pickle

    from goskyr_spark.crawl.fetch import UrllibTransport

    t = UrllibTransport(timeout_s=3.0)
    t2 = pickle.loads(pickle.dumps(t))
    assert t2.timeout_s == 3.0


def test_urllib_transport_against_local_server():
    """Real HTTP through the production transport (loopback server):
    pinned UA arrives on the wire, 301 is captured not followed, dead
    connection degrades to status 0."""
    import http.server
    import threading

    from goskyr_spark.crawl.fetch import UrllibTransport, fetch_one

    seen_headers = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            seen_headers[self.path] = dict(self.headers)
            if self.path == "/moved":
                self.send_response(301)
                self.send_header("Location", "/target")
                self.end_headers()
            elif self.path == "/missing":
                self.send_response(404)
                self.end_headers()
            else:
                body = b"<html>served</html>"
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        t = UrllibTransport(timeout_s=5.0)
        base = f"http://127.0.0.1:{port}"

        s, c, r, b = fetch_one(t, f"{base}/page")
        assert (s, b) == (200, b"<html>served</html>")
        assert c.startswith("text/html") and r == f"{base}/page"
        assert "Chrome/127" in seen_headers["/page"]["User-Agent"]
        assert seen_headers["/page"]["Accept"] == "*/*"

        # relative Location resolved against the request URL (Go's
        # Response.Location() semantics), redirect captured NOT followed
        s, c, r, b = fetch_one(t, f"{base}/moved")
        assert (s, r, b) == (301, f"{base}/target", None)
        assert "/target" not in seen_headers  # server never saw a follow

        # non-3xx error statuses still deliver their body (reference
        # reads r.Data for every non-redirect response); this server
        # sends an empty 404 body
        s, _, _, b = fetch_one(t, f"{base}/missing")
        assert (s, b) == (404, b"")

        # dead port → status 0 row, no exception
        s, _, r, b = fetch_one(t, "http://127.0.0.1:9/x")
        assert (s, r, b) == (0, None, None)
    finally:
        srv.shutdown()


def test_urllib_transport_cookie_jar():
    """Set-Cookie from one response rides on the next request to the
    same host (reference StaticFetcher carries a cookiejar on its
    client, fetcher.go:117) — some sites 403 cookie-less re-requests."""
    import http.server
    import threading

    from goskyr_spark.crawl.fetch import UrllibTransport, fetch_one

    seen = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            seen[self.path] = self.headers.get("Cookie")
            body = b"<html>ok</html>"
            self.send_response(200)
            if self.path == "/first":
                self.send_header("Set-Cookie", "sid=abc123; Path=/")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        t = UrllibTransport(timeout_s=5.0)
        base = f"http://127.0.0.1:{port}"
        s, _, _, _ = fetch_one(t, f"{base}/first")
        assert s == 200 and seen["/first"] is None
        s, _, _, _ = fetch_one(t, f"{base}/second")
        assert s == 200 and seen["/second"] == "sid=abc123"
    finally:
        srv.shutdown()
