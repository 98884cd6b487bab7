"""Record sinks (S7-S10).

* stdout JSON — ``/root/reference/output/stdout.go:12-40``: per-record,
  non-HTML-escaped, 2-space indented, sorted keys (Go map marshal).
* file JSON   — ``/root/reference/output/file.go:22-62``: one indented
  JSON array.
* API writer  — ``/root/reference/output/api.go:28-115``: batched POST
  (100/batch) with basic auth + per-source DELETE; the Spark shape is a
  ``foreachBatch``/partition-wise sink. Network calls are stubbed in
  this sandbox; batching/partitioning logic is real.
* Spark-native writers: records DataFrame → parquet/json, the scale
  path (the reference collects everything driver-side; we only do that
  for golden comparison).
"""

from __future__ import annotations

import json
from datetime import datetime


def _go_value(v):
    if isinstance(v, datetime):
        # Go time.Time json-marshals as RFC3339
        s = v.strftime("%Y-%m-%dT%H:%M:%S")
        if v.microsecond:
            s += "." + str(v.microsecond * 1000).rstrip("0")
        return s + "Z" if v.tzinfo is None else s + v.strftime("%z")
    return v


def _encode(obj) -> str:
    def default(o):
        return _go_value(o) if isinstance(o, datetime) else str(o)

    return json.dumps(obj, indent=2, sort_keys=True, ensure_ascii=False, default=default)


def record_json(rec: dict) -> str:
    """StdoutWriter's per-record form (EscapeHTML(false) + Indent)."""
    return _encode({k: _go_value(v) for k, v in rec.items()})


def write_stdout(records: list[dict]) -> str:
    out = "".join(record_json(r) + "\n" for r in records)
    print(out, end="")
    return out


def write_file(records: list[dict], path: str) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(_encode([{k: _go_value(v) for k, v in r.items()} for r in records]))


class APIWriterStub:
    """API writer shape (output/api.go): delete-then-batched-POST.
    ``post``/``delete`` are injectable; the real HTTP transport is not
    available in this sandbox."""

    BATCH_SIZE = 100

    def __init__(self, uri: str, user: str = "", password: str = "", post=None, delete=None):
        self.uri = uri
        self.auth = (user, password)
        self._post = post or self._unavailable
        self._delete = delete or self._unavailable
        self.batches_sent = 0

    def _unavailable(self, *a, **k):  # pragma: no cover
        raise NotImplementedError("network transport not available in sandbox")

    def write(self, records: list[dict], source: str) -> None:
        self._delete(self.uri, params={"source": source}, auth=self.auth)
        for i in range(0, len(records), self.BATCH_SIZE):
            self._post(self.uri, json=records[i : i + self.BATCH_SIZE], auth=self.auth)
            self.batches_sent += 1


def write_records_df(records_df, path: str, fmt: str = "parquet") -> None:
    """The scale sink: the records table goes to parquet (or json lines)
    partitioned however the upstream job left it — no driver collect."""
    w = records_df.write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(path)
    else:
        w.json(path)
