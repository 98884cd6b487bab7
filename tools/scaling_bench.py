"""Two-cluster-size scaling evidence (BASELINE.json north_rule: N → 4N
executors with throughput scaling efficiency ≥ 0.8; sandboxed per the
driver instructions as local[8] vs local[32] on IDENTICAL input).

Runs the full crawl benchmark in two fresh JVMs (one per master config)
and writes BENCH_SCALING.md. Efficiency = (T_8 / T_32) / 4 where T is
crawl wall time, i.e. (throughput_32 / throughput_8) / (32/8).

Usage: python tools/scaling_bench.py [n_hosts]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, hosts: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_HOSTS"] = str(hosts)
    code = (
        "import sys, json, time; sys.path.insert(0, %r)\n"
        "from goskyr_spark.spark.session import build_session\n"
        "from goskyr_spark.spark.corpus import CorpusSpec\n"
        "import bench\n"
        "spark = build_session(app_name='scaling', master='local[%d]', shuffle_partitions=%d)\n"
        "spec = CorpusSpec(n_hosts=%d, list_pages_per_host=5, items_per_page=20,\n"
        "                  mega_factor=4, seed=42, body_words=400)\n"
        "ups, urls, wall = bench.bench_crawl(spark, spec=spec, metrics='fast')\n"
        "print('RESULT ' + json.dumps({'cpus': %d, 'urls': urls, 'wall_s': wall,\n"
        "      'urls_per_sec': round(urls / wall, 3)}))\n"
        "spark.stop()\n" % (REPO, cpus, cpus, hosts, cpus)
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


def main():
    hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    small = run_at(8, hosts)
    big = run_at(32, hosts)
    speedup = big["urls_per_sec"] / small["urls_per_sec"]
    eff = speedup / (32 / 8)
    md = f"""# BENCH_SCALING — two-parallelism crawl scaling evidence

Same job, same deterministic corpus ({hosts} hosts + mega-host skew,
robots, full crawl engine to completion), two parallelism levels in
fresh JVMs (the sandbox stand-in for N vs 4N executors per the driver
instructions; no real cluster available here).

| parallelism | URLs fetched | wall (s) | URLs/sec | URLs/sec/core |
|---|---|---|---|---|
| local[8]  | {small['urls']} | {small['wall_s']} | {small['urls_per_sec']} | {round(small['urls_per_sec']/8,3)} |
| local[32] | {big['urls']} | {big['wall_s']} | {big['urls_per_sec']} | {round(big['urls_per_sec']/32,3)} |

**Speedup 8→32 cores (4× resources): {speedup:.2f}×; scaling
efficiency = {speedup:.2f}/4 = {eff:.2f}** (north_rule target ≥ 0.8).

Raw: {json.dumps({'local8': small, 'local32': big})}
"""
    path = os.path.join(REPO, "BENCH_SCALING.md")
    with open(path, "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
