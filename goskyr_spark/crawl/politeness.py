"""Per-host politeness scheduler (north_star: "per-host politeness
scheduler implemented as salted repartitioning by registrable domain
plus window-ranked priority queues").

``select_under_budget`` is a budgeted top-k per host. A naive
``Window.partitionBy(host)`` funnels every mega-host's URLs through one
task; instead we run the standard two-phase skew-safe top-k:

  phase 1 (salted): rank within ``(host, salt)`` where
      ``salt = pmod(xxhash64(url), n_salts)`` — mega-hosts fan out over
      ``n_salts`` tasks; keep ≤ budget per salt (a superset of the
      global per-host top-budget, since the true top-k is contained in
      the union of per-salt top-k).
  phase 2 (exact): rank within ``host`` over the ≤ n_salts × budget
      survivors — bounded input per host regardless of frontier skew —
      keep ≤ budget.

Determinism: rank ordering is (priority, url) — total order, so the
selected set and its visit order are reproducible run-to-run (matches
the reference-order equivalence tests). AQE's skew-join handling covers
the joins; this covers the window."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_under_budget(
    frontier: DataFrame,
    budgets: DataFrame | None = None,
    default_budget: int = 32,
    n_salts: int = 8,
    salted: bool = True,
) -> DataFrame:
    """frontier(url, url_hash, host, domain, priority, …) →
    rows selected this round, with ``visit_rank`` (1-based per host) and
    ``selected`` flag; unselected rows carry over to the next round.

    ``budgets``: optional (host, budget) — e.g. from robots Crawl-delay
    (``robots.host_budgets``); broadcast-joined (one row per host).

    ``salted=False`` skips phase 1 entirely (one window, one shuffle).
    The output is IDENTICAL either way — phase 1 only pre-drops rows
    phase 2 would drop — so the caller may disable salting whenever the
    whole frontier is small enough that even a worst-case single-host
    window task is trivial (the crawl engine keys this on the known
    frontier count; the skew protection matters only when one host can
    hold millions of rows)."""
    if budgets is not None:
        df = frontier.join(F.broadcast(budgets), on="host", how="left").withColumn(
            "budget", F.coalesce(F.col("budget"), F.lit(default_budget))
        )
    else:
        df = frontier.withColumn("budget", F.lit(default_budget))

    if salted:
        w1 = Window.partitionBy(
            "host", F.pmod(F.xxhash64("url"), F.lit(n_salts))
        ).orderBy("priority", "url")
        df = (
            df.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= F.col("budget"))
            .drop("_r1")
        )

    w2 = Window.partitionBy("host").orderBy("priority", "url")
    ranked = df.withColumn("visit_rank", F.row_number().over(w2))
    return ranked.filter(F.col("visit_rank") <= F.col("budget")).drop("budget")


def carryover(frontier: DataFrame, selected: DataFrame) -> DataFrame:
    """Frontier rows NOT selected this round (budget overflow) — kept for
    the next round. Anti-join on (url_hash, url): the url tiebreaker
    makes 64-bit hash collisions harmless (hash-only would drop the
    colliding un-selected URL from the frontier forever)."""
    # selected is budget-bounded per round but still ~10^8 rows at the
    # north-rule scale — shuffle hash, never a driver broadcast
    return frontier.join(
        selected.select("url_hash", "url").hint("shuffle_hash"),
        on=["url_hash", "url"],
        how="left_anti",
    )
