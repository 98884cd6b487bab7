"""robots.txt admission control (north_rule: "robots.txt-aware admission
control" — NEW capability; the reference has none, its URL admission is
only the extension/scheme/domain filters at
``/root/reference/scrape/scrape.go:2308-2323``).

Parser follows RFC 9309: user-agent groups, longest-match precedence
between Allow and Disallow (Allow wins ties), ``*`` wildcard and ``$``
anchor in path patterns, Crawl-delay extension. Evaluation is a
vectorized pandas UDF over (host-joined) rule groups — rules are parsed
once per executor batch and memoized by host."""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from urllib.parse import urlsplit


class RuleGroup:
    __slots__ = ("rules", "crawl_delay")

    def __init__(self):
        self.rules: list[tuple[bool, str]] = []  # (is_allow, pattern)
        self.crawl_delay: float | None = None


def parse_robots(txt: str) -> dict[str, RuleGroup]:
    """robots.txt → {user-agent-token(lower): RuleGroup}."""
    groups: dict[str, RuleGroup] = {}
    current: list[str] = []
    last_was_agent = False
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_agent:
                current = []
            tok = val.lower()
            current.append(tok)
            groups.setdefault(tok, RuleGroup())
            last_was_agent = True
            continue
        last_was_agent = False
        if not current:
            continue
        if key in ("allow", "disallow"):
            if val == "" and key == "disallow":
                continue  # empty Disallow = allow all
            for tok in current:
                groups[tok].rules.append((key == "allow", val))
        elif key == "crawl-delay":
            try:
                d = float(val)
            except ValueError:
                continue
            for tok in current:
                groups[tok].crawl_delay = d
    return groups


def _pattern_re(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


@lru_cache(maxsize=4096)
def _compiled(pattern: str) -> re.Pattern:
    return _pattern_re(pattern)


def group_for_agent(groups: dict[str, RuleGroup], agent: str) -> RuleGroup | None:
    agent = agent.lower()
    best = None
    best_len = -1
    for tok, g in groups.items():
        if tok == "*":
            continue
        if tok in agent and len(tok) > best_len:
            best, best_len = g, len(tok)
    if best is not None:
        return best
    return groups.get("*")


def is_allowed(txt: str, agent: str, path: str) -> bool:
    g = group_for_agent(parse_robots(txt), agent)
    if g is None:
        return True
    if not path:
        path = "/"
    best_len, best_allow = -1, True
    for allow, pattern in g.rules:
        if _compiled(pattern).match(path):
            if len(pattern) > best_len or (len(pattern) == best_len and allow and not best_allow):
                best_len, best_allow = len(pattern), allow
    return best_allow if best_len >= 0 else True


def crawl_delay(txt: str, agent: str, default: float = 0.0) -> float:
    g = group_for_agent(parse_robots(txt), agent)
    if g is None or g.crawl_delay is None:
        return default
    return g.crawl_delay


def admit_robots(frontier: DataFrame, robots: DataFrame, agent: str = "goskyr") -> DataFrame:
    """Filter frontier rows disallowed by their host's robots.txt.

    robots(host, robots_txt) is small relative to the frontier (one row
    per host) → broadcast join, then a vectorized allow test. Hosts with
    no robots row are fully allowed (left join, null txt)."""
    joined = frontier.join(F.broadcast(robots), on="host", how="left")

    @F.pandas_udf(T.BooleanType())
    def allowed(urls: pd.Series, txts: pd.Series) -> pd.Series:
        memo: dict[str, dict] = {}
        out = []
        for u, txt in zip(urls, txts):
            if txt is None or txt == "":
                out.append(True)
                continue
            g = memo.get(txt)
            if g is None:
                g = memo[txt] = parse_robots(txt)
            grp = group_for_agent(g, agent)
            p = urlsplit(u)
            path = p.path or "/"
            if p.query:
                path += "?" + p.query
            if grp is None:
                out.append(True)
                continue
            best_len, best_allow = -1, True
            for allow, pattern in grp.rules:
                if _compiled(pattern).match(path):
                    if len(pattern) > best_len or (len(pattern) == best_len and allow and not best_allow):
                        best_len, best_allow = len(pattern), allow
            out.append(best_allow if best_len >= 0 else True)
        return pd.Series(out)

    return joined.filter(allowed(F.col("url"), F.col("robots_txt"))).drop("robots_txt")


def host_budgets(robots: DataFrame, agent: str = "goskyr",
                 round_seconds: float = 60.0, default_budget: int = 32,
                 max_budget: int = 2048) -> DataFrame:
    """Per-host fetch budget for one crawl round from Crawl-delay:
    budget = round_seconds / crawl_delay (bounded). Hosts without a
    delay get ``default_budget``."""

    @F.pandas_udf(T.IntegerType())
    def budget(txts: pd.Series) -> pd.Series:
        out = []
        for txt in txts:
            d = crawl_delay(txt or "", agent, 0.0)
            if d <= 0:
                out.append(default_budget)
            else:
                out.append(max(1, min(max_budget, int(round_seconds / d))))
        return pd.Series(out, dtype="int32")

    return robots.select("host", budget(F.col("robots_txt")).alias("budget"))
