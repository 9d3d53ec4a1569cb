"""robots.txt parsing + allow/delay checks, matching the reference's use of
crawler-commons ``SimpleRobotRulesParser`` via ``utils/SiteRobotsTxt.scala``
(ghajduk3/ieps-crawler):

- ``isAllowed`` (SiteRobotsTxt.scala:34-41): allow-all when the site has no
  robots content; deny when the URL is undefined.
- ``getDelay`` (:18,22-30): robots ``Crawl-delay`` (crawler-commons stores
  milliseconds — seconds in the file are multiplied by 1000), else the
  4000 ms default.
- ``getSitemaps`` (:32): the robots file's ``Sitemap:`` lines.

Rule matching follows the public Google robots.txt spec that
crawler-commons implements: rules of the most specific matching user-agent
group apply; longest-path-match wins; Allow wins ties; ``*`` wildcard and
``$`` end-anchor supported. Pure Python (re-derivation, no code copied),
exposed as an Arrow-batched pandas UDF over (url, robots_content) — rules
are parsed once per distinct robots body per batch and cached.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, LongType

DEFAULT_CRAWL_DELAY_MS = 4000  # SiteRobotsTxt.scala:18


class RobotRules:
    __slots__ = ("rules", "crawl_delay_ms", "sitemaps")

    def __init__(self, rules, crawl_delay_ms, sitemaps):
        self.rules = rules  # list[(is_allow: bool, pattern: str)]
        self.crawl_delay_ms = crawl_delay_ms  # None = unset
        self.sitemaps = sitemaps

    def is_allowed(self, url: str | None) -> bool:
        if url is None:
            return False  # SiteRobotsTxt.scala:40
        path = _url_path_query(url)
        best_len, best_allow = -1, True
        for is_allow, pat in self.rules:
            if not pat:
                # empty Disallow = allow all (matches nothing)
                continue
            if _matches(pat, path):
                plen = len(pat)
                if plen > best_len or (plen == best_len and is_allow and not best_allow):
                    best_len, best_allow = plen, is_allow
        return best_allow

    @property
    def delay_ms(self) -> int:
        if self.crawl_delay_ms is None:
            return DEFAULT_CRAWL_DELAY_MS
        return self.crawl_delay_ms


def _url_path_query(url: str) -> str:
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", url)
    if m:
        pq = m.group(1)
        return pq if pq else "/"
    return url if url.startswith("/") else "/" + url


@lru_cache(maxsize=4096)
def _pat_re(pattern: str):
    out, anchored = [], False
    p = pattern
    if p.endswith("$"):
        anchored, p = True, p[:-1]
    for ch in p:
        out.append(".*" if ch == "*" else re.escape(ch))
    return re.compile("".join(out) + ("$" if anchored else ""))


def _matches(pattern: str, path: str) -> bool:
    return _pat_re(pattern).match(path) is not None


_UA_RE = re.compile(r"^\s*user-agent\s*:\s*(.*?)\s*(?:#.*)?$", re.I)
_DIR_RE = re.compile(r"^\s*(allow|disallow|crawl-delay|sitemap)\s*:\s*(.*?)\s*(?:#.*)?$", re.I)


def parse_robots(content: str | None, agent: str = "*") -> RobotRules | None:
    """None content → None (allow-all default, SiteRobotsTxt.scala:38)."""
    if content is None:
        return None
    groups: list[tuple[list[str], list, float | None]] = []
    sitemaps: list[str] = []
    cur_agents: list[str] = []
    cur_rules: list = []
    cur_delay: float | None = None
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for line in content.splitlines():
        m = _UA_RE.match(line)
        if m:
            if in_group_body:
                flush()
                in_group_body = False
            cur_agents.append(m.group(1).lower())
            continue
        m = _DIR_RE.match(line)
        if not m:
            continue
        key, val = m.group(1).lower(), m.group(2)
        if key == "sitemap":
            if val:
                sitemaps.append(val)
            continue
        in_group_body = True
        if key == "crawl-delay":
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        elif not cur_agents:
            continue  # rule before any user-agent line: ignored
        elif key == "allow":
            cur_rules.append((True, val))
        else:
            cur_rules.append((False, val))
    flush()

    agent_l = agent.lower()
    # most specific matching group: exact agent substring beats '*'
    chosen = None
    for agents, rules, delay in groups:
        if any(a != "*" and (a in agent_l or agent_l in a) for a in agents):
            chosen = (rules, delay)
            break
    if chosen is None:
        for agents, rules, delay in groups:
            if "*" in agents:
                chosen = (rules, delay)
                break
    if chosen is None:
        chosen = ([], None)
    rules, delay = chosen
    delay_ms = None if delay is None else int(delay * 1000)
    return RobotRules(rules, delay_ms, sitemaps)


@lru_cache(maxsize=4096)
def _cached_rules(content: str | None) -> RobotRules | None:
    return parse_robots(content)


def is_allowed(url: str | None, robots_content: str | None) -> bool:
    rules = _cached_rules(robots_content)
    if rules is None:
        return url is not None  # allow-all, but undefined url → False
    return rules.is_allowed(url)


def delay_ms(robots_content: str | None) -> int:
    rules = _cached_rules(robots_content)
    return DEFAULT_CRAWL_DELAY_MS if rules is None else rules.delay_ms


def sitemaps_of(robots_content: str | None) -> list[str]:
    rules = _cached_rules(robots_content)
    return [] if rules is None else list(rules.sitemaps)


def _allowed_series(url: pd.Series, robots: pd.Series) -> pd.Series:
    return pd.Series(
        [is_allowed(u, r) for u, r in zip(url, robots)], dtype="boolean"
    )


def _delay_series(robots: pd.Series) -> pd.Series:
    return pd.Series([delay_ms(r) for r in robots], dtype="int64")


robots_allowed_udf = pandas_udf(_allowed_series, BooleanType())
robots_delay_udf = pandas_udf(_delay_series, LongType())
