"""robots.txt parsing and gating (Heritrix Robotstxt semantics subset).

The reference fetches ``/robots.txt`` per host as a crawl prerequisite and
enforces it in PreconditionEnforcer; crawl-delay feeds the politeness delay
(capped at 180 s). In the batch engine robots bodies are ordinary rows of the
``pages`` table (url == scheme://host/robots.txt); we parse them once per
round into a small per-host rules table that is *broadcast-joined* against
candidates — the canonical small-dimension join.

Matching: directives of the most specific matching user-agent group
(longest agent substring match, ``*`` fallback); allows/disallows by longest
matching prefix, allow wins ties; empty disallow = allow all.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsRules:
    disallows: list[str] = field(default_factory=list)
    allows: list[str] = field(default_factory=list)
    crawl_delay: float | None = None

    def allows_path(self, path: str) -> bool:
        if not path.startswith("/"):
            path = "/" + path
        best_allow = -1
        best_disallow = -1
        for p in self.allows:
            if p and path.startswith(p) and len(p) > best_allow:
                best_allow = len(p)
        for p in self.disallows:
            if p and path.startswith(p) and len(p) > best_disallow:
                best_disallow = len(p)
        return best_allow >= best_disallow


def parse_robots(body: str, user_agent: str = "ltbot") -> RobotsRules:
    """Parse a robots.txt body for the given agent (longest-match group)."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], RobotsRules]] = []
    current_agents: list[str] = []
    current: RobotsRules | None = None
    last_was_agent = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not last_was_agent:
                current = RobotsRules()
                current_agents = []
                groups.append((current_agents, current))
            current_agents.append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if current is None:
            continue
        if key == "disallow":
            if value:
                current.disallows.append(value)
            else:
                current.allows.append("/")
        elif key == "allow":
            if value:
                current.allows.append(value)
        elif key == "crawl-delay":
            try:
                current.crawl_delay = float(value)
            except ValueError:
                pass
    best: RobotsRules | None = None
    best_len = -1
    for agents, rules in groups:
        for a in agents:
            if a == "*" and best_len < 0:
                best = rules
                best_len = 0
            elif a != "*" and a in ua and len(a) > best_len:
                best = rules
                best_len = len(a)
    return best if best is not None else RobotsRules()


def effective_delay_ms(
    crawl_delay_s: float | None,
    min_delay_ms: int = 100,
    max_robots_delay_s: float = 180.0,
) -> int:
    """DispositionProcessor's politeness merge: respect robots Crawl-Delay up
    to 180 s, floor at the configured minimum delay."""
    if crawl_delay_s is None:
        return min_delay_ms
    capped = min(crawl_delay_s, max_robots_delay_s) * 1000.0
    return int(max(min_delay_ms, capped))
