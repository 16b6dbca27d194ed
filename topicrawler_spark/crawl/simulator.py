"""Pure-Python reference crawl simulator.

Implements the batch-rounds crawl spec exactly once, with no Spark, as the
ordering ground truth the distributed engine must reproduce (the analogue of
the reference's Heritrix semantics: per-host queues ordered by
(directive, precedence, ordinal), politeness quota per round, URL-seen set
added at schedule time, robots preclusion after scheduling, perplexity
prioritization of outlinks).

Shared building blocks (canonicalization, host key, priority math, robots,
extraction, scoring) are the same Python functions the Spark engine wraps in
column expressions / pandas UDFs, so any divergence in a parity test
localizes to the *distributed* logic — exactly what we want to test.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from topicrawler_spark.crawl.config import CrawlConfig
from topicrawler_spark.crawl.priority import apply_priority_py
from topicrawler_spark.crawl.robots import effective_delay_ms, parse_robots
from topicrawler_spark.functions.canonicalize import canonicalize_py, host_classkey_py
from topicrawler_spark.functions.jsouptext import extract_text, java_trim
from topicrawler_spark.functions.outlinks import extract_outlinks
from topicrawler_spark.lm.perplexity import DocumentScorer

import re


@dataclass
class FrontierEntry:
    url: str
    canon: str
    host: str
    directive: int
    precedence: int
    ordinal: int
    hops: int
    via: str | None
    retries: int = 0
    not_before: int = 0  # snoozed until this round (retry delay)


@dataclass
class SimState:
    frontier: list[FrontierEntry] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)  # canonical urls
    host_fetched: dict[str, int] = field(default_factory=dict)
    host_delay_ms: dict[str, int] = field(default_factory=dict)
    next_ordinal: int = 0
    fetch_log: list[tuple[int, str, int, str]] = field(default_factory=list)
    # (round, host, host_rank, url)
    page_perp: dict[str, float] = field(default_factory=dict)


class CrawlSimulator:
    def __init__(
        self,
        pages: dict[str, bytes],
        scorer: DocumentScorer,
        config: CrawlConfig | None = None,
    ) -> None:
        self.pages = pages
        # page store keyed by canonical URL; smallest original spelling wins
        # (prepare_pages semantics)
        self.pages_by_canon: dict[str, bytes] = {}
        for url in sorted(pages):
            canon = canonicalize_py(url)
            if canon not in self.pages_by_canon:
                self.pages_by_canon[canon] = pages[url]
        self.scorer = scorer
        self.cfg = config or CrawlConfig()
        self._reject_re = re.compile(self.cfg.reject_extensions)
        from topicrawler_spark.functions.surt import PATHOLOGICAL_PATH, TOO_MANY_SEGMENTS, surt_py

        self._patho_re = re.compile(PATHOLOGICAL_PATH)
        self._toomany_re = re.compile(TOO_MANY_SEGMENTS)
        self._surt = surt_py
        self._robots: dict[str, object] = {}
        self.state = SimState()

    # ------------------------------------------------------------------ setup

    def seed(self, seeds: list[str]) -> None:
        st = self.state
        cfg = self.cfg
        # robots are rows of the pages table: parse all of them up-front so
        # crawl-delay politeness applies from a host's first round (batch
        # semantics; the engine broadcasts the same table before round 1)
        for url, body in self.pages.items():
            if url.endswith("/robots.txt"):
                host = host_classkey_py(canonicalize_py(url))
                rules = parse_robots(body.decode("utf-8", "replace"), cfg.user_agent)
                self._robots[host] = rules
                st.host_delay_ms[host] = effective_delay_ms(
                    rules.crawl_delay, cfg.min_delay_ms, cfg.max_robots_delay_s
                )
        for url in seeds:
            canon = canonicalize_py(url)
            if canon in st.seen:
                continue
            st.seen.add(canon)
            d, c = apply_priority_py(
                cfg.seed_perplexity, boundaries=cfg.boundaries,
                maxvalue=cfg.maxvalue, max_precedence=cfg.max_precedence,
            )
            st.frontier.append(
                FrontierEntry(url, canon, host_classkey_py(canon), d, c, st.next_ordinal, 0, None)
            )
            st.next_ordinal += 1

    # ------------------------------------------------------------------ robots

    def _robots_for(self, host: str):
        return self._robots.get(host)

    def _robots_allows(self, host: str, canon: str) -> bool:
        if not self.cfg.respect_robots:
            return True
        rules = self._robots_for(host)
        if rules is None:
            return True
        path = canon.split("://", 1)[-1]
        path = "/" + path.split("/", 1)[1] if "/" in path else "/"
        return rules.allows_path(path)

    # ------------------------------------------------------------------- round

    def run_round(self, round_no: int) -> int:
        st, cfg = self.state, self.cfg

        # 1. politeness admission: per-host top-k by (directive, precedence, ordinal)
        by_host: dict[str, list[FrontierEntry]] = {}
        for e in st.frontier:
            by_host.setdefault(e.host, []).append(e)
        admitted: list[FrontierEntry] = []
        remaining: list[FrontierEntry] = []
        active_hosts: set[str] | None = None
        if cfg.max_active_hosts is not None:
            ranked = sorted(
                (
                    (min(e.precedence for e in entries if e.precedence < cfg.precedence_floor), host)
                    for host, entries in by_host.items()
                    if any(e.precedence < cfg.precedence_floor for e in entries)
                ),
            )
            active_hosts = {h for _, h in ranked[: cfg.max_active_hosts]}
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (e.directive, e.precedence, e.ordinal))
            eligible = [
                e for e in entries
                if e.precedence < cfg.precedence_floor and e.not_before <= round_no
            ]
            floored = [
                e for e in entries
                if e.precedence >= cfg.precedence_floor or e.not_before > round_no
            ]
            if active_hosts is not None and host not in active_hosts:
                remaining.extend(entries)
                continue
            delay = st.host_delay_ms.get(host, cfg.min_delay_ms)
            quota = cfg.host_quota(delay)
            budget = cfg.queue_total_budget - st.host_fetched.get(host, 0)
            k = max(0, min(quota, budget))
            admitted.extend(eligible[:k])
            remaining.extend(eligible[k:])
            remaining.extend(floored)
        st.frontier = remaining

        # deterministic fetch order: by host then per-host rank
        admitted.sort(key=lambda e: (e.host, e.directive, e.precedence, e.ordinal))
        rank_in_host: dict[str, int] = {}
        candidates: list[tuple[int, int, str, str, float, int]] = []
        # (parent_ordinal, link_index, url, via, via_perp, hops)
        for e in admitted:
            r = rank_in_host.get(e.host, 0) + 1
            rank_in_host[e.host] = r
            st.fetch_log.append((round_no, e.host, r, e.canon))
            body = self.pages_by_canon.get(e.canon)
            if body is None:
                # fetch failure: no budget charge, no expansion; retry with
                # ordinal intact, snoozed retry_delay_rounds windows, until
                # max_retries (WorkQueueFrontier retry path)
                if e.retries < cfg.max_retries:
                    e.retries += 1
                    e.not_before = round_no + cfg.retry_delay_rounds()
                    st.frontier.append(e)
                continue
            st.host_fetched[e.host] = st.host_fetched.get(e.host, 0) + 1
            html = body.decode("utf-8", "replace")
            is_robots = e.canon.endswith("/robots.txt")
            if is_robots:
                continue
            text = java_trim(extract_text(html, self.scorer_cleaner()))
            perp = self.scorer.score_page_text(text)
            st.page_perp[e.canon] = perp
            for idx, (link, hop) in enumerate(extract_outlinks(html, e.url)):
                candidates.append((e.ordinal, idx, link, e.canon, perp, e.hops + 1))

        # 2. candidate chain: scope -> priority -> dedup -> robots -> schedule
        candidates.sort(key=lambda t: (t[0], t[1]))
        allowed_slds: set[str] | None = None
        if cfg.max_domains is not None:
            from topicrawler_spark.functions.canonicalize import second_level_domain_py

            slds: dict[str, None] = {}  # insertion-ordered
            for _, _, url, _, _, hops in candidates:
                if hops > cfg.max_hops:
                    continue
                canon = canonicalize_py(url)
                if self._reject_re.match(canon):
                    continue
                if cfg.hygiene_filters and (
                    self._patho_re.match(canon) or self._toomany_re.match(canon)
                ):
                    continue
                if cfg.surt_prefixes and not any(
                    self._surt(canon).startswith(p) for p in cfg.surt_prefixes
                ):
                    continue
                host = host_classkey_py(canon)
                if not host or (cfg.scope_hosts is not None and host not in cfg.scope_hosts):
                    continue
                # first-discovery order (candidates are sorted by parent
                # ordinal, link index): the first max_domains distinct
                # domains encountered win, matching the engine's
                # min-parent-ordinal cap
                sld = second_level_domain_py(host)
                if sld not in slds:
                    slds[sld] = None
            allowed_slds = set(list(slds)[: cfg.max_domains])
        scheduled = 0
        for parent_ord, idx, url, via, via_perp, hops in candidates:
            if hops > cfg.max_hops:
                continue
            canon = canonicalize_py(url)
            if self._reject_re.match(canon):
                continue
            if cfg.hygiene_filters and (
                self._patho_re.match(canon) or self._toomany_re.match(canon)
            ):
                continue
            if cfg.surt_prefixes and not any(
                self._surt(canon).startswith(p) for p in cfg.surt_prefixes
            ):
                continue
            host = host_classkey_py(canon)
            if not host:
                continue
            if cfg.scope_hosts is not None and host not in cfg.scope_hosts:
                continue
            if allowed_slds is not None:
                from topicrawler_spark.functions.canonicalize import second_level_domain_py

                if second_level_domain_py(host) not in allowed_slds:
                    continue
            d, c = apply_priority_py(
                via_perp, boundaries=cfg.boundaries,
                maxvalue=cfg.maxvalue, max_precedence=cfg.max_precedence,
            )
            if d < 0:
                continue  # out of scope: NOT added to seen
            if canon in st.seen:
                continue
            st.seen.add(canon)
            if not self._robots_allows(host, canon):
                continue  # scheduled->precluded: seen but never fetched
            st.frontier.append(
                FrontierEntry(url, canon, host, d, c, st.next_ordinal, hops, via)
            )
            st.next_ordinal += 1
            scheduled += 1
        return scheduled

    def scorer_cleaner(self):
        from topicrawler_spark.functions.cleaning import clean_ext

        return clean_ext

    def run(self, seeds: list[str], rounds: int) -> SimState:
        self.seed(seeds)
        for r in range(1, rounds + 1):
            if not self.state.frontier:
                break
            self.run_round(r)
        return self.state
