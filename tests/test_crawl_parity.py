"""The crawl-ordering ground-truth test: the distributed engine must produce
the exact per-round, per-host fetch order and the exact final URL-seen set
that the pure-Python reference simulator produces on the same corpus, seeds
and politeness budget — the batch analogue of 'matches the reference crawler
under the same seed list and politeness budget'."""

from __future__ import annotations

import pytest

from topicrawler_spark.crawl.config import CrawlConfig
from topicrawler_spark.crawl.driver import run_crawl
from topicrawler_spark.crawl.simulator import CrawlSimulator
from topicrawler_spark.datagen import generate_corpus, pages_dataframe, topic_corpus
from topicrawler_spark.lm.local import LocalLM
from topicrawler_spark.lm.perplexity import DocumentScorer


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(n_pages=120, n_hosts=8, n_seeds=3, seed=42)


@pytest.fixture(scope="module")
def scorer():
    lm = LocalLM.from_texts([topic_corpus(42)], order=3)
    return DocumentScorer(lm, "kneser-ney")


@pytest.fixture(scope="module")
def cfg():
    return CrawlConfig(order=3, per_host_quota=3, max_hops=10, round_ms=1000)


ROUNDS = 4


@pytest.fixture(scope="module")
def sim_state(corpus, scorer, cfg):
    sim = CrawlSimulator(corpus.pages, scorer, cfg)
    return sim.run(corpus.seeds, ROUNDS)


@pytest.fixture(scope="module")
def engine_run(spark, corpus, scorer, cfg, tmp_path_factory):
    pages = pages_dataframe(spark, corpus)
    ckpt = str(tmp_path_factory.mktemp("crawl_ckpt"))
    return run_crawl(spark, pages, corpus.seeds, scorer, ROUNDS, cfg, checkpoint_dir=ckpt), ckpt


def test_fetch_order_matches_simulator(spark, engine_run, sim_state):
    run, ckpt = engine_run
    from topicrawler_spark.crawl.checkpoint import CheckpointStore

    store = CheckpointStore(ckpt)
    engine_log = []
    for r in range(1, run.state.round_no + 1):
        rows = store.read(spark, r, "fetch_log").collect()
        engine_log.extend((x["round"], x["host"], x["host_rank"], x["canon"]) for x in rows)
    sim_log = list(sim_state.fetch_log)
    assert sorted(engine_log) == sorted(sim_log)


def test_seen_set_matches_simulator(engine_run, sim_state):
    run, _ = engine_run
    engine_seen = {r["canon"] for r in run.state.seen.collect()}
    assert engine_seen == sim_state.seen


def test_frontier_matches_simulator(engine_run, sim_state):
    run, _ = engine_run
    engine_frontier = {r["canon"] for r in run.state.frontier.collect()}
    sim_frontier = {e.canon for e in sim_state.frontier}
    assert engine_frontier == sim_frontier


def test_perplexities_match_simulator(spark, engine_run, sim_state):
    run, ckpt = engine_run
    from topicrawler_spark.crawl.checkpoint import CheckpointStore

    store = CheckpointStore(ckpt)
    engine_perp = {}
    for r in range(1, run.state.round_no + 1):
        for x in store.read(spark, r, "results").collect():
            engine_perp[x["canon"]] = x["perp"]
    assert set(engine_perp) == set(sim_state.page_perp)
    for canon, p in sim_state.page_perp.items():
        assert engine_perp[canon] == pytest.approx(p, rel=1e-12), canon


def test_resume_from_checkpoint(spark, corpus, scorer, cfg, engine_run):
    """Re-running with the same checkpoint dir resumes, not recomputes: the
    state after resume equals the committed state."""
    run, ckpt = engine_run
    pages = pages_dataframe(spark, corpus)
    resumed = run_crawl(
        spark, pages, corpus.seeds, scorer, run.state.round_no, cfg, checkpoint_dir=ckpt
    )
    assert resumed.state.round_no == run.state.round_no
    assert resumed.metrics == []  # nothing re-executed
    a = {r["canon"] for r in resumed.state.frontier.collect()}
    b = {r["canon"] for r in run.state.frontier.collect()}
    assert a == b


def test_determinism_two_runs(spark, corpus, scorer, cfg, tmp_path_factory):
    pages = pages_dataframe(spark, corpus)
    r1 = run_crawl(spark, pages, corpus.seeds, scorer, 2, cfg,
                   checkpoint_dir=str(tmp_path_factory.mktemp("d1")))
    r2 = run_crawl(spark, pages, corpus.seeds, scorer, 2, cfg,
                   checkpoint_dir=str(tmp_path_factory.mktemp("d2")))
    s1 = sorted((x["canon"], x["directive"], x["precedence"], x["ord_r"], x["ord_k"])
                for x in r1.state.frontier.collect())
    s2 = sorted((x["canon"], x["directive"], x["precedence"], x["ord_r"], x["ord_k"])
                for x in r2.state.frontier.collect())
    assert s1 == s2


def test_large_regime_strategies_match_small(spark, corpus, scorer, cfg):
    """Forcing every at-scale physical strategy (sort-merge co-partitioned
    fetch, shuffle seen anti-join, salted politeness, two-phase ordinal)
    must produce the exact same crawl as the small-regime broadcast paths."""
    from dataclasses import replace

    pages = pages_dataframe(spark, corpus)
    small = run_crawl(spark, pages, corpus.seeds, scorer, 3, cfg)
    big_cfg = replace(
        cfg,
        salt_min_frontier=0,      # salted pre-rank always on
        seen_broadcast_max=0,     # shuffle anti-join
        ordinal_single_max=0,     # two-phase ordinal
        fetch_broadcast_max=0,    # co-partitioned SMJ fetch
        n_salt=4,
    )
    big = run_crawl(spark, pages, corpus.seeds, scorer, 3, big_cfg)
    key = lambda x: (x["canon"], x["directive"], x["precedence"], x["ord_r"], x["ord_k"])
    assert sorted(map(key, small.state.frontier.collect())) == sorted(
        map(key, big.state.frontier.collect())
    )
    assert {r["url_hash"] for r in small.state.seen.collect()} == {
        r["url_hash"] for r in big.state.seen.collect()
    }


def test_retry_parity_with_simulator(spark, corpus, scorer, tmp_path):
    """Failed fetches must retry with ordinal intact (snoozed one window at
    this config) and drop after max_retries — identically in the engine and
    the simulator, down to the per-round fetch log."""
    from topicrawler_spark.crawl.checkpoint import CheckpointStore

    cfg = CrawlConfig(order=3, per_host_quota=3, max_hops=10, round_ms=1000,
                      retry_delay_s=0.5, max_retries=2)
    assert cfg.retry_delay_rounds() == 1
    rounds = 5
    sim = CrawlSimulator(corpus.pages, scorer, cfg)
    sim_state = sim.run(corpus.seeds, rounds)
    pages = pages_dataframe(spark, corpus)
    ckpt = str(tmp_path / "ck")
    run = run_crawl(spark, pages, corpus.seeds, scorer, rounds, cfg, checkpoint_dir=ckpt)
    store = CheckpointStore(ckpt)
    engine_log = []
    for r in range(1, run.state.round_no + 1):
        engine_log.extend(
            (x["round"], x["host"], x["host_rank"], x["canon"])
            for x in store.read(spark, r, "fetch_log").collect()
        )
    assert sorted(engine_log) == sorted(sim_state.fetch_log)
    # the corpus has dangling links: retries must actually occur
    from collections import Counter

    attempts = Counter(c for _, _, _, c in engine_log)
    assert any(v > 1 for v in attempts.values()), "no retry was exercised"
    engine_frontier = {
        (x["canon"], x["retries"], x["not_before"])
        for x in run.state.frontier.collect()
    }
    sim_frontier = {(e.canon, e.retries, e.not_before) for e in sim_state.frontier}
    assert engine_frontier == sim_frontier


def test_distributed_budget_matches_driver_fast_path(spark, corpus, scorer, cfg):
    """Forcing the fully-distributed budget regime (no driver delay dict, no
    per-round host_fetched collect — quota/budget arithmetic as joins) must
    produce the exact same crawl as the driver fast path."""
    from dataclasses import replace

    pages = pages_dataframe(spark, corpus)
    fast = run_crawl(spark, pages, corpus.seeds, scorer, 3, cfg)
    dist_cfg = replace(cfg, robots_collect_max_hosts=0)
    dist = run_crawl(spark, pages, corpus.seeds, scorer, 3, dist_cfg)
    key = lambda x: (x["canon"], x["directive"], x["precedence"], x["ord_r"], x["ord_k"])
    assert sorted(map(key, fast.state.frontier.collect())) == sorted(
        map(key, dist.state.frontier.collect())
    )
    assert {r["url_hash"] for r in fast.state.seen.collect()} == {
        r["url_hash"] for r in dist.state.seen.collect()
    }
    # the budget/politeness metrics must agree too (same admitted counts)
    assert [m.get("fetched") for m in fast.metrics] == [
        m.get("fetched") for m in dist.metrics
    ]


def test_seen_segment_compaction_matches_full_checkpoint(spark, corpus, scorer, cfg):
    """Memory-mode seen checkpointing writes per-round SEGMENTS and carries
    the set as a union of leaves, compacting every N rounds. Forcing
    compaction every round (the old full-copy behavior) and never compacting
    (pure segment unions) must both produce the exact same seen set and
    frontier — the checkpoint strategy is invisible to crawl semantics."""
    from dataclasses import replace

    pages = pages_dataframe(spark, corpus)
    seg = run_crawl(spark, pages, corpus.seeds, scorer, 4,
                    replace(cfg, seen_compact_every=100))
    cmp_ = run_crawl(spark, pages, corpus.seeds, scorer, 4,
                     replace(cfg, seen_compact_every=1))
    assert {r["url_hash"] for r in seg.state.seen.collect()} == {
        r["url_hash"] for r in cmp_.state.seen.collect()
    }
    key = lambda x: (x["canon"], x["directive"], x["precedence"], x["ord_r"], x["ord_k"])
    assert sorted(map(key, seg.state.frontier.collect())) == sorted(
        map(key, cmp_.state.frontier.collect())
    )
    # no duplicate rows may accumulate across segment unions
    assert seg.state.seen.count() == seg.state.seen.select("url_hash").distinct().count()
