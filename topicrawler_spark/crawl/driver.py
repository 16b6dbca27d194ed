"""The round-loop driver: seeds -> N crawl rounds, checkpointed, resumable."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from topicrawler_spark.crawl.checkpoint import CheckpointStore
from topicrawler_spark.crawl.config import CrawlConfig
from topicrawler_spark.crawl.round import (
    CrawlState,
    build_robots_broadcast,
    init_state,
    run_round,
)
from topicrawler_spark.lm.perplexity import DocumentScorer


@dataclass
class CrawlRun:
    state: CrawlState
    metrics: list[dict]


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: list[str],
    scorer: DocumentScorer,
    rounds: int,
    cfg: CrawlConfig | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    collect_metrics: bool = True,
) -> CrawlRun:
    cfg = cfg or CrawlConfig()
    store = CheckpointStore(checkpoint_dir) if checkpoint_dir else None

    state: CrawlState | None = None
    if store is not None and resume:
        state = store.resume(spark)
    if state is None:
        state = init_state(spark, seeds, cfg)
        if store is not None:
            store.commit_round(state, None)

    scorer_bc = spark.sparkContext.broadcast(scorer)
    robots_bc = build_robots_broadcast(spark, pages, cfg)
    from topicrawler_spark.crawl.round import prepare_pages

    pages = prepare_pages(pages).persist()

    all_metrics: list[dict] = []
    prev_fetched_total = 0
    empty_frontier = False
    frontier_hint: int | None = 0
    for _ in range(state.round_no, rounds):
        if empty_frontier or state.frontier.isEmpty():
            break
        state, result = run_round(
            spark, state, pages, scorer_bc, robots_bc, cfg,
            collect_metrics=collect_metrics, frontier_size_hint=frontier_hint,
        )
        # running upper bound on frontier size: everything ever enqueued
        enq = result.metrics.get("urls_enqueued", result.metrics.get("urls_new", 0)) or 0
        frontier_hint = None if frontier_hint is None else frontier_hint + enq
        all_metrics.append(result.metrics)
        if store is not None:
            store.commit_round(state, result)
            # re-read committed state: cuts the lazy lineage chain and makes
            # the carried state exactly the committed bytes
            state = store.resume(spark)
            for df in result.cached:
                df.unpersist()
        else:
            # memory-only mode, minimal jobs per round:
            #  - frontier: materialize + cut lineage (it mutates every round)
            #  - host_fetched: tiny — collect to the driver and recreate
            #  - seen: pure append of the (already cached) new segment; the
            #    union plan stays shallow, nothing re-materializes
            frontier = state.frontier.localCheckpoint(eager=True)
            host_rows = [(r["host"], r["fetched"]) for r in state.host_fetched.collect()]
            total_fetched = sum(f for _, f in host_rows)
            result.metrics.setdefault("fetched", total_fetched - prev_fetched_total)
            prev_fetched_total = total_fetched
            host_fetched = (
                spark.createDataFrame(host_rows, "host string, fetched long")
                if host_rows
                else spark.createDataFrame([], "host string, fetched long")
            )
            state = CrawlState(state.round_no, frontier, state.seen, host_fetched)
            empty_frontier = result.metrics.get("urls_enqueued") == 0 and frontier.isEmpty()
            for df in result.cached[:-1]:  # keep new_unique: the seen set references it
                df.unpersist()
    return CrawlRun(state, all_metrics)
