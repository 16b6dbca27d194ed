"""The round-loop driver: seeds -> N crawl rounds, checkpointed, resumable.

Set SPARK_GRAFT_TIMING=1 to print per-round phase timings to stderr."""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from topicrawler_spark.crawl.checkpoint import CheckpointStore
from topicrawler_spark.crawl.config import CrawlConfig
from topicrawler_spark.crawl.robots import build_robots_table
from topicrawler_spark.crawl.round import (
    CrawlState,
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
    pages_prepared: bool = False,
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
    if cfg.schedule_robots_prereqs:
        # prereq mode: rules are crawl state (state.robots), discovered by
        # fetching /robots.txt prerequisites — no up-front parse
        from topicrawler_spark.crawl.robots import HOST_RULES_SCHEMA, RobotsTable

        robots = RobotsTable(spark.createDataFrame([], HOST_RULES_SCHEMA), None)
    else:
        robots = build_robots_table(
            spark, pages, cfg, collect_delays_max=cfg.robots_collect_max_hosts
        )
    from topicrawler_spark.crawl.round import build_round_ops, prepare_pages

    # localCheckpoint: materialize AND flatten the logical plan to a leaf —
    # otherwise every round's analysis re-walks the canonicalization tree
    # inside prepare_pages (serial driver time per transformation).
    # Callers running several crawls over one store (or a store that is
    # already canon-keyed and bucketed, the warehouse case) prepare once and
    # pass pages_prepared=True.
    if not pages_prepared:
        pages = prepare_pages(pages).localCheckpoint(eager=True)
    ops = build_round_ops(cfg, scorer_bc, robots)

    all_metrics: list[dict] = []
    empty_frontier = False
    # Driver-side budget fast path: only while the robots host count stayed
    # below the collect threshold (robots.delays present). Past it the
    # per-round host_fetched collect would itself be a driver bottleneck, so
    # the budget arithmetic runs as joins inside run_round instead.
    # On resume the persisted per-host fetched totals must seed the budget
    # bookkeeping — an empty map would grant retired hosts a fresh quota.
    distributed_budget = robots.delays is None
    host_fetched_map: dict[str, int] | None = (
        None
        if distributed_budget
        else {r["host"]: r["fetched"] for r in state.host_fetched.collect()}
    )

    def _fetched_total(hf) -> int:
        if host_fetched_map is not None:
            return sum(host_fetched_map.values())
        row = hf.agg(F.coalesce(F.sum("fetched"), F.lit(0)).alias("t")).collect()[0]
        return int(row["t"])

    prev_fetched_total = _fetched_total(state.host_fetched)
    # The hint is an upper bound on frontier/seen size driving the regime
    # switches. A fresh crawl's round-1 frontier IS the seed list, so the
    # hint must start at len(seeds) — starting at 0 would classify a 10M-seed
    # round 1 as "small" and broadcast the whole seed seen set. Resumed
    # crawls have no in-memory history; run the first round in the at-scale
    # regime (None) and refresh the hint from the committed seen set after it.
    frontier_hint: int | None = len(seeds) if state.round_no == 0 else None
    aqe_orig = spark.conf.get("spark.sql.adaptive.enabled", "true")
    shuffle_orig = spark.conf.get("spark.sql.shuffle.partitions", "200")
    cores = spark.sparkContext.defaultParallelism
    # None = frontier emptiness unknown (fresh/resumed state): check once.
    # After a round that discovered > 0 URLs the frontier is non-empty by
    # construction, so the per-round isEmpty job is skipped.
    last_enq: int | None = None
    try:
        for _ in range(state.round_no, rounds):
            if empty_frontier or (
                (last_enq is None or last_enq == 0) and state.frontier.isEmpty()
            ):
                break
            # Post-resume with bloom enabled: one count over the committed
            # (parquet-backed) seen set — needed for bloom sizing anyway, and
            # hoisted ABOVE the regime switch so the session conf
            # (AQE/shuffle partitions) and run_round's regime agree on the
            # first post-resume round instead of pairing at-scale conf with
            # small-regime plans.
            if frontier_hint is None and cfg.bloom_min_seen is not None:
                frontier_hint = state.seen.count()
            # AQE pays one driver re-plan round trip per query stage — a win when
            # stages shuffle real data (runtime coalescing/skew handling), pure
            # latency when the whole round is sub-second stages. Follow the same
            # regime switch as salting: off below the threshold, on at scale.
            # With AQE off, right-size the static shuffle partitioning to the
            # executor-slot count (the coalescing AQE would otherwise perform).
            small = frontier_hint is not None and frontier_hint < cfg.salt_min_frontier
            spark.conf.set("spark.sql.adaptive.enabled", "false" if small else aqe_orig)
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(cores) if small else shuffle_orig
            )
            # Bloom regime: once the seen set passes the threshold (or its
            # size is unknown post-resume, i.e. possibly at-scale), build the
            # sharded filter from the committed seen set; thereafter
            # run_round maintains it incrementally. With auto-sizing the
            # shard count/size derive from the seen-count hint (>=10
            # bits/key with 4x headroom), and when the seen set outgrows the
            # filter's ~50%-density capacity it is rebuilt larger — a
            # saturated filter flags everything maybe-seen and prunes
            # nothing while still paying its cogroup probe every round.
            if cfg.bloom_min_seen is not None and (
                frontier_hint is None or frontier_hint >= cfg.bloom_min_seen
            ):
                from dataclasses import replace as _dc_replace

                from topicrawler_spark.crawl.bloom import BloomParams, bloom_add

                active = state.bloom_params or (
                    cfg.bloom_params() if state.bloom is not None else None
                )
                build = None
                if state.bloom is None and frontier_hint >= cfg.bloom_min_seen:
                    build = (
                        BloomParams.for_keys(frontier_hint, n_hashes=cfg.bloom_hashes)
                        if cfg.bloom_auto_size
                        else cfg.bloom_params()
                    )
                elif (
                    state.bloom is not None
                    and cfg.bloom_auto_size
                    and active is not None
                    and frontier_hint > active.capacity
                ):
                    build = BloomParams.for_keys(frontier_hint, n_hashes=cfg.bloom_hashes)
                if build is not None:
                    state = _dc_replace(
                        state,
                        bloom=bloom_add(
                            spark, None, state.seen.select("url_hash"), build
                        ).localCheckpoint(eager=False),
                        bloom_params=build,
                    )
            timing = os.environ.get("SPARK_GRAFT_TIMING") == "1"
            t0 = time.time()
            state, result = run_round(
                spark, state, pages, scorer_bc, robots, cfg,
                collect_metrics=collect_metrics, frontier_size_hint=frontier_hint,
                ops=ops, host_fetched_map=host_fetched_map,
            )
            t_plan = time.time() - t0
            all_metrics.append(result.metrics)
            # prereq mode: the seen set also grows by the synthesized robots
            # rows (cached in run_round), which urls_discovered never counts —
            # fold them into the hint increment or the bloom saturation
            # rebuild fires late on robots-heavy crawls. One count over a
            # cached frame, off the bench path (seen_extra is None there).
            seen_extra_rows = (
                result.seen_extra.count() if result.seen_extra is not None else 0
            )
            if store is not None:
                # backfill the throughput counters BEFORE commit so the
                # persisted manifest carries them (bench mode leaves
                # urls_discovered None; 'fetched' derives from the per-host
                # totals delta). enqueued/host_fetched read from cached
                # intermediates — cheap rescans.
                if result.metrics.get("urls_discovered", 0) is None:
                    result.metrics["urls_discovered"] = result.enqueued.count()
                if not distributed_budget:
                    host_fetched_map = {
                        r["host"]: r["fetched"] for r in state.host_fetched.collect()
                    }
                total_fetched = _fetched_total(state.host_fetched)
                result.metrics.setdefault("fetched", total_fetched - prev_fetched_total)
                prev_fetched_total = total_fetched
                store.commit_round(state, result)
                # re-read committed state: cuts the lazy lineage chain and makes
                # the carried state exactly the committed bytes
                state = store.resume(spark)
                for df in result.cached:
                    df.unpersist()
            else:
                # memory-only mode, minimal jobs per round:
                #  - frontier: materialize + cut lineage (it mutates every round);
                #    in the small-round regime this localCheckpoint is the ONE
                #    Spark query the whole round compiles to (run_round itself is
                #    action-free there)
                #  - host_fetched: tiny — collect to the driver and recreate
                #  - seen: pure append of the (already cached) new segment; the
                #    union plan stays shallow, nothing re-materializes
                t0 = time.time()
                frontier = state.frontier.localCheckpoint(eager=True)
                t_ck = time.time() - t0
                t_cnt = 0.0
                t0 = time.time()
                need_enq = result.metrics.get("urls_discovered", 0) is None
                if distributed_budget:
                    # never collect the (at-scale, host-cardinality) fetch
                    # totals: materialize and cut lineage executor-side
                    host_fetched = state.host_fetched.localCheckpoint(eager=True)
                    total_fetched = _fetched_total(host_fetched)
                    if need_enq:
                        result.metrics["urls_discovered"] = result.enqueued.count()
                else:
                    # ONE job for the per-host totals AND the discovery
                    # counter (both are cache rescans; fusing them saves a
                    # job launch per round — fixed driver latency that does
                    # not shrink with cores). The counter rides along as a
                    # sentinel-keyed row ('~' never starts a host key).
                    hf = state.host_fetched.select("host", "fetched")
                    if need_enq:
                        hf = hf.unionByName(
                            result.enqueued.groupBy()
                            .agg(F.count(F.lit(1)).alias("fetched"))
                            .select(F.lit("~enq").alias("host"), "fetched")
                        )
                    rows = hf.collect()
                    host_rows = [
                        (r["host"], r["fetched"]) for r in rows if r["host"] != "~enq"
                    ]
                    if need_enq:
                        result.metrics["urls_discovered"] = next(
                            (int(r["fetched"]) for r in rows if r["host"] == "~enq"), 0
                        )
                    host_fetched_map = dict(host_rows)
                    total_fetched = sum(f for _, f in host_rows)
                    host_fetched = (
                        spark.createDataFrame(host_rows, "host string, fetched long")
                        if host_rows
                        else spark.createDataFrame([], "host string, fetched long")
                    )
                result.metrics.setdefault("fetched", total_fetched - prev_fetched_total)
                prev_fetched_total = total_fetched
                # lazy localCheckpoint flattens the growing union-chain plan of
                # the seen set to a leaf (materializes inside the next round's
                # query — no extra job here); same for the bloom's cogroup chain
                seen = state.seen.localCheckpoint(eager=False)
                bloom = (
                    state.bloom.localCheckpoint(eager=False)
                    if state.bloom is not None
                    else None
                )
                robots_state = (
                    state.robots.localCheckpoint(eager=False)
                    if state.robots is not None
                    else None
                )
                state = CrawlState(
                    state.round_no, frontier, seen, host_fetched, bloom,
                    robots_state, state.bloom_params,
                )
                empty_frontier = result.metrics.get("urls_discovered") == 0 and frontier.isEmpty()
                for df in result.cached[:-1]:  # keep new_unique: the seen set references it
                    df.unpersist()
                if timing:
                    print(
                        f"[round {state.round_no}] plan={t_plan:.2f}s ckpt={t_ck:.2f}s "
                        f"enqcnt={t_cnt:.2f}s hostfetch={time.time()-t0:.2f}s "
                        f"enq={result.metrics.get('urls_discovered')} fetched={result.metrics.get('fetched')}",
                        file=sys.stderr,
                    )
            # running upper bound on frontier size: everything ever discovered
            enq = result.metrics.get("urls_discovered", result.metrics.get("urls_new", 0)) or 0
            last_enq = enq
            if frontier_hint is None:
                # first post-resume round: one count over the (parquet-backed,
                # just-committed) seen set restores hint-driven regime
                # switching; thereafter the hint accumulates per-round.
                frontier_hint = state.seen.count()
            else:
                frontier_hint += enq + seen_extra_rows
    finally:
        # the per-regime conf switches touch session-wide state; restore
        # them even when a round fails mid-crawl
        spark.conf.set("spark.sql.adaptive.enabled", aqe_orig)
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_orig)
    return CrawlRun(state, all_metrics)
