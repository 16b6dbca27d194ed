"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Primary headline: the focused-crawl round loop — frontier URLs
expanded+scored per second on a deterministic synthetic web corpus
(seed=42). Secondary: representative operators at the sf-dir scale.

env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default all)
  BENCH_PAGES          (synthetic corpus size, default 120000)
  BENCH_ROUNDS         (crawl rounds, default 5)
  BENCH_SEEDS          (seed URLs, default max(8, pages/50))
  BENCH_QUOTA          (per-host politeness quota, default 100)
  BENCH_SCORE_MODE     (broadcast|join — join benches the corpus-scale
                       relational scoring path against the count table)
  BENCH_BLOOM_MIN_SEEN / BENCH_ORDINAL_MAX / BENCH_SCORE_WAVES
                       (regime-threshold experiment knobs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_pages = int(os.environ.get("BENCH_PAGES", "120000"))
    n_rounds = int(os.environ.get("BENCH_ROUNDS", "5"))
    n_seeds = int(os.environ.get("BENCH_SEEDS", str(max(8, n_pages // 50))))

    from topicrawler_spark.session import get_spark

    spark = get_spark(app_name="topicrawler-bench", master=f"local[{cpus}]")
    sc = spark.sparkContext
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1

    times: dict[str, float] = {}

    # ---- headline: crawl rounds ------------------------------------------------
    from topicrawler_spark.crawl.config import CrawlConfig
    from topicrawler_spark.crawl.driver import run_crawl
    from topicrawler_spark.datagen import generate_corpus, pages_dataframe, topic_corpus
    from topicrawler_spark.lm.local import LocalLM
    from topicrawler_spark.lm.perplexity import DocumentScorer

    corpus = generate_corpus(
        n_pages=n_pages,
        n_hosts=max(20, n_pages // 100),
        n_seeds=n_seeds,
        seed=42,
        links_per_page=12,
    )
    lm = LocalLM.from_texts([topic_corpus(42, 800)], order=3)
    scorer = DocumentScorer(lm, "kneser-ney")
    # BENCH_BLOOM_MIN_SEEN=0 activates the sharded Bloom seen pre-filter from
    # round 1 (exact-confirm, so results are identical to the plain
    # anti-join) — the on/off pair at the same corpus is the pre-filter's
    # bench evidence. Unset = config default (activates at 1M seen).
    bloom_env = os.environ.get("BENCH_BLOOM_MIN_SEEN", "")
    bloom_kw = {"bloom_min_seen": int(bloom_env)} if bloom_env else {}
    # BENCH_ORDINAL_MAX overrides ordinal_single_max (the frontier size up to
    # which the deterministic ordinal uses one global window vs the two-phase
    # distributed rank) for threshold-tuning experiments.
    ord_env = os.environ.get("BENCH_ORDINAL_MAX", "")
    ord_kw = {"ordinal_single_max": int(ord_env)} if ord_env else {}
    # BENCH_SCORE_WAVES overrides score_waves (scoring-stage task waves per
    # core) for straggler-tail tuning experiments.
    waves_env = os.environ.get("BENCH_SCORE_WAVES", "")
    waves_kw = {"score_waves": int(waves_env)} if waves_env else {}
    # BENCH_PIVOT_MIN_STATS overrides join_pivot_min_stats (stats-dimension
    # row count above which join scoring uses the single-exchange pivot
    # lookup instead of 2n-1 broadcast joins); 0 forces the pivot form —
    # the shape the 10^10-URL deployment runs, where the topic LM's stats
    # dimension far exceeds any broadcast threshold.
    pms_env = os.environ.get("BENCH_PIVOT_MIN_STATS", "")
    pms_kw = {"join_pivot_min_stats": int(pms_env)} if pms_env else {}
    # BENCH_SCORE_MODE=join benches the corpus-scale RELATIONAL scoring path
    # (count-table joins instead of the broadcast LM — the regime once the
    # topic LM outgrows a driver broadcast). Results are parity-tested
    # identical (tests/test_join_crawl.py); this knob gives the at-scale
    # path its own throughput/scaling numbers.
    score_mode = os.environ.get("BENCH_SCORE_MODE", "broadcast")
    cfg = CrawlConfig(
        order=3,
        per_host_quota=int(os.environ.get("BENCH_QUOTA", "100")),
        max_hops=15,
        score_mode=score_mode,
        **bloom_kw,
        **ord_kw,
        **waves_kw,
        **pms_kw,
    )
    from topicrawler_spark.crawl.round import prepare_pages

    pages = pages_dataframe(spark, corpus)
    # one-time store preparation (partitioned+sorted) — on a real deployment
    # this is the already-bucketed warehouse pages table. BENCH_STORE=host
    # lays it out by host classKey so the fetch-join output is already
    # host-clustered and the per-round html repartition disappears.
    store_layout = os.environ.get("BENCH_STORE", "canon")
    pages = prepare_pages(pages, by_host=store_layout == "host").localCheckpoint(
        eager=True
    )

    # Warm-up: a 1-round throwaway crawl spins up the Python worker pool and
    # JIT-compiles the codegen'd stages — on a cluster these are the
    # long-running executors' steady state, which is what the N-vs-4N
    # scaling comparison is about. Cold-start cost is reported in `detail`.
    lm_counts = None
    if score_mode == "join":
        lm_counts = spark.createDataFrame(
            [(g, len(g.split(" ")), c) for g, c in lm.counts.items()],
            "ngram string, n int, cnt long",
        )

    t_cold = time.time()
    run_crawl(
        spark, pages, corpus.seeds, scorer, 1, cfg,
        collect_metrics=False, pages_prepared=True, lm_counts=lm_counts,
    )
    warmup_sec = time.time() - t_cold

    t0 = time.time()
    run = run_crawl(
        spark, pages, corpus.seeds, scorer, n_rounds, cfg,
        collect_metrics=False, pages_prepared=True, lm_counts=lm_counts,
    )
    crawl_sec = time.time() - t0
    expanded = sum(m.get("urls_discovered", m.get("urls_new", 0)) for m in run.metrics)
    scored = sum(m.get("fetched", 0) for m in run.metrics)
    urls_per_sec = (expanded + scored) / crawl_sec if crawl_sec > 0 else 0.0
    times["crawl_rounds"] = round(crawl_sec, 3)

    # ---- secondary operators at sf scale --------------------------------------
    import __spark_entry__ as entrymod

    for name in [
        "ngram_count",
        "nfollow",
        "mle_bigram_logprob",
        "politeness_topk",
        "frontier_dedup",
        "minhash_lsh",
        "doc_perplexity",
        "embedding_topk",
        "pricing_summary",
        "events_sessions",
    ]:
        fn = entrymod.queries()[name]
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        except Exception:
            # fall back to count if noop sink unavailable
            try:
                fn(spark, sf_dir).count()
                times[name] = round(time.time() - t0, 3)
            except Exception as e:  # pragma: no cover
                times[name] = -1.0

    out = {
        "metric": "frontier URLs expanded+scored/sec (synthetic corpus, seed=42)",
        "value": round(urls_per_sec, 2),
        "unit": "urls/sec",
        "queries": times,
        "sf": sf,
        "detail": {
            "pages": n_pages,
            "seeds": n_seeds,
            "rounds": len(run.metrics),
            "urls_expanded": expanded,
            "pages_scored": scored,
            "crawl_sec": round(crawl_sec, 2),
            "warmup_sec": round(warmup_sec, 2),
            "cpus": cpus,
            **({"bloom_min_seen": int(bloom_env)} if bloom_env else {}),
            **({"store": store_layout} if store_layout != "canon" else {}),
            **({"score_mode": score_mode} if score_mode != "broadcast" else {}),
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
