"""spark-submit entry point: run a focused crawl.

spark-submit --py-files dist/topicrawler_spark.zip scripts/run_crawl.py \
    --pages <parquet/iceberg path> --seeds <seed file> \
    --corpus <topic corpus text dir> --rounds 10 \
    --checkpoint <dir> [--order 5] [--lm kneser-ney] [--quota-ms 10000]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True)
    p.add_argument("--seeds", required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--rounds", type=int, default=10)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--order", type=int, default=5)
    p.add_argument("--lm", default="kneser-ney")
    p.add_argument("--round-ms", type=int, default=10_000)
    p.add_argument("--max-hops", type=int, default=20)
    p.add_argument("--language", default="default")
    args = p.parse_args()

    from topicrawler_spark.crawl.config import CrawlConfig
    from topicrawler_spark.crawl.driver import run_crawl
    from topicrawler_spark.lm.apps import load_text_corpus
    from topicrawler_spark.lm.counting import build_local_lm
    from topicrawler_spark.lm.perplexity import DocumentScorer
    from topicrawler_spark.session import get_spark

    spark = get_spark(app_name="topicrawler-crawl")
    pages = spark.read.parquet(args.pages)
    with open(args.seeds) as f:
        seeds = [line.strip() for line in f if line.strip() and not line.startswith("#")]
    corpus = load_text_corpus(spark, args.corpus)
    lm = build_local_lm(spark, corpus, order=args.order, language_code=args.language)
    scorer = DocumentScorer(lm, args.lm, language_code=args.language)
    cfg = CrawlConfig(order=args.order, lm_kind=args.lm, round_ms=args.round_ms, max_hops=args.max_hops)
    run = run_crawl(spark, pages, seeds, scorer, args.rounds, cfg, checkpoint_dir=args.checkpoint)
    for m in run.metrics:
        print(json.dumps(m))
    spark.stop()


if __name__ == "__main__":
    main()
