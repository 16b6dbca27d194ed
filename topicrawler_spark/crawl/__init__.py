"""The batch-rounds focused-crawl engine.

One crawl round = one Spark job over carried-forward tables:
``frontier`` (URLs to fetch this round), ``seen`` (64-bit fingerprints),
``host_stats`` (per-host fetched totals for the queue budget), ``results``
(scored pages), ``metrics`` (per-round, per-partition lineage).
"""
