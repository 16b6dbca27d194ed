"""topicrawler_spark — a from-scratch, PySpark-native focused-crawl engine.

Re-expresses the capabilities of the reference system (remstef/topicrawler:
Heritrix 3.2.0 + lt.ltbot perplexity prioritization + lt.lm n-gram language
models + lt.seg segmentation) as idiomatic Spark DataFrame pipelines:

- ``functions``   : text extraction / cleaning / canonicalization / hashing
                    (vectorized pandas UDFs + pure Catalyst column expressions)
- ``seg``         : deterministic sentence splitting + tokenization
                    (port of the lt.seg rule engine semantics)
- ``lm``          : n-gram counting as Spark aggregations, MLE / Stupid-Backoff /
                    Kneser-Ney scoring, document perplexity
- ``crawl``       : the batch-rounds frontier (canonicalize -> hash -> dedup ->
                    score -> prioritize -> per-host politeness), checkpointing,
                    and a pure-Python reference simulator for ordering parity
- ``pipeline``    : large-scale training-data ops (dedup families, similarity
                    search, text quality stats, multimodal plumbing)

Everything here is built on public PySpark APIs only.
"""

__version__ = "0.1.0"
