"""n-gram language models: counting as Spark aggregations, scoring as
broadcast-dict lookups inside vectorized UDFs, perplexity as per-document
reductions.

The LM the crawler scores against is the *seed-topic* model: small enough
that the reference serves it from one RMI server's heap. The Spark-native
equivalent is a driver-built ``LocalLM`` broadcast to all executors — the
lookup tables live once per executor, scoring is embarrassingly parallel,
and there is no service to fail mid-crawl. The count *construction* is a
set of DataFrame aggregations that scale to arbitrarily large corpora.
"""

from topicrawler_spark.lm.ngrams import ngram_sequence, provider_ngrams, provider_tokenize  # noqa: F401
from topicrawler_spark.lm.local import LocalLM  # noqa: F401
