"""Large-scale training-data operations over crawled corpora.

Beyond the reference's own operators, a 100 TB crawl corpus needs the
standard data-pipeline toolbox: deduplication families, similarity search,
text quality analysis, and multimodal column plumbing. Everything here is
DataFrame-first: exact dedup and n-gram Jaccard are pure Catalyst plans;
MinHash/SimHash signatures are computed JVM-side from xxhash64 of shingles;
only embedding math uses Arrow-vectorized numpy.
"""
