"""Deterministic segmentation (sentences + tokens), lt.seg-compatible.

Port of the reference rule engine's *semantics* (lt.seg: DiffTokenizer,
EmptySpaceTokenizer, LineSplitter, RuleSplitter + filter/normalize levels),
re-implemented in vectorizable Python for use inside Arrow-batched pandas
UDFs. Character classification uses the exact Java ``Character.getType``
tables (see ``topicrawler_spark.javachar``).
"""

from topicrawler_spark.seg.segtypes import SegmentType, infer_type  # noqa: F401
from topicrawler_spark.seg.tokenizer import (  # noqa: F401
    diff_tokenize,
    empty_space_tokenize,
    filtered_normalized_tokens,
)
from topicrawler_spark.seg.sentences import (  # noqa: F401
    SentenceMaker,
    line_split,
    rule_split,
)
