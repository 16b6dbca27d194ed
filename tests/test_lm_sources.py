"""The LM pipeline's file sources/sinks (lt.lm shell-pipeline equivalents):
raw text corpus reader (file-per-doc and one-doc-per-line), the gzip TSV
count-table source, the partitioned count-table sink, and the
PerplexityClient-style per-file scorer."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from topicrawler_spark.lm.apps import (
    load_text_corpus,
    read_count_table,
    score_files,
    write_lm_counts,
)


@pytest.fixture(scope="module")
def text_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("texts")
    (d / "a.txt").write_text("the cat sat on the mat\nthe dog sat too\n")
    (d / "b.txt").write_text("a bird sang\n\nquietly\n")
    return str(d)


def test_load_text_corpus_file_per_doc(spark, text_dir):
    docs = load_text_corpus(spark, text_dir)
    texts = sorted(r["text"] for r in docs.collect())
    assert len(texts) == 2
    assert any("cat sat" in t and "dog sat" in t for t in texts)  # lines joined


def test_load_text_corpus_one_doc_per_line(spark, text_dir):
    docs = load_text_corpus(spark, text_dir, onedocperline=True)
    lines = {r["text"] for r in docs.collect()}
    assert "the cat sat on the mat" in lines
    assert "" not in lines  # blank lines dropped


def test_read_count_table_gzip_tsv(spark, tmp_path):
    p = tmp_path / "counts.tsv.gz"
    with gzip.open(p, "wt") as f:
        f.write("the\t10\nthe cat\t3\ncat sat on\t1\n")
    got = {r["ngram"]: (r["cnt"], r["n"]) for r in read_count_table(spark, str(p)).collect()}
    assert got == {"the": (10, 1), "the cat": (3, 2), "cat sat on": (1, 3)}


def test_write_lm_counts_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("the", 1, 10), ("the cat", 2, 3), ("cat", 1, 4)], "ngram string, n int, cnt long"
    )
    out = str(tmp_path / "lm_counts")
    write_lm_counts(df, out)
    # partitioned by order -> partition-pruned lookups
    assert os.path.isdir(os.path.join(out, "n=1")) and os.path.isdir(os.path.join(out, "n=2"))
    back = spark.read.parquet(out)
    assert {(r["ngram"], r["n"], r["cnt"]) for r in back.collect()} == {
        ("the", 1, 10), ("the cat", 2, 3), ("cat", 1, 4)
    }


def test_score_files(spark, text_dir):
    from topicrawler_spark.lm.local import LocalLM
    from topicrawler_spark.lm.perplexity import DocumentScorer

    lm = LocalLM.from_texts(["the cat sat on the mat the dog sat too"], order=2)
    scorer = DocumentScorer(lm, "mle")
    bc = spark.sparkContext.broadcast(scorer)
    rows = {os.path.basename(r["file"]): r["perplexity"] for r in score_files(spark, text_dir, bc).collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    # the in-corpus file scores finite and lower than the OOV-heavy one
    assert rows["a.txt"] > 0
