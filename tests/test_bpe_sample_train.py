"""Sample-then-train BPE recipe (bpe_train's production shape): merges
learned on a deterministic doc_id-hash sample must equal the full-corpus
merge table when the sample is representative — merge ranks depend only on
pair-count RATIOS, so uniformly scaled counts give identical rules and the
(one-pass, corpus-sized) encode stage can apply sample-trained merges at
full scale.
"""

import pandas as pd
import pytest

from deusu_spark import pipelines


@pytest.fixture(scope="module")
def corpus(spark):
    # 16 docs, every doc the same multiset of words (order varies): ANY
    # nonempty hash sample scales all pair counts by the same factor, so
    # merge argmax order and tie-breaks (pair asc at equal count) match.
    words = ["lower", "lowest", "newer", "newest", "wider", "low", "new"]
    rows = []
    for i in range(16):
        rot = words[i % len(words):] + words[: i % len(words)]
        rows.append((i, " ".join(rot)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf)


def _rules(df):
    return [(r["rank"], r["lhs"], r["rhs"]) for r in df.collect()]


def test_sample_trained_merges_equal_full(spark, corpus):
    full = _rules(pipelines.bpe_train(spark, corpus, n_merges=6))
    sampled = _rules(
        pipelines.bpe_train(spark, corpus, n_merges=6, sample_mod=3)
    )
    assert len(full) == 6
    assert sampled == full


def test_sample_trained_vocab_segments_identically(spark, corpus):
    _, vfull = pipelines._bpe_train_vocab(spark, corpus, 6)
    _, vsamp = pipelines._bpe_train_vocab(spark, corpus, 6, sample_mod=3)
    seg_full = {r["t"]: r["w"] for r in vfull.collect()}
    seg_samp = {r["t"]: r["w"] for r in vsamp.collect()}
    # the sample's vocabulary covers the full word set here (every doc
    # holds every word), and each word segments the same way
    assert seg_samp == seg_full


def test_sample_mod_actually_samples(spark, corpus):
    from pyspark.sql import functions as F

    kept = corpus.where(
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(3)) == 0
    ).count()
    assert 0 < kept < 16
