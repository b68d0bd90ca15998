"""SimHash banded Hamming candidate join: recall against planted
near-duplicates (the n-gram-Jaccard ground truth by construction) plus the
pigeonhole band guarantee. The Spark-vs-DuckDB value identity of the same
operator is covered by the driver gate (simhash_near_dup_pairs oracle)."""

import random

import pytest

from deusu_spark.pipelines import (
    SIMHASH_MAX_HAMMING,
    simhash_df,
    simhash_near_dup_pairs,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    """25 base docs of 60 distinct words from a 2000-word vocab (near-zero
    cross-doc Jaccard), plus 10 near-dup copies with 3 of 60 words replaced
    (Jaccard ≈ 0.9) — planted ground-truth pairs (base_id, 100+base_id)."""
    rng = random.Random(42)
    vocab = [f"w{i:04d}" for i in range(2000)]
    rows = []
    planted = []
    for d in range(25):
        words = rng.sample(vocab, 60)
        rows.append((d, " ".join(words)))
        if d < 10:
            dup = list(words)
            for j in rng.sample(range(60), 3):
                dup[j] = f"x{d:02d}{j:02d}"
            rows.append((100 + d, " ".join(dup)))
            planted.append((d, 100 + d))
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    return df, planted


def test_simhash_near_dup_recall(spark, dup_docs):
    df, planted = dup_docs
    got = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_pairs(spark, df).collect()
    }
    recall = sum(1 for p in planted if p in got) / len(planted)
    assert recall >= 0.7, f"recall={recall}, got={sorted(got)}"


def test_simhash_separates_planted_from_random(spark, dup_docs):
    """Planted near-dup pairs must sit far below random pairs in Hamming
    distance — the signal the banded join thresholds on."""
    df, planted = dup_docs
    sh = {r["doc_id"]: r["simhash"] for r in simhash_df(spark, df).collect()}

    def ham(a, b):
        return sum(1 for x, y in zip(sh[a], sh[b]) if x != y)

    planted_mean = sum(ham(a, b) for a, b in planted) / len(planted)
    rand_pairs = [(a, b) for a in range(10) for b in range(10, 25)]
    rand_mean = sum(ham(a, b) for a, b in rand_pairs) / len(rand_pairs)
    assert planted_mean <= SIMHASH_MAX_HAMMING < rand_mean, (
        planted_mean,
        rand_mean,
    )


def test_band_match_implies_candidate(spark, dup_docs):
    """Pigeonhole: any pair with Hamming distance < SIMHASH_BANDS shares a
    whole band, so the banded join can never miss it. Verify on the actual
    candidate set: every fingerprint pair within the verify threshold that
    shares a band is in the output."""
    df, planted = dup_docs
    sh = {r["doc_id"]: r["simhash"] for r in simhash_df(spark, df).collect()}
    got = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_pairs(spark, df).collect()
    }
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = sum(1 for x, y in zip(sh[a], sh[b]) if x != y)
            shares_band = any(
                sh[a][8 * k : 8 * k + 8] == sh[b][8 * k : 8 * k + 8]
                for k in range(4)
            )
            if d <= SIMHASH_MAX_HAMMING and shares_band:
                assert (a, b) in got, (a, b, d)
            if d < 4:
                # pigeonhole: <4 flipped bits cannot touch all 4 bands
                assert shares_band and (a, b) in got, (a, b, d)
