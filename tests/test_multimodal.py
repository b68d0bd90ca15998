"""Multimodal plumbing tests: schema, deterministic stub decode, batching."""

from deusu_spark import multimodal


def test_feature_extraction_roundtrip(spark):
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.extract_features(media).orderBy("media_id").collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r["feature"])
        assert r["n_bytes"] >= 64
    # determinism: same payload → same feature
    again = multimodal.extract_features(media).orderBy("media_id").collect()
    assert [r["feature"] for r in again] == [r["feature"] for r in feats]


def test_frame_sample_plan(spark):
    media = multimodal.synth_media(spark, n=12)
    plan = multimodal.frame_sample_plan(media, every_ms=500)
    rows = plan.collect()
    vids = {r["media_id"] for r in rows}
    assert vids  # some videos exist
    for r in rows:
        assert r["frame_ts_ms"] % 500 == 0


def test_dedup_media_exact(spark):
    from pyspark.sql import functions as F

    media = multimodal.synth_media(spark, n=20)
    # duplicate payloads under new ids: 100+i carries i's payload
    dup = media.where(F.col("media_id") < 5).withColumn(
        "media_id", F.col("media_id") + 100
    )
    out = {
        r["keep_media_id"]: r["n_copies"]
        for r in multimodal.dedup_media(media.unionByName(dup)).collect()
    }
    assert len(out) == 20  # 20 distinct payloads
    for i in range(5):
        assert out[i] == 2  # originals keep the min id, copies counted
    for i in range(5, 20):
        assert out[i] == 1


def test_audio_chunk_plan(spark):
    media = multimodal.synth_media(spark, n=12)
    rows = multimodal.audio_chunk_plan(media, chunk_ms=700).collect()
    assert rows
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(
            (r["chunk_start_ms"], r["chunk_end_ms"])
        )
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.where("kind = 'audio'").collect()
    }
    for mid, chunks in by_media.items():
        chunks.sort()
        assert chunks[0][0] == 0
        assert chunks[-1][1] == durations[mid]  # full coverage
        for (s, e), (s2, _) in zip(chunks, chunks[1:]):
            assert e == s2 and e - s == 700  # contiguous, bounded
