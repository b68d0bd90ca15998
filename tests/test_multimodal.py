"""Multimodal tests: real dependency-free codecs (P6 PPM, PCM WAV) with
goldens, feature extraction (real for PPM/WAV, stub for compressed
formats), resize, dedup, chunk/frame plans, batching."""

import numpy as np

from deusu_spark import multimodal


def test_ppm_roundtrip_exact():
    img = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    payload = multimodal.encode_ppm(img)
    assert payload.startswith(b"P6\n7 5\n255\n")
    back = multimodal.decode_ppm(payload)
    assert back.shape == (5, 7, 3) and (back == img).all()
    # comment in header is tolerated
    commented = b"P6\n# gimp comment\n7 5\n255\n" + payload.split(b"255\n", 1)[1]
    assert (multimodal.decode_ppm(commented) == img).all()


def test_resize_nearest_golden():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[2:, 2:] = 200  # bottom-right quadrant bright
    small = multimodal.resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 3)
    assert small[0, 0, 0] == 0 and small[1, 1, 0] == 200
    big = multimodal.resize_nearest(img, 8, 8)
    assert big.shape == (8, 8, 3)
    assert (big[:4, :4] == 0).all() and (big[4:, 4:] == 200).all()


def test_wav_roundtrip_and_spectral_peak():
    rate = multimodal.WAV_RATE
    t = np.arange(rate, dtype=np.float64) / rate  # 1 s
    freq = 440.0
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    payload = multimodal.encode_wav(x.astype(np.float32), rate)
    assert payload[:4] == b"RIFF"
    back, r2 = multimodal.decode_wav(payload)
    assert r2 == rate and len(back) == rate
    assert np.abs(back - x).max() < 1e-3  # 16-bit quantization only
    # the FFT peak lands on the generated frequency
    mag = np.abs(np.fft.rfft(back))
    peak_hz = np.fft.rfftfreq(len(back), 1.0 / rate)[int(np.argmax(mag))]
    assert abs(peak_hz - freq) < 2.0
    # and the 12-band feature puts its energy in the right band
    feats = multimodal.audio_features(back, rate)
    band = int(freq / (rate / 2) * 12)
    assert int(np.argmax(feats[4:])) == band
    assert 0.3 < feats[0] < 0.4  # rms of a 0.5 sine ≈ 0.3536


def test_image_features_sensitivity():
    dark = np.zeros((8, 8, 3), dtype=np.uint8)
    bright = np.full((8, 8, 3), 250, dtype=np.uint8)
    fd = multimodal.image_features(dark)
    fb = multimodal.image_features(bright)
    assert len(fd) == multimodal.FEATURE_DIM == len(fb)
    assert fd[0] < 0.05 < 0.9 < fb[0]  # mean channel tracks content
    assert fd[4] > 0.9  # dark image: all luma in histogram bin 0
    assert fb[4 + 7] > 0.9  # bright image: top bin


def test_decode_dispatch_real_vs_stub():
    img_payload = multimodal._synth_image(3, 32, 32)
    wav_payload = multimodal._synth_audio(1, 1250)
    fake = b"\x00fakemp4" * 16
    fi = multimodal._decode_payload(img_payload)
    fa = multimodal._decode_payload(wav_payload)
    fs = multimodal._decode_payload(fake)
    # real decoders are content-derived: tweak one pixel/sample → feature
    # moves; the stub is hash-derived
    img2 = multimodal.decode_ppm(img_payload).copy()
    img2[:16] = 255
    fi2 = multimodal.image_features(img2)
    assert not np.allclose(fi, fi2)
    assert (fs == multimodal._stub_feature(fake)).all()
    for f in (fi, fa, fs):
        assert len(f) == multimodal.FEATURE_DIM
        assert ((f >= 0) & (f < 1.0)).all()


def test_resize_images_spark(spark):
    media = multimodal.synth_media(spark, n=9)
    out = multimodal.resize_images(media, 16, 16).collect()
    for r in out:
        if r["kind"] == "image":
            img = multimodal.decode_ppm(bytes(r["payload"]))
            assert img.shape == (16, 16, 3)
            assert r["width"] == 16 and r["height"] == 16
        else:
            assert bytes(r["payload"])[:2] != b"P6"


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


def _media_rows(spark, payloads: dict[int, bytes]):
    rows = [
        (mid, "image", "image/x-portable-pixmap", 0, 0, 0, bytearray(p))
        for mid, p in sorted(payloads.items())
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_dhash_perceptual_near_dup(spark):
    """Perceptual image dedup catches what exact sha256 dedup cannot:
    a nearest-upscaled copy and a mildly brightened copy hash close to
    their originals (the dHash is a neighbor-DIFFERENCE code, invariant
    to uniform luma shifts and integer-factor nearest resizes), while
    independent random images stay far. Candidate completeness for
    Hamming < DHASH_BANDS is pinned against a pure-Python brute force."""
    rng = np.random.default_rng(7)
    imgs = {
        i: rng.integers(0, 256, (40, 40, 3), dtype=np.uint8) for i in range(6)
    }
    payloads = {i: multimodal.encode_ppm(img) for i, img in imgs.items()}
    payloads[10] = multimodal.encode_ppm(
        multimodal.resize_nearest(imgs[0], 80, 80)
    )
    payloads[11] = multimodal.encode_ppm(
        np.clip(imgs[1].astype(np.int16) + 3, 0, 255).astype(np.uint8)
    )
    media = _media_rows(spark, payloads)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.image_near_dup_pairs(media).collect()
    }
    assert (0, 10) in got and got[(0, 10)] <= 3
    assert (1, 11) in got and got[(1, 11)] <= 3
    # no false pairs among the independent random images
    assert not any(a < 6 and b < 6 for (a, b) in got)
    # exact sha256 dedup does NOT see these as copies (distinct payloads)
    assert multimodal.dedup_media(media).count() == len(payloads)
    # pure-Python brute force: every pair under the pigeonhole-complete
    # radius (< DHASH_BANDS) must be a reported candidate, with the same
    # Hamming distance the SQL verify computed
    hashes = {
        mid: multimodal.dhash(multimodal.decode_ppm(p))
        for mid, p in payloads.items()
    }
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = sum(x != y for x, y in zip(hashes[a], hashes[b]))
            if ham < multimodal.DHASH_BANDS:
                assert got.get((a, b)) == ham, (a, b, ham)


def test_pvid_roundtrip_and_seek():
    frames = [
        np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3) + i
        for i in range(5)
    ]
    payload = multimodal.encode_pvid(frames, frame_ms=250)
    assert payload[:4] == multimodal.PVID_MAGIC
    back, frame_ms = multimodal.decode_pvid(payload)
    assert frame_ms == 250 and len(back) == 5
    for a, b in zip(frames, back):
        assert (a == b).all()
    # random-access seek decodes the same frames as the full decode
    for i in range(5):
        assert (multimodal.decode_pvid_frame(payload, i) == frames[i]).all()


def test_video_features_motion_and_dispatch():
    static = [np.full((16, 16, 3), 90, dtype=np.uint8)] * 8
    moving, frame_ms = multimodal.decode_pvid(
        multimodal._synth_video(2, 2000, 32, 32)
    )
    fs = multimodal.video_features(static, 250)
    fm = multimodal.video_features(moving, frame_ms)
    assert fs[3] == 0.0  # static: zero motion energy
    assert fm[3] > 0.0  # panning: positive motion energy
    for f in (fs, fm):
        assert len(f) == multimodal.FEATURE_DIM
        assert ((f >= 0) & (f < 1.0)).all()
    # dispatch: PVID payloads take the real video path, content-derived
    payload = multimodal.encode_pvid(moving, frame_ms)
    assert (multimodal._decode_payload(payload) == fm).all()
    edited = [f.copy() for f in moving]
    edited[0][:8] = 255
    f2 = multimodal.video_features(edited, frame_ms)
    assert not np.allclose(fm, f2)


def test_video_frame_dhashes_spark(spark):
    media = multimodal.synth_media(spark, n=24)
    rows = multimodal.video_frame_dhashes(media, every_ms=500).collect()
    pvids = {
        r["media_id"]: bytes(r["payload"])
        for r in media.where("kind = 'video'").collect()
        if bytes(r["payload"])[:4] == multimodal.PVID_MAGIC
    }
    assert pvids  # real videos exist (and at least one stub mp4 is skipped)
    assert {r["media_id"] for r in rows} == set(pvids)
    import struct as _s

    for mid, p in pvids.items():
        n_frames, frame_ms = _s.unpack_from("<II", p, 4)
        want = len(
            [ts for ts in range(0, n_frames * frame_ms, 500) if ts // frame_ms < n_frames]
        )
        got = [r for r in rows if r["media_id"] == mid]
        assert len(got) == want
        # each sampled hash matches a direct seek-decode of that frame
        for r in got[:2]:
            idx = r["frame_ts_ms"] // frame_ms
            assert r["dhash"] == multimodal.dhash(
                multimodal.decode_pvid_frame(p, idx)
            )


def test_video_near_dup_pairs(spark):
    # A = panning synth video; B = A trimmed by its first frame (the
    # clipped-excerpt case); C, D = independent videos
    a_frames, frame_ms = multimodal.decode_pvid(
        multimodal._synth_video(0, 3000, 32, 32)
    )
    payloads = {
        0: multimodal.encode_pvid(a_frames, frame_ms),
        1: multimodal.encode_pvid(a_frames[1:], frame_ms),
        2: multimodal._synth_video(9, 3000, 32, 32),
        3: multimodal._synth_video(13, 2500, 48, 32),
    }
    rows = [
        (mid, "video", "video/x-pvid", 32, 32, 3000, bytearray(p))
        for mid, p in payloads.items()
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    got = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in multimodal.video_near_dup_pairs(
            media, every_ms=250, min_overlap=0.5
        ).collect()
    }
    assert (0, 1) in got and got[(0, 1)] >= 0.9  # excerpt contained
    assert not any({a, b} & {2, 3} for (a, b) in got)  # independents clean
