"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

Decode status (this container has no media libraries — PIL/librosa/av):
  - REAL decoders, dependency-free, one per modality: P6 PPM images
    (numpy header parse + raw RGB), RIFF/WAV PCM audio (stdlib ``wave``
    + numpy), and PVID raw video (length-prefixed P6 frames + frame
    interval — the uncompressed-MJPEG shape). Features, resize, spectral
    analysis, frame sampling and frame-fingerprint near-dup over these
    are genuine computation, golden-tested (tests/test_multimodal.py).
  - STUB only for compressed codecs (PNG/JPEG/MP4): `_stub_feature`
    produces a deterministic sha256-derived vector so the Spark-side
    plumbing — schema, batching, partitioning, UDF signatures — still
    exercises end to end. Swap in PIL/av in production; nothing else
    changes.
"""

from __future__ import annotations

import hashlib
import io
import re
import struct
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),  # 16-dim
    ]
)

FEATURE_DIM = 16
WAV_RATE = 8000


# --------------------------------------------------------------------------
# real codecs (dependency-free formats)
# --------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6 PPM."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM → (h, w, 3) uint8. Pure numpy — a real decoder for
    the one image format that needs no codec library."""
    m = re.match(rb"P6\s+(?:#[^\n]*\s+)?(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("not a P6 PPM payload")
    w, h, maxval = (int(m.group(i)) for i in (1, 2, 3))
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    data = payload[m.end() : m.end() + w * h * 3]
    if len(data) < w * h * 3:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """float32 [-1, 1] mono → 16-bit PCM WAV bytes (stdlib wave)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV 16-bit PCM → (float32 samples in [-1, 1], sample rate).
    Multi-channel input is averaged to mono."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_ch, sw, rate = wf.getnchannels(), wf.getsampwidth(), wf.getframerate()
        if sw != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        raw = wf.readframes(wf.getnframes())
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


PVID_MAGIC = b"PVID"


def encode_pvid(frames: list[np.ndarray], frame_ms: int) -> bytes:
    """Frames ((h, w, 3) uint8 each) → PVID raw-video container:
    b'PVID' + <II>(n_frames, frame_ms) + per-frame <I>len + P6 PPM body.
    The dependency-free video format (uncompressed-MJPEG shape): every
    frame is independently decodable, so frame sampling seeks without
    touching the frames in between."""
    parts = [PVID_MAGIC, struct.pack("<II", len(frames), frame_ms)]
    for fr in frames:
        ppm = encode_ppm(fr)
        parts.append(struct.pack("<I", len(ppm)))
        parts.append(ppm)
    return b"".join(parts)


def decode_pvid(payload: bytes) -> tuple[list[np.ndarray], int]:
    """PVID container → (list of (h, w, 3) uint8 frames, frame_ms)."""
    if payload[:4] != PVID_MAGIC:
        raise ValueError("not a PVID payload")
    n_frames, frame_ms = struct.unpack_from("<II", payload, 4)
    off, frames = 12, []
    for _ in range(n_frames):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        frames.append(decode_ppm(payload[off : off + ln]))
        off += ln
    return frames, frame_ms


def decode_pvid_frame(payload: bytes, idx: int) -> np.ndarray:
    """Seek-decode ONE frame of a PVID payload (skips other frame bodies
    via their length prefixes — the random access frame sampling needs)."""
    if payload[:4] != PVID_MAGIC:
        raise ValueError("not a PVID payload")
    n_frames, _ = struct.unpack_from("<II", payload, 4)
    if not 0 <= idx < n_frames:
        raise IndexError(f"frame {idx} of {n_frames}")
    off = 12
    for _ in range(idx):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4 + ln
    (ln,) = struct.unpack_from("<I", payload, off)
    return decode_ppm(payload[off + 4 : off + 4 + ln])


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index maps — the real resize op."""
    h, w, _ = img.shape
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


# --------------------------------------------------------------------------
# real feature extractors (16-dim, values in [0, 1))
# --------------------------------------------------------------------------

_EPS_TOP = np.float32(1.0 - 1e-6)


def image_features(img: np.ndarray) -> np.ndarray:
    """[mean_r, mean_g, mean_b, aspect] + 8-bin luma histogram fractions
    + 4 quadrant luma means — a deterministic, content-sensitive image
    descriptor (the shape a model-embedding stage would slot into)."""
    h, w, _ = img.shape
    f = img.astype(np.float32)
    means = f.reshape(-1, 3).mean(axis=0) / 256.0
    luma = f @ np.asarray([0.299, 0.587, 0.114], dtype=np.float32)
    hist = np.histogram(luma, bins=8, range=(0.0, 256.0))[0]
    hist = hist.astype(np.float32) / max(luma.size, 1)
    hh, wh = max(h // 2, 1), max(w // 2, 1)
    quads = np.asarray(
        [
            luma[:hh, :wh].mean(),
            luma[:hh, wh:].mean() if w > 1 else 0.0,
            luma[hh:, :wh].mean() if h > 1 else 0.0,
            luma[hh:, wh:].mean() if h > 1 and w > 1 else 0.0,
        ],
        dtype=np.float32,
    ) / 256.0
    out = np.concatenate(
        [means, [w / (w + h)], hist, quads]
    ).astype(np.float32)
    return np.minimum(out, _EPS_TOP)


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """[rms, zero-crossing rate, spectral centroid (normalized to
    Nyquist), duration (min/60s)] + 12 spectral band energy fractions
    (rfft magnitude, linear bands) — classic cheap audio descriptors."""
    n = len(samples)
    if n == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    rms = float(np.sqrt(np.mean(samples**2)))
    zcr = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
    mag = np.abs(np.fft.rfft(samples))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    tot = float(mag.sum())
    centroid = float((freqs * mag).sum() / tot / (rate / 2)) if tot > 0 else 0.0
    dur = min(n / rate / 60.0, 0.999)
    bands = np.zeros(12, dtype=np.float32)
    if tot > 0:
        idx = np.minimum((freqs / (rate / 2) * 12).astype(np.int64), 11)
        np.add.at(bands, idx, mag.astype(np.float32))
        bands /= np.float32(tot)
    out = np.concatenate([[rms, zcr, centroid, dur], bands]).astype(np.float32)
    return np.minimum(out, _EPS_TOP)


def video_features(frames: list[np.ndarray], frame_ms: int) -> np.ndarray:
    """[n_frames (/256), duration (min/60s), mean luma, motion energy
    (mean abs luma diff between consecutive frames, /256)] + a 12-slice
    temporal luma profile — a content- AND motion-sensitive descriptor
    (static vs moving video separate on dim 3; scene order on the
    profile)."""
    if not frames:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    lumas = np.asarray(
        [
            (f.astype(np.float32) @ np.asarray([0.299, 0.587, 0.114], np.float32)).mean()
            for f in frames
        ],
        dtype=np.float32,
    )
    motion = 0.0
    if len(frames) > 1:
        diffs = [
            np.abs(
                frames[i].astype(np.float32) - frames[i - 1].astype(np.float32)
            ).mean()
            for i in range(1, len(frames))
        ]
        motion = float(np.mean(diffs))
    dur = min(len(frames) * frame_ms / 1000.0 / 60.0, 0.999)
    # 12 equal time slices of the per-frame luma curve
    idx = np.minimum(
        (np.arange(len(lumas)) * 12) // max(len(lumas), 1), 11
    ).astype(np.int64)
    prof = np.zeros(12, dtype=np.float32)
    cnt = np.zeros(12, dtype=np.float32)
    np.add.at(prof, idx, lumas)
    np.add.at(cnt, idx, 1.0)
    prof = np.where(cnt > 0, prof / np.maximum(cnt, 1.0), 0.0) / 256.0
    out = np.concatenate(
        [
            [min(len(frames) / 256.0, 0.999), dur, lumas.mean() / 256.0, motion / 256.0],
            prof,
        ]
    ).astype(np.float32)
    return np.minimum(out, _EPS_TOP)


DHASH_BITS = 64
DHASH_BANDS = 4
DHASH_BAND_BITS = DHASH_BITS // DHASH_BANDS
DHASH_MAX_HAMMING = 10


def dhash(img: np.ndarray) -> str:
    """64-bit difference hash (dHash): luma-resize to a 9×8 grid, one bit
    per horizontal neighbor comparison. Robust to resizing, re-encoding
    and mild noise — the PERCEPTUAL image fingerprint (the image analog
    of the text simhash; exact sha256 dedup misses re-encoded copies).
    Returned as a '0'/'1' bit string so the banded join and the Hamming
    verify reuse the simhash machinery verbatim."""
    luma = img.astype(np.float32) @ np.asarray(
        [0.299, 0.587, 0.114], dtype=np.float32
    )
    h, w = luma.shape
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(9) * w) // 9
    grid = luma[rows][:, cols]
    bits = (grid[:, 1:] > grid[:, :-1]).astype(np.uint8).reshape(-1)
    return "".join("1" if b else "0" for b in bits)


def _stub_feature(payload: bytes) -> np.ndarray:
    """STUB for compressed formats (PNG/JPEG/MP4 — codec libs absent in
    this container): deterministic 16-dim sha256-derived vector keeps the
    downstream plumbing testable. Replace with a real decode + model
    feature extraction in production."""
    h = hashlib.sha256(payload).digest()
    vals = struct.unpack(">16H", h)
    return np.asarray(vals, dtype=np.float32) / 65536.0


def _decode_payload(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes: real decode for PPM/WAV/PVID, stub for
    compressed codecs."""
    if payload[:2] == b"P6":
        return image_features(decode_ppm(payload))
    if payload[:4] == b"RIFF":
        samples, rate = decode_wav(payload)
        return audio_features(samples, rate)
    if payload[:4] == PVID_MAGIC:
        return video_features(*decode_pvid(payload))
    return _stub_feature(payload)


# --------------------------------------------------------------------------
# deterministic synthetic media
# --------------------------------------------------------------------------


def _synth_image(i: int, w: int, h: int) -> bytes:
    """Deterministic gradient + phase pattern — every image distinct."""
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (x * 3 + y * 5 + i * 7) % 256,
            (x + y * 2 + i * 13) % 256,
            (x * 2 + y + i * 11) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    return encode_ppm(img)


def _synth_audio(i: int, duration_ms: int) -> bytes:
    """Deterministic sine at 200 + 50·i Hz — the spectral-peak golden."""
    n = max(int(WAV_RATE * duration_ms / 1000), 64)
    t = np.arange(n, dtype=np.float64) / WAV_RATE
    freq = 200.0 + 50.0 * i
    return encode_wav(0.6 * np.sin(2 * np.pi * freq * t))


def _synth_video(i: int, duration_ms: int, w: int, h: int) -> bytes:
    """Deterministic PVID: the i-th gradient image panning 2 px right per
    frame (np.roll) at 4 fps — consecutive frames correlate (real motion
    energy), distinct i → distinct content."""
    frame_ms = 250
    n_frames = max(duration_ms // frame_ms, 2)
    base = decode_ppm(_synth_image(i, w, h))
    frames = [np.roll(base, 2 * f, axis=1) for f in range(n_frames)]
    return encode_pvid(frames, frame_ms)


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table: REAL P6 images, REAL PCM WAVs and REAL
    PVID videos (the dependency-free formats); every 4th video keeps fake
    mp4 bytes so the compressed-codec stub path stays exercised."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w = 32 + (i % 8) * 16 if kind != "audio" else 0
        h = 32 + (i % 5) * 16 if kind != "audio" else 0
        dur = 0 if kind == "image" else 1000 + i * 250
        mime = {
            "image": "image/x-portable-pixmap",
            "audio": "audio/wav",
            "video": "video/x-pvid",
        }[kind]
        if kind == "image":
            payload = _synth_image(i, w, h)
        elif kind == "audio":
            payload = _synth_audio(i, dur)
        elif (i // 3) % 4 == 3:  # stub-path coverage: fake compressed video
            hh = hashlib.sha256(f"media{seed}:{i}".encode()).digest()
            payload = (hh * ((64 + i) // len(hh) + 1))[: 64 + i]
            mime = "video/mp4"
        else:
            payload = _synth_video(i, dur, w, h)
        rows.append((i, kind, mime, w, h, dur, bytearray(payload)))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


# --------------------------------------------------------------------------
# Spark operators
# --------------------------------------------------------------------------


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, vectorized numpy
    body, bounded batch memory (payloads stream per batch, never collected).
    Partition by media_id ranges upstream for even payload-bytes per task."""

    def fn(iterator):
        for pdf in iterator:
            feats = [_decode_payload(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Real image resize through the same Arrow plumbing: PPM payloads
    decode → nearest-neighbor resize → re-encode; non-PPM rows pass
    through unchanged (their resize would live behind the codec stub)."""

    def fn(iterator):
        for pdf in iterator:
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                if b[:2] == b"P6":
                    out.append(
                        bytearray(
                            encode_ppm(resize_nearest(decode_ppm(b), out_h, out_w))
                        )
                    )
                else:
                    out.append(bytearray(b))
            pdf = pdf.copy()
            pdf["payload"] = out
            pdf["width"] = [
                out_w if bytes(p)[:2] == b"P6" else w
                for p, w in zip(pdf["payload"], pdf["width"])
            ]
            pdf["height"] = [
                out_h if bytes(p)[:2] == b"P6" else h
                for p, h in zip(pdf["payload"], pdf["height"])
            ]
            yield pdf

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)


def dedup_media(media: DataFrame) -> DataFrame:
    """Exact media dedup: group by payload content hash — the binary-column
    member of the dedup family (same single-hash-groupBy shape as the text
    dedup; scales with no all-pairs work). Returns one row per distinct
    payload with the representative (min) media_id and the duplicate
    count."""
    hashed = media.select(
        "media_id", "kind", F.sha2("payload", 256).alias("payload_sha256")
    )
    return (
        hashed.groupBy("payload_sha256")
        .agg(
            F.min("media_id").alias("keep_media_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("keep_media_id")
    )


def image_dhash_df(media: DataFrame) -> DataFrame:
    """(media_id, dhash bit-string) for every decodable image — the
    fingerprint stage of the perceptual near-dup join (Arrow-batched,
    decode stays inside the task)."""

    def fn(iterator):
        for pdf in iterator:
            ids, hs = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                if b[:2] == b"P6":
                    ids.append(mid)
                    hs.append(dhash(decode_ppm(b)))
            yield pd.DataFrame({"media_id": ids, "dhash": hs})

    return media.where(F.col("kind") == "image").mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("dhash", T.StringType()),
            ]
        ),
    )


def image_near_dup_pairs(
    media: DataFrame, max_hamming: int = DHASH_MAX_HAMMING
) -> DataFrame:
    """Perceptual image near-dup candidates: banded Hamming join over the
    64-bit dHash — 4 bands of 16 bits, a pair is a candidate iff it agrees
    on at least one whole band (complete for Hamming < DHASH_BANDS by
    pigeonhole; the standard recall/cost trade beyond), then exact Hamming
    verify ≤ max_hamming. Same shape as the text simhash near-dup join:
    a hash join on the band key, no all-pairs work — the member of the
    dedup family that catches re-encoded / resized / lightly-edited
    copies that exact payload-sha256 dedup (dedup_media) misses."""
    from .pipelines import simhash_hamming_sql

    s = image_dhash_df(media)
    bands = s.select(
        "media_id",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"b{b}:"),
                        F.substring(
                            "dhash", 1 + b * DHASH_BAND_BITS, DHASH_BAND_BITS
                        ),
                    )
                    for b in range(DHASH_BANDS)
                ]
            )
        ).alias("band"),
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), "band")
        .where(F.col("x.media_id") < F.col("y.media_id"))
        .select(
            F.col("x.media_id").alias("id_a"), F.col("y.media_id").alias("id_b")
        )
        .distinct()
    )
    sa = s.select(F.col("media_id").alias("id_a"), F.col("dhash").alias("ha"))
    sb = s.select(F.col("media_id").alias("id_b"), F.col("dhash").alias("hb"))
    ham = F.expr(simhash_hamming_sql("ha", "hb", DHASH_BITS)).cast("int")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio chunking *plan*: one row per chunk to decode
    (media_id, chunk_start_ms, chunk_end_ms) — pure column ops; the decode
    runs in a downstream mapInPandas like extract_features."""
    a = media.where((F.col("kind") == "audio") & (F.col("duration_ms") > 0))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(chunk_ms)
    )
    return a.select(
        "media_id",
        F.explode(starts).alias("chunk_start_ms"),
        "duration_ms",
    ).select(
        "media_id",
        "chunk_start_ms",
        F.least(
            F.col("chunk_start_ms") + chunk_ms, F.col("duration_ms")
        ).alias("chunk_end_ms"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode
    (media_id, frame_ts_ms) — pure column ops (sequence + explode), the
    decode itself would run in a downstream mapInPandas like
    extract_features."""
    v = media.where(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def video_frame_dhashes(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """EXECUTED frame sampling: for each PVID video, seek-decode one frame
    every `every_ms` and emit its 64-bit perceptual dHash —
    (media_id, frame_ts_ms, dhash). Arrow-batched mapInPandas; the
    length-prefixed container makes each sample a seek, not a full decode.
    Non-PVID (compressed-codec) videos are skipped — their sampling plan
    is frame_sample_plan and the decode lives behind the codec stub."""

    def fn(iterator):
        for pdf in iterator:
            ids, tss, hs = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                if b[:4] != PVID_MAGIC:
                    continue
                n_frames, frame_ms = struct.unpack_from("<II", b, 4)
                ts = 0
                while True:
                    idx = ts // frame_ms
                    if idx >= n_frames:
                        break
                    ids.append(mid)
                    tss.append(ts)
                    hs.append(dhash(decode_pvid_frame(b, idx)))
                    ts += every_ms
            yield pd.DataFrame(
                {"media_id": ids, "frame_ts_ms": tss, "dhash": hs}
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("frame_ts_ms", T.IntegerType()),
                T.StructField("dhash", T.StringType()),
            ]
        ),
    )


def video_near_dup_pairs(
    media: DataFrame,
    every_ms: int = 500,
    min_overlap: float = 0.5,
    max_frame_df: int = 16,
) -> DataFrame:
    """Video near-dup candidates by shared perceptual frame fingerprints:
    sample frames, dHash each, equi-join videos on identical frame hashes
    (dHash absorbs re-encode/uniform-brightness/resize-to-grid edits),
    count distinct shared hashes per pair, keep pairs whose overlap
    ≥ min_overlap of the SMALLER video's distinct-hash set — containment,
    so a clipped excerpt still matches its source. Frame hashes seen in
    more than max_frame_df videos are dropped before the join (black
    frames / boilerplate intros — the hot-shingle prune of the text dedup
    family, keeping the join skew-free at corpus scale). No all-pairs
    work anywhere: one mapInPandas, one equi-join, two bounded aggs."""
    s = video_frame_dhashes(media, every_ms=every_ms).select(
        "media_id", "dhash"
    ).distinct()
    hot = s.groupBy("dhash").agg(F.count("*").alias("fdf"))
    s = (
        s.join(F.broadcast(hot.where(F.col("fdf") > max_frame_df)), "dhash", "left_anti")
    )
    nf = s.groupBy("media_id").agg(F.count("*").alias("n_hashes"))
    pairs = (
        s.alias("x")
        .join(s.alias("y"), "dhash")
        .where(F.col("x.media_id") < F.col("y.media_id"))
        .groupBy(
            F.col("x.media_id").alias("id_a"),
            F.col("y.media_id").alias("id_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    na = nf.select(F.col("media_id").alias("id_a"), F.col("n_hashes").alias("n_a"))
    nb = nf.select(F.col("media_id").alias("id_b"), F.col("n_hashes").alias("n_b"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "overlap", F.col("shared") / F.least("n_a", "n_b")
        )
        .where(F.col("overlap") >= min_overlap)
        .select("id_a", "id_b", "shared", "overlap")
        .orderBy("id_a", "id_b")
    )
