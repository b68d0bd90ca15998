"""Resume + determinism invariants (FIXTURES.md invariant #4):
  - same seed ⇒ byte-identical index blobs across independent builds
  - resuming an interrupted build yields exactly the fresh-build output
"""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from deusu_spark import synth
from deusu_spark.build import build_index, current_index_dir


def _build(spark, dest, corpus, **kw):
    sdf = spark.createDataFrame(corpus)
    return build_index(
        spark, sdf, dest, fancy_threshold=100, seg_size=128, n_salts=2,
        bucket_groups=2, **kw,
    )


def _index_fingerprint(spark, root):
    v = current_index_dir(root)
    segs = (
        spark.read.parquet(f"{v}/postings")
        .select("bucket", "term", "kind", "first_doc", "n", F.md5(F.hex("blob")).alias("h"))
        .orderBy("bucket", "term", "kind", "first_doc")
        .collect()
    )
    lex = (
        spark.read.parquet(f"{v}/lexicon")
        .orderBy("bucket", "term")
        .collect()
    )
    return [tuple(r) for r in segs], [tuple(r) for r in lex]


@pytest.fixture(scope="module")
def small_corpus():
    return synth.gen_transcripts(50)


def test_rebuild_is_byte_identical(spark, small_corpus):
    d1, d2 = tempfile.mkdtemp(prefix="det1_"), tempfile.mkdtemp(prefix="det2_")
    try:
        _build(spark, d1, small_corpus)
        _build(spark, d2, small_corpus)
        assert _index_fingerprint(spark, d1) == _index_fingerprint(spark, d2)
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def test_fused_equals_staged_ranking(spark, small_corpus):
    """The fused (scatterless) and staged layouts may cut segments at
    different boundaries (staged runs can split on scatter-file row-group
    edges), but lexicon content and every per-(term, kind) posting stream
    must be identical — verified by decoding both indexes' full segments
    back to (doc, flag) streams."""
    import numpy as np

    from deusu_spark import codec

    d1, d2 = tempfile.mkdtemp(prefix="fus_"), tempfile.mkdtemp(prefix="stg_")
    try:
        _build(spark, d1, small_corpus, fuse_scatter=True)
        _build(spark, d2, small_corpus, fuse_scatter=False)

        def postings_by_term(root):
            v = current_index_dir(root)
            rows = (
                spark.read.parquet(f"{v}/postings")
                .select("term", "kind", "first_doc", "blob")
                .orderBy("term", "kind", "first_doc")
                .collect()
            )
            out = {}
            for r in rows:
                docs, flags = codec.decode(bytes(r["blob"]))
                key = (r["term"], r["kind"])
                acc = out.setdefault(key, ([], []))
                acc[0].extend(np.asarray(docs).tolist())
                acc[1].extend(np.asarray(flags).tolist())
            return out

        lex1 = _index_fingerprint(spark, d1)[1]
        lex2 = _index_fingerprint(spark, d2)[1]
        assert lex1 == lex2
        assert postings_by_term(d1) == postings_by_term(d2)
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def test_fused_resume_after_interrupt_equals_fresh(spark, small_corpus):
    """Crash a fused build between the lexicon and segment steps: the resume
    must keep the fused layout, redo only segments+publish, and reproduce
    the fresh build exactly."""
    d1, d2 = tempfile.mkdtemp(prefix="fres1_"), tempfile.mkdtemp(prefix="fres2_")
    try:
        _build(spark, d1, small_corpus)
        _build(spark, d2, small_corpus)
        v = current_index_dir(d2)
        os.remove(os.path.join(d2, "CURRENT"))
        lineage = os.path.join(v, "_lineage.jsonl")
        keep = [
            line
            for line in open(lineage)
            if json.loads(line)["step"] not in ("segments_fused", "publish")
        ]
        with open(lineage, "w") as f:
            f.writelines(keep)
        shutil.rmtree(os.path.join(v, "postings"), ignore_errors=True)
        os.remove(os.path.join(v, "meta.json"))

        m = _build(spark, d2, small_corpus)
        assert m["version"] == os.path.basename(v)
        with open(lineage) as f:
            steps = [json.loads(line)["step"] for line in f]
        assert steps.count("lexicon") == 1  # lexicon was NOT redone
        assert _index_fingerprint(spark, d1) == _index_fingerprint(spark, d2)
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def test_resume_after_interrupt_equals_fresh(spark, small_corpus):
    d1, d2 = tempfile.mkdtemp(prefix="res1_"), tempfile.mkdtemp(prefix="res2_")
    try:
        _build(spark, d1, small_corpus, fuse_scatter=False)

        _build(spark, d2, small_corpus, fuse_scatter=False)
        # simulate a crash after segments_g0: drop the publish + segments_g1
        # lineage records and the g1 outputs, remove the CURRENT pointer
        v = current_index_dir(d2)
        os.remove(os.path.join(d2, "CURRENT"))
        lineage = os.path.join(v, "_lineage.jsonl")
        keep = []
        dropped_buckets = []
        for line in open(lineage):
            rec = json.loads(line)
            if rec["step"] in ("segments_g1", "publish"):
                if rec["step"] == "segments_g1":
                    dropped_buckets = rec["buckets"]
                continue
            keep.append(line)
        with open(lineage, "w") as f:
            f.writelines(keep)
        for b in dropped_buckets:
            shutil.rmtree(os.path.join(v, "postings", f"bucket={b}"), ignore_errors=True)
            shutil.rmtree(os.path.join(v, "lexicon", f"bucket={b}"), ignore_errors=True)
        os.remove(os.path.join(v, "meta.json"))

        # resume: must reuse the unpublished version dir, redo only g1+publish
        m = _build(spark, d2, small_corpus)
        assert m["version"] == os.path.basename(v)
        assert _index_fingerprint(spark, d1) == _index_fingerprint(spark, d2)
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)
