"""Incremental index maintenance: append a batch of NEW conversations to a
published index as a new atomically-swapped version — the Spark rebuild of
the reference's crawl-increment → re-index → dual-path swap loop
(deusu.sh:3-9 + GenDb + ready2.dat, searchservernew.dpr:1636-1695), except
only the delta is processed.

Design:
  - new docs get doc_ids starting at old n_docs (append order): identical to
    a full rebuild whenever new conv_ids sort after existing ones (the
    normal case for time-ordered conversation ids)
  - delta posting segments are self-contained and doc-range-disjoint from
    old ones (delta doc_ids > all old doc_ids), so old segment files are
    reused verbatim (hard links) and only delta files are written
  - lexicon is recomputed from segment METADATA (rows ∝ segments) — cheap
  - meta.max_backlinks = max(old, delta): the backlink value curve is
    computed query-side from meta, so a growing max applies to all docs,
    exactly like a full rebuild; stored block-max bounds stay valid upper
    bounds because blv is non-increasing in max_backlinks
  - publish = CURRENT pointer swap; readers never see a partial index

Structured Streaming hook: stream_transcripts() runs this per micro-batch
via foreachBatch.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import build as buildmod
from .build import Lineage, _pending_version, current_index_dir


def _link_tree(src: str, dst: str) -> None:
    """Hard-link every file of src into dst (same directory layout) —
    zero-copy reuse of immutable parquet files across index versions."""
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        troot = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(troot, exist_ok=True)
        for f in files:
            s, t = os.path.join(root, f), os.path.join(troot, f)
            if not os.path.exists(t):
                os.link(s, t)


def incremental_update(
    spark: SparkSession,
    out_dir: str,
    new_transcripts: DataFrame,
    **build_kwargs,
) -> dict:
    """Append new conversations to the CURRENT index; returns delta metrics."""
    old_vdir = current_index_dir(out_dir)
    with open(os.path.join(old_vdir, "meta.json")) as f:
        old_meta = json.load(f)

    # build the delta into a scratch index with doc_ids offset by old n_docs
    version = _pending_version(out_dir)
    vdir = os.path.join(out_dir, version)
    delta_dir = os.path.join(vdir, "_delta")
    os.makedirs(delta_dir, exist_ok=True)
    t_start = time.time()
    metrics = buildmod.build_index(
        spark,
        new_transcripts,
        delta_dir,
        doc_id_offset=old_meta["n_docs"],
        fancy_threshold=build_kwargs.pop(
            "fancy_threshold", old_meta["fancy_threshold"]
        ),
        seg_size=build_kwargs.pop("seg_size", old_meta["seg_size"]),
        **build_kwargs,
    )
    delta_vdir = current_index_dir(delta_dir)

    # merge: link old + delta files side by side
    for sub in ("postings", "docmeta"):
        _link_tree(os.path.join(old_vdir, sub), os.path.join(vdir, sub))
        _link_tree(os.path.join(delta_vdir, sub), os.path.join(vdir, sub))
    # logical deletions survive appends: carry the tombstone set forward
    # (a full rebuild from a corpus without the deleted conversations is
    # what finally clears them, like the reference's periodic GenDb run)
    if os.path.isdir(os.path.join(old_vdir, "tombstones")):
        _link_tree(
            os.path.join(old_vdir, "tombstones"),
            os.path.join(vdir, "tombstones"),
        )

    # recompute lexicon from merged segment metadata (no posting decode)
    lex = (
        spark.read.parquet(os.path.join(vdir, "postings"))
        .where(F.col("kind") == "full")
        .groupBy("bucket", "term")
        .agg(F.sum("n").alias("df"))
    )
    lex.sortWithinPartitions("term").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(vdir, "lexicon"))

    with open(os.path.join(delta_vdir, "meta.json")) as f:
        delta_meta = json.load(f)
    meta = dict(old_meta)
    meta["n_docs"] = old_meta["n_docs"] + delta_meta["n_docs"]
    meta["max_backlinks"] = max(
        old_meta["max_backlinks"], delta_meta["max_backlinks"]
    )
    meta["n_postings"] = old_meta["n_postings"] + delta_meta["n_postings"]
    meta["compressed_bytes"] = (
        old_meta["compressed_bytes"] + delta_meta["compressed_bytes"]
    )
    with open(os.path.join(vdir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)

    lin = Lineage(os.path.join(vdir, "_lineage.jsonl"))
    lin.record(
        "publish",
        delta_docs=delta_meta["n_docs"],
        delta_postings=delta_meta["n_postings"],
        wall_s=round(time.time() - t_start, 3),
        base_version=os.path.basename(old_vdir),
    )
    # atomic generation publish through the storage seam (the hard-link
    # merge above is filesystem-specific by design; on an Iceberg deployment
    # the delta would instead append via overwritePartitions)
    from .tableio import TableIO

    TableIO(spark).publish(out_dir, version)
    metrics["version"] = version
    return metrics


def delete_conversations(
    spark: SparkSession, out_dir: str, conv_ids: list[str]
) -> dict:
    """Logical deletion (takedown) of whole conversations: publish a new
    index version whose data files are hard links of the CURRENT ones plus
    a tombstone table of the deleted doc_ids — no rebuild, no posting
    rewrite, atomic pointer swap.

    Both query engines mask tombstoned docs at postings-decode time, so
    deleted docs can never appear in any result, count, or pruning decision.
    Corpus statistics (df/idf, fancy lists, n_docs) intentionally stay as
    built: surviving docs keep their exact pre-deletion scores, and the
    stats refresh at the next full rebuild — the reference's model, where
    deletions only ever take effect via the periodic GenDb rebuild + swap
    (deusu.sh:3-9). Tombstone cardinality is takedown volume, orders below
    n_docs, so the per-searcher sorted array / Spark broadcast is cheap.
    """
    old_vdir = current_index_dir(out_dir)
    with open(os.path.join(old_vdir, "meta.json")) as f:
        meta = json.load(f)
    version = _pending_version(out_dir)
    vdir = os.path.join(out_dir, version)
    os.makedirs(vdir, exist_ok=True)
    t_start = time.time()
    for sub in ("postings", "docmeta", "lexicon"):
        _link_tree(os.path.join(old_vdir, sub), os.path.join(vdir, sub))
    for f_ in ("info.txt",):
        src = os.path.join(old_vdir, f_)
        if os.path.exists(src):
            os.link(src, os.path.join(vdir, f_))

    # resolve conversations -> doc_ids via docmeta (host == conversation)
    new_tomb = (
        spark.read.parquet(os.path.join(old_vdir, "docmeta"))
        .where(F.col("host").isin(list(conv_ids)))
        .select("doc_id")
    )
    old_tomb_dir = os.path.join(old_vdir, "tombstones")
    if os.path.isdir(old_tomb_dir):
        new_tomb = new_tomb.unionByName(
            spark.read.parquet(old_tomb_dir).select("doc_id")
        )
    new_tomb = new_tomb.distinct()
    new_tomb.write.mode("overwrite").parquet(
        os.path.join(vdir, "tombstones")
    )
    n_tomb = int(
        spark.read.parquet(os.path.join(vdir, "tombstones")).count()
    )

    meta["n_tombstones"] = n_tomb
    with open(os.path.join(vdir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    lin = Lineage(os.path.join(vdir, "_lineage.jsonl"))
    lin.record(
        "tombstone",
        conv_ids=len(list(conv_ids)),
        n_tombstones=n_tomb,
        wall_s=round(time.time() - t_start, 3),
        base_version=os.path.basename(old_vdir),
    )
    # mark the version PUBLISHED in its lineage: _pending_version treats a
    # version without this step as a resumable unpublished leftover and
    # would reuse (clobber) the dir on the next build/append — which
    # silently destroyed pinned tombstone snapshots once a newer version
    # took the CURRENT pointer
    lin.record("publish", kind="tombstone")
    from .tableio import TableIO

    TableIO(spark).publish(out_dir, version)
    return {"version": version, "n_tombstones": n_tomb}


def stream_transcripts(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    **build_kwargs,
):
    """Structured Streaming sink: per micro-batch incremental index update
    (readStream → foreachBatch(incremental_update) → atomic snapshot swap).
    Caveat: the delta's fancy lists only cover delta postings; a periodic
    full rebuild re-optimizes accelerators, exactly like the reference's
    periodic full GenDb run."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        incremental_update(
            batch_df.sparkSession, out_dir, batch_df, **build_kwargs
        )

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
