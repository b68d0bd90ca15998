#!/usr/bin/env python
"""Compaction vs full-rebuild wall on the synthetic corpus.

Builds a base index from the first 60% of conversations, appends the rest
in two increments, then measures, in the SAME session/window:

  - compact_index() wall (decode -> rejoin -> re-encode, no tokenize)
  - a from-scratch build_index() wall over the union corpus

and reports the ratio plus the fragmentation removed (segment/file counts
before/after). Wall noise on this host is +-2x across windows (BENCH.md) —
compare the two numbers from one run against each other, not across runs.

Usage: SPARK_GRAFT_COMPACT_CONVS=100000 python bench/compact_bench.py
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deusu_spark import synth  # noqa: E402
from deusu_spark.build import build_index, current_index_dir  # noqa: E402
from deusu_spark.incremental import compact_index, incremental_update  # noqa: E402
from deusu_spark.query_local import LocalSearcher  # noqa: E402
from deusu_spark.session import get_spark  # noqa: E402


def seg_files(vdir: str) -> int:
    return len(glob.glob(os.path.join(vdir, "postings", "*", "*.parquet")))


def main() -> None:
    n_convs = int(os.environ.get("SPARK_GRAFT_COMPACT_CONVS", "100000"))
    spark = get_spark(app="compact-bench")
    spark.sparkContext.setLogLevel("ERROR")
    full = synth.gen_transcripts(n_convs)
    convs = sorted(full["conv_id"].unique())
    cuts = [int(n_convs * 0.6), int(n_convs * 0.8)]
    parts = [
        full[full["conv_id"].isin(set(convs[: cuts[0]]))],
        full[full["conv_id"].isin(set(convs[cuts[0] : cuts[1]]))],
        full[full["conv_id"].isin(set(convs[cuts[1] :]))],
    ]

    d_inc = tempfile.mkdtemp(prefix="cbench_inc_")
    d_full = tempfile.mkdtemp(prefix="cbench_full_")
    try:
        build_index(spark, spark.createDataFrame(parts[0]), d_inc)
        for p in parts[1:]:
            incremental_update(spark, d_inc, spark.createDataFrame(p))
        pre_vdir = current_index_dir(d_inc)
        pre_files = seg_files(pre_vdir)
        probe = LocalSearcher(d_inc).search("linux", k=100)

        t0 = time.time()
        metrics = compact_index(spark, d_inc)
        compact_wall = time.time() - t0
        post_vdir = current_index_dir(d_inc)
        assert LocalSearcher(d_inc).search("linux", k=100) == probe

        t0 = time.time()
        m_full = build_index(spark, spark.createDataFrame(full), d_full)
        rebuild_wall = time.time() - t0

        out = {
            "metric": "compact_vs_rebuild",
            "n_convs": n_convs,
            "n_postings": int(
                json.load(open(os.path.join(post_vdir, "meta.json")))[
                    "n_postings"
                ]
            ),
            "compact_wall_s": round(compact_wall, 1),
            "rebuild_wall_s": round(rebuild_wall, 1),
            "ratio": round(compact_wall / rebuild_wall, 3),
            "segments_before": metrics["segments_before"],
            "segments_after": metrics["segments_after"],
            "files_before": pre_files,
            "files_after": seg_files(post_vdir),
            "rebuild_metrics_wall_s": m_full.get("wall_s"),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(d_inc, ignore_errors=True)
        shutil.rmtree(d_full, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
