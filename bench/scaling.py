#!/usr/bin/env python
"""Two-parallelism scaling harness (sandbox proxy for N vs 4N executors,
per the driver note): run the SAME index build + query set at local[8] and
local[32] on identical input, report throughput at both plus scaling
efficiency into BENCH.md.

Efficiency definition (work-normalized): with T_p = wall at parallelism p,
  eff = (T_8 / T_32) / (32/8)  -- 1.0 = perfect linear scaling.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deusu_spark import synth  # noqa: E402
from deusu_spark.session import get_spark  # noqa: E402

QUERIES = [
    "linux",
    "w0042",
    "linux ubuntu",
    "linux -google",
    "intitle:assistant linux",
    "host:conv00000017",
    "google java",
    "w0100 w0005 linux",
]


def run_at(cores: int, n_convs: int) -> dict:
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active:
        active.stop()
    spark = get_spark(
        app=f"deusu-scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    from deusu_spark.build import build_index
    from deusu_spark.query import SearchEngine

    corpus = synth.gen_transcripts(n_convs)
    sdf = spark.createDataFrame(corpus)
    idx_dir = tempfile.mkdtemp(prefix=f"deusu_scale_{cores}_")
    t0 = time.time()
    metrics = build_index(
        spark, sdf, idx_dir, fancy_threshold=max(1000, n_convs // 4), bucket_groups=2
    )
    build_s = time.time() - t0

    eng = SearchEngine(spark, idx_dir)
    t0 = time.time()
    for q in QUERIES:
        eng.search(q, k=10)
    query_s = time.time() - t0
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()
    return {
        "cores": cores,
        "build_s": round(build_s, 2),
        "postings": metrics["n_postings"],
        "postings_per_s": round(metrics["n_postings"] / build_s, 1),
        "query_s": round(query_s, 2),
        "queries_per_s": round(len(QUERIES) / query_s, 3),
    }


def main() -> None:
    n_convs = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "20000"))
    lo = run_at(8, n_convs)
    hi = run_at(32, n_convs)
    speedup = lo["build_s"] / hi["build_s"]
    eff = speedup / (32 / 8)
    out = {"low": lo, "high": hi, "build_speedup": round(speedup, 3),
           "scaling_efficiency": round(eff, 3), "n_convs": n_convs}
    print(json.dumps(out, indent=1))

    md = f"""# BENCH — engine throughput & scaling (local[8] vs local[32] proxy)

Input: deterministic synthetic transcript corpus, {n_convs} conversations
({lo['postings']} postings). Same input, same job, two parallelism levels
(sandbox proxy for N vs 4N executors — no real cluster available).

| parallelism | build wall (s) | postings/s | query set (s) | queries/s |
|---|---|---|---|---|
| local[8]  | {lo['build_s']} | {lo['postings_per_s']} | {lo['query_s']} | {lo['queries_per_s']} |
| local[32] | {hi['build_s']} | {hi['postings_per_s']} | {hi['query_s']} | {hi['queries_per_s']} |

Build speedup 8→32 cores (4× resources): **{speedup:.2f}×** →
scaling efficiency **{eff:.2f}** (target ≥ 0.8 of linear would be 4.0×;
efficiency = speedup/4).

Interactive query latency is dominated by fixed per-job scheduling overhead
at this corpus size, so query-side scaling is reported for completeness but
build throughput is the capacity-relevant number.
"""
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
