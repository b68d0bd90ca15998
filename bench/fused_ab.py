#!/usr/bin/env python
"""Interleaved A/B of the two segment paths — staged scatter files vs the
fused (packed) shuffle — at ONE parallelism level, same input, fresh
process per build. Cross-window comparisons are meaningless on this host
(wall noise ±2-3×, see BENCH.md); this harness answers "which path is
faster" the only valid way: alternating builds inside one window,
min-of-trials per mode, with per-stage walls from the lineage journal.

    SPARK_GRAFT_AB_CORES=8 SPARK_GRAFT_AB_TRIALS=3 python bench/fused_ab.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(cores: int, n_convs: int, fused: bool) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from deusu_spark import synth
    from deusu_spark.build import build_index
    from deusu_spark.session import get_spark

    spark = get_spark(
        app=f"deusu-ab-{'fused' if fused else 'staged'}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus_path = os.path.join(
        tempfile.gettempdir(), f"deusu_scale_corpus_{n_convs}.parquet"
    )
    if not os.path.exists(corpus_path):
        synth.write_parquet(synth.gen_transcripts(n_convs), corpus_path)
    sdf = spark.read.parquet(corpus_path)
    idx_dir = tempfile.mkdtemp(prefix=f"deusu_ab_{fused}_")
    t0 = time.time()
    metrics = build_index(
        spark,
        sdf,
        idx_dir,
        fancy_threshold=max(1000, n_convs // 4),
        bucket_groups=2,
        fuse_scatter=fused,
    )
    build_s = time.time() - t0
    stages: dict[str, float] = {}
    lp = metrics.get("lineage")
    if lp and os.path.exists(lp):
        with open(lp) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("status") == "done" and "wall_s" in rec:
                    step = rec["step"]
                    if step.startswith("segments_g"):
                        step = "segments"
                    stages[step] = round(
                        stages.get(step, 0) + rec["wall_s"], 2
                    )
    shutil.rmtree(idx_dir, ignore_errors=True)
    return {
        "mode": "fused" if fused else "staged",
        "build_s": round(build_s, 2),
        "postings_per_s": round(metrics["n_postings"] / build_s, 1),
        "stages": stages,
    }


def main() -> None:
    if len(sys.argv) == 4 and sys.argv[1] == "--one":
        print(
            "RESULT "
            + json.dumps(
                run_one(
                    int(sys.argv[2]),
                    int(os.environ["_AB_CONVS"]),
                    sys.argv[3] == "fused",
                )
            )
        )
        return

    cores = int(os.environ.get("SPARK_GRAFT_AB_CORES", "8"))
    trials = int(os.environ.get("SPARK_GRAFT_AB_TRIALS", "3"))
    n_convs = int(os.environ.get("SPARK_GRAFT_AB_CONVS", "100000"))
    best: dict[str, dict] = {}
    seen: dict[str, list] = {"fused": [], "staged": []}
    for trial in range(trials):
        for mode in ("staged", "fused") if trial % 2 == 0 else ("fused", "staged"):
            env = dict(os.environ, _AB_CONVS=str(n_convs), PYTHONPATH=REPO)
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--one",
                    str(cores),
                    mode,
                ],
                capture_output=True,
                text=True,
                env=env,
            )
            line = [
                ln
                for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")
            ]
            if not line:
                sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
                raise SystemExit(f"{mode} failed")
            res = json.loads(line[-1][7:])
            seen[mode].append(res["build_s"])
            if mode not in best or res["build_s"] < best[mode]["build_s"]:
                best[mode] = res
            print(
                f"trial {trial} {mode}: {res['build_s']} s", file=sys.stderr
            )
    print(
        json.dumps(
            {
                "cores": cores,
                "n_convs": n_convs,
                "all_walls": seen,
                "best": best,
                "fused_over_staged": round(
                    best["staged"]["build_s"] / best["fused"]["build_s"], 3
                ),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
