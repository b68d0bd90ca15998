#!/usr/bin/env python
"""Segments-stage scaling decomposition: WHICH part of scan → varbyte-encode
→ parquet-write fails to scale 2→8 cores on this host?

Three timed variants over the SAME prebuilt scatter files, at each level:

  full      scan → encode (mapInArrow) → sort → partitioned parquet write
            (the real segments stage body)
  nowrite   scan → encode → count  (encode compute without the write path)
  scanonly  scan → passthrough mapInArrow → count  (pure read/materialize)

If (nowrite - scanonly) scales well while (full - nowrite) does not, the
residual is the parquet page-allocation/write path — on THIS host the
measured ~0.3 GB/s fresh-page ceiling (BENCH.md), which on a real cluster
scales with per-node memory bandwidth. If the encode delta itself fails to
scale, the codec is the problem. Each (level, variant) runs in a fresh
child process like bench/scaling.py.
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

PREP_DIR = os.path.join(tempfile.gettempdir(), "deusu_enc_control")


def prep(n_convs: int) -> str:
    """Build the index once (8 cores, untimed) so its scatter stage files
    and lineage (eff_salts, seg_size, n_docs) are available to every timed
    variant."""
    from deusu_spark import synth
    from deusu_spark.build import build_index, current_index_dir
    from deusu_spark.session import get_spark

    marker = os.path.join(PREP_DIR, "READY")
    if os.path.exists(marker):
        return current_index_dir(PREP_DIR)
    shutil.rmtree(PREP_DIR, ignore_errors=True)
    spark = get_spark(app="enc-prep", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    corpus_path = os.path.join(
        tempfile.gettempdir(), f"deusu_scale_corpus_{n_convs}.parquet"
    )
    if not os.path.exists(corpus_path):
        synth.write_parquet(synth.gen_transcripts(n_convs), corpus_path)
    build_index(
        spark,
        spark.read.parquet(corpus_path),
        PREP_DIR,
        fancy_threshold=10**9,  # hot set empty: isolate the full-kind path
        bucket_groups=2,
    )
    spark.stop()
    open(marker, "w").write("ok")
    return current_index_dir(PREP_DIR)


def run_variant(cores: int, variant: str) -> float:
    from pyspark.sql import functions as F

    from deusu_spark.build import (
        SEGMENTS_SCHEMA,
        _encode_partition_fn,
        current_index_dir,
    )
    from deusu_spark.session import get_spark

    vdir = current_index_dir(PREP_DIR)
    with open(os.path.join(vdir, "meta.json")) as f:
        meta = json.load(f)
    spark = get_spark(
        app=f"enc-{variant}-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    pg = spark.read.parquet(os.path.join(vdir, "stage_postings"))

    if variant == "scanonly":

        def passthrough(it):
            yield from it

        out = pg.mapInArrow(passthrough, schema=pg.schema)
    else:
        fn = _encode_partition_fn(
            meta["seg_size"], meta["n_salts"], max(meta["n_docs"], 1)
        )
        out = pg.mapInArrow(fn, schema=SEGMENTS_SCHEMA)

    t0 = time.time()
    if variant == "full":
        dest = tempfile.mkdtemp(prefix=f"enc_out_{cores}_")
        (
            out.sortWithinPartitions("bucket", "term", "first_doc")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(dest)
        )
        wall = time.time() - t0
        shutil.rmtree(dest, ignore_errors=True)
    else:
        out.selectExpr("count(*)").collect()
        wall = time.time() - t0
    spark.stop()
    return wall


def main() -> None:
    if len(sys.argv) == 4 and sys.argv[1] == "--variant":
        print(
            "RESULT "
            + json.dumps({"wall": run_variant(int(sys.argv[2]), sys.argv[3])})
        )
        return

    n_convs = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "100000"))
    trials = int(os.environ.get("SPARK_GRAFT_CONTROL_TRIALS", "2"))
    prep(n_convs)
    levels = (2, 8)
    variants = ("scanonly", "nowrite", "full")
    best: dict[tuple[int, str], float] = {}
    for _ in range(trials):
        for cores in levels:
            for v in variants:
                env = dict(os.environ, PYTHONPATH=REPO)
                out = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--variant",
                        str(cores),
                        v,
                    ],
                    capture_output=True,
                    text=True,
                    env=env,
                )
                lines = [
                    ln
                    for ln in out.stdout.splitlines()
                    if ln.startswith("RESULT ")
                ]
                if not lines:
                    sys.stderr.write(out.stdout[-1000:] + out.stderr[-3000:])
                    raise SystemExit(f"{cores}/{v} failed")
                wall = json.loads(lines[-1][7:])["wall"]
                key = (cores, v)
                if key not in best or wall < best[key]:
                    best[key] = wall

    rep = {f"{v}@{c}": round(best[(c, v)], 2) for c, v in best}
    for v in variants:
        sp = best[(2, v)] / best[(8, v)]
        rep[f"eff_{v}"] = round(sp / 4, 3)
    # component deltas: encode compute and write path in isolation
    for c in levels:
        rep[f"encode_delta@{c}"] = round(best[(c, "nowrite")] - best[(c, "scanonly")], 2)
        rep[f"write_delta@{c}"] = round(best[(c, "full")] - best[(c, "nowrite")], 2)
    enc2, enc8 = rep["encode_delta@2"], rep["encode_delta@8"]
    wr2, wr8 = rep["write_delta@2"], rep["write_delta@8"]
    if enc8 > 0:
        rep["eff_encode_component"] = round(enc2 / enc8 / 4, 3)
    if wr8 > 0:
        rep["eff_write_component"] = round(wr2 / wr8 / 4, 3)
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
