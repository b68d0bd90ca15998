#!/usr/bin/env python
"""Round-5 verdict item #1 (second half): a stage-isolated 2-vs-8 scaling
pair for the batch-query SHUFFLE stage alone — the AND-aggregation +
per-query top-k window that remained unattributed at 10M docs (build
stages have scaling pairs; the batch shuffle did not).

Isolation: ``SearchEngine._decode_score`` is wrapped so the scored
posting stream each ``_execute_many`` pass produces is materialized to
parquet ONCE (phase "mat"), then the timed phases re-run the SAME
search_many(120) with the wrapper returning the parquet scan instead of
the decode — so the measured wall is exactly scan → fan-out broadcast
join → groupBy(qi, doc) partial+final agg → window top-k → collect,
with the decode/Python boundary out of the picture. The plan executes
partial_sum/partial_max BEFORE the exchange (map-side combine — see
plans/r06/fts_batch_query_after.txt), so this pair measures the exchange
+ final agg + window themselves.

Usage (run all three phases, in order, each its own process):
  python bench/batch_shuffle_pair.py mat    8
  python bench/batch_shuffle_pair.py time   2
  python bench/batch_shuffle_pair.py time   8
Each `time` run appends its result to bench/BATCH_SHUFFLE_PAIR.json.
Env: SPARK_GRAFT_S10_IDX (index root, default = newest kept scale-10m),
     SPARK_GRAFT_BSP_TRIALS (default 3).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCORED_DIR = "/tmp/deusu_bsp_scored"
OUT = os.path.join(REPO, "bench", "BATCH_SHUFFLE_PAIR.json")


def main() -> None:
    phase, cores = sys.argv[1], int(sys.argv[2])
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    trials = int(os.environ.get("SPARK_GRAFT_BSP_TRIALS", "3"))

    from query_scale10 import find_index
    from query_scaling import QUERY_BATCH_120

    from deusu_spark.query import SearchEngine
    from deusu_spark.session import get_spark

    idx = find_index()
    spark = get_spark(
        app=f"deusu-bsp-{phase}-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 8, 64),
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = SearchEngine(spark, idx)
    real = SearchEngine._decode_score

    def pass_key(terms, use_fancy) -> str:
        # the fancy and full passes run on concurrent threads, so call
        # ORDER is nondeterministic — key each pass by its content
        import zlib

        sig = "|".join(sorted(f"{t.key}:{t.ti}" for t in terms))
        return f"{int(bool(use_fancy))}_{len(terms)}_" \
               f"{zlib.crc32(sig.encode()) & 0xffffffff:08x}"

    if phase == "mat":
        shutil.rmtree(SCORED_DIR, ignore_errors=True)
        os.makedirs(SCORED_DIR, exist_ok=True)
        n_passes = {"n": 0}

        def wrap(self, terms, use_fancy, *a, **kw):
            df = real(self, terms, use_fancy, *a, **kw)
            key = pass_key(terms, use_fancy)
            n_passes["n"] += 1
            if df is None:
                open(os.path.join(SCORED_DIR, f"none_{key}"), "w").close()
                return None
            p = os.path.join(SCORED_DIR, f"scored_{key}.parquet")
            df.write.mode("overwrite").parquet(p)
            return self.spark.read.parquet(p)

        SearchEngine._decode_score = wrap
        try:
            eng.search_many(QUERY_BATCH_120, k=10)
        finally:
            SearchEngine._decode_score = real
        print(json.dumps({"phase": "mat", "passes": n_passes["n"]}))
        return

    def wrap(self, terms, use_fancy, *a, **kw):
        key = pass_key(terms, use_fancy)
        if os.path.exists(os.path.join(SCORED_DIR, f"none_{key}")):
            return None
        return self.spark.read.parquet(
            os.path.join(SCORED_DIR, f"scored_{key}.parquet")
        )

    walls = []
    res = None
    for _t in range(trials):
        SearchEngine._decode_score = wrap
        t0 = time.time()
        try:
            res = eng.search_many(QUERY_BATCH_120, k=10)
        finally:
            SearchEngine._decode_score = real
        walls.append(round(time.time() - t0, 2))
    rec = {
        "cores": cores,
        "walls_s": walls,
        "best_s": min(walls),
        "loadavg": round(os.getloadavg()[0], 2),
        "n_queries": len(QUERY_BATCH_120),
        "n_nonempty": sum(1 for r in res if r),
    }
    data = []
    if os.path.exists(OUT):
        data = json.load(open(OUT))
    data.append(rec)
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
