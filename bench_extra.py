#!/usr/bin/env python
"""Extra (non-frozen) benchmarks per spark_optimization_guide §1.4:
noop-sink isolation of individual headline queries + .explain("formatted")
capture. bench.py itself is FROZEN for measurement; numbers quoted in
OPTIMIZATION_r06.md come from here unless stated otherwise.

Usage: python bench_extra.py <query> [<query> ...]
  env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0)
       SPARK_GRAFT_EXTRA_TRIALS (default 2)
       SPARK_GRAFT_EXTRA_PLAN_DIR (write <query>.txt explain dumps there)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deusu_spark import pipelines  # noqa: E402
from deusu_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    trials = int(os.environ.get("SPARK_GRAFT_EXTRA_TRIALS", "2"))
    plan_dir = os.environ.get("SPARK_GRAFT_EXTRA_PLAN_DIR", "")
    names = sys.argv[1:] or ["minhash_lsh16"]
    spark = get_spark(app="deusu-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, list[float]] = {}
    for name in names:
        fn = pipelines.QUERIES[name]
        if plan_dir:
            df = fn(spark, sf_dir)
            os.makedirs(plan_dir, exist_ok=True)
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        for _ in range(trials):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out.setdefault(name, []).append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "noop_s": out,
                      "min": {k: min(v) for k, v in out.items()},
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))


if __name__ == "__main__":
    main()
