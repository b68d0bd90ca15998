"""SparkSession helper with the engine's recommended configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "deusu-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for the index/query engine.

    On a real cluster this is `spark-submit --py-files deusu_spark.zip`
    with the same confs; locally defaults to local[$SPARK_GRAFT_CPUS].
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # Keep freed large allocations in the process heap instead of returning
    # them to the OS: virtualized hosts fault fresh pages orders of magnitude
    # slower than they stream warm ones, and numpy/Arrow pipelines allocate
    # large temporaries per task. Retained heaps keep worker pages warm
    # across tasks (python workers are reused).
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        # AQE: runtime coalesce + skew-join splitting — first line of defense
        # against hot-term/hot-host skew on a real cluster.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # Arrow for all pandas UDF / mapInPandas exchanges (no per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # posting blobs are already delta+varbyte packed; snappy on top is
        # cheap and still helps the metadata columns.
        .config("spark.sql.parquet.compression.codec", "snappy")
        # parquet v2 data pages: DELTA_BINARY_PACKED on the sorted
        # doc_id/int columns writes ~45% fewer bytes into page buffers
        # (measured on the scatter files) — less page allocation is both a
        # wall and a scaling win on allocation-bound hosts, and fewer bytes
        # shuffled/stored at any scale. pyarrow (serving path) and Spark
        # both read v2 pages natively.
        .config(
            "spark.hadoop.parquet.writer.version",
            os.environ.get("SPARK_GRAFT_PARQUET_VERSION", "PARQUET_2_0"),
        )
        # split scans finer than the 128 MB default so a handful of input
        # files still yields enough map tasks to feed every core (the input
        # side of the first shuffle otherwise caps build parallelism)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16777216"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
