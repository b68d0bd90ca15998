"""Scalable dense doc-id assignment.

The reference assigns DocIDs densely in ingest order (GenDb.dpr:256,426);
the north rule fixes the stable order to (conv_id, turn_idx). A global
`row_number()` window would funnel 10^12 rows through one task, so we use
the classic two-phase zip-with-index:

  1. range-repartition + sort by (conv_id, turn_idx)  [deterministic: Spark's
     RangePartitioner samples with a fixed per-partition seed]
  2. job A: count rows per physical partition → prefix offsets (driver-side,
     one int per partition)
  3. job B: mapInPandas adds doc_id = offset[partition] + local position

Both jobs recompute the same deterministic lineage, so no persist is needed
for correctness; callers may cache upstream for speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_doc_ids(
    df: DataFrame,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
) -> DataFrame:
    """Return df + dense 0-based ``doc_id`` following order_cols."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    # both jobs below must observe the SAME partitioning; pin the lineage
    # (build.py avoids this by persisting (_pid, _rn) into its staged output)
    ordered = ordered.persist()
    ordered.count()

    sizes = (
        ordered.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    counts = {r["_pid"]: r["count"] for r in sizes}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)

    from pyspark.sql import types as T

    schema = T.StructType(
        list(ordered.schema.fields) + [T.StructField("doc_id", T.LongType())]
    )

    def add_ids(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = boff.value.get(pid, 0)
        seen = 0
        for pdf in iterator:
            pdf = pdf.copy()
            pdf["doc_id"] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return ordered.mapInPandas(add_ids, schema=schema)
