"""Physical-plan audits: the plan properties that matter at 100 TB.

Correctness says an operator computes the right rows; these tests pin the
*shape* of the plan Catalyst picks — broadcasts for dimension joins, filter
and column pushdown into the parquet scan, map-side partial aggregation,
whole-stage codegen, and shuffle counts. A regression here is a silent
100×-scale performance bug even when every oracle check stays green.
"""

from iniz_exporters_spark.queries import REGISTRY

from conftest import SF_SMALL


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def with_scans(df) -> str:
    # full queryExecution dump includes FileScan lines (PushedFilters,
    # ReadSchema), which executedPlan's tree string may elide
    return df._jdf.queryExecution().toString()


def run(name, spark):
    return REGISTRY[name].fn(spark, SF_SMALL)


def test_dim_join_broadcasts(spark):
    plan = physical(run("join_dim_broadcast", spark))
    assert "BroadcastHashJoin" in plan, plan


def test_minmax_by_nation_broadcasts(spark):
    plan = physical(run("minmax_by_agg", spark))
    assert "BroadcastHashJoin" in plan, plan


def test_equality_filter_pushed_to_scan(spark):
    plan = with_scans(run("filter_eq", spark))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    assert any("PushedFilters: []" not in ln for ln in pushed), pushed


def test_scan_prunes_unused_columns(spark):
    plan = with_scans(run("q1_pricing_summary", spark))
    schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schemas, plan
    # q1 touches 7 of lineitem's 11 columns; the join keys must not be read
    assert all("l_partkey" not in ln and "l_suppkey" not in ln for ln in schemas), schemas


def test_aggregation_is_partial_then_final(spark):
    plan = physical(run("q1_pricing_summary", spark))
    assert "partial_sum" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_whole_stage_codegen_active(spark):
    # codegen spans (starred nodes) only materialize in the AQE final plan,
    # so execute first
    df = run("q1_pricing_summary", spark)
    df.collect()
    plan = physical(df)
    assert "isFinalPlan=true" in plan, plan
    assert "*(" in plan, plan  # codegen'd spans are starred


def test_semi_join_stays_semi(spark):
    plan = physical(run("semi_join_customers", spark))
    assert "LeftSemi" in plan, plan


def test_latest_per_key_single_shuffle(spark):
    plan = physical(run("latest_per_key", spark))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_window_family_single_exchange(spark):
    # five window functions over one shared spec must share one exchange
    plan = physical(run("window_rank_family", spark))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_exact_dedup_single_shuffle(spark):
    plan = physical(run("dedup_exact", spark))
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_contamination_broadcasts_test_side(spark):
    """The train corpus must never shuffle on the shingle hash: the test
    side broadcasts, and the only hash exchange is the pair aggregation."""
    df = run("contamination_overlap", spark)
    plan = physical(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # exchanges: pair-count agg (groupBy train_id,test_id) only — the join
    # itself must not hash-partition the exploded train shingles
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_vocab_topk_partial_agg_and_topk(spark):
    """Token counting must combine map-side (vocabulary-sized shuffle, not
    corpus-sized) and the global top-k must be TakeOrderedAndProject, not a
    full sort materialization."""
    plan = physical(run("vocab_topk", spark))
    assert "partial_count" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_repetition_ratio_two_shuffles_max(spark):
    """(doc, token) count then per-doc ratio: two hash exchanges, and the
    token explosion must carry only doc_id + token (no payload columns)."""
    df = run("repetition_ratio", spark)
    plan = physical(df)
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_unigram_scoring_broadcasts_vocab(spark):
    """The vocab-count and scalar-total joins must broadcast: the token
    stream is shuffled once for the vocab count and once for the per-doc
    agg, never for the scoring join."""
    plan = physical(run("unigram_logprob", spark))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # vocab agg lives behind the localCheckpoint; the only hash exchange in
    # the final plan is the per-doc aggregation
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_tfidf_broadcasts_df_and_scalar(spark):
    """df (vocab-sized) and N (scalar) must broadcast onto the tf rows; the
    corpus-sized frame shuffles only for the tf groupBy + ranking window."""
    plan = physical(run("tfidf_top_terms", spark))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 5, plan


def test_bm25_no_vocabulary_scale_shuffle(spark):
    """Query-term filter comes before every aggregate; df/avgdl/N broadcast
    so the only exchanges are doc-keyed aggregations."""
    plan = physical(run("bm25_score", spark))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 7, plan


def test_inverted_index_caps_postings_before_collect(spark):
    """The row_number cap must run BEFORE collect_list so no unbounded
    posting-list state exists (window, then filter, then aggregate)."""
    df = run("inverted_index_q", spark)
    plan = physical(df)
    assert "RunningWindowFunction" in plan or "Window" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 4, plan
    rows = df.collect()
    assert all(len(r["postings"].split(",")) <= 100 for r in rows), (
        "posting list exceeded the cap"
    )


def test_token_pmi_prunes_vocab_before_pairing(spark):
    """The top-50 vocab must broadcast into the pair join — the doc×token
    frame is never paired against the full vocabulary."""
    plan = physical(run("token_pmi_q", spark))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_resample_single_partitioning_for_windows(spark):
    """Both interpolation windows share the (key, bucket-order) sort: one
    exchange for the grid/obs alignment, one for the windows at most."""
    plan = physical(run("resample_interpolate_q", spark))
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_sessionize_single_shuffle_for_both_windows(spark):
    """The lag pass, the running-sum pass, and the rollup all key on
    user_id — one hash exchange total, and both windows share one sort."""
    plan = physical(run("sessionize_events", spark))
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_cohort_retention_copartitioned_join(spark):
    """first-event agg and activity dedup both hash on user_id; the join
    reuses that partitioning instead of adding a third corpus shuffle."""
    plan = physical(run("cohort_retention_q", spark))
    assert plan.count("Exchange hashpartitioning") <= 4, plan


def test_time_to_convert_single_pass_no_self_join(spark):
    """One aggregation over events — no events-to-events join."""
    plan = physical(run("time_to_convert_q", spark))
    assert "Join" not in plan or "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_train_test_split_no_shuffle(spark):
    """Split assignment is a pure per-row expression — zero exchanges."""
    plan = physical(run("train_test_split", spark))
    assert "Exchange" not in plan, plan


def test_pack_sequences_shard_keyed(spark):
    """Window and rollup both key on the shard (source) — no global sort,
    at most the one hash exchange for the shard partitioning."""
    plan = physical(run("pack_sequences_q", spark))
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_anomaly_zscore_single_corpus_pass(spark):
    """events is aggregated to (type, day) before the window — the window
    runs over the tiny aggregate, so only the day-rollup exchange plus the
    window's type-keyed exchange appear."""
    plan = physical(run("anomaly_zscore", spark))
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_cdc_changelog_collapse_then_single_antijoin(spark):
    """The base snapshot passes through one anti-join (broadcast at this
    changelog size) and never through a window; the only hash exchanges
    are the changelog-collapse windows (one per union branch — the
    changelog is tiny relative to base, so the double-compute is free)."""
    plan = physical(run("cdc_apply_changes", spark))
    assert "LeftAnti" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 4, plan


def test_nullsafe_join_is_hash_join_not_nlj(spark):
    """EqualNullSafe must plan as an equi-join key — a nested-loop/cartesian
    over nation² is wrong even at 25 rows."""
    plan = physical(run("nullsafe_join_nations", spark))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_full_outer_preaggregates_both_sides(spark):
    """Both sides reduce to key cardinality BEFORE the full-outer join —
    the fact table never passes through the join."""
    plan = physical(run("full_outer_reconcile", spark))
    assert "FullOuter" in plan.replace(" ", ""), plan
    idx_join = plan.find("SortMergeJoin")
    if idx_join == -1:
        idx_join = plan.find("ShuffledHashJoin")
    assert "HashAggregate" in plan[idx_join:], plan


def test_analyze_stats_scans_are_column_pruned(spark):
    """Catalyst rewrites the multi-column distinct aggregate into one
    pruned scan PER distinct column (columnar IO equivalent to one wide
    scan). The property that matters: every scan reads exactly its one
    stats column — no scan ever reads the full 11-column row."""
    ph = physical(run("analyze_table_stats", spark))
    scans = [ln for ln in ph.splitlines() if "Scan parquet" in ln]
    assert 1 <= len(scans) <= 4, ph
    for ln in scans:
        cols = ln.split("[", 1)[1].split("]")[0]
        assert len(cols.split(",")) == 1, ln


def test_ivm_delta_side_is_changelog_scale(spark):
    """The delta path's window runs over the changelog, and the final
    merge joins two key-cardinality aggregates — the fact table passes
    through exactly one count aggregation."""
    plan = physical(run("ivm_merge_counts", spark))
    win_ops = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert len(win_ops) <= 1, plan  # changelog collapse only
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_weighted_sample_is_take_ordered(spark):
    """A-ES top-k must plan as TakeOrderedAndProject (per-partition heaps),
    never a global sort materialization."""
    plan = physical(run("weighted_sample_q", spark))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_dau_wau_no_nested_loop_join(spark):
    """The 7-day window must come from the map-side explode + equi
    semi-join — never a nested-loop range join over the activity frame."""
    plan = physical(run("dau_wau_stickiness", spark))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "LeftSemi" in plan, plan


def test_rollup_reuse_two_level_partial_aggregation(spark):
    """Both rollup levels must combine map-side: the raw table shuffles
    once to hour grain, the hourly frame (tiny) once to day grain."""
    plan = physical(run("rollup_reuse_daily", spark))
    assert "partial_sum" in plan or "partial_count" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime row-level Bloom filter: the selective dim side builds a
    bloom_filter_agg and the fact side's scan gains might_contain — the
    shuffle-join pruning lever when the fact side is too big to broadcast
    (thresholds lowered here; at 100 TB the 10GB default does the gating).
    """
    import pyspark.sql.functions as F

    from iniz_exporters_spark.session import enable_runtime_bloom_filters

    bloom_confs = [
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
    ]
    old = {
        c: spark.conf.get(c, None)
        for c in ["spark.sql.autoBroadcastJoinThreshold", *bloom_confs]
    }
    try:
        enable_runtime_bloom_filters(spark)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = with_scans(j)
        assert "bloom_filter_agg" in plan  # dim side: filter creation
        assert "might_contain" in plan  # fact side: injected pruning
        # and the filter is an optimization, not a semantics change:
        # collect WITH the bloom filter enabled, then again without it
        got = j.collect()
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        want = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    finally:
        for conf, val in old.items():
            if val is None:
                spark.conf.unset(conf)
            else:
                spark.conf.set(conf, val)


def test_bpe_apply_vocab_broadcasts(spark):
    """The BPE fold chain must run per DISTINCT word and broadcast-join
    back to the token stream — segmenting per occurrence would redo the
    fold corpus-size times at 100 TB."""
    plan = physical(run("bpe_apply_q", spark))
    assert "BroadcastHashJoin" in plan, plan


def test_oov_vocab_broadcasts(spark):
    """The top-K vocabulary side of the OOV join is bounded by K — it must
    broadcast; shuffling the token stream against it would be a
    corpus-sized exchange for a metadata-sized lookup."""
    plan = physical(run("oov_rate_q", spark))
    assert "BroadcastHashJoin" in plan, plan


def test_phash_neardup_band_join_carries_no_payload(spark):
    """The banded LSH self-join moves (id, band, value, 4 band ints) rows
    only — binary payloads are consumed by the hash kernel and must not
    appear in any join/exchange/aggregate/generate node's row schema."""
    plan = physical(run("phash_neardup", spark))
    for ln in plan.splitlines():
        if any(
            op in ln
            for op in (
                "Exchange",
                "HashAggregate",
                "BroadcastHashJoin",
                "SortMergeJoin",
                "Generate",
            )
        ):
            assert "payload" not in ln, ln


def test_hll_error_check_sketch_partials(spark):
    """Both HLL paths must partial-aggregate map-side: the shuffle carries
    fixed-size sketch state, never distinct values."""
    plan = physical(run("hll_error_check", spark))
    assert "partial_hll_sketch_agg" in plan or "hll_sketch_agg" in plan, plan
    assert plan.count("HashAggregate") >= 4, plan


def test_host_cap_single_window_shuffle(spark):
    """The per-host reservoir cap is one hash-partition window on the host
    key — no global sort, no extra exchanges."""
    plan = physical(run("host_cap_sample", spark))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_bm25_search_broadcasts_all_small_frames(spark):
    """Batch BM25 search must broadcast the query-term table and the df
    statistics — shuffling the token stream against query-count-sized
    frames would be corpus-scale exchanges for metadata lookups."""
    plan = physical(run("bm25_search_topk", spark))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_token_psi_vocab_broadcasts(spark):
    plan = physical(run("token_psi_q", spark))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_aqe_skew_join_split_fires(spark):
    """Proof that the session's AQE skew-join handling actually engages:
    a synthetic fact table with a 50%-mass hot key, shuffle-joined against
    a dim too big to broadcast, must show the skew split in the FINAL
    adaptive plan — `SortMergeJoin(skew=true)` plus an `AQEShuffleRead`
    marked skewed. Thresholds are lowered to make test-scale partitions
    qualify; at 100 TB the defaults (256 MB / factor 5) do the gating.
    The invariance suites prove determinism UNDER adversarial
    partitioning; this pins that the runtime mitigation itself fires."""
    import pyspark.sql.functions as F

    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    old = {c: spark.conf.get(c, None) for c in tuned}
    try:
        for c, v in tuned.items():
            spark.conf.set(c, v)
        # 50% of fact rows land on key 0; the pad column must survive the
        # join (column pruning would shrink the hot partition below any
        # threshold — the aggregate reads it, so bytes stay realistic).
        fact = spark.range(0, 200_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        dim = spark.range(0, 100_000).select(
            F.col("id").alias("k"), F.lit("d").alias("dv")
        )
        j = fact.join(dim, "k").agg(F.sum(F.length("pad")).alias("n"))
        rows = j.collect()
        # semantics: 100k odd ids match nothing above 100k; 100k hot-key
        # rows each meet dim key 0 once; evens<200k contribute via key 0.
        assert rows[0]["n"] == 100_000 * 64 + 50_000 * 64
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead" in plan and "skewed" in plan, plan
    finally:
        for conf, val in old.items():
            if val is None:
                spark.conf.unset(conf)
            else:
                spark.conf.set(conf, val)


# ---------------------------------------------------------------------------
# Round-4 batch E-K plan shapes.
# ---------------------------------------------------------------------------


def test_maxsim_scores_without_shuffling_the_corpus(spark):
    """MaxSim scores the corpus against the (bounded, collected) query
    tokens inside the vectorized kernel (r14-opt: the broadcast
    nested-loop + per-pair HOF cosine became one matmul per Arrow
    batch) — the corpus must still never shuffle for scoring: the first
    exchange may only appear ABOVE the kernel, carrying scored
    (ids, cos) rows, and no join may reappear below the aggregate."""
    plan = physical(run("maxsim_q", spark))
    assert "MapInPandas" in plan, plan
    # scoring itself is join-free now; a join here would mean the
    # kernel regressed to pairing via the planner
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # below the kernel (deeper in the single-branch subtree = later
    # lines) only the round-robin kernel spread may appear — a
    # hashpartitioning exchange there would mean the corpus is being
    # shuffled BEFORE scoring
    below_kernel = plan[plan.rindex("MapInPandas"):]
    assert "hashpartitioning" not in below_kernel, plan


def test_adamic_adar_no_cartesian(spark):
    """Pair generation must stay keyed by orderkey (bounded fanout) — a
    CartesianProduct here means the all-pairs failure mode."""
    plan = physical(run("adamic_adar_q", spark))
    assert "CartesianProduct" not in plan, plan


def test_association_rules_no_cartesian(spark):
    plan = physical(run("association_rules_q", spark))
    # the single-row totals frame broadcasts; part-part pair generation
    # must not
    assert "CartesianProduct" not in plan, plan


def test_target_encode_broadcasts_category_stats(spark):
    """LOO encoding joins the 25-row per-nation aggregate back to the
    customer table — that side must broadcast."""
    plan = physical(run("target_encode_loo_q", spark))
    assert "BroadcastHashJoin" in plan, plan


def test_feature_hash_like_zipf_single_corpus_shuffle(spark):
    """Zipf fit: one corpus-scale token shuffle; regression work happens
    post-top-k (TakeOrdered), never a second corpus exchange."""
    plan = physical(run("zipf_fit_q", spark))
    assert "TakeOrderedAndProject" in plan, plan


def test_poisson_bootstrap_single_shuffle(spark):
    """The 32-replica bootstrap is ONE corpus pass: explode + one
    (source, replica)-keyed exchange + one metadata re-agg — no join,
    no window over the corpus."""
    plan = physical(run("poisson_bootstrap_q", spark))
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_interval_concurrency_no_self_join(spark):
    """Sweep-line concurrency must not self-join lineitem on date
    overlap; the only join allowed is the lineitem-orders key join."""
    plan = physical(run("interval_concurrency_q", spark))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_attribution_no_stream_self_join(spark):
    """Last-touch attribution is a window pass per user — the event
    stream must not join against itself (the oracle does; the engine
    must not)."""
    plan = physical(run("attribution_q", spark))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_seq_rank_has_no_single_partition_exchange(spark):
    """seq_rank's global ROW_NUMBER must come from the distributed
    global_index path (range partition + per-pid numbering + offsets) —
    never a SinglePartition window that serializes the corpus."""
    from iniz_exporters_spark.queries import REGISTRY

    df = REGISTRY["seq_rank"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    ranks = {
        r["doc_id"]: r["sort_weight"]
        for r in df.collect()
    }
    ids = sorted(ranks)
    assert [ranks[i] for i in ids] == list(range(1, len(ids) + 1))


def test_stratified_split_no_corpus_scale_window(spark):
    """stratified_split_q's per-stratum rank must come from grouped_index
    (range partition + per-pid numbering + broadcast offsets), never a
    window partitioned only by (source, lang) — those partitions grow
    with the corpus (VERDICT r6 #2). The __pid column in the window spec
    is the distributed path's signature."""
    df = run("stratified_split_q", spark)
    plan = physical(df)
    assert "SinglePartition" not in plan, plan
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "__pid" in line, line


def test_fair_interleave_prunes_before_rank(spark):
    """fair_interleave_q must prune each source to <= k rows per scan
    split (window keyed by (__pid, source) — bounded partitions) before
    the exact per-source rank runs over the metadata-scale survivors."""
    df = run("fair_interleave_q", spark)
    plan = physical(df)
    assert "SinglePartition" not in plan, plan
    assert "__pid" in plan, plan


def test_exact_median_uses_distributed_bin_rank():
    """exact_median_q's final within-bin rank must use global_index —
    an unpartitioned Window.orderBy over the selected bin is a single
    ~n/1024-row task at scale (VERDICT r6 #2)."""
    import inspect

    src = inspect.getsource(REGISTRY["exact_median_q"].fn)
    assert "global_index" in src
    assert "Window.orderBy" not in src


def test_rank_stats_use_distributed_cumsum(spark):
    """mann_whitney_q / spearman_corr_q midranks must come from
    global_cumsum (range partition + __pid window + broadcast offsets),
    never a single-partition window over the distinct-value table —
    that table has corpus cardinality for continuous columns."""
    import inspect

    for name in ("mann_whitney_q", "spearman_corr_q"):
        src = inspect.getsource(REGISTRY[name].fn)
        assert "avg_rank2_table" in src, name
        assert "Window.orderBy" not in src, name
        plan = physical(run(name, spark))
        # the single-row scalar aggregate legitimately merges partials on
        # one partition; the invariant is that no WINDOW is unpartitioned
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                assert "__pid" in line, (name, line)


def test_trimmed_mean_uses_grouped_index(spark):
    """trimmed_mean_q's per-type rank must come from grouped_index —
    a window partitioned only by event_type has corpus-scale partitions
    (5 types x billions of rows = 5 giant tasks)."""
    import inspect

    src = inspect.getsource(REGISTRY["trimmed_mean_q"].fn)
    assert "grouped_index" in src
    plan = physical(run("trimmed_mean_q", spark))
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__pid" in line, line


def test_hill_tail_index_uses_takeordered(spark):
    """hill_tail_index_q's top-200 must compile to TakeOrderedAndProject
    (per-partition heaps + driver merge of 200 rows), never a global
    sort of the corpus."""
    plan = physical(run("hill_tail_index_q", spark))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort [n_chars" not in plan, plan


def test_sprt_walk_windows_are_pid_partitioned(spark):
    """sprt_q's trial index and cumulative success count must both come
    from the range-partitioned machinery (global_index/global_cumsum) —
    a plain SUM(x) OVER (ORDER BY user_id) would serialize the user
    stream into one task at corpus scale. The final one-row scalar
    aggregate legitimately ends in a SinglePartition exchange, so the
    assertion targets the WINDOW specs: every one must be keyed by
    __pid."""
    df = run("sprt_q", spark)
    plan = physical(df)
    saw_window = False
    for line in plan.splitlines():
        if "Window [" in line:
            saw_window = True
            assert "__pid" in line, line
    assert saw_window, plan


def test_lift_gain_deciles_have_no_single_partition_exchange(spark):
    """lift_gain_q's decile cut must come from global_ntile (range
    partition + broadcast offsets), never ANSI NTILE's unpartitioned
    window. The final cum-gain window over the 10-row decile table is
    exempt (metadata scale) — so the assertion targets the row_number
    window specifically."""
    df = run("lift_gain_q", spark)
    plan = physical(df)
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "__pid" in line, line


def test_hubness_pair_stage_is_parallel(spark):
    """hubness_q's n x n distance explosion must run on an explicit
    multi-partition exchange — AQE would otherwise coalesce the tiny
    pre-explosion table to ONE task and serialize the O(n^2 d) stage
    (39.5s -> 6.9s at sf0.1 when fixed)."""
    df = run("hubness_q", spark)
    plan = physical(df)
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan or (
        "hashpartitioning(vec_id" in plan
    ), plan


def test_span_dedup_coverage_has_no_position_explode(spark):
    """span_dedup_trim coverage runs as interval-union islands (r9): ONE
    Generate (the span-hash explode inside `spans`), a window partitioned
    by doc id, and NO distinct over exploded positions. The old shape —
    a second Generate (sequence per flagged occurrence) feeding a
    HashAggregate-distinct — shuffled span x more rows through two extra
    exchanges; keep it out."""
    plan = physical(run("span_dedup_trim", spark))
    # the span-hash explode sits BEHIND the localCheckpoint (plan shows
    # Scan ExistingRDD), so 0 visible Generates is the expected shape;
    # any SECOND explode would surface here
    n_generate = sum(
        1 for line in plan.splitlines() if "Generate explode" in line
    )
    assert n_generate <= 1, plan
    assert "sequence(pos" not in plan, plan
    # the island window partitions by the doc id — never unpartitioned
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "doc_id" in line, line


def test_ngram_jaccard_prefix_is_frequency_ordered(spark):
    """ngram_jaccard_pairs candidate generation (r10): prefixes are chosen
    by GLOBAL DOCUMENT FREQUENCY ascending (AllPairs, Bayardo et al.), not
    by raw hash order — a frequent n-gram must sort to the END of every
    doc's order so it stops seeding quadratic prefix collisions. The plan
    must show (a) the df aggregate (count per hash) feeding (b) a
    row_number window partitioned by doc id and ordered by that count, and
    (c) the positional filter's best-case-overlap inequality on the
    candidate join."""
    plan = physical(run("ngram_jaccard_pairs", spark))
    assert "row_number" in plan, plan
    # window is per-doc and frequency-first
    win_lines = [
        ln for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "row_number" in ln
    ]
    assert win_lines, plan
    for ln in win_lines:
        assert "doc_id" in ln, ln
        assert "__df" in ln, ln  # df count is the leading sort key
    # df aggregate present (count(1) grouped by the hash)
    assert any(
        "count(1)" in ln and "ph" in ln
        for ln in plan.splitlines()
        if "HashAggregate" in ln
    ), plan
    # positional filter: least(pos...) best-case-overlap bound on the join
    assert "least" in plan, plan
