"""Physical-plan quality gates — assert the plans Catalyst produces are
the ones we want at 100 TB: filters pushed to the parquet scan, columns
pruned, small sides broadcast, aggregates partial before exchange.
(SURVEY.md §7.3: golden-plan tests via explain.)"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").where(
        F.col("l_orderkey") < 100
    )
    s = formatted(df)
    assert "PushedFilters" in s and "LessThan(l_orderkey,100)" in s


def test_column_pruning_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    s = formatted(df)
    # ReadSchema lists only the projected columns
    read_schema = [ln for ln in s.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema and "l_returnflag" not in read_schema


def test_mor_joins_broadcast_and_never_shuffle_data_side(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["mor_full"](spark, SF)
    s = plan_of(df)
    assert s.count("BroadcastHashJoin") >= 2  # pos + eq anti-joins
    assert "LeftAnti" in s
    assert "SortMergeJoin" not in s  # the 100-TB side must not sort/shuffle


def test_agg_is_partial_before_exchange(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["agg_pricing_summary"](spark, SF)
    s = formatted(df)
    # partial_ aggregate functions appear below the exchange (map-side combine)
    assert "partial_count" in s or "partial_sum" in s


def test_star_join_broadcasts_dims(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["join_order_revenue"](spark, SF)
    s = plan_of(df)
    assert "BroadcastHashJoin" in s


def test_minhash_signatures_codegen_agg_one_narrow_exchange(spark):
    """The codegen signature formulation (r16 s3): md5 + affine maps run
    in whole-stage codegen over the exploded shingle stream, the 8
    signatures fold as min() aggregates, and the ONLY exchange carries
    the doc-cardinality partially-aggregated rows — the corpus-sized
    shingle stream never shuffles, and no interpreted HOF lambda
    remains in the plan."""
    from iceberg_compaction_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s = plan_of(dd.minhash_signatures(docs))
    assert s.count("Exchange") == 1
    # partial min sits BELOW the exchange: the text order of a physical
    # plan tree prints parents first, so the final agg / exchange /
    # partial agg appear in that order
    i_final = s.index("HashAggregate")
    i_exch = s.index("Exchange")
    i_partial = s.index("partial_min", i_exch)
    assert i_final < i_exch < i_partial
    assert "lambdafunction" not in s  # nothing interpreted remains


def test_text_scoring_tokenizes_once(spark):
    """with_quality / with_language_id (r16 s3): the token array is
    staged as one column, so the plan contains exactly ONE split() —
    previously the stopword filter HOF re-tokenized (2 splits) and each
    language profile's filter HOF re-tokenized (6 splits), since codegen
    subexpression elimination does not reach into interpreted
    CodegenFallback expressions."""
    from iceberg_compaction_spark.operators import text as tx

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert plan_of(tx.with_quality(docs)).count("split(") == 1
    assert plan_of(tx.with_language_id(docs)).count("split(") == 1


def test_ann_lsh_kernel_no_join_no_corpus_shuffle(spark):
    """LSH ANN (optimization r15): bucketing + within-bucket scoring is
    one Arrow kernel over the corpus scan — no join at all; the only
    exchange carries the per-batch top-k candidate stream into the
    ranking window, never the corpus itself."""
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["ann_lsh"](spark, SF)
    s = plan_of(df)
    assert "MapInArrow" in s
    assert "Join" not in s  # neither broadcast nor shuffle join remains
    # exactly one exchange: the window's hashpartitioning on query_id
    # (local top-k candidates), never the corpus scan itself
    exchanges = [
        ln
        for ln in s.splitlines()
        if "Exchange" in ln and "Reused" not in ln and "BroadcastExchange" not in ln
    ]
    assert len(exchanges) == 1, exchanges
    assert "query_id" in exchanges[0]


def test_ann_topk_kernel_no_cross_product(spark):
    """Exact top-k (optimization r15): scoring is one Arrow kernel over
    the corpus scan with per-batch local top-k — the old
    BroadcastNestedLoopJoin cross product (|corpus| x |queries| scored
    rows into the ranking window) is gone; the only exchange carries
    the candidate stream, never the corpus."""
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["ann_topk"](spark, SF)
    s = plan_of(df)
    assert "MapInArrow" in s
    assert "Join" not in s  # no BNLJ cross product, no other join
    exchanges = [
        ln
        for ln in s.splitlines()
        if "Exchange" in ln and "Reused" not in ln and "BroadcastExchange" not in ln
    ]
    assert len(exchanges) == 1, exchanges
    assert "query_id" in exchanges[0]


def test_star_query_broadcasts_all_dims(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["supplier_part_region"](spark, SF)
    s = plan_of(df)
    assert s.count("BroadcastHashJoin") >= 2  # nation + region broadcast


def test_pipeline_corpus_filter_stays_jvm_side(spark):
    """The composed cleaning pipeline must not fall back to Python row
    processing anywhere (only built-ins + NGram's Scala transform)."""
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["pipeline_corpus_filter"](spark, SF))
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_range_join_is_hash_not_nested_loop(spark):
    """The bin-bucketed range join must plan as an equi hash join with a
    residual — never a nested-loop/cartesian time join."""
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["events_range_join"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    assert "Join" in s


def test_top_users_has_no_global_window_funnel(spark):
    """events_top_users must plan as TakeOrderedAndProject (per-partition
    top-k + k*p-row driver merge), never a single-partition Exchange
    feeding an unpartitioned window over the full per-user count set."""
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["events_top_users"](spark, SF))
    assert "TakeOrderedAndProject" in s, s
    # the only SinglePartition exchange allowed is over the k-row result
    # of the limit (rank re-derivation), which appears above TakeOrdered;
    # assert no rangepartitioning (global sort of all users) either
    assert "rangepartitioning" not in s.lower(), s


def test_supplier_part_join_is_one_to_one_broadcast(spark):
    """The synthetic part->supplier link joins each part to exactly one
    supplier and broadcasts the supplier dim — no shuffle of the part
    side, no fan-out."""
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["supplier_part_region"](spark, SF)
    s = plan_of(df)
    assert s.count("BroadcastHashJoin") >= 3  # supplier + nation + region
    assert "SortMergeJoin" not in s


def test_whole_stage_codegen_covers_mor(spark):
    """The MOR hot path is pure built-ins -> codegen'd stages ('*(n)'
    markers). Text ops using higher-order-function lambdas are
    CodegenFallback by Spark design — asserted NOT to regress the scan
    (still one narrow Project over the pruned scan)."""
    from iceberg_compaction_spark import registry
    from iceberg_compaction_spark.operators import text as tx

    s = plan_of(registry.QUERIES["mor_full"](spark, SF))
    # under AQE the codegen markers only materialize in the final plan;
    # assert the shape that codegen requires: pure built-in projections
    # over a batched parquet scan, no Python eval anywhere
    assert "Batched: true" in s and "BatchEvalPython" not in s

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sq = plan_of(tx.with_quality(docs))
    assert "Exchange" not in sq  # narrow map, no shuffle, single stage


def test_simhash_banded_pairs_no_cartesian(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["dedup_simhash_pairs"](spark, SF)
    s = plan_of(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_emb_ops_have_no_shuffle(spark):
    from iceberg_compaction_spark import registry

    for name in ("emb_normalize", "emb_quantize"):
        df = registry.QUERIES[name](spark, SF)
        s = plan_of(df)
        # narrow per-row projection: scan -> project, nothing else
        assert "Exchange" not in s, name


def test_top_ngrams_uses_take_ordered(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["text_top_ngrams"](spark, SF)
    s = plan_of(df)
    assert "TakeOrderedAndProject" in s
    # the global sort alternative would show a rangepartitioning exchange
    assert "rangepartitioning" not in s.lower()


def test_zorder_code_is_codegen_projection(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["zorder_lineitem"](spark, SF)
    s = plan_of(df)
    assert "Exchange" not in s  # pure scan -> project
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s  # no UDF


def test_funnel_and_retention_have_no_cartesian(spark):
    from iceberg_compaction_spark import registry

    for name in ("events_funnel", "events_retention"):
        df = registry.QUERIES[name](spark, SF)
        s = plan_of(df)
        assert "CartesianProduct" not in s, name
        assert "BroadcastNestedLoopJoin" not in s, name


def test_anti_join_filters_build_side_before_join(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["anti_customers_no_orders"](spark, SF)
    s = formatted(df)
    # the o_totalprice filter must reach the orders scan, not sit above
    # the join
    assert "GreaterThan(o_totalprice" in s
    assert "LeftAnti" in plan_of(df)


def test_running_window_partitions_by_customer(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["window_running_revenue"](spark, SF)
    s = plan_of(df)
    # partitioned window: hashpartitioning on o_custkey, never a global
    # single-partition sort
    assert "hashpartitioning(o_custkey" in s
    assert "SinglePartition" not in s


def test_tfidf_aggs_partial_and_no_cartesian(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["text_tfidf_top_terms"](spark, SF)
    p = plan_of(df)
    assert "partial_count" in p, p  # tf and df aggs combine map-side
    assert "CartesianProduct" not in p, p
    # the per-doc top-k window must partition by doc, not sort globally
    assert "row_number" in p and "Sort [doc_id" in p, p


def test_zipf_histogram_double_partial_agg(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["text_zipf_histogram"](spark, SF)
    p = plan_of(df)
    assert p.count("partial_count") >= 1, p
    assert "Exchange" in p  # one shuffle per agg level at most
    assert "CartesianProduct" not in p, p


def test_stratified_sample_is_narrow_scan_filter(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["sample_stratified"](spark, SF)
    p = plan_of(df)
    # pure scan + project/filter: no exchange, no join, no aggregation
    assert "Exchange" not in p, p
    assert "Join" not in p and "Aggregate" not in p, p


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join layout: two tables bucketed by the join key into
    the same bucket count sort-merge-join with NO shuffle on either
    side — the write-once, join-free-forever layout for 100 TB facts."""
    from iceberg_compaction_spark.sources.writer import write_bucketed_table

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed_table(li, "bt_lineitem", ["l_orderkey"], 8)
    write_bucketed_table(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bt_orders",
        ["l_orderkey"],
        8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path a 100 TB x 100 TB join would take
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bt_lineitem").join(
            spark.table("bt_orders"), "l_orderkey"
        )
        p = plan_of(joined)
        assert "SortMergeJoin" in p, p
        assert "Exchange" not in p, p  # bucketing replaced the shuffle
        # sanity: the join actually produces rows
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_curation_pipeline_no_cartesian_and_quality_stays_jvm(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["pipeline_curation_full"](spark, SF)
    p = plan_of(df)
    assert "CartesianProduct" not in p, p
    # quality scoring must not fall back to a Python row UDF
    assert "BatchEvalPython" not in p, p
    # the demotion is an anti-join against the (checkpointed) CC labels;
    # the quality gates stay fused in the projection above it
    assert "LeftAnti" in p, p


def test_text_repetition_is_narrow(spark):
    """Repetition signals are per-row HOFs: zero Exchange in the plan."""
    from iceberg_compaction_spark.operators import text as tx

    df = tx.with_repetition(
        spark.read.parquet(f"{SF}/documents.parquet")
    ).select("doc_id", "n_bigrams", "dup_bigram_ppm", "top_token_ppm")
    assert "Exchange" not in plan_of(df)


def test_contamination_broadcasts_benchmark_vocab(spark):
    """The benchmark shingle vocabulary broadcasts; the corpus side never
    sort-merge-joins (at 100 TB the corpus is the unshufflable side)."""
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["dedup_contamination"](spark, SF)
    s = plan_of(df)
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s and "CartesianProduct" not in s


def test_anomaly_broadcasts_moment_table(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["events_anomaly"](spark, SF)
    s = plan_of(df)
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    # hourly counts partial-aggregate map-side before their exchange
    assert "partial_count" in formatted(df)


def test_jaccard_prefix_no_cartesian(spark):
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["dedup_ngram_jaccard_prefix"](spark, SF)
    s = plan_of(df)
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s


def test_split_and_mixture_are_scan_side(spark):
    """Split assignment and mixture sampling are pure scan projections/
    filters — zero Exchange: the shape that labels 10^11 rows by
    scanning them once."""
    from iceberg_compaction_spark import registry

    for name in ("pipeline_split", "pipeline_mixture"):
        s = plan_of(registry.QUERIES[name](spark, SF))
        # _docs round-robins the single input file across cores; what
        # must NOT appear is any KEY shuffle or global collapse
        assert "hashpartitioning" not in s, name
        assert "rangepartitioning" not in s, name
        assert "SinglePartition" not in s, name


def test_pack_sequences_single_bucket_shuffle(spark):
    """Packing costs exactly one hash exchange (the bucketed cumulative
    window); the window partitions by pack_bucket, never a global sort."""
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["pipeline_pack_sequences"](spark, SF))
    assert s.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in s
    assert "rangepartitioning" not in s


def test_chunking_has_no_key_shuffle(spark):
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["text_chunking"](spark, SF))
    assert "hashpartitioning" not in s
    assert "rangepartitioning" not in s
    assert "SinglePartition" not in s


def test_containment_no_cartesian(spark):
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["dedup_containment"](spark, SF))
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_argmin_uses_partial_aggregate_not_window(spark):
    """The argmin runs as a groupBy min(struct) with a map-side partial
    aggregate — no window sort over the full lineitem."""
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["argmin_cheapest_supplier"](spark, SF)
    s = plan_of(df)
    assert "Window" not in s
    assert "partial_min" in formatted(df)


def test_cdc_changelog_no_cartesian_and_no_broadcast_of_big_sides(spark):
    """The changelog diff (round 15): ONE signed-count hash aggregate
    over the tagged union — no join at all in the diff core (the
    previous two-exceptAll shape paid two exchanges and evaluated each
    snapshot scan twice), no cartesian, no window; the plan must stay
    a hash-aggregate shape that scales by adding reducers, with the
    map-side partial sum cancelling carried rows before the exchange."""
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["cdc_changelog"](spark, SF)
    s = plan_of(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "SortMergeJoin" not in s  # the diff core is join-free now
    assert "partial_sum" in formatted(df)  # map-side cancellation


def test_incremental_dedup_broadcasts_delta_no_cartesian(spark):
    """Delta-vs-corpus candidates: the new batch's band table broadcasts
    into the corpus band index; nothing goes cartesian and the corpus
    never self-joins."""
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["dedup_incremental"](spark, SF)
    s = plan_of(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "BroadcastHashJoin" in s


def test_field_id_read_keeps_pushdown_and_codegen(spark, tmp_path):
    """Field-id schema resolution (sources/schema_evo.py) must not cost
    plan quality: a filter on the RENAMED column still reaches the
    parquet scan as a pushed filter, the scan stays inside
    WholeStageCodegen, and no exchange is introduced."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from iceberg_compaction_spark.sources import schema_evo as se
    from iceberg_compaction_spark.sources.scan import read_data_files

    p = str(tmp_path / "f.parquet")
    tbl = pa.table(
        {"id": pa.array(range(100), type=pa.int64()),
         "old_name": [f"v{i}" for i in range(100)]}
    )
    pq_.write_table(
        tbl.cast(se.arrow_schema_with_ids(tbl.schema, {"id": 1, "old_name": 2})),
        p,
    )
    fields = [
        {"id": 1, "name": "id", "type": "long"},
        {"id": 2, "name": "new_name", "type": "string"},
    ]
    df = read_data_files(spark, [p], schema_fields=fields).where(
        F.col("new_name") == "v7"
    )
    s = formatted(df)
    assert "PushedFilters" in s and "EqualTo(new_name,v7)" in s
    assert "codegen id" in s  # filter runs inside whole-stage codegen
    assert "Exchange" not in s
    assert [r["id"] for r in df.collect()] == [7]


def test_span_coverage_single_tokenize_pass(spark):
    """r16: the dup-shingle decision rides a window over the reduced
    (h, doc, count) set, so the corpus-sized tokenize+hash+explode
    lineage appears ONCE in the plan (the r15 join-back form evaluated
    it once per consumer — 3 documents scans, two full-stream
    exchanges).  One Generate, exactly two documents scans (stream +
    arithmetic totals), and no two-phase distinct rewrite in either
    branch."""
    from iceberg_compaction_spark.operators import dedup as dd

    df = spark.read.parquet(f"{SF}/documents.parquet")
    for kwargs in ({}, {"max_df": 50}):
        p = plan_of(dd.span_dup_coverage(df, k=8, **kwargs))
        assert "distinct" not in p.lower()
        gen = sum(
            1 for ln in p.splitlines() if ln.lstrip().startswith("+- Generate")
            or ln.lstrip().startswith(":- Generate")
            or ln.lstrip().startswith("Generate")
        )
        assert gen == 1, f"shingle fan-out duplicated: {gen} Generates"
        scans = sum(
            1 for ln in p.splitlines() if "documents.parquet" in ln
        )
        assert scans == 2, f"corpus scanned {scans}x (want stream + totals)"


def test_dml_matched_scan_and_merge_join_shapes(spark, tmp_path):
    """Round-9 DML plan gates: the matched-(file,pos) scan update/merge
    share is the standard MOR plan (no cartesian, no nested loop), and
    the MERGE target x source key join is a hash/broadcast join."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.ingest import _matched_scan
    from iceberg_compaction_spark.sources.manifest import Manifest
    from iceberg_compaction_spark.sources.scan import (
        HIDDEN_FILE_PATH,
        HIDDEN_POS,
    )

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    pq.write_table(
        pa.table({
            "id": pa.array(range(100), type=pa.int64()),
            "val": [f"v{i}" for i in range(100)],
        }),
        os.path.join(root, "b.parquet"),
    )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))

    df = _matched_scan(spark, cat.load_table("t"))
    matched = df.where("id % 7 = 3").select(HIDDEN_FILE_PATH, HIDDEN_POS)
    s = plan_of(matched)
    assert "CartesianProduct" not in s and "NestedLoop" not in s, s

    src = spark.createDataFrame([(3, "x")], "id long, val string")
    t, srca = df.alias("t"), src.alias("s")
    joined = t.join(srca, F.col("t.id") == F.col("s.id"), "inner")
    s = plan_of(joined)
    assert "CartesianProduct" not in s and "NestedLoop" not in s, s
    assert "Join" in s


def test_conditional_merge_clause_resolution_stays_jvm(spark, tmp_path):
    """Round-10 gate: conditional MERGE's first-match-wins clause
    resolution is ONE CASE expression in the join's projection — no
    Python row UDF, no cartesian, and the per-clause splits reuse the
    same hash join (no second scan of the target)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.ingest import _matched_scan
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    pq.write_table(
        pa.table({
            "id": pa.array(range(100), type=pa.int64()),
            "val": [f"v{i}" for i in range(100)],
        }),
        os.path.join(root, "b.parquet"),
    )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))

    df = _matched_scan(spark, cat.load_table("t"))
    src = spark.createDataFrame(
        [(3, "x", "U"), (6, "y", "D")], "id long, val string, op string"
    )
    t, s = df.alias("t"), src.alias("s")
    idx = (
        F.when(F.expr("s.op = 'D'"), F.lit(0))
        .when(F.expr("t.id % 2 = 0"), F.lit(1))
        .otherwise(F.lit(-1))
    )
    joined = t.join(s, F.col("t.id") == F.col("s.id"), "inner").withColumn(
        "_merge_clause", idx
    )
    affected = joined.where(F.col("_merge_clause") >= 0)
    p = plan_of(affected)
    assert "CartesianProduct" not in p and "NestedLoop" not in p, p
    assert "BatchEvalPython" not in p, p  # CASE stays in codegen
    assert "CASE WHEN" in p, p


def test_update_image_pairing_single_window_no_join(spark):
    """Round-11 gate: pair_update_images plans ONE Window over one hash
    exchange on the key — no self-join, no cartesian, no Python UDF in
    the row path."""
    from iceberg_compaction_spark.sources.changes import (
        pair_update_images,
    )

    df = spark.createDataFrame(
        [(1, "a", "insert", 10), (1, "b", "delete", 10)],
        ["id", "val", "_change_type", "_commit_snapshot_id"],
    )
    plan = (
        pair_update_images(df, keys=["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_position_deletes_df_is_distributed_scan(spark, tmp_path):
    """Round-11 gate: the position_deletes relation is a real file scan
    union (delete content is data-sized) — no LocalTableScan of
    driver-collected positions for the parquet side."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.plans.datamodel import (
        POSITION_DELETE,
        DeleteFile,
        FileScanTask,
    )
    from iceberg_compaction_spark.sources.manifest import Manifest
    from iceberg_compaction_spark.sources.metadata_tables import (
        position_deletes_df,
    )

    data = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"id": [1, 2, 3]}), data)
    pdel = str(tmp_path / "del.parquet")
    pq.write_table(
        pa.table(
            {
                "sys_hidden_file_path": [data],
                "sys_hidden_pos": pa.array([1], type=pa.int64()),
            }
        ),
        pdel,
    )
    m = Manifest(
        table_root=str(tmp_path),
        snapshot_id=1,
        sequence_number=2,
        data_files=[
            FileScanTask(
                data_file_path=data,
                length=10,
                record_count=3,
                sequence_number=1,
                deletes=[
                    DeleteFile(
                        path=pdel,
                        content=POSITION_DELETE,
                        file_size_in_bytes=10,
                        record_count=1,
                        sequence_number=2,
                    )
                ],
            )
        ],
    )
    plan = (
        position_deletes_df(spark, m)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FileScan parquet" in plan or "Scan parquet" in plan
    assert "LocalTableScan" not in plan


def test_bpe_pairs_plan_is_take_ordered_partial_agg(spark):
    """BPE pair counting (round 12) must plan as a partial-then-final
    aggregate (map-side combine on the pair key) with the top-k cut as
    TakeOrderedAndProject — never a global single-partition window —
    and no Python in the row path."""
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["text_bpe_pairs"](spark, SF))
    assert "TakeOrderedAndProject" in s
    assert "Window" not in s
    assert s.count("HashAggregate") >= 2  # partial + final
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_corpus_line_dedup_single_line_shuffle(spark):
    """Cross-document line dedup (round 12): ONE window rank on the
    line key plus the per-doc reassembly aggregate — no join-back, no
    Python row processing."""
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["dedup_corpus_lines"](spark, SF))
    assert "Window" in s  # the rank over the line key
    assert "SortMergeJoin" not in s and "BroadcastHashJoin" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_column_stats_single_pass_no_expand_when_approx(spark):
    """ANALYZE (round 12): the HLL form is ONE aggregation pass with no
    multi-distinct Expand operator; the exact form pays Expand by
    design (documented oracle-scale path)."""
    from iceberg_compaction_spark.operators.stats import column_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    s_approx = plan_of(column_stats(docs, approx=True))
    assert "Expand" not in s_approx
    assert "BatchEvalPython" not in s_approx
    s_exact = plan_of(column_stats(docs, approx=False))
    assert "Expand" in s_exact  # the multi-distinct plan, by design


def test_classifier_score_broadcast_vocab_one_doc_shuffle(spark):
    """fastText-style scorer (round 12): the vocabulary join must be a
    BROADCAST hash join (the weight table is bounded), the only
    corpus-keyed exchange is the doc-key aggregate, the top-V
    vocabulary cut is TakeOrdered (never a global window over the full
    vocabulary), and no Python touches the row path."""
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["text_classifier_score"](spark, SF))
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s
    assert "TakeOrderedAndProject" in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_temperature_mixture_no_corpus_shuffle(spark):
    """Temperature mixture (round 12): the rate table joins BROADCAST,
    the only aggregate is the tiny source count, and the corpus itself
    never exchanges — one scan-side filter."""
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["pipeline_mixture_temperature"](spark, SF))
    assert "BroadcastHashJoin" in s or "BroadcastNestedLoopJoin" in s
    assert "SortMergeJoin" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_matryoshka_zero_shuffle_projection(spark):
    """Matryoshka truncation (round 12): pure scan-projection HOFs —
    no exchange, no join, no Python."""
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["emb_matryoshka"](spark, SF))
    assert "Exchange" not in s
    assert "Join" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_dsir_weights_broadcast_features_no_python(spark):
    """DSIR importance weights (round 13): the 4096-row feature table
    joins BROADCAST into the token stream (never a sort-merge over the
    corpus), the corpus-keyed exchanges are the two aggregates (bucket
    counts, doc sum), and no Python touches the row path."""
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["pipeline_dsir_weights"](spark, SF))
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_geo_spatial_joins_broadcast_tiles_no_cartesian(spark):
    """The round-14 spatial joins: every one is a tile EQUI-join with
    the small exploded side broadcast — never a cartesian or
    nested-loop product, which is what makes them survive 100 TB of
    points (work = points + region-tile pairs + candidates in shared
    tiles)."""
    from iceberg_compaction_spark import registry

    for name in (
        "geo_spatial_join",
        "geo_envelope_join",
        "geo_knn_join",
        "geo_multipolygon_join",  # round 15: multipolygon-fed envelopes
        "geo_knn_wrap",  # round 15: seam-wrap kNN
        "geo_haversine_join",  # round 15: spherical cap-cover join
        "geo_haversine_knn",  # round 15: spherical kNN
    ):
        s = plan_of(registry.QUERIES[name](spark, SF))
        assert "CartesianProduct" not in s, name
        assert "BroadcastNestedLoopJoin" not in s, name
        assert "BroadcastHashJoin" in s, name


def test_variant_shredded_read_single_decode_pass(spark):
    """Spec-shape shredding (round 14; fallback per ADVICE r14): the
    write-time shred is ONE Arrow-batched pass; the default read adds
    only the NULL-masked residual-fallback eval (input null for every
    shredded row — the spec reader's required fallback), so the
    end-to-end entry holds at three Python evals (encode + shred +
    masked fallback).  The strictly zero-Python read plan under a
    writer-guaranteed contract is pinned in tests/test_variant.py
    (assume_shredded=True)."""
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["variant_shredded_read"](spark, SF))
    assert s.count("ArrowEvalPython") <= 3


def test_events_ohlc_struct_argminmax_no_window(spark):
    """OHLC candles (round 14): open/close resolve by struct
    min/max inside the ONE rollup aggregate — no rank window over the
    event stream, no join, no Python."""
    from iceberg_compaction_spark import registry

    s = plan_of(registry.QUERIES["events_ohlc"](spark, SF))
    assert "Window" not in s
    assert "Join" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_variant_shredded_nested_reads_stay_typed(spark):
    """Nested/array spec shredding (round 15): the two typed reads add
    only their NULL-masked fallback evals on top of encode + shred —
    four Python evals total, no join, no window; the array element
    access is try_element_at over the element groups, JVM-side."""
    from iceberg_compaction_spark import registry

    df = registry.QUERIES["variant_shredded_nested"](spark, SF)
    s = plan_of(df)
    assert s.count("ArrowEvalPython") <= 4
    assert "Join" not in s and "Window" not in s


def test_winnow_one_exchange_shared_sort(spark):
    """Winnowing (round 15): the k-gram lead fold and the w-wide min
    window share ONE hash exchange and ONE sort (same partition +
    order), and the closing distinct reuses the doc_id partitioning —
    no second shuffle, no Python in the plan."""
    import re

    from iceberg_compaction_spark import registry

    p = plan_of(registry.QUERIES["text_winnow"](spark, SF))
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1, p
    assert len(re.findall(r"\bSort \[", p)) == 1, p
    assert p.count("Window [") == 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
