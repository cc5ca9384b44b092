"""Physical-plan audit: capture explain('formatted') for the
scale-critical queries and check the properties that matter at 100 TB
(filter pushdown, column pruning, broadcast joins, whole-stage codegen,
partial aggregation)."""
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_8million_data__spark.plans import all_queries
from etl_8million_data__spark.session import get_spark

AUDIT = {
    "tpch_q6_forecast_revenue": ["PushedFilters", "codegen id", "HashAggregate"],
    "group_agg_pricing_summary": ["PushedFilters", "HashAggregate", "codegen id"],
    "scan_project_filter": ["PushedFilters", "ReadSchema"],
    "regional_revenue_5way_join": ["BroadcastHashJoin", "HashAggregate"],
    "segment_revenue_broadcast_join": ["BroadcastHashJoin"],
    "tpch_q3_shipping_priority": ["BroadcastHashJoin", "TakeOrderedAndProject"],
    "topk_orders_global": ["TakeOrderedAndProject"],
    "anti_join_customers_without_orders": ["PushedFilters"],
    "dedup_minhash_lsh_pairs": ["HashAggregate"],
    "similarity_knn_bruteforce": ["Broadcast"],
    "dedup_simhash": ["codegen id", "HashAggregate"],
    "corpus_term_frequencies": ["TakeOrderedAndProject", "HashAggregate"],
    "tpch_q21_suppliers_kept_waiting": ["LeftSemi", "HashAggregate"],
    "tpch_q17_small_quantity_revenue": ["BroadcastHashJoin", "HashAggregate"],
    "tpch_q20_dominant_part_suppliers": ["BroadcastHashJoin", "LeftSemi", "HashAggregate"],
    "corpus_benchmark_contamination": ["BroadcastHashJoin", "HashAggregate"],
    "tpch_q10_returned_item_top_customers": ["TakeOrderedAndProject", "PushedFilters"],
    "window_rank_zoo_per_customer": ["Window"],
    "corpus_e2e_curation": ["BroadcastHashJoin", "HashAggregate", "Window"],
    "corpus_domain_quota_sample": ["Window"],
    "dedup_exact_substring_spans": ["HashAggregate", "LeftSemi", "Window"],
    "dedup_semantic_keepers": ["LeftAnti", "HashAggregate"],
    "corpus_content_defined_chunks": ["Window", "HashAggregate"],
    "corpus_shard_assignment": ["Window"],
    "embedding_label_centroids": ["HashAggregate", "Generate"],
    "events_ohlc_hourly": ["Window", "HashAggregate"],
    "dedup_cut_substring_spans": ["Window", "HashAggregate"],
    "corpus_ngram_novelty": ["HashAggregate"],
    "corpus_mixture_epochs": ["Generate"],
    "corpus_e2e_training_order": ["Window", "BroadcastHashJoin"],
    "sketch_count_min_heavy_hitters": ["BroadcastHashJoin", "HashAggregate", "TakeOrderedAndProject"],
    "events_click_attribution_range_join": ["Window", "HashAggregate"],
    "events_asof_latest_order": ["Window"],
    "moving_avg_and_ntile": ["Window", "BroadcastHashJoin", "HashAggregate"],
    "range_bounds_sampled_orders": ["PushedFilters", "Window"],
    # round-7 families
    "similarity_knn_ivf_pq": ["LeftSemi", "HashAggregate", "Window"],
    "similarity_knn_ivf_pq_rerank": ["HashAggregate", "Window"],
    "similarity_knn_pq_adc": ["HashAggregate", "Window"],
    "sketch_bloom_membership": ["HashAggregate"],
    "sketch_bloom_pruned_antijoin": ["BroadcastNestedLoopJoin", "LeftAnti"],
    # kcore's peeling rounds (degree agg + two LeftSemi per round) sit
    # UPSTREAM of per-round localCheckpoints, so the final plan starts
    # at the last checkpointed RDD; only the closing degree aggregate
    # is visible here (the per-round shape is pinned by the operator
    # tests instead).
    "dedup_graph_kcore": ["HashAggregate"],
    # same: the 64-row k-min ranking window is checkpointed; the
    # visible plan is the bounded joins + final aggregates.
    "sketch_kmv_type_overlap": ["HashAggregate", "BroadcastHashJoin"],
    # binary-signature family: quantize is a pure narrow map (scan ->
    # project, zero exchanges asserted below); the rerank's Hamming
    # stage broadcasts query signatures and both stages rank through
    # windows; the GEMM path shows the Arrow-batched MapInPandas over
    # the blocked crossJoin plus the final per-query window.
    "embedding_binary_quantize": ["ReadSchema"],
    "similarity_knn_hamming_rerank": ["BroadcastHashJoin", "Window"],
    "similarity_knn_gemm": ["MapInPandas", "Window", "HashAggregate"],
    # probe training: the visible plan is the final scoring pass only —
    # the Gram MapInPandas and GD loop sit behind the k-bounded weight
    # checkpoint, so what must show is exactly one corpus scan crossed
    # with the broadcast 1-row weight array.
    "embedding_linear_probe": ["BroadcastNestedLoopJoin", "Scan parquet"],
    # SNM: block-partitioned windows (never a data-sized global sort) +
    # candidate-only verify joins.
    "dedup_sorted_neighborhood_pairs": ["Window", "HashAggregate"],
    # round-8 families
    # persisted learned-IVF probe: the index scan must carry the routed
    # literal partition filter (PartitionFilters with cell IN) and the
    # final ranking window; the probe side stays unhinted.
    "similarity_knn_ivf_kmeans_persisted": ["PartitionFilters", "Window"],
    # persisted IVF-PQ probe: probed-cell partition filter on the codes
    # scan + the unpack Generate + the ADC hash aggregate.
    "similarity_knn_ivf_pq_persisted": ["PartitionFilters", "Generate", "HashAggregate"],
    # MMR: each greedy round's join/argmax-window sits UPSTREAM of its
    # round's localCheckpoint (lineage truncation, like kcore) and the
    # assembled picks union is itself checkpointed — the final visible
    # plan is exactly the checkpointed RDD scan (audited r11).
    "search_mmr_diversified": ["ExistingRDD"],
    # bottom-k quantile sketch: the 256-row hash sample must be
    # per-partition heaps (TakeOrderedAndProject), never a global sort;
    # the exact-audit side ranks through bucket-partitioned windows.
    "sketch_bottomk_quantiles": ["TakeOrderedAndProject", "Window"],
    "sketch_bottomk_quantiles_by_group": ["Window", "HashAggregate"],
    # weighted sample: bounded ticket explode (Generate), min-ticket
    # hash aggregate with map-side partials, bottom-100 via TakeOrdered.
    "corpus_weighted_sample_tickets": ["Generate", "HashAggregate", "TakeOrderedAndProject"],
    # join-cardinality sketch: per-side histograms are hash aggregates;
    # the coordinated TakeOrdered sample sits UPSTREAM of its
    # localCheckpoint (kcore pattern), so only the scoring aggregates
    # are visible; key scans are pruned to the key column (ReadSchema).
    "sketch_join_cardinality": ["HashAggregate", "ReadSchema"],
    # RRF fusion: channel top-10s are checkpointed; the visible plan is
    # the |Q|x10 full-outer fusion join + final window.
    "search_hybrid_rrf_fusion": ["Window"],
    # round-10 families
    # golden records: components rounds + weighted pairs are
    # checkpointed; visible = the survivorship joins/aggregates.
    "linkage_e2e_golden_records": ["HashAggregate"],
    # SNM candidate stage: ranked frame checkpointed; visible = the
    # window-offset Generate + the integer-rank equi join + pattern agg.
    "linkage_agreement_patterns": ["Generate", "HashAggregate"],
    "linkage_blocking_quality": ["HashAggregate"],
    # incremental probe: prefix-block equi join + weight filter only
    # (u collected once, decisions are a narrow projection).
    "linkage_incremental_matches": ["Join"],
    "privacy_t_closeness": ["HashAggregate"],
    # advisor: stat frames aggregate from checkpointed histograms and
    # cross as broadcasts; the advised joins never execute.
    "advisor_join_strategy": ["HashAggregate"],
    # proximity: checkpointed postings semi-filtered to query words,
    # doc-keyed pair join, per-query ranking window.
    "search_proximity_min_window": ["Window", "HashAggregate"],
    "ivm_agg_view_delete": ["LeftSemi", "HashAggregate"],
    # round-11 families
    # golden maintenance: ridmap/members/edges reads are bucket-pruned
    # scans behind the operator; the returned frame is the golden read.
    "linkage_golden_records_increment": ["ReadSchema"],
    "linkage_forget_golden": ["ReadSchema"],
    # salted advice executed: small side exploded across salt buckets
    # (Generate), join on (key, _salt), map-side-partial final agg.
    "advisor_salted_join_exec": ["Generate", "HashAggregate"],
    # SCD2 increments: bucket-pruned state reads inside the operator;
    # the returned frame is the interval-table read.
    "events_scd2_incremental": ["ReadSchema"],
    # layout advisor: per-layout bucket histogram + co-partitioned
    # rank; zone tables are 64 rows; preds broadcast-crossed.
    "advisor_layout_zonemap": ["HashAggregate", "Window"],
    # incremental curation: per-batch signature build + compact
    # index equi-join; visible = the kept-set union.
    "corpus_incremental_curation": ["Union"],
    # table diff: phase-1 checksums are map-side-combined aggregates;
    # phase 2 is the differing-buckets-only full-outer join.
    # phase 1's checksum aggregate executes EAGERLY inside diff_tables
    # (budget.collect) — the returned frame's plan is phase 2 only
    "ops_table_diff": ["FullOuter"],
    "ops_replica_audit": ["FullOuter"],
    "advisor_layout_exec": ["PushedFilters", "HashAggregate"],
    "ops_version_cdc": ["FullOuter"],
    "advisor_layout_drift": ["HashAggregate", "Window"],
    "ops_store_lifecycle_audit": ["HashAggregate"],
    "ops_cdc_apply": ["HashAggregate"],
    # round-13 ops/advisor doors: the applies/compaction/migration run
    # eagerly inside the builders (the doors ARE the query); the
    # returned frames are the audits — final totals aggregate crossed
    # with broadcast fsck/drift singletons, and for the advisor the
    # churn measurement aggregate + broadcast table-rows singleton.
    "ops_cdc_apply_versioned": ["HashAggregate"],
    "ops_cdc_producer_stream": ["HashAggregate"],
    "ops_store_compaction_audit": ["HashAggregate"],
    "ops_rebucket_migration": ["HashAggregate"],
    "advisor_bucket_count": ["HashAggregate", "BroadcastNestedLoopJoin"],
    "ops_schema_evolution": ["HashAggregate"],
    # telemetry advisor: the doors + advice run eagerly in the builder
    # (driver-side sidecar reads); the returned frame is the 1-row
    # local advice — nothing to audit beyond its scan-free shape
    "advisor_rebucket_telemetry": ["Scan ExistingRDD"],
    "ops_retention_sweep": ["HashAggregate"],
    # round-14 compaction advisor: census + door + re-census run
    # eagerly in the builder (driver-side listings); the returned frame
    # is the 1-row decision record — scan-free local relation
    "advisor_compaction": ["Scan ExistingRDD"],
    # retention lifecycle: publish/stream/truncate/vacuum run eagerly in
    # the builder; the returned frame is the visible-rows aggregate
    # crossed with the recorded lifecycle counts
    "ops_cdc_retention": ["HashAggregate"],
    "ops_cdc_stream_evolution": ["HashAggregate"],
    # log fsck: audits + repairs run eagerly driver-side; the returned
    # frame is the 1-row census record
    "ops_cdc_log_fsck": ["Scan ExistingRDD"],
    "ops_replica_repair": ["HashAggregate"],
}

# Queries whose scale story is "exactly N shuffles" — assert the count.
MAX_EXCHANGES = {
    "pipeline_financials_unpivot": 1,  # repartition(symbol) reused by window + 3 aggs
    "dedup_simhash": 2,  # spread() repartition + the per-doc hash agg
    "embedding_binary_quantize": 0,  # signature build is a pure narrow map
}

def main():
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    sf = "/root/testdata/sf0.1"
    report = []
    for name, expects in AUDIT.items():
        df = qs[name].build(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        checks = {e: (e in plan) for e in expects}
        if "codegen id" in checks and not checks["codegen id"]:
            # AQE omits codegen ids from the pre-execution formatted
            # plan; execute THIS DataFrame (small results only) so its
            # own query execution finalizes, then inspect it.
            df.collect()
            final = df._jdf.queryExecution().executedPlan().toString()
            # '*(N)' prefixes are the WholeStageCodegen markers in the
            # finalized AQE plan's simple string.
            checks["codegen id"] = "*(" in final
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        schemas = re.findall(r"ReadSchema: (.*)", plan)
        report.append((name, checks, pushed[:3], [s[:120] for s in schemas[:3]]))
        print(f"== {name}")
        for e, ok in checks.items():
            print(f"   {'OK ' if ok else 'MISS'} {e}")
        for p in pushed[:3]:
            print(f"   pushed: {p[:140]}")
        for s in schemas[:3]:
            print(f"   schema: {s[:140]}")
    n_miss = sum(
        1 for _, checks, _, _ in report for ok in checks.values() if not ok
    )
    for name, max_ex in MAX_EXCHANGES.items():
        df = qs[name].build(spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n = plan.count("Exchange")
        ok = n <= max_ex
        n_miss += 0 if ok else 1
        print(f"== {name}: {n} Exchange(s) "
              f"{'OK' if ok else f'MISS (expected <= {max_ex})'}")
    spark.stop()
    if n_miss:
        print(f"AUDIT FAILED: {n_miss} MISS")
        sys.exit(1)
    print("AUDIT OK")

if __name__ == "__main__":
    main()
