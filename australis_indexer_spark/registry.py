"""Operator registry — the single source of truth for the driver contract.

Every engine op (SURVEY.md §2 inventory + §2.6 relational layer + north-star
extensions) registers here with its Spark implementation and, when
SQL-expressible, the exact DuckDB oracle SQL. ``__spark_entry__.py`` exposes
the registry as ``queries()`` / ``oracle_sql()``.

Determinism contract (why oracles hash-match):
- money sums go through exact integer cents (``det.dsum``) — identical IEEE
  expression trees on both engines, integer accumulation, one final division;
- every computed column is explicitly aliased the same on both sides;
- ranking ties are always broken by a unique key column;
- timestamps are µs precision on both sides (see sources.batch.load_table);
- float32 columns (embeddings) are explicitly CAST to DOUBLE before any
  arithmetic in ORACLE SQL too — DuckDB resolves FLOAT * DECIMAL-literal
  in float32, whose extra rounding step can land exactly on a .5 the
  float64 product avoids (caught by the r4 cross-scale-factor sweep,
  DIFFCHECK_r4_sf0001.txt).
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def ensure_executor_pyfiles(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Ops whose pandas UDFs reference module-level functions (codecs, envelope)
    are cloudpickled *by reference* — the worker must `import
    australis_indexer_spark` itself. When the harness creates its own
    SparkSession from an arbitrary CWD, the workers' PYTHONPATH does not
    include this repo, so we ship the package the Spark-native way:
    `sc.addPyFile` with a zip (works identically on a real cluster).
    """
    sc = spark.sparkContext
    if getattr(sc, "_aispark_pyfiles_added", False):
        return
    zpath = os.path.join(
        tempfile.gettempdir(), f"australis_indexer_spark-{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(_PKG_DIR))
                    zf.write(full, rel)
    sc.addPyFile(zpath)
    sc._aispark_pyfiles_added = True


@dataclass(frozen=True)
class OpSpec:
    name: str
    fn: QueryFn
    oracle: str | None          # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, OpSpec] = {}


def op(name: str, *, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Register an engine op. Used as a decorator over (spark, sf_dir) -> DataFrame."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate op name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_executor_pyfiles(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__
        REGISTRY[name] = OpSpec(
            name=name, fn=wrapped, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


# The correctness driver walks ops in registration order with a ~50-op
# per-round budget. Rounds 1-3 certified 136/244; round 4's window is pure
# certification rotation (VERDICT r3 #1): zero repeats of already-green ops.
# Slots 1-4: the four env-bound ops whose latest driver row is still the r2
#   `no_oracle` red. Their oracles are now genuinely independent —
#   scan_stream: fixture-pinned VALUES with payload char counts re-derived
#   outside Spark (fixture_oracles.py:456); health_check: DuckDB
#   information_schema column counts over the same registered views;
#   cbor_encode: RFC 8949 head-length arithmetic restated in SQL
#   (wire.py:218); compress_roundtrip: DuckDB octet_length + an asserted
#   TRUE the Spark side must prove byte-exactly. They were parked last in
#   r3 and got cut by the window; they go FIRST now.
# Slots 5-50: the 46 highest-user-value never-certified ops — the TPC-H
#   completion (tpch.py), the window/timeseries family, the profiling
#   family, and the relational tail (incl. window_value_functions and
#   join_outer_reconciliation, VERDICT r3 #8).
_PRIORITY = (
    "scan_stream",
    "health_check",
    "cbor_encode",
    "compress_roundtrip",
    "query_nation_pair_trade",
    "query_disjunctive_predicates",
    "query_lateral_topk",
    "query_exists_late_orders",
    "query_waiting_suppliers",
    "query_dormant_rich_customers",
    "query_forecast_revenue",
    "query_market_share",
    "query_customer_distribution",
    "query_promo_revenue",
    "query_top_supplier",
    "query_small_quantity_revenue",
    "query_yoy_growth",
    "query_bridge_decomposition",
    "join_outer_reconciliation",
    "window_value_functions",
    "window_share_of_total",
    "window_running_distinct",
    "window_time_gapfill_locf",
    "window_time_in_state",
    "window_time_ohlc_bars",
    "window_time_interpolate_linear",
    "window_time_rate_of_change",
    "window_pattern_cep",
    "window_sliding_distinct_users",
    "window_longest_streak",
    "window_pareto_concentration",
    "agg_dau_wau_mau",
    "agg_new_vs_returning_users",
    "stats_markov_transitions",
    "stats_seasonality_heatmap",
    "agg_quantile_from_histogram",
    "agg_median_absolute_deviation",
    "profile_constraints",
    "profile_benford_digits",
    "profile_k_anonymity",
    "profile_fd_discovery",
    "profile_parquet_metadata",
    "stats_association_rules",
    "stats_triangle_count",
    "agg_countmin_heavyhitters",
    "agg_histogram_fixed_bins",
    "query_rfm_segmentation",
    "join_null_safe_eq",
    "agg_decimal_money_exact",
    "agg_gini_concentration",
    # --- round-5 pool: the 58 remaining never-certified ops, highest
    # value first; they are past the ~50-op window this round and queue
    # for the next rotation.
    "text_langid_quality",
    "pipeline_dataset_card",
    "udf_pandas_grouped_agg",
    "join_self_temporal_overlap",
    "agg_hll_daily_merge",
    "agg_listagg_ordered",
    "scalar_null_semantics",
    "scan_binary_files",
    "agg_unpivot_roundtrip",
    "stats_degree_distribution",
    "agg_weighted_average_exact",
    "pipeline_index_build",
    "text_cooccurrence_pairs",
    "dedup_minhash_quality",
    "agg_bitmap_set_ops",
    "agg_argmax_latest_order",
    "agg_bitmap_distinct",
    "stream_late_data_policy",
    "stats_join_fanout_estimate",
    "text_boolean_search",
    "sink_zorder_stats",
    "scan_schema_evolution",
    "join_pit_temporal_dim",
    "scan_jsonl_corrupt_tolerant",
    "table_snapshot_diff",
    "pipeline_tombstone_delete",
    "project_props_json",
    "join_dpp_partition_pruned",
    "agg_mode_per_group",
    "pipeline_shard_manifest",
    "join_bloom_prefilter",
    "join_fuzzy_name",
    "text_inverted_index",
    "stream_cdc_upsert",
    "stream_incremental_rollup",
    "multimodal_phash_neardup",
    "sample_importance_weighted",
    "embedding_gram_matrix",
    "stream_windowed_topk",
    "text_tfidf_topterms",
    "join_asof_nearest",
    "udf_pandas_scalar_batch",
    "scalar_higher_order_arrays",
    "sim_ann_quality_curve",
    "stream_ivm_join_view",
    "pipeline_mixture_plan",
    "multimodal_pair_alignment",
    "sample_epoch_shuffle",
    "stream_stateful_cep",
    "udf_python_udtf_chunks",
    "text_langid_margin",
    "stats_ab_experiment_readout",
    "join_strategy_hint_shuffle_hash",
    "dedup_boilerplate_ngrams",
    "text_tokenizer_fertility",
    "sink_csv_gzip_roundtrip",
    "sim_embedding_drift",
    "text_novelty_by_source",
    # --- already driver-green (r3 window, kept for stable ordering) ---
    "sample_split_hash",
    "sample_balanced_strata",
    "sample_reservoir_uniform",
    "pipeline_interleave_mix",
    "text_stats_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_token_count",
    "text_regex_tokenize",
    "text_top_terms",
    "window_session_user",
    "scalar_funcs_showcase",
    "window_time_sliding_events",
    "agg_grouping_sets",
    "pipeline_corpus_curation",
    "project_reencode",
    "stream_stream_join_outcomes",
    "stream_stateful_gap_tracker",
    "sink_compaction",
    "pipeline_decontaminate",
    "text_repetition_stats",
    "doc_chunk_tokens",
    "text_normalize",
    "sink_partitioned_prune",
    "sink_clustered_stats",
    "scan_orc",
    "sim_ann_pq",
    "pipeline_corpus_build",
    "query_shipping_priority",
    "query_local_supplier_volume",
    "query_returned_item_reporting",
    "query_large_volume_customers",
    "text_pii_redact",
    "stream_corpus_ingest",
    "window_time_hierarchical_rollup",
    "pipeline_pack_sequences",
    "agg_cohort_retention",
    "agg_funnel_steps",
    "merge_scd2_dimension",
    "stats_join_key_skew",
    "profile_columns",
    "agg_anomalous_hours",
    "window_rolling_7day_volume",
    "agg_linear_trend",
    "project_props_variant",
    "pipeline_media_curation",
    "sample_temporal_split",
    "sink_custom_publish",
    "scan_custom_source",
    "scan_custom_source_stream",
)


def load_all() -> dict[str, OpSpec]:
    """Import every module that registers ops, then return the registry
    re-ordered so the driver's next 50-op correctness window covers exactly
    the ops that most need (re-)certification.

    Decorator execution fixes the raw registration order per module; the
    explicit ``_PRIORITY`` list then front-loads the never-driver-certified
    ops, the two fixed former reds, and the newly-oracled ops. Everything
    else keeps its prior relative order (all already driver-green in r1/r2).
    """
    from .operators import wire  # noqa: F401  (imports .envelope first)
    from .streaming import cdc, pipeline, rollup, stateful  # noqa: F401
    from .operators import (  # noqa: F401
        curation,
        fuzzy,
        iterative,
        maintenance,
        pq,
        profiling,
        scale,
        storage,
        timeseries,
        tpch,
        sampling,
        similarity,
        text_analysis,
    )
    from .operators import (  # noqa: F401
        dedup,
        explode,
        multimodal,
        project,
        relational,
    )

    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"priority ops not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    # The non-priority remainder (all already driver-green) sorts by NAME:
    # decorator insertion order depends on which module got imported first
    # in this process (cli, tests, or load_all itself), and the driver's
    # walk order — and the CERTIFICATION.md ledger generated from it —
    # must not vary with import history.
    ordered.update(
        (n, REGISTRY[n]) for n in sorted(REGISTRY) if n not in ordered
    )
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
