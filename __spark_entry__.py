"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship profile query at sf0.001 (smoke).
``queries()`` — one named entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL for each SQL-expressible
query; names and output column aliases match exactly.

Convention for oracle parity: every floating-point aggregate is rounded
in-query (ROUND_DIGITS=4 for means/stds/percentiles, 2 for money sums)
on BOTH sides so raw doubles are identical; counts are BIGINT on both
sides (DuckDB integer SUM/COUNT results are cast explicitly).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# self-contained import: works however the driver loads this file
# (module import, importlib-by-path, different cwd)
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession

from sparkobs.io import load_table
from sparkobs import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one-pass numeric profile of lineitem at sf0.001."""
    from sparkobs.operators.profile import table_profile

    df = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    return table_profile(df, "lineitem")


# The driver's correctness gate checks the FIRST 50 registry entries
# only — order the newest / least-driver-proven queries first so each
# round's CORRECTNESS_r{N} certifies the latest work. Names listed here
# lead the registry (in this order); everything else follows in
# definition order. A name that disappears from the registry is
# silently skipped. KEEP len(_PRIORITY) <= GATE_SIZE: entries past
# position 50 are NOT driver-certified this round (queries() warns if
# the list overflows, so evictions are explicit, never silent).
GATE_SIZE = 50

_PRIORITY: list[str] = [
    # --- r5 gate: retire the certification debt. These 28 registry
    # entries have NEVER appeared green in any CORRECTNESS_r*.json
    # (21 never gated + 7 whose last gated run errored; 2 are
    # rows-only by design). All locally green via `make sweep` and
    # via `ORACLE_CHECK_VANILLA=1` (driver-session simulation).
    # After r5 every oracle-able entry is driver-certified >= once.
    # r6 ROTATION PLAN: once CORRECTNESS_r05 lands green, this whole
    # list retires; fill the r6 gate with (a) any r5 failures first,
    # (b) the 20 oracle-tested queries staged in
    #     sparkobs/queries_next.py (promote = move into queries.py
    #     with @query + a slot here; tests/test_r6_queue.py already
    #     holds them to the checker's comparison),
    # (c) the stalest r2-certified entries (profile/pricing/revenue/
    #     shape families) for re-certification.
    # tests/test_gate_hygiene.py enforces that nothing new stays out.
    "collect_metric_lists_supplier",   # r3 ERR (driver array hash) -> CSV-serialized, re-prove first
    "winnowing_fingerprints_documents",  # r3 ERR (same) -> CSV-serialized
    "listing_key_metrics",             # FS-listing family: read_blob
    "listing_prefix_stats",            # oracles written in r4, never
    "listing_storage_stats",           # driver-proven
    "bucket_monitor_metrics",
    "semantic_dedup_embeddings",
    "semantic_dedup_ivf_embeddings",
    "csv_roundtrip_orders",
    "jsonl_roundtrip_events",
    "orc_roundtrip_part",
    "streaming_jsonl_tumbling_events",
    "shipping_priority_q3",
    "returned_items_q10",
    "corr_matrix_lineitem",
    "join_size_lineitem_orders",
    "zscore_events_by_type",
    "group_sample_orders_by_status",
    "split_assign_documents",
    "vocab_topk_documents",
    "normalize_text_documents",
    "pack_manifest_documents",
    "dup_span_coverage_documents",
    "key_skew_stats_lineitem",
    "cdc_compact_events",
    "range_join_value_bands",
    "sample_scan",                     # rows-only by design (seeded)
    "minhash_lsh_pairs_xx64",          # rows-only by design (scale twin)
    # --- round-5 new queries (certify on first gating) ---
    "storage_capacity_stats",          # rows-only (live FS gauge)
    "local_supplier_volume_q5",        # TPC-H Q5 star join
    "forecast_revenue_q6",             # TPC-H Q6 scan-agg
    "late_shipment_priority_q4",       # TPC-H Q4 EXISTS semi join
    "promo_revenue_q14",               # TPC-H Q14 conditional ratio
    "large_orders_q18",                # TPC-H Q18 having-join
    "rollup_revenue_region_nation",    # ROLLUP grouping sets
    "pivot_priority_by_status",        # pivot long->wide
    "unpivot_order_measures",          # stack wide->long
    "top_customers_per_nation",        # WindowGroupLimit top-k
    "token_entropy_documents",         # unigram entropy
    "gopher_quality_documents",        # Gopher rule screen
    "gram_matrix_embeddings",          # distributed gramian
    "pca_project_embeddings",          # rows-only (eigh has no SQL twin)
    "cdc_agg_maintain_events",         # incremental agg maintenance
    "monitor_health_events",           # monitor-of-monitors
    "volume_shipping_q7",              # TPC-H Q7 bilateral trade
    "customer_distribution_q13",       # TPC-H Q13 outer-join histogram
    "small_qty_revenue_q17",           # TPC-H Q17 decorrelated subquery
    "global_sales_opportunity_q22",    # TPC-H Q22 anti join + scalar
    "streaming_monitor_health_events", # streaming metric collection twin
    "bpe_merges_batched_documents",    # rows-only (batched scale mode)
    # (round-4 wave list below rotated out — all driver-certified
    # green in CORRECTNESS_r04.json)
]

_R4_CERTIFIED_ROTATED_OUT = [
    # --- round-4 wave-3 queries (newest, must certify this round) ---
    "contract_checks_orders",                # data-contract suite
    "retention_purge_events",                # governance purge audit
    # join_size_lineitem_orders rotated to the r5 gate (plain COUNT
    # arithmetic both engines — lowest cross-engine risk)
    "hashed_vectors_documents",              # feature-hashing vectorizer
    "sparse_cosine_pairs_documents",         # sparse ANN
    "sparse_cosine_pairs_pruned_documents",  # df-pruned sparse ANN tier
    "bloom_semi_join_lineitem_orders",       # bloom-pruned semi join
    "canonical_dedup_documents",             # keep-best survivor selection
    "vocab_jsd_documents",                   # vocabulary drift
    "ewma_hourly_events",                    # bit-exact EWMA fold
    "heavy_hitters_tokens_documents",        # Misra-Gries + exact recount
    # corr_matrix_lineitem rotated to the r5 gate (builtin corr on
    # both engines, rounded in-query — lowest cross-engine risk)
    "audio_frame_rms_media",                 # audio DSP certification
    # shipping_priority_q3 / returned_items_q10 rotated to the r5 gate
    # (plain OLAP joins/aggs, lowest-risk entries; locally green via
    # `make sweep`)
    "hist_quantiles_lineitem",               # portable quantile sketch
    # group_sample_orders_by_status rotated to the r5 gate (same
    # certified md5-mod machinery as hash_sample_orders, pass r3)
    "curation_funnel_documents",             # capstone pipeline audit
    "session_stats_events",                  # gap-rule sessionization
    "funnel_events",                         # ordered funnel
    "cohort_retention_events",               # cohort matrix
    "resample_locf_events",                  # time-series gap fill
    "fuzzy_match_supplier_customer",         # record linkage
    "streaming_join_click_purchase",         # stream-stream join
    "markov_transitions_events",             # journey transition matrix
    "markov_stationary_events",              # power iteration
    "hll_distinct_lineitem",                 # portable HLL sketch
    "hll_grouped_users_by_type",             # grouped HLL rollup
    "streaming_cms_events",                  # mergeable streaming CMS
    "schema_merge_parquet_documents",        # schema-evolution read
    # zscore_events_by_type rotated to the r5 gate (same window
    # mean/std machinery as r3-certified anomaly_hourly_events)
    "winsorize_events_by_type",              # percentile clipping
    "bpe_merges_documents",                  # distributed BPE training
    "bpe_tokenize_documents",                # BPE train->apply round trip
    "table_diff_orders",                     # row-level reconciliation
    "quantile_bins_lineitem",                # equal-frequency binning
    "quantize_embeddings_vectors",           # int8 embedding quantization
    "cms_vocab_estimates",                   # count-min sketch
    "zorder_tiles_events",                   # Z-order layout keys
    # --- round-4 wave-2 queries (newest, must certify this round) ---
    "line_dedup_documents",                  # C4 boilerplate line dedup
    "bigram_ppl_documents",                  # CCNet LM quality scoring
    "bloom_probe_documents",                 # portable Bloom incremental dedup
    "tfidf_topk_documents",                  # TF-IDF keywords
    "upsample_mixture_documents",            # fractional-epoch mixing
    "inverted_index_documents",              # postings index
    "search_and_documents",                  # conjunctive search
    # --- round-4 new/changed queries (must certify this round) ---
    "pack_sequences_documents",              # new sequence packing
    "partitioned_prune_documents",           # new partitioned sink+prune
    "bucketed_join_orders_lineitem",         # new bucketed co-located join
    "fk_orphans_lineitem",                   # new referential check
    "streaming_cdc_latest_events",           # new stateful CDC stream
    "profile_lineitem_approx",               # new certified-sketch shape
    "streaming_incremental_band_index",      # new query
    # streaming_near_dup_candidates rotated out (certified r3; the
    # round-4 change was perf-only index persist/out-dir reuse)
    "anomaly_hourly_events",                 # deterministic frame ordering
    "near_dup_groups_documents",             # union-find collect path change
    "near_dup_groups_lsh",                   # union-find collect path change
    # --- stalest certified entries (last driver-checked in r2) ---
    # (left out, rotating into the r5 gate — all locally green via
    # `make sweep`: sample_scan, decode_stub_media, frame_sample_media,
    # cosine_topk_lsh, argmax_order_per_status, histogram_returnflag,
    # embedding_norms, text_stats_documents, quality_score_documents,
    # language_id_documents, token_count_regex_documents,
    # fingerprint_documents, binary_stats_media, label_centroid_stats,
    # scalar_string_funcs, timestamp_format_orders, json_extract_events,
    # histogram_quantity, argmax_order, argmax_entity_supplier,
    # grouped_distinct_parts, null_counts_orders, duplicate_count_lineitem,
    # distinct_counts_lineitem, group_agg_orders, limited_scan_topk)
    # (rotated out for the wave-2/3 additions, next gate window:
    # database_monitor_metrics, metrics_fanin_supplier,
    # schema_drift_hourly, window_tumbling_hourly, window_sliding,
    # streaming_count_drift, cosine_topk, record_count_lineitem,
    # sql_monitor_lineitem, lookup_join_fill_nation,
    # snapshot_count_delta, window_session_per_user,
    # streaming_tumbling_events, ngram_jaccard_pairs,
    # dup_span_coverage_documents, pack_manifest_documents,
    # streaming_jsonl_tumbling_events, key_skew_stats_lineitem,
    # cdc_compact_events, semantic_dedup_embeddings,
    # range_join_value_bands, collect_metric_lists_supplier,
    # winnowing_fingerprints_documents, listing_key_metrics,
    # listing_prefix_stats, listing_storage_stats,
    # bucket_monitor_metrics,
    # semantic_dedup_ivf_embeddings,
    # split_assign_documents, normalize_text_documents,
    # vocab_topk_documents, jsonl_roundtrip_events,
    # profile_lineitem_stats, pricing_summary, revenue_per_nation,
    # shape_summary_all, exact_dedup_documents, csv_roundtrip_orders,
    # orc_roundtrip_part — all locally green via `make sweep`)
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = Q.SPARK_QUERIES
    if len(_PRIORITY) > GATE_SIZE:
        import warnings

        warnings.warn(
            f"_PRIORITY has {len(_PRIORITY)} names but the driver gate "
            f"checks only the first {GATE_SIZE} registry entries — "
            f"these will NOT be certified this round: "
            f"{_PRIORITY[GATE_SIZE:]}",
            stacklevel=2,
        )
    ordered = {n: qs[n] for n in _PRIORITY if n in qs}
    ordered.update({n: f for n, f in qs.items() if n not in ordered})
    return ordered


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Oracle SQL per query. A few oracles (the FS-listing family) stat
    the data directory itself via DuckDB read_blob and carry an
    ``{SF_DIR}`` placeholder; the driver runs correctness at sf0.01, so
    the no-arg call (the driver contract) substitutes that path.
    tools/check_oracle.py passes its actual sf dir."""
    return {n: sql.replace("{SF_DIR}", sf_dir) for n, sql in Q.ORACLE_SQL.items()}
