"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE compact (<1.9 KB) JSON line as the FINAL stdout line —
total, sf, reps, query count, and as many slowest-first per-query
p50s as fit (~40; see pack_queries) — sized so the driver's
2,000-byte stdout-tail archive always captures a parseable record.
The FULL per-query map (medians + max-min spread for every query) is
written to BENCH_full.json next to this file on every run:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <scale factor>,
   "reps": N, "spread": {"<name>": max_minus_min_sec, ...},
   "tail_queries": {...},      # every non-headline registry entry, 1 rep
   "duckdb": {...},            # same-SQL p50 on the SAME VM and minute
   "engine_vs_duckdb": ratio}  # spark/duckdb totals over the common set

Each query is an entry from __spark_entry__.queries(); timing covers
plan + execution + a driver-side count (materializes the full result,
like the driver's collect, without pulling wide rows locally).

Per-query time is the MEDIAN of $SPARK_GRAFT_BENCH_REPS runs
(default 3) — wall clock on a shared VM varies +/-30-100% run to run
(BASELINE.md), so single-shot numbers are not comparable across
rounds; "spread" records max-min per query as the noise floor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "profile_lineitem_stats",
    "pricing_summary",
    "revenue_per_nation",
    "shape_summary_all",
    "window_tumbling_hourly",
    "window_session_per_user",
    "snapshot_count_delta",
    "text_stats_documents",
    "exact_dedup_documents",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_hi",
    "minhash_lsh_pairs",
    "cosine_topk",
    "cosine_topk_ivf",
    "asof_join_events_orders",
    "pipeline_filtered_corpus",
    "streaming_tumbling_events",
    # near_dup_groups_documents (the exact-tier comparison leg) was
    # RETIRED from the registry in r12 (tombstone in queries.py, swap
    # ledger #1): the exact tier keeps its driver witness through
    # canonical_dedup_documents, and the ~3 s every-round row is gone
    "near_dup_groups_lsh",
    "chunk_documents",
    # round-3 additions
    "repetition_stats_documents",
    "pii_scrub_documents",
    "hash_sample_orders",
    "quality_topk_per_source",
    "anomaly_hourly_events",
    "psi_drift_hourly_events",
    "decode_synth_media",
    "resize_synth_media",
    "winnowing_fingerprints_documents",
    "streaming_dedup_documents",
    "minhash_lsh_pairs_xx64",
    # round-4 additions
    "semantic_dedup_embeddings",
    "semantic_dedup_ivf_embeddings",
    "dup_span_coverage_documents",
    "pack_sequences_documents",
    "vocab_topk_documents",
    "jsonl_roundtrip_events",
    "pack_manifest_documents",
    "normalize_text_documents",
    "key_skew_stats_lineitem",
    "fk_orphans_lineitem",
    "cdc_compact_events",
    "streaming_cdc_latest_events",
    # round-4 wave-2 additions
    "line_dedup_documents",
    "bigram_ppl_documents",
    "bloom_probe_documents",
    "tfidf_topk_documents",
    "upsample_mixture_documents",
    "bpe_merges_documents",
    "table_diff_orders",
    "quantile_bins_lineitem",
    "quantize_embeddings_vectors",
    "cms_vocab_estimates",
    "zorder_tiles_events",
    "hll_distinct_lineitem",
    "zscore_events_by_type",
    "winsorize_events_by_type",
    "shipping_priority_q3",
    "returned_items_q10",
    "markov_stationary_events",
    "cohort_retention_events",
    "resample_locf_events",
    "fuzzy_match_supplier_customer",
    # round-4 late additions (the r4 median-df pruned sparse-cosine
    # entry was RETIRED in r9 — degenerate on the 31-token fixture;
    # the absolute-cap production tier now certifies and benches over
    # the power-law synth corpus: queue:sparse_cosine_powerlaw_* in
    # the tail; see SCALE.md)
    "bloom_semi_join_lineitem_orders",
    "canonical_dedup_documents",
    "ewma_hourly_events",
    "heavy_hitters_tokens_documents",
    "retention_purge_events",
    "schema_merge_parquet_documents",
    # round-5 additions
    "local_supplier_volume_q5",
    "forecast_revenue_q6",
    "late_shipment_priority_q4",
    "promo_revenue_q14",
    "large_orders_q18",
    "rollup_revenue_region_nation",
    "pivot_priority_by_status",
    "unpivot_order_measures",
    "top_customers_per_nation",
    "token_entropy_documents",
    "gopher_quality_documents",
    "gram_matrix_embeddings",
    "pca_project_embeddings",
    "cdc_agg_maintain_events",
    "monitor_health_events",
    "volume_shipping_q7",
    "customer_distribution_q13",
    "small_qty_revenue_q17",
    "global_sales_opportunity_q22",
    "streaming_monitor_health_events",
    # round-6 additions (the promoted wave + certification twins)
    "market_share_q8",
    "top_supplier_q15",
    "zipf_fit_documents",
    "minmax_norm_events_by_type",
    "hist2d_hour_value_events",
    "chi_square_events_type_hour",
    "debounce_events_user_type",
    "gini_user_activity_events",
    "mad_events_by_type",
    "bigram_pmi_documents",
    "weighted_sample_documents",
    "merkle_diff_orders",
    "ks_drift_events_halves",
    "target_encode_events_type",
    "vocab_segments_documents",
    "compaction_plan_sf_dir",
    "robust_outliers_events",
    "top_event_trigrams",
    "percent_rank_orders_by_status",
    "mutual_info_events_type_hour",
    "bpe_batched_parity_documents",
    "pca_variance_embeddings",
    "compaction_execute_documents",
    # round-7 additions (the promoted queue wave: TPC-H completion,
    # iterative algorithms, exact quantiles, retrieval, observability)
    "product_profit_q9",
    "shipmode_delay_q12",
    "disjunctive_revenue_q19",
    "min_price_supplier_q2",
    "important_parts_q11",
    "supplier_variety_q16",
    "dominant_suppliers_q20",
    "waiting_suppliers_q21",
    "kmeans_embeddings",
    "kmeans_ari_embeddings",
    "pagerank_copurchase",
    "pagerank_personalized_copurchase",
    "exact_quantiles_lineitem",
    "exact_quantiles_grouped_lineitem",
    "triangle_census_suppliers",
    "salted_distinct_customers_orders",
    "attribution_linear_events",
    "bm25_search_documents",
    "epoch_shuffle_documents",
    "km_survival_events",
    # ann_recall_embeddings RETIRED r14 (tombstone in queries.py,
    # swap-ledger #4): the recall certification lives in a pinned
    # sf0.01 witness test now — the ~2 s bench row re-paid the IVF
    # leg's fixed costs (both composed queries stay benched via
    # cosine_topk / cosine_topk_ivf's own rows).
    "merge_upsert_orders",
    "rfm_scores_orders",
    "scd2_user_state_events",
    "streaming_debounce_events",
    "streaming_ks_drift_events",
    # round-8 additions (the promoted r7-queue wave: curation,
    # graph/components, observability, CUBE/zone-map/sliding-HLL,
    # multimodal dedup legs, streaming twins)
    "dim_ablation_recall_embeddings",
    "conversion_paths_events",
    "time_weighted_value_events",
    "budget_select_documents",
    "components_supplier_mutual_knn",
    "event_disorder_events",
    "inclusion_deps_star_schema",
    "streaming_disorder_events",
    "streaming_salted_distinct_events",
    "impact_reach_supply_chain",
    "seasonal_profile_events",
    "lead_lag_corr_events",
    "slo_burn_rate_events",
    "streaming_slo_burn_events",
    "incident_groups_events",
    "diff_columns_orders",
    "monitor_suite_lake",
    "zone_map_prune_orders",
    "cube_revenue_status_priority",
    "hll_sliding_users_events",
    "image_ahash_dedup_media",
    "image_near_dup_media",
    "audio_fingerprint_dedup_media",
    "video_framehash_dedup_media",
    # round-9 additions (the promoted r8-queue wave: KMV quantile
    # sketch family, AVI container leg, theta set algebra, span
    # removal, SLO contracts, streaming twins)
    "kmv_quantiles_lineitem",
    "kmv_quantiles_merged_orders",
    "kmv_quantiles_grouped_lineitem",
    "streaming_kmv_quantiles_events",
    "video_avi_container_media",
    "streaming_hll_sliding_users_events",
    "kmv_sliding_quantiles_events",
    "theta_intersection_cells_events",
    "streaming_theta_intersection_events",
    "span_scrub_documents",
    "percentile_contract_lake",
    # round-10 additions (the promoted r9-queue wave). The exact
    # power-law comparison leg (sparse_cosine_powerlaw_exact) was
    # RETIRED from the registry in r11 (tombstone in queries.py): the
    # pruned-vs-exact gap is a SCALE.md probe + property test now, not
    # a ~17 s every-round tail row.
    "sparse_cosine_powerlaw_pruned",
    "monitor_suite_slo_lake",
    # round-11 additions (the promoted r10-queue wave): grouped theta
    # batch + streaming twin, and the sampled-CI AQP entry
    "theta_intersection_grouped_events",
    "streaming_theta_intersection_grouped_events",
    "sampled_agg_ci_orders",
    # round-12 addition (the promoted r11-queue entry): join-side AQP
    "sampled_join_agg_ci_lineitem",
]

# HEADLINE is the cross-round-comparable curated set (reps=3 medians,
# tripwire-guarded vs BENCH_baseline.json). EVERY other registered
# query is additionally benched once per round (reps=1 after one
# warm-up) into BENCH_full.json["tail_queries"], so no registry entry
# goes unmeasured — the rule the r6 verdict asked to make explicit.

# Headline queries with NO same-session DuckDB comparison row, each
# with the reason (r13 verdict item 6: a silent gap reads as
# "covered"; an explicit ledger cannot). These are exactly the
# rows-only registry entries whose operation has no DuckDB-
# expressible oracle — there is no SQL to time, so no comparison is
# POSSIBLE, not merely skipped. test_bench_tripwire pins that every
# benched headline query is either compared or listed here.
DUCKDB_UNCOMPARABLE = {
    "compaction_execute_documents": (
        "executes an on-disk small-file compaction (writes + swaps a "
        "staged directory); the certified values are the post-state "
        "of a filesystem side effect, not a query DuckDB can run"
    ),
    "minhash_lsh_pairs_xx64": (
        "engine-specific xxhash64 signature tier — DuckDB has no "
        "xxhash64; value certification rides the md5-tier pair-set "
        "parity witnesses (tests/test_dedup_similarity.py), and the "
        "portable md5 tier (minhash_lsh_pairs) carries the "
        "same-session comparison row"
    ),
    "pca_project_embeddings": (
        "per-row projections are eigenvector-sign/rotation specific "
        "(engine BLAS); value certification rides the "
        "pca_variance_embeddings invariant twin, which carries the "
        "comparison row"
    ),
}


def timed_reps(run, reps: int, warmup: int, release) -> tuple[list[float], int]:
    """Warm-up then timed reps with a CLEAN-CACHE guarantee (r14 verdict
    item 1): ``release()`` — the session-state reset (SQL cache clear +
    candidate unpersist) — runs after the warm-ups and again BEFORE
    EVERY timed rep, so no timed rep can ride SQL-cache entries built
    by the warm-up or by a previous rep. Without this, ``persist()``-
    based pins (pin_corpus_frame, the LSH candidate persists) are
    matched by CacheManager on canonicalized-plan identity across
    reps and the timed p50 reads warm blocks — banked flattery, the
    same class as the curation memo removed in r14. The release cost
    itself stays OUTSIDE the timer. Returns (times, last row count)."""
    for _ in range(warmup):
        run()
    out: list[float] = []
    n = 0
    for _ in range(reps):
        release()
        t0 = time.perf_counter()
        n = run()
        out.append(time.perf_counter() - t0)
    release()
    return out, n


def pack_queries(timings: dict, budget: int = 1400) -> dict:
    """As many per-query p50 rows as fit ``budget`` bytes, slowest
    first (r14 verdict item 4, constrained by the driver contract):
    the driver archives only the LAST 2,000 bytes of stdout, and a
    final line longer than that truncates into unparseable JSON
    (BENCH_r03: "parsed": null). The full 177-row map is ~5.5 KB
    compact — it CANNOT fit — so the one-line record carries the
    largest slowest-first prefix that keeps the line parseable
    (~40 rows, every row ≳1 s — the range where a regression is
    distinguishable from fixed-cost noise). Additions-only: the
    top-10 rows are still the first 10 entries. The full map stays
    in BENCH_full.json."""
    packed: dict[str, float] = {}
    used = 2  # braces
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        cost = len(name) + len(json.dumps(sec)) + 4  # quotes, colon, comma
        if used + cost > budget:
            break
        packed[name] = sec
        used += cost
    return packed


def drift_band(
    ratio: float | None,
    cal_spark: float,
    cal_duckdb: float,
    base_cal: dict,
    tol: float = 0.05,
) -> tuple[dict, list | None]:
    """Calibration-drift band (BASELINE.md policy, r12 verdict item 2;
    trigger widened r14 per r13 ADVICE): returns ({spark, duckdb}
    drift factors vs the frozen baseline's fixed-workload rows,
    band-or-None). The band fires whenever the JOINT ratio distortion
    the two drifts imply (s_drift/d_drift divergence) exceeds ``tol``
    — sign agreement is irrelevant: only EQUAL same-direction drift
    (the shared-VM-load case the policy's rationale covers) divides
    out of the ratio, while one-sided drift (spark ~1.00× while
    duckdb runs 1.20×, or either leg exactly at baseline) distorts
    it just as much as a sign disagreement. The earlier sign-product
    gate ((s−1)·(d−1) < 0) missed exactly those cases; before that, a
    per-side threshold missed spark +4% / duckdb −20%. The caveat
    message keeps the per-side factors so the direction information
    is not lost. Pure so the trigger is unit-testable without
    running a bench."""
    s_drift = cal_spark / base_cal["spark_fixed_agg"]
    d_drift = cal_duckdb / base_cal["duckdb_fixed_agg"]
    drift = {"spark": round(s_drift, 3), "duckdb": round(d_drift, 3)}
    if ratio is None:
        return drift, None
    rel = max(s_drift / d_drift, d_drift / s_drift)
    if rel - 1 > tol:
        adjusted = round(ratio * d_drift / s_drift, 3)
        return drift, sorted([ratio, adjusted])
    return drift, None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from sparkobs.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("sparkobs-bench")
    qs = entrymod.queries()

    # warm the JVM/session so the first timed query doesn't pay startup,
    # and warm the Python/Arrow worker path (first mapInPandas in a
    # session pays worker + Arrow init, measured up to ~30 s when it
    # lands after a long chain of JVM-heavy stages)
    spark.range(1000).selectExpr("sum(id)").collect()

    def _ident(batches):
        for b in batches:
            yield b

    spark.range(1000).selectExpr("id", "cast(id as double) x").repartition(8).mapInPandas(
        _ident, "id long, x double"
    ).count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "2")))

    # Environment calibration: the shared VM drifts up to ~1.5x
    # between rounds (r10 measured the same-session DuckDB leg at
    # 291s vs ~200s in every earlier round on identical SQL), which
    # poisons naive cross-round BENCH ratios. Time one FIXED workload
    # on each engine so a later reader can normalize: drift-adjusted
    # ratio = (total_a / cal_a) / (total_b / cal_b).
    _cal_sql = (
        "SELECT l_returnflag, l_linestatus, sum(l_quantity) q, "
        "sum(l_extendedprice) p, avg(l_discount) d, count(*) n "
        "FROM {src} GROUP BY 1, 2"
    )
    def _median3(fn):
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return round(sorted(ts)[1], 4)

    _li = f"{sf_dir}/lineitem.parquet"
    spark.read.parquet(_li).createOrReplaceTempView("__cal_lineitem")
    spark.sql(_cal_sql.format(src="__cal_lineitem")).collect()  # warm
    cal_spark = _median3(
        lambda: spark.sql(_cal_sql.format(src="__cal_lineitem")).collect()
    )
    spark.catalog.dropTempView("__cal_lineitem")
    import duckdb as _duck

    _con = _duck.connect()
    _q = _cal_sql.format(src=f"read_parquet('{_li}')")
    _con.execute(_q).fetchall()  # warm
    cal_duckdb = _median3(lambda: _con.execute(_q).fetchall())
    _con.close()
    calibration = {"spark_fixed_agg": cal_spark, "duckdb_fixed_agg": cal_duckdb}
    print(f"# calibration: {calibration}", file=sys.stderr)

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}

    baseline_tables = {t.name for t in spark.catalog.listTables()}

    def _release_session_state():
        # queries that persist intermediates (LSH candidate frames) or
        # register memory-sink tables would otherwise accumulate cached
        # blocks across the ~150 executions of a full bench, degrading
        # the queries that run late in the session — measure each from
        # a clean cache state
        from sparkobs.operators.dedup import unpersist_candidates

        unpersist_candidates()
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.name not in baseline_tables and t.tableType == "TEMPORARY":
                spark.catalog.dropTempView(t.name)

    missing = [n for n in HEADLINE if n not in qs]
    if missing:
        print(f"# HEADLINE names not in the registry (skipped): {missing}",
              file=sys.stderr)

    for name in HEADLINE:
        if name in missing:
            continue
        fn = qs[name]
        # untimed warm-up rep(s) inside timed_reps: the first execution
        # pays whole-stage-codegen compilation (hundreds of ms to
        # seconds for wide generated functions) — JIT cost, not engine
        # cost; the session state is released before EVERY timed rep so
        # no rep rides cache entries built by a previous one (r15
        # methodology fix, r14 verdict item 1 — see timed_reps)
        runs, n = timed_reps(
            lambda: fn(spark, sf_dir).count(), reps, warmup,
            _release_session_state,
        )
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)
        spread[name] = round(runs[-1] - runs[0], 3)
        print(
            f"# {name}: p50={timings[name]}s spread={spread[name]}s ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)

    # --- tail: bench every registered query not in HEADLINE once ---
    # (reps=1 after one warm-up; excluded from the headline total and
    # the tripwire — a coverage record, not a comparison series)
    tail_timings: dict[str, float] = {}
    tail_skipped: list[str] = []
    if os.environ.get("SPARK_GRAFT_BENCH_TAIL", "1") != "0":
        tail_budget = float(os.environ.get("SPARK_GRAFT_BENCH_TAIL_BUDGET", "600"))
        t_tail0 = time.perf_counter()
        tail_names = [n for n in qs if n not in set(HEADLINE)]
        # staged-queue entries bench in the tail too (keyed
        # "queue:<name>"), so a staged perf claim — e.g. the sparse-
        # cosine production tier beating the exact tier — is a
        # recorded BENCH_full row, not an assertion
        try:
            from sparkobs.queries_next import R7_QUEUE

            queue_fns = {f"queue:{n}": fn for n, (fn, _) in R7_QUEUE.items()}
        except Exception:  # noqa: BLE001 — queue is optional
            queue_fns = {}
        qs = dict(qs, **queue_fns)
        # queue rows lead the tail: they carry staged perf CLAIMS
        # (e.g. pruned-vs-exact), so a budget-exhausted slow round
        # must cut registry coverage rows (re-measured every round)
        # before it cuts these
        tail_names = list(queue_fns) + tail_names
        for name in tail_names:
            if time.perf_counter() - t_tail0 > tail_budget:
                # += : earlier FAILED names already recorded must not
                # be discarded by the budget cut
                tail_skipped += tail_names[tail_names.index(name):]
                print(
                    f"# tail budget ({tail_budget}s) exhausted — "
                    f"{len(tail_skipped)} queries unmeasured this run",
                    file=sys.stderr,
                )
                break
            try:
                # one warm-up (codegen JIT) + one timed rep, with the
                # same clean-cache-before-the-timed-rep guarantee as
                # the headline loop (timed_reps)
                runs, _n = timed_reps(
                    lambda: qs[name](spark, sf_dir).count(), 1, 1,
                    _release_session_state,
                )
                tail_timings[name] = round(runs[0], 3)
            except Exception as exc:  # noqa: BLE001 — record, keep benching
                tail_skipped.append(name)
                print(f"# tail {name} FAILED: {exc}", file=sys.stderr)
                _release_session_state()

    # --- DuckDB same-SQL leg, SAME session/VM/minute (the r6 verdict:
    # cross-session ratios drift with shared-VM load — 2.29x stale vs
    # 1.15x real). p50 of the same rep count per headline oracle; a
    # first run past the per-query budget is recorded as-is (1 rep). ---
    duckdb_timings: dict[str, float] = {}
    duckdb_skipped: list[str] = []
    ratio = None
    if os.environ.get("SPARK_GRAFT_BENCH_DUCKDB", "1") != "0":
        import duckdb

        per_q_budget = float(os.environ.get("SPARK_GRAFT_BENCH_DUCKDB_QBUDGET", "20"))
        total_budget = float(os.environ.get("SPARK_GRAFT_BENCH_DUCKDB_BUDGET", "420"))
        oracles = entrymod.oracle_sql(sf_dir)
        tables = "region nation customer supplier part orders lineitem events documents embeddings".split()

        def _fresh_con():
            c = duckdb.connect()
            for t in tables:
                p = os.path.join(sf_dir, f"{t}.parquet")
                if os.path.exists(p):
                    c.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                    )
            return c

        con = _fresh_con()
        t_dk0 = time.perf_counter()
        # coverage-first: ONE timed run for EVERY headline oracle, then
        # extra reps (up to `reps`, cheapest-first) only while budget
        # remains — a p50 series for most queries, never a silent gap
        named = [(n, oracles[n]) for n in HEADLINE if n in oracles and n in timings]
        dk_runs: dict[str, list[float]] = {}
        # the comparison-coverage ledger: benched headline queries
        # with no oracle SQL must each carry a documented reason
        for n in HEADLINE:
            if n in timings and n not in oracles and n not in DUCKDB_UNCOMPARABLE:
                print(
                    f"# WARNING: {n} benched without a DuckDB "
                    f"comparison row and without a documented reason "
                    f"in DUCKDB_UNCOMPARABLE",
                    file=sys.stderr,
                )
        def _timed_run(sql: str, cap: float) -> float | None:
            # DuckDB has no in-query timeout; a watchdog thread
            # interrupts the connection so one unrolled-CTE oracle can
            # never run the whole bench past its budget. The callback
            # re-checks `done` under a lock (Timer.cancel() races the
            # firing callback), `done` is set under the lock IMMEDIATELY
            # after fetchall() returns (narrowing the post-completion
            # window to a few bytecodes), and if the callback still
            # managed to fire after a successful run — the one
            # remaining interleaving — the pending interrupt would
            # poison the shared connection for the NEXT query, so the
            # connection is rebuilt (r7 ADVICE; window closed fully
            # per r8 ADVICE).
            import threading

            nonlocal con
            done = threading.Event()
            lock = threading.Lock()
            fired = threading.Event()

            def _interrupt():
                with lock:
                    if not done.is_set():
                        fired.set()
                        con.interrupt()

            timer = threading.Timer(cap, _interrupt)
            timer.start()
            try:
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                with lock:
                    done.set()
                return time.perf_counter() - t0
            finally:
                with lock:
                    done.set()
                timer.cancel()
                if fired.is_set():
                    # the watchdog fired: whether it aborted the query
                    # (normal timeout) or landed in the few-bytecode
                    # window after completion, a possibly-unconsumed
                    # interrupt must never reach the next query —
                    # rebuild the connection (cheap: 10 view DDLs)
                    try:
                        con.close()
                    except Exception:  # noqa: BLE001
                        pass
                    con = _fresh_con()

        for name, sql in named:
            elapsed = time.perf_counter() - t_dk0
            if elapsed > total_budget:
                duckdb_skipped.append(name)
                continue
            try:
                # first (coverage) run capped at the budget remainder,
                # floored at per_q_budget so early queries can't starve
                dt = _timed_run(sql, max(per_q_budget, total_budget - elapsed))
                dk_runs[name] = [dt]
            except Exception as exc:  # noqa: BLE001
                duckdb_skipped.append(name)
                print(f"# duckdb {name} FAILED: {exc}", file=sys.stderr)
        for _ in range(reps - 1):
            for name, sql in sorted(
                named, key=lambda kv: dk_runs.get(kv[0], [9e9])[0]
            ):
                if name not in dk_runs or dk_runs[name][0] > per_q_budget:
                    continue  # one expensive run is record enough
                remaining = total_budget - (time.perf_counter() - t_dk0)
                if remaining <= 0:
                    break
                try:
                    dk_runs[name].append(
                        _timed_run(sql, max(per_q_budget, remaining))
                    )
                except Exception:  # noqa: BLE001 — keep the first run;
                    # one failed extra rep (e.g. a late watchdog
                    # interrupt) must not cancel every remaining
                    # query's reps and skew their p50 to a single run
                    continue
        for name, runs in dk_runs.items():
            runs.sort()
            # lower-middle for even run counts: a budget cut after an
            # even rep must not report the WORST run as the "median"
            duckdb_timings[name] = round(runs[(len(runs) - 1) // 2], 3)
        common = sorted(set(duckdb_timings) & set(timings))
        d_total = sum(duckdb_timings[n] for n in common)
        s_total = sum(timings[n] for n in common)
        if d_total > 0:
            ratio = round(s_total / d_total, 3)
        print(
            f"# engine_vs_duckdb: {ratio}x over {len(common)} common "
            f"queries (engine {round(s_total, 2)}s vs duckdb "
            f"{round(d_total, 2)}s, same session)",
            file=sys.stderr,
        )

    # Ratio honesty when the calibrations drifted UNEQUALLY vs the
    # frozen baseline (BASELINE.md "Calibration-drift policy", r12
    # verdict item 2, trigger widened r14: the final r12 artifact
    # recorded 0.208x uncaveated while the per-engine calibration
    # rows had drifted apart — the honest number was a ~0.2-0.42x
    # band; only equal same-direction drift divides out of the ratio).
    # Drift factor per engine = fixed-workload time now / at baseline;
    # the adjusted ratio divides each side's total by its own drift.
    # Computed HERE so the artifact itself carries the band — a prose
    # caveat can be forgotten, a recorded field cannot.
    ratio_band = None
    calibration_drift = None
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_baseline.json")
        ) as fh:
            base_cal = json.load(fh).get("calibration") or {}
        calibration_drift, ratio_band = drift_band(
            ratio, cal_spark, cal_duckdb, base_cal
        )
        if ratio_band is not None:
            print(
                f"# engine_vs_duckdb CAVEAT: calibrations drifted "
                f"unequally vs baseline "
                f"(spark {calibration_drift['spark']:.2f}x, "
                f"duckdb {calibration_drift['duckdb']:.2f}x) — honest "
                f"band {ratio_band[0]}-{ratio_band[1]}x, raw {ratio}x",
                file=sys.stderr,
            )
    except Exception as exc:  # noqa: BLE001 — band is best-effort
        print(f"# calibration-drift band unavailable: {exc}", file=sys.stderr)

    full = {
        "metric": "headline_query_wall_clock_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "reps": reps,
        "spread": spread,
        "tail_queries": tail_timings,
        "tail_skipped": tail_skipped,
        "duckdb": duckdb_timings,
        "duckdb_skipped": duckdb_skipped,
        "duckdb_uncomparable": {
            n: r for n, r in sorted(DUCKDB_UNCOMPARABLE.items()) if n in timings
        },
        "engine_vs_duckdb": ratio,
        "engine_vs_duckdb_band": ratio_band,
        "calibration": calibration,
        "calibration_drift": calibration_drift,
    }
    # The driver archives only the LAST 2,000 bytes of stdout — a
    # 69-query map blows past that and truncates into unparseable
    # JSON (BENCH_r03/r04 "parsed": null). Persist the full table
    # in-repo and emit a compact (<1.5 KB) summary as the FINAL
    # stdout line so the archived tail always parses standalone.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json")
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # slowest-first prefix sized to keep the final line inside the
    # driver's 2,000-byte stdout-tail archive (see pack_queries) —
    # additions-only vs the old top-10 (same 10 rows lead the map)
    slowest = pack_queries(timings)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "reps": reps,
                "n_queries": len(timings),
                "n_tail": len(tail_timings),
                "engine_vs_duckdb": ratio,
                "engine_vs_duckdb_band": ratio_band,
                "calibration": calibration,
                "queries": slowest,
                "full": "BENCH_full.json",
            },
            separators=(",", ":"),  # compact: the line must stay well
            # inside the driver's 2,000-byte stdout-tail archive
        )
    )


if __name__ == "__main__":
    main()
