"""Round-8 registry queue — implemented, unit-tested, oracle-ready.

Same staging discipline as the round-6/7 queues (both promoted in
full, oldest-staged first): these queries are NOT in
``sparkobs.queries.SPARK_QUERIES`` yet because the driver certifies
only the first ``GATE_SIZE`` (50) registry entries per round and the
round-7 gate is exactly full with the 50 oldest-staged r7 entries —
registering these now would create certification debt that
``tests/test_gate_hygiene.py`` rejects. They are held here with their
DuckDB oracles and exercised by ``tests/test_r7_queue.py`` with the
checker's own comparison; promoting one = move its entry into
``queries.py`` with the ``@query`` decorator and a ``_PRIORITY``
slot.

This wave (``len(R7_QUEUE)`` is authoritative — the 17 newest-staged
r7 entries held back by the 50-slot gate, promoted first in r8):
an embedding-dimension ablation recall certification
(Matryoshka-style half-dim neighbor preservation vs the full-dim
ground truth), top conversion paths (journey mining on the
attribution tagging), duration-weighted time-in-state means
(DECIMAL(38,0) cents-microsecond accumulators), token-budget dataset
selection (greedy quality prefix under an integer cumulative-token
cut), supplier communities via mutual-kNN sparsification +
fixed-round min-label components (replayable by an unrolled linear
CTE chain), an event-time disorder diagnostic (distributed
strictly-preceding prefix max) plus its streaming twin (seven
integer state cells, batch-identical folds over an arrival-ordered
stage), inclusion-dependency FK discovery across the star schema, a
salted exact-distinct streaming twin (32 disjoint value-shard cells
per group, partials summed batch-side), hop-labeled BFS lineage
blast radius (recursive-CTE oracle), an hour-of-week seasonal
expectation profile, lead-lag cross-correlation for metric
root-cause ordering (exact integer sufficient sums), an SLO
error-budget burn monitor in batch and watermarked-streaming form
(both certified against one oracle), alert-to-incident grouping
(quiet-gap clustering of the certified anomaly flags across
metrics), a column-level diff drill-down (null-safe per-column
mismatch counts behind table_diff's row verdict), and the
declarative monitor_suite capstone (freshness + contract batteries
for configured tables as one verdict frame). New-in-r7 staged
additions: zone-map prune estimation over a staged range-partitioned
layout (the r7 stretch — fragment min/max map from one column-pruned
scan, metadata-only estimates per predicate, `{ZM16_DIR}` oracle
placeholder), CUBE grouping-sets aggregation (one Expand pass,
per-column GROUPING flags — bitmask order is not engine-portable),
and sliding-window distinct users via daily HLL register merges
(trailing windows as cellwise register max — overlapping exact
COUNT DISTINCT re-counts raw rows window-length times; the sketch
merges day-count-sized state instead), image exact-pixel dedup
via average-hash (container-invariant integer aHash over decoded
pixel matrices — the image leg of the dedup family, oracle-predicted
from md5(text) with no decoder) plus its banded NEAR-dup tier over
planted augmented copies, and audio near-dup via gain-robust RMS
fingerprints over planted +1-gain copies (the audio leg — every
arithmetic step float64-exact, both fingerprints oracle-predicted
from the PCM bytes), and video near-dup via sampled frame hashes
over planted rotated "trimmed clips" (the video leg — ≥1 shared
sampled frame surfaces the pair from one frame-hash equi-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkobs.io import load_table

R7_QUEUE: dict[str, tuple] = {}


def _queue(name: str, oracle: str | None = None):
    def deco(fn):
        R7_QUEUE[name] = (fn, oracle)
        return fn

    return deco

@_queue(
    "dim_ablation_recall_embeddings",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    n64 AS (SELECT vec_id, e,
                   sqrt(list_sum(list_transform(e, x -> x * x))) AS norm
            FROM v),
    t64 AS (
      SELECT vec_id, neighbor_id FROM (
        SELECT a.vec_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY
                 round(list_sum(list_transform(generate_series(1, 64),
                         i -> a.e[i] * b.e[i])) / (a.norm * b.norm), 6)
                   DESC, b.vec_id) AS rn
        FROM n64 a JOIN n64 b ON a.vec_id != b.vec_id)
      WHERE rn <= 5),
    h AS (SELECT vec_id, e[1:32] AS e FROM v),
    n32 AS (SELECT vec_id, e,
                   sqrt(list_sum(list_transform(e, x -> x * x))) AS norm
            FROM h),
    t32 AS (
      SELECT vec_id, neighbor_id FROM (
        SELECT a.vec_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY
                 round(list_sum(list_transform(generate_series(1, 32),
                         i -> a.e[i] * b.e[i])) / (a.norm * b.norm), 6)
                   DESC, b.vec_id) AS rn
        FROM n32 a JOIN n32 b ON a.vec_id != b.vec_id)
      WHERE rn <= 5),
    m AS (SELECT count(*) AS n_matched
          FROM t64 JOIN t32 USING (vec_id, neighbor_id)),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_truth_pairs,
                 CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries
          FROM t64)
    SELECT n_queries, n_truth_pairs,
           CAST(n_matched AS BIGINT) AS n_matched,
           CAST(n_matched AS BIGINT) / n_truth_pairs AS recall
    FROM t, m
    """,
)
def dim_ablation_recall_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-dimension ablation (extension: the
    Matryoshka-truncation question — how much neighbor structure
    survives at half the dimensions?): recall@5 of brute-force cosine
    top-5 over the FIRST 32 components against the full-64-dim ground
    truth, both sides the certified deterministic brute tier (rounded
    cosine, id tiebreaks), the verdict one unrounded integer
    division. The oracle composes the two replays."""
    from sparkobs.operators.similarity import cosine_topk_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    # both pair sets are referenced twice (semi join + the totals agg)
    # — checkpoint the 5n-row results so the scoring pass runs once
    full = (
        cosine_topk_bruteforce(emb, k=5)
        .select("vec_id", "neighbor_id")
        .localCheckpoint()
    )
    half = (
        cosine_topk_bruteforce(
            emb.withColumn("embedding", F.slice("embedding", 1, 32)), k=5
        )
        .select("vec_id", "neighbor_id")
        .localCheckpoint()
    )
    matched = full.join(half, ["vec_id", "neighbor_id"], "semi")
    t = full.agg(
        F.count_distinct("vec_id").cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("n_truth_pairs"),
    )
    m = matched.agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
    return t.crossJoin(F.broadcast(m)).select(
        "n_queries",
        "n_truth_pairs",
        "n_matched",
        (F.col("n_matched") / F.col("n_truth_pairs")).alias("recall"),
    )


@_queue(
    "conversion_paths_events",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('view', 'click', 'signup', 'purchase')),
    tagged AS (
      SELECT *,
             first_value(CASE WHEN event_type = 'purchase'
                              THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS conv_id
      FROM ev),
    paths AS (
      SELECT user_id, conv_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM tagged
      WHERE event_type <> 'purchase' AND conv_id IS NOT NULL
      GROUP BY 1, 2),
    agg AS (SELECT path, CAST(count(*) AS BIGINT) AS n_conversions
            FROM paths GROUP BY 1)
    SELECT path, n_conversions FROM agg
    ORDER BY n_conversions DESC, path LIMIT 15
    """,
)
def conversion_paths_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 conversion paths (extension: journey mining — the
    ordered channel sequence each purchase saw since the prior one;
    operators/behavior.conversion_paths). Path strings build from an
    array_sort over (ts, event id, channel) structs so tie order is
    engine-identical; the global top-k is TakeOrderedAndProject with
    a (count desc, path) tiebreak — a deterministic result set."""
    from sparkobs.operators.behavior import conversion_paths

    return conversion_paths(
        load_table(spark, sf_dir, "events"), conversion="purchase"
    )


@_queue(
    "time_weighted_value_events",
    oracle="""
    WITH base AS (
      SELECT event_type, value,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS dur
      FROM events WHERE value IS NOT NULL)
    SELECT event_type AS state,
           CAST(sum(dur) AS BIGINT) AS total_dur_us,
           CAST(sum(CAST(round(value * 100) AS HUGEINT) * dur) AS DOUBLE)
             / CAST(CAST(sum(dur) AS BIGINT) AS DOUBLE) / 100e0
             AS twa_value
    FROM base WHERE dur IS NOT NULL
    GROUP BY 1
    """,
)
def time_weighted_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted mean value per event type (extension:
    time-in-state metrics — each value holds until the user's next
    event; operators/behavior.duration_weighted_mean). Integer cents
    × integer microseconds accumulate in DECIMAL(38,0) (bigint would
    overflow; Spark BigDecimal ≡ DuckDB HUGEINT summation), and the
    mean is one division of exactly-converted doubles, unrounded."""
    from sparkobs.operators.behavior import duration_weighted_mean

    return duration_weighted_mean(load_table(spark, sf_dir, "events"))


@_queue(
    "budget_select_documents",
    oracle="""
    WITH t AS (SELECT doc_id,
                      string_split_regex(text, '\\s+') AS toks
               FROM documents),
    m AS (SELECT doc_id,
                 len(toks) AS n_tokens,
                 len(list_distinct(toks)) AS n_unique,
                 len(list_filter(toks, x -> x in ('the', 'a'))) AS n_stop
          FROM t),
    q AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                 round(least(1.0, n_tokens / 50.0) * 0.4
                       + (n_unique / n_tokens) * 0.4
                       + (1.0 - n_stop / n_tokens) * 0.2, 4) AS quality
          FROM m),
    c AS (SELECT doc_id, n_tokens, quality,
                 CAST(sum(n_tokens) OVER (
                      ORDER BY quality DESC, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens
          FROM q)
    SELECT doc_id, n_tokens, quality, cum_tokens
    FROM c WHERE cum_tokens <= 5000
    """,
)
def budget_select_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget dataset selection (extension: the curation export
    — keep the best documents that fit the training budget): greedy
    by the certified 4-dp quality score with id tiebreak, integer
    prefix token sums on the distributed running-sum primitive, cut
    at 5000 tokens (operators/sampling.budget_select). Order, sums,
    and cut are bit-identical cross-engine because the sort key is
    the rounded certified score and every sum is a bigint."""
    from sparkobs.operators.sampling import budget_select

    return budget_select(
        load_table(spark, sf_dir, "documents"), budget_tokens=5000
    )


def _components_oracle(k: int = 3, rounds: int = 8) -> str:
    """Unrolled min-label propagation — replayable because a FIXED
    round count of min-propagation is deterministic (see
    operators/graph.min_label_components). Self-loop formulation:
    each round references l(t) exactly once, keeping the inlined CTE
    tree LINEAR (the least/coalesce formulation references it twice
    and blows up 2^rounds under CTE inlining)."""
    parts = []
    for t in range(rounds):
        parts.append(
            f"""l{t + 1} AS (
      SELECT e.dst AS node, min(l.lbl) AS lbl
      FROM eself e JOIN l{t} l ON l.node = e.src GROUP BY 1)"""
        )
    chain = ",\n    ".join(parts)
    return f"""
    WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
                FROM lineitem),
    pairs AS (
      SELECT a.s AS u, b.s AS v, CAST(count(*) AS BIGINT) AS w
      FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s GROUP BY 1, 2),
    directed AS (
      SELECT u AS a, v AS b, w FROM pairs
      UNION ALL SELECT v, u, w FROM pairs),
    top AS (
      SELECT a, b FROM (
        SELECT a, b,
               row_number() OVER (PARTITION BY a ORDER BY w DESC, b) AS r
        FROM directed) WHERE r <= {k}),
    mutual AS (
      SELECT t.a, t.b FROM top t WHERE EXISTS (
        SELECT 1 FROM top t2 WHERE t2.a = t.b AND t2.b = t.a)),
    edges AS (SELECT a AS src, b AS dst FROM mutual),
    nodes AS (SELECT DISTINCT s_suppkey AS node FROM supplier),
    eself AS (SELECT src, dst FROM edges
              UNION ALL SELECT node, node FROM nodes),
    l0 AS (SELECT node, node AS lbl FROM nodes),
    {chain}
    SELECT node, lbl AS component FROM l{rounds} ORDER BY node
    """


@_queue("components_supplier_mutual_knn", oracle=_components_oracle())
def components_supplier_mutual_knn(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier communities: the dense co-occurrence graph (every
    supplier pair shares orders at any SF) is sparsified to its
    MUTUAL top-3 strongest partnerships (graph.mutual_topk_edges —
    the standard kNN-graph preprocessing), then labeled by
    fixed-round min-label propagation (graph.min_label_components,
    8 rounds, deterministic → replayable by the unrolled oracle).
    Isolated suppliers keep their own label. All-integer output."""
    from sparkobs.operators.graph import (
        cooccurrence_edges,
        min_label_components,
        mutual_topk_edges,
    )

    li = load_table(spark, sf_dir, "lineitem")
    pairs = cooccurrence_edges(li, "l_orderkey", "l_suppkey", weighted=True)
    edges = mutual_topk_edges(pairs, k=3)
    nodes = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("node")
    ).distinct()
    return min_label_components(nodes, edges, rounds=8).orderBy("node")


@_queue(
    "event_disorder_events",
    oracle="""
    WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
    p AS (
      SELECT us,
             max(us) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS prev
      FROM e),
    f AS (
      SELECT us, prev,
             CASE WHEN prev IS NOT NULL AND us < prev
                  THEN 1 ELSE 0 END AS is_late,
             CASE WHEN prev IS NOT NULL AND us < prev
                  THEN prev - us END AS lateness
      FROM p)
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(is_late) AS BIGINT) AS n_late,
           CAST(sum(is_late) AS BIGINT) / CAST(count(*) AS BIGINT)
             AS late_rate,
           CAST(max(lateness) AS BIGINT) AS max_late_us,
           CASE WHEN sum(is_late) > 0
                THEN CAST(sum(lateness) AS BIGINT)
                   / CAST(sum(is_late) AS BIGINT) END AS mean_late_us
    FROM f
    """,
)
def event_disorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder diagnostic over arrival order (extension:
    the watermark-tuning measurement — how late is late data,
    operators/state.event_disorder_stats): the strictly-preceding
    running max runs on the distributed prefix primitive
    (joins.global_running_max), never a single-partition window;
    integer-microsecond lateness with unrounded single-division
    ratios. The oracle replays the same prefix max as one global
    window — affordable at oracle scale."""
    from sparkobs.operators.state import event_disorder_stats

    return event_disorder_stats(load_table(spark, sf_dir, "events"))


@_queue(
    "inclusion_deps_star_schema",
    oracle="""
    SELECT 'l_orderkey' AS from_col, 'o_orderkey' AS to_col,
           CAST(count(*) AS BIGINT) AS n_from_distinct,
           CAST(sum(CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contained,
           CAST(sum(CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS BIGINT) AS containment
    FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem
          WHERE l_orderkey IS NOT NULL) a
    LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders
               WHERE o_orderkey IS NOT NULL) b USING (k)
    UNION ALL
    SELECT 'l_partkey', 'p_partkey', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS BIGINT)
    FROM (SELECT DISTINCT l_partkey AS k FROM lineitem
          WHERE l_partkey IS NOT NULL) a
    LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part
               WHERE p_partkey IS NOT NULL) b USING (k)
    UNION ALL
    SELECT 'o_custkey', 'c_custkey', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS BIGINT)
    FROM (SELECT DISTINCT o_custkey AS k FROM orders
          WHERE o_custkey IS NOT NULL) a
    LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer
               WHERE c_custkey IS NOT NULL) b USING (k)
    UNION ALL
    SELECT 'p_partkey', 'l_partkey', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS BIGINT)
    FROM (SELECT DISTINCT p_partkey AS k FROM part
          WHERE p_partkey IS NOT NULL) a
    LEFT JOIN (SELECT DISTINCT l_partkey AS k FROM lineitem
               WHERE l_partkey IS NOT NULL) b USING (k)
    UNION ALL
    SELECT 'c_custkey', 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS BIGINT)
    FROM (SELECT DISTINCT c_custkey AS k FROM customer
          WHERE c_custkey IS NOT NULL) a
    LEFT JOIN (SELECT DISTINCT o_custkey AS k FROM orders
               WHERE o_custkey IS NOT NULL) b USING (k)
    """,
)
def inclusion_deps_star_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key DISCOVERY across the star schema (extension: the
    catalog-intelligence screen behind "which columns can join?"):
    containment of each candidate key column's distinct values in its
    candidate target, both directions for part/customer so orphan
    dimensions quantify too (operators/shape.inclusion_coefficient —
    each pair is two distinct reductions plus one left join, the fact
    table never ships un-deduplicated). Exact integers + unrounded
    single-division ratios."""
    from sparkobs.operators.shape import inclusion_coefficient

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    c = load_table(spark, sf_dir, "customer")
    # each key column's distinct set reduces ONCE (checkpointed) and
    # serves every pair it appears in — 6 distinct reductions for 5
    # pairs instead of 10
    keys = {
        col: src.select(F.col(col))
        .where(F.col(col).isNotNull())
        .distinct()
        .localCheckpoint()
        for src, col in [
            (li, "l_orderkey"),
            (li, "l_partkey"),
            (o, "o_orderkey"),
            (o, "o_custkey"),
            (p, "p_partkey"),
            (c, "c_custkey"),
        ]
    }
    pairs = [
        ("l_orderkey", "o_orderkey"),
        ("l_partkey", "p_partkey"),
        ("o_custkey", "c_custkey"),
        ("p_partkey", "l_partkey"),
        ("c_custkey", "o_custkey"),
    ]
    out = None
    for ca, cb in pairs:
        one = inclusion_coefficient(
            keys[ca], ca, keys[cb], cb, distinct=False
        )
        out = one if out is None else out.unionByName(one)
    return out


def _stage_events_arrival_ordered(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> str:
    """Stage events as ``n_files`` parquet files that a file-source
    stream is GUARANTEED to deliver in arrival (event_id) order:
    range-split by event_id, written one file per slice in ascending
    order with strictly increasing mtimes (FileStreamSource orders
    new files by modification time — same-job part files can tie and
    list in any order, which would scramble the arrival sequence the
    disorder diagnostic measures). Same mtime-keyed cache discipline
    as queries._stage_events."""
    import glob
    import os
    import shutil
    import tempfile

    from sparkobs.queries import _stage_key, load_table

    key = _stage_key(sf_dir, "events", f"arrival{n_files}")
    stage_dir = os.path.join(
        tempfile.gettempdir(), f"sparkobs_stream_{key}"
    )
    marker = os.path.join(stage_dir, "_STAGED")
    if os.path.exists(marker):
        return stage_dir
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(stage_dir)
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).first()
    span = (hi - lo + 1 + n_files - 1) // n_files
    base = 1_700_000_000
    for i in range(n_files):
        a, b = lo + i * span, lo + (i + 1) * span
        tmp = os.path.join(stage_dir, f"__tmp{i}")
        ev.where(
            (F.col("event_id") >= a) & (F.col("event_id") < b)
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(stage_dir, f"chunk-{i:05d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (base + i, base + i))
    with open(marker, "w"):
        pass
    return stage_dir


@_queue(
    "streaming_disorder_events",
    oracle="""
    WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
    p AS (
      SELECT us,
             max(us) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS prev
      FROM e),
    f AS (
      SELECT us, prev,
             CASE WHEN prev IS NOT NULL AND us < prev
                  THEN 1 ELSE 0 END AS is_late,
             CASE WHEN prev IS NOT NULL AND us < prev
                  THEN prev - us END AS lateness
      FROM p)
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(is_late) AS BIGINT) AS n_late,
           CAST(sum(is_late) AS BIGINT) / CAST(count(*) AS BIGINT)
             AS late_rate,
           CAST(max(lateness) AS BIGINT) AS max_late_us,
           CASE WHEN sum(is_late) > 0
                THEN CAST(sum(lateness) AS BIGINT)
                   / CAST(sum(is_late) AS BIGINT) END AS mean_late_us
    FROM f
    """,
)
def streaming_disorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the event-time disorder diagnostic
    (streaming/monitors.stateful_disorder): seven integer state cells
    carry the running prefix max and lateness accumulators across
    micro-batches; each batch sorts its rows by event_id and folds a
    vectorized prefix max, so the drained verdict over the 4-file
    one-file-per-trigger arrival-ordered stage is bit-identical to
    the batch operator's single pass — certified against the SAME
    DuckDB oracle as event_disorder_events. Ratios derive batch-side
    from the drained integer row, unrounded single divisions with the
    batch twin's exact guards."""
    from sparkobs.streaming.monitors import (
        run_to_memory,
        stateful_disorder,
        stream_events,
    )

    stage_dir = _stage_events_arrival_ordered(spark, sf_dir)
    out = stateful_disorder(
        stream_events(spark, stage_dir, files_per_trigger=1)
    )
    tbl = run_to_memory(
        out, "disorder_stream", output_mode="update", unique=True
    )
    last = (
        spark.table(tbl).orderBy(F.col("upd_seq").desc()).limit(1)
    )
    return last.select(
        "n_events",
        "n_late",
        F.when(
            F.col("n_events") > 0, F.col("n_late") / F.col("n_events")
        ).alias("late_rate"),
        "max_late_us",
        F.when(
            F.col("n_late") > 0, F.col("sum_late_us") / F.col("n_late")
        ).alias("mean_late_us"),
    )


@_queue(
    "streaming_salted_distinct_events",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_user_id
    FROM events GROUP BY event_type
    """,
)
def streaming_salted_distinct_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of the skew-proof exact distinct
    (streaming/monitors.stateful_salted_distinct): per-(group, salt)
    state cells each hold a disjoint ~1/n shard of a group's distinct
    value set, merged per micro-batch with a vectorized union; the
    batch follow-up takes each cell's latest partial (max_by upd_seq)
    and sums per group — exact, certified against the plain
    count-distinct oracle. The salt is the SAME pmod(xxhash64) the
    batch operator uses, so cell partials are comparable across the
    two modes."""
    from sparkobs.queries import _stage_events
    from sparkobs.streaming.monitors import (
        run_to_memory,
        stateful_salted_distinct,
        stream_events,
    )

    stage_dir = _stage_events(spark, sf_dir)
    out = stateful_salted_distinct(
        stream_events(spark, stage_dir, files_per_trigger=1)
    )
    tbl = run_to_memory(
        out, "salted_distinct_stream", output_mode="update", unique=True
    )
    per_cell = (
        spark.table(tbl)
        .groupBy("entity", "salt")
        .agg(F.max_by("n_partial", "upd_seq").alias("__np"))
    )
    return per_cell.groupBy("entity").agg(
        F.sum("__np").cast("long").alias("n_distinct_user_id")
    ).select(
        F.col("entity").alias("event_type"), "n_distinct_user_id"
    )


@_queue(
    "impact_reach_supply_chain",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT src, dst FROM (
        SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity >= 48
      ) UNION ALL
      SELECT dst, src FROM (
        SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity >= 48
      )),
    reach(node, hop) AS (
      SELECT s_suppkey * 2 AS node, 0 AS hop
      FROM supplier WHERE s_nationkey = 7
      UNION
      SELECT e.dst, r.hop + 1 FROM reach r
      JOIN e ON e.src = r.node WHERE r.hop < 3
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END
             AS node_type,
           node // 2 AS node_key,
           CAST(min(hop) AS INT) AS hop
    FROM reach GROUP BY 1, 2
    """,
)
def impact_reach_supply_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blast-radius reachability (extension: the lineage question the
    reference's monitor graph implies — a source fails, which
    downstream entities are touched, and how directly?): hop-labeled
    BFS (operators/graph.reachable_set) over the HIGH-VOLUME slice of
    the supplier↔customer co-purchase graph (edges only where a
    qualifying lineitem with l_quantity ≥ 48 links the pair — the
    full graph is near-complete and every node is one hop away),
    seeded at nation 7's suppliers, 3 hops. First-visit hop = exact
    shortest distance, so a bounded recursive-CTE oracle replays it
    as min(hop) over the expansion."""
    from sparkobs.operators.graph import (
        copurchase_edges,
        decode_copurchase_node,
        reachable_set,
    )

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") >= 48
    )
    o = load_table(spark, sf_dir, "orders")
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == 7)
        .select((F.col("s_suppkey") * 2).alias("node"))
    )
    reach = reachable_set(copurchase_edges(li, o), seeds, max_hops=3)
    return decode_copurchase_node(reach).select(
        "node_type", "node_key", F.col("hop").cast("int").alias("hop")
    )


@_queue(
    "seasonal_profile_events",
    oracle="""
    WITH b AS (SELECT CAST(isodow(ts) AS INT) AS dow,
                      CAST(hour(ts) AS INT) AS hod,
                      CAST(value AS DOUBLE) AS v
               FROM events),
    m AS (SELECT dow, hod, v,
                 avg(v) OVER (PARTITION BY dow, hod) AS mu,
                 stddev_samp(v) OVER (PARTITION BY dow, hod) AS sd
          FROM b)
    SELECT dow, hod,
           CAST(count(*) AS BIGINT) AS n,
           round(round(sum(v), 4) / count(*), 4) AS mean_value,
           max(abs(round(CASE WHEN sd IS NULL OR sd = 0 THEN 0.0
                              ELSE (v - mu) / sd END, 4))) AS max_abs_z
    FROM m GROUP BY 1, 2
    """,
)
def seasonal_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal expectation profile (extension: the observability
    baseline that makes alerting calendar-aware — Tuesday 14:00 is
    only anomalous relative to OTHER Tuesday-14:00s, not to the
    global mean): per hour-of-week bucket (ISO dow × hour), volume,
    the stable-convention mean, and the largest in-bucket |z|
    (features.group_zscore over the derived calendar keys — one
    window shuffle on a 168-key space, every moment map-side
    combined). A bucket whose max |z| jumps is the seasonal-aware
    alert; the 168-row profile is the broadcastable scoring table for
    live data."""
    from sparkobs.operators.features import group_zscore

    ev = load_table(spark, sf_dir, "events").select(
        (F.weekday("ts") + 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
        F.col("value").cast("double").alias("v"),
    )
    z = group_zscore(ev, ["dow", "hod"], "v", keep_cols=["v"])
    return z.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.round(F.sum("v"), 4) / F.count(F.lit(1)), 4
        ).alias("mean_value"),
        F.max(F.abs(F.col("zscore"))).alias("max_abs_z"),
    )


@_queue(
    "lead_lag_corr_events",
    oracle="""
    WITH s AS (
      SELECT event_type AS p, date_trunc('hour', ts) AS b,
             CAST(count(*) AS DOUBLE) AS y
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2),
    a AS (SELECT b, y AS ya FROM s WHERE p = 'click'),
    bb AS (SELECT b, y AS yb FROM s WHERE p = 'purchase'),
    ks AS (SELECT CAST(unnest(generate_series(-6, 6)) AS INT) AS lag),
    pr AS (SELECT ks.lag, a.ya, bb.yb
           FROM ks CROSS JOIN bb
           JOIN a ON a.b = bb.b + to_hours(ks.lag)),
    st AS (SELECT lag,
                  CAST(count(*) AS DOUBLE) AS m,
                  sum(yb) AS sx, sum(ya) AS sy,
                  sum(yb * yb) AS sxx, sum(ya * ya) AS syy,
                  sum(yb * ya) AS sxy
           FROM pr GROUP BY 1)
    SELECT lag, CAST(m AS BIGINT) AS n_pairs,
           CASE WHEN (m * sxx - sx * sx) * (m * syy - sy * sy) > 0
                THEN round((m * sxy - sx * sy)
                           / sqrt((m * sxx - sx * sx)
                                  * (m * syy - sy * sy)), 4)
                ELSE 0.0 END + 0.0 AS xcorr
    FROM st
    """,
)
def lead_lag_corr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead–lag cross-correlation of the click and purchase hourly
    series (extension: the root-cause follow-up to a metric alert —
    did the other metric move FIRST, and by how many buckets?
    operators/state.lead_lag_corr): Pearson xcorr at every lag in
    [−6, +6] hours from exact integer sufficient sums — bit-identical
    cross-engine, acf_lag1's exactness contract generalized to two
    series."""
    from sparkobs.operators.state import lead_lag_corr

    return lead_lag_corr(
        load_table(spark, sf_dir, "events"),
        "ts",
        "event_type",
        "click",
        "purchase",
        max_lag=6,
    )


# ONE oracle for the SLO burn pair: the batch query and the streaming
# twin certify against the identical SQL, mirroring the shared
# checks.slo_burn_derive derivation.
_SLO_BURN_ORACLE = """
    WITH h AS (
      SELECT date_trunc('hour', ts) AS bucket_ts,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_err
      FROM events GROUP BY 1)
    SELECT bucket_ts, n, n_err,
           n_err / n AS err_rate,
           n_err / n / CAST(0.01 AS DOUBLE) AS burn_rate,
           sum(n_err) OVER (ORDER BY bucket_ts)
             / (CAST(0.01 AS DOUBLE)
                * sum(n) OVER (ORDER BY bucket_ts)) AS budget_used_frac
    FROM h
    """


@_queue("slo_burn_rate_events", oracle=_SLO_BURN_ORACLE)
def slo_burn_rate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn monitor (extension: the SRE reading of
    an error-rate series — operators/checks.slo_burn_rate): per hour,
    error rate vs the 1% error budget (99% SLO) and the running
    fraction of the period's budget consumed. Counts are exact
    integers; every float is one arithmetic expression over identical
    integers and the SAME budget double (the oracle CASTs the literal
    to DOUBLE — a bare 0.01 parses as DECIMAL in DuckDB and diverges),
    so the frame certifies unrounded."""
    from sparkobs.operators.checks import slo_burn_rate

    return slo_burn_rate(
        load_table(spark, sf_dir, "events"),
        "ts",
        F.col("event_type") == "error",
        error_budget=0.01,
    )


@_queue("streaming_slo_burn_events", oracle=_SLO_BURN_ORACLE)
def streaming_slo_burn_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the SLO burn monitor: per-hour total/error
    counters accumulate in watermarked tumbling-window state
    (streaming/monitors.streaming_error_counts — two integer cells
    per open window); the drained integer frame gets the identical
    batch-side burn/cumulative derivation as slo_burn_rate_events and
    certifies against the SAME oracle."""
    from sparkobs.queries import _stage_events
    from sparkobs.streaming.monitors import (
        run_to_memory,
        stream_events,
        streaming_error_counts,
    )

    stage_dir = _stage_events(spark, sf_dir)
    out = streaming_error_counts(
        stream_events(spark, stage_dir), F.col("event_type") == "error"
    )
    tbl = run_to_memory(
        out, "slo_burn_stream", output_mode="complete", unique=True
    )
    from sparkobs.operators.checks import slo_burn_derive

    return slo_burn_derive(spark.table(tbl), error_budget=0.01)


@_queue(
    "incident_groups_events",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(count(*) AS DOUBLE) AS value
      FROM events GROUP BY 1, 2),
    scored AS (
      SELECT event_type, bucket_ts,
             avg(value) OVER w AS m,
             stddev_samp(value) OVER w AS s,
             count(value) OVER w AS n,
             value
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
    alerts AS (
      SELECT event_type, bucket_ts FROM scored
      WHERE n >= 2 AND s > 0 AND abs((value - m) / s) > 2.0),
    marked AS (
      SELECT event_type, bucket_ts,
             CASE WHEN lag(bucket_ts) OVER o IS NULL
                    OR epoch_us(bucket_ts)
                       - epoch_us(lag(bucket_ts) OVER o)
                       > 7200000000
                  THEN 1 ELSE 0 END AS new_inc
      FROM alerts
      WINDOW o AS (ORDER BY bucket_ts, event_type)),
    tagged AS (
      SELECT event_type, bucket_ts,
             sum(new_inc) OVER (ORDER BY bucket_ts, event_type
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS incident_id
      FROM marked)
    SELECT CAST(incident_id AS BIGINT) AS incident_id,
           min(bucket_ts) AS started_at, max(bucket_ts) AS ended_at,
           CAST(count(*) AS BIGINT) AS n_alerts,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_metrics
    FROM tagged GROUP BY 1
    """,
)
def incident_groups_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert → incident grouping (extension: the fatigue reducer after
    anomaly detection — operators/state.incident_groups): the certified
    trailing-z anomaly flags (anomaly_hourly_events' exact machinery)
    collapse into incidents wherever no 2 h quiet gap separates
    consecutive alerts, reporting span, alert count and the distinct-
    metric breadth per incident."""
    from sparkobs.operators.state import incident_groups, metric_anomalies

    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
    )
    flags = metric_anomalies(
        hourly, ["event_type"], ts_col="bucket_ts", value_col="value"
    ).where(F.col("is_anomaly"))
    return incident_groups(flags)


@_queue(
    "diff_columns_orders",
    oracle="""
    WITH old AS (SELECT * FROM orders WHERE o_orderkey % 100 <> 2),
    new AS (SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 100 = 3 THEN 'X'
                        ELSE o_orderstatus END AS o_orderstatus,
                   CASE WHEN o_orderkey % 100 = 1
                        THEN round(o_totalprice * 2, 2)
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 100 <> 0),
    j AS (SELECT * FROM old o JOIN new n USING (o_orderkey)),
    a AS (SELECT CAST(count(*) AS BIGINT) AS n_compared,
                 CAST(sum(CASE WHEN o.o_custkey IS DISTINCT FROM n.o_custkey THEN 1 ELSE 0 END) AS BIGINT) AS m_custkey,
                 CAST(sum(CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 1 ELSE 0 END) AS BIGINT) AS m_status,
                 CAST(sum(CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 1 ELSE 0 END) AS BIGINT) AS m_price,
                 CAST(sum(CASE WHEN o.o_orderdate IS DISTINCT FROM n.o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS m_date,
                 CAST(sum(CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority THEN 1 ELSE 0 END) AS BIGINT) AS m_prio
          FROM old o JOIN new n ON o.o_orderkey = n.o_orderkey)
    SELECT u.column, u.n_mismatch, a.n_compared,
           u.n_mismatch / a.n_compared AS mismatch_rate
    FROM a, (
      SELECT 'o_custkey' AS column, m_custkey AS n_mismatch FROM a
      UNION ALL SELECT 'o_orderstatus', m_status FROM a
      UNION ALL SELECT 'o_totalprice', m_price FROM a
      UNION ALL SELECT 'o_orderdate', m_date FROM a
      UNION ALL SELECT 'o_orderpriority', m_prio FROM a) u
    """,
)
def diff_columns_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level diff drill-down (extension: the follow-up to
    table_diff_orders' row verdict — which columns drove the churn?
    operators/state.diff_column_contributions): two deterministic
    versions of orders (price doubled on keys ≡1, status rewritten on
    keys ≡3 mod 100), null-safe per-column mismatch counts in one
    aggregate pass, rates as single unrounded integer divisions."""
    from sparkobs.operators.state import diff_column_contributions

    orders = load_table(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % 100 != 2)
    new = (
        orders.where(F.col("o_orderkey") % 100 != 0)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 100 == 3, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 100 == 1,
                F.round(F.col("o_totalprice") * 2, 2),
            ).otherwise(F.col("o_totalprice")),
        )
    )
    return diff_column_contributions(old, new, ["o_orderkey"])


@_queue(
    "monitor_suite_lake",
    oracle="""
    SELECT 'events' AS table_name, 'freshness' AS check_type,
           'ts' AS column,
           CAST((epoch_us(TIMESTAMP '2024-02-01 00:00:00')
                 - epoch_us(max(ts))) // 1000000 AS DOUBLE) AS metric_value,
           ((epoch_us(TIMESTAMP '2024-02-01 00:00:00')
             - epoch_us(max(ts))) // 1000000) <= 604800 AS passed
    FROM events
    UNION ALL
    SELECT 'events', 'not_null', 'user_id',
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE),
           sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) = 0
    FROM events
    UNION ALL
    SELECT 'events', 'accepted_values', 'event_type',
           CAST(sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
                         ('view','click','purchase','signup','error')
                    THEN 1 ELSE 0 END) AS DOUBLE),
           sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
                    ('view','click','purchase','signup','error')
               THEN 1 ELSE 0 END) = 0
    FROM events
    UNION ALL
    SELECT 'orders', 'freshness', 'o_orderdate',
           CAST((epoch_us(TIMESTAMP '2024-02-01 00:00:00')
                 - epoch_us(max(o_orderdate))) // 1000000 AS DOUBLE),
           ((epoch_us(TIMESTAMP '2024-02-01 00:00:00')
             - epoch_us(max(o_orderdate))) // 1000000) <= 604800
    FROM orders
    UNION ALL
    SELECT 'orders', 'range', 'o_totalprice',
           CAST(sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
                    THEN 1 ELSE 0 END) AS DOUBLE),
           sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
               THEN 1 ELSE 0 END) = 0
    FROM orders
    """,
)
def monitor_suite_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative lake-wide monitor battery (capstone: the
    reference's configure-a-template-per-table UX as ONE DataFrame —
    monitors.monitor_suite): freshness SLAs plus contract checks for
    two configured tables union into a single long verdict frame.
    Integer metric values (staleness seconds / violation counts) in
    double form — certified without rounding conventions."""
    from sparkobs.monitors import monitor_suite

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    return monitor_suite(
        [
            (
                "events",
                ev,
                "ts",
                [
                    ("not_null", "user_id"),
                    (
                        "accepted_values",
                        "event_type",
                        ("view", "click", "purchase", "signup", "error"),
                    ),
                ],
            ),
            ("orders", orders, "o_orderdate", [("range", "o_totalprice", 0, 1000000)]),
        ],
        as_of="2024-02-01 00:00:00",
    )


@_queue(
    "zone_map_prune_orders",
    oracle="""
    WITH zm AS (
      SELECT filename,
             min(o_orderdate) AS mn, max(o_orderdate) AS mx,
             CAST(count(*) AS BIGINT) AS n
      FROM read_parquet('{ZM16_DIR}/*.parquet', filename=true)
      GROUP BY 1),
    cls AS (
      SELECT CASE
               WHEN mx < TIMESTAMP '1996-01-01 00:00:00'
                 OR mn > TIMESTAMP '1996-12-31 00:00:00' THEN 'pruned'
               WHEN mn >= TIMESTAMP '1996-01-01 00:00:00'
                AND mx <= TIMESTAMP '1996-12-31 00:00:00' THEN 'full'
               ELSE 'partial' END AS c,
             n
      FROM zm)
    SELECT CAST(count(*) AS BIGINT) AS n_fragments,
           CAST(coalesce(sum(CASE WHEN c = 'pruned' THEN 1 END), 0) AS BIGINT) AS n_pruned,
           CAST(coalesce(sum(CASE WHEN c = 'full' THEN 1 END), 0) AS BIGINT) AS n_full,
           CAST(coalesce(sum(CASE WHEN c = 'partial' THEN 1 END), 0) AS BIGINT) AS n_partial,
           CAST(coalesce(sum(n), 0) AS BIGINT) AS rows_total,
           CAST(coalesce(sum(CASE WHEN c = 'pruned' THEN n END), 0) AS BIGINT) AS rows_pruned,
           CAST(coalesce(sum(CASE WHEN c = 'full' THEN n END), 0) AS BIGINT) AS rows_full,
           CAST(coalesce(sum(CASE WHEN c = 'partial' THEN n END), 0) AS BIGINT) AS rows_partial,
           CASE WHEN coalesce(sum(n), 0) > 0 THEN
             CAST(coalesce(sum(CASE WHEN c = 'pruned' THEN n END), 0) AS DOUBLE)
               / CAST(sum(n) AS DOUBLE)
           END AS share_rows_pruned
    FROM cls
    """,
)
def zone_map_prune_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map prune estimation (extension: the last
    reference-adjacent storage-health capability — the reference's
    storage monitors track per-object size/mtime, a zone map tracks
    per-object VALUE ranges, which is what decides whether a range
    predicate can skip the object entirely). Stages orders as a
    16-fragment range-partitioned layout (the staged-dir oracle
    convention from compaction_plan_sf_dir: both engines read the
    SAME staged files, so the sampling inside repartitionByRange never
    has to reproduce cross-engine), builds the fragment min/max map in
    one column-pruned scan, and estimates what the 1996 order-year
    predicate can skip: fragments and rows per
    pruned/full/partial class, exact integers + one unrounded share.
    At 100 TB the map is built once (or read from footers) and every
    subsequent predicate estimate is metadata-only."""
    from sparkobs.io import ensure_zone_map_stage
    from sparkobs.sources.listing import zone_map_build, zone_map_prune_estimate

    stage = ensure_zone_map_stage(spark, sf_dir)
    zmap = zone_map_build(spark, stage, "o_orderdate")
    return zone_map_prune_estimate(
        zmap,
        F.lit("1996-01-01 00:00:00").cast("timestamp"),
        F.lit("1996-12-31 00:00:00").cast("timestamp"),
    )


@_queue(
    "cube_revenue_status_priority",
    oracle="""
    SELECT o_orderstatus AS status,
           o_orderpriority AS priority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_revenue_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE / grouping-sets aggregation (OP-24/OP-34 extension — the
    one OLAP grouping shape rollup_revenue_region_nation left
    uncovered): all four (status, priority) grouping combinations in
    ONE pass via Catalyst's Expand (each input row fans to its 4
    grouping sets map-side; one shuffle, partial+final aggs — never 4
    scans). GROUPING flags are emitted as explicit per-column 0/1
    markers (engine-portable; bitmask bit ORDER is not). Money sums
    accumulate exact integer cents, one final division (half-cent
    convention)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (F.sum(cents) / F.lit(100.0)).alias("total_price"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
            "total_price",
        )
    )


def _hll_sliding_oracle(window_days: int = 7) -> str:
    from sparkobs.operators.profile import _HLL_ALPHA, _HLL_M
    from sparkobs.queries import _hex15_sql

    m = _HLL_M
    num = repr(_HLL_ALPHA * m * m * 2**33)
    w = window_days - 1
    return f"""
    WITH h0 AS (SELECT CAST(ts AS DATE) AS d,
                       md5(CAST(user_id AS VARCHAR)) AS dg
                FROM events WHERE user_id IS NOT NULL),
    h AS (SELECT d, {_hex15_sql('dg')} AS hv FROM h0),
    regs AS (SELECT d, hv % {m} AS bucket,
                    max(CASE WHEN (hv >> 8) % 4294967296 > 0
                             THEN 33 - length(bin((hv >> 8) % 4294967296))
                             ELSE 33 END) AS reg
             FROM h GROUP BY 1, 2),
    days AS (SELECT DISTINCT d AS t FROM regs),
    merged AS (SELECT t, bucket, max(reg) AS reg
               FROM regs JOIN days ON d BETWEEN t - {w} AND t
               GROUP BY 1, 2),
    agg AS (SELECT t, count(*) AS n_present,
                   sum(CAST(1 AS BIGINT) << (33 - reg))
                   + ({m} - count(*)) * CAST(8589934592 AS BIGINT) AS s_total
            FROM merged GROUP BY 1),
    est AS (SELECT t,
                   round(CASE WHEN {num} / s_total <= {2.5 * m}
                               AND {m} - n_present > 0
                              THEN {float(m)} * ln({m} / ({m} - n_present))
                              ELSE {num} / s_total END, 2) AS est_distinct
            FROM agg),
    ex AS (SELECT t, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
           FROM days JOIN (SELECT CAST(ts AS DATE) AS d, user_id
                           FROM events WHERE user_id IS NOT NULL) e
             ON e.d BETWEEN t - {w} AND t
           GROUP BY 1)
    SELECT est.t AS day, est_distinct, exact_distinct,
           round(abs(est_distinct - exact_distinct) / exact_distinct, 4) AS rel_err
    FROM est JOIN ex USING (t)
    """


@_queue("hll_sliding_users_events", oracle=_hll_sliding_oracle())
def hll_sliding_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding distinct-user estimates per day from daily HLL
    register merges (extension: the "weekly active users, daily"
    rollup that exact COUNT DISTINCT cannot serve at scale — sliding
    windows overlap, so raw rows would re-count 7×; register tables
    merge by cellwise max instead). Registers build in ONE hash agg;
    per-day windows merge ≤ 7×256 register rows; the exact twin rides
    along for certification and is dropped at 100 TB. Same portable
    md5 register pipeline as the certified hll_* family, replayed end
    to end by the DuckDB oracle."""
    from sparkobs.operators.profile import hll_sliding_distinct

    return hll_sliding_distinct(
        load_table(spark, sf_dir, "events"), "ts", "user_id", window_days=7
    )


@_queue(
    "image_ahash_dedup_media",
    oracle="""
    WITH px AS (
      SELECT doc_id, i, ascii(substr(md5(text), CAST(i AS INT), 1)) AS p
      FROM documents, generate_series(1, 32) AS t(i)),
    tot AS (SELECT doc_id, sum(p) AS s FROM px GROUP BY 1),
    h AS (SELECT px.doc_id,
                 sum(CASE WHEN p * 32 > s
                          THEN CAST(1 AS BIGINT) << (32 - CAST(i AS INT))
                          ELSE CAST(0 AS BIGINT) END) AS ahash
          FROM px JOIN tot ON px.doc_id = tot.doc_id GROUP BY 1),
    clus AS (SELECT ahash, count(*) AS n FROM h GROUP BY 1)
    SELECT CAST((SELECT count(*) FROM h) AS BIGINT) AS n_docs,
           CAST((SELECT count(*) FROM h) * 2 AS BIGINT) AS n_images,
           CAST((SELECT count(*) FROM h) AS BIGINT) AS n_container_matches,
           CAST((SELECT count(*) FROM clus) AS BIGINT) AS n_distinct_hashes,
           CAST((SELECT max(n) FROM clus) AS BIGINT) AS max_cluster
    """,
)
def image_ahash_dedup_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image exact-pixel dedup via average-hash (extension: the image
    leg of the dedup family — aHash fingerprints collide iff the
    decoded PIXELS match, regardless of container). Each doc stages as
    a PGM **and** a PNG of the same md5-derived raster; both decode
    through genuinely different code paths (netpbm header parse vs
    zlib inflate + unfilter), hash in exact integer arithmetic
    (bit i = pixel·n > Σpixels — no float mean), and MUST collide per
    doc (n_container_matches ≡ n_docs, which the oracle predicts from
    md5(text) alone without any decoder). Cluster stats fall out of a
    groupBy on the hash — the image analog of exact_dedup."""
    from sparkobs.operators.multimodal import image_ahash, synth_media

    docs = load_table(spark, sf_dir, "documents")
    hashes = image_ahash(synth_media(docs)).where(F.col("ahash").isNotNull())
    per_doc = hashes.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_fmt"),
        F.count_distinct("ahash").alias("n_h"),
        F.first("ahash").alias("ahash"),
    )
    clus = per_doc.groupBy("ahash").agg(F.count(F.lit(1)).alias("n"))
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_fmt").cast("long").alias("n_images"),
        F.sum(
            F.when((F.col("n_fmt") == 2) & (F.col("n_h") == 1), 1).otherwise(0)
        ).cast("long").alias("n_container_matches"),
    )
    cstats = clus.agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_hashes"),
        F.max("n").cast("long").alias("max_cluster"),
    )
    return stats.crossJoin(F.broadcast(cstats))


@_queue(
    "image_near_dup_media",
    oracle="""
    WITH px AS (
      SELECT doc_id, i, ascii(substr(md5(text), CAST(i AS INT), 1)) AS p
      FROM documents, generate_series(1, 32) AS t(i)),
    allpx AS (
      SELECT doc_id AS id, i, p FROM px
      UNION ALL
      SELECT doc_id + 1000000000 AS id, i,
             CASE WHEN i = 1 THEN p + 40 ELSE p END AS p
      FROM px),
    tot AS (SELECT id, sum(p) AS s FROM allpx GROUP BY 1),
    h AS (SELECT allpx.id,
                 sum(CASE WHEN p * 32 > s
                          THEN CAST(1 AS BIGINT) << (32 - CAST(i AS INT))
                          ELSE CAST(0 AS BIGINT) END) AS ahash
          FROM allpx JOIN tot ON allpx.id = tot.id GROUP BY 1),
    bands AS (SELECT id, ahash, b, (ahash >> CAST(b * 8 AS INT)) & 255 AS bv
              FROM h, generate_series(0, 3) AS g(b)),
    cand AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b,
                    a.ahash AS ha, c.ahash AS hb
             FROM bands a JOIN bands c
               ON a.b = c.b AND a.bv = c.bv AND a.id < c.id)
    SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 3
    ORDER BY 3, 1, 2
    """,
)
def image_near_dup_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image NEAR-duplicate detection via banded aHash (extension: the
    near tier of the image dedup leg — catches lightly-edited copies
    the exact-hash groupBy misses). Every doc's raster gains a planted
    "augmented" copy (first pixel bumped — perturb_media, the jitter
    an augmentation pipeline produces); hashes band into 4×8-bit
    buckets, candidates come from the band equi-join (Σ bucket², never
    images²), and bit_count(xor) verifies Hamming ≤ 3 — the pigeonhole
    bound guarantees every pair WITHIN that budget surfaces as a
    candidate (a planted copy whose bump flips >3 threshold bits is
    excluded by the verify filter, identically on both engines — at
    sf0.001 exactly one of 500 does). The oracle
    predicts ORIGINAL and AUGMENTED hashes from md5(text) alone and
    replays the same band join, so the whole decode → augment →
    re-decode → band → verify pipeline is value-certified."""
    from sparkobs.operators.multimodal import (
        image_ahash,
        image_ahash_near_pairs,
        perturb_media,
        synth_media,
    )

    orig = synth_media(load_table(spark, sf_dir, "documents")).where(
        F.col("container") == "pgm"
    )
    imgs = orig.unionByName(perturb_media(orig))
    hashes = image_ahash(imgs).where(F.col("ahash").isNotNull()).select(
        "id", "ahash"
    )
    # explicit width: the synth rasters are 32 pixels, so the hashes
    # are 32-bit — bits MUST match the upstream hash width (see the
    # image_ahash_near_pairs docstring; the oracle replays 4×8-bit
    # bands)
    return image_ahash_near_pairs(hashes, bits=32, n_bands=4)


@_queue(
    "audio_fingerprint_dedup_media",
    oracle="""
    WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                      octet_length(encode(text)) AS n
               FROM documents),
    fr AS (SELECT doc_id, h, n, unnest(range(0, 4)) AS f FROM b),
    q AS (SELECT doc_id, f,
             CAST(floor(sqrt(list_sum(list_transform(generate_series(1, 16),
                j -> pow(CASE WHEN f * 16 + j <= n THEN
                        (strpos('0123456789ABCDEF', substr(h, 2*(f*16+j)-1, 1)) - 1) * 16
                        + (strpos('0123456789ABCDEF', substr(h, 2*(f*16+j), 1)) - 1)
                      ELSE 0 END - 128.0, 2))) / 16.0) / 8.0) AS BIGINT) AS qo,
             CAST(floor(sqrt(list_sum(list_transform(generate_series(1, 16),
                j -> pow(CASE WHEN f * 16 + j <= n THEN
                        (strpos('0123456789ABCDEF', substr(h, 2*(f*16+j)-1, 1)) - 1) * 16
                        + (strpos('0123456789ABCDEF', substr(h, 2*(f*16+j), 1)) - 1)
                      ELSE 0 END + 1 - 128.0, 2))) / 16.0) / 8.0) AS BIGINT) AS qg
          FROM fr),
    sig AS (SELECT doc_id,
                   sum(qo * (CASE f WHEN 0 THEN 32768 WHEN 1 THEN 1024
                                    WHEN 2 THEN 32 ELSE 1 END)) AS sig_o,
                   sum(qg * (CASE f WHEN 0 THEN 32768 WHEN 1 THEN 1024
                                    WHEN 2 THEN 32 ELSE 1 END)) AS sig_g
            FROM q GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(CASE WHEN sig_o = sig_g THEN 1 END), 0) AS BIGINT)
             AS n_gain_copies_matched,
           CAST(coalesce(sum(CASE WHEN sig_o = sig_g THEN 1 END), 0) AS DOUBLE)
             / count(*) AS match_rate
    FROM sig
    """,
)
def audio_fingerprint_dedup_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup detection via gain-robust RMS fingerprints
    (extension: the audio leg of the dedup family — a +1-gain
    "remastered copy" has different bytes, so md5 dedup misses it;
    the quantized per-frame RMS signature mostly survives the shift).
    Each doc's u8 WAV gains a planted +1-gain copy (gain_media parses
    and re-encodes the real container); both fingerprint through the
    wave-parse → frame-RMS → floor-quantize → base-32-pack kernel, and
    the verdict is the per-doc match rate — every arithmetic step is
    float64-exact or correctly-rounded, so the DuckDB oracle predicts
    BOTH fingerprints from the text bytes with no audio stack at all.
    (Frames whose RMS sits within the gain shift of a quantization
    boundary legitimately flip — both engines agree on exactly
    which.)"""
    import struct

    from sparkobs.operators.multimodal import audio_fingerprint, gain_media

    header = (
        b"RIFF"
        + struct.pack("<I", 36 + 64)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data"
        + struct.pack("<I", 64)
    )
    docs = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit(header),
        F.substring(F.concat(F.encode("text", "UTF-8"), F.lit(bytes(64))), 1, 64),
    )
    media = docs.select(F.col("doc_id").alias("id"), payload.alias("content"))
    orig = audio_fingerprint(media).select(
        "id", F.col("fingerprint").alias("sig_o")
    )
    gain = audio_fingerprint(gain_media(media)).select(
        (F.col("id") - 1_000_000_000).alias("id"),
        F.col("fingerprint").alias("sig_g"),
    )
    return (
        orig.join(gain, "id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(
                F.sum(F.when(F.col("sig_o") == F.col("sig_g"), 1)), F.lit(0)
            ).cast("long").alias("n_gain_copies_matched"),
        )
        .select(
            "n_docs",
            "n_gain_copies_matched",
            (
                F.col("n_gain_copies_matched").cast("double") / F.col("n_docs")
            ).alias("match_rate"),
        )
    )


@_queue(
    "video_framehash_dedup_media",
    oracle="""
    WITH fr AS (
      SELECT doc_id, f, md5(text || '#f' || CAST(f AS VARCHAR)) AS hsh
      FROM documents, generate_series(0, 3) AS t(f)),
    px AS (SELECT doc_id, f, i,
                  ascii(substr(hsh, CAST(i AS INT), 1)) AS p
           FROM fr, generate_series(1, 32) AS s(i)),
    tot AS (SELECT doc_id, f, sum(p) AS s FROM px GROUP BY 1, 2),
    fhash AS (SELECT px.doc_id, px.f,
                     sum(CASE WHEN p * 32 > s
                              THEN CAST(1 AS BIGINT) << (32 - CAST(i AS INT))
                              ELSE CAST(0 AS BIGINT) END) AS ahash
              FROM px JOIN tot ON px.doc_id = tot.doc_id AND px.f = tot.f
              GROUP BY 1, 2),
    sampled AS (
      SELECT doc_id AS id, ahash FROM fhash WHERE f <= 2
      UNION ALL
      SELECT doc_id + 1000000000 AS id, ahash FROM fhash WHERE f >= 1),
    pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM sampled a JOIN sampled b
                ON a.ahash = b.ahash AND a.id < b.id)
    SELECT CAST((SELECT count(DISTINCT id) FROM sampled) AS BIGINT) AS n_videos,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(coalesce(sum(CASE WHEN id_b - id_a = 1000000000 THEN 1 END), 0)
                AS BIGINT) AS n_planted_matched
    FROM pairs
    """,
)
def video_framehash_dedup_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup detection via SAMPLED frame hashes (extension:
    the video leg of the dedup family — whole-file hashes miss a
    trimmed/rotated clip, but two videos sharing ANY sampled frame's
    aHash surface from one frame-hash equi-join). Each doc's 4-frame
    synthetic video gains a planted rotated-by-one copy (the trimmed
    clip); the first 3 frames of each video are hashed with the exact
    image aHash, and the verdict counts pairs sharing ≥1 sampled frame
    — rotation leaves 2 shared sampled frames, so every planted pair
    is found. The oracle predicts every frame hash from
    md5(text + '#f<i>') and replays the same join: the decode →
    frame-sample → hash → match pipeline is value-certified end to
    end. At 100 TB the equi-join is Σ bucket² over frame-hash buckets,
    never videos²."""
    from sparkobs.operators.multimodal import synth_video, video_frame_hashes

    vids = synth_video(load_table(spark, sf_dir, "documents"))
    fh = video_frame_hashes(vids, max_frames=3).select("id", "ahash")
    a, b = fh.alias("a"), fh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ahash") == F.col("b.ahash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    n_vids = fh.agg(F.count_distinct("id").cast("long").alias("n_videos"))
    return n_vids.crossJoin(
        F.broadcast(
            pairs.agg(
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("id_b") - F.col("id_a") == 1_000_000_000, 1
                        )
                    ),
                    F.lit(0),
                ).cast("long").alias("n_planted_matched"),
            )
        )
    ).select("n_videos", "n_pairs", "n_planted_matched")
