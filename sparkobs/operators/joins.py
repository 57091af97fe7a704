"""Join operators beyond plain equi-joins: as-of, zip, set ops, salting.

The reference has only lookup/equi joins (SURVEY.md §2.3); these are
the joins a monitoring/training-data engine needs at scale that Spark
doesn't ship as single operators, each built from shuffle-friendly
primitives:

- **as-of join** — "latest right row at or before the left timestamp"
  (market-data / snapshot semantics). No sort-merge-as-of in Spark, so
  it's expressed as a union + window ``last_value(ignorenulls)`` over
  event time per key: ONE shuffle on (key), no range self-join blowup.
- **positional zip join** — index-pairing two equal-length frames
  (OP-20's list zipping, s3_key_monitor.py:159) via row_number joins;
  provided for parity but carrying struct columns is always better.
- **salted aggregation** — two-stage groupBy for skewed keys: salt →
  partial agg on (key, salt) → final agg on key. AQE handles skewed
  *joins*; skewed *aggregations* still benefit from explicit salting.
- **range join** — point-in-interval via fixed-width bucketization:
  equi-join on bucket id + residual predicate instead of the
  BroadcastNestedLoopJoin a raw theta join plans to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right.ts <= left.ts`` (backward; ``forward`` = earliest >=),
    matching DuckDB/pandas ``merge_asof`` semantics.

    Implementation: tag and union both sides, then per key ordered by
    (ts, side, tie) take ``last_value(..., ignorenulls)`` of the right
    payload — a single shuffle on the key, linear in rows, no
    theta-join. Right rows at exactly left.ts match (ties: right sorts
    before left via the side tag).

    Determinism: when the right side has MULTIPLE rows at the same
    (key, ts), the winner is the greatest right payload under struct
    comparison of ``right_value_cols`` — not partition-order dependent.
    Pre-dedup the right side if a different rule is wanted.

    The right payload crosses the shuffle ONCE, as a single ``__r``
    struct that is both the tie-breaker ordering column and the filled
    value (``last(__r, ignorenulls)``). Whole-row fill also means a
    matched right row's own interior nulls are carried as-is
    (merge_asof semantics), rather than per-column fills mixing values
    from different right rows.
    """
    from pyspark.sql.types import StructField, StructType

    rcols = right_value_cols or [c for c in right.columns if c not in (key, ts)]
    lcols = left.columns
    r_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in rcols]
    )

    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_type).alias("__r"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lrow"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
    )
    if direction == "backward":
        ts_order = F.asc("__ts")
    elif direction == "forward":
        ts_order = F.desc("__ts")
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")
    w = (
        W.partitionBy("__k")
        .orderBy(ts_order, F.asc("__side"), F.asc_nulls_last("__r"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = l_tag.unionByName(r_tag).withColumn(
        "__f", F.last("__r", ignorenulls=True).over(w)
    )
    return (
        filled.where(F.col("__side") == 1)
        .select(
            *[F.col("__lrow")[c].alias(c) for c in lcols],
            *[F.col("__f")[c].alias(f"{c}_asof") for c in rcols],
        )
    )


def _with_partition_offsets(
    df: DataFrame, order: list, part_agg, fold: str = "sum"
) -> DataFrame:
    """Shared plumbing for global-scan operators (row index, running
    sum/max): range-repartition + sort on the order columns, stamp
    ``spark_partition_id``, and attach ``__off`` = the ``fold``
    (sum | max) of ``part_agg`` over all EARLIER partitions. Offsets
    come from a per-partition aggregate (~numPartitions rows) folded
    by a broadcast triangular self-join (NOT a window — keeps the plan
    free of empty-partitionBy WindowExec); both branches hang off the
    SAME range exchange, which Catalyst's ReuseExchange dedupes, so
    the partition ids are consistent between them. ``fold="max"``
    leaves the first partition's offset NULL (no earlier partitions —
    callers use null-skipping ``greatest``); ``fold="sum"`` coalesces
    it to 0.
    """
    if fold not in ("sum", "max"):
        raise ValueError(
            f"fold must be 'sum' or 'max', got {fold!r} — a typo here "
            "would silently produce wrong running aggregates"
        )
    with_pid = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
    )
    sizes = with_pid.groupBy("__pid").agg(part_agg.alias("__n"))
    prev = sizes.select(F.col("__pid").alias("__pid2"), F.col("__n").alias("__n2"))
    fold_expr = (
        F.coalesce(F.sum("__n2"), F.lit(0)) if fold == "sum" else F.max("__n2")
    )
    offsets = (
        sizes.join(F.broadcast(prev), F.col("__pid2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(fold_expr.alias("__off"))
    )
    return with_pid.join(F.broadcast(offsets), "__pid")


def global_row_index(df: DataFrame, order_cols: list[str], index_col: str = "__idx") -> DataFrame:
    """Distributed 1-based global row index under an explicit ordering —
    NO single-partition window: index = per-partition ``row_number``
    (parallel) + the partition's cumulative count offset
    (:func:`_with_partition_offsets`).
    """
    order = [F.asc(c) for c in order_cols]
    base = _with_partition_offsets(df, order, F.count(F.lit(1)))
    w = W.partitionBy("__pid").orderBy(*order)
    return base.withColumn(
        index_col, F.row_number().over(w) + F.col("__off")
    ).drop("__pid", "__off")


def global_running_sum(
    df: DataFrame, order_cols: list[str], value_col: str, out_col: str = "__cum"
) -> DataFrame:
    """Distributed INCLUSIVE running sum of ``value_col`` under an
    explicit global ordering — the token-stream offset primitive for
    sequence packing. Same exchange-reuse plan as
    :func:`global_row_index`: per-partition running-sum window
    (parallel) + broadcast per-partition sum offsets; no
    single-partition window anywhere.
    """
    order = [F.asc(c) for c in order_cols]
    base = _with_partition_offsets(df, order, F.sum(value_col))
    w = (
        W.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return base.withColumn(
        out_col, F.sum(value_col).over(w) + F.col("__off")
    ).drop("__pid", "__off")


def global_running_max(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "__runmax",
) -> DataFrame:
    """Distributed STRICTLY-PRECEDING running max of ``value_col``
    under an explicit global ordering — NULL for the globally first
    row (no earlier rows). Same exchange-reuse plan as
    :func:`global_row_index`: per-partition running-max window over
    the ``(unboundedPreceding, -1)`` frame (parallel) + broadcast
    max-of-earlier-partitions offsets combined with null-skipping
    ``greatest``; no single-partition window anywhere. The primitive
    behind arrival-order diagnostics (event-time disorder)."""
    order = [F.asc(c) for c in order_cols]
    base = _with_partition_offsets(df, order, F.max(value_col), fold="max")
    w = (
        W.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return base.withColumn(
        out_col, F.greatest(F.max(value_col).over(w), F.col("__off"))
    ).drop("__pid", "__off")


def zip_join(left: DataFrame, right: DataFrame, order_left: list[str], order_right: list[str]) -> DataFrame:
    """Positional zip join (OP-20): pair the i-th row of each side under
    explicit orderings. The reference zips parallel Python lists
    (s3_key_monitor.py:159,190); here each side gets a distributed
    global row index (global_row_index — per-partition row_number +
    broadcast partition offsets, no single-partition window) and the
    pairing is a plain equi-join. Prefer carrying struct columns; this
    exists for parity."""
    ln = global_row_index(left, order_left)
    rn = global_row_index(right, order_right)
    return ln.join(rn, "__idx").drop("__idx")


def salted_group_count(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Skew-resistant grouped count: groupBy (key, salt) partial counts,
    then final groupBy (key). A hot key spreads over ``salt_buckets``
    reducers in stage 1 instead of landing on one. Identical result to
    a plain groupBy-count — tested; intended for keys with power-law
    frequency at 100 TB."""
    salted = df.withColumn(
        "__salt", (F.crc32(F.col(key).cast("string")) % salt_buckets).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("cnt"))


def key_skew_stats(df: DataFrame, key: str, top_n: int = 5) -> DataFrame:
    """Shuffle-health diagnostic for a prospective join/agg key: the
    frequency distribution of ``key`` summarized as one row — total
    rows, distinct keys, max/mean frequency, and the skew ratio
    (max/mean; the factor by which the hottest reducer outweighs the
    average one) — plus the ``top_n`` hottest keys as a csv string.

    This is the measurement behind the salting/broadcast/LSH-tier
    decisions documented in SCALE.md: a skew ratio near 1 shuffles
    cleanly; 100+ means the hot keys serialize a stage and the plan
    needs salting (:func:`salted_group_count`), AQE skew-join, or a
    different key. One hash agg on the key (map-side combined) + one
    tiny top-n — cost ≈ a grouped count, safe to run on 100 TB before
    committing to a join strategy.
    """
    freq = df.groupBy(key).agg(F.count(F.lit(1)).alias("freq"))
    # csv order is made deterministic by sorting the collected structs
    # (collect_list order is not contractual): (-freq, key-string) asc
    # = hottest first, lexical key tiebreak — mirrored in the oracle
    hot = (
        freq.orderBy(F.desc("freq"), F.asc(F.col(key).cast("string")))
        .limit(top_n)
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (-F.col("freq")).alias("nf"),
                                F.col(key).cast("string").alias("k"),
                            )
                        )
                    ),
                    lambda s: F.concat_ws(
                        ":", s["k"], (-s["nf"]).cast("string")
                    ),
                ),
            ).alias("top_keys")
        )
    )
    stats = freq.agg(
        F.sum("freq").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("freq").cast("long").alias("max_freq"),
        F.round(F.avg("freq"), 4).alias("mean_freq"),
        F.round(F.max("freq") / F.avg("freq"), 4).alias("skew_ratio"),
    )
    return stats.crossJoin(hot)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval range join (``lo <= value <= hi``) WITHOUT the
    nested-loop plan Spark gives a raw theta join.

    Bucketization: every interval explodes to the fixed-width buckets
    it covers (cost ∝ span/width rows per interval); every point lands
    in exactly ONE bucket, so the equi-join on bucket id + the residual
    range predicate produces each true pair exactly once — no
    dedup step, no BroadcastNestedLoopJoin, and the shuffle is a plain
    hash partition on the bucket id. Pick ``bucket_width`` near the
    TYPICAL interval span: wider buckets mean fewer interval copies but
    more same-bucket candidates failing the residual check; the classic
    range-join binning trade. Both inputs keep all their columns.
    """
    if bucket_width <= 0:
        # width 0 would floor-divide to ±Inf bucket ids and ask
        # sequence() for a ~2^64-element array (or collapse every
        # interval into one bucket — the cross product this operator
        # exists to avoid)
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    p = points.withColumn(
        "__b", F.floor(F.col(value_col) / bucket_width).cast("long")
    )
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        p.alias("p")
        .join(
            iv.alias("i"),
            (F.col("p.__b") == F.col("i.__b"))
            & (F.col(f"p.{value_col}") >= F.col(f"i.{lo_col}"))
            & (F.col(f"p.{value_col}") <= F.col(f"i.{hi_col}")),
        )
        .drop("__b")
    )


def fuzzy_best_match(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    block_len: int = 6,
    max_dist: int = 1,
) -> DataFrame:
    """Blocked fuzzy entity matching: candidate pairs come from an
    EQUI-join on a blocking key (the first ``block_len`` chars), the
    edit-distance filter runs only inside blocks, and each left entity
    keeps its single best match (lowest distance, ties on the right
    key) — the record-linkage shape that never goes quadratic.

    The blocking equi-join is the whole scale story: Levenshtein is
    O(|a|·|b|) per pair, so the join graph must be pruned BEFORE the
    measure — candidates are Σ|block|² instead of |L|·|R|, and a
    skewed block is visible in :func:`key_skew_stats` before it hurts.
    (A prefix block can miss matches whose edits fall inside the
    prefix; use multiple blocking passes — prefix, suffix, phonetic —
    unioned, for recall-critical linkage.) Best-match selection is a
    WindowGroupLimit-prunable rank window on the left key.
    """
    lb = left.select(
        F.col(left_key).alias("left_value"),
        F.substring(F.col(left_key), 1, block_len).alias("__blk"),
    ).distinct()
    rb = right.select(
        F.col(right_key).alias("right_value"),
        F.substring(F.col(right_key), 1, block_len).alias("__blk"),
    ).distinct()
    cand = lb.join(rb, "__blk").withColumn(
        "dist", F.levenshtein("left_value", "right_value")
    ).where(F.col("dist") <= max_dist)
    from pyspark.sql import Window

    w = Window.partitionBy("left_value").orderBy(
        F.asc("dist"), F.asc("right_value")
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("left_value", "right_value", F.col("dist").cast("long").alias("dist"))
    )


def join_size_diagnostic(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top_n: int = 5,
) -> DataFrame:
    """Pre-flight join-explosion diagnostic: the EXACT output
    cardinality of ``left ⋈ right`` on the key (Σ over shared keys of
    n_left·n_right) plus how concentrated it is — before paying for
    the join itself. A 100 TB join that explodes does so on a handful
    of hot keys; this shows them while the plan is still cheap to
    change (salt, filter, or pre-aggregate).

    Cost: one count-agg per side (shuffle on the key, rows ∝ distinct
    keys), one join of the two COUNT tables (never the data), one sum.
    Output row: est_join_rows, n_shared_keys, top-key concentration
    (share of output owed to the ``top_n`` hottest keys) and those
    keys as csv.
    """
    lc = left.groupBy(F.col(left_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__nl")
    )
    rc = right.groupBy(F.col(right_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__nr")
    )
    contrib = lc.join(rc, "__k").select(
        "__k", (F.col("__nl") * F.col("__nr")).alias("__rows")
    )
    top = (
        contrib.orderBy(F.desc("__rows"), F.asc("__k"))
        .limit(top_n)
        .agg(
            F.sum("__rows").alias("__top_rows"),
            # explicit in-agg sort: collect_list order after a limit is
            # not a contract, even when it happens to come back sorted
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (-F.col("__rows")).alias("nr"),
                                F.col("__k").alias("k"),
                            )
                        )
                    ),
                    lambda s: s["k"].cast("string"),
                ),
            ).alias("top_keys"),
        )
    )
    totals = contrib.agg(
        F.coalesce(F.sum("__rows"), F.lit(0)).cast("long").alias("est_join_rows"),
        F.count(F.lit(1)).cast("long").alias("n_shared_keys"),
    )
    return totals.crossJoin(F.broadcast(top)).select(
        "est_join_rows",
        "n_shared_keys",
        F.when(
            F.col("est_join_rows") > 0,
            F.round(F.col("__top_rows") / F.col("est_join_rows"), 4),
        ).otherwise(F.lit(0.0)).alias("top_key_share"),
        F.coalesce(F.col("top_keys"), F.lit("")).alias("top_keys"),
    )


def cooccurrence_jaccard(
    df: DataFrame, key_col: str, basket_col: str, top_k: int = 20
) -> DataFrame:
    """Related-entity mining: Jaccard similarity between keys' basket
    SETS (suppliers related by shared customers, documents by shared
    shingles) — the set-overlap companion of association_rules' lift.
    One distinct pass, then a self-join THROUGH the basket (candidate
    pairs are generated per basket, so the join is bounded by basket
    degree — Σ deg², never keys²; cap pathological hub baskets
    upstream the way sparse-cosine caps hot dimensions). Jaccard is a
    single division of exact integers (|A∩B| / (|A|+|B|−|A∩B|)),
    left unrounded — bit-identical on any engine. Deterministic
    top-k: (jaccard desc, key1, key2). ``key_a``/``key_b`` keep the
    input key column's type (string doc ids stay strings — r6 advice:
    a hard long cast silently NULLed non-numeric keys and collapsed
    distinct pairs).
    """
    # checkpointed: the distinct key-basket frame feeds the size
    # table AND both self-join sides; lazy, its upstream derivation
    # (source scans + distinct) re-ran per reference (r13 scan
    # audit). It is also the self-join input, so materializing once
    # is pure win at any scale.
    b = (
        df.select(F.col(key_col).alias("__k"), F.col(basket_col).alias("__b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sz = b.groupBy("__k").agg(F.count(F.lit(1)).alias("__n"))
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.__b") == F.col("y.__b"))
            & (F.col("x.__k") < F.col("y.__k")),
        )
        .groupBy(
            F.col("x.__k").alias("k1"), F.col("y.__k").alias("k2")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    n1 = sz.select(F.col("__k").alias("k1"), F.col("__n").alias("na"))
    n2 = sz.select(F.col("__k").alias("k2"), F.col("__n").alias("nb"))
    return (
        pairs.join(F.broadcast(n1), "k1")
        .join(F.broadcast(n2), "k2")
        .select(
            F.col("k1").alias("key_a"),
            F.col("k2").alias("key_b"),
            F.col("shared").cast("long").alias("n_shared"),
            (
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared"))
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "key_a", "key_b")
        .limit(top_k)
    )
