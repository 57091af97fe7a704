"""Round-6 registry queue — implemented, unit-tested, oracle-ready.

These queries are NOT in ``sparkobs.queries.SPARK_QUERIES`` yet: the
driver certifies only the first ``GATE_SIZE`` (50) registry entries per
round and the round-5 gate is exactly full, so registering them now
would create certification debt that ``tests/test_gate_hygiene.py``
(rightly) rejects. They are held here with their DuckDB oracles and
exercised by ``tests/test_r6_queue.py`` against the same checker logic
the driver uses; promoting one = move its entry into ``queries.py``
with the ``@query`` decorator and give it a ``_PRIORITY`` slot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkobs.io import load_table

R6_QUEUE: dict[str, tuple] = {}


def _queue(name: str, oracle: str | None = None):
    def deco(fn):
        R6_QUEUE[name] = (fn, oracle)
        return fn

    return deco


@_queue(
    "market_share_q8",
    oracle="""
    SELECT yr,
           round(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share,
           round(sum(volume), 2) AS total_volume
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             n1.n_name AS supp_nation,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01')
    GROUP BY yr
    """,
)
def market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of a
    region's import volume by order year — conditional-sum ratio over
    a 6-table star join, nation/region legs broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_regionkey").alias("rk2")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .join(F.broadcast(r), F.col("rk2") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
    )


@_queue(
    "top_supplier_q15",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS sk,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY 1)
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON s_suppkey = sk
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarter revenue per supplier,
    keep the maximum-revenue supplier(s). The max is a 1-row broadcast
    (no collect, no second scan of lineitem — the revenue agg is
    reused for both the max and the filter legs)."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__mx"))
        .join(s, F.col("s_suppkey") == F.col("sk"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_queue(
    "zipf_fit_documents",
    oracle="""
    WITH counts AS (
      SELECT t.tok, count(*) AS freq
      FROM (SELECT u.t AS tok
            FROM documents,
                 unnest(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS u(t)) t
      GROUP BY 1 HAVING count(*) >= 2),
    ranked AS (
      SELECT tok, freq,
             row_number() OVER (ORDER BY freq DESC, tok ASC) AS rank
      FROM counts)
    SELECT round(regr_slope(ln(freq), ln(rank)), 4) AS zipf_slope,
           CAST(count(*) AS BIGINT) AS vocab_size,
           min_by(tok, rank) AS top_token,
           CAST(max(freq) AS BIGINT) AS top_freq
    FROM ranked
    """,
)
def zipf_fit_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf-law fit (extension: corpus health)."""
    from sparkobs.operators.text import zipf_fit

    return zipf_fit(load_table(spark, sf_dir, "documents"))


@_queue(
    "minmax_norm_events_by_type",
    oracle="""
    SELECT event_type, event_id, value,
           round(CASE WHEN mx > mn THEN (value - mn) / (mx - mn) ELSE 0.0 END, 4)
             AS v_norm,
           round(mn, 4) AS g_min,
           round(mx, 4) AS g_max
    FROM (SELECT event_type, event_id, value,
                 min(value) OVER (PARTITION BY event_type) AS mn,
                 max(value) OVER (PARTITION BY event_type) AS mx
          FROM events)
    """,
)
def minmax_norm_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max normalization (extension: featurization)."""
    from sparkobs.operators.features import group_minmax_norm

    return group_minmax_norm(
        load_table(spark, sf_dir, "events"),
        ["event_type"],
        "value",
        keep_cols=["event_id"],
    )


@_queue(
    "hist2d_hour_value_events",
    oracle="""
    SELECT CAST(hour(ts) AS INT) AS x,
           CAST(least(greatest(CAST(floor(value / 60.0) AS INT), 0), 9) AS BIGINT)
             AS y_bin,
           round(CAST(least(greatest(CAST(floor(value / 60.0) AS INT), 0), 9) * 60.0 AS DOUBLE), 4)
             AS y_lo,
           CAST(count(*) AS BIGINT) AS n
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2, 3
    """,
)
def hist2d_hour_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D heatmap histogram: hour-of-day x value band (extension:
    profiling)."""
    from sparkobs.operators.profile import histogram2d

    return histogram2d(
        load_table(spark, sf_dir, "events"),
        F.hour("ts").cast("int"),
        "value",
        y_lo=0.0,
        y_hi=600.0,
        y_bins=10,
    )


@_queue(
    "chi_square_events_type_hour",
    oracle="""
    WITH cells AS (
      SELECT event_type AS a, hour(ts) AS b, CAST(count(*) AS DOUBLE) AS o
      FROM events GROUP BY 1, 2),
    ra AS (SELECT a, sum(o) AS ra FROM cells GROUP BY 1),
    cb AS (SELECT b, sum(o) AS cb FROM cells GROUP BY 1),
    nt AS (SELECT sum(o) AS n, count(*) AS n_cells FROM cells)
    SELECT round(sum((o - ra * cb / n) * (o - ra * cb / n) / (ra * cb / n)), 4)
             AS chi2,
           CAST((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS BIGINT) AS dof,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(n_cells) AS BIGINT) AS n_cells
    FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN nt
    """,
)
def chi_square_events_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence of event_type x hour-of-day
    (extension: statistical profiling)."""
    from sparkobs.operators.profile import chi_square_independence

    return chi_square_independence(
        load_table(spark, sf_dir, "events"), F.col("event_type"), F.hour("ts")
    )


def _hex15(col_sql: str) -> str:
    from sparkobs.queries import _hex15_sql

    return _hex15_sql(col_sql)


@_queue(
    "debounce_events_user_type",
    oracle="""
    SELECT event_id, user_id, event_type, ts, round(value, 4) AS value
    FROM (
      SELECT event_id, user_id, event_type, ts, value,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events)
    WHERE prev_ts IS NULL
       OR epoch_us(ts) - epoch_us(prev_ts) >= 600 * 1000000
    """,
)
def debounce_events_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst debounce (extension: event hygiene): keep only the first
    event of each (user, type) burst under a 10-minute gap rule."""
    from sparkobs.operators.behavior import debounce_first_of_burst

    ev = load_table(spark, sf_dir, "events")
    out = debounce_first_of_burst(
        ev, ["user_id", "event_type"], "ts", "event_id", gap_seconds=600
    )
    return out.select(
        "event_id", "user_id", "event_type", "ts", F.round("value", 4).alias("value")
    )


@_queue(
    "gini_user_activity_events",
    oracle="""
    WITH freq AS (SELECT user_id, count(*) AS freq FROM events GROUP BY 1),
    ranked AS (
      SELECT freq, row_number() OVER (ORDER BY freq ASC, user_id ASC) AS i
      FROM freq)
    SELECT round(2.0 * sum(i * freq) / (count(*) * sum(freq))
                 - (count(*) + 1.0) / count(*), 4) AS gini,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(freq) AS BIGINT) AS n_rows,
           CAST(max(freq) AS BIGINT) AS max_freq
    FROM ranked
    """,
)
def gini_user_activity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event concentration (extension:
    skew diagnostics)."""
    from sparkobs.operators.profile import gini_concentration

    return gini_concentration(load_table(spark, sf_dir, "events"), "user_id")


@_queue(
    "mad_events_by_type",
    oracle="""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 4) AS median_val
      FROM events GROUP BY 1)
    SELECT e.event_type, max(m.median_val) AS median_val,
           round(quantile_cont(abs(e.value - m.median_val), 0.5), 4) AS mad,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY 1
    """,
)
def mad_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type (extension: robust
    statistics)."""
    from sparkobs.operators.profile import grouped_mad

    return grouped_mad(load_table(spark, sf_dir, "events"), ["event_type"], "value")


@_queue(
    "bigram_pmi_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS tk
      FROM documents),
    bi AS (
      SELECT u.p.lhs AS lhs, u.p.rhs AS rhs, count(*) AS c_ab
      FROM (SELECT list_zip(tk[1:len(tk)-1], tk[2:len(tk)]) AS ps FROM toks
            WHERE len(tk) >= 2) z,
           unnest(list_transform(ps, q -> {'lhs': q[1], 'rhs': q[2]})) AS u(p)
      GROUP BY 1, 2 HAVING count(*) >= 5),
    uni AS (
      SELECT u.t AS tok, count(*) AS c
      FROM toks, unnest(tk) AS u(t) GROUP BY 1),
    tot AS (
      SELECT (SELECT sum(c) FROM uni) AS n_uni,
             (SELECT sum(greatest(len(tk) - 1, 0)) FROM toks) AS n_bi)
    SELECT lhs, rhs, CAST(c_ab AS BIGINT) AS c_ab,
           round(ln(c_ab * n_uni * n_uni
                    / (n_bi * ua.c * ub.c)), 4) AS pmi
    FROM bi
    JOIN uni ua ON ua.tok = lhs
    JOIN uni ub ON ub.tok = rhs
    CROSS JOIN tot
    ORDER BY pmi DESC, lhs ASC, rhs ASC
    LIMIT 20
    """,
)
def bigram_pmi_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI over adjacent token pairs
    (extension: phrase mining)."""
    from sparkobs.operators.text import bigram_pmi

    return bigram_pmi(load_table(spark, sf_dir, "documents"), k=20, min_count=5)


@_queue(
    "weighted_sample_documents",
    oracle=f"""
    SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
           round(pow(u, 1.0 / n_chars), 10) AS score
    FROM (
      SELECT doc_id, n_chars,
             ({_hex15("md5('ws' || CAST(doc_id AS VARCHAR))")} + 1.0)
               / (power(16, 15) + 2) AS u
      FROM documents)
    ORDER BY score DESC, doc_id ASC
    LIMIT 50
    """,
)
def weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Efraimidis-Spirakis weighted sample of 50 docs by
    length (extension: weighted sampling)."""
    from sparkobs.operators.sampling import weighted_sample

    return weighted_sample(
        load_table(spark, sf_dir, "documents"), "n_chars", k=50
    )


def _merkle_side_sql(pred: str, tag: str) -> str:
    """DuckDB bucket summary over orders rows matching ``pred`` —
    md5-portable twin of state.merkle_bucket_summary(hash_fn='md5')."""
    key_h = _hex15("md5(CAST(o_orderkey AS VARCHAR))")
    row_h = _hex15(
        "md5(CAST(o_orderkey AS VARCHAR) || chr(31) || "
        "CAST(o_orderstatus AS VARCHAR) || chr(31) || "
        "CAST(round(o_totalprice, 2) AS VARCHAR))"
    )
    return f"""
      SELECT ({key_h}) % 64 AS bucket,
             count(*) AS n_{tag},
             bit_xor({row_h}) AS sig_{tag}
      FROM (SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE {pred})
      GROUP BY 1"""


@_queue(
    "merkle_diff_orders",
    oracle=f"""
    WITH a AS ({_merkle_side_sql("o_orderkey % 100 <> 1", "old")}),
    b AS ({_merkle_side_sql("o_orderkey % 100 <> 0", "new")})
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(coalesce(n_old, 0) AS BIGINT) AS n_old,
           CAST(coalesce(n_new, 0) AS BIGINT) AS n_new
    FROM a FULL OUTER JOIN b USING (bucket)
    WHERE coalesce(sig_old <> sig_new, TRUE)
       OR coalesce(n_old, 0) <> coalesce(n_new, 0)
    """,
)
def merkle_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style anti-entropy bucket diff (extension: table
    reconciliation at scale): two order snapshots exchange 64 bucket
    signatures; only buckets whose XOR-of-row-hashes or count differs
    need row-level diffing. md5-portable hash mode so the decision is
    engine-reproducible bit for bit."""
    from sparkobs.operators.state import merkle_diff

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    old = o.where(F.col("o_orderkey") % 100 != 1)
    new = o.where(F.col("o_orderkey") % 100 != 0)
    return merkle_diff(
        old,
        new,
        ["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice"],
        n_buckets=64,
        hash_fn="md5",
    )


@_queue(
    "ks_drift_events_halves",
    oracle="""
    WITH a AS (
      SELECT least(greatest(CAST(floor(value / 6.0) AS INT), 0), 99) AS bin,
             count(*) AS c_a
      FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL GROUP BY 1),
    b AS (
      SELECT least(greatest(CAST(floor(value / 6.0) AS INT), 0), 99) AS bin,
             count(*) AS c_b
      FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL GROUP BY 1),
    cells AS (
      SELECT coalesce(a.bin, b.bin) AS bin,
             coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
      FROM a FULL OUTER JOIN b ON a.bin = b.bin),
    tot AS (SELECT sum(c_a) AS n_a, sum(c_b) AS n_b FROM cells),
    cdfs AS (
      SELECT sum(c_a) OVER (ORDER BY bin) * 1.0 / n_a AS cdf_a,
             sum(c_b) OVER (ORDER BY bin) * 1.0 / n_b AS cdf_b,
             n_a, n_b
      FROM cells CROSS JOIN tot)
    SELECT round(max(abs(cdf_a - cdf_b)), 4) AS ks_d,
           CAST(max(n_a) AS BIGINT) AS n_a,
           CAST(max(n_b) AS BIGINT) AS n_b
    FROM cdfs
    """,
)
def ks_drift_events_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov distance between the even
    and odd event halves (extension: distribution-shift testing, the
    exact-up-to-bin-width companion of PSI)."""
    from pyspark.sql import functions as F_  # noqa: F401

    from sparkobs.operators.profile import ks_drift_binned

    ev = load_table(spark, sf_dir, "events")
    return ks_drift_binned(
        ev.where(F.col("event_id") % 2 == 0),
        ev.where(F.col("event_id") % 2 == 1),
        "value",
        lo=0.0,
        hi=600.0,
        n_bins=100,
    )


@_queue(
    "target_encode_events_type",
    oracle="""
    WITH agg AS (
      SELECT event_type, round(sum(value), 4) AS s, count(value) AS n
      FROM events GROUP BY 1)
    SELECT e.event_type, e.event_id, e.value,
           CASE WHEN n > 1 THEN (s - e.value) / (n - 1) END AS te_loo,
           CAST(n AS BIGINT) AS cat_n
    FROM events e JOIN agg USING (event_type)
    """,
)
def target_encode_events_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of event_type by value
    (extension: leakage-safe ML featurization)."""
    from sparkobs.operators.features import target_encode_loo

    return target_encode_loo(
        load_table(spark, sf_dir, "events"),
        "event_type",
        "value",
        keep_cols=["event_id"],
    )


@_queue(
    "vocab_segments_documents",
    oracle="""
    WITH counts AS (
      SELECT u.t AS tok, count(*) AS freq
      FROM documents,
           unnest(list_filter(string_split_regex(text, '\\s+'),
                              x -> x <> '')) AS u(t)
      GROUP BY 1),
    tot AS (SELECT sum(freq) AS tt FROM counts),
    ranked AS (
      SELECT freq,
             sum(freq) OVER (ORDER BY freq DESC, tok ASC) * 1.0 / tt AS cum_share,
             tt
      FROM counts CROSS JOIN tot)
    SELECT CASE WHEN cum_share <= 0.5 THEN 'head'
                WHEN cum_share <= 0.9 THEN 'torso'
                ELSE 'tail' END AS segment,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(freq) AS BIGINT) AS occurrences,
           round(sum(freq) * 1.0 / max(tt), 4) AS share
    FROM ranked GROUP BY 1
    """,
)
def vocab_segments_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head/torso/tail vocabulary segmentation by cumulative frequency
    share (extension: corpus budgeting)."""
    from sparkobs.operators.text import vocab_segments

    return vocab_segments(load_table(spark, sf_dir, "documents"))


@_queue(
    "compaction_plan_sf_dir",
    oracle="""
    WITH l AS (SELECT 'file:' || filename AS path, CAST(size AS BIGINT) AS length
               FROM read_blob('{SF_DIR}/*')),
    cum AS (SELECT path, length,
                   sum(length) OVER (ORDER BY path) AS c
            FROM l)
    SELECT CAST(floor((c - length) / 2000000.0) AS BIGINT) AS group_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(length) AS BIGINT) AS total_bytes,
           min(path) AS first_path,
           max(path) AS last_path
    FROM cum GROUP BY 1
    """,
)
def compaction_plan_sf_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan over the data directory's listing
    (extension: lake maintenance): ~2 MB merge groups in path order,
    planned with the distributed prefix sum. DuckDB stats the same
    files via read_blob, so the plan is value-checked end to end."""
    from sparkobs.sources.listing import compaction_plan, list_files

    return compaction_plan(
        list_files(spark, sf_dir).select("path", "length"),
        target_bytes=2_000_000,
    )


@_queue(
    "robust_outliers_events",
    oracle="""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med
      FROM events GROUP BY 1),
    mad AS (
      SELECT e.event_type,
             max(m.med) AS med,
             round(quantile_cont(abs(e.value - m.med), 0.5), 4) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY 1)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN mad > 0
                         AND abs(e.value - m.med) / (1.4826 * mad) > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           max(m.med) AS med,
           max(m.mad) AS mad
    FROM events e JOIN mad m USING (event_type)
    GROUP BY 1
    """,
)
def robust_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (MAD-based) outlier counts per event type (extension:
    outlier-insensitive monitoring — the consistent-estimator z-score
    |v − median| / (1.4826·MAD) > 3.5, immune to the outliers it
    hunts, unlike mean/stddev z-scores)."""
    from pyspark.sql import functions as F_  # noqa: F401

    from sparkobs.operators.profile import grouped_mad

    ev = load_table(spark, sf_dir, "events")
    mad = grouped_mad(ev, ["event_type"], "value")
    j = ev.join(F.broadcast(mad), "event_type")
    is_out = (F.col("mad") > 0) & (
        F.abs(F.col("value") - F.col("median_val")) / (1.4826 * F.col("mad")) > 3.5
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(is_out.cast("long")).alias("n_outliers"),
        F.max("median_val").alias("med"),
        F.max("mad").alias("mad"),
    )


@_queue(
    "top_event_trigrams",
    oracle="""
    WITH seq AS (
      SELECT event_type AS s0,
             lead(event_type, 1) OVER w AS s1,
             lead(event_type, 2) OVER w AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT s0 || '>' || s1 || '>' || s2 AS ngram,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM seq WHERE s2 IS NOT NULL
    GROUP BY 1
    ORDER BY n_occurrences DESC, ngram ASC
    LIMIT 20
    """,
)
def top_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user journeys (extension: behavioral n-gram
    mining via per-key lead windows — no journey collect)."""
    from sparkobs.operators.behavior import top_event_ngrams

    return top_event_ngrams(load_table(spark, sf_dir, "events"), n=3, k=20)


@_queue(
    "percent_rank_orders_by_status",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice, 2) AS o_totalprice,
           percent_rank() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS pr,
           cume_dist() OVER (PARTITION BY o_orderstatus
                             ORDER BY o_totalprice, o_orderkey) AS cd
    FROM orders
    """,
)
def percent_rank_orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic ranking coverage: percent_rank + cume_dist per status
    with a deterministic tiebreak (extension: window-function breadth
    — the relative-standing view of each order within its status)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        # deliberately UNROUNDED: (rank−1)/(n−1) and rank/n are single
        # divisions of identical integers — bit-identical across
        # engines, while rounding diverges when a power-of-two group
        # size puts the exact value on a rounding boundary
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@_queue(
    "mutual_info_events_type_hour",
    oracle="""
    WITH cells AS (
      SELECT event_type AS a, hour(ts) AS b, CAST(count(*) AS DOUBLE) AS o
      FROM events GROUP BY 1, 2),
    ra AS (SELECT a, sum(o) AS ra FROM cells GROUP BY 1),
    cb AS (SELECT b, sum(o) AS cb FROM cells GROUP BY 1),
    nt AS (SELECT sum(o) AS n FROM cells),
    mi AS (
      SELECT round(sum((o / n) * ln(o * n / (ra * cb))), 4) AS mi_nats
      FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN nt),
    ha AS (SELECT round(sum(-(ra / n) * ln(ra / n)), 4) AS h_a
           FROM ra CROSS JOIN nt),
    hb AS (SELECT round(sum(-(cb / n) * ln(cb / n)), 4) AS h_b
           FROM cb CROSS JOIN nt)
    SELECT mi_nats, h_a, h_b,
           round(mi_nats / least(h_a, h_b), 4) AS mi_normalized
    FROM mi CROSS JOIN ha CROSS JOIN hb
    """,
)
def mutual_info_events_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour-of-day
    (extension: dependence effect size, the bits behind the chi-square
    verdict)."""
    from sparkobs.operators.profile import mutual_information

    return mutual_information(
        load_table(spark, sf_dir, "events"), F.col("event_type"), F.hour("ts")
    )
