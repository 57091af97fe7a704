"""Round-12 registry queue — ONE swap entry (join-side AQP).

Same staging discipline as the round-6..11 queues (each promoted in
full, oldest-staged first): entries here are NOT in
``sparkobs.queries.SPARK_QUERIES`` yet because the driver certifies
only the first ``GATE_SIZE`` (50) registry entries per round —
registering more than the rotation can absorb would create
certification debt that ``tests/test_gate_hygiene.py`` rejects.
Staged entries are held here with their DuckDB oracles and exercised
by ``tests/test_r7_queue.py`` with the checker's own comparison;
promoting one = move its entry into ``queries.py`` with the
``@query`` decorator and a ``_PRIORITY`` slot.

REGISTRY CEILING: GATE_SIZE (50) × MAX_CERT_AGE_ROUNDS (6) = 300 —
more registry entries than that and greedy rotation mathematically
cannot keep every entry's stamp within the age ceiling
(ceil(301/50) = 7 > 6). The r11 promotion (grouped theta pair +
``sampled_agg_ci_orders``) took the registry to exactly 300, so
EVERY future staging is a swap: retire a registry entry with a
tombstone FIRST (the discipline the r9 sparse-cosine retirement
established), then stage the replacement here. This round executed
exactly that: ``sparse_cosine_powerlaw_exact`` retired (registry →
299), then ``sampled_join_agg_ci_lineitem`` staged below (299 + 1 =
300, at the ceiling again). The rotation-feasibility tests
(including the promotion-aware boundary fixtures) enforce this
mechanically — run them with the newest driver CORRECTNESS file
present before committing a staged entry.

``len(R7_QUEUE)`` is authoritative for the queue count (the r6
verdict caught prose drifting; the name stays ``R7_QUEUE`` because
every consumer — tests, checker ``--queue`` mode, the ``_q()``
fallback helpers — resolves the queue through it regardless of which
round staged the entries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

R7_QUEUE: dict[str, tuple] = {}


def _queue(name: str, oracle: str | None = None):
    def deco(fn):
        R7_QUEUE[name] = (fn, oracle)
        return fn

    return deco


# --- join-side AQP (r11 swap: the slot freed by the
# sparse_cosine_powerlaw_exact retirement, tombstone in queries.py) --------
# Operator: sampling.sampled_join_agg_ci — coordinated key-UNIVERSE
# sampling over a join (independent per-side samples starve a join
# quadratically; sampling the join-key space once keeps whole key
# clusters, so Horvitz-Thompson runs over per-(group, key) cluster
# totals). Unit tests in tests/test_r11_ops.py cover the one_in=1
# exact degeneracy, hand-recomputed HT arithmetic over clusters, and
# NULL key/value semantics. Staged only after the rotation-
# feasibility simulation (including the promotion-aware boundary
# fixtures) confirmed a 1-entry queue keeps every future gate
# buildable.

_JACI_HASH_L = "md5(CAST(o_orderkey AS VARCHAR))"
_JACI_HASH_R = "md5(CAST(l_orderkey AS VARCHAR))"


def _jaci_hex15(expr: str) -> str:
    from sparkobs.queries import _hex15_sql

    return _hex15_sql(expr)


@_queue(
    "sampled_join_agg_ci_lineitem",
    oracle=None,  # built lazily below (needs _hex15_sql from queries)
)
def sampled_join_agg_ci_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate per-priority joined-row count and extended-price
    total of orders ⋈ lineitem from a 1-in-10 JOIN-KEY-universe
    sample with 95% error bars (extension: join-side AQP — the form
    where independent per-table samples fail; both sides filter by
    the SAME md5-mod predicate on the order key, so sampled keys
    contribute whole join clusters and the HT variance runs over
    cluster totals). The oracle replays the coordinated predicate,
    the per-(priority, key) cluster totals, and the exact-decimal
    HT arithmetic in DuckDB."""
    from sparkobs.io import load_table
    from sparkobs.operators.sampling import sampled_join_agg_ci

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return sampled_join_agg_ci(
        orders,
        lineitem,
        "o_orderkey",
        "l_orderkey",
        ["o_orderpriority"],
        "l_extendedprice",
        one_in=10,
    )


def _jaci_oracle() -> str:
    return f"""
    WITH lk AS (SELECT o_orderkey, o_orderpriority FROM orders
                WHERE ({_jaci_hex15(_JACI_HASH_L)}) % 10 = 0),
    rk AS (SELECT l_orderkey,
                  CAST(l_extendedprice AS DECIMAL(18,2)) AS v
           FROM lineitem
           WHERE ({_jaci_hex15(_JACI_HASH_R)}) % 10 = 0),
    pk AS (SELECT o_orderpriority, o_orderkey AS k,
                  CAST(count(*) AS BIGINT) AS ck,
                  CAST(sum(v) AS DECIMAL(18,2)) AS sk
           FROM lk JOIN rk ON o_orderkey = l_orderkey GROUP BY 1, 2),
    g AS (SELECT o_orderpriority,
                 CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(sum(ck) AS BIGINT) AS njs,
                 CAST(sum(ck * ck) AS BIGINT) AS cksq,
                 sum(sk) AS sd,
                 sum(CAST(sk * sk AS DECIMAL(38,4))) AS ssq
          FROM pk GROUP BY 1)
    SELECT o_orderpriority, n_keys, njs AS n_join_sample,
           CAST(njs * 10 AS BIGINT) AS est_count,
           round(1.959964 * sqrt(CAST(cksq AS DOUBLE) * 90.0), 4)
               AS ci95_count,
           round(CAST(sd * 10 AS DOUBLE), 2) AS est_sum,
           round(1.959964 * sqrt(CAST(ssq AS DOUBLE) * 90.0), 4)
               AS ci95_sum
    FROM g
    """


R7_QUEUE["sampled_join_agg_ci_lineitem"] = (
    sampled_join_agg_ci_lineitem,
    _jaci_oracle(),
)
