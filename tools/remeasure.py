"""Isolated per-query re-measure: p50/spread of N timed reps, alone.

The r14 verdict's triage items (ambiguous tail movers, stall-window
suspects) need ISOLATED 32-core numbers with enough reps to separate
noise from cause — bench.py's tail loop records reps=1, which cannot.
This runs each named registry query in the shared session, one warm-up
rep then ``--reps`` timed reps (default 5), releasing session state
(SQL cache + LSH candidate persists + temp views) before every timed
rep — the same clean-cache discipline as bench.timed_reps — and prints
per-query p50 / min / max / all reps.

Usage:
    python tools/remeasure.py [--sf DIR] [--reps N] name ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 5
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf_dir = argv[i + 1]; i += 2
        elif argv[i] == "--reps":
            reps = int(argv[i + 1]); i += 2
        else:
            names.append(argv[i]); i += 1
    if not names:
        print("usage: remeasure.py [--sf DIR] [--reps N] name ...")
        return 2

    import __spark_entry__ as entrymod
    from sparkobs.session import get_spark

    spark = get_spark("sparkobs-remeasure")
    qs = entrymod.queries()
    # warm the JVM + Python/Arrow worker path (same as bench.py)
    spark.range(1000).selectExpr("sum(id)").collect()

    def _ident(batches):
        for b in batches:
            yield b

    spark.range(1000).selectExpr("id", "cast(id as double) x").repartition(
        8
    ).mapInPandas(_ident, "id long, x double").count()

    baseline_tables = {t.name for t in spark.catalog.listTables()}

    def release():
        from sparkobs.operators.dedup import unpersist_candidates

        unpersist_candidates()
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.name not in baseline_tables and t.tableType == "TEMPORARY":
                spark.catalog.dropTempView(t.name)

    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN REGISTRY")
            continue
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"remeasure:{name}")
        fn(spark, sf_dir).count()  # warm-up (codegen JIT)
        runs = []
        for _ in range(reps):
            release()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        release()
        runs.sort()
        p50 = runs[len(runs) // 2]
        print(
            f"{name}: p50={p50:.3f}s min={runs[0]:.3f} max={runs[-1]:.3f} "
            f"reps={[round(r, 3) for r in runs]}"
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
