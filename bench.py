"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the built-in ``noop`` sink — full plan
execution on the executors without py4j row transfer, so timings measure
the engine, not the driver pipe. A warmup query first absorbs JVM/codegen
startup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from terra_bonobo_nodes_spark.plans.registry import all_queries
    from terra_bonobo_nodes_spark.session import get_spark

    spark = get_spark("bench")
    queries = {n: q for n, q in all_queries().items() if q.headline}

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm the JVM, codegen, and parquet footers once.
    first = next(iter(queries.values()))
    run(first.spark_fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        best = float("inf")
        # three executions, report the min: the first pays whole-stage
        # codegen JIT compile, and this host's CPU noise swings single
        # runs 2-3x; the min is the engine's steady-state number a
        # long-running cluster job sees
        for _ in range(3):
            # isolate queries: persisted intermediates (LSH signatures)
            # must not skew later timings or accumulate memory pressure
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run(q.spark_fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
