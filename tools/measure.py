"""Per-query measurement harness for the optimization rounds.

Times named registered queries in isolation with the noop sink (guide
1.4), splitting plan-construction (driver-side Catalyst) from execution,
and optionally dumps .explain("formatted") to a file per query.

Usage:
  python tools/measure.py q1 q2 ...            # time queries, 3 samples each
  python tools/measure.py --plans DIR q1 ...   # also write DIR/<q>.txt plans
  python tools/measure.py --samples 5 q1       # more samples
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 controls the data dir.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--all-headline", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from terra_bonobo_nodes_spark.plans.registry import all_queries
    from terra_bonobo_nodes_spark.session import get_spark

    spark = get_spark("measure")
    qs = all_queries()
    names = list(args.queries)
    if args.all_headline:
        names = [n for n, q in qs.items() if q.headline]
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    def release_all_state() -> None:
        spark.catalog.clearCache()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            try:
                jrdd.unpersist(False)
            except Exception:
                pass

    # warm the JVM once
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if args.plans:
        Path(args.plans).mkdir(parents=True, exist_ok=True)

    for name in names:
        q = qs[name]
        spark.sparkContext.setJobDescription(f"measure:{name}")
        if args.plans:
            release_all_state()
            df = q.spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (Path(args.plans) / f"{name}.txt").write_text(plan)
        cons, execs, walls = [], [], []
        for _ in range(args.samples):
            release_all_state()
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
            walls.append(t2 - t0)
        print(
            f"{name}: wall min {min(walls):.3f}s  samples "
            f"{[round(w, 3) for w in walls]}  construct "
            f"{[round(c, 3) for c in cons]}  exec {[round(e, 3) for e in execs]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
