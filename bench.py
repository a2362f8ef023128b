"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (the driver captures a bounded TAIL of stdout and
parses the LAST line as JSON — BENCH_r05 lost its parse because one
giant line with per-pass samples outgrew that window):
- second-to-last stdout line: {"samples": {name: [s1, s2, s3]}} — the
  per-pass timings that make host-load spikes adjudicable;
- LAST stdout line, compact: {"metric": ..., "value": total_sec,
  "unit": "sec", "queries": {name: sec}, "sf": ...}.

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

    def probe() -> float:
        # Fixed, data-independent calibration workload (pure JVM hash
        # aggregation over a generated range — no IO, no Python): its
        # wall time moves with HOST LOAD only, so the artifact carries
        # its own normalization anchor. Round 11's uniform 1.17x "drift"
        # took a round to adjudicate precisely because min-of-3
        # round-robin cannot shed a whole-run-slow host; probe_sec
        # makes that case readable straight off the JSON (queries up
        # AND probe up => host; queries up, probe flat => regression).
        from pyspark.sql import functions as PF

        t0 = time.perf_counter()
        # avg, not sum: summing 50M raw xxhash64 longs overflows under
        # the session's ANSI mode
        spark.range(50_000_000).select(
            PF.avg(PF.xxhash64("id"))
        ).collect()
        return round(time.perf_counter() - t0, 4)

    probe()  # warm the probe's own codegen
    probes = [probe()]  # + one after EVERY pass: start/end-only sampling
    # missed mid-run load on first deployment (probe read clean while
    # the passes ran 1.2x) — the boundary profile is what adjudicates.

    def release_all_state() -> None:
        # clearCache drops cached DataFrames but NOT localCheckpoint
        # RDDs (components/IVF leave those behind); release both so no
        # query's timing inherits another's executor memory pressure.
        spark.catalog.clearCache()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            try:
                jrdd.unpersist(False)
            except Exception:
                pass

    # Three ROUND-ROBIN passes over all queries, report per-query min.
    # Round-robin (vs back-to-back min-of-3) decorrelates timings from
    # multi-second host load spikes: a spike inflates one pass of many
    # queries instead of every sample of one query, so the min still
    # lands on a clean pass. (r02 recorded j5 at 8.73s on unchanged
    # code because all three adjacent samples sat inside one spike;
    # isolated re-runs measured 1.4-2.2s.) The first pass also pays
    # whole-stage-codegen JIT; the min is the steady-state number a
    # long-running cluster job sees.
    # All per-pass samples are kept in the artifact ("samples") so a
    # host-load spike is adjudicable from the JSON alone (min far below
    # the other samples = noisy host, not a regression — the r02-j5 and
    # r04-streams pattern); the headline number stays the per-query min.
    # Each sample is split into plan-CONSTRUCTION time (spark_fn —
    # driver-side Catalyst; iterative rows with per-iteration
    # localCheckpoint pay most of their wall here) and EXECUTION time
    # (the noop write). The headline number stays their SUM (wall, for
    # cross-round continuity); the split rides the per-query artifact
    # line ("c") so a drift adjudication can see WHICH side moved —
    # the round-16 host-quality investigation needed exactly this.
    samples: dict[str, list[float]] = {name: [] for name in queries}
    constructs: dict[str, list[float]] = {name: [] for name in queries}
    ordered = sorted(queries.items())
    for _pass in range(3):
        for name, q in ordered:
            release_all_state()
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            t1 = time.perf_counter()
            run(df)
            constructs[name].append(round(t1 - t0, 4))
            samples[name].append(round(time.perf_counter() - t0, 4))
        probes.append(probe())
    timings = {n: min(s) for n, s in samples.items()}
    for name in dict(ordered):
        print(
            f"# {name}: {timings[name]:.3f}s {samples[name]} "
            f"construct {constructs[name]}",
            file=sys.stderr,
        )

    # Quiet-host floor for the probe. When even the BEST probe sample
    # reads >1.15x this floor the whole run executed on a loaded host
    # and the totals are NOT comparable across rounds — say so in the
    # artifact itself instead of costing the next round a drift
    # adjudication (BENCH_r14 ran during suite-drain at probe 1.23x
    # and its 1.24x "regression" was exactly the probe ratio;
    # VERDICT_r14 item 4).
    #
    # Calibration history (ADVICE_r16: the floor is per-HOST, not a
    # universal constant — a retired host's floor turns host_loaded
    # into permanent noise): 0.178s on the r13/r14-era box; the
    # round-15/16 host reads 0.19s best-case in-bench (the r16 quiet
    # full run's min), 0.23-0.28s typical. Default = the current
    # host's best observed quiet in-bench min, so ratio ~1.0 means
    # genuinely quiet; override per-host via the env var when the
    # machine changes again. probe_ratio_vs_quiet_floor stays the
    # normalizer either way — divide totals by it before any
    # cross-round comparison.
    QUIET_PROBE_FLOOR = float(
        os.environ.get("SPARK_GRAFT_QUIET_PROBE_FLOOR", "0.19")
    )
    probe_ratio = round(min(probes) / QUIET_PROBE_FLOOR, 3)
    host_loaded = probe_ratio > 1.15
    if host_loaded:
        print(
            f"# WARNING: host loaded — probe min {min(probes):.3f}s is "
            f"{probe_ratio}x the quiet floor {QUIET_PROBE_FLOOR}s; "
            "totals are not comparable across rounds (divide by the "
            "probe ratio before reading drift)",
            file=sys.stderr,
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Per-query sample lines, CHEAPEST FIRST, then the compact totals
    # line LAST. The driver keeps a bounded TAIL of stdout and parses
    # the final line — the old one-big-line samples dict was truncated
    # mid-way by BENCH_r08's 2000-byte tail, losing exactly the
    # expensive queries a drift investigation needs (the r08 minhash
    # question was unadjudicable from the artifact). One small line per
    # query, ordered so the most expensive queries sit adjacent to the
    # final line, keeps the hot queries' per-pass spread inside any
    # reasonable tail window; the final line stays small either way.
    for name in sorted(samples, key=lambda n: timings[n]):
        print(json.dumps({"s": {name: samples[name]}, "c": constructs[name]}))
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # host-load anchor: fixed JVM-only workload timed at
                # every pass boundary (min = clean-host cost; the
                # sample spread = the run's load profile). Compare
                # across rounds BEFORE reading query drift.
                "probe_sec": min(probes),
                "probe_samples": probes,
                # loaded-host flag: probe min vs the recorded quiet
                # floor (0.178s). host_loaded=true means this
                # artifact's totals carry host load ~= probe_ratio and
                # must be normalized by it before cross-round reads.
                "probe_ratio_vs_quiet_floor": probe_ratio,
                "host_loaded": host_loaded,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
