#!/usr/bin/env python
"""Isolated per-query measurement + plan capture for the optimization rounds.

Usage:
    python bench/isolate.py q1_pricing_summary text_winnow_fingerprints ...
    PLANS_DIR=plans/r12 PLAN_SUFFIX=_before python bench/isolate.py --plans q1 ...

Runs each named query in THIS fresh JVM: one warm-up, REPS timed runs with
the noop sink (guide §1.4), prints per-run seconds and the median. With
--plans also writes `.explain("formatted")` to $PLANS_DIR/<name><suffix>.txt.
Per-job floor is probed first (guide §1: know what the box costs before
attributing time to a query).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

from rtcdb_spark.session import get_spark


def floor_probe(spark) -> tuple[float, float]:
    """Median seconds of (trivial 1-task job, 32-task shuffle job)."""
    triv, shuf = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        triv.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        (
            spark.range(0, 1_000_000, 1, 32)
            .selectExpr("id % 97 AS k")
            .groupBy("k")
            .count()
        ).write.format("noop").mode("overwrite").save()
        shuf.append(time.perf_counter() - t0)
    return statistics.median(triv), statistics.median(shuf)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_plans = "--plans" in sys.argv
    plans_dir = os.environ.get("PLANS_DIR", "plans/r12")
    suffix = os.environ.get("PLAN_SUFFIX", "")
    reps = int(os.environ.get("BENCH_REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("rtcdb-spark-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    ft, fs = floor_probe(spark)
    print(f"floor: trivial {ft*1000:.1f} ms, shuffle {fs*1000:.1f} ms", flush=True)

    from rtcdb_spark.queries import REGISTRY

    for name in args:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"isolate:{name}")
        if do_plans:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)
        runs = []
        for i in range(reps + 1):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i:  # first run is warm-up
                runs.append(dt)
            spark.catalog.clearCache()
        med = statistics.median(runs)
        print(
            f"{name}: median {med:.4f}s  runs {[round(r, 4) for r in runs]}",
            flush=True,
        )
    ft, fs = floor_probe(spark)
    print(f"floor after: trivial {ft*1000:.1f} ms, shuffle {fs*1000:.1f} ms")
    spark.stop()


if __name__ == "__main__":
    main()
