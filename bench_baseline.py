#!/usr/bin/env python
"""Record the measured performance baseline (BASELINE.md protocol).

The reference publishes no benchmark numbers (no harness, no criterion dep,
nothing in its README — see BASELINE.md), so the baseline is *measured*:

- `spark`: per-query wall-clock of the headline suite via bench.py's runner
  (median of BENCH_REPS, warm JVM, noop sink) at $SPARK_GRAFT_SF_DIR;
- `duckdb`: the same queries' oracle SQL timed on the same parquet files —
  the external single-node yardstick called for by BASELINE.md.

Writes bench/baseline.json. Re-run deliberately (it overwrites); the driver's
BENCH_r{N}.json totals are compared against the spark numbers recorded here.
"""

from __future__ import annotations

import json
import os
import statistics
import time

import duckdb

from bench import HEADLINE, REPS, run_once
from rtcdb_spark.session import get_spark

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("rtcdb-spark-baseline")
    spark.sparkContext.setLogLevel("ERROR")

    from rtcdb_spark.queries import REGISTRY

    spark_times: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        run_once(fn, spark, sf_dir)  # warm-up
        spark_times[name] = round(
            statistics.median(run_once(fn, spark, sf_dir) for _ in range(REPS)), 4
        )

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    duck_times: dict[str, float] = {}
    for name in HEADLINE:
        sql = REGISTRY[name].oracle
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm-up
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            reps.append(time.perf_counter() - t0)
        duck_times[name] = round(statistics.median(reps), 4)

    out = {
        "protocol": "BASELINE.md: measured baseline (reference publishes no numbers)",
        "sf": sf,
        "reps": REPS,
        "spark": {
            "total_sec": round(sum(spark_times.values()), 4),
            "queries": spark_times,
        },
        "duckdb_yardstick": {
            "total_sec": round(sum(duck_times.values()), 4),
            "queries": duck_times,
            "note": "same SQL, same parquet, single process - the oracle engine "
            "timed as an external single-node comparison point",
        },
    }
    os.makedirs("bench", exist_ok=True)
    with open("bench/baseline.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
