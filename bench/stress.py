#!/usr/bin/env python
"""Scale-up stress ladder (SCALE.md §6): replicate the documents corpus N×
and measure wall-clock growth of corpus-bound operators on fixed cores.

Copies are near- but not exact duplicates (per-copy id offset + a per-copy
suffix token), so near-dup candidate generation sees the duplicate density
grow with the factor — the adversarial direction for LSH/SimHash banding.
``--doc-chars`` truncates every doc (in the 1× base too, so ratios stay
apples-to-apples) to keep the 100× rung within a single machine's budget
while preserving per-doc shingle structure.

Usage:
  python bench/stress.py --factors 1,10,100 \
      --queries text_contamination,dedup_simhash_probe,dedup_connected_groups_star \
      --doc-chars 256

Prints one JSON line: {"doc_chars": ..., "rungs": {"1": {...}, "10": {...}}}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def synth(src_dir: str, out_path: str, factor: int, doc_chars: int | None) -> int:
    df = pq.read_table(os.path.join(src_dir, "documents.parquet")).to_pandas()
    if doc_chars:
        df["text"] = df["text"].str.slice(0, doc_chars)
        df["n_chars"] = df["text"].str.len().astype("int64")
    n = int(df["doc_id"].max()) + 1
    parts = []
    for c in range(factor):
        p = df.copy()
        p["doc_id"] = p["doc_id"] + c * n
        if c:
            p["text"] = p["text"] + f" copytok{c}"
        parts.append(p)
    big = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big, preserve_index=False),
        os.path.join(out_path, "documents.parquet"),
    )
    return len(big)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,10,100")
    ap.add_argument(
        "--queries",
        default="text_contamination,dedup_simhash_probe,dedup_connected_groups_star",
    )
    ap.add_argument("--doc-chars", type=int, default=256)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from rtcdb_spark.queries import REGISTRY
    from rtcdb_spark.session import get_spark

    spark = get_spark("rtcdb-spark-stress")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"doc_chars": args.doc_chars, "rungs": {}}
    for factor in [int(f) for f in args.factors.split(",")]:
        with tempfile.TemporaryDirectory() as d:
            n_docs = synth(args.src, d, factor, args.doc_chars)
            rung: dict = {"n_docs": n_docs, "queries": {}}
            for name in args.queries.split(","):
                fn = REGISTRY[name].fn

                def once() -> float:
                    t0 = time.perf_counter()
                    fn(spark, d).write.format("noop").mode("overwrite").save()
                    return time.perf_counter() - t0

                once()  # warm-up
                rung["queries"][name] = round(
                    statistics.median(once() for _ in range(args.reps)), 3
                )
                spark.catalog.clearCache()
            out["rungs"][str(factor)] = rung
            print(f"# factor {factor}: {rung}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
