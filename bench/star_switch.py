#!/usr/bin/env python
"""Measure the connectivity_only star-link switch under extreme duplicate
multiplicity (SCALE.md §14 / VERDICT r4 item 6).

Builds corpora where every base document is replicated EXACTLY m times
(m = the multiplicity rungs) — the regime the r4 100x stress rung
identified as the one superlinear path: clique expansion emits O(m^2)
verified pairs per duplicate cluster, so pair-generation input grows
quadratically in m. The star switch (`lsh_candidate_pairs(...,
connectivity_only=True)`) emits O(m) anchor links instead, preserving the
transitive closure, so star-CC wall growth should track EDGE growth
(~linear in m), not pair growth (~quadratic).

For each rung, times end-to-end grouping (shingle -> minhash -> pairs ->
connected_components_star -> count) in both modes and reports pair counts.

Usage: python bench/star_switch.py --mults 1,10,100 --base-docs 400
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def synth(src_dir: str, out_path: str, mult: int, base_docs: int, doc_chars: int) -> int:
    df = pq.read_table(os.path.join(src_dir, "documents.parquet")).to_pandas()
    df = df.iloc[:base_docs].copy()
    df["text"] = df["text"].str.slice(0, doc_chars)
    df["n_chars"] = df["text"].str.len().astype("int64")
    n = int(df["doc_id"].max()) + 1
    parts = []
    for c in range(mult):
        p = df.copy()
        p["doc_id"] = p["doc_id"] + c * n
        # NO per-copy token: copies are byte-identical -> every base doc
        # becomes one multiplicity-m degenerate bucket in every band.
        parts.append(p)
    big = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big, preserve_index=False),
        os.path.join(out_path, "documents.parquet"),
    )
    return len(big)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,10,100")
    ap.add_argument("--base-docs", type=int, default=400)
    ap.add_argument("--doc-chars", type=int, default=256)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from rtcdb_spark.functions.dedup import (
        connected_components_star,
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from rtcdb_spark.session import get_spark

    spark = get_spark("rtcdb-spark-star-switch")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"base_docs": args.base_docs, "rungs": {}}
    for mult in [int(m) for m in args.mults.split(",")]:
        with tempfile.TemporaryDirectory() as d:
            n_docs = synth(args.src, d, mult, args.base_docs, args.doc_chars)
            docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
            sigs = minhash_signatures(doc_shingles(docs)).localCheckpoint()
            rung: dict = {"n_docs": n_docs}
            for mode, kwargs in (
                ("clique_capped", {"max_clique": 256}),
                ("star", {"connectivity_only": True}),
            ):
                t0 = time.perf_counter()
                pairs = lsh_candidate_pairs(sigs, **kwargs)
                n_pairs = pairs.count()
                n_groups = (
                    connected_components_star(pairs)
                    .agg(F.countDistinct("group_id"))
                    .first()[0]
                )
                rung[mode] = {
                    "pairs": n_pairs,
                    "groups": n_groups,
                    "secs": round(time.perf_counter() - t0, 2),
                }
            assert rung["clique_capped"]["groups"] == rung["star"]["groups"], (
                "star switch changed the grouping"
            )
            out["rungs"][str(mult)] = rung
            print(f"# mult {mult}: {rung}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
