#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the total wall-clock of the headline suite (median of REPS runs
per query, after one warm-up). Execution uses the `noop` sink so the full
physical plan runs without driver-collect overhead — the same way a cluster
job would be bounded by scan+shuffle+agg, not toPandas.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from rtcdb_spark.session import get_spark

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "scan_filter_project",
    # subquery / multi-join forms
    "q7_volume_shipping",
    "q18_large_volume_orders",
    # windows / event analytics
    "window_session",
    # LLM-pipeline operators
    "dedup_lsh_pairs",
    "dedup_simhash_probe",
    "similarity_cosine_topk",
    "similarity_ann_lsh_topk",
    "text_token_count",
    "text_bm25_search",
    "text_contamination",
    "search_rrf_fusion",
    "curation_pipeline_funnel",
    # streaming machinery, run to completion over the fixture input
    "stream_window_tumbling",
    "stream_running_totals",
    # rollup maintenance + iterative graph
    "rollup_cascade",
    "graph_pagerank",
    # round-3 additions: O(log n) star connected components + IVF ANN path
    "dedup_connected_groups_star",
    "similarity_ivf_topk",
    # round-3 wave 4: bounded-pool MMR re-rank + LPA communities
    "similarity_mmr_rerank",
    "graph_label_propagation",
    # round-3 wave 5: skyline prefix-scan, semantic dedup, DSIR scoring,
    # link prediction, overlapping streaming windows
    "part_pareto_skyline",
    "dedup_semantic_clusters",
    "text_importance_resample",
    "graph_common_neighbors",
    "stream_window_sliding",
    # round-3 wave 8: reference-format interchange (write + pluggable read)
    "source_rtcdb_native_roundtrip",
    # round 4: incremental matview refresh over the versioned commit log;
    # distributed-prefix-scan KS drift test (global ECDF without a
    # single-partition sort)
    "matview_incremental_refresh",
    "orders_ks_drift_test",
    "source_rtcdb_distributed_write",
    # round 4, wave 2: exactly-once/CDC streaming sinks, outer stream join,
    # PNG decode + resize, trained BPE, OPTIMIZE compaction
    "stream_versioned_sink",
    "stream_cdc_upsert",
    "stream_join_left_outer",
    "multimodal_png_decode",
    "multimodal_image_resize",
    "text_bpe_tokenize",
    "versioned_optimize_compact",
    # round 5: baseline JPEG codec end-to-end; manifest-stats data skipping
    # over the (now sharded) versioned commit log; MP4 sample-table frame
    # sampling
    "multimodal_jpeg_decode",
    "versioned_data_skipping",
    "multimodal_mp4_frame_sample",
    # round 5, wave 2: progressive JPEG, full-spec PNG layouts, bigram-LM
    # perplexity gate, full-outer stream-stream join
    "multimodal_jpeg_progressive",
    "multimodal_png_layouts",
    "text_bigram_perplexity",
    "stream_join_full_outer",
    # round 5, wave 3: 4:2:0 + restart-marker JPEG
    "multimodal_jpeg_420_restart",
    # round 5, wave 4: online banded-SimHash near-dup over arbitrary state
    # (+ the shuffle-free rowwise HOF signature it rides on), and the
    # ingest composite it feeds (dedup gate -> exactly-once versioned append)
    "stream_dedup_near_simhash",
    "stream_ingest_dedup_versioned",
    # round 5, wave 5: OPTIMIZE ... ZORDER BY (multi-dimensional clustering
    # feeding manifest-stats data skipping) + per-file Bloom index point
    # lookups
    "versioned_zorder_skipping",
    "versioned_bloom_point_skipping",
    "versioned_incremental_optimize",
    "versioned_predicate_routing",
    # round 5, wave 6: reference-shaped embedded API end-to-end + HTML
    # visible-text extraction (the web-corpus conversion stage)
    "source_db_api_roundtrip",
    "text_html_extract",
    # round 5, wave 8: Hilbert-curve clustering
    "versioned_hilbert_skipping",
    # round 6: progressive + 4:2:0 JPEG (the previously-gated combination),
    # the oracle-gated connectivity-only dedup grouping, and Delta Lake
    # transaction-log interop (partitioned roundtrip + zero-copy export /
    # overwrite time travel)
    "multimodal_jpeg_progressive_420",
    "dedup_star_connectivity_groups",
    "source_delta_partitioned_roundtrip",
    "source_delta_time_travel",
    "stream_dedup_near_simhash_unordered",
    "multimodal_apng_animate",
    "text_winnow_fingerprints",
    "versioned_timestamp_travel",
    # round 7: Delta column-mapping read, deletion-vector read, and the
    # trained PQ/IVF ANN pair (now oracle-gated via pinned sf0.01
    # codebooks/centroids)
    "source_delta_column_mapping",
    "source_delta_deletion_vectors",
    "similarity_pq_topk",
    "similarity_ivf_trained_topk",
    # round 7, wave 2: arithmetic-coded JPEG (SOF9 QM coder, libjpeg-
    # interop-tested) and the exactly-once Delta streaming sink
    "multimodal_jpeg_arithmetic",
    "stream_delta_sink",
    # round 7, wave 3: DV-write DELETE, OPTIMIZE+VACUUM cycle, and
    # incremental change reads over the Delta log
    "source_delta_delete_dv",
    "source_delta_optimize_vacuum",
    "source_delta_changes",
    # round 7, wave 3: lossless (SOF3) JPEG, the DICOM coding
    "multimodal_jpeg_lossless",
    # round 8: Delta Change Data Feed end-to-end (CDC writes + feed read)
    "source_delta_cdf",
    # round 8, wave 2: MERGE INTO with full CDF vocabulary
    "source_delta_merge_cdf",
    # round 8, wave 3: hierarchical (Annex J) JPEG pyramids
    "multimodal_jpeg_hierarchical",
    # round 8, wave 4: Delta as a structured-streaming SOURCE
    "stream_delta_source",
    # round 9: MPEG-1 Layer III bitstream decode (verified-core tables),
    # id-mode CDF, partitioned nested-id-mapped writes
    "multimodal_mp3_bitstream_decode",
    "source_delta_cdf_id_mapped",
    "source_delta_nested_id_partitioned",
    "source_delta_restore",
    "source_delta_zorder_skipping",
    "stream_delta_cdf_source",
    # round 10: file-granular rate-limited backfill of one multi-file
    # commit (compound version+file-index offsets); domain-metadata
    # liquid clustering driving a bare OPTIMIZE
    "stream_delta_backfill_files",
    "source_delta_liquid_clustering",
    # round 10, late waves: in-commit timestamps, ALTER TABLE, row
    # tracking, conjunctive skipping, Matryoshka embedding audit
    "source_delta_ict_travel",
    "source_delta_alter_columns",
    "source_delta_row_tracking",
    "source_delta_multi_skipping",
    "embedding_matryoshka_energy",
    # round 11: row-tracked ID-mapped OPTIMIZE/MERGE materialization
    # (id-mode creation + field-id-less extras), RESTORE with CDF
    # across an additive schema change (back + forward)
    "source_delta_row_tracking_idmap",
    "source_delta_restore_cdf_evolved",
    # round 11, late wave: type widening (narrow + wide physical
    # generations under one widened scan) + column defaults
    "source_delta_type_widening",
    "source_delta_column_defaults",
    # round 12: MERGE with engine-generated identity ids; derived CDF
    # over non-CDF mixed commits (DV delete + stats-disjoint overwrite)
    "source_delta_merge_identity",
    "source_delta_cdf_mixed_derive",
    # round 12, late wave: RESTORE+CDF derived across a type widening
    # (stats-proved narrow feed) and across a foreign REPLACE
    # repartitioning (per-side scan layouts)
    "source_delta_restore_cdf_widened",
    "source_delta_restore_cdf_repartitioned",
    # round 12, late wave: VARIANT data type end-to-end; collated
    # strings (case-insensitive join from the read schema)
    "source_delta_variant_json",
    "source_delta_collated_strings",
]
REPS = int(os.environ.get("BENCH_REPS", "3"))


def run_once(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("rtcdb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from rtcdb_spark.queries import REGISTRY

    names = [n for n in HEADLINE if n in REGISTRY]
    extra = os.environ.get("BENCH_QUERIES")
    if extra:
        names = [n for n in extra.split(",") if n in REGISTRY]

    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        run_once(fn, spark, sf_dir)  # warm-up (JIT, file listing, broadcast)
        timings[name] = round(
            statistics.median(run_once(fn, spark, sf_dir) for _ in range(REPS)), 4
        )
        # Isolate queries from each other: several operators persist()
        # loop-invariant frames (edge lists, centroid assignments) that they
        # cannot unpersist after returning a lazy DataFrame; across a
        # 30+-query suite those accumulate block-manager pressure and
        # late-suite queries pay GC tax for early-suite caches (observed:
        # pagerank 2.5 s solo vs 6.9 s late-suite). Clearing AFTER each
        # query's timed reps never affects the measured query itself.
        spark.catalog.clearCache()

    out = {
        "metric": "headline_suite_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # Attach the recorded baseline for the same query set when available, so
    # the ratio is visible directly in the bench line.
    try:
        with open(os.path.join(os.path.dirname(__file__) or ".", "bench", "baseline.json")) as f:
            base = json.load(f)["spark"]["queries"]
        covered = [n for n in timings if n in base]
        if covered:
            # Numerator and denominator over the SAME covered subset — a
            # headline query without a recorded baseline must not inflate
            # the ratio (it still contributes to `value` above).
            base_total = round(sum(base[n] for n in covered), 4)
            out["baseline_value"] = base_total
            out["baseline_covered"] = len(covered)
            out["ratio_vs_baseline"] = round(
                round(sum(timings[n] for n in covered), 4) / base_total, 4
            )
    except Exception:
        pass
    line = json.dumps(out)
    print(line)
    # Belt and braces (round 13, additions-only): the round-11 driver lost
    # its bench comparison to a stdout capture/parse failure (PERF_r12:
    # prev_bench_ok false, n_common 0) even though the JSON line was
    # printed with rc 0. Persist the same line to a file so one lost
    # stdout line cannot erase a round's comparison again.
    try:
        with open(
            os.path.join(os.path.dirname(__file__) or ".", "bench_last.json"), "w"
        ) as f:
            f.write(line + "\n")
    except Exception:
        pass
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
