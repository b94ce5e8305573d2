"""SparkSession construction and tuning.

Local test mode runs ``local[N]`` in one JVM; the config below is chosen so
the same code scales to a real cluster: AQE handles runtime re-planning and
skew, shuffle partitions are sized to cores locally (and would be sized to
~2-3x total cores / target 128-256MB per task on a cluster), and the session
timezone is pinned to UTC so timestamp semantics are deterministic and match
the DuckDB correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to *any* session (including one handed to us
# by an external driver). Only confs that Spark allows to change at runtime
# belong here.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # pushdown/pruning are on by default; pinned here so a misconfigured
    # parent session can't silently disable the scan-level optimizations.
    "spark.sql.parquet.filterPushdown": "true",
    # Python Data Source filter pushdown (sources.rtcdb_native zone maps)
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI off: reference semantics are permissive (no overflow errors) and
    # the DuckDB oracle comparison uses plain floating/long arithmetic.
    "spark.sql.ansi.enabled": "false",
    # events.parquet stores ts as timestamp[ns], which Spark's reader rejects;
    # read it as a long and convert in sources.tables.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Constraint propagation OFF: this Spark build's Union.rewriteConstraints
    # intermittently throws `NoSuchElementException: key not found: <attr>`
    # when a union child's Project carries alias constraints referencing
    # non-output attributes (ExpressionSet iteration order makes it
    # exprId-dependent, i.e. flaky run-to-run). Observed on the
    # connected-components star rounds (self-union of swapped edge
    # orientations) and on capped LSH pair plans (clique ∪ star-overflow).
    # Cost of disabling: only the *inferred* transitive/isnotnull filters —
    # every explicit filter still pushes down; TPC-H keys are non-null so
    # inferred null-pruning buys nothing here. Determinism of the whole
    # query surface beats an optional optimizer inference.
    "spark.sql.constraintPropagation.enabled": "false",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-provided or ours)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on this build — startup default applies
    return spark


def get_spark(
    app_name: str = "rtcdb-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle partitions
    default to the core count — right for local mode; on a cluster this would
    be set to ~2-3x total executor cores (or left to AQE coalescing from a
    higher initial value).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(4, cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Bucketed tables (write_bucketed) live in the warehouse; keep it out
        # of the repo tree locally. A cluster deployment overrides this.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/rtcdb_spark_warehouse"),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())


from contextlib import contextmanager


@contextmanager
def iter_shuffle_throttle(spark: SparkSession, n_rows: int, rows_per_partition: int = 250_000):
    """Shuffle width for an ITERATIVE kernel's loop, derived from the loop
    relation's size instead of the session default.

    Per-round joins/aggregates over a small contracted relation (CC star
    rounds, rank tables, label tables) pay a fixed per-task scheduling and
    shuffle-bookkeeping cost x shuffle partitions x rounds; at the session
    width (cores, 32 on the bench box) that floor dominates tiny rounds —
    measured same-JVM at sf0.1: pagerank 3.54 s -> 1.76 s, star-CC
    2.85 s -> 2.49 s at width 8. The width is scale-adaptive, never a
    constant: ceil(n_rows / rows_per_partition) clamped to [8, session
    width], so a billion-edge loop keeps the session's full width and the
    local fixture gets the floor. Overridable via
    $RTCDB_ITER_SHUFFLE_PARTITIONS. The conf is restored on exit; the
    caller must materialize the loop INSIDE the `with` (per-round
    signature/convergence actions, or an eager localCheckpoint of the
    result) for the width to apply to the real execution.
    """
    env = os.environ.get("RTCDB_ITER_SHUFFLE_PARTITIONS")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if env:
        parts = max(1, int(env))
    else:
        parts = max(8, min(int(prev), -(-int(n_rows) // rows_per_partition)))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
