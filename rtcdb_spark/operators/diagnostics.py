"""Skew and partition diagnostics — the observability side of the 100 TB
design rules in SCALE.md (salting, AQE skew-join, broadcast thresholds are
*responses*; this module is the measurement that triggers them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Top-N hottest values of `key` with their share of all rows →
    (value, cnt, share). One map-combined aggregate + a top-N merge; the
    deciding number for "salt this join?" / "is AQE's skew split enough?":
    a single key holding >1/n_executors of the table is the red flag."""
    total = df.count()
    return (
        df.groupBy(F.col(key).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.round(F.col("cnt") / F.lit(total), 6))
        .orderBy(F.desc("cnt"), F.asc("value"))
        .limit(top_n)
    )


def partition_histogram(df: DataFrame) -> DataFrame:
    """Rows per physical partition → (partition_id, cnt). Reveals imbalance
    *after* a repartition/shuffle (a perfect key histogram can still yield
    lopsided partitions when keys collide in the hash space)."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("partition_id")
    )


def skew_factor(df: DataFrame) -> float:
    """max/mean rows-per-partition — 1.0 is perfectly balanced; >~4 means
    the stage's wall-clock is dominated by one straggler task."""
    hist = partition_histogram(df).agg(
        F.max("cnt").alias("mx"), F.avg("cnt").alias("mean")
    ).first()
    return float(hist["mx"] / hist["mean"]) if hist["mean"] else 1.0
