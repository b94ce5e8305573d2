"""Delta-as-a-streaming-source (sources/delta_stream.py): commit-version
offsets, per-file Arrow partitions, exactly-once resume, maintenance
skipping, and the append-shape gates."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rtcdb_spark.sources.delta_log import (
    append_delta,
    delete_delta,
    optimize_delta,
    write_delta,
)
from rtcdb_spark.sources.delta_stream import register_delta_stream


def _mk(spark, a, b):
    return spark.range(a, b).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
        (F.col("id") * 2.0).alias("v"),
    )


def _drain(spark, path, sink, ckpt):
    q = (
        spark.readStream.format("delta_stream")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink)


class TestDeltaStreamSource:
    def test_full_history_with_partition_columns(self, spark, tmp_path):
        register_delta_stream(spark)
        path = str(tmp_path / "t")
        write_delta(_mk(spark, 0, 10), path, partition_by=["p"])
        append_delta(_mk(spark, 10, 20), path)
        got = _drain(
            spark, path, str(tmp_path / "sink"), str(tmp_path / "ckpt")
        )
        assert sorted(r["k"] for r in got.collect()) == list(range(20))
        rows = {r["k"]: (r["p"], r["v"]) for r in got.collect()}
        assert rows[7] == ("1", 14.0)  # partition col attached + typed

    def test_exactly_once_resume(self, spark, tmp_path):
        register_delta_stream(spark)
        path = str(tmp_path / "t")
        sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
        write_delta(_mk(spark, 0, 10), path)
        first = _drain(spark, path, sink, ckpt)
        assert first.count() == 10
        append_delta(_mk(spark, 10, 15), path)
        again = _drain(spark, path, sink, ckpt)
        # only the new commit was delivered: 15 total, zero duplicates
        assert sorted(r["k"] for r in again.collect()) == list(range(15))

    def test_maintenance_commits_skipped(self, spark, tmp_path):
        register_delta_stream(spark)
        path = str(tmp_path / "t")
        write_delta(_mk(spark, 0, 8).repartition(4), path)
        optimize_delta(spark, path)  # dataChange=false remove+add
        got = _drain(
            spark, path, str(tmp_path / "sink"), str(tmp_path / "ckpt")
        )
        assert got.count() == 8  # compaction's rewrite not re-emitted

    def test_delete_commit_fails_the_stream(self, spark, tmp_path):
        register_delta_stream(spark)
        path = str(tmp_path / "t")
        write_delta(_mk(spark, 0, 10), path)
        delete_delta(spark, path, "k < 3")
        with pytest.raises(Exception, match="append|deletion vector"):
            _drain(
                spark, path, str(tmp_path / "sink"), str(tmp_path / "ckpt")
            )

    def test_starting_version_subscribes_late(self, spark, tmp_path):
        register_delta_stream(spark)
        path = str(tmp_path / "t")
        write_delta(_mk(spark, 0, 10), path)
        append_delta(_mk(spark, 10, 20), path)  # version 1
        q = (
            spark.readStream.format("delta_stream")
            .option("path", path)
            .option("startingVersion", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.read.parquet(str(tmp_path / "sink"))
        assert sorted(r["k"] for r in got.collect()) == list(range(10, 20))

    def test_schema_comes_from_the_log(self, spark, tmp_path):
        register_delta_stream(spark)
        path = str(tmp_path / "t")
        write_delta(_mk(spark, 0, 3), path, partition_by=["p"])
        s = spark.readStream.format("delta_stream").option("path", path).load()
        assert dict(s.dtypes) == {"k": "bigint", "p": "string", "v": "double"}
