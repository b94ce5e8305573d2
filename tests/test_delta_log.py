"""Delta Lake transaction-log interop (sources/delta_log.py): log replay,
partition-value re-attachment, time travel, zero-copy export, and the
protocol gates — all against tables written by our own writer (the public
protocol is symmetric: a reader bug and a writer bug cannot cancel out
because the log JSON is asserted structurally too)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rtcdb_spark.sources.delta_log import (
    append_delta,
    delta_versions,
    overwrite_delta,
    read_delta,
    versioned_to_delta,
    write_delta,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestDeltaRoundtrip:
    def test_write_then_read_back(self, spark, tmp_path):
        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        path = str(tmp_path / "t")
        assert write_delta(df.repartition(3), path) == 0
        back = read_delta(spark, path)
        assert _rows(back) == _rows(df)
        # the log is structurally a valid Delta commit
        with open(os.path.join(path, "_delta_log", f"{0:020d}.json")) as fh:
            actions = [json.loads(line) for line in fh]
        assert actions[0]["protocol"]["minReaderVersion"] == 1
        meta = actions[1]["metaData"]
        assert meta["format"]["provider"] == "parquet"
        assert json.loads(meta["schemaString"])["type"] == "struct"
        assert sum(1 for a in actions if "add" in a) == 3

    def test_read_plans_with_log_schema_no_inference(self, spark, tmp_path):
        df = spark.range(10).select(F.col("id").alias("k"))
        path = str(tmp_path / "t")
        write_delta(df, path)
        assert [f.name for f in read_delta(spark, path).schema.fields] == ["k"]

    def test_append_and_overwrite_with_time_travel(self, spark, tmp_path):
        path = str(tmp_path / "t")
        a = spark.range(0, 5).select(F.col("id").alias("k"))
        b = spark.range(5, 8).select(F.col("id").alias("k"))
        c = spark.range(100, 102).select(F.col("id").alias("k"))
        write_delta(a, path)
        assert append_delta(b, path) == 1
        assert _rows(read_delta(spark, path)) == [(i,) for i in range(8)]
        assert overwrite_delta(c, path) == 2
        # latest = only the overwrite's rows; old versions still readable
        assert _rows(read_delta(spark, path)) == [(100,), (101,)]
        assert _rows(read_delta(spark, path, version=1)) == [
            (i,) for i in range(8)
        ]
        assert _rows(read_delta(spark, path, version=0)) == [
            (i,) for i in range(5)
        ]
        assert delta_versions(path) == [0, 1, 2]

    def test_partitioned_roundtrip_reattaches_typed_columns(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "a"), (3, 30, "b"), (4, 40, None)],
            "k bigint, v bigint, part string",
        )
        path = str(tmp_path / "t")
        write_delta(df, path, partition_by=["part"])
        back = read_delta(spark, path)
        assert dict(back.dtypes)["part"] == "string"
        assert _rows(back.select("k", "v", "part")) == _rows(df)
        # partition column is NOT in the data files, only in the log
        import pyarrow.parquet as pq

        for root, _d, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    cols = pq.read_schema(os.path.join(root, f)).names
                    assert "part" not in cols

    def test_int_partition_values_cast_back(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 7), (2, 7), (3, 9)], "k bigint, bucket int"
        )
        path = str(tmp_path / "t")
        write_delta(df, path, partition_by=["bucket"])
        back = read_delta(spark, path)
        assert dict(back.dtypes)["bucket"] == "int"
        assert _rows(back.select("k", "bucket")) == _rows(df)


class TestDeltaZeroCopyExport:
    def test_versioned_snapshot_exports_metadata_only(self, spark, tmp_path):
        from rtcdb_spark.sources.versioned import VersionedTable

        vt = VersionedTable(spark, str(tmp_path / "vt"))
        d1 = spark.range(0, 50).select(F.col("id").alias("k"))
        d2 = spark.range(50, 80).select(F.col("id").alias("k"))
        vt.commit(d1)
        vt.commit(d2)
        dest = str(tmp_path / "delta")
        versioned_to_delta(vt, dest)
        back = read_delta(spark, dest)
        assert _rows(back) == [(i,) for i in range(80)]
        # zero-copy: no parquet files under the export dir
        data_files = [
            f
            for _r, _d, fs in os.walk(dest)
            for f in fs
            if f.endswith(".parquet")
        ]
        assert data_files == []
        # exporting an OLD version is a time-travel export
        dest0 = str(tmp_path / "delta0")
        versioned_to_delta(vt, dest0, version=0)
        assert read_delta(spark, dest0).count() == 50


class TestDeltaCheckpoints:
    def test_checkpoint_survives_json_history_cleanup(self, spark, tmp_path):
        from rtcdb_spark.sources.delta_log import checkpoint_delta

        path = str(tmp_path / "t")
        write_delta(spark.range(0, 5).select(F.col("id").alias("k")), path)
        append_delta(spark.range(5, 8).select(F.col("id").alias("k")), path)
        assert checkpoint_delta(path) == 1
        assert os.path.exists(
            os.path.join(path, "_delta_log", f"{1:020d}.checkpoint.parquet")
        )
        assert json.load(
            open(os.path.join(path, "_delta_log", "_last_checkpoint"))
        )["version"] == 1
        append_delta(spark.range(100, 102).select(F.col("id").alias("k")), path)
        # clean the pre-checkpoint JSON history
        os.remove(os.path.join(path, "_delta_log", f"{0:020d}.json"))
        os.remove(os.path.join(path, "_delta_log", f"{1:020d}.json"))
        got = _rows(read_delta(spark, path))
        assert got == [(i,) for i in [0, 1, 2, 3, 4, 5, 6, 7, 100, 101]]
        # the checkpointed version itself is still time-travelable
        assert _rows(read_delta(spark, path, version=1)) == [
            (i,) for i in range(8)
        ]
        # ... but history BEFORE it is honestly gone
        with pytest.raises(NotImplementedError, match="checkpoint"):
            read_delta(spark, path, version=0)
        # appends continue past the cleanup with correct numbering
        v = append_delta(spark.range(200, 201).select(F.col("id").alias("k")), path)
        assert v == 3
        assert read_delta(spark, path).count() == 11

    def test_checkpoint_preserves_partition_values_and_removes(self, spark, tmp_path):
        from rtcdb_spark.sources.delta_log import checkpoint_delta

        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None)], "k bigint, part string"
        )
        path = str(tmp_path / "t")
        write_delta(df, path, partition_by=["part"])
        overwrite_delta(
            spark.createDataFrame([(9, "z")], "k bigint, part string"), path
        )
        checkpoint_delta(path)
        os.remove(os.path.join(path, "_delta_log", f"{0:020d}.json"))
        os.remove(os.path.join(path, "_delta_log", f"{1:020d}.json"))
        back = read_delta(spark, path)  # removes folded INTO the checkpoint
        assert _rows(back.select("k", "part")) == [(9, "z")]
        assert dict(back.dtypes)["part"] == "string"


class TestDeltaGates:
    def test_reader_version_gate(self, spark, tmp_path):
        df = spark.range(3).select(F.col("id").alias("k"))
        path = str(tmp_path / "t")
        write_delta(df, path)
        # raise the protocol requirement (e.g. deletion vectors)
        cpath = os.path.join(path, "_delta_log", f"{0:020d}.json")
        lines = open(cpath).read().splitlines()
        actions = [json.loads(x) for x in lines]
        actions[0] = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}
        with open(cpath, "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
        with pytest.raises(NotImplementedError, match="reader version"):
            read_delta(spark, path)

    def test_checkpointed_history_gate(self, spark, tmp_path):
        df = spark.range(3).select(F.col("id").alias("k"))
        path = str(tmp_path / "t")
        write_delta(df, path)
        append_delta(df, path)
        os.remove(os.path.join(path, "_delta_log", f"{0:020d}.json"))
        with pytest.raises(NotImplementedError, match="checkpoint"):
            read_delta(spark, path)

    def test_double_create_and_missing_table_rejected(self, spark, tmp_path):
        df = spark.range(3).select(F.col("id").alias("k"))
        path = str(tmp_path / "t")
        write_delta(df, path)
        with pytest.raises(ValueError, match="already"):
            write_delta(df, path)
        with pytest.raises(ValueError, match="no _delta_log"):
            read_delta(spark, str(tmp_path / "nope"))
