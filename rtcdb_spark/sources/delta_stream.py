"""Delta tables as a STRUCTURED STREAMING SOURCE (round 8).

Registers a Spark-4 Python streaming data source (`delta_stream`) that
turns a Delta table's commit log into micro-batches, the way
delta-spark's own streaming reads work: offsets are commit VERSIONS,
`latestOffset` follows the log head, and each micro-batch scans exactly
the data files the commits in ``(start, end]`` added with
``dataChange = true``. Exactly-once delivery falls out of Spark's
offset checkpointing — a restarted query resumes from the committed
version, never re-emitting a file.

    spark.readStream.format("delta_stream").option("path", p).load()

Options: ``path`` (required), ``startingVersion`` (default 0 — emit the
full history as the first batch; pass a later version to subscribe from
there).

Semantics mirror `delta_changes` (the batch append-feed): commits that
REMOVE data with ``dataChange = true`` (overwrite, DELETE, DV attach)
are not representable as an append stream and fail the query with the
same message delta-spark gives without ``ignoreChanges``;
maintenance-only commits (OPTIMIZE's dataChange=false rewrites) are
skipped. Column-mapped tables and deletion-vector adds are refused.

Scale: `partitions()` returns ONE InputPartition per added file, so a
micro-batch covering N files fans out across the cluster; each task
reads its file with pyarrow and yields Arrow RecordBatches (the data
source API's vectorized path — no per-row Python). Partition-column
values ride along in the partition descriptor and are attached as
constant Arrow columns, exactly like the batch reader's broadcast join
but with zero shuffle.

Cited parity: the reference has no streams at all (SURVEY §1.3); this
is the Spark-native twin of its "tail the table" use case.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from rtcdb_spark.sources.delta_log import (
    _commit_actions,
    _demap,
    _resolve,
    _snapshot_state,
    delta_versions,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str, pvals: dict, schema_json: str, pcols: list):
        self.path = path
        self.pvals = pvals
        self.schema_json = schema_json
        self.pcols = pcols


def _spark_to_arrow_type(dt):
    import pyarrow as pa

    from pyspark.sql.types import (
        BooleanType,
        DateType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        TimestampType,
    )

    if isinstance(dt, LongType):
        return pa.int64()
    if isinstance(dt, IntegerType):
        return pa.int32()
    if isinstance(dt, DoubleType):
        return pa.float64()
    if isinstance(dt, FloatType):
        return pa.float32()
    if isinstance(dt, StringType):
        return pa.string()
    if isinstance(dt, BooleanType):
        return pa.bool_()
    if isinstance(dt, DateType):
        return pa.date32()
    if isinstance(dt, TimestampType):
        return pa.timestamp("us")
    raise NotImplementedError(
        f"delta_stream: unsupported column type {dt.simpleString()}"
    )


class DeltaStreamReader(DataSourceStreamReader):
    """Commit-version offsets over a Delta log."""

    def __init__(self, schema: StructType, options: dict):
        self.table_path = options.get("path")
        if not self.table_path:
            raise ValueError("delta_stream requires option 'path'")
        self.schema = schema
        # Spark lower-cases data source option keys
        self.starting = int(
            options.get("startingversion", options.get("startingVersion", 0))
        )

    def initialOffset(self) -> dict:
        # "everything strictly before startingVersion is already consumed"
        return {"version": self.starting - 1}

    def latestOffset(self) -> dict:
        versions = delta_versions(self.table_path)
        return {"version": versions[-1] if versions else -1}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        if hi <= lo:
            return []
        versions = delta_versions(self.table_path)
        pcols: list = []
        schema_json = self.schema.json()
        parts: list[_FilePartition] = []
        meta = None
        for v in range(lo + 1, hi + 1):
            for action in _commit_actions(self.table_path, v, versions):
                if action.get("metaData") is not None:
                    meta = action["metaData"]
                    mode = (_demap(meta.get("configuration")) or {}).get(
                        "delta.columnMapping.mode", "none"
                    )
                    if mode not in ("none", ""):
                        raise NotImplementedError(
                            "delta_stream on column-mapped tables"
                        )
                    pcols = meta.get("partitionColumns", []) or []
                elif action.get("remove") is not None:
                    if action["remove"].get("dataChange", True):
                        raise ValueError(
                            f"commit {v} removes data (overwrite/delete); "
                            "a Delta stream requires append-shaped commits"
                        )
                elif action.get("add") is not None:
                    a = action["add"]
                    if not a.get("dataChange", True):
                        continue  # maintenance rewrite: not new rows
                    if a.get("deletionVector"):
                        raise ValueError(
                            f"commit {v} attaches a deletion vector; "
                            "the stream is not an append feed"
                        )
                    parts.append(
                        _FilePartition(
                            os.path.abspath(
                                _resolve(self.table_path, a["path"])
                            ),
                            _demap(a.get("partitionValues")) or {},
                            schema_json,
                            pcols,
                        )
                    )
        if pcols == [] and parts:
            # partition columns may be declared by version-0 metaData only:
            # fall back to the snapshot's metaData for the column list
            meta0, _adds, _state = _snapshot_state(self.table_path, hi)
            pcols = meta0.get("partitionColumns", []) or []
            for p in parts:
                p.pcols = pcols
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = StructType.fromJson(json.loads(partition.schema_json))
        pcols = partition.pcols
        data_fields = [f for f in schema.fields if f.name not in pcols]
        tbl = pq.read_table(
            partition.path, columns=[f.name for f in data_fields]
        )
        n = tbl.num_rows
        cols, names = [], []
        for f in schema.fields:
            at = _spark_to_arrow_type(f.dataType)
            if f.name in pcols:
                raw = partition.pvals.get(f.name)
                # protocol: partition values are strings, null = null
                arr = pa.array([raw] * n, type=pa.string()).cast(at)
            else:
                arr = tbl.column(f.name).combine_chunks().cast(at)
            cols.append(arr)
            names.append(f.name)
        out = pa.table(dict(zip(names, cols)))
        yield from out.to_batches(max_chunksize=1 << 16)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in Spark's checkpoint


class DeltaStreamDataSource(DataSource):
    """`spark.readStream.format("delta_stream")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "delta_stream"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("delta_stream requires option 'path'")
        meta, _adds, _state = _snapshot_state(path)
        return StructType.fromJson(json.loads(meta["schemaString"])).simpleString()

    def streamReader(self, schema: StructType) -> DeltaStreamReader:
        return DeltaStreamReader(schema, dict(self.options))


def register_delta_stream(spark) -> None:
    spark.dataSource.register(DeltaStreamDataSource)
