"""Delta tables as a STRUCTURED STREAMING SOURCE (round 8; round 9:
column-mapped tables + the ignoreDeletes/ignoreChanges opt-ins).

Registers a Spark-4 Python streaming data source (`delta_stream`) that
turns a Delta table's commit log into micro-batches, the way
delta-spark's own streaming reads work: offsets are commit VERSIONS,
`latestOffset` follows the log head, and each micro-batch scans exactly
the data files the commits in ``(start, end]`` added with
``dataChange = true``. Exactly-once delivery falls out of Spark's
offset checkpointing — a restarted query resumes from the committed
version, never re-emitting a file.

    spark.readStream.format("delta_stream").option("path", p).load()

Options:

- ``path`` (required).
- ``startingVersion`` (default 0 — emit the full history as the first
  batch; pass a later version to subscribe from there).
- ``startingTimestamp`` (epoch millis, exclusive with startingVersion):
  start from the first commit AT or AFTER the timestamp, delta-spark's
  semantics; commit times come from commitInfo (file mtime fallback).
- ``ignoreDeletes`` (default false): skip commits whose data-changing
  actions are REMOVES ONLY (partition-boundary deletes), delta-spark's
  option of the same name.
- ``maxVersionsPerTrigger`` (default unlimited): cap how many commit
  VERSIONS a micro-batch may cover — the version-offset twin of
  delta-spark's maxFilesPerTrigger, so a backfill over a long history
  drains in bounded batches instead of one giant first batch.
- ``ignoreChanges`` (default false, implies ignoreDeletes): never fail
  on non-append commits — removes are skipped, adds that carry a
  deletion vector (a DV DELETE's re-add of the SAME rows) are skipped,
  and rewrite adds (overwrite/update file rewrites) are re-emitted,
  so downstream may see re-delivered rows, exactly delta-spark's
  documented ignoreChanges contract.

Without either option, commits that REMOVE data with
``dataChange = true`` (overwrite, DELETE, DV attach) fail the query
with the same message delta-spark gives; maintenance-only commits
(OPTIMIZE's dataChange=false rewrites) are always skipped.

Column mapping (round 9): 'name' and 'id' mode tables stream too. The
mapping facts come from the SNAPSHOT metaData (not just in-range
metaData actions — a stream started past the mapping commit previously
bypassed the gate and died in the Arrow read; ADVICE r8). Each file
task resolves the logical schema to physical parquet columns — by
physical name in 'name' mode, by `PARQUET:field_id` footer metadata in
'id' mode — and partition values ride along keyed by physical name,
re-attached under logical names. Tables whose NESTED fields are mapped
are refused (the flat resolution cannot rename struct members).

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
    _physical_name,
    _resolve,
    _snapshot_state,
    delta_versions,
)


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        pvals: dict,
        schema_json: str,
        pcols: list,
        mode: str = "none",
        phys_of: dict | None = None,
        fid_of: dict | None = None,
        cdf: bool = False,
        ctype: str | None = None,
        version: int | None = None,
    ):
        self.path = path
        self.pvals = pvals  # keyed by PHYSICAL partition column name
        self.schema_json = schema_json
        self.pcols = pcols  # PHYSICAL partition column names
        self.mode = mode
        self.phys_of = phys_of or {}  # logical -> physical name
        self.fid_of = fid_of or {}  # logical -> parquet field id (id mode)
        self.cdf = cdf          # change-feed mode: emit _change_type/_commit_version
        self.ctype = ctype      # constant change type; None = read from the file
        self.version = version  # commit version (change-feed mode)


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


def _mapping_facts(meta: dict, schema: StructType):
    """(mode, pcols_physical, phys_of, fid_of) from a snapshot metaData;
    refuses nested-mapped tables (flat per-file column resolution)."""
    from pyspark.sql.types import ArrayType, MapType
    from pyspark.sql.types import StructType as _ST

    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode in ("", None):
        mode = "none"
    if mode not in ("none", "name", "id"):
        raise NotImplementedError(
            f"delta_stream: columnMapping.mode={mode!r}"
        )
    pcols = meta.get("partitionColumns", []) or []
    phys_of, fid_of = {}, {}
    if mode != "none":
        for f in schema.fields:
            if isinstance(f.dataType, (_ST, ArrayType, MapType)):
                raise NotImplementedError(
                    "delta_stream on column-mapped tables with NESTED "
                    f"columns ({f.name!r}); read the snapshot with "
                    "read_delta instead"
                )
            phys_of[f.name] = _physical_name(f)
            fid = (f.metadata or {}).get("delta.columnMapping.id")
            if fid is not None:
                fid_of[f.name] = int(fid)
        if mode == "id" and len(fid_of) < len(schema.fields):
            missing = [f.name for f in schema.fields if f.name not in fid_of]
            raise NotImplementedError(
                f"id-mode table with unmapped columns {missing}"
            )
    return mode, pcols, phys_of, fid_of


class DeltaStreamReader(DataSourceStreamReader):
    """Commit-version offsets over a Delta log."""

    def __init__(self, schema: StructType, options: dict):
        self.table_path = options.get("path")
        if not self.table_path:
            raise ValueError("delta_stream requires option 'path'")
        self.schema = schema
        # Spark lower-cases data source option keys
        st = options.get("startingtimestamp")
        if st is not None and "startingversion" in options:
            raise ValueError(
                "startingVersion and startingTimestamp are exclusive"
            )
        if st is not None:
            # delta-spark semantics: start from the FIRST commit at or
            # after the timestamp (an all-older log yields an empty
            # stream that picks up future commits)
            from rtcdb_spark.sources.delta_log import delta_version_at

            ts_ms = int(st)
            try:
                at = delta_version_at(self.table_path, ts_ms)
                vs = delta_versions(self.table_path)
                later = [v for v in vs if v > at]
                # `at` is the last commit <= ts; the first >= ts is the
                # next one unless `at` itself matches exactly
                self.starting = at if self._commit_ts(at) >= ts_ms else (
                    later[0] if later else (vs[-1] + 1)
                )
            except ValueError:
                self.starting = 0  # whole log is at/after the timestamp
        else:
            self.starting = int(
                options.get(
                    "startingversion", options.get("startingVersion", 0)
                )
            )
        truthy = ("true", "1", "yes")
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() in truthy
        )
        self.ignore_deletes = self.ignore_changes or (
            str(options.get("ignoredeletes", "false")).lower() in truthy
        )
        self.cdf = (
            str(options.get("readchangefeed", "false")).lower() in truthy
        )
        mv = options.get("maxversionspertrigger")
        self.max_versions = int(mv) if mv is not None else None
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError("maxVersionsPerTrigger must be >= 1")
        self._last_seen = None  # rate-limit anchor (see latestOffset)
        # mapping facts from the SNAPSHOT metaData, not only in-range
        # metaData actions (ADVICE r8: startingVersion past the mapping
        # commit bypassed the gate and died in the Arrow read). The
        # ``schema`` Spark passes back is reconstructed from
        # `DataSource.schema()`'s simpleString and has NO field metadata
        # — the columnMapping annotations must be re-read from the log's
        # own schemaString.
        meta, _adds, _state = _snapshot_state(self.table_path)
        log_schema = StructType.fromJson(json.loads(meta["schemaString"]))
        self.mode, self.pcols, self.phys_of, self.fid_of = _mapping_facts(
            meta, log_schema
        )

    def _commit_ts(self, v: int) -> int:
        from rtcdb_spark.sources.delta_log import (
            _commit_actions as _ca,
            _commit_path as _cp,
        )

        vs = delta_versions(self.table_path)
        for a in _ca(self.table_path, v, vs):
            if a.get("commitInfo") is not None:
                t = a["commitInfo"].get("timestamp")
                if t is not None:
                    return int(t)
        return int(os.path.getmtime(_cp(self.table_path, v)) * 1000)

    def initialOffset(self) -> dict:
        # "everything strictly before startingVersion is already consumed"
        return {"version": self.starting - 1}

    def latestOffset(self) -> dict:
        versions = delta_versions(self.table_path)
        head = versions[-1] if versions else -1
        if self.max_versions is None:
            return {"version": head}
        # bounded micro-batches (delta-spark's maxFilesPerTrigger made
        # version-granular for version offsets): never advance more than
        # maxVersionsPerTrigger past the last boundary this reader has
        # seen. After a checkpoint restart the anchor re-learns the true
        # start from the first partitions() call, so a stale anchor can
        # only produce an empty batch, never a skipped or re-read one.
        base = self._last_seen if self._last_seen is not None else             self.starting - 1
        end = min(head, base + self.max_versions)
        self._last_seen = max(base, end)
        return {"version": end}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        if self.max_versions is not None:
            self._last_seen = max(self._last_seen or lo, lo, hi)
        if hi <= lo:
            return []
        versions = delta_versions(self.table_path)
        schema_json = self.schema.json()
        parts: list[_FilePartition] = []
        for v in range(lo + 1, hi + 1):
            acts = _commit_actions(self.table_path, v, versions)
            adds = [
                a["add"]
                for a in acts
                if a.get("add") is not None
                and a["add"].get("dataChange", True)
            ]
            removes = [
                a["remove"]
                for a in acts
                if a.get("remove") is not None
                and a["remove"].get("dataChange", True)
            ]
            if self.cdf:
                # CHANGE FEED mode (round 9): a commit with cdc actions
                # is represented by those files ALONE (the protocol's
                # change-data-files rule); a pure append derives as
                # inserts; anything else without CDC files is not
                # derivable as a stream of changes
                cdcs = [
                    a["cdc"] for a in acts if a.get("cdc") is not None
                ]
                if cdcs:
                    for c in cdcs:
                        parts.append(
                            _FilePartition(
                                os.path.abspath(
                                    _resolve(self.table_path, c["path"])
                                ),
                                _demap(c.get("partitionValues")) or {},
                                schema_json,
                                self.pcols,
                                self.mode,
                                self.phys_of,
                                self.fid_of,
                                cdf=True,
                                ctype=None,  # read from the file
                                version=v,
                            )
                        )
                    continue
                if removes or any(a.get("deletionVector") for a in adds):
                    raise ValueError(
                        f"commit {v} changes data without CDC files; its "
                        "changes are not derivable as a stream — set "
                        "delta.enableChangeDataFeed before such commits"
                    )
                for a in adds:
                    parts.append(
                        _FilePartition(
                            os.path.abspath(
                                _resolve(self.table_path, a["path"])
                            ),
                            _demap(a.get("partitionValues")) or {},
                            schema_json,
                            self.pcols,
                            self.mode,
                            self.phys_of,
                            self.fid_of,
                            cdf=True,
                            ctype="insert",
                            version=v,
                        )
                    )
                continue
            if removes and not (
                self.ignore_changes or (self.ignore_deletes and not adds)
            ):
                raise ValueError(
                    f"commit {v} removes data (overwrite/delete); a Delta "
                    "stream requires append-shaped commits — set option "
                    "ignoreDeletes (remove-only commits) or ignoreChanges "
                    "(rewrites; rows may be re-delivered) to proceed"
                )
            for a in adds:
                if a.get("deletionVector"):
                    if self.ignore_changes:
                        # a DV re-add carries NO new rows (the same file,
                        # more rows marked deleted) — skip it rather than
                        # re-deliver the whole file
                        continue
                    raise ValueError(
                        f"commit {v} attaches a deletion vector; the "
                        "stream is not an append feed — set option "
                        "ignoreChanges to skip such commits"
                    )
                parts.append(
                    _FilePartition(
                        os.path.abspath(
                            _resolve(self.table_path, a["path"])
                        ),
                        _demap(a.get("partitionValues")) or {},
                        schema_json,
                        self.pcols,
                        self.mode,
                        self.phys_of,
                        self.fid_of,
                    )
                )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = StructType.fromJson(json.loads(partition.schema_json))
        mode = partition.mode
        phys_of = partition.phys_of
        pcols = set(partition.pcols)

        def _phys(name: str) -> str:
            return phys_of.get(name, name) if mode != "none" else name

        base_fields = [
            f for f in schema.fields
            if f.name not in ("_change_type", "_commit_version")
        ] if partition.cdf else list(schema.fields)
        data_fields = [f for f in base_fields if _phys(f.name) not in pcols]
        pf = pq.ParquetFile(partition.path)
        file_names = pf.schema_arrow.names
        col_of = {}
        if mode == "id":
            by_fid = {}
            for af in pf.schema_arrow:
                fid = (af.metadata or {}).get(b"PARQUET:field_id")
                if fid is not None:
                    by_fid[int(fid)] = af.name
            for f in data_fields:
                want = partition.fid_of[f.name]
                if want not in by_fid:
                    raise ValueError(
                        f"{partition.path}: no parquet column carries "
                        f"field id {want} (logical column {f.name!r})"
                    )
                col_of[f.name] = by_fid[want]
        else:
            for f in data_fields:
                p = _phys(f.name)
                if p not in file_names:
                    raise ValueError(
                        f"{partition.path}: missing column {p!r} "
                        f"(logical {f.name!r})"
                    )
                col_of[f.name] = p
        read_cols = [col_of[f.name] for f in data_fields]
        if partition.cdf and partition.ctype is None:
            # cdc files store _change_type verbatim, no mapping
            read_cols.append("_change_type")
        tbl = pf.read(columns=read_cols)
        n = tbl.num_rows
        cols, names = [], []
        for f in base_fields:
            at = _spark_to_arrow_type(f.dataType)
            if _phys(f.name) in pcols:
                raw = partition.pvals.get(_phys(f.name))
                # protocol: partition values are strings, null = null
                arr = pa.array([raw] * n, type=pa.string()).cast(at)
            else:
                arr = tbl.column(col_of[f.name]).combine_chunks().cast(at)
            cols.append(arr)
            names.append(f.name)
        if partition.cdf:
            if partition.ctype is None:
                ct = tbl.column("_change_type").combine_chunks().cast(
                    pa.string()
                )
            else:
                ct = pa.array([partition.ctype] * n, type=pa.string())
            cols.append(ct)
            names.append("_change_type")
            cols.append(
                pa.array([int(partition.version)] * n, type=pa.int64())
            )
            names.append("_commit_version")
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
        base = StructType.fromJson(json.loads(meta["schemaString"]))
        if str(self.options.get("readchangefeed", "false")).lower() in (
            "true", "1", "yes",
        ):
            from pyspark.sql.types import LongType, StringType, StructField

            base = StructType(
                list(base.fields)
                + [
                    StructField("_change_type", StringType(), True),
                    StructField("_commit_version", LongType(), True),
                ]
            )
        return base.simpleString()

    def streamReader(self, schema: StructType) -> DeltaStreamReader:
        return DeltaStreamReader(schema, dict(self.options))


def register_delta_stream(spark) -> None:
    spark.dataSource.register(DeltaStreamDataSource)
