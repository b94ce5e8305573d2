"""Delta tables as a STRUCTURED STREAMING SOURCE (round 8; round 9:
column-mapped tables + the ignoreDeletes/ignoreChanges opt-ins; round 10:
file-granular rate limiting + nested column-mapped tables).

Registers a Spark-4 Python streaming data source (`delta_stream`) that
turns a Delta table's commit log into micro-batches, the way
delta-spark's own streaming reads work: offsets are commit VERSIONS with
an optional FILE INDEX into the current commit, `latestOffset` follows
the log head, and each micro-batch scans exactly the data files the
commits in ``(start, end]`` added with ``dataChange = true``.
Exactly-once delivery falls out of Spark's offset checkpointing — a
restarted query resumes from the committed (version, file-index)
boundary, never re-emitting a file.

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
  VERSIONS a micro-batch may cover — the coarse knob, so a backfill
  over a long history drains in bounded batches instead of one giant
  first batch.
- ``maxFilesPerTrigger`` / ``maxBytesPerTrigger`` (round 10, VERDICT r9
  item 4; delta-spark's options of the same names): cap a micro-batch
  at N files / a soft byte budget, SPLITTING WITHIN a commit when one
  commit alone exceeds the cap — the offset then carries a compound
  ``{"version": v, "index": i}`` meaning "the first i files of commit v
  are consumed". An initial 1M-file load drains in 1M/N exactly-once
  batches instead of one. ``maxBytesPerTrigger`` is a soft max
  (admits files until the running total reaches the cap, at least one
  file per batch), exactly delta-spark's documented contract. All
  three rate knobs compose; whichever binds first ends the batch.
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

Column mapping (round 9; NESTED support round 10, VERDICT r9 item 5):
'name' and 'id' mode tables stream, including tables whose nested
struct members are mapped. The mapping facts come from the SNAPSHOT
metaData (not just in-range metaData actions — a stream started past
the mapping commit previously bypassed the gate and died in the Arrow
read; ADVICE r8). Each file task resolves the logical schema to
physical parquet columns — by physical name in 'name' mode, by
`PARQUET:field_id` footer metadata in 'id' mode — RECURSIVELY: struct
members are matched child-by-child (field id first, physical name
fallback, mirroring the batch reader's `_fieldid_field` rule that an
unmapped nested member matches by name) and the Arrow arrays are
rebuilt with logical names, the pyarrow twin of `_ScanPlan`'s
Spark-side restoration. Partition values ride along keyed by physical
name, re-attached under logical names.

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
    _physical_type,
    _resolve,
    _snapshot_state,
    delta_versions,
)

# compound-offset sentinel: "every file of this commit is consumed".
# Serialized as index = -1 (or an absent index key — the round-8/9
# version-only offset format, which old checkpoints still carry).
_FULL = 1 << 60


def _dec_offset(o: dict) -> tuple[int, int]:
    v = int(o["version"])
    i = int(o.get("index", -1))
    return v, (_FULL if i < 0 else i)


def _enc_offset(v: int, i: int) -> dict:
    # version-only form when the boundary is a whole commit: identical
    # to the pre-round-10 format, so old checkpoints resume unchanged
    return {"version": v} if i >= _FULL else {"version": v, "index": i}


def _off_key(vi: tuple[int, int]) -> tuple[int, int]:
    return vi  # (_FULL sorts above any real index)


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
        log_schema_json: str | None = None,
        size: int = 0,
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
        # the LOG schemaString (carries nested columnMapping metadata the
        # Spark-passed schema loses); None on flat tables
        self.log_schema_json = log_schema_json
        self.size = size        # add action's size (maxBytesPerTrigger)


def _spark_to_arrow_type(dt):
    import pyarrow as pa

    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        BooleanType,
        ByteType,
        DateType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        MapType,
        ShortType,
        StringType,
        TimestampType,
    )
    from pyspark.sql.types import StructType as _ST

    if isinstance(dt, LongType):
        return pa.int64()
    if isinstance(dt, IntegerType):
        return pa.int32()
    if isinstance(dt, ShortType):
        return pa.int16()
    if isinstance(dt, ByteType):
        return pa.int8()
    if isinstance(dt, DoubleType):
        return pa.float64()
    if isinstance(dt, FloatType):
        return pa.float32()
    if isinstance(dt, StringType):
        return pa.string()
    if isinstance(dt, BinaryType):
        return pa.binary()
    if isinstance(dt, BooleanType):
        return pa.bool_()
    if isinstance(dt, DateType):
        return pa.date32()
    if isinstance(dt, TimestampType):
        return pa.timestamp("us")
    if isinstance(dt, DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, _ST):
        return pa.struct(
            [
                pa.field(f.name, _spark_to_arrow_type(f.dataType), f.nullable)
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return pa.list_(_spark_to_arrow_type(dt.elementType))
    if isinstance(dt, MapType):
        return pa.map_(
            _spark_to_arrow_type(dt.keyType),
            _spark_to_arrow_type(dt.valueType),
        )
    raise NotImplementedError(
        f"delta_stream: unsupported column type {dt.simpleString()}"
    )


def _contains_struct(dt) -> bool:
    from pyspark.sql.types import ArrayType, MapType
    from pyspark.sql.types import StructType as _ST

    if isinstance(dt, _ST):
        return True
    if isinstance(dt, ArrayType):
        return _contains_struct(dt.elementType)
    if isinstance(dt, MapType):
        return _contains_struct(dt.keyType) or _contains_struct(dt.valueType)
    return False


def _as_array(a):
    import pyarrow as pa

    if isinstance(a, pa.ChunkedArray):
        if a.num_chunks == 1:
            return a.chunk(0)
        if a.num_chunks == 0:
            return pa.array([], type=a.type)
        return pa.concat_arrays(a.chunks)
    return a


def _restore_value(arr, dt, mode):
    """Physical parquet Arrow array -> logical array for one column
    (round 10): struct members are re-matched child-by-child — by
    `PARQUET:field_id` footer metadata in 'id' mode, then by physical
    name — and rebuilt under logical names; lists recurse through
    their values. ``dt`` is the LOG schema's data type, whose nested
    StructFields still carry the columnMapping metadata. Subtrees with
    no struct anywhere need no renaming and are a single cast."""
    import pyarrow as pa

    from pyspark.sql.types import ArrayType, MapType
    from pyspark.sql.types import StructType as _ST

    target = _spark_to_arrow_type(dt)
    arr = _as_array(arr)
    if not _contains_struct(dt):
        return arr.cast(target)
    if isinstance(dt, _ST):
        by_name = {f.name: i for i, f in enumerate(arr.type)}
        by_fid = {}
        for i, f in enumerate(arr.type):
            fid = (f.metadata or {}).get(b"PARQUET:field_id")
            if fid is not None:
                by_fid[int(fid)] = i
        children = []
        for f in dt.fields:
            idx = None
            if mode == "id":
                fid = (f.metadata or {}).get("delta.columnMapping.id")
                if fid is not None:
                    idx = by_fid.get(int(fid))
            if idx is None:
                pn = _physical_name(f) if mode != "none" else f.name
                idx = by_name.get(pn)
            if idx is None:
                raise ValueError(
                    f"struct member {f.name!r}: no parquet child matches "
                    f"its field id or physical name"
                )
            children.append(_restore_value(arr.field(idx), f.dataType, mode))
        mask = arr.is_null() if arr.null_count else None
        return pa.StructArray.from_arrays(
            children, names=[f.name for f in dt.fields], mask=mask
        )
    if isinstance(dt, ArrayType):
        values = _restore_value(arr.values, dt.elementType, mode)
        return pa.ListArray.from_arrays(
            arr.offsets, values,
            mask=arr.is_null() if arr.null_count else None,
        )
    if isinstance(dt, MapType):
        # maps recurse exactly like lists (round 11, VERDICT r10 item
        # 5): keys and items restore independently, offsets carry over.
        # MapArray.from_arrays has no mask parameter — null entries are
        # encoded as NULL OFFSETS instead (pyarrow's documented rule)
        keys = _restore_value(arr.keys, dt.keyType, mode)
        items = _restore_value(arr.items, dt.valueType, mode)
        offsets = arr.offsets
        if arr.null_count:
            import pyarrow.compute as pc

            mask = pa.concat_arrays(
                [arr.is_null(), pa.array([False], pa.bool_())]
            )
            offsets = pc.if_else(
                mask, pa.scalar(None, pa.int32()), offsets
            )
        return pa.MapArray.from_arrays(offsets, keys, items)
    return arr.cast(target)


def _phys_type_map(schema_json: str) -> dict:
    """physical column name -> FULL physical type tree (struct/array/map
    members rendered under their physical names, via `_physical_type`)
    — the invariant a running stream can rely on. Renames under mapping
    keep physical names at every level (so a nested-member RENAME
    compares equal), adds/drops change the key SET (both sound to read
    with the snapshot schema: missing column -> null, dropped column ->
    ignored) — only a TYPE change under the same physical name, at any
    nesting depth, makes old or new files unsound against the reader's
    fixed schema (ADVICE r10: top-level-only comparison let nested
    retypes slip past the fail-fast gate into opaque Arrow errors).
    Round 12: values are DataType trees (not simpleStrings) so the
    guard can recognize protocol-ALLOWED widenings, which the Arrow
    upcast in `_restore_value` reads soundly."""
    st = StructType.fromJson(json.loads(schema_json))
    return {
        _physical_name(f): _physical_type(f.dataType) for f in st.fields
    }


def _widen_compat(frm, to) -> bool:
    """True when reading files written under type tree ``frm`` with the
    snapshot's type tree ``to`` is sound: equal everywhere, or different
    only by the Type Widening chapter's ALLOWED matrix at leaf positions
    (`delta_log._widening_allowed`) — exactly what the per-file Arrow
    upcast (`_restore_value`'s ``arr.cast``) performs. Struct member
    sets may differ (add/drop are sound: missing -> null, extra ->
    ignored); shared members must themselves be widen-compatible."""
    from pyspark.sql.types import ArrayType, MapType
    from pyspark.sql.types import StructType as _St

    from rtcdb_spark.sources.delta_log import _widening_allowed

    if frm == to:
        return True
    if isinstance(frm, _St) and isinstance(to, _St):
        now = {f.name: f.dataType for f in to.fields}
        return all(
            f.name not in now or _widen_compat(f.dataType, now[f.name])
            for f in frm.fields
        )
    if isinstance(frm, ArrayType) and isinstance(to, ArrayType):
        return _widen_compat(frm.elementType, to.elementType)
    if isinstance(frm, MapType) and isinstance(to, MapType):
        return _widen_compat(frm.keyType, to.keyType) and _widen_compat(
            frm.valueType, to.valueType
        )
    return _widening_allowed(frm, to)


def _mapping_facts(meta: dict, schema: StructType):
    """(mode, pcols_physical, phys_of, fid_of) from a snapshot metaData.
    Top-level facts only — nested members resolve per-file inside
    `_restore_value` from the log schema's own metadata."""
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
    """(version, file-index) offsets over a Delta log."""

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
            sv = options.get(
                "startingversion", options.get("startingVersion", 0)
            )
            if str(sv).lower() == "latest":
                # delta-spark's literal: skip the whole existing history,
                # deliver only commits that land after the stream starts
                vs = delta_versions(self.table_path)
                self.starting = (vs[-1] + 1) if vs else 0
            else:
                self.starting = int(sv)
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
        mf = options.get("maxfilespertrigger")
        self.max_files = int(mf) if mf is not None else None
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("maxFilesPerTrigger must be >= 1")
        mb = options.get("maxbytespertrigger")
        self.max_bytes = int(mb) if mb is not None else None
        if self.max_bytes is not None and self.max_bytes < 1:
            raise ValueError("maxBytesPerTrigger must be >= 1")
        self._last_seen = None  # rate-limit anchor (see latestOffset)
        self._files_memo: dict[int, list] = {}  # commit -> descriptor list
        # mapping facts from the SNAPSHOT metaData, not only in-range
        # metaData actions (ADVICE r8: startingVersion past the mapping
        # commit bypassed the gate and died in the Arrow read). The
        # ``schema`` Spark passes back is reconstructed from
        # `DataSource.schema()`'s simpleString and has NO field metadata
        # — the columnMapping annotations must be re-read from the log's
        # own schemaString.
        meta, _adds, _state = _snapshot_state(self.table_path)
        self.log_schema_json = meta["schemaString"]
        log_schema = StructType.fromJson(json.loads(meta["schemaString"]))
        self.mode, self.pcols, self.phys_of, self.fid_of = _mapping_facts(
            meta, log_schema
        )
        self._types_by_phys = _phys_type_map(meta["schemaString"])

    def _commit_ts(self, v: int) -> int:
        from rtcdb_spark.sources.delta_log import (
            _commit_actions as _ca,
            _commit_path as _cp,
        )

        vs = delta_versions(self.table_path)
        for a in _ca(self.table_path, v, vs):
            if a.get("commitInfo") is not None:
                ci = a["commitInfo"]
                t = ci.get("inCommitTimestamp", ci.get("timestamp"))
                if t is not None:
                    return int(t)
        return int(os.path.getmtime(_cp(self.table_path, v)) * 1000)

    def initialOffset(self) -> dict:
        # "everything strictly before startingVersion is already consumed"
        return _enc_offset(self.starting - 1, _FULL)

    def _commit_files(self, v: int, versions: list[int]) -> list:
        """The DETERMINISTIC ordered list of emittable file partitions
        for commit ``v`` (log order) — the unit both the rate limiter
        and `partitions()` slice, so a (version, index) boundary means
        the same files on every replay. Memoized: commits are
        immutable once written."""
        got = self._files_memo.get(v)
        if got is not None:
            return got
        acts = _commit_actions(self.table_path, v, versions)
        for a in acts:
            m = a.get("metaData")
            if m is None:
                continue
            # schema-change guard (round 10): adds/drops/renames are
            # sound against the reader's fixed snapshot schema
            # (missing -> null, extra -> ignored, physical name stable
            # under mapping), but a TYPE change under the same
            # physical name is not — fail like delta-spark and let the
            # restart adopt the new schema. Round 12 (VERDICT r11 item
            # 4): a protocol-ALLOWED WIDENING toward the snapshot type
            # is sound — the restarted stream reads narrow pre-widening
            # files through `_restore_value`'s Arrow upcast — so only
            # genuine retypes (or the snapshot being NARROWER than a
            # commit, i.e. a widening that arrived after reader start)
            # fail the stream
            then = _phys_type_map(m["schemaString"])
            for pn, t in then.items():
                now_t = self._types_by_phys.get(pn)
                if now_t is not None and not _widen_compat(t, now_t):
                    raise ValueError(
                        f"commit {v} changes column type ({pn!r}: "
                        f"{t.simpleString()} -> {now_t.simpleString()} "
                        "at the snapshot); restart the stream to adopt "
                        "the new schema"
                    )
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
        schema_json = self.schema.json()
        parts: list[_FilePartition] = []

        def _mk(desc, cdf=False, ctype=None):
            return _FilePartition(
                os.path.abspath(_resolve(self.table_path, desc["path"])),
                _demap(desc.get("partitionValues")) or {},
                schema_json,
                self.pcols,
                self.mode,
                self.phys_of,
                self.fid_of,
                cdf=cdf,
                ctype=ctype,
                version=v if cdf else None,
                log_schema_json=self.log_schema_json,
                size=int(desc.get("size") or 0),
            )

        if self.cdf:
            # CHANGE FEED mode (round 9): a commit with cdc actions is
            # represented by those files ALONE (the protocol's
            # change-data-files rule); a pure append derives as
            # inserts; anything else without CDC files is not
            # derivable as a stream of changes
            cdcs = [a["cdc"] for a in acts if a.get("cdc") is not None]
            if cdcs:
                parts = [_mk(c, cdf=True, ctype=None) for c in cdcs]
            else:
                if removes or any(a.get("deletionVector") for a in adds):
                    raise ValueError(
                        f"commit {v} changes data without CDC files; its "
                        "changes are not derivable as a stream — set "
                        "delta.enableChangeDataFeed before such commits"
                    )
                parts = [_mk(a, cdf=True, ctype="insert") for a in adds]
            self._files_memo[v] = parts
            return parts
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
            parts.append(_mk(a))
        self._files_memo[v] = parts
        return parts

    def latestOffset(self) -> dict:
        versions = delta_versions(self.table_path)
        head = versions[-1] if versions else -1
        if (
            self.max_versions is None
            and self.max_files is None
            and self.max_bytes is None
        ):
            return _enc_offset(head, _FULL)
        # bounded micro-batches: walk the per-commit file lists forward
        # from the last boundary this reader has seen, admitting files
        # until a rate knob binds; stopping mid-commit yields a compound
        # (version, index) boundary. After a checkpoint restart the
        # anchor re-learns the true start from the first partitions()
        # call, so a stale anchor can only produce an empty batch, never
        # a skipped or re-read one.
        base = (
            self._last_seen
            if self._last_seen is not None
            else (self.starting - 1, _FULL)
        )
        bv, bi = base
        out_v, out_i = bv, bi
        files = taken_bytes = spanned = 0
        resume_mid = bi < _FULL and bv in versions
        seq = ([bv] if resume_mid else []) + [x for x in versions if x > bv]
        capped = False
        for v in seq:
            fresh = not (resume_mid and v == bv)
            if fresh:
                if (
                    self.max_versions is not None
                    and spanned >= self.max_versions
                ):
                    break
                spanned += 1
            lst = self._commit_files(v, versions)
            j = bi if not fresh else 0
            while j < len(lst):
                if files > 0 and (
                    (self.max_files is not None and files >= self.max_files)
                    or (
                        self.max_bytes is not None
                        and taken_bytes >= self.max_bytes
                    )
                ):
                    capped = True
                    break
                taken_bytes += lst[j].size
                files += 1
                j += 1
            if capped and j == (bi if not fresh else 0) and fresh:
                # cap hit before admitting ANY file of a new commit:
                # don't advance into it — the boundary stays at the
                # previous commit's end
                break
            out_v, out_i = v, (j if capped and j < len(lst) else _FULL)
            if capped:
                break
        if _off_key((out_v, out_i)) > _off_key(base):
            self._last_seen = (out_v, out_i)
        return _enc_offset(out_v, out_i)

    def partitions(self, start: dict, end: dict):
        sv, si = _dec_offset(start)
        ev, ei = _dec_offset(end)
        hi_key = max(_off_key((sv, si)), _off_key((ev, ei)))
        if self._last_seen is None or _off_key(self._last_seen) < hi_key:
            self._last_seen = (
                (ev, ei) if _off_key((ev, ei)) == hi_key else (sv, si)
            )
        if _off_key((ev, ei)) <= _off_key((sv, si)):
            return []
        versions = delta_versions(self.table_path)
        parts: list[_FilePartition] = []
        for v in versions:
            if v < sv or v > ev:
                continue
            if v == sv and si >= _FULL:
                continue
            lst = self._commit_files(v, versions)
            lo = si if v == sv else 0
            hi = len(lst) if (v != ev or ei >= _FULL) else min(ei, len(lst))
            parts.extend(lst[lo:hi])
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = StructType.fromJson(json.loads(partition.schema_json))
        log_of = {}
        if partition.log_schema_json:
            log = StructType.fromJson(json.loads(partition.log_schema_json))
            log_of = {f.name: f for f in log.fields}
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
        # a column ABSENT from the file reads as null — files written
        # before an ADD COLUMN lack it, the batch reader's
        # explicit-schema rule (round 10; was a hard error)
        if mode == "id":
            by_fid = {}
            for af in pf.schema_arrow:
                fid = (af.metadata or {}).get(b"PARQUET:field_id")
                if fid is not None:
                    by_fid[int(fid)] = af.name
            for f in data_fields:
                col_of[f.name] = by_fid.get(partition.fid_of[f.name])
        else:
            for f in data_fields:
                p = _phys(f.name)
                col_of[f.name] = p if p in file_names else None
        read_cols = [
            col_of[f.name] for f in data_fields
            if col_of[f.name] is not None
        ]
        if partition.cdf and partition.ctype is None:
            # cdc files store _change_type verbatim, no mapping
            read_cols.append("_change_type")
        tbl = pf.read(columns=read_cols)
        n = tbl.num_rows
        cols, names = [], []
        for f in base_fields:
            lf = log_of.get(f.name, f)  # log field: nested mapping metadata
            at = _spark_to_arrow_type(lf.dataType)
            if _phys(f.name) in pcols:
                raw = partition.pvals.get(_phys(f.name))
                # protocol: partition values are strings, null = null
                arr = pa.array([raw] * n, type=pa.string()).cast(at)
            elif col_of[f.name] is None:
                arr = pa.nulls(n, type=at)  # file predates the column
            else:
                arr = _restore_value(
                    tbl.column(col_of[f.name]), lf.dataType, mode
                )
            cols.append(arr)
            names.append(f.name)
        if partition.cdf:
            if partition.ctype is None:
                ct = _as_array(tbl.column("_change_type")).cast(pa.string())
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
        # offsets are durable in Spark's checkpoint; drop memoized file
        # lists for fully-consumed commits so a long-running stream's
        # driver memory stays O(in-flight commits), not O(history)
        ev, ei = _dec_offset(end)
        done_through = ev if ei >= _FULL else ev - 1
        for v in [k for k in self._files_memo if k <= done_through]:
            del self._files_memo[v]


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
        from rtcdb_spark.sources.delta_log import _schema_has_variant

        if _schema_has_variant(base):
            raise NotImplementedError(
                "delta_stream over a table with VARIANT columns: the "
                "streaming source reads files through pyarrow, which "
                "cannot parse the parquet VARIANT logical type — read "
                "the table in batch (read_delta handles variant)"
            )
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
