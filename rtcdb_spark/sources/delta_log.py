"""Delta Lake transaction-log interop (SURVEY §2 C-I interchange).

Implements the PUBLIC Delta Lake protocol (delta-io `PROTOCOL.md`) the way
`sources/rtcdb_native.py` implements the reference's byte format: so a user's
existing tables load in place, and our tables can be handed to the other
ecosystem without an export job.

Read path (`read_delta`): replay the `_delta_log/<version-padded-20>.json`
commit files in order — each is JSON-lines of actions — folding `add`
actions into the live file set and `remove` actions out of it, capturing
`metaData` (schema, partition columns) and checking `protocol`
(minReaderVersion must be 1; deletion vectors / column mapping refuse
loudly rather than decode wrongly). The scan then plans with the EXPLICIT
schema from `metaData.schemaString` (a Spark StructType JSON — zero footer
inference, the same schema-in-the-log property our own `VersionedTable`
records). Partition columns are NOT stored in Delta data files; they are
re-attached per add-action from `partitionValues` (string-serialized per
the protocol's partition-value rules) and cast to the declared type.

Write path (`write_delta` / `append_delta` / `overwrite_delta`): a minimal
VALID Delta table — `protocol(minReaderVersion=1, minWriterVersion=2)`,
`metaData` with the full schemaString, one `add` per parquet file (with
partitionValues parsed back from Hive-style directory names for
partitioned writes) — that any Delta reader opens.

Zero-copy export (`versioned_to_delta`): the protocol allows ABSOLUTE
paths in `add.path`, so a `VersionedTable` snapshot exports as a Delta
table whose log points at the existing parquet files — metadata-only, the
Delta-format twin of `VersionedTable.clone`, instant at any table size
(same caveat: vacuuming the source breaks the export).

Honest gates: parquet CHECKPOINT files are not read (tables whose JSON
history was cleaned past `_last_checkpoint` raise NotImplementedError —
checkpoint replay is the same fold over a parquet file of actions),
and writer features beyond plain appends/overwrites (deletion vectors,
column mapping, generated columns, CDC files) are refused at the
protocol/metaData gate.

Scale: log replay is O(commits + live files) driver-side metadata — the
same shape Delta's own Spark connector uses below checkpoint scale; the
scan itself is an ordinary pruned parquet read. Partitioned reads plan one
scan per live partition-value tuple (fine for the hundreds-of-partitions
case; a million-partition table wants a custom DataSource that pushes
partitionValues into the scan, noted here rather than hidden).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from functools import reduce
from typing import Any
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, SparkSession

_LOG = "_delta_log"


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def _commit_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.json")


def delta_versions(path: str) -> list[int]:
    """Available commit versions, oldest first."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.endswith(".json") and len(f) == 25 and f[:20].isdigit():
            out.append(int(f[:20]))
    return sorted(out)


def _snapshot_state(
    path: str, version: int | None = None
) -> tuple[dict, dict[str, dict]]:
    """Fold the log into (metaData, live add-actions by path)."""
    versions = delta_versions(path)
    if not versions:
        raise ValueError(f"{path} has no _delta_log commits")
    if versions[0] != 0:
        raise NotImplementedError(
            "log history starts past version 0 (cleaned up to a parquet "
            "checkpoint); checkpoint replay is not implemented"
        )
    until = versions[-1] if version is None else version
    if until not in versions:
        raise ValueError(f"no such Delta version: {version} (have {versions})")
    meta: dict | None = None
    adds: dict[str, dict] = {}
    for v in versions:
        if v > until:
            break
        with open(_commit_path(path, v)) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    p = action["protocol"]
                    if p.get("minReaderVersion", 1) > 1:
                        raise NotImplementedError(
                            f"requires Delta reader version "
                            f"{p['minReaderVersion']} (deletion vectors / "
                            "column mapping); only reader version 1 tables "
                            "are supported"
                        )
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    a = action["add"]
                    adds[a["path"]] = a
                elif "remove" in action:
                    adds.pop(action["remove"]["path"], None)
    if meta is None:
        raise ValueError("log has no metaData action")
    if meta.get("format", {}).get("provider", "parquet") != "parquet":
        raise NotImplementedError(
            f"unsupported data format {meta['format']!r}"
        )
    return meta, adds


def _resolve(path: str, add_path: str) -> str:
    """An add action's path: RELATIVE (URL-encoded) within the table dir,
    or an absolute path/URI (the spec allows both — zero-copy exports use
    absolute paths)."""
    p = unquote(add_path)
    if p.startswith("file:"):
        p = p[len("file:"):]
    if os.path.isabs(p):
        return p
    return os.path.join(path, p)


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """The Delta table at ``version`` (default: latest) as a DataFrame."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    meta, adds = _snapshot_state(path, version)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    pcols = meta.get("partitionColumns", []) or []
    data_schema = StructType([f for f in schema.fields if f.name not in pcols])
    if not adds:
        return spark.createDataFrame([], schema)
    if not pcols:
        return spark.read.schema(data_schema).parquet(
            *[_resolve(path, p) for p in adds]
        )
    # Partition columns live only in the log: group live files by their
    # partitionValues tuple, scan each group, re-attach the values as
    # typed literal columns (protocol: values are strings, null = null).
    groups: dict[tuple, list[str]] = {}
    for p, a in adds.items():
        key = tuple(sorted((a.get("partitionValues") or {}).items()))
        groups.setdefault(key, []).append(p)
    by_name = {f.name: f.dataType for f in schema.fields}
    parts = []
    # null partition values sort via a (is-null, value) key
    for key, files in sorted(
        groups.items(),
        key=lambda kv: [(k, v is None, v or "") for k, v in kv[0]],
    ):
        df = spark.read.schema(data_schema).parquet(
            *[_resolve(path, p) for p in files]
        )
        vals = dict(key)
        for col in pcols:
            v = vals.get(col)
            lit = F.lit(None) if v is None else F.lit(v)
            df = df.withColumn(col, lit.cast(by_name[col]))
        parts.append(df.select(*[f.name for f in schema.fields]))
    return reduce(lambda a, b: a.unionByName(b), parts)


def _write_commit(path: str, version: int, actions: list[dict]) -> None:
    os.makedirs(_log_dir(path), exist_ok=True)
    target = _commit_path(path, version)
    if os.path.exists(target):
        raise ValueError(f"Delta version {version} already committed")
    tmp = target + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, target)


def _meta_action(df: DataFrame, pcols: list[str]) -> dict:
    return {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": pcols,
            "configuration": {},
            "createdTime": int(time.time() * 1000),
        }
    }


_PROTOCOL = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _adds_for_dir(path: str, pcols: list[str]) -> list[dict]:
    """One add action per parquet file under ``path``, with
    partitionValues parsed from Hive-style ``col=value`` directory names
    (Spark's partitioned layout; values URL-decoded, the protocol's
    ``__HIVE_DEFAULT_PARTITION__`` sentinel mapped to null)."""
    adds = []
    for root, _dirs, files in os.walk(path):
        if _LOG in root.split(os.sep):
            continue
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            full = os.path.join(root, f)
            rel = os.path.relpath(full, path)
            pvals: dict[str, Any] = {}
            for seg in rel.split(os.sep)[:-1]:
                if "=" in seg:
                    k, v = seg.split("=", 1)
                    if k in pcols:
                        pvals[k] = (
                            None
                            if v == "__HIVE_DEFAULT_PARTITION__"
                            else unquote(v)
                        )
            adds.append(
                {
                    "add": {
                        "path": quote(rel.replace(os.sep, "/"), safe="/="),
                        "partitionValues": pvals,
                        "size": os.path.getsize(full),
                        "modificationTime": int(os.path.getmtime(full) * 1000),
                        "dataChange": True,
                    }
                }
            )
    return adds


def write_delta(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> int:
    """Create a new Delta table at ``path`` from ``df``; returns version 0."""
    if delta_versions(path):
        raise ValueError(f"{path} already is a Delta table")
    pcols = partition_by or []
    writer = df.write.mode("error")
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(path)
    _write_commit(
        path, 0, [_PROTOCOL, _meta_action(df, pcols)] + _adds_for_dir(path, pcols)
    )
    return 0


def _next_version(path: str) -> tuple[int, dict]:
    versions = delta_versions(path)
    if not versions:
        raise ValueError(f"{path} is not a Delta table")
    meta, adds = _snapshot_state(path)
    return versions[-1] + 1, {"meta": meta, "adds": adds}


def append_delta(df: DataFrame, path: str) -> int:
    """Append ``df`` as a new commit; returns the new version."""
    v, state = _next_version(path)
    pcols = state["meta"].get("partitionColumns", []) or []
    before = {
        a["add"]["path"]
        for a in _adds_for_dir(path, pcols)
    }
    writer = df.write.mode("append")
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(path)
    new = [
        a for a in _adds_for_dir(path, pcols) if a["add"]["path"] not in before
    ]
    _write_commit(path, v, new)
    return v


def overwrite_delta(df: DataFrame, path: str) -> int:
    """Replace the table contents: remove every live file, add the new
    ones — prior versions stay time-travelable, exactly Delta's
    ``mode("overwrite")`` semantics."""
    v, state = _next_version(path)
    pcols = state["meta"].get("partitionColumns", []) or []
    removes = [
        {
            "remove": {
                "path": p,
                "deletionTimestamp": int(time.time() * 1000),
                "dataChange": True,
            }
        }
        for p in sorted(state["adds"])
    ]
    before = {a["add"]["path"] for a in _adds_for_dir(path, pcols)}
    writer = df.write.mode("append")  # new files alongside; log decides liveness
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(path)
    new = [
        a for a in _adds_for_dir(path, pcols) if a["add"]["path"] not in before
    ]
    _write_commit(path, v, removes + new)
    return v


def versioned_to_delta(vt, dest: str, version: int | None = None) -> int:
    """Zero-copy export of a ``VersionedTable`` snapshot as a Delta table:
    the log's add actions use ABSOLUTE paths into the source table's data
    dir (allowed by the protocol), so no byte of data moves — the
    Delta-format twin of ``VersionedTable.clone``. Readable while the
    source retains those files (vacuum breaks it, same as clone)."""
    if delta_versions(dest):
        raise ValueError(f"{dest} already is a Delta table")
    v = vt.latest_version() if version is None else version
    if v is None:
        raise ValueError("source table has no commits")
    m = vt._read_manifest(v)
    df = vt.read(v)
    os.makedirs(dest, exist_ok=True)
    adds = []
    for f in m["files"]:
        full = f if os.path.isabs(f) else os.path.join(os.path.abspath(vt.root), f)
        adds.append(
            {
                "add": {
                    "path": quote(full, safe="/="),
                    "partitionValues": {},
                    "size": os.path.getsize(full),
                    "modificationTime": int(os.path.getmtime(full) * 1000),
                    "dataChange": True,
                }
            }
        )
    _write_commit(dest, 0, [_PROTOCOL, _meta_action(df, [])] + adds)
    return 0
