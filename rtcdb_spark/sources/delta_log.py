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

Checkpoints (round 6, same protocol chapter): `checkpoint_delta` writes
the classic single-file parquet checkpoint — one row per LIVE action
(protocol, metaData, the live adds), `%020d.checkpoint.parquet`, plus the
`_last_checkpoint` pointer — and the reader starts replay FROM the newest
checkpoint at-or-before the requested version instead of version 0, so
JSON commits older than the checkpoint can be vacuumed away (the whole
point of checkpoints: O(live files + commits-since-checkpoint) planning
on a long-lived table, not O(all commits ever)). Time travel BEFORE the
oldest checkpoint still needs the JSON history and raises clearly if it
was cleaned.

Honest gates: writer features beyond plain appends/overwrites (deletion
vectors, column mapping, generated columns, CDC files) are refused at the
protocol/metaData gate; multi-part checkpoints and v2 checkpoints
(sidecars) are not produced or read — the classic single-file form is
what this writer emits and what its reader replays.

Scale: log replay is O(commits-since-checkpoint + live files) driver-side
metadata — the same shape Delta's own Spark connector uses; the scan
itself is an ordinary pruned parquet read. Partitioned reads plan one
scan per live partition-value tuple (fine for the hundreds-of-partitions
case; a million-partition table wants a custom DataSource that pushes
partitionValues into the scan, noted here rather than hidden). The
WRITERS (`append_delta`/`overwrite_delta`) diff the data directory before
and after the Spark write to find the new files — O(table files) per
commit, fine for interchange/export jobs; a production writer would
collect the written paths from the commit protocol instead (our own
`VersionedTable.commit` does exactly that via its private staging dir).
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


def _checkpoint_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.checkpoint.parquet")


def delta_checkpoints(path: str) -> list[int]:
    """Available single-file checkpoint versions, oldest first."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.endswith(".checkpoint.parquet") and f[:20].isdigit():
            out.append(int(f[:20]))
    return sorted(out)


def _check_protocol(p: dict) -> None:
    if p.get("minReaderVersion", 1) > 1:
        raise NotImplementedError(
            f"requires Delta reader version {p['minReaderVersion']} "
            "(deletion vectors / column mapping); only reader version 1 "
            "tables are supported"
        )


def _demap(v):
    """pyarrow renders map<string,string> as a list of (k, v) pairs;
    normalize back to the dicts the JSON-log path produces."""
    if isinstance(v, list) and all(
        isinstance(x, tuple) and len(x) == 2 for x in v
    ):
        return dict(v)
    return v


def _fold_action(action: dict, state: dict) -> None:
    if action.get("protocol") is not None:
        _check_protocol(action["protocol"])
    elif action.get("metaData") is not None:
        m = dict(action["metaData"])
        m["configuration"] = _demap(m.get("configuration"))
        if isinstance(m.get("format"), dict):
            m["format"] = {
                **m["format"], "options": _demap(m["format"].get("options")),
            }
        state["meta"] = m
    elif action.get("add") is not None:
        a = dict(action["add"])
        a["partitionValues"] = _demap(a.get("partitionValues")) or {}
        state["adds"][a["path"]] = a
    elif action.get("remove") is not None:
        state["adds"].pop(action["remove"]["path"], None)


def _snapshot_state(
    path: str, version: int | None = None
) -> tuple[dict, dict[str, dict]]:
    """Fold the log into (metaData, live add-actions by path): start from
    the newest parquet checkpoint at-or-before the target version (if
    any), then replay the JSON commits after it — O(live files +
    commits-since-checkpoint), which is why checkpoints exist."""
    versions = delta_versions(path)
    cps = delta_checkpoints(path)
    if not versions and not cps:
        raise ValueError(f"{path} has no _delta_log commits")
    head = max(versions[-1] if versions else -1, cps[-1] if cps else -1)
    until = head if version is None else version
    if until > head or until < 0:
        raise ValueError(
            f"no such Delta version: {version} "
            f"(commits {versions}, checkpoints {cps})"
        )
    start_cp = max((c for c in cps if c <= until), default=None)
    state: dict = {"meta": None, "adds": {}}
    if start_cp is not None:
        import pyarrow.parquet as pq

        for action in pq.read_table(_checkpoint_path(path, start_cp)).to_pylist():
            _fold_action(action, state)
    replay_from = 0 if start_cp is None else start_cp + 1
    have = set(versions)
    for v in range(replay_from, until + 1):
        if v not in have:
            raise NotImplementedError(
                f"commit {v:020d}.json is missing and no checkpoint covers "
                "it — JSON history cleaned past the newest usable "
                "checkpoint; time travel that far back is gone (the same "
                "contract as Delta's logRetentionDuration)"
            )
        with open(_commit_path(path, v)) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    _fold_action(json.loads(line), state)
    meta, adds = state["meta"], state["adds"]
    if meta is None:
        raise ValueError("log has no metaData action")
    if meta.get("format", {}).get("provider", "parquet") != "parquet":
        raise NotImplementedError(
            f"unsupported data format {meta['format']!r}"
        )
    return meta, adds


def checkpoint_delta(path: str, version: int | None = None) -> int:
    """Write the classic single-file parquet checkpoint for ``version``
    (default: latest) plus the ``_last_checkpoint`` pointer — one row per
    live action (protocol, metaData, every live add), spec field names
    and types (partitionValues as map<string,string>), so JSON commits at
    or before it can be cleaned while the table stays readable. Returns
    the checkpointed version."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    versions = delta_versions(path)
    if not versions and not delta_checkpoints(path):
        raise ValueError(f"{path} is not a Delta table")
    v = (
        version
        if version is not None
        else max(versions[-1] if versions else -1, *(delta_checkpoints(path) or [-1]))
    )
    meta, adds = _snapshot_state(path, v)

    protocol_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct(
                [("provider", pa.string()),
                 ("options", pa.map_(pa.string(), pa.string()))]
            )),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    n = 2 + len(adds)
    proto_col = [{"minReaderVersion": 1, "minWriterVersion": 2}] + [None] * (n - 1)
    meta_row = {
        "id": meta["id"],
        "format": {
            "provider": meta.get("format", {}).get("provider", "parquet"),
            "options": list(
                (meta.get("format", {}).get("options") or {}).items()
            ),
        },
        "schemaString": meta["schemaString"],
        "partitionColumns": meta.get("partitionColumns", []) or [],
        "configuration": list((meta.get("configuration") or {}).items()),
        "createdTime": meta.get("createdTime"),
    }
    meta_col = [None, meta_row] + [None] * (n - 2)
    add_col: list = [None, None]
    for p in sorted(adds):
        a = adds[p]
        add_col.append(
            {
                "path": a["path"],
                "partitionValues": list(
                    (a.get("partitionValues") or {}).items()
                ),
                "size": a.get("size", 0),
                "modificationTime": a.get("modificationTime", 0),
                "dataChange": bool(a.get("dataChange", True)),
            }
        )
    table = pa.table(
        {
            "protocol": pa.array(proto_col, type=protocol_t),
            "metaData": pa.array(meta_col, type=meta_t),
            "add": pa.array(add_col, type=add_t),
        }
    )
    tmp = _checkpoint_path(path, v) + f".tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(table, tmp)
    os.rename(tmp, _checkpoint_path(path, v))
    lc = os.path.join(_log_dir(path), "_last_checkpoint")
    with open(lc + ".tmp", "w") as fh:
        json.dump({"version": v, "size": n}, fh)
    os.rename(lc + ".tmp", lc)
    return v


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
    cps = delta_checkpoints(path)
    if not versions and not cps:
        raise ValueError(f"{path} is not a Delta table")
    head = max(versions[-1] if versions else -1, cps[-1] if cps else -1)
    meta, adds = _snapshot_state(path)
    return head + 1, {"meta": meta, "adds": adds}


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
