"""Native reader/writer for the reference's on-disk columnar format.

A user of the reference (robbie-c/rtcdb) keeps data in per-column file
pairs — ``<table>.<col>.data`` (LZ4-block-compressed value blocks) and
``<table>.<col>.index`` (40-byte sparse-index entries) — under a root with
``metadata.json`` (reference src/metadata.rs). This module lets Spark read
that data IN PLACE (no export step) and write compatible files, so
switching engines does not orphan existing tables.

Format, from reference src/storage.rs (all integers big-endian):

- blocks of 1024 rows (``ROWS_PER_BLOCK``, storage.rs:17);
- per block and column, the data file holds one LZ4 *block-format*
  compressed buffer (lz4_flex block == pyarrow's ``lz4_raw``);
- values inside a buffer: Uint64 = 8 bytes BE (storage.rs:372); String =
  u32 BE length prefix + UTF-8 bytes (storage.rs:363);
- index entry (storage.rs:72-106): start_position, compressed_size,
  decompressed_size (8 bytes each), then min and max as 8 bytes — the u64
  BE, or the FIRST 8 BYTES of the string (an index-key prefix,
  storage.rs:30-37);
- ``metadata.json``: ``{"tables": [{"name", "columns": [{"name",
  "dtype": "String"|"Uint64"}]}]}`` (metadata.rs).

Reference-bug note (SURVEY §4.3 — do NOT replicate): the reference's
writer emits the whole *preallocated* compression buffer
(``write_all(&compress_output)`` of ``prealloc_size`` bytes,
storage.rs:266-275) while advancing ``position`` by only
``compressed_len`` — so from the second block on, its index offsets do
not match its own file layout (its read path is dead code and never
catches this). This writer emits exactly ``compressed_size`` bytes, which
is what the index format describes. The reader handles BOTH layouts:
spec-layout files follow the index directly, and reference-padded files
are repaired transparently (``resolve_offsets``) — the padding length is
the deterministic lz4 prealloc size, so the true offsets are recoverable
as its prefix sums, detected by total file length.

Scale notes: the index files are metadata (40 B per 1024 rows per column
— 4 GB of index per *trillion* rows/column), so the driver plans from
them directly, applying zone-map pruning before any data I/O; block
decode then fans out across executors (each task seeks to its own block
offsets). The format itself is single-file-per-column, i.e. single-writer
by design — the write path streams through the driver deliberately; the
scale path for writes is the parquet layout modules (sources.layout),
with this writer for reference interchange.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    InputPartition as _IP,  # noqa: F401
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

ROWS_PER_BLOCK = 1024  # reference src/storage.rs:17
_ENTRY = struct.Struct(">QQQ8s8s")  # start, csize, dsize, min8, max8

_codec = pa.Codec("lz4_raw")


def _data_path(root: str, table: str, col: str) -> str:
    return os.path.join(root, f"{table}.{col}.data")  # storage.rs:357


def _index_path(root: str, table: str, col: str) -> str:
    return os.path.join(root, f"{table}.{col}.index")  # storage.rs:353


def load_metadata(root: str) -> dict:
    with open(os.path.join(root, "metadata.json")) as f:
        return json.load(f)


def table_schema(meta: dict, table: str) -> StructType:
    for t in meta["tables"]:
        if t["name"] == table:
            return StructType(
                [
                    StructField(
                        c["name"],
                        LongType() if c["dtype"] == "Uint64" else StringType(),
                    )
                    for c in t["columns"]
                ]
            )
    raise KeyError(f"no table {table!r} in metadata.json")


def _encode_block(values: list, dtype: str) -> tuple[bytes, bytes, bytes]:
    """Returns (raw_bytes, min8, max8) for one column block."""
    if dtype == "Uint64":
        lo, hi = min(values), max(values)
        if lo < 0 or hi >= 1 << 64:
            raise ValueError("Uint64 out of range")
        raw = b"".join(struct.pack(">Q", v) for v in values)
        return raw, struct.pack(">Q", lo), struct.pack(">Q", hi)
    out = bytearray()
    for s in values:
        b = s.encode("utf-8")
        out += struct.pack(">I", len(b)) + b
    lo_s, hi_s = min(values), max(values)
    pad8 = lambda s: (s.encode("utf-8")[:8]).ljust(8, b"\0")  # noqa: E731
    return bytes(out), pad8(lo_s), pad8(hi_s)


def _decode_block(raw: bytes, dtype: str) -> list:
    vals = []
    if dtype == "Uint64":
        for i in range(0, len(raw), 8):
            (v,) = struct.unpack(">Q", raw[i : i + 8])
            if v >= 1 << 63:
                raise ValueError("Uint64 value exceeds Spark LongType range")
            vals.append(v)
        return vals
    i = 0
    while i < len(raw):
        (n,) = struct.unpack(">I", raw[i : i + 4])
        vals.append(raw[i + 4 : i + 4 + n].decode("utf-8"))
        i += 4 + n
    return vals


def write_rtcdb(df: DataFrame, root: str, table: str) -> int:
    """Stream a DataFrame into reference-format files (append). Returns the
    row count. Single-writer by format design — see module docstring."""
    os.makedirs(root, exist_ok=True)
    cols = [
        {
            "name": f.name,
            "dtype": "Uint64" if isinstance(f.dataType, LongType) else "String",
        }
        for f in df.schema.fields
    ]
    meta_path = os.path.join(root, "metadata.json")
    meta = {"tables": []}
    if os.path.exists(meta_path):
        meta = load_metadata(root)
    if not any(t["name"] == table for t in meta["tables"]):
        meta["tables"].append({"name": table, "columns": cols})
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=2)

    data_f = {c["name"]: open(_data_path(root, table, c["name"]), "ab") for c in cols}
    index_f = {c["name"]: open(_index_path(root, table, c["name"]), "ab") for c in cols}
    pos = {c["name"]: data_f[c["name"]].tell() for c in cols}
    n_rows = 0
    try:
        block: list = []
        for row in df.toLocalIterator():
            block.append(row)
            if len(block) == ROWS_PER_BLOCK:
                _flush_block(block, cols, data_f, index_f, pos)
                n_rows += len(block)
                block = []
        if block:
            _flush_block(block, cols, data_f, index_f, pos)
            n_rows += len(block)
    finally:
        for f in list(data_f.values()) + list(index_f.values()):
            f.close()
    return n_rows


def _flush_block(block, cols, data_f, index_f, pos) -> None:
    for c in cols:
        name, dtype = c["name"], c["dtype"]
        raw, lo8, hi8 = _encode_block([r[name] for r in block], dtype)
        comp = bytes(_codec.compress(raw))
        # Exactly compressed_size bytes — NOT the reference's padded
        # prealloc buffer (see module docstring bug note).
        data_f[name].write(comp)
        index_f[name].write(_ENTRY.pack(pos[name], len(comp), len(raw), lo8, hi8))
        pos[name] += len(comp)


def read_index(root: str, table: str, col: str) -> list[tuple[int, int, int, bytes, bytes]]:
    with open(_index_path(root, table, col), "rb") as f:
        buf = f.read()
    return [_ENTRY.unpack_from(buf, off) for off in range(0, len(buf), 40)]


def _lz4_prealloc(dsize: int) -> int:
    """lz4_flex::block::get_maximum_output_size — the preallocated buffer
    length the reference's buggy writer actually emits per block."""
    return 16 + dsize + dsize // 255


def resolve_offsets(root: str, table: str, col: str) -> list[tuple[int, int, int]]:
    """True (offset, csize, dsize) per block, auto-repairing files written
    by the reference's own writer.

    The reference pads each block to the preallocated compression-buffer
    size but advances its index positions by only compressed_size
    (storage.rs:266-293), so its multi-block data files disagree with
    their own index. The padding length is deterministic —
    get_maximum_output_size(dsize) — so the REAL offsets are recoverable
    as prefix sums of the prealloc sizes. Detection is by total file
    length: equal to Σ csize → spec-layout (our writer); equal to
    Σ prealloc(dsize) → reference-padded layout, repaired transparently.
    """
    entries = read_index(root, table, col)
    file_len = os.path.getsize(_data_path(root, table, col))
    sum_c = sum(e[1] for e in entries)
    if file_len == sum_c:
        return [(e[0], e[1], e[2]) for e in entries]
    sum_p = sum(_lz4_prealloc(e[2]) for e in entries)
    if file_len == sum_p:
        out, pos = [], 0
        for _s, csize, dsize, _lo, _hi in entries:
            out.append((pos, csize, dsize))
            pos += _lz4_prealloc(dsize)
        return out
    raise ValueError(
        f"{_data_path(root, table, col)}: length {file_len} matches neither "
        f"the spec layout ({sum_c}) nor the reference's padded layout ({sum_p})"
    )


def plan_blocks(
    root: str,
    table: str,
    meta: dict,
    predicate: tuple[str, object, object] | None = None,
) -> tuple[list[int], int]:
    """Zone-map block planning from the sparse index: returns the surviving
    block ids (and the total) for an optional closed-interval predicate
    ``(col, lo, hi)``. Sound under the format's 8-byte string prefixes:
    a block is skipped only when ``stored_min > hi`` (stored min is a
    prefix, hence <= the true min) or ``stored_max+0xff.. < lo``
    (prefix strictly below lo's own 8-byte prefix)."""
    t = next(t for t in meta["tables"] if t["name"] == table)
    n_blocks = len(read_index(root, table, t["columns"][0]["name"]))
    if predicate is None:
        return list(range(n_blocks)), n_blocks
    col, lo, hi = predicate
    dtype = next(c["dtype"] for c in t["columns"] if c["name"] == col)
    keep = []
    for i, (_s, _cs, _ds, lo8, hi8) in enumerate(read_index(root, table, col)):
        if dtype == "Uint64":
            bmin = struct.unpack(">Q", lo8)[0]
            bmax = struct.unpack(">Q", hi8)[0]
            if (hi is not None and bmin > hi) or (lo is not None and bmax < lo):
                continue
        else:
            lob = None if lo is None else str(lo).encode("utf-8")[:8]
            hib = None if hi is None else str(hi).encode("utf-8")[:8]
            if (hib is not None and lo8.rstrip(b"\0") > hib) or (
                lob is not None and hi8 < lob
            ):
                continue
        keep.append(i)
    return keep, n_blocks


class _BlockPartition(InputPartition):
    def __init__(self, block_ids: list[int]):
        self.block_ids = block_ids


class RtcdbReader(DataSourceReader):
    def __init__(self, root: str, table: str, n_tasks: int = 16):
        self.root, self.table = root, table
        self.meta = load_metadata(root)
        self.tmeta = next(t for t in self.meta["tables"] if t["name"] == table)
        first = self.tmeta["columns"][0]["name"]
        self.n_blocks = len(read_index(root, table, first))
        self.n_tasks = max(1, min(n_tasks, self.n_blocks))
        # per-column (lo, hi) bounds accumulated by pushFilters
        self.bounds: dict[str, list] = {}

    def pushFilters(self, filters: list["Filter"]):
        """Zone-map pushdown (Spark 4.1 Python Data Source filter API): fold
        comparison filters into per-column closed intervals and prune whole
        blocks against the sparse index at planning time — the reference's
        B1/B2 design (sparse min/max + block skipping) on its own format.
        Every filter is RETURNED for Spark to re-evaluate row-level: zone
        maps are block-granular, so the source only skips, never filters."""
        colnames = {c["name"] for c in self.tmeta["columns"]}
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            if col in colnames:
                b = self.bounds.setdefault(col, [None, None])
                v = getattr(f, "value", None)
                if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    b[0] = v if b[0] is None else max(b[0], v)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    b[1] = v if b[1] is None else min(b[1], v)
                elif isinstance(f, EqualTo):
                    b[0] = v if b[0] is None else max(b[0], v)
                    b[1] = v if b[1] is None else min(b[1], v)
            yield f  # Spark still applies every filter exactly

    def _surviving_blocks(self) -> list[int]:
        keep = set(range(self.n_blocks))
        for col, (lo, hi) in self.bounds.items():
            if lo is None and hi is None:
                continue
            k, _ = plan_blocks(self.root, self.table, self.meta, (col, lo, hi))
            keep &= set(k)
        return sorted(keep)

    def partitions(self):
        blocks = self._surviving_blocks()
        if not blocks:
            return [_BlockPartition([])]
        per = -(-len(blocks) // self.n_tasks)
        return [
            _BlockPartition(blocks[i : i + per])
            for i in range(0, len(blocks), per)
        ]

    def read(self, partition: _BlockPartition):
        # Yield Arrow RecordBatches (one per block), not per-row tuples —
        # the Python Data Source API transfers batches zero-copy into the
        # JVM, so decode cost is the only Python-side work per block.
        cols = self.tmeta["columns"]
        offsets = {
            c["name"]: resolve_offsets(self.root, self.table, c["name"])
            for c in cols
        }
        handles = {
            c["name"]: open(_data_path(self.root, self.table, c["name"]), "rb")
            for c in cols
        }
        try:
            for b in partition.block_ids:
                arrays, names = [], []
                for c in cols:
                    start, csize, dsize = offsets[c["name"]][b]
                    f = handles[c["name"]]
                    f.seek(start)
                    raw = bytes(_codec.decompress(f.read(csize), dsize))
                    vals = _decode_block(raw, c["dtype"])
                    arrays.append(
                        pa.array(
                            vals,
                            pa.int64() if c["dtype"] == "Uint64" else pa.string(),
                        )
                    )
                    names.append(c["name"])
                yield pa.RecordBatch.from_arrays(arrays, names=names)
        finally:
            for f in handles.values():
                f.close()


class RtcdbDataSource(DataSource):
    """``spark.read.format("rtcdb").option("table", name).load(root)`` —
    the reference's format as a first-class pluggable Spark source
    (Python Data Source API, Spark 4). Planning reads only the index
    files; each task decodes its own block range."""

    @classmethod
    def name(cls) -> str:
        return "rtcdb"

    def schema(self):
        root = self.options.get("path")
        table = self.options.get("table")
        return table_schema(load_metadata(root), table)

    def reader(self, schema) -> DataSourceReader:
        return RtcdbReader(
            self.options.get("path"),
            self.options.get("table"),
            int(self.options.get("n_tasks", "16")),
        )


def read_rtcdb(spark: SparkSession, root: str, table: str) -> DataFrame:
    """Read a reference-format table through the registered data source."""
    spark.dataSource.register(RtcdbDataSource)
    # zone-map pushdown needs the Python-data-source filter API enabled
    # (runtime-settable; also pinned in session.RUNTIME_CONFS, but the
    # driver may hand us its own session)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark.read.format("rtcdb").option("table", table).load(root)
