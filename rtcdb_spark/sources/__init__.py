from rtcdb_spark.sources.layout import compact, write_partitioned
from rtcdb_spark.sources.manifest import build_file_index, pruned_scan
from rtcdb_spark.sources.versioned import VersionedTable
from rtcdb_spark.sources.tables import (
    TABLE_NAMES,
    load_all,
    load_table,
    write_bucketed,
)

__all__ = [
    "VersionedTable",
    "TABLE_NAMES",
    "build_file_index",
    "compact",
    "pruned_scan",
    "load_all",
    "load_table",
    "write_bucketed",
    "write_partitioned",
]
