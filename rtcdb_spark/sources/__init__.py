from rtcdb_spark.sources.tables import (
    TABLE_NAMES,
    load_all,
    load_table,
    write_bucketed,
)

__all__ = ["TABLE_NAMES", "load_all", "load_table", "write_bucketed"]
