from rtcdb_spark.sources.tables import TABLE_NAMES, load_all, load_table

__all__ = ["TABLE_NAMES", "load_all", "load_table"]
