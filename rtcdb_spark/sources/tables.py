"""Parquet table loaders for the driver fixture star schema.

Analogue of the reference's scan path (``read_all`` + ``create_readers``,
reference src/storage.rs:189-222, 299-327) — but expressed as a declarative
``spark.read.parquet`` so Catalyst gets predicate pushdown, column pruning
and row-group skipping for free (the reference only *designed* those,
README.md:51-62).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtcdb_spark.session import tune

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables — always broadcast-join candidates. At 100 TB the
# fact tables (lineitem, orders, events) scale with data volume; these stay
# tiny (region=5, nation=25 rows regardless of SF) or sub-GB (supplier, part,
# customer grow slowly), so broadcasting them avoids shuffling the fact side.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Schema comes from the parquet footer.

    ``events.ts`` is stored as parquet timestamp[ns]; Spark reads it as a
    nanosecond long (legacy.parquet.nanosAsLong) and we floor-convert to a
    microsecond TIMESTAMP_NTZ — the same truncation DuckDB applies, keeping
    the type aligned with the other tables' timestamp[ms] → NTZ columns.
    """
    tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"),
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by a join key.

    Bucketing is the co-located-join mechanism: two tables bucketed by the
    same key into the same bucket count join with NO exchange on either side
    (verified in tests/test_bucketing.py) — at 100 TB this removes the
    biggest shuffle in fact-fact joins like lineitem↔orders. This is the
    industrial version of the reference's "rows sorted by column order"
    contract (reference README.md:44): there sorting enables binary search;
    here bucket+sort enables shuffle-free merge joins and bucket pruning."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)
