"""Named query registry — the operator surface declared in SURVEY.md §2 Tier C.

Each query is a (spark_fn, oracle_sql) pair registered via ``@query``. The
spark_fn takes ``(spark, sf_dir)`` and returns a DataFrame; the oracle is the
equivalent ANSI SQL DuckDB runs on the same parquet tables. Queries without a
SQL-expressible equivalent register ``oracle=None`` (driver does a weaker
rows-only check).

Importing this package populates the registry.
"""

from rtcdb_spark.queries.base import REGISTRY, Query, query  # noqa: F401

# Import for registration side effects — order mirrors SURVEY.md §2 C-I..C-X.
from rtcdb_spark.queries import relational  # noqa: E402,F401
from rtcdb_spark.queries import aggregates  # noqa: E402,F401
from rtcdb_spark.queries import joins  # noqa: E402,F401
from rtcdb_spark.queries import tpch_more  # noqa: E402,F401
from rtcdb_spark.queries import tpch_complete  # noqa: E402,F401
from rtcdb_spark.queries import sort_set  # noqa: E402,F401
from rtcdb_spark.queries import windows  # noqa: E402,F401
from rtcdb_spark.queries import scalar_fns  # noqa: E402,F401
from rtcdb_spark.queries import events_time  # noqa: E402,F401
from rtcdb_spark.queries import text_pipeline  # noqa: E402,F401
from rtcdb_spark.queries import dedup_queries  # noqa: E402,F401
from rtcdb_spark.queries import similarity_queries  # noqa: E402,F401
from rtcdb_spark.queries import multimodal_queries  # noqa: E402,F401
from rtcdb_spark.queries import streaming_queries  # noqa: E402,F401
from rtcdb_spark.queries import udf_queries  # noqa: E402,F401
from rtcdb_spark.queries import source_queries  # noqa: E402,F401
from rtcdb_spark.queries import analytics_more  # noqa: E402,F401
from rtcdb_spark.queries import reshape  # noqa: E402,F401
from rtcdb_spark.queries import warehouse  # noqa: E402,F401
from rtcdb_spark.queries import sketch_queries  # noqa: E402,F401
from rtcdb_spark.queries import llm_pipeline  # noqa: E402,F401
from rtcdb_spark.queries import analytics_extras  # noqa: E402,F401
from rtcdb_spark.queries import graph_queries  # noqa: E402,F401
from rtcdb_spark.queries import profiling  # noqa: E402,F401
from rtcdb_spark.queries import rerank_analytics  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "query"]
