"""Multimodal query surface (SURVEY §2 C-IX): binary payload columns
processed through Arrow-batched pandas iterators, checked value-exact
against a DuckDB blob-function oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rtcdb_spark.functions.multimodal import attach_payload, extract_payload_meta
from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table


@query(
    "multimodal_payload_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           lower(hex(encode(substring(text, 1, 8)))) AS head_hex,
           list_sum(list_transform(string_split(text, ''), ch -> ord(ch))) % 65521 AS byte_sum
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal",),
)
def multimodal_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata extraction end-to-end: attach a binary column,
    stream it through `mapInPandas` (Arrow batches), emit typed features.
    The oracle recomputes the same features with DuckDB blob functions
    (byte_sum's ord() twin is exact because the fixture text is ASCII)."""
    d = load_table(spark, sf_dir, "documents")
    return extract_payload_meta(attach_payload(d)).orderBy("doc_id")
