"""Multimodal query surface (SURVEY §2 C-IX): binary payload columns
processed through Arrow-batched pandas iterators, checked value-exact
against a DuckDB blob-function oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rtcdb_spark.functions.multimodal import (
    attach_payload,
    extract_payload_meta,
    synth_and_decode,
)
from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table


@query(
    "multimodal_payload_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           lower(hex(encode(substring(text, 1, 8)))) AS head_hex,
           CAST(list_sum(list_transform(string_split(text, ''), ch -> ord(ch))) % 65521 AS BIGINT) AS byte_sum
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


@query(
    "multimodal_decode_meta",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS kind,
           CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 13 END AS width,
           CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 7 END AS height,
           CASE WHEN doc_id % 2 = 0 THEN 24 END AS bpp,
           CASE WHEN doc_id % 2 = 1 THEN 1 END AS channels,
           CASE WHEN doc_id % 2 = 1
                THEN CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                     ELSE 44100 END END AS sample_rate,
           CASE WHEN doc_id % 2 = 1 THEN 16 END AS bits,
           CASE WHEN doc_id % 2 = 1 THEN 50 + doc_id % 100 END AS n_samples,
           CASE WHEN doc_id % 2 = 0
                THEN 54 + ((3 * (1 + doc_id % 13) + 3) // 4) * 4 * (1 + doc_id % 7)
                ELSE 44 + 2 * (50 + doc_id % 100) END AS n_bytes
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "decode"),
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode end-to-end: every document gets a valid synthetic
    media file (even ids → 24-bpp BMP, odd → mono PCM-16 WAV, dimensions
    derived from the id), which the pure-Python codecs in
    `functions.multimodal` genuinely parse back (BMP header fields, RIFF
    chunk walk) inside one Arrow-batched `mapInPandas` pass. The oracle
    recomputes the expected metadata analytically from the synthesis
    parameters — a hash match proves the binary round-trip (pack → parse)
    is exact. Swap the synthesizer for parquet-stored blobs and the decode
    path is production-shaped: no driver hops, scales with cores."""
    d = load_table(spark, sf_dir, "documents")
    return synth_and_decode(d).orderBy("doc_id")
