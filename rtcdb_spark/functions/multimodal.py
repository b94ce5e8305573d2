"""Multimodal column plumbing (SURVEY §2 C-IX): opaque binary payloads with
typed metadata, processed by Arrow-batched pandas iterators.

The engine treats images/audio/video as `binary` columns plus a metadata
struct — exactly how a 100 TB multimodal corpus is stored in parquet. The
Spark-side plumbing (schemas, `mapInPandas` batch iteration, partition
sizing) is real and tested; the actual codec calls are stubbed behind
`NotImplementedError` because no image/audio libraries exist in this
environment — swap `_decode_stub` for PIL/ffmpeg calls on a real cluster
and nothing else changes.

Scale notes: `mapInPandas` streams Arrow batches (no per-row pickling);
decode work is embarrassingly parallel, so throughput scales with cores.
Binary payloads inflate task input size — pair with
`spark.sql.files.maxPartitionBytes` tuning so a task's batch of payloads
fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("head_hex", StringType()),
        StructField("byte_sum", LongType()),
    ]
)


def decode_image(payload: bytes) -> Any:
    """Real image decode — requires an imaging library (not in this env)."""
    raise NotImplementedError("image decode requires PIL/opencv; not available here")


def decode_audio(payload: bytes) -> Any:
    """Real audio decode — requires an audio library (not in this env)."""
    raise NotImplementedError("audio decode requires soundfile/ffmpeg; not available here")


def frame_sample(payload: bytes, every_n: int = 10) -> list[bytes]:
    """Real video frame sampling — requires ffmpeg (not in this env)."""
    raise NotImplementedError("video frame sampling requires ffmpeg; not available here")


def attach_payload(df: DataFrame, text_col: str = "text", out: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (here: the UTF-8 bytes of the text
    column, standing in for image/audio bytes)."""
    return df.withColumn(out, F.encode(F.col(text_col), "UTF-8"))


def extract_payload_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic 'feature extraction' over binary payloads via
    `mapInPandas`: byte length, 8-byte head as hex, adler-ish byte checksum.

    This is the exact batch shape a real decoder uses — replace the body of
    `process` with `decode_image(...)` + feature math and the plumbing
    (Arrow transfer, schema, partition parallelism) is unchanged."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "head_hex": payloads.map(lambda b: bytes(b)[:8].hex()),
                    "byte_sum": payloads.map(lambda b: sum(bytes(b)) % 65521).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(process, META_SCHEMA)
