"""Multimodal query surface (SURVEY §2 C-IX): binary payload columns
processed through Arrow-batched pandas iterators, checked value-exact
against a DuckDB blob-function oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    return synth_and_decode(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_audio_energy",
    """
    WITH wav AS (
        SELECT doc_id, 50 + doc_id % 100 AS n
        FROM documents WHERE doc_id % 2 = 1
    ),
    pcm AS (
        SELECT doc_id, n,
               list_transform(generate_series(0, n - 1),
                              i -> (doc_id * 131 + i * 17) % 65536 - 32768) AS ss
        FROM wav
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(list_max(list_transform(ss, x -> abs(x))) AS BIGINT) AS peak_abs,
           CAST(list_sum(list_transform(generate_series(1, n - 1),
                i -> CASE WHEN (ss[i] >= 0) <> (ss[i+1] >= 0) THEN 1 ELSE 0 END)) AS BIGINT) AS zero_cross,
           CAST(list_sum(list_transform(ss, x -> x * x)) AS BIGINT) AS sum_sq,
           sqrt(CAST(list_sum(list_transform(ss, x -> x * x)) AS BIGINT) / n) AS rms
    FROM pcm
    ORDER BY doc_id
    """,
    tags=("multimodal", "audio", "feature-extract"),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction end-to-end — the multimodal stage AFTER
    metadata decode: every audio row's WAV payload is genuinely parsed
    down to its PCM samples (RIFF walk + 16-bit unpack) inside one
    Arrow-batched `mapInPandas` pass, emitting the classic speech-corpus
    screens: peak amplitude (clipping), zero-crossing count (noisiness),
    and RMS energy (silence). The oracle recomputes the features
    analytically from the synthesis formula, so a hash match proves the
    byte-level pack → sample-decode → feature math is exact. Sample math
    is pure integer (sum-of-squares of int16 ≪ 2^53); RMS is the only
    float op (one division + correctly-rounded sqrt, IEEE-identical)."""
    from rtcdb_spark.functions.multimodal import synth_and_audio_features

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 1)
    return synth_and_audio_features(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_image_stats",
    """
    WITH bmp AS (
        SELECT doc_id,
               1 + doc_id % 13 AS w,
               1 + doc_id % 7 AS h,
               ((3 * (1 + doc_id % 13) + 3) // 4) * 4 AS stride
        FROM documents WHERE doc_id % 2 = 0
    ),
    sums AS (
        SELECT doc_id, w, h,
               CAST(list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
                    list_transform(generate_series(0, w - 1), x ->
                        (doc_id * 31 + (y * stride + 3 * x) * 7) % 256)))) AS BIGINT) AS sb,
               CAST(list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
                    list_transform(generate_series(0, w - 1), x ->
                        (doc_id * 31 + (y * stride + 3 * x + 1) * 7) % 256)))) AS BIGINT) AS sg,
               CAST(list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
                    list_transform(generate_series(0, w - 1), x ->
                        (doc_id * 31 + (y * stride + 3 * x + 2) * 7) % 256)))) AS BIGINT) AS sr
        FROM bmp
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           sb / (w * h) AS mean_b,
           sg / (w * h) AS mean_g,
           sr / (w * h) AS mean_r,
           (sb + sg + sr) / (3 * w * h) AS brightness
    FROM sums
    ORDER BY doc_id
    """,
    tags=("multimodal", "image", "feature-extract"),
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-level image feature extraction — the step past header decode:
    every image row's BMP payload is genuinely decoded scanline-by-scanline
    (4-byte row padding skipped, BGR channel split) and averaged into the
    brightness/color screens an image-corpus pipeline applies before
    model-based scoring. The oracle recomputes the channel sums
    analytically from the pixel synthesis formula over the SAME padded
    layout, so a hash match proves byte-exact pixel addressing. Channel
    sums are exact integers; each mean is one IEEE division."""
    from rtcdb_spark.functions.multimodal import synth_and_image_stats

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    return synth_and_image_stats(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_audio_silence_trim",
    """
    WITH wav AS (
        SELECT doc_id, 50 + doc_id % 100 AS n
        FROM documents WHERE doc_id % 2 = 1
    ),
    pcm AS (
        SELECT doc_id, n,
               list_transform(generate_series(0, n - 1),
                              i -> (doc_id * 131 + i * 17) % 65536 - 32768) AS ss
        FROM wav
    ),
    loud AS (
        SELECT doc_id, n,
               list_transform(generate_series(1, n),
                              i -> CASE WHEN abs(ss[i]) >= 3277 THEN i - 1 END) AS idx
        FROM pcm
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(COALESCE(list_min(idx), -1) AS BIGINT) AS first_loud,
           CAST(COALESCE(list_max(idx), -1) AS BIGINT) AS last_loud,
           CAST(CASE WHEN list_min(idx) IS NULL THEN 0
                     ELSE list_max(idx) - list_min(idx) + 1 END AS BIGINT)
               AS n_trimmed
    FROM loud
    ORDER BY doc_id
    """,
    tags=("multimodal", "audio", "trim"),
)
def multimodal_audio_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading/trailing silence trim bounds — the preprocessing cut every
    speech pipeline applies before feature extraction, computed from
    genuinely decoded PCM samples (RIFF walk + int16 unpack) in one
    Arrow-batched `mapInPandas` pass. The oracle recomputes the bounds
    analytically from the synthesis formula (list_min/max of indices
    clearing the ~10%-full-scale threshold), so a hash match proves the
    byte-exact sample scan. Whole-silent clips yield (-1, -1, 0) on both
    engines. Pure integer logic; embarrassingly parallel."""
    from rtcdb_spark.functions.multimodal import synth_and_silence_bounds

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 1)
    return synth_and_silence_bounds(d).sortWithinPartitions("doc_id")


def _q_lum(off: int) -> str:
    return f"(doc_id * 31 + (y * stride + 3 * x + {off}) * 7) % 256"


_QSUM_EXPRS = ",\n               ".join(
    f"""CAST(list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
                    list_transform(generate_series(0, w - 1), x ->
                        CASE WHEN (CASE WHEN 2 * x < w THEN 0 ELSE 1 END
                                 + CASE WHEN 2 * y < h THEN 0 ELSE 2 END) = {q}
                             THEN {_q_lum(0)} + {_q_lum(1)} + {_q_lum(2)}
                             ELSE 0 END)))) AS BIGINT) AS qs{q}"""
    for q in range(4)
)

_QN_EXPRS = """
               ((w + 1) // 2) * ((h + 1) // 2) AS qn0,
               (w - (w + 1) // 2) * ((h + 1) // 2) AS qn1,
               ((w + 1) // 2) * (h - (h + 1) // 2) AS qn2,
               (w - (w + 1) // 2) * (h - (h + 1) // 2) AS qn3
"""

_SIG_EXPR = " + ".join(
    f"""CASE WHEN qn{q} > 0 AND qs{q} * (w * h) > (qs0 + qs1 + qs2 + qs3) * qn{q}
             THEN {1 << q} ELSE 0 END"""
    for q in range(4)
)


@query(
    "multimodal_image_phash_dedup",
    f"""
    WITH bmp AS (
        SELECT doc_id,
               1 + doc_id % 13 AS w,
               1 + doc_id % 7 AS h,
               ((3 * (1 + doc_id % 13) + 3) // 4) * 4 AS stride
        FROM documents WHERE doc_id % 2 = 0
    ),
    qsums AS (
        SELECT doc_id, w, h,
               {_QSUM_EXPRS},
               {_QN_EXPRS}
        FROM bmp
    ),
    sigs AS (
        SELECT doc_id, CAST({_SIG_EXPR} AS BIGINT) AS sig FROM qsums
    ),
    clusters AS (
        SELECT sig, COUNT(*) AS cluster_size, MIN(doc_id) AS keeper
        FROM sigs GROUP BY sig
    )
    SELECT s.doc_id, s.sig,
           CAST(c.cluster_size AS BIGINT) AS cluster_size,
           (c.cluster_size > 1 AND s.doc_id <> c.keeper) AS is_dup
    FROM sigs s JOIN clusters c ON s.sig = c.sig
    ORDER BY s.doc_id
    """,
    tags=("multimodal", "dedup", "phash", "llm-pipeline"),
)
def multimodal_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup — the multimodal twin of text near-dup:
    every image's REAL decoded pixels (padded-scanline walk, BGR luminance)
    reduce to a quadrant average-hash (aHash at the fixture's image sizes;
    the 8x8 production variant changes only the grid constant), then
    signature equality buckets near-identical images and the min-id member
    survives — identical survivor convention to every text dedup op.

    All arithmetic is integer (luminance sums, cross-multiplied
    brighter-than-mean tests), so the hash has no float drift by
    construction. The oracle recomputes the signatures analytically from
    the pixel-synthesis formula over the same padded layout — a hash match
    proves the decoder's byte addressing, not just its metadata parse.
    Scale shape: decode is an embarrassingly-parallel mapInPandas scan;
    the signature histogram is a 16-bucket aggregate broadcast back — the
    corpus never shuffles."""
    from rtcdb_spark.functions.multimodal import synth_and_quadrant_sig

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    sigs = synth_and_quadrant_sig(d)
    clusters = sigs.groupBy("sig").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.min("doc_id").alias("keeper"),
    )
    return (
        sigs.join(F.broadcast(clusters), "sig")
        .select(
            "doc_id",
            "sig",
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            ((F.col("cluster_size") > 1) & (F.col("doc_id") != F.col("keeper"))).alias(
                "is_dup"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "multimodal_png_decode",
    """
    WITH dims AS (
        SELECT doc_id,
               1 + doc_id % 11 AS w,
               1 + doc_id % 5 AS h,
               CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS ch
        FROM documents
    ),
    px AS (
        SELECT doc_id, w, h, ch,
               list_transform(generate_series(0, w * h * ch - 1),
                              i -> (doc_id * 31 + i * 7) % 256) AS bytes
        FROM dims
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(8 * ch AS BIGINT) AS bpp,
           CAST(list_sum(bytes) AS BIGINT) AS pixel_sum,
           CAST(list_max(bytes) AS BIGINT) AS max_byte
    FROM px
    ORDER BY doc_id
    """,
    tags=("multimodal", "decode", "png", "compressed"),
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode end-to-end (round 4 — closes part of
    the 'compressed media env-blocked' gap with zero new dependencies):
    every document gets a genuine PNG (zlib-deflated scanlines, rotating
    filter types 0-4, valid chunk CRCs; even ids 8-bit RGB, odd RGBA),
    which `functions.multimodal.decode_png` fully decodes — CRC-verified
    chunk walk, inflate, and unfiltering of ALL five PNG filter types —
    inside one Arrow-batched `mapInPandas` pass. The oracle recomputes
    header fields AND the sum/max over every decoded pixel byte
    analytically from the synthesis formula: one wrong unfilter step on
    any row and pixel_sum breaks the hash."""
    from rtcdb_spark.functions.multimodal import synth_and_png_decode

    d = load_table(spark, sf_dir, "documents")
    return synth_and_png_decode(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_jpeg_decode",
    """
    SELECT doc_id,
           CAST(1 + doc_id % 21 AS BIGINT) AS width,
           CAST(1 + doc_id % 13 AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 8 END AS BIGINT) AS bpp,
           TRUE AS max_err_le_4,
           TRUE AS mean_err_le_1p5
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "decode", "jpeg", "compressed"),
)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode end-to-end (round 5 — closes the last
    compressed-image gap with zero new dependencies): every document gets
    a genuine baseline-sequential JFIF (`functions.jpeg.make_jpeg`: level
    shift, forward DCT, Annex-K quant tables with IJG quality scaling,
    DPCM DC + run-length AC Huffman coding, byte stuffing; even ids 4:4:4
    colour, odd grayscale, rotating quality 85/90/95), which
    `functions.jpeg.decode_jpeg` fully decodes — marker walk, canonical
    Huffman reconstruction, entropy decode, dequantize, inverse DCT,
    YCbCr→RGB — inside one Arrow-batched `mapInPandas` pass.

    JPEG is lossy, so the pixel check is a PROVABLE error bound instead of
    an exact hash: the synthetic images are per-8x8-block planes (the
    shape the DCT captures in a handful of coefficients; measured max
    round-trip error 2 across the corpus), and the emitted bound booleans
    (max<=4, mean<=1.5) hold with 2x margin — any Huffman table, zigzag,
    quantizer, or IDCT slip produces errors orders of magnitude past
    them. Header metadata (width/height/bpp) is exact and hash-checked
    against the analytic oracle. Scale shape: map-only, embarrassingly
    parallel per payload, identical plumbing to the PNG op.

    Reference parity: the reference engine has no media handling at all
    (SURVEY §3) — north-star surface for a 100 TB multimodal corpus."""
    from rtcdb_spark.functions.multimodal import synth_and_jpeg_roundtrip

    d = load_table(spark, sf_dir, "documents")
    return synth_and_jpeg_roundtrip(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_jpeg_progressive",
    """
    SELECT doc_id,
           CAST(1 + doc_id % 19 AS BIGINT) AS width,
           CAST(1 + doc_id % 11 AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 8 END AS BIGINT) AS bpp,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 4 END AS BIGINT) AS n_scans,
           TRUE AS prog_equals_baseline
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "decode", "jpeg", "progressive"),
)
def multimodal_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG end-to-end (round 5 — closes the r4 'progressive
    stays env-gated' note): every document is encoded BOTH as baseline
    sequential and as progressive (T.81 Annex G: spectral selection +
    successive approximation — DC first scan, per-component AC first
    scans with EOB coding, raw-bit DC refinement, correction-bit AC
    refinement), both streams are fully decoded, and the query emits
    whether the two decodes are BIT-IDENTICAL — which they must be, since
    both serializations carry the same quantized coefficients. The oracle
    pins dims, scan count (8 colour / 4 grayscale), and the equality flag
    TRUE for all 500+ documents; a single slip anywhere in the
    progressive state machine flips a flag and breaks the hash. Scale
    shape: map-only after the fan-out exchange, embarrassingly
    parallel."""
    from rtcdb_spark.functions.multimodal import synth_and_jpeg_progressive

    d = load_table(spark, sf_dir, "documents")
    return synth_and_jpeg_progressive(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_jpeg_420_restart",
    """
    SELECT doc_id,
           CAST(1 + doc_id % 21 AS BIGINT) AS width,
           CAST(1 + doc_id % 13 AS BIGINT) AS height,
           CAST(((1 + doc_id % 21 + 15) // 16)
                * ((1 + doc_id % 13 + 15) // 16) AS BIGINT) AS n_mcus,
           CAST((((1 + doc_id % 21 + 15) // 16)
                 * ((1 + doc_id % 13 + 15) // 16) - 1)
                // (1 + doc_id % 4) AS BIGINT) AS n_restarts,
           TRUE AS max_err_le_4
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "decode", "jpeg", "subsampling", "restart"),
)
def multimodal_jpeg_420_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4:2:0 chroma subsampling + restart markers end-to-end (round 5 —
    the dominant real-world JPEG layout): every document is encoded with
    2x2-box-subsampled chroma (four luma + two chroma blocks per 16x16
    MCU) and a seed-derived DRI restart interval, then fully decoded —
    interleaved MCU order, RSTm sequence verification with DC-predictor
    reset, chroma box-upsampling. The oracle pins dims, the MCU count,
    the EXACT restart-marker count ((n_mcus-1)//interval — one misplaced
    or missing RSTm breaks the hash), and the provable error bound
    (constant-chroma synthetics make subsampling lossless; measured max 2,
    bound 4 with margin). Restart segments are what make one huge JPEG
    decodable in PARALLEL — each segment is independently decodable, so a
    100 TB video-frame or scanned-document corpus can split single large
    images across tasks. Scale shape: map-only after the fan-out
    exchange."""
    from rtcdb_spark.functions.multimodal import synth_and_jpeg_420_restart

    d = load_table(spark, sf_dir, "documents")
    return synth_and_jpeg_420_restart(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_jpeg_progressive_420",
    """
    SELECT doc_id,
           CAST(1 + doc_id % 37 AS BIGINT) AS width,
           CAST(1 + doc_id % 29 AS BIGINT) AS height,
           CAST(((1 + doc_id % 37 + 15) // 16)
                * ((1 + doc_id % 29 + 15) // 16) AS BIGINT) AS n_mcus,
           CAST(8 AS BIGINT) AS n_scans,
           TRUE AS prog_equals_baseline
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "decode", "jpeg", "progressive", "subsampling"),
)
def multimodal_jpeg_progressive_420(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE + 4:2:0 JPEG end-to-end (round 6 — closes the last
    non-arithmetic JPEG gate): every document is encoded as baseline
    4:2:0 AND progressive 4:2:0 — the combination real photo encoders
    emit by default (e.g. mozjpeg's output) — both streams fully decoded,
    and the query emits whether the decodes are BIT-IDENTICAL. The new
    machinery the combination exercises: interleaved MCU-order DC scans
    (four luma + two chroma data units per 16x16 MCU with per-component
    DPCM), and non-interleaved AC scans that must cover the component's
    TRUE block grid while SKIPPING the MCU-padding blocks the DC scans
    wrote (T.81 A.2.2 vs A.2.3) — dims up to 37x29 force grids where
    padding rows/columns exist. The oracle pins dims, MCU count, the
    8-scan script, and the equality flag TRUE for every document. Scale
    shape: map-only after the fan-out exchange."""
    from rtcdb_spark.functions.multimodal import synth_and_jpeg_progressive_420

    d = load_table(spark, sf_dir, "documents")
    return synth_and_jpeg_progressive_420(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_apng_animate",
    """
    SELECT doc_id,
           CAST(8 + doc_id % 13 AS BIGINT) AS width,
           CAST(6 + doc_id % 9 AS BIGINT) AS height,
           CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
           CAST(1 + doc_id % 3 AS BIGINT) AS n_fdat,
           TRUE AS compose_equals_reference
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "decode", "png", "apng", "animation"),
)
def multimodal_apng_animate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APNG animation end-to-end (round 6 — closes the 'APNG out of
    scope' gate): every document builds a real animated PNG (acTL; frame
    0 full-canvas in IDAT with its fcTL first; seed-derived sub-rectangle
    frames in fdAT chunks; shared sequence numbering; rotating
    NONE/BACKGROUND/PREVIOUS dispose ops and alternating SOURCE/OVER
    blends), decodes it through the chunk parser + zlib + all-five-filter
    unfilter + the spec's composition model, and asserts every composed
    frame BIT-EXACT against an independent straight-line numpy
    composition. The oracle pins canvas dims, the frame count (2 + id%3),
    the exact fdAT chunk count (frames - 1, counted by chunk walk), and
    the equality flag for all 500+ docs. Scale shape: map-only after the
    fan-out exchange, like every codec kernel."""
    from rtcdb_spark.functions.multimodal import synth_and_apng_animate

    d = load_table(spark, sf_dir, "documents")
    return synth_and_apng_animate(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_png_layouts",
    """
    WITH d AS (
        SELECT doc_id, doc_id % 5 AS m,
               1 + doc_id % 13 AS w, 1 + doc_id % 9 AS h
        FROM documents
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(CASE m WHEN 0 THEN 1 WHEN 1 THEN 16 WHEN 2 THEN 32
                       WHEN 3 THEN 16 ELSE 64 END AS BIGINT) AS bpp,
           CAST(CASE m
             WHEN 0 THEN list_sum(list_transform(generate_series(0, w*h-1),
                          i -> (doc_id*31 + i*7) % 2))
             WHEN 1 THEN list_sum(list_transform(generate_series(0, w*h-1),
                          i -> (doc_id*31 + i*7) % 65536))
             WHEN 2 THEN list_sum(list_transform(generate_series(0, w*h-1),
                          i -> (doc_id*17 + ((doc_id*31+i*7)%8)*11) % 256
                             + (doc_id*17 + ((doc_id*31+i*7)%8)*11 + 5) % 256
                             + (doc_id*17 + ((doc_id*31+i*7)%8)*11 + 10) % 256
                             + (doc_id*13 + ((doc_id*31+i*7)%8)*3) % 256))
             WHEN 3 THEN list_sum(list_transform(generate_series(0, w*h*2-1),
                          i -> (doc_id*31 + i*7) % 256))
             ELSE list_sum(list_transform(generate_series(0, w*h*4-1),
                          i -> (doc_id*31 + i*7) % 65536))
           END AS BIGINT) AS pixel_sum
    FROM d
    ORDER BY doc_id
    """,
    tags=("multimodal", "decode", "png", "interlace", "palette", "16bit"),
)
def multimodal_png_layouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-spec-surface PNG decode (round 5 — closes the r4 honest gates
    for interlaced/paletted/16-bit PNG): five exotic layouts rotate across
    documents — 1-bit Adam7-interlaced grayscale, 16-bit grayscale, 4-bit
    paletted with tRNS alpha (expanded to RGBA), 8-bit gray+alpha, and
    16-bit RGBA Adam7 — each synthesized deterministically, encoded, and
    fully decoded in one Arrow-batched `mapInPandas` pass. The oracle
    recomputes width/height/bpp and the SUM OVER EVERY DECODED SAMPLE
    analytically (including the palette lookup arithmetic): any wrong
    bit-unpack order, big-endian 16-bit slip, Adam7 pass offset, or
    palette/tRNS expansion breaks the hash. Scale shape: map-only after an
    8-byte/row fan-out exchange; embarrassingly parallel."""
    from rtcdb_spark.functions.multimodal import synth_and_png_layout_decode

    d = load_table(spark, sf_dir, "documents")
    return synth_and_png_layout_decode(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_mp4_frame_sample",
    """
    WITH f AS (
        SELECT doc_id, CAST(5 + doc_id % 20 AS BIGINT) AS n_frames
        FROM documents
    ),
    s AS (
        SELECT doc_id, n_frames, unnest(range(0, n_frames, 3)) AS k
        FROM f
    ),
    per AS (
        SELECT doc_id, n_frames, k,
               50 + (doc_id * 31 + k * 17) % 100 AS fsize,
               list_sum(list_transform(
                   generate_series(0, 50 + (doc_id * 31 + k * 17) % 100 - 1),
                   j -> (doc_id + k * 7 + j * 3) % 256)) AS bsum
        FROM s
    )
    SELECT doc_id,
           CAST(MAX(n_frames) AS BIGINT) AS n_frames,
           CAST(30 AS BIGINT) AS fps,
           CAST(MAX(n_frames) * 33 AS BIGINT) AS duration_ms,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(fsize) AS BIGINT) AS sampled_bytes,
           CAST(SUM(bsum) AS BIGINT) AS sampled_byte_sum
    FROM per
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("multimodal", "video", "mp4", "frame-sample"),
)
def multimodal_mp4_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling from the MP4 container (round 5 — closes
    the 'frame sampling needs ffmpeg' gap at the container level): every
    document gets a valid minimal ISO BMFF file (`functions.mp4.make_mp4`:
    ftyp, mdat with seed-derived frame payloads, full moov sample tables),
    and the sampling path walks the boxes, resolves stsz/stsc/stco into
    absolute per-frame offsets, and slices every 3rd ENCODED frame out of
    mdat — what a production pipeline ships to a GPU decode stage; codec
    decode of the sliced bytes remains honestly env-gated. The oracle
    recomputes frame count, fps, duration, and the SUM OF EVERY SAMPLED
    BYTE analytically from the synthesis formulas — one off-by-one in the
    chunk-offset arithmetic and the byte sum breaks the hash. Scale shape:
    map-only Arrow-batched `mapInPandas`, embarrassingly parallel; the
    frame-offset PLAN needs only the ~KB moov, so a scheduler can fan
    sampled-frame reads across executors without touching mdat."""
    from rtcdb_spark.functions.multimodal import synth_and_mp4_frame_sample

    d = load_table(spark, sf_dir, "documents")
    return synth_and_mp4_frame_sample(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_image_resize",
    """
    WITH dims AS (
        SELECT doc_id,
               2 * (1 + doc_id % 6) AS w,
               2 * (1 + doc_id % 3) AS h
        FROM documents
    ),
    px AS (
        SELECT doc_id, w, h, w // 2 AS w2, h // 2 AS h2,
               list_sum(list_transform(
                   generate_series(0, (h // 2) * (w // 2) * 3 - 1),
                   o -> (
                     ((doc_id*31 + (((2*(o // ((w//2)*3)) + 0) * w + 2*((o % ((w//2)*3)) // 3) + 0) * 3 + (o % 3)) * 7) % 256)
                   + ((doc_id*31 + (((2*(o // ((w//2)*3)) + 0) * w + 2*((o % ((w//2)*3)) // 3) + 1) * 3 + (o % 3)) * 7) % 256)
                   + ((doc_id*31 + (((2*(o // ((w//2)*3)) + 1) * w + 2*((o % ((w//2)*3)) // 3) + 0) * 3 + (o % 3)) * 7) % 256)
                   + ((doc_id*31 + (((2*(o // ((w//2)*3)) + 1) * w + 2*((o % ((w//2)*3)) // 3) + 1) * 3 + (o % 3)) * 7) % 256)
                   ) // 4
               )) AS psum
        FROM dims
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS in_width,
           CAST(h AS BIGINT) AS in_height,
           CAST(w2 AS BIGINT) AS out_width,
           CAST(h2 AS BIGINT) AS out_height,
           CAST(psum AS BIGINT) AS resized_pixel_sum
    FROM px
    ORDER BY doc_id
    """,
    tags=("multimodal", "image", "resize", "png"),
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize in the multimodal pipeline (the brief's
    decode → feature-extract → RESIZE → frame-sample chain, previously
    missing its resize link): each document's PNG is decoded with the real
    codec, box-downsampled 2× with exact integer floor-means (bit-
    deterministic — no float filter kernels), re-encoded as PNG from the
    resized pixels and re-decoded with an in-batch equality assertion (a
    codec round-trip on non-synthetic content). The oracle recomputes the
    resized pixel sum analytically — every output pixel's four source
    values and the floor division — so one wrong block boundary, channel
    interleave, or rounding mode breaks the hash."""
    from rtcdb_spark.functions.multimodal import synth_resize_roundtrip

    d = load_table(spark, sf_dir, "documents")
    return synth_resize_roundtrip(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_jpeg_arithmetic",
    """
    SELECT doc_id,
           CAST(9 + doc_id % 31 AS BIGINT) AS width,
           CAST(9 + doc_id % 23 AS BIGINT) AS height,
           CAST(((9 + doc_id % 31 + 7) // 8)
                * ((9 + doc_id % 23 + 7) // 8) AS BIGINT) AS n_blocks,
           TRUE AS uses_sof9_dac,
           TRUE AS arith_equals_huffman,
           TRUE AS arith_smaller
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "decode", "jpeg", "arithmetic"),
)
def multimodal_jpeg_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARITHMETIC-coded JPEG end-to-end (round 7 — closes the repo's
    oldest media gate): every document is encoded as huffman baseline AND
    as SOF9 arithmetic (the QM coder of T.81 Annex D with the published
    Table D.3 state machine, F.1.4.4 DC/AC conditioning models, DAC
    markers, restart markers on every third doc), both streams fully
    decoded, and the query emits whether the decodes are BIT-IDENTICAL —
    they must be, since both carry the same quantized coefficients. The
    oracle pins dims, block counts, the marker discipline (SOF9 + DAC
    present, NO DHT), the equality flag, and `arith_smaller` — the
    compression win that is arithmetic coding's reason to exist — TRUE
    for every doc. The unit suite additionally proves INTEROP against the
    real libjpeg in both directions (coefficient-exact decode of our
    files; our decode of its files), so this row's pass can't be a
    self-consistent-but-wrong codec. Scale shape: map-only after the
    fan-out exchange, like every codec kernel."""
    from rtcdb_spark.functions.multimodal import synth_and_jpeg_arithmetic

    d = load_table(spark, sf_dir, "documents")
    return synth_and_jpeg_arithmetic(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_jpeg_lossless",
    """
    SELECT doc_id,
           CAST(5 + doc_id % 23 AS BIGINT) AS width,
           CAST(5 + doc_id % 17 AS BIGINT) AS height,
           CAST(1 + doc_id % 7 AS BIGINT) AS predictor,
           TRUE AS uses_sof3,
           TRUE AS roundtrip_exact
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "jpeg", "lossless", "dicom"),
)
def multimodal_jpeg_lossless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS JPEG end-to-end (round 7 — T.81 Annex H / SOF3, the DPCM
    mode DICOM medical images still ship in): every document encodes a
    deterministic 16-bit image with its own Annex-H predictor (1..7 by
    doc id, restart markers on every fourth doc) and must decode back
    BIT-EXACTLY — the mode's entire contract, with zero tolerance for a
    predictor formula, boundary rule, SSSS=16 difference, or
    modulo-2^16 reconstruction slip. The oracle pins dims, the predictor
    rotation, the SOF3 marker, and the exactness flag for every doc;
    the unit suite additionally pins each predictor's arithmetic BY
    HAND from the spec formulas. Scale shape: map-only after the
    fan-out exchange."""
    from rtcdb_spark.functions.multimodal import synth_and_jpeg_lossless

    d = load_table(spark, sf_dir, "documents")
    return synth_and_jpeg_lossless(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_jpeg_hierarchical",
    """
    SELECT doc_id,
           CAST(24 + doc_id % 29 AS BIGINT) AS width,
           CAST(24 + doc_id % 23 AS BIGINT) AS height,
           CAST(1 + doc_id % 4 AS BIGINT) AS levels,
           CAST(doc_id % 4 AS BIGINT) AS n_differential_frames,
           TRUE AS uses_dhp,
           TRUE AS within_tolerance
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "jpeg", "hierarchical", "pyramid"),
)
def multimodal_jpeg_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIERARCHICAL JPEG end-to-end (round 8 — T.81 Annex J pyramid
    coding, the progressive-RESOLUTION mode): every document encodes a
    deterministic smooth image at its own pyramid depth (1..4 by doc
    id) and decodes through the full DHP / EXP / differential-SOF5
    machinery back to the DHP dimensions within the DCT tolerance. The
    oracle pins dims, depth, the differential-frame COUNT (levels-1 —
    the marker structure itself), the DHP flag, and the tolerance flag
    per doc; the unit suite pins the J.1.1.2 expansion filter by hand.
    Scale shape: map-only after the fan-out exchange."""
    from rtcdb_spark.functions.multimodal import synth_and_jpeg_hierarchical

    d = load_table(spark, sf_dir, "documents")
    return synth_and_jpeg_hierarchical(d).sortWithinPartitions("doc_id")


@query(
    "multimodal_mp3_bitstream_decode",
    """
    SELECT doc_id,
           CAST(2 AS BIGINT) AS n_granules,
           CAST((doc_id % 13) + 1 AS BIGINT) AS n_nonzero,
           CAST(((doc_id % 13) + 1)
                * CAST(POWER(4, doc_id % 8) AS BIGINT) AS BIGINT)
               AS energy,
           CAST(1 AS BIGINT) AS budget_exact
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "mp3", "audio", "codec"),
)
def multimodal_mp3_bitstream_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MPEG-1 Layer III bitstream decode end-to-end (round 9,
    `functions/mp3.py`): each document becomes one LEGAL 417-byte MP3
    frame — header, mono side information, and a count1-table-B coded
    ±1 spectrum ((doc_id % 13) + 1 lines, alternating signs, global
    gain 210 + 4*(doc_id % 8)) — built with the VERIFIED table core
    (table B is DEFINED by the spec as the 4-bit one's-complement
    code; no recalled Huffman table is involved, see the ARBITRATION
    STATUS note in functions/mp3.py). The decoder then re-parses the
    bytes from scratch: frame sync, side info, scalefactor slots,
    count1 quads + signs, requantization x^(4/3) * 2^((gain-210)/4).
    Emitted per doc: granule count, nonzero-line count, the spectrum's
    total energy (exactly n * 4^k — integral, so the hash is
    float-safe), and whether every granule consumed EXACTLY its
    part2_3_length bits. The oracle restates the closed forms; a
    mis-parsed side-info field, a sign flip, a wrong quad complement,
    or an off-by-one in the bit budget breaks the hash. Scale: the
    codec runs inside `mapInPandas` over Arrow batches — embarrassingly
    parallel, no shuffle before the final sort. The id column is
    RANGE-repartitioned first (the `_fan_out` treatment every other codec
    row gets): the one-row-group parquet fixture is a single split, which
    would otherwise serialize all 5 000 pure-Python codec runs onto ONE
    task — an 8-byte/row exchange buys a core-count-wide decode (guide
    §2.5, unsplittable-input repartition), and partitioning by id RANGE
    instead of round-robin lets the ordered output come from a
    shuffle-free sortWithinPartitions, so the codec is not re-executed by
    a global sort's range-sampling pass (see `_fan_out`)."""
    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartitionByRange(spark.sparkContext.defaultParallelism, "doc_id")
    )

    def _work(batches):
        from rtcdb_spark.functions import mp3

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"].astype("int64"):
                doc_id = int(doc_id)
                n = (doc_id % 13) + 1
                gain = 210 + 4 * (doc_id % 8)
                vals = [1 if i % 2 == 0 else -1 for i in range(n)]
                data = mp3.build_count1_frames([(gain, vals)])
                rs = mp3.decode_stream(data)
                energy = sum(
                    float((r.spectrum ** 2).sum()) for r in rs
                )
                out.append(
                    {
                        "doc_id": doc_id,
                        "n_granules": len(rs),
                        "n_nonzero": sum(r.n_nonzero for r in rs),
                        "energy": int(round(energy)),
                        "budget_exact": int(
                            all(
                                r.bits_consumed == r.part2_3_length
                                for r in rs
                            )
                        ),
                    }
                )
            yield pd.DataFrame(out)

    return d.mapInPandas(
        _work,
        (
            "doc_id long, n_granules long, n_nonzero long, "
            "energy long, budget_exact long"
        ),
    ).sortWithinPartitions("doc_id")
