"""Multimodal pipeline queries: binary blobs through Arrow-batched decode.

The Spark side runs the real pipeline — binary column -> ``mapInPandas``
feature extraction (operators/multimodal.py, deterministic fake codec). The
DuckDB oracle recomputes the same byte-statistics in SQL, so the whole
Python/Arrow data path (binary transfer, batch iteration, schema contract)
is value-checked end-to-end, not just smoke-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import documents_as_media, extract_features
from .registry import query, t

# ASCII-only guard: byte stats are recomputed from characters on the oracle
# side, which only coincides with bytes for ASCII text.
_DUCK_ORACLE = """
WITH media AS (
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           source, text
    FROM documents
    WHERE strlen(text) = length(text)
),
codes AS (
    SELECT media_id, kind, source,
           list_transform(string_split(text, ''), c -> ascii(c)) AS bytes_list,
           text
    FROM media
)
SELECT media_id, kind, source,
       CAST(len(bytes_list) AS BIGINT) AS n_bytes,
       CAST(list_reduce(list_prepend(0, bytes_list), (a, b) -> a + b) AS DOUBLE)
             / len(bytes_list) AS byte_mean,
       CAST(len(list_distinct(bytes_list)) AS DOUBLE) / 256.0 AS byte_entropy_proxy,
       lower(hex(substr(text, 1, 8))) AS header_hex
FROM codes
ORDER BY media_id
"""


@query(
    "multimodal_features",
    oracle=_DUCK_ORACLE,
    doc="Binary media columns through Arrow-batched mapInPandas feature "
    "extraction (deterministic fake codec; real WAV/PPM/BMP codecs live in "
    "operators/multimodal.py — see multimodal_decode). Oracle recomputes "
    "byte stats in SQL, validating the full binary/Arrow data path.",
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter("octet_length(text) = char_length(text)")
    media = documents_as_media(docs)
    return extract_features(media, codec="fake").orderBy("media_id")


# Real-codec round trip: blobs are genuine WAV/PPM/BMP containers built from
# (doc_id, n_chars); the Spark side PARSES the bytes (RIFF chunk walk, P6
# header, BMP header+stride), the oracle PREDICTS every decoded property
# from the originating columns — so a parser bug cannot cancel itself out.
_DECODE_ORACLE = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'wav'
            WHEN doc_id % 3 = 1 THEN 'ppm'
            ELSE 'bmp' END AS container,
       CASE WHEN doc_id % 3 = 0 THEN 0 ELSE least(n_chars, 64) END AS width,
       CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 8 END AS height,
       CASE WHEN doc_id % 3 = 0 THEN 8000 ELSE 0 END AS sample_rate,
       CASE WHEN doc_id % 3 = 0 THEN n_chars ELSE least(n_chars, 64) * 8 END AS n_samples,
       CASE WHEN doc_id % 3 = 0 THEN n_chars / 8000.0 ELSE 0.0 END AS duration_s,
       CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 128 AS DOUBLE)
            ELSE CAST(doc_id % 256 AS DOUBLE) END AS mean_value,
       CASE WHEN doc_id % 3 = 0 THEN 1.0 / 65536.0 ELSE 1.0 / 256.0 END AS value_spread
FROM documents
WHERE doc_id <= 300
ORDER BY media_id
"""


@query(
    "multimodal_decode",
    oracle=_DECODE_ORACLE,
    doc="REAL container decode end-to-end: WAV (RIFF PCM16 chunk walk), PPM "
    "(P6), BMP (24-bit, stride-aware) parsed byte-level in Arrow-batched "
    "mapInPandas; blobs synthesized deterministically from fixture columns "
    "so the oracle predicts every decoded property without parsing.",
    tags=("multimodal",),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_real_media, documents_as_real_media

    docs = t(spark, sf_dir, "documents").filter("doc_id <= 300")
    return decode_real_media(documents_as_real_media(docs)).orderBy("media_id")


# Video frame-sampling: y4m (YUV4MPEG2) streams parsed for real — header
# tokens, FRAME markers, C444 planes — with every 4th frame sampled. Frame f
# carries value (doc_id%128)+f, so the sampled mean is the arithmetic-series
# mean base + 2*(k-1), predictable in SQL.
_VIDEO_ORACLE = """
WITH v AS (
    SELECT doc_id, greatest(least(n_chars, 32), 1) AS nf
    FROM documents WHERE doc_id <= 300
)
SELECT doc_id AS media_id,
       'y4m' AS container,
       8 AS width,
       4 AS height,
       25 AS fps,
       nf AS n_frames,
       CAST(floor((nf + 3) / 4) AS BIGINT) AS n_sampled,
       nf / 25.0 AS duration_s,
       CAST(doc_id % 128 AS DOUBLE) + 2.0 * (CAST(floor((nf + 3) / 4) AS BIGINT) - 1)
           AS sampled_mean
FROM v
ORDER BY media_id
"""


@query(
    "multimodal_video_frames",
    oracle=_VIDEO_ORACLE,
    doc="REAL video container decode + frame sampling: YUV4MPEG2 streams "
    "(header tokens, FRAME markers, C444 planes) parsed byte-level in "
    "Arrow-batched mapInPandas, sampling every 4th frame — only sampled "
    "planes are touched. Blobs synthesized from fixture columns so the "
    "oracle predicts frame counts, duration and the sampled mean exactly.",
    tags=("multimodal", "video"),
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import documents_as_video, sample_video_frames

    docs = t(spark, sf_dir, "documents").filter("doc_id <= 300")
    return sample_video_frames(documents_as_video(docs), frame_stride=4).orderBy("media_id")


# Real nearest-neighbor resize: gradient P6 images (width 4 + doc_id%5,
# height 4, pixel value x*255 // (w-1)) resized to 3x2 thumbnails. NN picks
# src_x = x*w // 3, so the resized mean is avg over x in 0..2 of
# ((x*w // 3) * 255 // (w-1)) — pure integer arithmetic the oracle
# replays without touching a byte.
_RESIZE_ORACLE = """
WITH imgs AS (
    SELECT doc_id, 4 + doc_id % 5 AS w
    FROM documents WHERE doc_id <= 300
),
px AS (
    SELECT doc_id, w, ((k.k * w) // 3) * 255 // (w - 1) AS v
    FROM imgs CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS k) k
)
SELECT doc_id AS media_id,
       CAST(w AS BIGINT) AS orig_width,
       CAST(4 AS BIGINT) AS orig_height,
       CAST(3 AS BIGINT) AS new_width,
       CAST(2 AS BIGINT) AS new_height,
       round(avg(CAST(v AS DOUBLE)), 6) AS mean_after
FROM px
GROUP BY doc_id, w
ORDER BY media_id
"""


@query(
    "multimodal_resize",
    oracle=_RESIZE_ORACLE,
    doc="REAL image resize: gradient P6 PPMs through nearest-neighbor "
    "resize_ppm (parse header, sample src pixels, re-emit) then re-decode, "
    "all in Arrow-batched mapInPandas; oracle replays the NN sampling "
    "arithmetic in SQL.",
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize_table

    docs = t(spark, sf_dir, "documents").filter("doc_id <= 300")
    return resize_table(docs).orderBy("media_id")
