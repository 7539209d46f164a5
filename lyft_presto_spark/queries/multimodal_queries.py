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
    "extraction (deterministic fake codec; real codecs are stubbed — "
    "operators/multimodal.py). Oracle recomputes byte stats in SQL, "
    "validating the full binary/Arrow data path.",
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter("octet_length(text) = char_length(text)")
    media = documents_as_media(docs)
    return extract_features(media, codec="fake").orderBy("media_id")
