"""Multimodal-plumbing queries over `documents` (no testdata table
carries real media, so the payload is the document's UTF-8 bytes - an
opaque binary column as far as the engine is concerned).

The decode stage is the documented stub seam (operators/multimodal);
what IS oracle-checked here is the Spark-side plumbing the 100-TB
design depends on: binary columns + typed metadata flowing through an
Arrow mapInPandas stage with byte-budget partitioning, with values
surviving the JVM->Python->JVM round trip bit-exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import extract_features
from ..sources import read_table
from .registry import q

_KIND_SQL = """CASE doc_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio'
                               ELSE 'video' END"""

_FEATURES_SQL = f"""
SELECT doc_id AS media_id,
       {_KIND_SQL} AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS decoded_bytes,
       16 AS feature_dim
FROM documents
"""


@q("multimodal_features", _FEATURES_SQL)
def multimodal_features(spark, sf_dir):
    """documents -> opaque binary payload + kind metadata ->
    extract_features (Arrow mapInPandas over byte-budget partitions).
    The oracle checks the metadata and byte counts that cross the
    Python boundary; the feature vector itself comes from the stubbed
    codec (sha256-derived, deterministic) and is reduced to its
    dimensionality, which the schema fixes at FEATURE_DIM."""
    docs = read_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "decoded_bytes",
        F.size("feature").alias("feature_dim"),
    )
