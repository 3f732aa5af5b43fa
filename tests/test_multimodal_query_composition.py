"""Fused registry queries == PUBLIC operator composition (r14 ADVICE:
the r14 fusion moved the registry's image/audio near-dup paths off the
public operators; these differentials keep the operators pinned to the
exact media the fused queries hash, so an operator regression surfaces
against the planted-pair structure again)."""

from __future__ import annotations

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.queries import queries
from txf_continuous_data_pipeline_spark.queries.multimodal import (
    _synth_audio_payloads,
    _synth_image_payloads,
)
from txf_continuous_data_pipeline_spark.sources import read_table


def _doc_ids(spark, sf_dir):
    return sorted(
        r["doc_id"]
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    )


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}


def test_image_query_equals_public_composition(spark, sf_dir):
    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        image_phash,
        phash_neardup_pairs,
    )

    ids = _doc_ids(spark, sf_dir)
    media = spark.createDataFrame(
        [
            (int(i), "image", bytearray(p))
            for i, p in zip(ids, _synth_image_payloads(ids))
        ],
        "media_id long, kind string, payload binary",
    )
    public = _pairs(
        phash_neardup_pairs(image_phash(media), max_hamming=4)
    )
    fused = _pairs(queries()["image_phash_neardup"](spark, sf_dir))
    assert public == fused and fused
    # planted structure: exactly the (even, even+1) twins
    assert fused == {(i, i + 1) for i in ids if i % 2 == 0}


def test_audio_query_equals_public_composition(spark, sf_dir):
    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
        phash_neardup_pairs,
    )

    ids = _doc_ids(spark, sf_dir)
    media = spark.createDataFrame(
        [
            (int(i), "audio", bytearray(p))
            for i, p in zip(ids, _synth_audio_payloads(ids))
        ],
        "media_id long, kind string, payload binary",
    )
    public = _pairs(
        phash_neardup_pairs(
            audio_fingerprint(media), hash_col="fp", max_hamming=4
        )
    )
    fused = _pairs(
        queries()["audio_fingerprint_neardup"](spark, sf_dir)
    )
    assert public == fused and fused
    assert fused == {(i, i + 1) for i in ids if i % 2 == 0}
