"""Multimodal plumbing: binary columns + Arrow-batched feature extraction
(the decode itself is a documented deterministic stub)."""

from __future__ import annotations

from driftdb_spark.functions.multimodal import (
    extract_image_features,
    frame_sample_plan,
    synthetic_media,
)


def test_image_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=9)
    feats = extract_image_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    # only the image rows (kind cycles image/audio/video)
    assert set(rows) == {0, 3, 6}
    for r in rows.values():
        assert 64 <= r.width < 256 and 64 <= r.height < 256
        assert len(r.channel_means) == 3
        assert all(0.0 <= m <= 1.0 for m in r.channel_means)
        assert len(r.phash) == 16
    again = {r.media_id: r for r in extract_image_features(media).collect()}
    assert {k: (v.width, v.height, v.phash) for k, v in rows.items()} == {
        k: (v.width, v.height, v.phash) for k, v in again.items()
    }


def test_image_features_survive_repartition(spark):
    """Batch shape must not affect results — mapInPandas over 1 vs many
    partitions yields the same features."""
    media = synthetic_media(spark, n=9)
    one = {r.media_id: r.phash for r in extract_image_features(media.coalesce(1)).collect()}
    many = {r.media_id: r.phash for r in extract_image_features(media.repartition(8)).collect()}
    assert one == many


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=9)
    plan = frame_sample_plan(media, every_n=30)
    rows = plan.collect()
    assert {r.media_id for r in rows} == {2, 5, 8}  # video rows
    assert all(r.frame_idx >= 0 for r in rows)

def test_audio_features(spark):
    from driftdb_spark.functions.multimodal import extract_audio_features

    media = synthetic_media(spark, n=9)
    rows = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert set(rows) == {1, 4, 7}  # audio rows
    for r in rows.values():
        assert r.sample_rate in {8000, 16000, 24000, 32000, 40000, 48000}
        assert r.duration_s > 0 and 0.0 <= r.rms <= 1.0
    again = {r.media_id: r.sample_rate for r in extract_audio_features(media).collect()}
    assert again == {k: v.sample_rate for k, v in rows.items()}


def test_registered_multimodal_queries(spark):
    """The registry entries run and return stable shapes."""
    from driftdb_spark.registry import query_map

    qmap = query_map()
    sf = "/root/testdata/sf0.001"
    feats = qmap["multimodal_image_features"](spark, sf).collect()
    assert len(feats) == 8 and feats[0].media_id == 0
    stats = qmap["multimodal_binary_stats"](spark, sf)
    got = {r.source: r.n for r in stats.collect()}
    assert sum(got.values()) > 0


def test_ppm_decode_matches_numpy(spark):
    """The distributed PPM decode must equal an independent local numpy
    decode bit-for-bit (same float64 arithmetic): real pixels, real means,
    real block thumbnail — no stub."""
    import numpy as np

    from driftdb_spark.functions.multimodal import (
        decode_ppm,
        extract_ppm_features,
        ppm_bytes,
        synthetic_ppm_media,
    )

    got = {
        r.media_id: r
        for r in extract_ppm_features(synthetic_ppm_media(spark)).collect()
    }
    assert len(got) == 6
    for i in range(6):
        w, h = 8 + 2 * (i % 5), 6 + 2 * (i % 4)
        raw = ppm_bytes(i, w, h)
        ew, eh, emeans, ethumb = decode_ppm(raw)
        assert (got[i].width, got[i].height) == (ew, eh) == (w, h)
        assert got[i].channel_means == emeans
        assert got[i].thumb_2x2 == ethumb
        # independent check: means computed straight from the byte buffer
        px = np.frombuffer(raw[raw.index(b"255\n") + 4 :], dtype=np.uint8)
        assert px.size == w * h * 3
        assert got[i].channel_means == [
            float(v) for v in px.reshape(h, w, 3).astype(np.float64).mean(axis=(0, 1))
        ]


def test_wav_decode_matches_struct(spark):
    """The distributed WAV decode must bit-match an independent
    struct-module decode of the same bytes (no numpy on the checker
    side for the header walk)."""
    import struct

    import numpy as np

    from driftdb_spark.functions.multimodal import (
        extract_wav_features,
        synthetic_wav_media,
        wav_bytes,
    )

    got = {
        r.media_id: r
        for r in extract_wav_features(synthetic_wav_media(spark, 5)).collect()
    }
    for mid in range(5):
        raw = wav_bytes(mid)
        # independent parse: fixed offsets for the canonical layout
        assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
        rate = struct.unpack("<I", raw[24:28])[0]
        (dlen,) = struct.unpack("<I", raw[40:44])
        x = np.frombuffer(raw[44 : 44 + dlen], dtype="<i2").astype(np.float64) / 32768.0
        r = got[mid]
        assert r.sample_rate == rate and r.n_samples == len(x)
        assert r.duration_ms == round(len(x) * 1000.0 / rate, 3)
        assert abs(r.rms - float(np.sqrt(np.mean(x * x)))) < 1e-6
        assert r.zero_crossings == int(np.count_nonzero(np.diff(np.signbit(x))))


def test_wav_decode_handles_junk_and_extra_chunks(spark):
    """RIFF contract: unknown chunks are skipped, malformed input decodes
    to zeros instead of erroring the batch."""
    import struct

    from driftdb_spark.functions.multimodal import decode_wav, wav_bytes

    assert decode_wav(b"not a wav") == (0, 0, 0.0, 0.0, 0)
    raw = wav_bytes(1)
    # splice an unknown chunk between fmt and data
    junk = b"LIST" + struct.pack("<I", 5) + b"junk!" + b"\x00"  # odd len, padded
    spliced = raw[:36] + junk + raw[36:]
    clean = decode_wav(raw)
    assert decode_wav(spliced) == clean and clean[0] == 8000


def test_phash_dedup_finds_planted_near_dups(spark):
    """dHash over real decoded pixels: the three planted perturbed copies
    pair with their originals at small hamming; uncorrelated textures
    (measured 29-38 bits apart) never pair. Banding is exact-match-join
    only — no all-pairs."""
    from driftdb_spark.functions.multimodal import (
        dhash_ppm,
        extract_ppm_phash,
        noise_ppm_bytes,
        phash_near_dup_pairs,
        synthetic_phash_media,
    )

    sigs = extract_ppm_phash(synthetic_phash_media(spark))
    pairs = {(r.a_id, r.b_id): r.hamming
             for r in phash_near_dup_pairs(sigs).collect()}
    assert {(0, 100), (1, 101), (2, 102)} <= set(pairs)
    assert all(h <= 4 for h in pairs.values())
    # no pair between distinct base textures
    assert not any(a < 100 and b < 100 for a, b in pairs)

    # the Spark-side hamming agrees with an independent local popcount
    h0 = dhash_ppm(noise_ppm_bytes(0, 32, 24))
    h100 = dhash_ppm(noise_ppm_bytes(0, 32, 24, perturb=1))
    assert pairs[(0, 100)] == bin((h0 ^ h100) & ((1 << 64) - 1)).count("1")


def test_phash_recall_audit(spark):
    """Measured banding recall on the 60-image audit slice: every
    ground-truth pair within hamming <= 10 is caught by the 16-bit
    banding (a miss needs the flipped bits to hit all four bands; the
    deterministic fixture measures that it does not happen here)."""
    from driftdb_spark.functions.multimodal import (
        multimodal_phash_recall_audit,
    )

    rows = multimodal_phash_recall_audit(spark, "unused").collect()
    assert len(rows) == 20  # exactly the planted near-dup pairs
    assert all(r.hamming <= 4 for r in rows)
    recall = sum(r.caught for r in rows) / len(rows)
    assert recall == 1.0
