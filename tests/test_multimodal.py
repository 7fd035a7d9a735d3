import zlib

import numpy as np
import pytest

from ffcl_spark.datagen import docs_from_points
from ffcl_spark.operators import multimodal as MM


def test_feature_extraction_matches_local(spark):
    docs = docs_from_points(spark, "blobs", 100)
    media = MM.media_binary(docs)
    got = MM.extract_features(media).toPandas().set_index(["doc_id", "offset"])
    local = media.toPandas()
    for r in local.itertuples():
        b = bytes(r.media_bytes)
        row = got.loc[(r.doc_id, r.offset)]
        assert row.n_bytes == len(b)
        assert row.byte_crc == zlib.crc32(b)
        assert abs(row.byte_mean - np.frombuffer(b, dtype=np.uint8).mean()) < 1e-9


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_real("image/png")


def test_media_binary_schema(spark):
    docs = docs_from_points(spark, "blobs", 50)
    media = MM.media_binary(docs)
    kinds = dict(media.dtypes)
    assert kinds["media_bytes"] == "binary"
    assert media.count() == 50  # one media span per… two per doc of 25 docs


def test_ppm_codec_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    data = MM.encode_ppm(img)
    back = MM.decode_ppm(data)
    assert np.array_equal(back, img)
    # comment-tolerant header parse
    data2 = b"P6\n# a comment\n7 5\n255\n" + img.tobytes()
    assert np.array_equal(MM.decode_ppm(data2), img)


def test_wav_codec_roundtrip():
    rng = np.random.default_rng(4)
    mono = rng.integers(-32768, 32767, size=200, dtype=np.int16)
    s, rate = MM.decode_wav_pcm16(MM.encode_wav_pcm16(mono, rate=16000))
    assert rate == 16000
    assert np.array_equal(s[:, 0], mono)
    stereo = rng.integers(-32768, 32767, size=(100, 2), dtype=np.int16)
    s2, _ = MM.decode_wav_pcm16(MM.encode_wav_pcm16(stereo))
    assert np.array_equal(s2, stereo)


def test_decode_real_dispatch_and_unsupported():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    assert MM.decode_real("image/ppm", MM.encode_ppm(img)).shape == (2, 2, 3)
    wav = MM.encode_wav_pcm16(np.ones(8, dtype=np.int16))
    assert MM.decode_real("audio/wav", wav).shape == (8, 1)
    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_real("image/png")


def test_real_decode_path_end_to_end(spark):
    """media_binary(payload='ppm'/'wav') produces REAL container bytes;
    extract_features_decoded runs the pure-NumPy codec in the Arrow
    kernel and must match a local decode of the same payloads."""
    docs = docs_from_points(spark, "blobs", 60)
    for payload, w, h in (("ppm", 8, 6), ("wav", 128, 1)):
        media = MM.media_binary(docs, payload=payload)
        local = media.toPandas()
        got = (
            MM.extract_features_decoded(media)
            .toPandas()
            .set_index(["doc_id", "offset"])
        )
        assert len(got) == len(local) > 0
        for r in local.itertuples():
            row = got.loc[(r.doc_id, r.offset)]
            assert (row.width, row.height) == (w, h)
            if payload == "ppm":
                img = MM.decode_ppm(bytes(r.media_bytes))
                exp = img.astype(np.float64).mean(axis=(0, 1))
            else:
                s, _ = MM.decode_wav_pcm16(bytes(r.media_bytes))
                exp = s.astype(np.float64).mean(axis=0)
            assert np.allclose(row.channel_means, exp, rtol=0, atol=0)

def test_resize_nearest_local():
    img = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    small = MM.resize_nearest(img, 4, 3)
    assert small.shape == (3, 4, 3)
    # source mapping: floor((i + 0.5) * in/out)
    yi = [int((i + 0.5) * 6 / 3) for i in range(3)]
    xi = [int((j + 0.5) * 8 / 4) for j in range(4)]
    assert np.array_equal(small, img[yi][:, xi])
    # upscale repeats pixels, never interpolates
    big = MM.resize_nearest(img, 16, 12)
    assert big.shape == (12, 16, 3)
    assert set(np.unique(big)) <= set(np.unique(img))


def test_resize_images_end_to_end(spark):
    docs = docs_from_points(spark, "blobs", 40)
    media = MM.media_binary(docs, payload="ppm")
    local = media.toPandas()
    got = (
        MM.resize_images(media, out_w=4, out_h=3)
        .toPandas()
        .set_index(["doc_id", "offset"])
    )
    assert len(got) == len(local) > 0
    for r in local.itertuples():
        row = got.loc[(r.doc_id, r.offset)]
        assert (row.width, row.height) == (4, 3)
        assert row.media_kind == "image/ppm"
        out = MM.decode_ppm(bytes(row.media_bytes))
        exp = MM.resize_nearest(MM.decode_ppm(bytes(r.media_bytes)), 4, 3)
        assert np.array_equal(out, exp)
    # non-image kinds must fail loudly, not silently pass through
    wav = MM.media_binary(docs, payload="wav")
    with pytest.raises(Exception, match="resize_images"):
        MM.resize_images(wav, 4, 3).collect()


def test_split_ppm_frames_roundtrip():
    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8) for _ in range(4)
    ]
    buf = b"".join(MM.encode_ppm(f) for f in frames)
    back = MM.split_ppm_frames(buf)
    assert len(back) == 4
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)


def test_sample_frames_end_to_end(spark):
    docs = docs_from_points(spark, "blobs", 30)
    media = MM.media_binary(docs, payload="ppmseq")
    local = media.toPandas()
    got = MM.sample_frames(media, every=2).toPandas()
    # SEQ_FRAMES=4, every=2 -> frames 0 and 2 per video
    assert sorted(got["frame_idx"].unique()) == [0, 2]
    assert len(got) == 2 * len(local)
    assert (got["media_kind"] == "image/ppm").all()
    by_key = got.set_index(["doc_id", "offset", "frame_idx"])
    for r in local.itertuples():
        frames = MM.split_ppm_frames(bytes(r.media_bytes))
        assert len(frames) == MM.SEQ_FRAMES
        for idx in (0, 2):
            row = by_key.loc[(r.doc_id, r.offset, idx)]
            assert np.array_equal(
                MM.decode_ppm(bytes(row.media_bytes)), frames[idx]
            )
    # max_frames caps the kept set after striding
    got1 = MM.sample_frames(media, every=2, max_frames=1).toPandas()
    assert sorted(got1["frame_idx"].unique()) == [0]
    # sampled frames feed directly into the image pipeline
    resized = MM.resize_images(
        MM.sample_frames(media, every=2), out_w=2, out_h=2
    )
    assert resized.count() == 2 * len(local)
