import pytest

from sheep_spark import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, "image", bytes([i % 256]) * (512 + 300 * i), "image/fake") for i in range(6)]
    return spark.createDataFrame(rows, "media_id long, kind string, payload binary, mime string")


def test_image_features_shape_and_determinism(spark, media):
    a = {r.media_id: (r.width, r.height, r.n_bytes, tuple(r.feature)) for r in multimodal.image_features(media).collect()}
    b = {r.media_id: (r.width, r.height, r.n_bytes, tuple(r.feature)) for r in multimodal.image_features(media).collect()}
    assert a == b
    assert len(a) == 6
    for w, h, n, feat in a.values():
        assert 16 <= w < 80 and 16 <= h < 80
        assert len(feat) == multimodal.IMAGE_FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in feat)


def test_image_features_strict_raises(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        multimodal.image_features(media, strict=True).collect()


def test_frame_sampling_one_to_many(spark, media):
    frames = multimodal.sample_frames(media, every_n_bytes=512, max_frames=3).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == set(range(6))
    for mid, fs in by_id.items():
        assert [f.frame_no for f in sorted(fs, key=lambda f: f.frame_no)] == list(range(len(fs)))
        assert all(len(bytes(f.frame)) <= 512 for f in fs)
