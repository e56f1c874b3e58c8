"""Image resize (operators/multimodal.py: decode_image / resize_image /
encode_ppm / resize_media): hand-computed bilinear values, nearest-index
parity, identity/idempotence, and the end-to-end Spark path over mixed
real formats."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.multimodal import (
    decode_image,
    encode_ppm,
    decode_ppm,
    resize_image,
    resize_media,
)
from tests.test_media_decoders import make_bmp, make_ppm, make_png, make_wav

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>"
)


def test_bilinear_2x2_to_3x3_hand_values():
    # single channel, corners 0/90/30/120: half-pixel centers make the
    # 3x3 sample grid land at src coords {0, .5, 1} in each axis
    img = np.array([[0, 90], [30, 120]], dtype=np.uint8)
    out = resize_image(img, 3, 3, method="bilinear")[:, :, 0]
    want = np.array([[0, 45, 90], [15, 60, 105], [30, 75, 120]])
    np.testing.assert_array_equal(out, want)


def test_nearest_matches_index_gather():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
    out = resize_image(img, 14, 10, method="nearest")
    yi = np.minimum(((np.arange(14) + 0.5) * 7 / 14).astype(int), 6)
    xi = np.minimum(((np.arange(10) + 0.5) * 5 / 10).astype(int), 4)
    np.testing.assert_array_equal(out, img[np.ix_(yi, xi)])


def test_same_size_bilinear_is_identity():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(9, 11, 3), dtype=np.uint8)
    np.testing.assert_array_equal(resize_image(img, 9, 11), img)


def test_downscale_idempotent_at_target_size():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    once = resize_image(img, 8, 8)
    np.testing.assert_array_equal(resize_image(once, 8, 8), once)


def test_bad_args_raise():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        resize_image(img, 0, 4)
    with pytest.raises(ValueError):
        resize_image(img, 4, 4, method="bicubic")
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01not an image")


def test_decode_image_normalizes_to_rgb():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(make_ppm(img)), img)
    np.testing.assert_array_equal(decode_image(make_bmp(img)), img)
    np.testing.assert_array_equal(decode_image(make_png(img)), img)
    gray = rng.randint(0, 256, size=(5, 5), dtype=np.uint8)
    g = decode_image(b"P5\n5 5\n255\n" + gray.tobytes())
    assert g.shape == (5, 5, 3)
    np.testing.assert_array_equal(g[:, :, 0], gray)
    np.testing.assert_array_equal(g[:, :, 1], gray)


def test_ppm_round_trip():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(6, 9, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


def test_resize_media_end_to_end(spark):
    rng = np.random.RandomState(8)
    big = rng.randint(0, 256, size=(16, 12, 3), dtype=np.uint8)
    rows = [
        ("r1", "image", bytearray(make_ppm(big)), None),
        ("r2", "image", bytearray(make_bmp(big)), None),
        ("r3", "image", bytearray(make_png(big)), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_media(media, 4, 4).collect()}
    want = resize_image(big, 4, 4)
    for mid in ("r1", "r2", "r3"):
        r = out[mid]
        assert (r["src_height"], r["src_width"]) == (16, 12)
        assert (r["height"], r["width"]) == (4, 4)
        np.testing.assert_array_equal(decode_ppm(bytes(r["payload"])), want)
    # same pixels through three containers -> identical resized payloads
    assert bytes(out["r1"]["payload"]) == bytes(out["r2"]["payload"])
    assert bytes(out["r1"]["payload"]) == bytes(out["r3"]["payload"])


def test_resize_media_rejects_audio(spark):
    sig = (np.sin(np.arange(100)) * 10000).astype(np.int16)
    media = spark.createDataFrame(
        [("a1", "audio", bytearray(make_wav(sig)), None)], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="not a decodable image"):
        resize_media(media, 4, 4).collect()
