"""MJPEG AVI video decode (operators/multimodal.py parse_avi /
decode_avi_frames / extract_video_frames): real video path = RIFF
container walk + the baseline JPEG decoder, frames anchored to the
ImageIO-encoded golden JPEG."""

import base64

import numpy as np
import pytest

from entitylinking_spark.functions.jpeg import decode_jpeg
from entitylinking_spark.functions.media_synth import (
    BENCH_JPEG_B64,
    make_avi_mjpeg,
)
from entitylinking_spark.operators.multimodal import (
    _real_decode,
    decode_avi_frames,
    extract_video_frames,
    parse_avi,
)

JPEG = base64.b64decode(BENCH_JPEG_B64)  # 160x120 external-encoder frame


@pytest.fixture(scope="module")
def avi():
    # 5 frames: the golden JPEG alternating with a byte-identical copy
    return make_avi_mjpeg([JPEG] * 5, 160, 120, fps=10)


def test_parse_avi_header_and_chunks(avi):
    meta, frames = parse_avi(avi)
    assert meta["n_frames"] == 5 and len(frames) == 5
    assert (meta["width"], meta["height"]) == (160, 120)
    assert meta["us_per_frame"] == 100_000
    assert all(f == JPEG for f in frames)


def test_decode_avi_frames_matches_jpeg_decoder(avi):
    ref = decode_jpeg(JPEG)
    out = list(decode_avi_frames(avi, every_n=2))
    assert [i for i, _ in out] == [0, 2, 4]
    for _, img in out:
        assert np.array_equal(img, ref)
    with pytest.raises(ValueError):
        list(decode_avi_frames(avi, every_n=0))


def test_parse_avi_rejects_non_avi():
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        parse_avi(b"nope")


def test_real_decode_routes_avi(avi):
    feat = _real_decode(avi, 8)
    ref = decode_jpeg(JPEG).astype(np.float64).mean(axis=2)
    from entitylinking_spark.operators.multimodal import _segment_means

    assert np.allclose(feat, _segment_means(ref.ravel() / 255.0, 8))


def test_extract_video_frames_spark(spark, avi):
    schema = (
        "media_id string, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,"
        "n_frames:int,codec:string>"
    )
    rows = [
        ("v1", "video", bytearray(avi), None),
        ("v2", "video", bytearray(avi), None),
        ("i1", "image", bytearray(JPEG), None),  # filtered out by kind
    ]
    df = spark.createDataFrame(rows, schema)
    out = extract_video_frames(df, every_n=2, dim=8).collect()
    assert sorted((r["media_id"], r["frame_idx"]) for r in out) == [
        ("v1", 0), ("v1", 2), ("v1", 4), ("v2", 0), ("v2", 2), ("v2", 4),
    ]
    assert all(r["n_frames"] == 5 and len(r["feature"]) == 8 for r in out)
    ref = decode_jpeg(JPEG).astype(np.float64).mean(axis=2)
    from entitylinking_spark.operators.multimodal import _segment_means

    expect = _segment_means(ref.ravel() / 255.0, 8)
    assert np.allclose(out[0]["feature"], expect, atol=1e-6)
