"""Text-analysis + multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    media_stats,
)
from entitylinking_spark.operators.textstats import (
    bpe_ish_token_count,
    corpus_stats,
    detect_language,
    fingerprint_udf,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)

EN = "the quick brown fox is one of the animals that you have seen in a story"
XX = "zzz qqq www rrr ttt yyy uuu iii ooo ppp"


class TestTextStats:
    def test_token_count(self, spark):
        df = spark.createDataFrame([("a b c",), ("",)], ["text"])
        out = [r["n"] for r in df.select(token_count("text").alias("n")).collect()]
        assert out == [3, 0]

    def test_bpe_ish_counts_more_than_words(self, spark):
        df = spark.createDataFrame([("hello, world! x2",)], ["text"])
        r = df.select(bpe_ish_token_count("text").alias("n")).collect()[0]
        assert r["n"] == 3 + 1 + 2  # words hello/world/x + digit-run 2 + , ! chars

    def test_stopword_and_lang(self, spark):
        df = spark.createDataFrame([(EN,), (XX,)], ["text"])
        out = df.select(
            stopword_ratio("text").alias("sw"), detect_language("text").alias("lang")
        ).collect()
        assert out[0]["sw"] > 0.3 and out[0]["lang"] == "en"
        assert out[1]["sw"] == 0.0 and out[1]["lang"] == "other"

    def test_punct_ratio(self, spark):
        df = spark.createDataFrame([("ab!?",), ("abcd",)], ["text"])
        out = [r["p"] for r in df.select(punct_ratio("text").alias("p")).collect()]
        assert out[0] == pytest.approx(0.5)
        assert out[1] == 0.0

    def test_quality_score_orders_sensibly(self, spark):
        good = " ".join([EN] * 20)
        bad = "!!! ??? ### $$$ %%%"
        df = spark.createDataFrame([(good,), (bad,)], ["text"])
        out = [r["q"] for r in df.select(quality_score("text").alias("q")).collect()]
        assert out[0] > 0.8 > out[1]

    def test_corpus_stats(self, spark):
        df = spark.createDataFrame(
            [("en", "a b c"), ("en", "d e"), ("fr", "x")], ["lang", "text"]
        )
        out = {r["lang"]: r for r in corpus_stats(df).collect()}
        assert out["en"]["n_docs"] == 2
        assert out["en"]["avg_tokens"] == pytest.approx(2.5)

    def test_fingerprint_deterministic_and_sensitive(self, spark):
        df = spark.createDataFrame([(EN,), (EN,), (XX,)], ["text"])
        out = [r["f"] for r in df.select(fingerprint_udf("text").alias("f")).collect()]
        assert out[0] == out[1]
        assert out[0] != out[2]


class TestMultimodal:
    def _media(self, spark):
        rows = [
            ("i1", "image", bytearray(b"imgbytes1"), (640, 480, None, None, "png")),
            ("i2", "image", bytearray(b"imgbytes1"), (640, 480, None, None, "png")),
            ("v1", "video", bytearray(b"vidbytes"), (1920, 1080, None, 25, "h264")),
            ("a1", "audio", bytearray(b"au"), (None, None, 16000, None, "wav")),
        ]
        return spark.createDataFrame(
            rows,
            "media_id string, kind string, payload binary, "
            "meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>",
        )

    def test_extract_features_deterministic(self, spark):
        out = {r["media_id"]: r for r in extract_features(self._media(spark), dim=8, use_stub_decoder=True).collect()}
        assert len(out["i1"]["feature"]) == 8
        # same payload bytes + kind => identical stub features and sha
        assert out["i1"]["feature"] == out["i2"]["feature"]
        assert out["i1"]["payload_sha"] == out["i2"]["payload_sha"]
        assert out["i1"]["payload_sha"] != out["v1"]["payload_sha"]
        assert out["a1"]["n_bytes"] == 2

    def test_default_decoder_is_real_and_loud(self, spark):
        """The DEFAULT path is the real decoder: unknown/compressed payloads
        raise instead of producing silent md5-grid fakes (r3 verdict #5)."""
        with pytest.raises(Exception, match="NotImplementedError|decoding"):
            extract_features(self._media(spark)).collect()

    def test_frame_sample_plan(self, spark):
        out = frame_sample_plan(self._media(spark), every_n=10).collect()
        assert [r["frame_idx"] for r in out] == [0, 10, 20]

    def test_media_stats(self, spark):
        out = {r["kind"]: r for r in media_stats(self._media(spark)).collect()}
        assert out["image"]["n_items"] == 2
        assert out["audio"]["avg_bytes"] == pytest.approx(2.0)
