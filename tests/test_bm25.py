"""Full BM25 operator vs a pure-Python oracle, plus its linking channel."""

import math

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.bm25 import bm25_scores, bm25_topk
from entitylinking_spark.operators.linking import candidate_channels, link_mentions

CORPUS = [
    (1, "spark runs fast on big data clusters"),
    (2, "data data data everywhere in the lake"),
    (3, "the quick brown fox"),
    (4, "spark and data and spark again"),
    (5, ""),
]


def _tokens(text):
    import re

    return [t for t in re.split(r"[^\w]+", text.lower()) if t]


def _pure_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: _tokens(t) for i, t in corpus}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, tl in toks.items():
        s = 0.0
        for t in terms:
            tf = tl.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(tl) / avgdl))
        if s > 0:
            out[i] = s
    return out


def test_bm25_scores_match_pure_python(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["spark", "data"]).collect()}
    want = _pure_bm25(CORPUS, ["spark", "data"])
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_bm25_topk_rank_and_boost(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    plain = bm25_topk(df, ["spark", "data"], top_k=3).orderBy("rank").collect()
    assert [r["rank"] for r in plain] == [1, 2, 3]
    assert plain[0]["score"] >= plain[1]["score"] >= plain[2]["score"]
    # boost doc 3 (score 0 -> absent) stays absent; boost an existing doc to #1
    boosts = spark.createDataFrame([(1, 100.0)], ["doc_id", "boost"])
    boosted = bm25_topk(df, ["spark", "data"], top_k=3, boosts=boosts).collect()
    assert boosted[0]["doc_id"] == 1


def test_bm25_linking_channel(spark):
    e = spark.createDataFrame(
        [
            ("e1", "Apple", "apple fruit grows on trees", "food"),
            ("e2", "Apple Inc", "apple technology company phones", "tech"),
            ("e3", "Banana", "banana yellow tropical fruit", "food"),
        ],
        ["document_id", "title", "text", "corpus"],
    )
    m = spark.createDataFrame(
        [("food", "m1", "apple fruit"), ("tech", "m2", "apple phones")],
        ["corpus", "mention_id", "text"],
    )
    cands = candidate_channels(m, e, use_bm25=True)
    bm = cands.filter(F.col("channel") == "bm25").collect()
    got = {(r["mention_id"], r["document_id"]): r["ch_score"] for r in bm}
    assert ("m1", "e1") in got and ("m2", "e2") in got
    # corpus scoping: the tech mention never scores food entities
    assert all(mid != "m2" or doc == "e2" for (mid, doc) in got)


def test_link_mentions_bm25_end_to_end(spark):
    e = spark.createDataFrame(
        [
            ("e1", "Apple", "apple fruit grows on trees in orchards", "food"),
            ("e3", "Banana", "banana yellow tropical fruit", "food"),
        ],
        ["document_id", "title", "text", "corpus"],
    )
    m = spark.createDataFrame(
        [("food", "m1", None, "e1", 0, 5, "apple orchard trees", None)],
        "corpus string, mention_id string, context_document_id string, "
        "label_document_id string, start_index int, end_index int, "
        "text string, category string",
    )
    out = {r["mention_id"]: r["entity_id"]
           for r in link_mentions(m, e, use_bm25=True).collect()}
    assert out["m1"] == "e1"


def test_token_df_cutoff_drops_corpus_stopwords(spark):
    """A token present in every entity is dropped from the postings join
    (floor lowered so the tiny fixture triggers the cutoff)."""
    e = spark.createDataFrame(
        [(f"e{i}", f"t{i}", f"common word{i} text", "c") for i in range(10)],
        ["document_id", "title", "text", "corpus"],
    )
    m = spark.createDataFrame(
        [("c", "m1", "common"), ("c", "m2", "word3")],
        ["corpus", "mention_id", "text"],
    )
    cands = candidate_channels(m, e, token_df_cutoff=0.25, token_df_min=0)
    tok = cands.filter(F.col("channel") == "token").collect()
    mids = {r["mention_id"] for r in tok}
    assert "m1" not in mids       # 'common' (df=10/10) was suppressed
    assert "m2" in mids           # 'word3' (df=1/10) still joins
