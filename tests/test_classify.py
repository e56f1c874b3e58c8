"""Hashed linear quality classifier (operators/classify.py)."""

import hashlib
import math

from entitylinking_spark.operators.classify import hashed_weights, score_documents

N_BUCKETS = 64


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _w(bucket: int, seed: str = "q1") -> int:
    return _h60(f"{seed}:{bucket}") % 2001 - 1000


def _expected(text: str):
    toks = [t for t in __import__("re").split(r"[^\w]+", text.lower()) if t]
    wsum = sum(_w(_h60(t) % N_BUCKETS) for t in toks)
    n = len(toks)
    score = wsum / (1000.0 * n) if n else 0.0
    return n, wsum, score


def test_weights_deterministic_and_bounded(spark):
    w1 = {r["bucket"]: r["w"] for r in
          hashed_weights(spark, N_BUCKETS).collect()}
    w2 = {r["bucket"]: r["w"] for r in
          hashed_weights(spark, N_BUCKETS).collect()}
    assert w1 == w2 and len(w1) == N_BUCKETS
    assert all(-1000 <= v <= 1000 for v in w1.values())
    assert w1 == {b: _w(b) for b in range(N_BUCKETS)}


def test_scores_match_manual_model(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "alpha beta gamma delta"),
        (2, ""),                      # token-less
        (3, "the the the"),           # repeated token: tf counts, not df
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    w = hashed_weights(spark, N_BUCKETS)
    out = {r["doc_id"]: r for r in
           score_documents(docs, w, N_BUCKETS).collect()}
    assert len(out) == 4
    for i, text in rows:
        n, wsum, score = _expected(text)
        r = out[i]
        assert (r["n_tokens"], r["w_sum"]) == (n, wsum), f"doc {i}"
        assert r["score"] == score
        assert abs(r["prob"] - 1.0 / (1.0 + math.exp(-score))) < 1e-12
        assert r["label"] == (score >= 0.0)
    # repeated-token doc: w_sum is 3x the single-token weight
    assert out[3]["w_sum"] == 3 * _w(_h60("the") % N_BUCKETS)


def test_threshold_moves_labels(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} token{i} text{i}") for i in range(20)],
        ["doc_id", "text"])
    w = hashed_weights(spark, N_BUCKETS)
    lo = score_documents(docs, w, N_BUCKETS, threshold=-1.0)
    hi = score_documents(docs, w, N_BUCKETS, threshold=1.1)
    assert all(r["label"] for r in lo.collect())
    assert not any(r["label"] for r in hi.collect())


def test_weight_join_is_broadcast(spark):
    docs = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    w = hashed_weights(spark, N_BUCKETS)
    plan = score_documents(docs, w, N_BUCKETS)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_validation(spark):
    import pytest as _pt
    docs = spark.createDataFrame([(0, "a")], ["doc_id", "text"])
    with _pt.raises(ValueError):
        hashed_weights(spark, 0)
    with _pt.raises(ValueError):
        score_documents(docs, hashed_weights(spark, 4), 0)


def test_classifier_caps_curation_composition(spark):
    """The model-based filter, domain caps, and the curation funnel
    compose: score -> cap survivors per source -> curate the kept set.
    Verifies column contracts line up end to end (the pipeline a real
    corpus build would run)."""
    from entitylinking_spark.operators.mixing import cap_per_domain
    from entitylinking_spark.plans.curation import CurationConfig, curate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = hashed_weights(spark, N_BUCKETS)
    scored = score_documents(docs, w, N_BUCKETS, threshold=-0.05)
    kept_ids = scored.filter("label").select("doc_id")
    kept = docs.join(kept_ids, "doc_id", "left_semi")
    capped = cap_per_domain(kept, cap=10, domain_col="source")
    surviving = kept.join(
        capped.filter("keep").select("doc_id"), "doc_id", "left_semi")
    out = curate(surviving, None, CurationConfig())
    n_in = surviving.count()
    assert out.count() == n_in and n_in > 0
    caps = capped.filter("keep").groupBy("domain").count().collect()
    assert all(r["count"] <= 10 for r in caps)
