"""N-gram LM perplexity filter (operators/lm.py) vs a pure-python
reference: exact count parity, probability normalization, plan shape."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.lm import ngram_lm_fit, ngram_lm_score

REF = [
    "the cat sat on the mat",
    "the cat ate the rat and the cat slept",
    "a dog sat on a log",
    "the quick brown fox jumps over the lazy dog",
]
CRAWL = [
    "the cat sat on the log",
    "zebra quantum flux capacitor",
    "the the the the",
    "on",
    "",
]


def _toks(t):
    return [w for w in re.split(r"[^\w]+", (t or "").lower(), flags=re.ASCII)
            if w]


def _ref_model(texts, n, k):
    grams, ctx = Counter(), Counter()
    for t in texts:
        ts = _toks(t)
        for i in range(len(ts) - n + 1):
            g = tuple(ts[i:i + n])
            grams[g] += 1
            ctx[g[:-1]] += 1
    v = len({w for t in texts for w in _toks(t)})
    return grams, ctx, v


def _ref_score(text, grams, ctx, v, n, k):
    ts = _toks(text)
    gs = [tuple(ts[i:i + n]) for i in range(len(ts) - n + 1)]
    if not gs:
        return 0, 0, None
    lps = [math.log((grams.get(g, 0) + k) / (ctx.get(g[:-1], 0) + k * v))
           for g in gs]
    hits = sum(1 for g in gs if g in grams)
    return len(gs), hits, sum(lps) / len(lps)


@pytest.fixture(scope="module")
def frames(spark):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF)], "doc_id long, text string"
    )
    crawl = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(CRAWL)] + [(200, None)],
        "doc_id long, text string",
    )
    return ref, crawl


@pytest.mark.parametrize("n,k", [(2, 1.0), (3, 1.0), (2, 0.5)])
def test_matches_python_reference(spark, frames, n, k):
    ref, crawl = frames
    lm = ngram_lm_fit(ref, n=n, k=k)
    grams, ctx, v = _ref_model(REF, n, k)
    assert lm.vocab_size == v
    got = {r["doc_id"]: r for r in ngram_lm_score(crawl, lm).collect()}
    for i, t in enumerate(CRAWL):
        ng, nh, lp = _ref_score(t, grams, ctx, v, n, k)
        r = got[100 + i]
        assert (r["n_grams"], r["n_hits"]) == (ng, nh), t
        if lp is None:
            assert r["avg_logp"] is None and r["perplexity"] is None
        else:
            assert r["avg_logp"] == pytest.approx(lp, rel=1e-12)
            assert r["perplexity"] == pytest.approx(math.exp(-lp), rel=1e-12)
    assert got[200]["n_grams"] == 0 and got[200]["avg_logp"] is None


def test_probabilities_normalize_per_context(spark, frames):
    # sum_w p(w|ctx) = (c_ctx + k*V) / (c_ctx + k*V) = 1 by construction;
    # verify numerically for the most common context
    ref, _ = frames
    lm = ngram_lm_fit(ref, n=2, k=1.0)
    grams, ctx, v = _ref_model(REF, 2, 1.0)
    c = max(ctx, key=ctx.get)
    vocab = {w for t in REF for w in _toks(t)}
    total = sum(
        (grams.get(c + (w,), 0) + 1.0) / (ctx[c] + v) for w in vocab
    )
    assert total == pytest.approx(1.0, rel=1e-12)


def test_in_domain_scores_better_than_garbage(spark, frames):
    ref, crawl = frames
    lm = ngram_lm_fit(ref, n=2)
    got = {r["doc_id"]: r["perplexity"]
           for r in ngram_lm_score(crawl, lm).collect()}
    assert got[100] < got[101]  # in-domain < unseen-vocab garbage


def test_count_joins_are_broadcast(spark, frames):
    ref, crawl = frames
    lm = ngram_lm_fit(ref, n=2)
    plan = ngram_lm_score(crawl, lm)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2


def test_validation(spark, frames):
    ref, _ = frames
    with pytest.raises(ValueError):
        ngram_lm_fit(ref, n=1)
    with pytest.raises(ValueError):
        ngram_lm_fit(ref, n=3, k=0.0)


def test_empty_reference_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        ngram_lm_fit(empty, n=2)


def test_shuffle_fallback_equals_broadcast(spark, frames):
    """Above broadcast_max_grams the joins fall back to shuffle — results
    identical, plan loses its broadcast builds."""
    ref, crawl = frames
    lm = ngram_lm_fit(ref, n=2)
    a = sorted(map(tuple, ngram_lm_score(crawl, lm).collect()))
    out_b = ngram_lm_score(crawl, lm, broadcast_max_grams=1)
    b = sorted(map(tuple, out_b.collect()))
    assert a == b
