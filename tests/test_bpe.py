"""Distributed BPE training (operators/bpe.py) vs a pure-python port of
the published algorithm (Sennrich et al. 2016, Algorithm 1) with the same
(count DESC, pair ASC) tie-break, plus encode/tokenize parity."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.functions.strings import tokenize
from entitylinking_spark.operators.bpe import (
    _py_tokenize,
    bpe_tokenize,
    encode_word,
    train_bpe,
    word_counts,
)

CLASSIC = ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).strip()


def _ref_train(texts, n_merges, min_count=2):
    """Sennrich Algorithm 1, driver-side — shares nothing with the
    operator but the word convention."""
    wc = Counter(w for t in texts for w in _py_tokenize(t))
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        a, b = best[0]
        merges.append((a, b))
        for w, syms in vocab.items():
            r, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    r.append(a + b)
                    i += 2
                else:
                    r.append(syms[i])
                    i += 1
            vocab[w] = r
    return merges


@pytest.fixture(scope="module")
def classic_docs(spark):
    return spark.createDataFrame([(1, CLASSIC)], "doc_id long, text string")


def test_classic_corpus_matches_reference(spark, classic_docs):
    got = train_bpe(classic_docs, 10)
    want = _ref_train([CLASSIC], 10)
    assert got == want
    assert got[:2] == [("e", "s"), ("es", "t")]  # the published example


def test_random_corpus_matches_reference_across_checkpoint_cadence(spark):
    # >8 merges crosses the localCheckpoint lineage cut
    rng_words = ["alpha", "alphabet", "beta", "betamax", "gamma", "gram",
                 "grammar", "mamma", "aba", "abab", "ababab"]
    texts = [" ".join(rng_words[i % len(rng_words)]
                      for i in range(j, j + 17)) for j in range(6)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = train_bpe(docs, 12)
    assert got == _ref_train(texts, 12)
    assert len(got) == 12


def test_min_count_stops_early(spark, classic_docs):
    # min_count above every pair weight -> no merges at all
    assert train_bpe(classic_docs, 5, min_count=100) == []
    with pytest.raises(ValueError):
        train_bpe(classic_docs, -1)


def test_encode_word_greedy_rank_order():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est"]
    assert encode_word("slow", ranks) == ["s", "low"]
    assert encode_word("x", ranks) == ["x"]
    # overlapping candidates: rank decides, not position
    assert encode_word("les", ranks) == ["l", "es"]


def test_bpe_tokenize_matches_manual_encode(spark, classic_docs):
    merges = train_bpe(classic_docs, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    row = bpe_tokenize(classic_docs, merges).collect()[0]
    want = [s for w in _py_tokenize(CLASSIC) for s in encode_word(w, ranks)]
    assert list(row["bpe_tokens"]) == want
    assert row["n_bpe_tokens"] == len(want)


def test_tokenize_twins_agree_on_punctuation_and_unicode(spark):
    tricky = "Hello, WORLD!  café naïve_x 42-7 中文 a_b"
    df = spark.createDataFrame([(tricky,)], "text string")
    jvm = df.select(tokenize("text").alias("t")).collect()[0]["t"]
    assert list(jvm) == _py_tokenize(tricky)


def test_word_counts_is_one_groupby(spark, classic_docs):
    wc = {r["word"]: r["n"] for r in word_counts(classic_docs).collect()}
    assert wc == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_empty_and_null_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "aa aa bb")], "doc_id long, text string"
    )
    merges = train_bpe(docs, 3)
    assert merges == _ref_train(["", "", "aa aa bb"], 3)
    rows = {r["doc_id"]: r for r in bpe_tokenize(docs, merges).collect()}
    assert list(rows[1]["bpe_tokens"]) == []
    assert list(rows[2]["bpe_tokens"]) == []
    assert rows[3]["n_bpe_tokens"] > 0
