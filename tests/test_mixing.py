"""Dataset assembly operators (operators/mixing.py).

Corpus-scale restatement of the reference's per-source subsetting and
fixed-size sampling (/root/reference/OneNet/data_process.py:137-509),
plus published mixing/packing semantics.
"""

import math

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.mixing import (
    domain_mix_weights,
    duplicated_ngram_stats,
    pack_sequences,
    sample_hash,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(120):
        dom = "big" if i < 90 else ("mid" if i < 110 else "tiny")
        text = " ".join(f"tok{i}a{j}" for j in range(5 + i % 7))
        rows.append((i, dom, text))
    return spark.createDataFrame(rows, ["doc_id", "source", "text"]).persist()


# --- domain_mix_weights ----------------------------------------------------


def test_mix_weights_match_closed_form(corpus):
    out = {r["domain"]: r for r in domain_mix_weights(corpus, alpha=0.3).collect()}
    sizes = {"big": 90.0, "mid": 20.0, "tiny": 10.0}
    tot = sum(v**0.3 for v in sizes.values())
    for dom, n in sizes.items():
        assert out[dom]["n_docs"] == int(n)
        assert out[dom]["size"] == n
        assert out[dom]["weight"] == pytest.approx(n**0.3 / tot)
        assert out[dom]["oversample"] == pytest.approx(
            (n**0.3 / tot) / (n / 120.0)
        )
    assert sum(r["weight"] for r in out.values()) == pytest.approx(1.0)


def test_mix_weights_alpha_extremes(corpus):
    uniform = {r["domain"]: r["weight"]
               for r in domain_mix_weights(corpus, alpha=0.0).collect()}
    assert all(w == pytest.approx(1 / 3) for w in uniform.values())
    natural = {r["domain"]: r["weight"]
               for r in domain_mix_weights(corpus, alpha=1.0).collect()}
    assert natural["big"] == pytest.approx(90 / 120)


def test_mix_weights_by_token_mass(corpus):
    sized = corpus.withColumn("ntok", F.size(F.split("text", " ")))
    out = domain_mix_weights(sized, alpha=1.0, size_col="ntok").collect()
    tot = sum(r["size"] for r in out)
    for r in out:
        assert r["weight"] == pytest.approx(r["size"] / tot)


# --- stratified_sample -----------------------------------------------------


def test_sample_deterministic_and_stratified(corpus):
    fr = {"big": 0.5, "mid": 1.0}  # tiny -> default 0.0
    a = sorted(r["doc_id"] for r in stratified_sample(corpus, fractions=fr).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(corpus, fractions=fr).collect())
    assert a == b
    got = stratified_sample(corpus, fractions=fr).groupBy("source").count()
    counts = {r["source"]: r["count"] for r in got.collect()}
    assert counts["mid"] == 20  # rate 1.0 keeps everything
    assert "tiny" not in counts  # default_fraction=0.0 drops the stratum
    assert 25 <= counts["big"] <= 65  # rate 0.5 of 90, generous binomial band


def test_sample_stable_under_append(corpus, spark):
    """Old rows keep their verdict when the corpus grows — the property
    Bernoulli df.sample lacks."""
    small = corpus.filter("doc_id < 60")
    kept_small = {r["doc_id"] for r in
                  stratified_sample(small, fractions=0.4).collect()}
    kept_full = {r["doc_id"] for r in
                 stratified_sample(corpus, fractions=0.4).collect()}
    assert kept_small == {i for i in kept_full if i < 60}


def test_sample_matches_hash_band(corpus):
    kept = {r["doc_id"] for r in
            stratified_sample(corpus, fractions=0.3, seed="zz").collect()}
    bands = corpus.select("doc_id", sample_hash("doc_id", "zz").alias("b")).collect()
    assert kept == {r["doc_id"] for r in bands if r["b"] < 0.3}


# --- pack_sequences --------------------------------------------------------


def test_packing_reconstructs_streams(corpus):
    out = pack_sequences(corpus, budget=32, n_shards=4).collect()
    assert len(out) == 120
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4))
    for rows in by_shard.values():
        # within a shard, (pack_id, pack_pos) reconstruct the running
        # offset: sorting by it must consume tokens contiguously
        rows.sort(key=lambda r: (r["pack_id"], r["pack_pos"]))
        offset = 0
        for r in rows:
            assert r["pack_id"] == offset // 32
            assert r["pack_pos"] == offset % 32
            end = offset + max(r["n_tokens"], 1) - 1
            assert r["straddles"] == (r["n_tokens"] > 0 and end // 32 != offset // 32)
            offset += r["n_tokens"]


def test_packing_deterministic_and_shard_count_safe(corpus):
    a = sorted(map(tuple, pack_sequences(corpus, budget=16, n_shards=8).collect()))
    b = sorted(map(tuple, pack_sequences(corpus, budget=16, n_shards=8).collect()))
    assert a == b
    one = pack_sequences(corpus, budget=16, n_shards=1).collect()
    assert {r["shard"] for r in one} == {0}
    total_tokens = sum(r["n_tokens"] for r in one)
    last = max(one, key=lambda r: (r["pack_id"], r["pack_pos"]))
    assert last["pack_id"] == (total_tokens - last["n_tokens"]) // 16


def test_packing_token_count_col_and_validation(corpus, spark):
    sized = corpus.withColumn("ntok", F.size(F.split("text", " ")))
    out = pack_sequences(sized, budget=32, n_shards=4,
                         token_count_col="ntok").collect()
    expect = pack_sequences(corpus, budget=32, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, expect))
    with pytest.raises(ValueError):
        pack_sequences(corpus, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(corpus, budget=8, n_shards=0)


# --- duplicated_ngram_stats ------------------------------------------------


def test_duplicated_grams_planted(spark):
    shared = "alpha beta gamma delta epsilon zeta"  # 6 toks -> 4 trigrams
    rows = [
        (0, shared + " uniq0a uniq0b"),
        (1, shared + " uniq1a uniq1b"),
        (2, "nothing shared here at all today friend"),
        (3, "xy"),  # 1 token -> 0 trigrams
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           duplicated_ngram_stats(docs, n=3, min_docs=2).collect()}
    assert set(out) == {0, 1, 2, 3}
    # docs 0/1: 8 tokens -> 6 trigrams each, 4 shared
    for d in (0, 1):
        assert out[d]["n_grams"] == 6
        assert out[d]["n_dup_grams"] == 4
        assert out[d]["dup_fraction"] == pytest.approx(4 / 6)
    assert out[2]["n_dup_grams"] == 0 and out[2]["dup_fraction"] == 0.0
    assert out[3]["n_grams"] == 0 and out[3]["dup_fraction"] == 0.0


def test_duplicated_grams_distinct_within_doc(spark):
    """A gram repeated WITHIN one doc does not count as cross-doc dup."""
    docs = spark.createDataFrame(
        [(0, "a b c a b c a b c"), (1, "totally different words here now")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           duplicated_ngram_stats(docs, n=3, min_docs=2).collect()}
    assert out[0]["n_dup_grams"] == 0
    with pytest.raises(ValueError):
        duplicated_ngram_stats(docs, n=0)


def test_mix_pipeline_composes(corpus):
    """weights -> sample -> pack as one lazy plan (no action in between)."""
    sampled = stratified_sample(corpus, fractions={"big": 0.5, "mid": 1.0,
                                                   "tiny": 1.0})
    packed = pack_sequences(sampled, budget=64, n_shards=2)
    n = packed.count()
    assert n == sampled.count() and n < 120


def test_duplicated_grams_arrow_equals_expr(spark):
    """kernel='arrow' (rolling siphash) and kernel='expr' (gram-string
    xxhash64) hash differently but must produce identical per-doc
    verdicts."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, shared + f" tail{i} tail{i}b") for i in range(4)]
    rows += [(9, "a b"), (10, "entirely different words all around here now")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, duplicated_ngram_stats(docs, n=3).collect()))
    e = sorted(map(tuple,
                   duplicated_ngram_stats(docs, n=3, kernel="expr").collect()))
    assert a == e


def test_packing_partitioning_invariant(corpus):
    """The pack layout is a pure function of (ids, tokens, seed): physical
    partitioning of the input must not change any assignment."""
    base = sorted(map(tuple, pack_sequences(corpus, budget=32, n_shards=4).collect()))
    shuffled = sorted(map(tuple, pack_sequences(
        corpus.repartition(13), budget=32, n_shards=4).collect()))
    one_part = sorted(map(tuple, pack_sequences(
        corpus.coalesce(1), budget=32, n_shards=4).collect()))
    assert base == shuffled == one_part


# --- cap_per_domain ----------------------------------------------------------

import hashlib

from entitylinking_spark.operators.mixing import cap_per_domain


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cap_fixture(spark, n=40, domains=("web", "web", "web", "wiki", "code")):
    rows = [(i, domains[i % len(domains)]) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "source"]), rows


def test_cap_per_domain_matches_global_hash_order(spark):
    docs, rows = _cap_fixture(spark)
    cap = 5
    out = cap_per_domain(docs, cap=cap, seed="c1", n_buckets=4).collect()
    assert len(out) == len(rows)  # annotate, don't drop
    # expected keep set: per domain, cap smallest (md5 hash, id) pairs
    by_dom = {}
    for i, d in rows:
        by_dom.setdefault(d, []).append((_h60(f"c1:{i}"), i))
    expected = {}
    for d, hs in by_dom.items():
        for rank, (_, i) in enumerate(sorted(hs)[:cap], start=1):
            expected[i] = rank
    for r in out:
        if r["doc_id"] in expected:
            assert r["keep"] is True
            assert r["rank_in_domain"] == expected[r["doc_id"]]
        else:
            assert r["keep"] is False and r["rank_in_domain"] == -1


def test_cap_per_domain_small_domains_keep_all(spark):
    docs, rows = _cap_fixture(spark, n=9)
    out = cap_per_domain(docs, cap=100).collect()
    assert all(r["keep"] for r in out)


def test_cap_per_domain_bucket_count_invariant(spark):
    """The two-level top-K must equal the single-window reference for any
    n_buckets (incl. 1 = the plain window)."""
    docs, _ = _cap_fixture(spark, n=60)
    ref = sorted(map(tuple, cap_per_domain(docs, cap=7, n_buckets=1).collect()))
    for b in (2, 8, 64):
        got = sorted(map(tuple,
                         cap_per_domain(docs, cap=7, n_buckets=b).collect()))
        assert got == ref, f"n_buckets={b} diverged"


def test_cap_per_domain_partitioning_invariant(spark):
    docs, _ = _cap_fixture(spark, n=50)
    a = sorted(map(tuple, cap_per_domain(docs, cap=4).collect()))
    b = sorted(map(tuple, cap_per_domain(docs.repartition(11), cap=4).collect()))
    assert a == b


def test_cap_per_domain_validation(spark):
    docs, _ = _cap_fixture(spark, n=5)
    import pytest as _pt
    with _pt.raises(ValueError):
        cap_per_domain(docs, cap=0)
    with _pt.raises(ValueError):
        cap_per_domain(docs, cap=1, n_buckets=0)


# --- select_under_token_budget ----------------------------------------------

from entitylinking_spark.operators.mixing import select_under_token_budget


def _budget_fixture(spark, n=200, seed=3):
    import random
    rng = random.Random(seed)
    rows = [(i, rng.random(), rng.randint(1, 50)) for i in range(n)]
    # plant exact quality ties crossing the cut line
    rows += [(n + j, 0.5, 10) for j in range(8)]
    return spark.createDataFrame(rows, ["doc_id", "quality", "n_tokens"]), rows


def _greedy_reference(rows, budget):
    keep, cum = set(), 0
    for i, q, t in sorted(rows, key=lambda r: (-r[1], r[0])):
        if cum + t <= budget:
            keep.add(i)
        cum += t
    return keep


def test_budget_selection_matches_greedy(spark):
    docs, rows = _budget_fixture(spark)
    total = sum(t for _, _, t in rows)
    for budget in (0, 37, total // 3, total // 2, total - 1, total + 5):
        out = {r["doc_id"]: r["keep"]
               for r in select_under_token_budget(
                   docs, budget, bins=8, max_boundary=20).collect()}
        expect = _greedy_reference(rows, budget)
        got = {i for i, k in out.items() if k}
        assert got == expect, f"budget={budget}"
        assert len(out) == len(rows)  # annotate, don't drop


def test_budget_selection_recursion_matches_single_window(spark):
    """Tiny bins force several recursion rounds; the result must equal
    the max_boundary=huge path (pure single window)."""
    docs, rows = _budget_fixture(spark, n=300, seed=9)
    budget = sum(t for _, _, t in rows) // 4
    a = sorted(map(tuple, select_under_token_budget(
        docs, budget, bins=4, max_boundary=10, max_rounds=12).collect()))
    b = sorted(map(tuple, select_under_token_budget(
        docs, budget, max_boundary=10**9).collect()))
    assert a == b


def test_budget_selection_validation(spark):
    docs, _ = _budget_fixture(spark, n=5)
    import pytest as _pt
    with _pt.raises(ValueError):
        select_under_token_budget(docs, -1)
    with _pt.raises(ValueError):
        select_under_token_budget(docs, 10, bins=1)
