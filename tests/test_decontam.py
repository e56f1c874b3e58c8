"""Benchmark decontamination + split assignment (operators/decontam.py).

Corpus-scale generalization of the reference's eval-split key exclusion
(/root/reference/OneNet/data_process.py:137-169).
"""

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.metrics import MetricsCollector
from entitylinking_spark.operators.decontam import (
    contamination_pairs,
    decontaminate,
    split_assign,
    split_bucket,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """60 docs; docs 0-9 embed a verbatim benchmark sentence (planted
    contamination), the rest are distinct filler."""
    leak = "the quick brown fox jumps over the lazy dog tonight"
    rows = []
    for i in range(60):
        filler = " ".join(f"w{i}x{j}" for j in range(30))
        text = f"{filler} {leak}" if i < 10 else filler
        rows.append((i, text))
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).persist()
    bench = spark.createDataFrame(
        [(100, leak), (101, "completely unrelated benchmark question here")],
        ["bench_id", "text"],
    ).persist()
    return docs, bench


def test_planted_contamination_flagged(corpus):
    docs, bench = corpus
    out = decontaminate(docs, bench, n=5).collect()
    flags = {r["doc_id"]: r["contaminated"] for r in out}
    assert len(out) == 60  # every doc returned
    for i in range(60):
        assert flags[i] == (i < 10), f"doc {i}"
    hits = {r["doc_id"]: r["bench_hits"] for r in out}
    # 10-token leak sentence -> 6 distinct 5-grams... plus boundary grams
    # spanning filler+leak are NOT in the benchmark, so exactly 6
    assert all(hits[i] == 6 for i in range(10))
    assert all(hits[i] == 0 for i in range(10, 60))


def test_short_docs_and_benchmarks_never_flag(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "the quick brown fox jumps")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], ["bench_id", "text"]
    )
    # n=13 > every token count: no grams on either side, nothing flagged
    out = decontaminate(docs, bench, n=13).collect()
    assert all(not r["contaminated"] for r in out)
    # at n=5 doc 2 matches exactly
    out5 = {r["doc_id"]: r["contaminated"]
            for r in decontaminate(docs, bench, n=5).collect()}
    assert out5 == {1: False, 2: True}


def test_broadcast_and_shuffle_paths_agree(corpus):
    docs, bench = corpus
    bc = decontaminate(docs, bench, n=5)
    sh = decontaminate(docs, bench, n=5, broadcast_max_grams=0)
    a = sorted(map(tuple, bc.collect()))
    b = sorted(map(tuple, sh.collect()))
    assert a == b
    # the small-benchmark plan really does broadcast
    assert "BroadcastHashJoin" in bc._jdf.queryExecution().executedPlan().toString() \
        or "BroadcastHashJoin" in bc._jdf.queryExecution().toString()


def test_arrow_and_expr_kernels_agree(corpus):
    """The Arrow rolling-hash kernel and the codegen gram-string twin make
    identical decisions AND identical distinct-hit counts (their hash
    spaces differ, but a set-membership decision per gram is kernel-
    independent absent collisions)."""
    docs, bench = corpus
    a = sorted(map(tuple, decontaminate(docs, bench, n=5, kernel="arrow").collect()))
    e = sorted(map(tuple, decontaminate(docs, bench, n=5, kernel="expr").collect()))
    assert a == e
    pa = sorted(map(tuple, contamination_pairs(docs, bench, n=5, kernel="arrow").collect()))
    pe = sorted(map(tuple, contamination_pairs(docs, bench, n=5, kernel="expr").collect()))
    assert pa == pe


def test_contamination_pairs_evidence(corpus):
    docs, bench = corpus
    pairs = contamination_pairs(docs, bench, n=5).collect()
    got = {(r["doc_id"], r["bench_id"]): r["shared_grams"] for r in pairs}
    assert set(got) == {(i, 100) for i in range(10)}
    assert all(v == 6 for v in got.values())


def test_decontam_metrics_census(corpus):
    docs, bench = corpus
    mc = MetricsCollector()
    decontaminate(docs, bench, n=5, metrics=mc).count()
    census = [s for s in mc.stages if s["stage"] == "decontam_gram_census"][0]
    # leak sentence: 6 5-grams; unrelated bench item: 1 5-gram (5 tokens)
    assert census["benchmark_grams"] == 7
    assert census["broadcast"] is True


def test_empty_inputs(spark, corpus):
    docs, bench = corpus
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_bench = spark.createDataFrame([], "bench_id long, text string")
    assert decontaminate(empty_docs, bench, n=5).count() == 0
    out = decontaminate(docs, empty_bench, n=5).collect()
    assert len(out) == 60 and all(not r["contaminated"] for r in out)


def test_split_assign_deterministic_and_stable(corpus):
    docs, _ = corpus
    a = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    b = {r["doc_id"]: r["split"]
         for r in split_assign(docs.repartition(7)).collect()}
    assert a == b  # partitioning-independent
    # appending new docs never moves an old doc's split
    more = docs.sparkSession.createDataFrame(
        [(1000 + i, "x") for i in range(40)], ["doc_id", "text"]
    )
    c = {r["doc_id"]: r["split"]
         for r in split_assign(docs.unionByName(more)).collect()}
    assert all(c[k] == v for k, v in a.items())
    # different seed reshuffles
    d = {r["doc_id"]: r["split"]
         for r in split_assign(docs, seed="v2").collect()}
    assert d != a


def test_split_weights_roughly_respected(spark):
    docs = spark.range(4000).withColumnRenamed("id", "doc_id")
    out = split_assign(docs, weights={"train": 0.8, "val": 0.2})
    shares = {r["split"]: r["c"]
              for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert abs(shares["train"] / 4000 - 0.8) < 0.03
    assert abs(shares["val"] / 4000 - 0.2) < 0.03
    with pytest.raises(ValueError):
        split_assign(docs, weights={})
    with pytest.raises(ValueError):
        split_assign(docs, weights={"a": -1.0, "b": 2.0})


# --- kernel-level property: hash-set semantics == string-gram semantics ---
# (pure pandas, no Spark job per example — the udf's wrapped function)

import re as _re

import pandas as _pd
from hypothesis import given, settings
from hypothesis import strategies as st

from entitylinking_spark.operators.decontam import make_gram_hash_udf

_WORD = st.text(alphabet="abc_0", min_size=1, max_size=3)
_TEXT = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)
_TOK = _re.compile(r"[a-z0-9_]+")


def _ref_grams(text: str, n: int) -> set[str]:
    toks = _TOK.findall(text.lower())
    if len(toks) < n:
        return set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@given(st.lists(_TEXT, min_size=1, max_size=8), st.integers(1, 4))
@settings(max_examples=150, deadline=None)
def test_gram_hash_kernel_matches_string_reference(texts, n):
    """For every row: |hash set| == |string-gram set| (per-row distinct,
    <n-token rows empty), and every pairwise INTERSECTION size matches —
    i.e. the hash space is a faithful, collision-free embedding of the
    gram strings at this scale, which is exactly what the contamination
    decision depends on."""
    fn = make_gram_hash_udf(n).func
    out = fn(_pd.Series(texts))
    hash_sets = [set(a.tolist()) for a in out]
    str_sets = [_ref_grams(t, n) for t in texts]
    for hs, ss in zip(hash_sets, str_sets):
        assert len(hs) == len(ss)
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            assert len(hash_sets[i] & hash_sets[j]) == len(str_sets[i] & str_sets[j])


def test_split_bucket_uniform(spark):
    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    m = docs.select(F.avg(split_bucket("doc_id")).alias("m")).first()["m"]
    assert abs(m - 0.5) < 0.02
