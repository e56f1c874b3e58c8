"""Degenerate-input probes: empty and single-row frames through the main
entry points. The reference's scripts assume non-empty inputs everywhere
(e.g. /root/reference/Sparkle/core.py:30-166 indexes result lists without
guards); a distributed engine meets empty partitions and empty increments
as a matter of course, so these must not crash.
"""

from pyspark.sql import functions as F

from entitylinking_spark.operators.blocking import ERConfig
from entitylinking_spark.operators.dedup import dedup_minhash_lsh
from entitylinking_spark.operators.linking import link_mentions
from entitylinking_spark.plans.pipeline import resolve

REPO_SCHEMA = ("repo string, path string, commit string, lang string, "
               "content string, row_id string")
MENTION_SCHEMA = ("corpus string, mention_id string, context_document_id string, "
                  "label_document_id string, start_index int, end_index int, "
                  "text string, category string")
ENTITY_SCHEMA = "document_id string, title string, text string, corpus string"
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_resolve_empty_corpus(spark):
    empty = spark.createDataFrame([], REPO_SCHEMA)
    res = resolve(empty, ERConfig(), id_col="row_id")
    assert res.clusters.count() == 0
    assert res.clusters.columns == ["row_id", "cluster_id"]


def test_resolve_single_row(spark):
    one = spark.createDataFrame(
        [("r", "a/b.py", "c", "py", "print('hello world')", "r1")], REPO_SCHEMA
    )
    rows = resolve(one, ERConfig(), id_col="row_id").clusters.collect()
    assert len(rows) == 1
    assert rows[0]["cluster_id"] == "r1"  # singleton labels itself


def test_link_mentions_empty_mentions(spark):
    m = spark.createDataFrame([], MENTION_SCHEMA)
    e = spark.createDataFrame(
        [("e1", "Apple", "apple is a fruit", "k")], ENTITY_SCHEMA
    )
    out = link_mentions(m, e)
    assert out.count() == 0
    assert "entity_id" in out.columns


def test_link_mentions_empty_entities(spark):
    m = spark.createDataFrame(
        [("k", "m1", None, None, 0, 4, "apple fruit", None)], MENTION_SCHEMA
    )
    e = spark.createDataFrame([], ENTITY_SCHEMA)
    out = {r["mention_id"]: r for r in link_mentions(m, e).collect()}
    assert out["m1"]["entity_id"] is None  # fallback ladder end state


def test_dedup_minhash_empty_docs(spark):
    empty = spark.createDataFrame([], DOC_SCHEMA)
    out = dedup_minhash_lsh(empty, id_col="doc_id", text_col="text")
    assert out.count() == 0


def test_mixing_vocab_empty_and_single(spark):
    """Round-5 operators through the same degenerate probes."""
    from entitylinking_spark.operators.mixing import (
        domain_mix_weights, duplicated_ngram_stats, pack_sequences,
        stratified_sample,
    )
    from entitylinking_spark.operators.vocab import (
        bigram_pmi, length_profile, vocabulary,
    )

    empty = spark.createDataFrame([], DOC_SCHEMA)
    one = spark.createDataFrame(
        [(1, "only one document here", "en", "src0", 22)], DOC_SCHEMA
    )
    assert domain_mix_weights(empty).count() == 0
    w = domain_mix_weights(one).collect()
    assert len(w) == 1 and w[0]["weight"] == 1.0 and w[0]["oversample"] == 1.0
    assert stratified_sample(empty, fractions=0.5).count() == 0
    assert stratified_sample(one, fractions=1.0).count() == 1
    assert pack_sequences(empty, budget=8).count() == 0
    p = pack_sequences(one, budget=8).collect()
    assert len(p) == 1 and p[0]["pack_id"] == 0 and p[0]["pack_pos"] == 0
    for kernel in ("arrow", "expr"):
        assert duplicated_ngram_stats(empty, kernel=kernel).count() == 0
        d = duplicated_ngram_stats(one, n=3, kernel=kernel).collect()
        assert len(d) == 1 and d[0]["n_dup_grams"] == 0
    assert vocabulary(empty).count() == 0
    assert vocabulary(one).count() == 4
    assert bigram_pmi(empty).count() == 0  # eager-totals empty guard
    assert bigram_pmi(one, min_count=1).count() == 3
    assert length_profile(empty).count() == 0
    prof = length_profile(one).collect()
    assert len(prof) == 1 and prof[0]["p50"] == 22


def test_curate_empty(spark):
    from entitylinking_spark.plans.curation import curate

    empty = spark.createDataFrame([], DOC_SCHEMA)
    out = curate(empty, benchmark=None)
    assert out.count() == 0
    assert "keep" in out.columns


def test_duplicate_spans_empty_and_single(spark):
    from entitylinking_spark.operators.cleaning import duplicate_spans

    empty = spark.createDataFrame([], DOC_SCHEMA).select("doc_id", "text")
    assert duplicate_spans(empty, n=3).count() == 0
    assert duplicate_spans(empty, n=3, emit="spans").count() == 0
    one = spark.createDataFrame([(1, "only one doc here")],
                                ["doc_id", "text"])
    rows = duplicate_spans(one, n=3).collect()
    assert len(rows) == 1 and rows[0]["n_spans"] == 0


def test_cap_per_domain_empty(spark):
    from entitylinking_spark.operators.mixing import cap_per_domain

    empty = spark.createDataFrame([], DOC_SCHEMA)
    out = cap_per_domain(empty, cap=3)
    assert out.count() == 0
    assert out.columns == ["doc_id", "domain", "keep", "rank_in_domain"]


def test_score_documents_empty(spark):
    from entitylinking_spark.operators.classify import (
        hashed_weights, score_documents,
    )

    empty = spark.createDataFrame([], DOC_SCHEMA).select("doc_id", "text")
    out = score_documents(empty, hashed_weights(spark, 16), 16)
    assert out.count() == 0
