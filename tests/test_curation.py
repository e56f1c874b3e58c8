"""Composed curation plan (plans/curation.py): verdict semantics, funnel
metrics, benchmark-less mode, keep-filter equivalence.

Corpus-scale restatement of the reference's per-file corpus prep chain
(/root/reference/OneNet/data_process.py:137-509).
"""

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.metrics import MetricsCollector
from entitylinking_spark.operators.pii import scrub_pii
from entitylinking_spark.plans.curation import CurationConfig, curate

GOOD = ("the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps by the door of the house for an hour with all of this")


@pytest.fixture(scope="module")
def corpus(spark):
    """Docs engineered to trip exactly one stage each:
    0..9   good english docs (kept)
    10     exact duplicate of doc 0 (dropped: duplicate)
    11     low quality (dropped: quality — no stopwords, all punct)
    12     non-english (dropped: lang)
    13     contains the benchmark sentence (dropped: contaminated)
    14     doc 0's text + an email (scrub makes it a NEAR dup, NOT exact)
    """
    leak = "purple elephants waltz under seventeen luminous icebergs nightly"
    rows = [(i, GOOD + f" variant w{i}") for i in range(10)]
    rows += [
        (10, GOOD + " variant w0"),
        (11, "!!! ??? ### $$$ %%% ^^^ &&& *** ((()))"),
        (12, "zzz yyy xxx www vvv uuu qqq ppp ooo nnn mmm lll kkk jjj"),
        (13, GOOD + " " + leak),
        (14, GOOD + " variant w0 mail me bob@example.com"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).persist()
    bench = spark.createDataFrame([(100, leak)], ["bench_id", "text"]).persist()
    return docs, bench


def test_verdicts_and_reasons(corpus):
    docs, bench = corpus
    out = {r["doc_id"]: r
           for r in curate(docs, bench,
                           CurationConfig(decontam_n=5)).collect()}
    assert len(out) == 15  # every doc returned, none silently dropped
    for i in range(10):
        assert out[i]["keep"], i
    assert not out[10]["keep"] and out[10]["is_duplicate"]
    assert not out[11]["keep"] and out[11]["quality"] < 0.25
    assert not out[12]["keep"] and out[12]["lang"] == "other"
    assert not out[13]["keep"] and out[13]["contaminated"]
    # 14 differs from 0/10 only by the email BEFORE scrub; after scrub the
    # texts still differ (the <EMAIL> tag remains) -> not an exact dup
    assert out[14]["keep"] and not out[14]["is_duplicate"]
    assert "<EMAIL>" in out[14]["text"]
    # splits assigned to every row from the configured bands
    assert {r["split"] for r in out.values()} <= {"train", "val", "test"}


def test_funnel_metrics(corpus):
    docs, bench = corpus
    mc = MetricsCollector()
    curate(docs, bench, CurationConfig(decontam_n=5), metrics=mc)
    funnel = [s for s in mc.stages if s["stage"] == "curation_funnel"][0]
    assert funnel["docs"] == 15
    assert funnel["duplicates"] == 1
    assert funnel["contaminated"] == 1
    assert funnel["lang_rejected"] >= 1   # doc 12 (doc 11 may also trip)
    assert funnel["low_quality"] >= 1     # doc 11
    assert funnel["kept"] == 11


def test_no_benchmark_skips_decontam(corpus):
    docs, _ = corpus
    out = {r["doc_id"]: r for r in curate(docs, None).collect()}
    assert not any(r["contaminated"] for r in out.values())
    assert not out[13]["contaminated"] and out[13]["keep"]


def test_keep_filter_matches_manual_composition(corpus):
    """curate(...).filter('keep') selects exactly the docs that pass each
    stage applied independently."""
    docs, bench = corpus
    cfg = CurationConfig(decontam_n=5)
    kept = {r["doc_id"]
            for r in curate(docs, bench, cfg).filter("keep").collect()}
    # independent recomputation from the operator pieces
    from entitylinking_spark.operators.decontam import decontaminate
    from entitylinking_spark.operators.textstats import (
        detect_language, quality_score,
    )

    scrubbed = docs.select("doc_id", scrub_pii("text").alias("text"))
    ok = scrubbed.select(
        "doc_id",
        (detect_language("text") == "en").alias("l"),
        (quality_score("text") >= 0.25).alias("q"),
    )
    dups = {r["doc_id"]
            for r in scrubbed.groupBy("text")
            .agg(F.min("doc_id").alias("m"), F.collect_list("doc_id").alias("ids"))
            .select(F.explode("ids").alias("doc_id"), "m")
            .filter("doc_id <> m").collect()}
    cont = {r["doc_id"]
            for r in decontaminate(scrubbed, bench, n=5)
            .filter("contaminated").collect()}
    want = {r["doc_id"] for r in ok.filter("l and q").collect()} - dups - cont
    assert kept == want


def test_scrub_off_keeps_raw_text(corpus):
    docs, _ = corpus
    out = {r["doc_id"]: r["text"]
           for r in curate(docs, None, CurationConfig(scrub=False)).collect()}
    assert "bob@example.com" in out[14]
    # and now 14 IS an exact duplicate? no — raw texts differ too
    flags = {r["doc_id"]: r["is_duplicate"]
             for r in curate(docs, None, CurationConfig(scrub=False)).collect()}
    assert flags[10] and not flags[14]


# --- optional model-filter and domain-cap stages -----------------------------

def test_curate_model_and_cap_stages(spark):
    """Extended funnel == manual composition: default curate gates, then
    classifier labels, then caps over the surviving set."""
    from entitylinking_spark.operators.classify import (
        hashed_weights, score_documents,
    )
    from entitylinking_spark.operators.mixing import cap_per_domain

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = CurationConfig(model_n_buckets=64, model_threshold=-0.05,
                         domain_cap=5)
    out = curate(docs, None, cfg)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(out.columns) >= {"model_score", "model_pass",
                                "cap_keep", "cap_rank", "keep"}

    # manual composition on the same inputs
    base = curate(docs, None, CurationConfig())
    scored = score_documents(
        base.select("doc_id", "text"),
        hashed_weights(spark, 64), 64, threshold=-0.05)
    lab = {r["doc_id"]: (r["label"], r["score"]) for r in scored.collect()}
    base_keep = {r["doc_id"]: r["keep"] for r in base.collect()}
    eligible_ids = [i for i in base_keep
                    if base_keep[i] and lab[i][0]]
    eligible = docs.filter(F.col("doc_id").isin(eligible_ids))
    capped = {r["doc_id"]: (r["keep"], r["rank_in_domain"])
              for r in cap_per_domain(eligible, cap=5).collect()}

    for i, r in rows.items():
        assert r["model_pass"] == lab[i][0]
        assert r["model_score"] == lab[i][1]
        expect_keep = base_keep[i] and lab[i][0] and capped.get(i, (False,))[0]
        assert r["keep"] == expect_keep, f"doc {i}"
        if i in capped and capped[i][0]:
            assert r["cap_rank"] == capped[i][1]
        else:
            assert r["cap_keep"] is False and r["cap_rank"] == -1
    # caps actually bind: no domain exceeds 5 kept docs
    kept = out.filter("keep").groupBy().count().first()[0]
    per_dom = (out.filter("keep")
               .join(docs.select("doc_id", "source"), "doc_id")
               .groupBy("source").count().collect())
    assert kept > 0 and all(r["count"] <= 5 for r in per_dom)


def test_curate_default_unchanged_by_new_config(spark):
    """Default config keeps the original column set and verdicts."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curate(docs, None, CurationConfig())
    assert out.columns == ["doc_id", "text", "lang", "quality",
                           "is_duplicate", "contaminated", "split", "keep"]
