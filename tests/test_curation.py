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


def test_curate_html_url_and_lm_stages(spark):
    """The three round-5 optional stages: HTML extraction feeds the scrub,
    the URL suffix blocklist gates, the LM perplexity gate drops garbage
    and too-short docs; all equal their manual compositions."""
    from entitylinking_spark.operators.cleaning import html_to_text
    from entitylinking_spark.operators.lm import ngram_lm_fit

    rows = [
        (0, f"<p>{GOOD} zero</p>", "https://ok.example.org/a"),
        (1, f"<div>{GOOD} one</div><script>var x=1;</script>",
         "https://ads.blocked.net/b"),
        (2, f"{GOOD} two", "https://ok.example.org/c"),
        (3, "zzz yyy xxx qqq www " * 6, "https://ok.example.org/d"),  # garbage
        (4, "<p>hi</p>", "https://ok.example.org/e"),  # too short to score
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "url"]).persist()
    ref = spark.createDataFrame(
        [(i, GOOD + f" ref {i}") for i in range(5)], ["doc_id", "text"]
    )
    lm = ngram_lm_fit(ref, n=2)
    bl = spark.createDataFrame([("blocked.net",)], "domain string")
    # threshold between the in-domain and garbage scores (tiny test vocab
    # compresses the perplexity range, so derive rather than hardcode)
    from entitylinking_spark.operators.lm import ngram_lm_score

    ppls = {
        r["doc_id"]: r["perplexity"] for r in ngram_lm_score(
            html_to_text(docs).select(
                "doc_id", F.col("text_plain").alias("text")), lm
        ).collect()
    }
    assert ppls[0] < ppls[3] and ppls[4] is None
    max_ppl = (ppls[0] + ppls[3]) / 2
    cfg = CurationConfig(extract_html=True, max_perplexity=max_ppl,
                         min_quality=0.0, languages=("en", "unknown"))
    out = curate(docs, config=cfg, url_blocklist=bl, lm=lm)
    got = {r["doc_id"]: r for r in out.collect()}

    # html extraction: scrubbed text equals html_to_text of the raw text
    plain = {
        r["doc_id"]: r["text_plain"] for r in html_to_text(
            docs.select("doc_id", "text")).collect()
    }
    for i in range(5):
        assert got[i]["text"] == plain[i], i
    assert "<script>" not in got[1]["text"]

    # url gate: only doc 1 blocked
    assert {i: got[i]["url_blocked"] for i in got} == {
        0: False, 1: True, 2: False, 3: False, 4: False}
    # lm gate: garbage ppl above the derived threshold, short doc NULL
    assert got[3]["lm_ppl"] > max_ppl
    assert got[4]["lm_ppl"] is None
    assert got[0]["keep"] and got[2]["keep"]
    assert not got[1]["keep"] and not got[3]["keep"] and not got[4]["keep"]
    docs.unpersist()


def test_curate_html_stage_default_off(spark):
    """extract_html=False leaves markup in place (and the default config
    column contract has no url/lm columns)."""
    docs = spark.createDataFrame(
        [(0, f"<p>{GOOD}</p>")], ["doc_id", "text"]
    )
    out = curate(docs, config=CurationConfig(min_quality=0.0))
    row = out.collect()[0]
    assert "<p>" in row["text"]
    assert out.columns == ["doc_id", "text", "lang", "quality",
                           "is_duplicate", "contaminated", "split", "keep"]
