"""End-to-end web-corpus build: raw HTML pages + URLs -> extraction ->
curation funnel (PII scrub, quality/lang, exact dedup, URL blocklist, LM
perplexity gate) -> token-window chunking -> sequence packing -> trainer
shards. The integration story the individual operator tests compose into
(each stage's own semantics are pinned in its unit tests)."""

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.cleaning import chunk_documents
from entitylinking_spark.operators.lm import ngram_lm_fit
from entitylinking_spark.operators.mixing import pack_sequences
from entitylinking_spark.plans.curation import CurationConfig, curate
from entitylinking_spark.sources.tables import write_training_shards

GOOD = ("the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps by the door of the house for an hour with all of this")


def _pages(spark):
    rows = []
    for i in range(12):
        body = GOOD + f" page {i} " + GOOD
        rows.append((i, f"<html><body><p>{body}</p></body></html>",
                     f"https://ok{i % 4}.example.org/p/{i}"))
    # 12: exact dup of page 0 (after extraction); 13: blocked domain;
    # 14: off-domain garbage the LM gate rejects
    rows.append((12, f"<html><body><p>{GOOD} page 0 {GOOD}</p></body></html>",
                 "https://ok0.example.org/dup"))
    rows.append((13, f"<p>{GOOD} page blocked {GOOD}</p>",
                 "https://ads.blocked.net/x"))
    rows.append((14, "<p>" + "zzz qqq xxx vvv " * 20 + "</p>",
                 "https://ok1.example.org/junk"))
    return spark.createDataFrame(rows, "doc_id long, text string, url string")


def test_full_web_corpus_build(spark, tmp_path):
    pages = _pages(spark).persist()
    ref = spark.createDataFrame(
        [(i, GOOD + f" ref {i}") for i in range(6)],
        "doc_id long, text string",
    )
    lm = ngram_lm_fit(ref, n=2)
    bl = spark.createDataFrame([("blocked.net",)], "domain string")
    cfg = CurationConfig(extract_html=True, max_perplexity=40.0,
                         min_quality=0.0, languages=("en", "unknown"))
    verdicts = curate(pages, config=cfg, url_blocklist=bl, lm=lm).persist()

    by_id = {r["doc_id"]: r for r in verdicts.collect()}
    assert all(by_id[i]["keep"] for i in range(12)), [
        (i, by_id[i]) for i in range(12) if not by_id[i]["keep"]]
    assert not by_id[12]["keep"] and by_id[12]["is_duplicate"]
    assert not by_id[13]["keep"] and by_id[13]["url_blocked"]
    assert not by_id[14]["keep"]

    kept = verdicts.filter("keep").select("doc_id", "text")
    assert kept.count() == 12

    # chunk the kept text into 16-token windows every 12 tokens
    chunks = chunk_documents(kept, size=16, stride=12)
    assert chunks.filter("n_chunk_tokens = 0").count() == 0
    n_chunks = chunks.count()
    assert n_chunks > kept.count()  # long pages produce several windows

    # pack chunk rows into 64-token streams (chunk id must be unique)
    packable = chunks.select(
        F.concat_ws("#", F.col("doc_id").cast("string"),
                    F.col("chunk_id").cast("string")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    packed = pack_sequences(packable, budget=64, n_shards=4)
    assert packed.count() == n_chunks
    # no token lost: per-shard stream length == sum of chunk tokens
    tot = packed.agg(F.sum("n_tokens")).first()[0]
    want = chunks.agg(F.sum("n_chunk_tokens")).first()[0]
    assert tot == want

    # ship trainer shards; re-read and check shard dirs + row count
    out = str(tmp_path / "shards")
    write_training_shards(packable, out, n_shards=3)
    back = spark.read.parquet(out)
    assert back.count() == n_chunks
    assert back.select("shard").distinct().count() == 3
    pages.unpersist()
    verdicts.unpersist()
