"""End-to-end training-data flow: the composed path a corpus build runs —
curate (scrub/quality/lang/dedup/split + model filter) -> token-budget
selection -> per-domain caps -> sequence packing -> sharded trainer sink.
Every stage is an engine operator; this proves the column contracts
compose without glue code."""

import glob

from pyspark.sql import functions as F

from entitylinking_spark.operators.mixing import (
    cap_per_domain,
    pack_sequences,
    select_under_token_budget,
)
from entitylinking_spark.operators.textstats import tokenize
from entitylinking_spark.plans.curation import CurationConfig, curate
from entitylinking_spark.sources.tables import write_training_shards


def test_full_training_flow(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    # 1. hygiene funnel with the model filter on
    verdicts = curate(docs, None, CurationConfig(
        model_n_buckets=256, model_threshold=-0.2))
    kept = (docs.join(verdicts.filter("keep").select("doc_id"),
                      "doc_id", "left_semi"))
    n_kept = kept.count()
    assert 0 < n_kept < docs.count()

    # 2. budget selection on quality = model score? use n_chars proxy
    scored = kept.withColumn("n_tokens", F.size(tokenize("text")))
    budget = int(scored.agg(F.sum("n_tokens")).first()[0] * 0.6)
    sel = select_under_token_budget(
        scored, budget, quality_col="n_chars", bins=16, max_boundary=40)
    chosen = scored.join(sel.filter("keep").select("doc_id"),
                         "doc_id", "left_semi")
    spent = chosen.agg(F.sum("n_tokens")).first()[0]
    assert spent <= budget

    # 3. per-domain caps on the selected set
    capped = cap_per_domain(chosen, cap=40)
    final = chosen.join(capped.filter("keep").select("doc_id"),
                        "doc_id", "left_semi")
    per_dom = final.groupBy("source").count().collect()
    assert final.count() > 0 and all(r["count"] <= 40 for r in per_dom)

    # 4. pack into 512-token windows across 4 shard streams
    packed = pack_sequences(final, budget=512, n_shards=4,
                            token_count_col="n_tokens")
    assert packed.count() == final.count()
    assert packed.agg(F.max("pack_pos")).first()[0] < 512

    # 5. write trainer shards; round-trip preserves the final doc set
    out = str(tmp_path / "shards")
    write_training_shards(
        final.join(packed.drop("n_tokens"), "doc_id"), out, n_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == final.count()
    assert sorted(glob.glob(f"{out}/shard=*")) and back.select(
        "shard").distinct().count() <= 4
