"""Reference-shaped entity linking flow on a hand-built fixture.

Fixture mirrors the reference's fake 8-entity database style
(/root/reference/Sparkle/database.py:82-131) without copying its data.
"""

from entitylinking_spark.operators.linking import (
    candidate_channels,
    link_mentions,
    rank_candidates,
)

ENTITIES = [
    ("e1", "Apple", "Apple is a fruit that grows on trees in orchards", "food"),
    ("e2", "Apple Inc", "Apple Inc is a technology company making phones", "tech"),
    ("e3", "Banana", "Banana is a yellow tropical fruit", "food"),
    ("e4", "Orange", "Orange is a citrus fruit with vitamin c", "food"),
]

MENTIONS = [
    # (corpus, mention_id, ctx_doc, label_doc, start, end, text, category)
    ("food", "m1", None, "e1", 0, 5, "apple fruit orchard trees", None),
    ("tech", "m2", None, "e2", 0, 9, "apple inc technology phones", None),
    ("food", "m3", None, "e3", 0, 6, "banana yellow tropical", None),
    ("food", "m4", None, None, 0, 4, "qqqq zzzz unknown thing", None),
]


def _dfs(spark):
    e = spark.createDataFrame(ENTITIES, ["document_id", "title", "text", "corpus"])
    m = spark.createDataFrame(
        MENTIONS,
        "corpus string, mention_id string, context_document_id string, "
        "label_document_id string, start_index int, end_index int, "
        "text string, category string",
    )
    return m, e


def test_candidate_channels_block_scoped(spark):
    m, e = _dfs(spark)
    cands = candidate_channels(m, e).collect()
    by_mention = {}
    for r in cands:
        by_mention.setdefault(r["mention_id"], set()).add(r["document_id"])
    # corpus blocking: the tech mention must not pull food-corpus entities
    assert "e2" in by_mention["m2"] and "e1" not in by_mention.get("m2", set())
    assert "e1" in by_mention["m1"]


def test_link_mentions_end_to_end(spark):
    m, e = _dfs(spark)
    out = {r["mention_id"]: r for r in link_mentions(m, e).collect()}
    assert out["m1"]["entity_id"] == "e1"
    assert out["m2"]["entity_id"] == "e2"
    assert out["m3"]["entity_id"] == "e3"
    assert out["m4"]["entity_id"] is None  # fallback ladder end state
    # accuracy vs labels on labeled mentions
    labeled = [r for r in out.values() if r["label_document_id"] is not None]
    hits = sum(1 for r in labeled if r["entity_id"] == r["label_document_id"])
    assert hits == len(labeled)


def test_rank_candidates_deterministic_order(spark):
    m, e = _dfs(spark)
    ranked = rank_candidates(candidate_channels(m, e), top_k=5)
    rows = ranked.filter("mention_id = 'm1'").orderBy("rank").collect()
    assert rows[0]["document_id"] == "e1"
    ranks = [r["rank"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
