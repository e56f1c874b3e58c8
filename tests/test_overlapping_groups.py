"""G5 overlapping_groups vs a pure-python oracle of the reference loop
(graph_system.py:702-752 _create_overlapping_groups + coverage repair)."""

import pytest

from entitylinking_spark.operators.ranking import overlapping_groups


def _text_similarity(t1: str, t2: str) -> float:
    w1, w2 = set(t1.lower().split()), set(t2.lower().split())
    if not w1 or not w2:
        return 0.0
    return len(w1 & w2) / max(len(w1), len(w2))


def reference_groups(candidates, group_size=3, overlap=2):
    """Faithful port of the reference loop; candidates = [(id, text), ...]
    already in rank order."""
    groups = []
    n = len(candidates)
    if n <= group_size:
        return [list(candidates)]
    for i in range(0, n - overlap + 1, group_size - overlap):
        group = candidates[i:i + group_size]
        if len(group) >= 2:
            groups.append(list(group))
        if i + group_size >= n:
            break
    covered = {c[0] for g in groups for c in g}
    for cand in candidates:
        if cand[0] not in covered:
            best_idx, best_sim = None, -1.0
            for gi, g in enumerate(groups):
                sim = _text_similarity(cand[1], " ".join(m[1] for m in g))
                if sim > best_sim:
                    best_sim, best_idx = sim, gi
            if best_idx is not None and best_sim > 0.1 and len(groups[best_idx]) < group_size + 1:
                groups[best_idx].append(cand)
    return groups


def _spark_groups(spark, cands, group_size, overlap):
    """cands: [(id, text)] in rank order -> list of entity-id lists."""
    rows = [("m", cid, float(len(cands) - i), txt) for i, (cid, txt) in enumerate(cands)]
    df = spark.createDataFrame(rows, ["mention_id", "entity_id", "score", "text"])
    out = overlapping_groups(df, group_size=group_size, overlap=overlap,
                             text_col="text").orderBy("group_id").collect()
    return [list(r["entity_ids"]) for r in out]


CASES = [
    # (n, group_size, overlap)
    (2, 3, 2), (3, 3, 2), (4, 3, 2), (5, 3, 2), (8, 3, 2), (9, 3, 2),
    (7, 3, 1), (8, 3, 1),
    (7, 3, 0), (9, 3, 0), (10, 3, 0),   # overlap 0 can strand the tail
    (6, 4, 2), (9, 4, 2), (11, 5, 3),
]


@pytest.mark.parametrize("n,gs,ov", CASES)
def test_matches_reference_loop(spark, n, gs, ov):
    # shared word 'doc' makes repair similarity > 0.1 against any group
    cands = [(f"e{i:02d}", f"doc topic{i // 2} word{i}") for i in range(n)]
    want = [[c[0] for c in g] for g in reference_groups(cands, gs, ov)]
    got = _spark_groups(spark, cands, gs, ov)
    assert got == want


def test_repair_skipped_when_dissimilar(spark):
    """overlap=0, n=7 strands candidate 6; make its text share no words ->
    reference leaves it ungrouped, and so must the operator."""
    cands = [(f"e{i}", f"shared topic{i}") for i in range(6)] + [("e6", "zzz qqq")]
    want = [[c[0] for c in g] for g in reference_groups(cands, 3, 0)]
    got = _spark_groups(spark, cands, 3, 0)
    assert got == want
    assert all("e6" not in g for g in got)


def test_single_candidate_single_group(spark):
    assert _spark_groups(spark, [("only", "t")], 3, 2) == [["only"]]
