"""PII scrub (operators/pii.py) and Gopher repetition stats
(textstats.repetition_stats / duplicate_line_stats): semantics the
driver-oracle value check can't isolate — masking order, edge docs,
known-answer fractions.
"""

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.pii import pii_count, pii_report, scrub_pii
from entitylinking_spark.operators.textstats import (
    duplicate_line_stats,
    ngram_tokens,
    repetition_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "mail me at jane.doe+x@corp.example.org or call 415-555-0199"),
        (1, "server 192.168.0.1 ssn 123-45-6789 intl +4915123456789"),
        (2, "no pii here at all"),
        (3, ""),
        (4, None),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_counts_and_scrub(docs):
    out = {r["doc_id"]: r for r in pii_report(docs).collect()}
    assert (out[0]["n_email"], out[0]["n_phone"]) == (1, 1)
    assert (out[1]["n_ipv4"], out[1]["n_ssn"], out[1]["n_phone"]) == (1, 1, 1)
    assert out[0]["scrubbed"] == "mail me at <EMAIL> or call <PHONE>"
    assert out[1]["scrubbed"] == "server <IPV4> ssn <SSN> intl <PHONE>"
    assert out[2]["n_pii"] == 0 and out[2]["scrubbed"] == "no pii here at all"
    assert out[3]["n_pii"] == 0
    assert out[4]["scrubbed"] is None  # null propagates, never fabricated


def test_ssn_masked_before_phone(spark):
    """3-2-4 must win over the 3-3-4 phone alternative — order is the
    PII_PATTERNS dict order."""
    d = spark.createDataFrame([(0, "id 123-45-6789 tel 123-456-7890")],
                              ["doc_id", "text"])
    got = d.select(scrub_pii("text").alias("s")).first()["s"]
    assert got == "id <SSN> tel <PHONE>"
    assert d.select(pii_count("text", "ssn").alias("c")).first()["c"] == 1


def test_ngram_tokens_short_doc(spark):
    d = spark.createDataFrame([(0, "one"), (1, "a b c"), (2, "")],
                              ["doc_id", "text"])
    got = {r["doc_id"]: r["g"]
           for r in d.select("doc_id", ngram_tokens("text", 2).alias("g")).collect()}
    assert got[0] == [] and got[2] == []
    assert got[1] == ["a b", "b c"]


def test_repetition_known_answer(spark):
    # "x y x y x y" -> bigrams: [x y, y x, x y, y x, x y] = 5 grams,
    # top "x y" x3, distinct 2 -> top 3/5, dup (5-2)/5
    d = spark.createDataFrame(
        [(0, "x y x y x y"), (1, "all distinct words here"), (2, "solo")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_stats(d, n=2).collect()}
    assert got[0]["n_grams"] == 5 and got[0]["top_gram_count"] == 3
    assert got[0]["top_gram_frac"] == pytest.approx(0.6)
    assert got[0]["dup_gram_frac"] == pytest.approx(0.6)
    assert got[1]["dup_gram_frac"] == 0.0
    assert got[2]["n_grams"] == 0 and got[2]["top_gram_frac"] == 0.0


def test_repetition_kernels_agree(spark):
    """The zero-shuffle Arrow kernel equals the relational twin row for
    row, including <n-token docs, empty text and heavy repetition."""
    rows = [(i, t) for i, t in enumerate([
        "x y x y x y", "a b c d e f g", "solo", "", "q q q q q q q q",
        "p1 p2 p1 p2 p1 p2 p1", "one two", "z",
    ])]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    for n in (1, 2, 3):
        a = sorted(map(tuple, repetition_stats(d, n=n, kernel="arrow").collect()))
        e = sorted(map(tuple, repetition_stats(d, n=n, kernel="expr").collect()))
        assert a == e, f"n={n}"


def test_dup_line_kernels_agree(spark):
    """Arrow and relational duplicate-line stats agree, including the
    trim-SPACES-only blank-line convention (a tab-only line counts)."""
    rows = [(i, t) for i, t in enumerate([
        "aaaa\nbb\naaaa\n\n  \ncc", "one line only", "", "\t\nx\n\t",
        "dup\ndup\ndup", "  padded  \n  padded  \nother",
    ])]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, duplicate_line_stats(d, kernel="arrow").collect()))
    e = sorted(map(tuple, duplicate_line_stats(d, kernel="expr").collect()))
    assert a == e


def test_duplicate_line_known_answer(spark):
    d = spark.createDataFrame(
        [(0, "aaaa\nbb\naaaa\n\n  \ncc"), (1, "one line only")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in duplicate_line_stats(d).collect()}
    # 4 non-empty lines (aaaa x2, bb, cc): dup 1/4; chars 4*2+2+2=12, dup 4
    assert got[0]["n_lines"] == 4
    assert got[0]["dup_line_frac"] == pytest.approx(0.25)
    assert got[0]["dup_line_char_frac"] == pytest.approx(4 / 12)
    assert got[1]["dup_line_frac"] == 0.0
