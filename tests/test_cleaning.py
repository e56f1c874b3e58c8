"""C4 line dedup + Gopher rules (operators/cleaning.py)."""

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.cleaning import (
    GopherConfig,
    gopher_rules,
    remove_duplicated_lines,
)


def test_line_dedup_drops_corpus_frequent_lines(spark):
    boiler = "subscribe to our newsletter"
    rows = [
        (0, f"unique zero\n{boiler}\nalso zero"),
        (1, f"{boiler}\nunique one"),
        (2, f"unique two\n{boiler}"),
        (3, "nothing shared\n\nblank above kept"),
        (4, f"{boiler}\n{boiler}\nrepeat inside four"),  # own repeat too
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_duplicated_lines(docs, min_docs=3).collect()}
    assert out[0]["text_clean"] == "unique zero\nalso zero"
    assert out[1]["text_clean"] == "unique one"
    assert out[2]["text_clean"] == "unique two"
    # blank lines never dropped, formatting preserved
    assert out[3]["text_clean"] == "nothing shared\n\nblank above kept"
    assert out[3]["n_dropped"] == 0
    # both occurrences dropped in doc 4
    assert out[4]["text_clean"] == "repeat inside four"
    assert out[4]["n_dropped"] == 2
    assert out[0]["n_lines"] == 3 and out[0]["n_dropped"] == 1


def test_line_dedup_distinct_doc_threshold(spark):
    """A line repeated many times WITHIN one doc counts once toward the
    corpus threshold."""
    rows = [(0, "same line\nsame line\nsame line"), (1, "other text")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_duplicated_lines(docs, min_docs=2).collect()}
    assert out[0]["n_dropped"] == 0  # only 1 distinct doc has it
    with pytest.raises(ValueError):
        remove_duplicated_lines(docs, min_docs=1)


def test_line_dedup_partitioning_invariant(spark):
    rows = [(i, f"shared line\nuniq {i}") for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, remove_duplicated_lines(docs).collect()))
    b = sorted(map(tuple,
                   remove_duplicated_lines(docs.repartition(7)).collect()))
    assert a == b
    assert all(r[1] == f"uniq {r[0]}" for r in a)  # shared line gone


def _gopher_row(spark, text):
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    return gopher_rules(df, GopherConfig(min_words=5)).collect()[0]


def test_gopher_rules_pass_and_fail(spark):
    good = ("the quick brown fox jumps over the lazy dog and then "
            "continues to have a wander with friends that matter most "
            "of the time in every "
            "sentence here because words keep arriving steadily onward")
    r = _gopher_row(spark, good)
    assert r["passes_gopher"], r.asDict()

    # too few words
    assert not _gopher_row(spark, "too short")["rule_word_count"]
    # symbol spam
    hashy = " ".join(["word#tag#stuff#more"] * 30)
    assert not _gopher_row(spark, hashy)["rule_symbol_ratio"]
    # bullet spam: every line is a bullet
    bullets = "\n".join(["- item with the words to have and that be of"] * 10)
    assert not _gopher_row(spark, bullets)["rule_bullet_lines"]
    # ellipsis endings
    dots = "\n".join(["the sentence trails away somewhere..."] * 10)
    assert not _gopher_row(spark, dots)["rule_ellipsis_lines"]
    # numeric soup fails the alpha-word rule
    nums = " ".join(str(i) for i in range(60))
    assert not _gopher_row(spark, nums)["rule_alpha_words"]
    # no stopwords
    zz = " ".join(f"zz{i}" for i in range(60))
    assert not _gopher_row(spark, zz)["rule_stop_words"]


def test_gopher_mean_word_length(spark):
    longwords = " ".join(["supercalifragilistic"] * 60)
    assert not _gopher_row(spark, longwords)["rule_mean_word_len"]
    shortwords = " ".join(["a"] * 60)
    assert not _gopher_row(spark, shortwords)["rule_mean_word_len"]


def test_gopher_zero_shuffle_plan(spark):
    """The rules are pure column expressions — the plan has no Exchange."""
    from entitylinking_spark.sources.tables import is_exchange_free

    df = spark.createDataFrame([(0, "some text")], ["doc_id", "text"])
    assert is_exchange_free(gopher_rules(df))
