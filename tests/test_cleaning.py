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


# --- duplicate_spans (Lee et al. 2022 ExactSubstr) ---------------------------

from entitylinking_spark.operators.cleaning import duplicate_spans  # noqa: E402


def _spans_fixture(spark):
    rows = [
        (0, "p0 q0 r0 alpha beta gamma delta epsilon s0 t0"),
        (1, "p1 alpha beta gamma delta epsilon q1"),
        (2, "nothing here repeats at all today"),
        (3, ""),
        (4, "one two"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_duplicate_spans_stats(spark):
    out = {r["doc_id"]: r for r in
           duplicate_spans(_spans_fixture(spark), n=3, min_count=2).collect()}
    assert len(out) == 5  # every input doc reported, even gram-less ones
    # doc 0: shared 5-token passage at token offsets 3..7 -> one span
    r0 = out[0]
    assert (r0["n_tokens"], r0["n_grams"]) == (10, 8)
    assert (r0["n_spans"], r0["n_dup_grams"]) == (1, 3)
    assert (r0["covered_tokens"], r0["max_span_tokens"]) == (5, 5)
    assert r0["dup_token_frac"] == 0.5
    # doc 1: same passage at offsets 1..5
    r1 = out[1]
    assert (r1["n_tokens"], r1["covered_tokens"]) == (7, 5)
    assert r1["n_spans"] == 1
    # doc 2: no duplication
    assert out[2]["n_spans"] == 0 and out[2]["dup_token_frac"] == 0.0
    # docs 3/4: gram-less (empty / shorter than n) -> zeros, frac 0.0
    for d in (3, 4):
        assert out[d]["n_grams"] == 0 and out[d]["covered_tokens"] == 0
        assert out[d]["dup_token_frac"] == 0.0
    assert out[4]["n_tokens"] == 2


def test_duplicate_spans_union_not_double_counted(spark):
    """Two duplicated grams whose token intervals OVERLAP (positions 0 and
    2 with n=3) must merge into ONE span of 5 tokens — a naive sum of
    per-gram intervals would report 6 > n_tokens."""
    rows = [
        (0, "a b c d e"),            # "a b c"@0 and "c d e"@2 dup, "b c d"@1 not
        (1, "x a b c y y c d e z"),  # supplies the other occurrences
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           duplicate_spans(docs, n=3, min_count=2).collect()}
    r0 = out[0]
    assert r0["n_dup_grams"] == 2
    assert r0["n_spans"] == 1
    assert r0["covered_tokens"] == 5  # union [0,3) u [2,5) = [0,5)
    assert r0["dup_token_frac"] == 1.0


def test_duplicate_spans_gap_splits(spark):
    """Duplicated grams further apart than n tokens form separate spans."""
    mid = "u0 u1 u2 u3"  # 4 unique tokens > n=3 gap
    rows = [
        (0, f"alpha beta gamma {mid} delta epsilon zeta"),
        (1, f"alpha beta gamma v0 v1 v2 v3 delta epsilon zeta"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           duplicate_spans(docs, n=3, min_count=2).collect()}
    assert out[0]["n_spans"] == 2
    assert out[0]["covered_tokens"] == 6
    assert out[0]["max_span_tokens"] == 3


def test_duplicate_spans_within_doc_counts(spark):
    """A doc repeating its own passage crosses min_count alone — the
    suffix-array semantics (total occurrences, not distinct docs)."""
    rows = [(0, "alpha beta gamma x0 x1 x2 x3 alpha beta gamma"),
            (1, "totally unrelated content words here")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           duplicate_spans(docs, n=3, min_count=2).collect()}
    assert out[0]["n_spans"] == 2
    assert out[0]["n_dup_grams"] == 2
    assert out[0]["covered_tokens"] == 6
    # mass-repetition: every gram duplicated -> one span covers the doc
    rows2 = [(0, "m m m m m m"), (1, "other words")]
    out2 = {r["doc_id"]: r for r in
            duplicate_spans(spark.createDataFrame(rows2, ["doc_id", "text"]),
                            n=3, min_count=2).collect()}
    assert out2[0]["n_spans"] == 1
    assert out2[0]["covered_tokens"] == 6
    assert out2[0]["dup_token_frac"] == 1.0


def test_duplicate_spans_emit_spans(spark):
    spans = duplicate_spans(_spans_fixture(spark), n=3, min_count=2,
                            emit="spans").collect()
    by_doc = {(r["doc_id"]): r for r in spans}
    assert len(spans) == 2
    assert (by_doc[0]["span_start"], by_doc[0]["span_tokens"]) == (3, 5)
    assert (by_doc[1]["span_start"], by_doc[1]["span_tokens"]) == (1, 5)
    assert by_doc[0]["n_grams_in_span"] == 3


def test_duplicate_spans_partitioning_invariant(spark):
    docs = _spans_fixture(spark)
    a = sorted(map(tuple, duplicate_spans(docs, n=3).collect()))
    b = sorted(map(tuple,
                   duplicate_spans(docs.repartition(7), n=3).collect()))
    assert a == b


def test_duplicate_spans_validation(spark):
    docs = _spans_fixture(spark)
    import pytest as _pt
    with _pt.raises(ValueError):
        duplicate_spans(docs, n=0)
    with _pt.raises(ValueError):
        duplicate_spans(docs, min_count=1)
    with _pt.raises(ValueError):
        duplicate_spans(docs, emit="cut")


def test_duplicate_spans_kernel_parity(spark):
    """arrow (positional siphash) and expr (xxhash64 gram strings) kernels
    hash in different spaces but must make identical span decisions."""
    import random
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    passage = "alpha beta gamma delta epsilon"
    rows = []
    for i in range(40):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
        if i % 4 == 0:
            body = f"{body} {passage} {body}"
        rows.append((i, body))
    rows += [(100, ""), (101, "x y")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for em in ("stats", "spans"):
        a = sorted(map(tuple,
                       duplicate_spans(docs, n=3, emit=em,
                                       kernel="arrow").collect()))
        e = sorted(map(tuple,
                       duplicate_spans(docs, n=3, emit=em,
                                       kernel="expr").collect()))
        assert a == e, f"kernel divergence in emit={em}"


def test_paragraph_dedup_sep(spark):
    """sep='\\n\\n' switches the dedup unit to paragraphs (Dolma-style):
    a shared paragraph is dropped; lines INSIDE unique paragraphs are
    untouched even when they repeat across docs."""
    shared = "shared paragraph line a\nshared paragraph line b"
    rows = [
        (0, f"intro zero\n\n{shared}\n\noutro zero"),
        (1, f"{shared}\n\nbody one"),
        (2, f"intro two\n\n{shared}"),
        (3, "repeat line\nrepeat line\n\nunique tail"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_duplicated_lines(docs, min_docs=3, sep="\n\n").collect()}
    assert out[0]["text_clean"] == "intro zero\n\noutro zero"
    assert out[1]["text_clean"] == "body one"
    assert out[2]["text_clean"] == "intro two"
    assert out[0]["n_dropped"] == 1 and out[0]["n_lines"] == 3
    # intra-paragraph repeated lines are invisible at paragraph level
    assert out[3]["text_clean"] == rows[3][1]
    import pytest as _pt
    with _pt.raises(ValueError):
        remove_duplicated_lines(docs, sep="")


def test_normalize_unicode_forms(spark):
    import unicodedata
    from entitylinking_spark.operators.cleaning import normalize_unicode

    decomposed = "café ÄB"       # e+combining acute, A+diaeresis
    compat = "ﬁle ①"                # fi-ligature, circled one
    rows = [(0, decomposed), (1, compat), (2, "plain ascii"), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    nfc = {r["doc_id"]: r for r in normalize_unicode(docs, "NFC").collect()}
    assert nfc[0]["text_norm"] == unicodedata.normalize("NFC", decomposed)
    assert nfc[0]["changed"] is True
    assert nfc[1]["text_norm"] == compat          # NFC keeps compat chars
    assert nfc[1]["changed"] is False
    assert nfc[2]["changed"] is False
    assert nfc[3]["text_norm"] is None and nfc[3]["changed"] is False
    nfkc = {r["doc_id"]: r for r in normalize_unicode(docs, "NFKC").collect()}
    assert nfkc[1]["text_norm"] == "file 1" and nfkc[1]["changed"] is True
    import pytest as _pt
    with _pt.raises(ValueError):
        normalize_unicode(docs, "NFX")


def test_duplicate_spans_mass_duplication(spark):
    """A gram shared by hundreds of docs (license-header shape) lands its
    occurrences in ONE count-window partition — results must stay exact
    (the skew is a wall-clock concern, bounded by slim 3-column rows)."""
    boiler = "this header is identical in every single file"
    rows = [(i, f"u{i}a u{i}b {boiler} u{i}c") for i in range(300)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicate_spans(docs, n=3, min_count=2).collect()
    assert len(out) == 300
    # exactly the boilerplate grams are duplicated: every doc has one
    # span covering the 8 shared tokens (unique context kills edge grams)
    for r in out:
        assert r["n_spans"] == 1
        assert r["covered_tokens"] == 8
        assert r["max_span_tokens"] == 8


def test_apply_span_cuts(spark):
    from entitylinking_spark.operators.cleaning import apply_span_cuts

    docs = _spans_fixture(spark)
    spans = duplicate_spans(docs, n=3, min_count=2, emit="spans")
    out = {r["doc_id"]: r for r in apply_span_cuts(docs, spans).collect()}
    assert len(out) == 5
    assert out[0]["text_cut"] == "p0 q0 r0 s0 t0"
    assert out[0]["n_tokens_removed"] == 5
    assert out[1]["text_cut"] == "p1 q1"
    assert out[2]["text_cut"] == "nothing here repeats at all today"
    assert out[2]["n_tokens_removed"] == 0
    assert out[3]["text_cut"] == "" and out[3]["n_tokens_removed"] == 0
    assert out[4]["text_cut"] == "one two"
    # idempotence: re-finding spans on the cut text finds nothing new for
    # the planted passage (it is gone everywhere)
    cut_docs = spark.createDataFrame(
        [(k, v["text_cut"]) for k, v in out.items()], ["doc_id", "text"])
    again = duplicate_spans(cut_docs, n=3, min_count=2).agg(
        F.sum("n_dup_grams")).first()[0]
    assert again == 0


def test_snapshot_diff(spark):
    from entitylinking_spark.operators.cleaning import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(1, "same"), (2, "has changed"), (4, "fresh")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in snapshot_diff(old, new).collect()}
    assert len(out) == 4
    assert out[1]["status"] == "unchanged"
    assert out[2]["status"] == "changed"
    assert out[3]["status"] == "removed" and out[3]["new_sha"] == ""
    assert out[4]["status"] == "added" and out[4]["old_sha"] == ""
    assert out[1]["old_sha"] == out[1]["new_sha"] != ""


def test_chunk_documents_known_and_coverage(spark):
    from entitylinking_spark.operators.cleaning import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, size=4, stride=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 tokens, starts 0,3,6 + tail 6 (dup) -> 0,3,6
    c1 = sorted(got[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_start"] for r in c1] == [0, 3, 6]
    assert c1[0]["chunk_text"] == "w0 w1 w2 w3"
    assert c1[2]["chunk_text"] == "w6 w7 w8 w9"
    # coverage: every token index in some [start, start+4)
    covered = set()
    for r in c1:
        covered.update(range(r["chunk_start"], r["chunk_start"] + 4))
    assert set(range(10)) <= covered
    # short doc: one whole chunk; empty/null: one empty chunk row
    assert len(got[2]) == 1 and got[2][0]["chunk_text"] == "a b c"
    assert len(got[3]) == 1 and got[3][0]["n_chunk_tokens"] == 0
    assert len(got[4]) == 1 and got[4][0]["chunk_text"] == ""


def test_chunk_documents_off_grid_tail(spark):
    from entitylinking_spark.operators.cleaning import chunk_documents

    words = " ".join(f"w{i}" for i in range(11))  # 11 tokens, size 4 stride 3
    docs = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = sorted(chunk_documents(docs, size=4, stride=3).collect(),
                  key=lambda r: r["chunk_id"])
    # grid starts 0,3,6 cover to 9; tail start 7 covers tokens 7..10
    assert [r["chunk_start"] for r in rows] == [0, 3, 6, 7]
    assert rows[-1]["chunk_text"] == "w7 w8 w9 w10"
    with pytest.raises(ValueError):
        chunk_documents(docs, size=4, stride=5)


def test_split_sentences_known(spark):
    from entitylinking_spark.operators.cleaning import split_sentences

    docs = spark.createDataFrame(
        [(1, "It was late! Was it?   Yes.  trailing bit"),
         (2, "Dr. Smith went home."),  # pinned naivety: abbreviation splits
         (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {}
    for r in split_sentences(docs).collect():
        got.setdefault(r["doc_id"], []).append((r["sent_id"], r["sentence"]))
    assert [s for _, s in sorted(got[1])] == [
        "It was late!", "Was it?", "Yes.", "trailing bit"]
    assert [s for _, s in sorted(got[2])] == ["Dr.", "Smith went home."]
    assert 3 not in got and 4 not in got


def test_sentence_level_c4_dedup_composition(spark):
    """resegment_sentences + remove_duplicated_lines = C4's sentence-unit
    dedup: a sentence shared by >= min_docs docs is dropped everywhere."""
    from entitylinking_spark.operators.cleaning import (
        remove_duplicated_lines,
        resegment_sentences,
    )

    boiler = "Subscribe to our newsletter today!"
    docs = spark.createDataFrame(
        [(i, f"Unique thought {i} here. {boiler} More unique text {i}.")
         for i in range(4)],
        "doc_id long, text string",
    )
    seg = resegment_sentences(docs).select(
        "doc_id", F.col("text_sentences").alias("text")
    )
    out = {r["doc_id"]: r for r in
           remove_duplicated_lines(seg, min_docs=3).collect()}
    for i in range(4):
        assert out[i]["n_dropped"] == 1
        assert boiler not in out[i]["text_clean"]
        assert f"Unique thought {i} here." in out[i]["text_clean"]
