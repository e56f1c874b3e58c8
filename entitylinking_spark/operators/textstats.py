"""Text-analysis operators for training-data pipelines.

All JVM-native column expressions (whole-stage codegen) except the rolling
fingerprint, which is one vectorized Arrow pass. Reference analogues: the
tokenize/score cascade (X6 /root/reference/e2e/entity_database.py:262,
X8 term frequency :338-346) and dataset statistics
(/root/reference/OneNet/data_process.py:486-509).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from entitylinking_spark.functions.strings import tokenize

# Tiny built-in English stopword list: enough for a ratio heuristic,
# deliberately not a model/download.
EN_STOPWORDS = (
    "the of and to in a is that it for on as with was be by are this have "
    "from or an at not but had his they you which one all were her she there"
).split()


def token_count(col: str | Column) -> Column:
    """Whitespace-ish token count (the cheap length signal)."""
    return F.size(tokenize(col))


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-flavoured proxy: words + digits + punctuation marks counted
    separately (closer to LLM token counts than whitespace splitting)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.size(F.array_remove(F.split(c, r"[^a-zA-Z]+"), ""))
    digits = F.size(F.array_remove(F.split(c, r"[^\d]+"), ""))
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return words + digits + punct


def stopword_ratio(col: str | Column, stopwords: list[str] = EN_STOPWORDS) -> Column:
    toks = tokenize(col)
    hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in stopwords])))
    n_distinct = F.size(F.array_distinct(toks))
    return F.when(n_distinct == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n_distinct.cast("double")
    )


def punct_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n.cast("double"))


def detect_language(col: str | Column, threshold: float = 0.08) -> Column:
    """n-gram-free language ID heuristic: English stopword ratio over
    distinct tokens; >= threshold -> 'en', else 'other'. A deliberate
    deterministic stand-in for a real langid model."""
    return F.when(stopword_ratio(col) >= threshold, F.lit("en")).otherwise(F.lit("other"))


def quality_score(col: str | Column) -> Column:
    """Blended document-quality heuristic in [0,1]:
    0.4*length_score + 0.3*stopword_score + 0.3*(1 - punct_excess).
    length_score saturates at 200 tokens; punct_excess is punctuation
    beyond a 15% budget, scaled."""
    ntok = token_count(col).cast("double")
    length_score = F.least(ntok / F.lit(200.0), F.lit(1.0))
    sw = stopword_ratio(col)
    sw_score = F.least(sw / F.lit(0.3), F.lit(1.0))
    pr = punct_ratio(col)
    punct_excess = F.greatest(pr - F.lit(0.15), F.lit(0.0)) / F.lit(0.85)
    return (
        F.lit(0.4) * length_score + F.lit(0.3) * sw_score
        + F.lit(0.3) * (F.lit(1.0) - punct_excess)
    )


def corpus_stats(docs: DataFrame, text_col: str = "text",
                 group_col: str | None = "lang") -> DataFrame:
    """Per-group corpus statistics (A5: mean tokens/chars, doc counts)."""
    d = docs.withColumn("_ntok", token_count(text_col)).withColumn(
        "_nchar", F.length(F.col(text_col))
    )
    keys = [group_col] if group_col else []
    return d.groupBy(*keys).agg(
        F.count("*").alias("n_docs"),
        F.avg("_ntok").alias("avg_tokens"),
        F.avg("_nchar").alias("avg_chars"),
        F.min("_nchar").alias("min_chars"),
        F.max("_nchar").alias("max_chars"),
    )


def make_fingerprint_udf(window: int = 8):
    """Rolling-hash document fingerprint (winnowing-style).

    Per document: 64-bit token hashes -> min hash per sliding window ->
    distinct retained mins, sorted -> xxhash-style combined fingerprint.
    One Arrow pass, NumPy sliding windows (no per-token Python).
    """

    @F.pandas_udf(T.LongType())
    def fingerprint(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.uint64)
        filled = text.fillna("")
        toks = filled.str.lower().str.findall(r"[a-z0-9_]+")
        for i, tl in enumerate(toks.tolist()):
            if not tl:
                h = pd.util.hash_array(np.array([f"\x00raw:{filled.iloc[i]}"], dtype=object))
                out[i] = h[0]
                continue
            hashes = pd.util.hash_array(np.array(tl, dtype=object))
            if len(hashes) >= window:
                mins = np.unique(
                    np.min(np.lib.stride_tricks.sliding_window_view(hashes, window), axis=1)
                )
            else:
                mins = np.array([hashes.min()], dtype=np.uint64)
            acc = np.uint64(1469598103934665603)
            for m in np.sort(mins):
                acc = (acc ^ m) * np.uint64(1099511628211)
            out[i] = acc
        return pd.Series(out.view(np.int64))

    return fingerprint


fingerprint_udf = make_fingerprint_udf()


def ngram_tokens(col: str | Column, n: int = 2) -> Column:
    """Token n-grams as space-joined strings (empty array when the doc has
    fewer than n tokens — sequence() would otherwise count DOWN)."""
    toks = tokenize(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def make_repetition_udf(n: int):
    """Arrow kernel: text -> (n_grams, top_gram_count, n_distinct) per row.

    Token strings siphashed once per batch, gram hashes a numeric rolling
    combine (functions/hashing.row_gram_segments), per-row stats via one
    np.unique per segment. Counts are exact modulo within-document 64-bit
    gram-hash collisions (~300 grams/doc -> P ~ 1e-14 per doc)."""

    @F.pandas_udf("n_grams long, top_gram_count long, n_distinct long")
    def rep(text: pd.Series) -> pd.DataFrame:
        from entitylinking_spark.functions.hashing import row_gram_segments

        if len(text) == 0:
            return pd.DataFrame(
                {"n_grams": [], "top_gram_count": [], "n_distinct": []},
                dtype="int64",
            )
        tok_lists, base, bounds = row_gram_segments(text, n)
        ng = np.zeros(len(tok_lists), dtype=np.int64)
        top = np.zeros(len(tok_lists), dtype=np.int64)
        nd = np.zeros(len(tok_lists), dtype=np.int64)
        for i, tl in enumerate(tok_lists):
            if len(tl) < n:
                continue
            seg = base[bounds[i]:bounds[i + 1]]
            _, counts = np.unique(seg, return_counts=True)
            ng[i] = seg.size
            top[i] = counts.max()
            nd[i] = counts.size
        return pd.DataFrame({"n_grams": ng, "top_gram_count": top,
                             "n_distinct": nd})

    return rep


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 2,
                     kernel: str = "arrow") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, Table A1, token-
    occurrence variant): per document, the fraction of n-gram occurrences
    inside the single most-frequent n-gram (`top_gram_frac`) and the
    fraction that are duplicates of an earlier occurrence
    (`dup_gram_frac`). High values mark boilerplate/templated text.

    kernel='arrow' (default, the scale path): every output is a per-row
    statistic, so ONE Arrow pass computes all of them map-side — ZERO
    shuffles at any corpus size. kernel='expr' keeps the relational twin
    (explode -> map-side-combined (id, gram) groupBy -> per-doc agg ->
    left join), whose gram-STRING formulation the DuckDB oracle
    recomputes; both paths give documents with < n tokens zero fractions.
    """
    if kernel == "arrow":
        rep = make_repetition_udf(n)
        r = F.col("_r")
        return docs.select(F.col(id_col), rep(text_col).alias("_r")).select(
            id_col,
            r["n_grams"].alias("n_grams"),
            r["top_gram_count"].alias("top_gram_count"),
            F.when(r["n_grams"] > 0, r["top_gram_count"] / r["n_grams"])
            .otherwise(0.0).alias("top_gram_frac"),
            F.when(r["n_grams"] > 0,
                   (r["n_grams"] - r["n_distinct"]) / r["n_grams"])
            .otherwise(0.0).alias("dup_gram_frac"),
        )
    grams = docs.select(
        F.col(id_col), F.explode(ngram_tokens(text_col, n)).alias("gram")
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("top_gram_count"),
        (F.max("c") / F.sum("c")).alias("top_gram_frac"),
        ((F.sum("c") - F.count("*")) / F.sum("c")).alias("dup_gram_frac"),
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("top_gram_count", F.lit(0)).alias("top_gram_count"),
        F.coalesce("top_gram_frac", F.lit(0.0)).alias("top_gram_frac"),
        F.coalesce("dup_gram_frac", F.lit(0.0)).alias("dup_gram_frac"),
    )


def make_dup_line_udf():
    """Arrow kernel: text -> (n_lines, n_distinct_lines, total_chars,
    dup_chars) over non-blank lines (blank = empty after trimming SPACES,
    the F.trim convention of the relational twin)."""

    @F.pandas_udf("n_lines long, n_distinct long, total_chars long, "
                  "dup_chars long")
    def dl(text: pd.Series) -> pd.DataFrame:
        nl = np.zeros(len(text), dtype=np.int64)
        nd = np.zeros(len(text), dtype=np.int64)
        tc = np.zeros(len(text), dtype=np.int64)
        dc = np.zeros(len(text), dtype=np.int64)
        for i, t in enumerate(text.fillna("")):
            lines = [ln for ln in t.split("\n") if ln.strip(" ") != ""]
            if not lines:
                continue
            u, counts = np.unique(np.array(lines, dtype=object),
                                  return_counts=True)
            lens = np.fromiter((len(s) for s in u), dtype=np.int64,
                               count=len(u))
            nl[i] = len(lines)
            nd[i] = len(u)
            tc[i] = int((counts * lens).sum())
            dc[i] = int(((counts - 1) * lens).sum())
        return pd.DataFrame({"n_lines": nl, "n_distinct": nd,
                             "total_chars": tc, "dup_chars": dc})

    return dl


def duplicate_line_stats(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         kernel: str = "arrow") -> DataFrame:
    """Duplicate-line fraction per document (Gopher Table A1): the share
    of non-empty lines that repeat an earlier line, plus the share of
    line CHARACTERS inside repeated lines.

    kernel='arrow' (default): per-row statistics in ONE map-side Arrow
    pass, zero shuffles (the repetition_stats argument). kernel='expr'
    keeps the relational twin the DuckDB oracle recomputes."""
    if kernel == "arrow":
        dl = make_dup_line_udf()
        r = F.col("_r")
        return docs.select(F.col(id_col), dl(text_col).alias("_r")).select(
            id_col,
            r["n_lines"].alias("n_lines"),
            F.when(r["n_lines"] > 0,
                   (r["n_lines"] - r["n_distinct"]) / r["n_lines"])
            .otherwise(0.0).alias("dup_line_frac"),
            F.when(r["total_chars"] > 0, r["dup_chars"] / r["total_chars"])
            .otherwise(0.0).alias("dup_line_char_frac"),
        )
    lines = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != "")
        ).alias("line"),
    )
    per_line = lines.groupBy(id_col, "line").agg(F.count("*").alias("c"))
    per_doc = per_line.groupBy(id_col).agg(
        F.sum("c").alias("n_lines"),
        ((F.sum("c") - F.count("*")) / F.sum("c")).alias("dup_line_frac"),
        (F.sum((F.col("c") - 1) * F.length("line"))
         / F.sum(F.col("c") * F.length("line"))).alias("dup_line_char_frac"),
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("dup_line_frac", F.lit(0.0)).alias("dup_line_frac"),
        F.coalesce("dup_line_char_frac", F.lit(0.0)).alias("dup_line_char_frac"),
    )
