"""Corpus-level text cleaning: C4 line dedup and Gopher document rules.

Two published curation procedures every large pre-training corpus build
runs (Raffel et al. 2020 "C4"; Rae et al. 2021 "Gopher" §A1.1), as
declarative DataFrame plans:

  remove_duplicated_lines   drop every line that occurs in >= min_docs
                            documents (C4 ran it at the three-sentence
                            level; the unit here is the newline-delimited
                            line) and REBUILD each document's text in
                            original line order, reporting drop counts.
  gopher_rules              the Gopher quality gate as one row of named
                            boolean columns per document plus the AND
                            (`passes_gopher`) — annotate, don't drop,
                            so the funnel stays auditable (same stance
                            as plans/curation.py).

Reference analogue: the reference cleans its eval corpora with per-file
string passes (/root/reference/OneNet/data_process.py:137-239 normalize +
filter loops); these are the corpus-scale relational forms.

Scale design:
  * remove_duplicated_lines — lines shuffle once, keyed by the 64-bit
    line hash, and the cross-document frequency is a COUNT WINDOW over
    that single pass (the duplicated_ngram_stats discipline: the line
    explode — the expensive part — runs exactly once). Reassembly
    groups by doc id; per-task memory is bounded by the largest
    document, not the corpus. Empty lines are never counted or dropped
    (every doc shares them; dropping would mangle formatting).
  * gopher_rules — pure column expressions over one scan; zero
    shuffles at any corpus size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F


def remove_duplicated_lines(docs: DataFrame, min_docs: int = 3,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """(id, text) -> (id, text_clean, n_lines, n_dropped).

    A line is dropped from EVERY document when at least `min_docs`
    distinct documents contain it (exact string match, the C4 rule; C4
    used min_docs=3). Line order within each document is preserved;
    blank lines pass through untouched. Collision note: cross-document
    frequency is counted on xxhash64(line) — the 2^-64 trade documented
    in decontam.py; the DuckDB oracle counts line STRINGS and agrees
    exactly at test scale.
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would drop every line)")
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).select(
        id_col, "pos", "line",
        (F.length("line") > 0).alias("_counted"),
        # blank lines keep a per-doc window key so they never pile into
        # one hot partition (the duplicated_ngram_stats sentinel trick)
        F.when(F.length("line") > 0, F.xxhash64("line"))
        .otherwise(F.xxhash64(F.col(id_col))).alias("lh"),
    )
    # distinct docs per line, not occurrences: a doc repeating its own
    # line must not push it over the corpus threshold. Counted with a
    # lag-based first-occurrence-within-doc flag summed over the line
    # partition — one shuffle, bounded memory per row (a collect_set
    # window would materialize the full doc set per row: a line present
    # in 10^8 docs is exactly the case this operator exists for)
    w_occ = Window.partitionBy("lh").orderBy(id_col, "pos")
    prev_doc = F.lag(id_col).over(w_occ)
    first_in_doc = (prev_doc.isNull() | (prev_doc != F.col(id_col)))
    w_all = Window.partitionBy("lh")
    doc_freq = F.sum(first_in_doc.cast("long")).over(w_all)
    flagged = lines.withColumn(
        "_drop", F.col("_counted") & (doc_freq >= F.lit(min_docs))
    )
    return flagged.groupBy(id_col).agg(
        F.expr(
            "array_join(transform(array_sort("
            "  collect_list(CASE WHEN NOT _drop THEN struct(pos, line) END)"
            "), x -> x.line), '\n')"
        ).alias("text_clean"),
        F.count("*").alias("n_lines"),
        F.sum(F.col("_drop").cast("long")).alias("n_dropped"),
    )


@dataclass
class GopherConfig:
    """Thresholds from Gopher §A1.1 (defaults are the published values)."""

    min_words: int = 50
    max_words: int = 100_000
    min_mean_word_len: float = 3.0
    max_mean_word_len: float = 10.0
    max_symbol_word_ratio: float = 0.1   # '#' and ellipsis per word
    max_bullet_line_frac: float = 0.9
    max_ellipsis_line_frac: float = 0.3
    min_alpha_word_frac: float = 0.8
    min_stop_hits: int = 2


# Gopher's "must contain 2 of" stop set
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs: DataFrame, config: GopherConfig | None = None,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-document Gopher rule verdicts:
    (id, n_words, rule_* booleans..., passes_gopher).

    Words are whitespace-delimited (the paper's unit — NOT the engine
    tokenizer, which strips punctuation the symbol rules need). All
    rules are single-scan column expressions.
    """
    cfg = config or GopherConfig()
    words = F.filter(F.split(F.col(text_col), "\\s+"), lambda w: w != "")
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda l: l != "")
    n_words = F.size(words)
    n_lines = F.size(lines)
    mean_wl = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ) / F.greatest(n_words, F.lit(1))
    n_hash = F.size(F.split(F.col(text_col), "#")) - 1
    n_ellipsis = (
        (F.size(F.split(F.col(text_col), "\\.\\.\\.")) - 1)
        + (F.size(F.split(F.col(text_col), "…")) - 1)
    )
    bullet_lines = F.size(
        F.filter(lines, lambda l: l.rlike("^\\s*[-*•]"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.rlike("(\\.\\.\\.|…)\\s*$"))
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    low = F.lower(F.col(text_col))
    stop_hits = None
    for s in _GOPHER_STOPS:
        hit = low.rlike(f"\\b{s}\\b").cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    out = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        ((n_words >= cfg.min_words) & (n_words <= cfg.max_words))
        .alias("rule_word_count"),
        ((mean_wl >= cfg.min_mean_word_len)
         & (mean_wl <= cfg.max_mean_word_len)).alias("rule_mean_word_len"),
        ((n_hash + n_ellipsis)
         <= cfg.max_symbol_word_ratio * F.greatest(n_words, F.lit(1)))
        .alias("rule_symbol_ratio"),
        (bullet_lines
         <= cfg.max_bullet_line_frac * F.greatest(n_lines, F.lit(1)))
        .alias("rule_bullet_lines"),
        (ellipsis_lines
         <= cfg.max_ellipsis_line_frac * F.greatest(n_lines, F.lit(1)))
        .alias("rule_ellipsis_lines"),
        (alpha_words
         >= cfg.min_alpha_word_frac * F.greatest(n_words, F.lit(1)))
        .alias("rule_alpha_words"),
        (stop_hits >= cfg.min_stop_hits).alias("rule_stop_words"),
    )
    rules = [c for c in out.columns if c.startswith("rule_")]
    passes = None
    for c in rules:
        passes = F.col(c) if passes is None else passes & F.col(c)
    return out.withColumn("passes_gopher", passes)
