"""The composed training-data curation plan.

One declarative pass stringing the engine's LLM-pipeline hygiene ops into
the shape every pre-training corpus build runs (C4 / Gopher / Dolma /
FineWeb): PII scrub -> quality + language annotation -> exact dedup ->
benchmark decontamination -> deterministic split, with an auditable
keep/drop verdict per document instead of silent row drops.

Reference analogue: the reference's corpus preparation is a chain of
per-file python scripts (/root/reference/OneNet/data_process.py:137-509
filters, dedupes and splits its eval corpora); this is the corpus-scale
relational restatement.

Scale shape (the whole point of composing these in ONE plan):
  - scrub / quality / lang / split are pure column expressions on the
    same scan — a 100 TB corpus pays ONE codegen'd pass, not five.
  - exact dedup is the plan's single corpus-wide shuffle (one min-id
    window over sha256).
  - decontamination joins the auto-broadcast benchmark gram set against
    map-side Arrow gram hashes; the flag join back is tiny-side
    (contaminated ids only, AQE broadcasts it).
  - every stage ANNOTATES rather than filters, so the funnel is an
    `agg` over boolean columns, not K recounts of the corpus.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window, functions as F

from entitylinking_spark.operators.decontam import decontaminate, split_expr
from entitylinking_spark.operators.pii import scrub_pii
from entitylinking_spark.operators.textstats import detect_language, quality_score


@dataclass
class CurationConfig:
    min_quality: float = 0.25
    languages: tuple[str, ...] = ("en",)
    scrub: bool = True
    decontam_n: int = 13
    decontam_kernel: str = "arrow"
    broadcast_max_grams: int = 20_000_000
    split_weights: dict[str, float] = field(
        default_factory=lambda: {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    split_seed: str = "v1"
    # optional model-based quality stage (classify.score_documents over
    # the SCRUBBED text): enabled when model_n_buckets > 0; weights=None
    # uses the deterministic placeholder table (classify.hashed_weights)
    model_n_buckets: int = 0
    model_threshold: float = 0.0
    model_seed: str = "q1"
    # optional per-domain cap (mixing.cap_per_domain over the docs that
    # pass every OTHER gate, so dropped docs never consume cap slots):
    # enabled when domain_cap is not None; requires domain_col in docs
    domain_cap: int | None = None
    domain_col: str = "source"
    cap_seed: str = "c1"
    cap_buckets: int = 32
    # optional HTML -> text extraction BEFORE the scrub (the WET step for
    # corpora ingested as raw markup): enabled when extract_html=True
    extract_html: bool = False
    # optional LM-perplexity gate (CCNet): enabled when an NgramLM is
    # passed to curate(lm=...); docs with perplexity > max_perplexity or
    # too short to score (NULL) fail the gate
    max_perplexity: float = 1e6


def curate(docs: DataFrame, benchmark: DataFrame | None = None,
           config: CurationConfig | None = None,
           id_col: str = "doc_id", text_col: str = "text",
           bench_text_col: str = "text", url_blocklist: DataFrame | None = None,
           url_col: str = "url", lm=None, metrics=None) -> DataFrame:
    """Annotate every document with the curation verdict.

    Returns one row per input doc:
      (id_col, text [scrubbed], lang, quality, is_duplicate,
       contaminated, split, keep)
    where keep = lang accepted AND quality >= min_quality AND NOT
    is_duplicate AND NOT contaminated. Everything downstream of the scrub
    (quality, lang, dedup, decontamination) is computed on the SCRUBBED
    text — the text that would ship. Training rows are
    `curate(...).filter("keep")`; the dropped remainder keeps its reasons
    for audit. With benchmark=None the contamination stage is skipped
    (contaminated = false, no benchmark jobs run).

    Optional stages (all default-off; see CurationConfig):
      * extract_html=True prepends the html_to_text regex chain — the
        scrub and everything downstream see the EXTRACTED text.
      * url_blocklist=<df with `domain`> adds the domain-suffix gate
        (cleaning.filter_blocked_domains over docs[url_col]) — extra
        column url_blocked, keep gains `AND NOT url_blocked`.
      * lm=<NgramLM from operators.lm.ngram_lm_fit> adds the CCNet
        perplexity gate over the scrubbed/extracted text — extra column
        lm_ppl; keep requires a non-NULL perplexity <= max_perplexity
        (too-short-to-score docs fail; gate on n_grams upstream if they
        should pass).
      * model_n_buckets > 0 adds the hashed linear quality classifier
        over the scrubbed text — extra columns (model_score, model_pass)
        and keep gains `AND model_pass`. The weight-dim join broadcasts;
        the classifier agg is the only extra shuffle.
      * domain_cap is not None adds per-domain caps — extra columns
        (cap_keep, cap_rank) and keep gains `AND cap_keep`. Caps rank
        ONLY the docs that pass every other gate, so dropped docs never
        consume cap slots; docs failing earlier gates report
        cap_keep=false, cap_rank=-1. Cost note: the cap input is a
        second reference to the verdict subtree — Catalyst evaluates the
        scan+window twice when caps are on; at corpus scale checkpoint
        the curated frame first (or run caps as a separate pass) if that
        matters.
    """
    cfg = config or CurationConfig()
    raw = F.col(text_col)
    if cfg.extract_html:
        from entitylinking_spark.operators.cleaning import _HTML_PASSES

        for pat, rep in _HTML_PASSES:
            raw = F.regexp_replace(raw, pat, rep)
    text = scrub_pii(raw) if cfg.scrub else raw
    base = docs.select(
        F.col(id_col),
        text.alias("text"),
        detect_language(text).alias("lang"),
        quality_score(text).alias("quality"),
        split_expr(id_col, cfg.split_weights, cfg.split_seed).alias("split"),
    )

    # dup flag via a window rather than dedup_exact's groupBy+rep-join:
    # same one corpus-wide shuffle, but single-branch, so the scrubbed
    # base is not recomputed on both sides of a self-join
    w = Window.partitionBy(F.sha2(F.col("text").cast("string"), 256))
    out = base.withColumn(
        "is_duplicate", F.col(id_col) != F.min(id_col).over(w)
    )

    if benchmark is not None:
        flags = decontaminate(
            base, benchmark, n=cfg.decontam_n, id_col=id_col,
            text_col="text", bench_text_col=bench_text_col,
            broadcast_max_grams=cfg.broadcast_max_grams,
            kernel=cfg.decontam_kernel, metrics=metrics,
        ).select(id_col, "contaminated")
        out = out.join(flags, id_col)
    else:
        out = out.withColumn("contaminated", F.lit(False))

    gate = (
        F.col("lang").isin(*cfg.languages)
        & (F.col("quality") >= F.lit(cfg.min_quality))
        & ~F.col("is_duplicate")
        & ~F.col("contaminated")
    )

    model_cols, funnel_extra = [], []
    if cfg.model_n_buckets > 0:
        from entitylinking_spark.operators.classify import (
            hashed_weights, score_documents,
        )

        w = hashed_weights(docs.sparkSession, cfg.model_n_buckets,
                           seed=cfg.model_seed)
        scores = score_documents(
            out.select(id_col, "text"), w, cfg.model_n_buckets,
            id_col=id_col, threshold=cfg.model_threshold,
        ).select(
            id_col, F.col("score").alias("model_score"),
            F.col("label").alias("model_pass"),
        )
        out = out.join(scores, id_col)
        gate = gate & F.col("model_pass")
        model_cols = ["model_score", "model_pass"]
        funnel_extra.append(
            F.sum((~F.col("model_pass")).cast("long")).alias("model_rejected")
        )

    url_cols = []
    if url_blocklist is not None:
        from entitylinking_spark.operators.cleaning import (
            filter_blocked_domains,
        )

        flags = filter_blocked_domains(
            docs.select(id_col, url_col), url_blocklist,
            url_col=url_col, id_col=id_col,
        ).select(id_col, "url_blocked")
        out = out.join(flags, id_col)
        gate = gate & ~F.col("url_blocked")
        url_cols = ["url_blocked"]
        funnel_extra.append(
            F.sum(F.col("url_blocked").cast("long")).alias("url_blocked")
        )

    lm_cols = []
    if lm is not None:
        from entitylinking_spark.operators.lm import ngram_lm_score

        ppl = ngram_lm_score(
            out.select(id_col, "text"), lm, id_col=id_col
        ).select(id_col, F.col("perplexity").alias("lm_ppl"))
        out = out.join(ppl, id_col)
        lm_pass = F.col("lm_ppl").isNotNull() & (
            F.col("lm_ppl") <= F.lit(cfg.max_perplexity)
        )
        gate = gate & lm_pass
        lm_cols = ["lm_ppl"]
        funnel_extra.append(
            F.sum((~lm_pass).cast("long")).alias("lm_rejected")
        )

    cap_cols = []
    if cfg.domain_cap is not None:
        from entitylinking_spark.operators.mixing import cap_per_domain

        # rank only the docs that pass every other gate: a doc dropped by
        # an earlier stage must not consume one of its domain's slots
        eligible = out.withColumn("_gate", gate).filter(F.col("_gate"))
        capped = cap_per_domain(
            eligible.join(docs.select(id_col, cfg.domain_col), id_col),
            cap=cfg.domain_cap, domain_col=cfg.domain_col, id_col=id_col,
            seed=cfg.cap_seed, n_buckets=cfg.cap_buckets,
        ).select(
            id_col, F.col("keep").alias("cap_keep"),
            F.col("rank_in_domain").alias("cap_rank"),
        )
        out = out.join(capped, id_col, "left").withColumn(
            "cap_keep", F.coalesce("cap_keep", F.lit(False))
        ).withColumn("cap_rank", F.coalesce("cap_rank", F.lit(-1)))
        gate = gate & F.col("cap_keep")
        cap_cols = ["cap_keep", "cap_rank"]
        funnel_extra.append(
            F.sum((~F.col("cap_keep")).cast("long")).alias("cap_rejected")
        )

    out = out.select(
        id_col, "text", "lang", "quality", "is_duplicate", "contaminated",
        "split", *model_cols, *url_cols, *lm_cols, *cap_cols,
        gate.alias("keep"),
    )

    if metrics is not None:
        funnel = out.agg(
            F.count("*").alias("docs"),
            F.sum((~F.col("lang").isin(*cfg.languages)).cast("long")).alias("lang_rejected"),
            F.sum((F.col("quality") < cfg.min_quality).cast("long")).alias("low_quality"),
            F.sum(F.col("is_duplicate").cast("long")).alias("duplicates"),
            F.sum(F.col("contaminated").cast("long")).alias("contaminated"),
            *funnel_extra,
            F.sum(F.col("keep").cast("long")).alias("kept"),
        ).first()
        metrics.record("curation_funnel", **funnel.asDict())

    return out
