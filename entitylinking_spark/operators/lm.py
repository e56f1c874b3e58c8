"""N-gram language-model perplexity scoring — the CCNet quality filter.

Wenzek et al. 2020 ("CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data") filters a crawl by the perplexity of a language
model trained on a clean reference corpus (they use KenLM over
Wikipedia). This is the same shape at Spark scale with an add-k-smoothed
count model instead of modified-Kneser-Ney (the smoothing is documented,
swappable, and — unlike KenLM's — exactly recomputable by the DuckDB
oracle):

  ngram_lm_fit    ONE scan of the REFERENCE corpus (clean, small next to
                  the crawl): n-gram counts, (n-1)-gram context counts,
                  and the vocabulary size V — three map-side-combined
                  aggregations over one explode.
  ngram_lm_score  score the CRAWL: per document, mean log-probability
                  of its n-grams under  p(w|ctx) = (c(gram)+k) /
                  (c(ctx)+k·V)  and perplexity exp(-mean). Both count
                  joins BROADCAST (the model is reference-sized); the
                  only shuffle is the slim per-doc aggregation — the
                  crawl's text never moves.

Unseen grams back off to the same formula with c=0, so every document
gets a finite score (k>0). Documents with fewer than n tokens score
NULL with n_grams=0 — a data property the caller gates on, not an error.

Reference analogue: the reference scores candidates with pretrained LLM
clients (/root/reference/e2e/systems/llm_system.py); a training-data
engine needs the self-contained statistical form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from entitylinking_spark.functions.strings import tokenize

_SEP = "\x1f"  # gram-part joiner; cannot occur in [^\w]-split tokens


class NgramLM:
    """Handle returned by ngram_lm_fit: the two count frames + scalars."""

    def __init__(self, grams: DataFrame, contexts: DataFrame,
                 vocab_size: int, n: int, k: float, n_grams: int = 0):
        self.grams = grams          # (gram, c_gram)
        self.contexts = contexts    # (ctx, c_ctx)
        self.vocab_size = vocab_size
        self.n = n
        self.k = k
        self.n_grams = n_grams      # distinct gram count (broadcast sizing)


def _gram_cols(text_col: str, n: int):
    """(gram, ctx) exploded column pair via the arrays_zip-of-slices
    idiom (whole-stage codegen, no interpreted transform lambda)."""
    toks = tokenize(text_col)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    parts = [F.slice(toks, i + 1, m) for i in range(n)]
    return toks, F.arrays_zip(*parts), m


def ngram_lm_fit(ref_docs: DataFrame, n: int = 3, k: float = 1.0,
                 text_col: str = "text") -> NgramLM:
    """Count model over the reference corpus. One corpus scan feeds the
    gram agg; contexts re-aggregate FROM the gram counts (an (n-1)-gram
    occurs exactly as often as its n-gram completions plus a per-doc
    tail term — we use the standard conditional-estimate convention
    c(ctx) = sum over completions, so probabilities sum to 1 over the
    vocabulary per context)."""
    if n < 2:
        raise ValueError("n must be >= 2 (unigrams have no context)")
    if k <= 0:
        raise ValueError("k must be > 0 (unsmoothed zeros make ln(-inf))")
    toks, zipped, m = _gram_cols(text_col, n)
    g = (
        ref_docs.select(F.explode(zipped).alias("p"))
        .select(
            F.concat_ws(_SEP, *[F.col(f"p.{i}") for i in range(n)])
            .alias("gram")
        )
        .groupBy("gram")
        .agg(F.count("*").alias("c_gram"))
        .localCheckpoint(eager=True)
    )
    ctx = (
        g.select(
            F.expr(f"substring_index(gram, '{_SEP}', {n - 1})").alias("ctx"),
            "c_gram",
        )
        .groupBy("ctx")
        .agg(F.sum("c_gram").alias("c_ctx"))
        .localCheckpoint(eager=True)
    )
    v = (
        ref_docs.select(F.explode(tokenize(text_col)).alias("t"))
        .agg(F.countDistinct("t"))
        .first()[0]
    )
    if not v:
        raise ValueError(
            "reference corpus has no tokens — cannot fit an LM (V=0 would "
            "divide by zero in the smoothed estimate)"
        )
    return NgramLM(g, ctx, int(v), n, k, n_grams=g.count())


def ngram_lm_score(docs: DataFrame, lm: NgramLM,
                   id_col: str = "doc_id",
                   text_col: str = "text",
                   broadcast_max_grams: int = 20_000_000) -> DataFrame:
    """(id, n_grams, n_hits, avg_logp, perplexity) per document under the
    fitted model. Count joins BROADCAST while the model has at most
    `broadcast_max_grams` distinct grams (~8B hash + string + count ≈
    50 B/row ⇒ ~1 GB at the default cap); a larger model (a 10^9-gram
    Wikipedia-scale reference) falls back to plain shuffle joins on the
    gram/ctx keys — correct, at the cost of shuffling the crawl's gram
    stream (the decontam broadcast_max_grams trade)."""
    n, k, v = lm.n, lm.k, lm.vocab_size
    fits = lm.n_grams <= broadcast_max_grams
    side = F.broadcast if fits else (lambda df: df)
    toks, zipped, m = _gram_cols(text_col, n)
    exploded = docs.select(
        F.col(id_col),
        F.explode_outer(zipped).alias("p"),
    ).select(
        id_col,
        F.when(
            F.col("p").isNotNull(),
            F.concat_ws(_SEP, *[F.col(f"p.{i}") for i in range(n)]),
        ).alias("gram"),
    ).withColumn(
        "ctx", F.expr(f"substring_index(gram, '{_SEP}', {n - 1})")
    )
    scored = (
        exploded
        .join(side(lm.grams), "gram", "left")
        .join(side(lm.contexts), "ctx", "left")
        .select(
            id_col,
            F.col("gram").isNotNull().alias("has_gram"),
            (F.col("c_gram").isNotNull() & F.col("gram").isNotNull())
            .alias("hit"),
            F.when(
                F.col("gram").isNotNull(),
                F.log(
                    (F.coalesce(F.col("c_gram"), F.lit(0)) + F.lit(k))
                    / (F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(k * v))
                ),
            ).alias("logp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.sum(F.col("has_gram").cast("long")).alias("n_grams"),
        F.sum(F.col("hit").cast("long")).alias("n_hits"),
        F.avg("logp").alias("avg_logp"),
    )
    return agg.select(
        id_col, "n_grams", "n_hits", "avg_logp",
        F.exp(-F.col("avg_logp")).alias("perplexity"),
    )
