"""Byte-pair-encoding tokenizer training and application at corpus scale.

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units", ACL) — the merge-table learner behind BPE/GPT-2-style
tokenizers. The reference consumes pretrained tokenizers through its LLM
clients (/root/reference/e2e/systems/llm_system.py); a from-scratch
training-data engine also needs to TRAIN one, which is a corpus-scale
counting problem and therefore a Spark job:

  word_counts   one explode + one map-side-combined groupBy: the corpus
                (any size) collapses to a VOCABULARY-sized (word, n)
                frame — all later iterations touch only this frame
  train_bpe     the classic loop: count adjacent symbol pairs (weighted
                by word frequency), merge the argmax pair, repeat.
                Pair counting is whole-stage codegen (arrays_zip of two
                shifted slices — the bigram_pmi idiom); the merge is one
                Arrow pass over the vocab; the argmax is a 1-row
                TakeOrdered. Per merge: ONE shuffle over the vocab-sized
                frame + one map pass, never a corpus rescan.
  bpe_tokenize  apply learned merges to the corpus: one Arrow map pass,
                zero shuffle; each batch memoizes encodings per DISTINCT
                word (Zipf makes the hit rate high), greedy lowest-rank
                merge order exactly as HF/GPT-2 BPE applies it.

Determinism: the merged pair at every step is (count DESC, pair ASC) —
ties have a total order, so training is reproducible across
partitionings and engines. Symbols carry no end-of-word marker (merges
never cross word boundaries by construction; document-level behavior is
the tokenize() word convention from functions/strings.py).

Scale note (100 TB): the corpus is scanned exactly once (word_counts).
n_merges iterations each shuffle ~|vocab| rows — with localCheckpoint
cadence cutting lineage so iteration k never replays k-1 Arrow kernels.
A 10^9-word web vocabulary at 30k merges is real but embarrassingly
wide work; the driver holds only the 1-row argmax per step.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from entitylinking_spark.functions.strings import tokenize

_CHECKPOINT_EVERY = 8  # merges between lineage cuts


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) frequency table — the corpus's only full scan."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol pair counts over (word, n, syms)."""
    k = F.greatest(F.size("syms") - 1, F.lit(0))
    return (
        words.select(
            "n",
            F.explode(F.arrays_zip(F.slice("syms", 1, k),
                                   F.slice("syms", 2, k))).alias("p"),
        )
        .groupBy(F.col("p.0").alias("a"), F.col("p.1").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def _make_merge_udf(a: str, b: str):
    """Arrow pass replacing every left-to-right adjacent (a, b) with a+b."""
    ab = a + b

    @F.pandas_udf("array<string>")
    def merge(syms: pd.Series) -> pd.Series:
        out = []
        for s in syms:
            s = list(s)
            r, i, n = [], 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    r.append(ab)
                    i += 2
                else:
                    r.append(s[i])
                    i += 1
            out.append(r)
        return pd.Series(out)

    return merge


def train_bpe(docs: DataFrame, n_merges: int, min_count: int = 2,
              text_col: str = "text") -> list[tuple[str, str]]:
    """Learn up to `n_merges` BPE merges; stops early when the best pair
    falls under `min_count`. Returns merges in rank order."""
    if n_merges < 0 or min_count < 1:
        raise ValueError("n_merges must be >= 0 and min_count >= 1")
    cur = (
        word_counts(docs, text_col)
        .select("word", "n", F.split("word", "(?!$)").alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        cur = cur.select("word", "n", _make_merge_udf(a, b)("syms").alias("syms"))
        # cut lineage so iteration k never replays k-1 Arrow kernels; the
        # off-cadence iterations are materialized anyway by the argmax
        if (step + 1) % _CHECKPOINT_EVERY == 0:
            cur = cur.localCheckpoint(eager=True)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application — the HF/GPT-2 encode
    loop. Pure python on ONE word; the corpus path wraps it in an Arrow
    batch with per-batch memoization (bpe_tokenize)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize(docs: DataFrame, merges: list[tuple[str, str]],
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, bpe_tokens, n_bpe_tokens) — one Arrow map pass, no shuffle.

    Merges are closed over (broadcast implicitly with the serialized UDF:
    a 30k-merge table is ~1 MB). Word encodings are memoized per batch —
    under a Zipfian corpus most words repeat, so the greedy loop runs
    roughly once per DISTINCT word per batch."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks = []
            for w in _py_tokenize(t or ""):
                e = cache.get(w)
                if e is None:
                    e = encode_word(w, ranks)
                    cache[w] = e
                toks.extend(e)
            out.append(toks)
        return pd.Series(out)

    return docs.select(
        F.col(id_col),
        enc(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens"))


def _py_tokenize(text: str) -> list[str]:
    """Python twin of functions.strings.tokenize (lower + [^\\w]+ split,
    drop empties) so the Arrow path segments words identically to the
    relational one (parity-tested in test_bpe). re.ASCII because Java's
    \\w is ASCII-only while Python's is unicode-aware by default —
    without it the two paths split non-ASCII words differently."""
    import re

    return [w for w in re.split(r"[^\w]+", text.lower(), flags=re.ASCII) if w]
