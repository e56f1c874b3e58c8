"""Relational (cross-engine checkable) hash kernels.

The Arrow sketch kernels in functions/hashing.py use pandas' siphash —
fast, but not reproducible outside this process family, so the driver's
DuckDB oracle cannot recompute them. These variants derive every hash from
md5 (identical in Spark and DuckDB) and express the whole computation as
relational operators, which makes SimHash dedup and winnowing
fingerprints *value-checkable* end to end at small scale.

They are the verification twins, not the scale path: the Arrow kernels in
hashing.py / textstats.py do the same job in one pass per document and are
what the pipeline uses. Reference analogues: SimHash stands in for the
embedding near-dup channel (/root/reference/Sparkle/database.py:165-183);
the winnowing fingerprint for document identity tracking
(/root/reference/OneNet/data_process.py:486-509 reads stable doc ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from entitylinking_spark.functions.strings import tokenize

SIMHASH_BITS = 60  # 15 hex chars of md5 -> always fits a signed 64-bit long


def md5_hash60(col: str | Column) -> Column:
    """First 60 bits of md5 as a non-negative long.

    DuckDB twin:
        list_sum(list_transform(range(15), i ->
          (strpos('0123456789abcdef', substr(md5(x), i+1, 1)) - 1)
          * (1::BIGINT << (4*(14-i)))))
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def simhash_relational(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, text) -> (id, fp): 60-bit SimHash over DISTINCT tokens.

    Pure relational plan: explode distinct tokens -> md5-based token hash ->
    one groupBy with 60 conditional-sum vote columns -> sign bits packed
    into a long. Whole-stage codegen end to end; the shuffle key is the
    document id, so skew equals document count per partition (uniform).
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokenize(text_col))).alias("tok"),
    ).withColumn("th", md5_hash60("tok"))
    votes = toks.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("th", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_b{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fp = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"_b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    out = votes.select(F.col("_id").alias(id_col), fp.alias("fp"))
    # token-less documents never reach the explode; give them fp=0
    return (
        docs.select(F.col(id_col))
        .join(out, id_col, "left")
        .withColumn("fp", F.coalesce(F.col("fp"), F.lit(0).cast("long")))
    )


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        window: int = 4) -> DataFrame:
    """Winnowing fingerprint (Schleimer et al., SIGMOD'03) as relational ops.

    token n-grams in order -> md5-based gram hash -> min per sliding window
    of `window` grams (a frame window function) -> distinct retained minima,
    sorted, joined into one string per document. Documents with fewer grams
    than `window` keep the min of what they have; empty documents get ''.
    """
    # token array bound once as a lambda variable (see strings.ngram_set:
    # inlining the tokenize expression into the per-position lambda
    # re-splits the document for every gram position — O(len^2) per row)
    def _build_grams(toks):
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(
            F.filter(F.array(F.array_join(toks, " ")), lambda s: F.length(s) > 0)
        )

    grams = F.element_at(F.transform(F.array(tokenize(text_col)), _build_grams), 1)
    g = (
        docs.select(F.col(id_col).alias("_id"), grams.alias("_grams"))
        .select("_id", F.size("_grams").alias("_n"), F.posexplode("_grams").alias("pos", "gram"))
        .withColumn("gh", md5_hash60("gram"))
    )
    w = Window.partitionBy("_id").orderBy("pos").rowsBetween(0, window - 1)
    picked = (
        g.withColumn("win_min", F.min("gh").over(w))
        .filter(F.col("pos") <= F.greatest(F.col("_n") - window, F.lit(0)))
    )
    fps = picked.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_set("win_min")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("fingerprint")
    )
    return (
        docs.select(F.col(id_col))
        .join(fps.select(F.col("_id").alias(id_col), "fingerprint"), id_col, "left")
        .withColumn("fingerprint", F.coalesce(F.col("fingerprint"), F.lit("")))
    )
