"""Deduplication operators for large-scale training-data pipelines.

Five strategies over a document corpus (doc_id, text), each returning a
DataFrame of (doc_id, keep/cluster info) or duplicate pairs:

  exact          hash-groupBy on sha256 (the pipeline's fast path)
  minhash_lsh    shingle -> MinHash -> band -> bucket self-join (full ER path)
  simhash        64-bit fingerprint, hamming <= radius within buckets
  ngram_jaccard  exact token n-gram Jaccard within cheap blocks
  embedding      cosine near-dup over an embedding column

The blocking/threshold mechanics intentionally reuse the ER operators —
dedup IS entity resolution where the entity is "the document".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from entitylinking_spark.functions.hashing import (
    band_keys,
    hamming_distance64,
    make_minhash_udf,
    make_simhash_udf,
    minhash_similarity,
)
from entitylinking_spark.operators.blocking import ERConfig
from entitylinking_spark.operators.cc import connected_components
from entitylinking_spark.operators.pairs import candidate_pairs


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the min-id representative per identical content.

    Returns (doc_id, rep_id, is_duplicate). Pure hash-groupBy — one shuffle,
    map-side partial aggregation, no pair explosion; safe at any scale.
    """
    hashed = docs.select(
        F.col(id_col), F.sha2(F.col(text_col).cast("string"), 256).alias("_h")
    )
    reps = hashed.groupBy("_h").agg(F.min(id_col).alias("rep_id"))
    return (
        hashed.join(reps, "_h")
        .select(
            F.col(id_col),
            "rep_id",
            (F.col(id_col) != F.col("rep_id")).alias("is_duplicate"),
        )
    )


def dedup_minhash_lsh(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      threshold: float = 0.7, num_perm: int = 64,
                      num_bands: int = 16, block_cap: int = 500) -> DataFrame:
    """Near-dup via MinHash/LSH: returns (doc_id, cluster_id) where near-dup
    docs share a transitive cluster (min member id)."""
    cfg = ERConfig(num_perm=num_perm, num_bands=num_bands,
                   rows_per_band=num_perm // num_bands, block_cap=block_cap,
                   tau=threshold)
    mh = make_minhash_udf(num_perm)
    # persist + materialize: the plan references this frame in several
    # branches (bands l/r, census, sig joins); unpersisted, Catalyst
    # duplicates the ArrowEvalPython node ~8x (seen in .explain)
    keyed = docs.select(
        F.col(id_col).cast("string").alias("row_id"), F.col(text_col).alias("text")
    ).withColumn("minhash", mh("text")).persist()
    keyed.count()
    blocks = keyed.select(
        "row_id",
        F.explode(
            F.transform(
                band_keys("minhash", cfg.num_bands, cfg.rows_per_band),
                lambda e: F.concat_ws(":", e["band"].cast("string"), e["key"].cast("string")),
            )
        ).alias("block_key"),
    )
    pairs = candidate_pairs(blocks, cfg)
    sl = keyed.select(F.col("row_id").alias("id_l"), F.col("minhash").alias("sig_l"))
    sr = keyed.select(F.col("row_id").alias("id_r"), F.col("minhash").alias("sig_r"))
    scored = (
        pairs.join(sl, "id_l").join(sr, "id_r")
        .withColumn("sim", minhash_similarity("sig_l", "sig_r"))
    )
    edges = scored.filter(F.col("sim") >= threshold).select(
        F.col("id_l").alias("src"), F.col("id_r").alias("dst")
    )
    return connected_components(edges, all_ids=keyed.select("row_id")).select(
        F.col("row_id").alias(id_col), F.col("cluster_id")
    )


def dedup_simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  radius: int = 3) -> DataFrame:
    """SimHash near-dup: pairs within hamming<=radius, then transitive
    clusters. Blocking splits the 64-bit fingerprint into radius+1 segments:
    by pigeonhole, any pair within `radius` agrees exactly on at least one
    segment, so the segment equi-join has guaranteed recall."""
    n_seg = min(radius + 1, 16)
    widths = [64 // n_seg + (1 if i < 64 % n_seg else 0) for i in range(n_seg)]
    offsets = [sum(widths[:i]) for i in range(n_seg)]
    sh = make_simhash_udf()
    keyed = docs.select(
        F.col(id_col).cast("string").alias("row_id"), F.col(text_col).alias("text")
    ).withColumn("fp", sh("text")).persist()
    keyed.count()
    segments = [
        F.concat_ws(
            ":",
            F.lit(i),
            # logical shift via shiftrightunsigned, mask to segment width
            F.shiftrightunsigned("fp", offsets[i])
            .bitwiseAND(F.lit((1 << widths[i]) - 1))
            .cast("string"),
        ).alias("block_key")
        for i in range(n_seg)
    ]
    blocks = keyed.select("row_id", F.explode(F.array(*segments)).alias("block_key"))
    pairs = candidate_pairs(blocks, ERConfig(block_cap=500))
    fl = keyed.select(F.col("row_id").alias("id_l"), F.col("fp").alias("fp_l"))
    fr = keyed.select(F.col("row_id").alias("id_r"), F.col("fp").alias("fp_r"))
    edges = (
        pairs.join(fl, "id_l").join(fr, "id_r")
        .filter(hamming_distance64("fp_l", "fp_r") <= radius)
        .select(F.col("id_l").alias("src"), F.col("id_r").alias("dst"))
    )
    return connected_components(edges, all_ids=keyed.select("row_id")).select(
        F.col("row_id").alias(id_col), F.col("cluster_id")
    )


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        block_cols: list[str] | None = None, n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact token n-gram Jaccard duplicate pairs within cheap blocks.

    Fully JVM-native (token n-grams via slice/transform, array_intersect /
    array_union) — the exact-verification counterpart of MinHash. Block on
    `block_cols` (e.g. lang) to bound the self-join; at scale use
    dedup_minhash_lsh to generate candidates and this for verification.
    """
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), r"[^\w]+"), "")
    grams = F.when(F.size(toks) >= n,
                   F.array_distinct(F.transform(
                       F.sequence(F.lit(0), F.size(toks) - n),
                       lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
                   ))).otherwise(F.array_distinct(toks))
    d = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        *[F.col(c) for c in (block_cols or [])],
        grams.alias("grams"),
    )
    join_cond = [F.col(f"l.{c}") == F.col(f"r.{c}") for c in (block_cols or [])]
    l, r = d.alias("l"), d.alias("r")
    pairs = l.join(r, join_cond if join_cond else None).filter(
        F.col("l.doc_id") < F.col("r.doc_id")
    )
    inter = F.size(F.array_intersect(F.col("l.grams"), F.col("r.grams"))).cast("double")
    union = F.size(F.array_union(F.col("l.grams"), F.col("r.grams"))).cast("double")
    return (
        pairs.select(
            F.col("l.doc_id").alias("id_l"),
            F.col("r.doc_id").alias("id_r"),
            F.when(union == 0, F.lit(1.0)).otherwise(inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_near_dup_pairs(embeddings: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold: float = 0.95,
                             n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed by random-hyperplane
    sign bits so the self-join never goes all-pairs (see similarity.py)."""
    from entitylinking_spark.operators.similarity import cosine_sim, hyperplane_bucket

    d = embeddings.select(
        F.col(id_col).cast("string").alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("bucket", hyperplane_bucket(F.col("vec"), n_planes))
    l, r = d.alias("l"), d.alias("r")
    return (
        l.join(r, F.col("l.bucket") == F.col("r.bucket"))
        .filter(F.col("l.vid") < F.col("r.vid"))
        .select(
            F.col("l.vid").alias("id_l"),
            F.col("r.vid").alias("id_r"),
            cosine_sim(F.col("l.vec"), F.col("r.vec")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
