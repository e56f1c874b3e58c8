"""Blocking-key derivation: the candidate-generation stage.

Reference analogue: the mention->entity candidate indexes (name match
/root/reference/Sparkle/database.py:185-197, embedding top-k
/root/reference/Sparkle/database.py:165-183, BM25
/root/reference/e2e/entity_database.py:326-372, precomputed tf-idf lists
/root/reference/OneNet/data_process.py:50-54). All of them exist to avoid
comparing every mention with every entity; here that becomes deterministic
block keys (SURVEY.md §2.3 J7):

  * ``sha:<content_sha>``       exact-duplicate fast path
  * ``path:<lang>:<stem>``      normalized file-name stem (name-match index)
  * ``mh:<lang>:<band>:<hash>`` MinHash/LSH band keys (ANN index)

One narrow projection + one Arrow pass computes everything; band keys are
derived JVM-side from the signature (functions/hashing.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from entitylinking_spark.functions.hashing import band_keys, make_minhash_udf
from entitylinking_spark.functions.strings import tokenize


@dataclass(frozen=True)
class ERConfig:
    """Tunables for the blocking -> scoring -> clustering pipeline."""

    num_perm: int = 64
    num_bands: int = 16
    rows_per_band: int = 4
    # skew handling (operators/pairs.py)
    block_cap: int = 200          # max rows of a block joined un-salted
    # Stop-band suppression: a block bigger than this is boilerplate (a
    # band shared by a large slice of the corpus — license headers, shared
    # templates) and is dropped, counted in metrics. True near-dup pairs
    # collide in ~b*J^r other bands and in the path/sha channels, so recall
    # survives; without this, one stop band costs O(size^2) comparisons
    # that score below tau anyway (measured: 2058-row band -> 2.1M of 3.2M
    # comparisons on the 5k-doc bench, 0 extra matches).
    skip_block_threshold: int = 2_000
    # scoring (operators/scoring.py)
    tau: float = 0.60             # match threshold on blended score
    w_name: float = 0.15
    w_content: float = 0.85
    verify_jaccard: bool = True   # exact token-Jaccard on survivors of a prescreen
    # gram size for the exact verification space: 1 = distinct tokens (the
    # round-1 behavior), 3 = token trigrams — the same space the MinHash
    # shingles (shingle_k=3) estimate, which makes the prescreen estimate
    # and the verified value commensurable
    verify_ngram: int = 1
    prescreen_margin: float = 0.15
    extra: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.num_bands * self.rows_per_band > self.num_perm:
            raise ValueError("num_bands*rows_per_band must be <= num_perm")


def with_keys(repo_files: DataFrame, cfg: ERConfig = ERConfig(),
              id_col: str | None = None) -> DataFrame:
    """repo_files -> keyed rows (row_id, content_sha, fname, tokens, minhash).

    `content_sha` is the per-row invariant (BASELINE.json input_hint): it is
    computed ONCE here from the raw content and carried untouched through
    every later stage.
    """
    minhash = make_minhash_udf(cfg.num_perm)
    df = repo_files
    if id_col is not None:
        df = df.withColumn("row_id", F.col(id_col).cast("string"))
    elif "row_id" not in df.columns:
        # stable natural key: (repo, path, commit) uniquely identifies a file
        df = df.withColumn(
            "row_id", F.concat_ws("@", F.col("repo"), F.col("path"), F.col("commit"))
        )
    return (
        df.withColumn("content_sha", F.sha2(F.col("content"), 256))
        .withColumn("fname", F.element_at(F.split(F.col("path"), "/"), -1))
        .withColumn("minhash", minhash(F.col("content")))
    )


def path_stem(col) -> F.Column:
    """Normalized file-name stem: lowercase, extension off, version suffixes off.

    Catches renamed near-duplicates the LSH bands might miss — the Spark
    equivalent of the reference's name-match candidate channel
    (/root/reference/Sparkle/database.py:185-197).
    """
    stem = F.lower(col)
    stem = F.regexp_replace(stem, r"\.[a-z0-9]+$", "")       # extension
    stem = F.regexp_replace(stem, r"(_v?\d+)+$", "")         # version suffixes
    return stem


def block_candidates(keyed: DataFrame, cfg: ERConfig = ERConfig()) -> DataFrame:
    """keyed rows -> exploded (block_key, row_id) pairs.

    Exact duplicates are NOT blocked here — they take the sha fast path in
    the pipeline (group-by content_sha), so near-dup blocking only ever sees
    one representative per distinct content (massive pair-count reduction on
    corpora with heavy exact duplication).
    """
    mh_keys = F.transform(
        band_keys("minhash", cfg.num_bands, cfg.rows_per_band),
        lambda e: F.concat_ws(
            ":", F.lit("mh"), F.col("lang"), e["band"].cast("string"), e["key"].cast("string")
        ),
    )
    name_key = F.concat_ws(":", F.lit("path"), F.col("lang"), path_stem(F.col("fname")))
    all_keys = F.array_union(mh_keys, F.array(name_key))
    return (
        keyed.select("row_id", F.explode(all_keys).alias("block_key"))
    )


def block_census(blocks: DataFrame) -> DataFrame:
    """Block sizes — drives skew splitting and the metrics/lineage report."""
    return blocks.groupBy("block_key").agg(F.count("*").alias("block_size"))
