"""Sources & sinks (SURVEY.md §2.1).

The reference streams JSONL line-by-line into dicts (S1/S2 —
/root/reference/Sparkle/database.py:29-78, Sparkle/linking.py:41-47),
hand-splits files round-robin across GPUs (S9 —
/root/reference/OneNet/data_process.py:75-85) and re-merges with first-seen
dedupe (S10 — :90-102). Spark owns all of that; these helpers pin the
schemas and reproduce the *semantics* (dedupe order, caps, fallbacks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from entitylinking_spark import schemas
from entitylinking_spark.operators.ranking import first_seen_dedupe


def read_mentions(spark: SparkSession, path: str) -> DataFrame:
    """S2: mentions JSONL with the explicit zeshel-style schema."""
    return spark.read.schema(schemas.MENTIONS).json(path)


def read_entities(spark: SparkSession, path: str, max_documents: int | None = None) -> DataFrame:
    """S1: entity/document JSONL; optional cap = the reference's
    max_documents scan limit (limit pushdown does the work)."""
    df = spark.read.schema(schemas.ENTITIES).json(path)
    return df.limit(max_documents) if max_documents else df


def _claims_related_col(raw: DataFrame) -> F.Column:
    """Related entity ids from nested `claims` — the path the reference
    walks per claim (mainsnak.datavalue.value.id,
    /root/reference/e2e/evaluation/entities/scripts/wikientities.py:27-38).

    The inferred claims schema is a struct with one field per property;
    only properties whose datavalue.value is an entity reference (has an
    `id`) contribute — string/quantity datavalues are skipped, matching the
    reference's isinstance(value, dict) guard."""
    from pyspark.sql import types as T

    null = F.lit(None).cast("array<string>")
    if "claims" not in raw.columns:
        return null
    ct = raw.schema["claims"].dataType
    if not isinstance(ct, T.StructType):
        return null

    def _field(st, name):
        return st[name].dataType if isinstance(st, T.StructType) and name in st.fieldNames() else None

    arrs = []
    for f in ct.fields:
        ft = f.dataType
        if not (isinstance(ft, T.ArrayType) and isinstance(ft.elementType, T.StructType)):
            continue
        ms = _field(ft.elementType, "mainsnak")
        dv = _field(ms, "datavalue") if ms is not None else None
        vv = _field(dv, "value") if dv is not None else None
        if vv is not None and _field(vv, "id") is not None:
            arrs.append(
                F.transform(
                    F.col(f"claims.`{f.name}`"),
                    lambda c: c["mainsnak"]["datavalue"]["value"]["id"],
                )
            )
    if not arrs:
        return null
    flat = F.flatten(F.array(*[F.coalesce(a, F.array()) for a in arrs]))
    return F.array_sort(F.array_distinct(F.filter(flat, lambda x: x.isNotNull())))


def read_wikidata_entities(spark: SparkSession, path: str, lang: str = "en") -> DataFrame:
    """S3: one-JSON-file-per-entity dirs; extract per-language label /
    description / aliases from the nested maps
    (/root/reference/e2e/entity_database.py:152-212) and the related-entity
    ids from `claims` (wikientities.py:27-38) as `claims_related` — the
    relational seed of the reference's BFS entity expansion."""
    raw = spark.read.option("multiLine", True).json(path)
    get = lambda field: F.col(f"{field}.{lang}.value")  # noqa: E731
    cols = [F.col("id").alias("entity_id")]
    cols.append((get("labels") if "labels" in raw.columns else F.lit(None)).alias("label"))
    cols.append(
        (get("descriptions") if "descriptions" in raw.columns else F.lit(None)).alias("description")
    )
    if "aliases" in raw.columns:
        cols.append(
            F.transform(F.col(f"aliases.{lang}"), lambda a: a["value"]).alias("aliases")
        )
    else:
        cols.append(F.lit(None).cast("array<string>").alias("aliases"))
    cols.append(_claims_related_col(raw).alias("claims_related"))
    return raw.select(*cols)


def read_json_array_or_lines(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S4: the reference's fallback parse (JSON array, else JSONL —
    /root/reference/Sparkle/ner.py:39-56). Disambiguated by peeking at the
    first non-whitespace character: '[' -> whole-file JSON array
    (multiLine), anything else -> line mode. (Trying multiLine blindly is
    wrong: on a JSONL file it silently parses only the first value.)"""
    head = spark.read.text(path).limit(1).collect()
    is_array = bool(head) and head[0]["value"].lstrip().startswith("[")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if is_array:
        return reader.option("multiLine", True).json(path)
    return reader.json(path)


def shard(df: DataFrame, n: int) -> DataFrame:
    """S9: the i%N round-robin file splitter is just a repartition."""
    return df.repartition(n)


def merge_shards_first_seen(
    spark: SparkSession, paths: list[str], key: str = "mention_id", schema=None
) -> DataFrame:
    """S10: concatenate shards, keep the first occurrence per key in shard
    order (the reference's seen_ids set). Multi-path read is the union;
    the order guarantee comes from an explicit arrival rank, NOT
    dropDuplicates (which keeps an arbitrary row)."""
    dfs = []
    for i, p in enumerate(paths):
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        dfs.append(reader.json(p).withColumn("_shard", F.lit(i)))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    out = out.withColumn("_arrival", F.monotonically_increasing_id())
    deduped = first_seen_dedupe(
        out.withColumn("_order", F.struct("_shard", "_arrival")), key, "_order"
    )
    return deduped.drop("_shard", "_arrival", "_order")


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5: JSONL sink (stage outputs in the reference). Checkpoints in this
    engine are parquet; JSON is for interop exports only."""
    df.write.mode(mode).json(path)
