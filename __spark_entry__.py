"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship ER pipeline over sf0.001 (repo_files shaped from
                 the documents table) -> cluster assignments.
queries()      — one entry per implemented operator family from SURVEY.md §2
                 (+ the training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent SQL for every SQL-expressible query.

Value-parity rules used throughout (Spark vs DuckDB must hash-match):
  * integer-valued sums/counts only, or the cents trick
    (sum of round(x*100) is exact in double; divide once at the end);
  * explicit sum/count instead of avg() so both engines do one division;
  * every float output rounded; every window given a total order;
  * DuckDB SUM(BIGINT) returns HUGEINT -> always CAST to BIGINT in oracles.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ER pipeline (blocking -> salted pairs -> Arrow scoring
    -> large/small-star CC) over repo_files shaped from sf0.001 documents."""
    from entitylinking_spark.operators.blocking import ERConfig
    from entitylinking_spark.plans.pipeline import resolve
    from entitylinking_spark.synthdata import repo_files_from_documents

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    repo_files = repo_files_from_documents(docs)
    res = resolve(repo_files, ERConfig(), id_col="row_id", collect_metrics=False)
    return res.clusters


# ---------------------------------------------------------------------------
# oracle-checked queries (SQL-expressible operators)
# ---------------------------------------------------------------------------


def _duck_round(col, digits: int):
    """DuckDB-matching ROUND for DOUBLE columns: std::round(x*10^d)/10^d.

    Spark's F.round is BigDecimal HALF_UP over the double's EXACT binary
    expansion; DuckDB rounds the FP product x*10^d with std::round. The
    two disagree on ~20% of values whose true rational value IS a 10^-d
    half (e.g. a per-doc ratio c/n with n divisible by 5): the binary
    double sits a hair off the half, BigDecimal honors that side, while
    the FP product rounds back ONTO the half and std::round takes it away
    from zero. doc_repetition/dup_lines went driver-red on exactly this
    class in round 5 (rows+schema green, hash red, bit-exact locally).

    Emulation measured 0/8111 disagreements vs DuckDB 1.0.0 ROUND on a
    dense near-half probe set (incl. the z+0.5-overflow edge where
    floor(z+0.5) differs from std::round): the half test uses z-floor(z),
    which is exact for |z| < 2^52. Values here are small ratios/scores,
    far below that bound. For values away from any half boundary this is
    bit-identical to F.round — every local oracle stays value-exact.
    """
    p = float(10 ** digits)
    x = col.cast("double")
    z = x * F.lit(p)
    zf = F.floor(z).cast("double")
    frac = z - zf
    up = F.when(z >= 0, frac >= 0.5).otherwise(frac > 0.5)
    rounded = F.when(up, zf + 1.0).otherwise(zf) / F.lit(p)
    # NaN/±Inf/huge pass through unchanged (F.round semantics); beyond
    # 2^52 the value is integral anyway, so rounding is the identity
    return F.when(F.isnan(z) | (F.abs(z) > F.lit(4.5e15)), x).otherwise(rounded)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A6-style grouped aggregation (TPC-H Q1 shape) with exact arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.round(F.sum(cents) / 100.0, 2).alias("sum_base_price"),
            F.count("*").alias("count_order"),
            F.round(
                F.sum(F.col("l_quantity").cast("long"))
                / F.count("*"), 6
            ).alias("avg_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0, 2) AS sum_base_price,
       COUNT(*) AS count_order,
       ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)/COUNT(*), 6) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def j1_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 3-way enrichment join: lineitem |> orders |> customer (broadcast
    the small dimension side), aggregated per (mktsegment, orderpriority)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
        .orderBy("c_mktsegment", "o_orderpriority")
    )


J1_SQL = """
SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderpriority
ORDER BY c_mktsegment, o_orderpriority
"""


def j2_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 multi-hop dimension join: orders -> customer -> nation -> region."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(cents) / 100.0, 2).alias("revenue"),
        )
        .orderBy("r_name")
    )


J2_SQL = """
SELECT r_name, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0, 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def f4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: parts appearing in any lineitem (left_semi), counted per brand."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        p.join(li, p["p_partkey"] == li["l_partkey"], "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("p_brand")
    )


F4_SQL = """
SELECT p_brand, COUNT(*) AS n_parts FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
GROUP BY p_brand ORDER BY p_brand
"""


def f5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: customers with no orders (left_anti), re-tagged and unioned with
    a 'has_orders' count row per segment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    no = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .withColumn("bucket", F.lit("no_orders"))
    )
    yes = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .withColumn("bucket", F.lit("has_orders"))
    )
    return no.unionByName(yes).select("c_mktsegment", "bucket", "n").orderBy(
        "c_mktsegment", "bucket"
    )


F5_SQL = """
SELECT c_mktsegment, 'no_orders' AS bucket, COUNT(*) AS n FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) GROUP BY c_mktsegment
UNION ALL
SELECT c_mktsegment, 'has_orders' AS bucket, COUNT(*) AS n FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders) GROUP BY c_mktsegment
ORDER BY c_mktsegment, bucket
"""


def j5_explode_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 list2point/point2list: explode doc tokens, filter, regroup."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"[^\w]+"), lambda t: F.length(t) > 3
    )
    return d.select(
        "doc_id", F.size(F.array_distinct(toks)).alias("n_distinct_long_tokens")
    ).orderBy("doc_id")


J5_SQL = """
SELECT doc_id,
       CAST(len(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                                          t -> len(t) > 3))) AS INT) AS n_distinct_long_tokens
FROM documents ORDER BY doc_id
"""


def t1_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1-T3: deterministic top-3 orders per market segment."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"])
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "o_orderkey", "rnk",
                F.round(F.col("o_totalprice"), 2).alias("price"))
        .orderBy("c_mktsegment", "rnk")
    )


T1_SQL = """
SELECT c_mktsegment, o_orderkey, rnk, price FROM (
  SELECT c_mktsegment, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
         ROUND(o_totalprice, 2) AS price
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rnk <= 3 ORDER BY c_mktsegment, rnk
"""


def t4_tiebreak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 deterministic argmin: first order per customer by
    (orderdate, totalprice, orderkey) — the reference's tie-break order."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_totalprice", "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey")
    )


T4_SQL = """
SELECT o_custkey, o_orderkey FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_totalprice, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1 ORDER BY o_custkey
"""


def t5_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 first-seen dedupe: first event per user by arrival (ts, event_id)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )


T5_SQL = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id
"""


def a3_share_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 per-group accuracy-style ratio with exact int sums."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("value") > 0.5).cast("long")).alias("n_high"),
            _duck_round(F.sum((F.col("value") > 0.5).cast("long")) / F.count("*"), 6).alias("high_share"),
        )
        .orderBy("event_type")
    )


A3_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN value > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       ROUND(CAST(SUM(CASE WHEN value > 0.5 THEN 1 ELSE 0 END) AS BIGINT)/COUNT(*), 6) AS high_share
FROM events GROUP BY event_type ORDER BY event_type
"""


def a5_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 dataset statistics per language (exact aggregates only)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


A5_SQL = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def a6_micro_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 micro P/R/F1 over a deterministic classification derived from
    events: pred = value>0.5, truth = event_type='click'."""
    e = _t(spark, sf_dir, "events")
    d = e.select(
        (F.col("value") > 0.5).alias("pred"), (F.col("event_type") == "click").alias("truth")
    )
    agg = d.agg(
        F.sum((F.col("pred") & F.col("truth")).cast("long")).alias("tp"),
        F.sum((F.col("pred") & ~F.col("truth")).cast("long")).alias("fp"),
        F.sum((~F.col("pred") & F.col("truth")).cast("long")).alias("fn"),
    )
    return agg.select(
        "tp", "fp", "fn",
        _duck_round(F.col("tp") / (F.col("tp") + F.col("fp")), 6).alias("precision"),
        _duck_round(F.col("tp") / (F.col("tp") + F.col("fn")), 6).alias("recall"),
    )


A6_SQL = """
WITH d AS (SELECT value > 0.5 AS pred, event_type = 'click' AS truth FROM events),
agg AS (
  SELECT CAST(SUM(CASE WHEN pred AND truth THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN pred AND NOT truth THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN NOT pred AND truth THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM d)
SELECT tp, fp, fn, ROUND(tp/(tp+fp), 6) AS precision, ROUND(tp/(tp+fn), 6) AS recall
FROM agg
"""


def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 set intersection: event users that are also customers."""
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    return (
        e.select(F.col("user_id").alias("id"))
        .intersect(c.select(F.col("c_custkey").alias("id")))
        .orderBy("id")
    )


U3_SQL = """
SELECT user_id AS id FROM events INTERSECT SELECT c_custkey AS id FROM customer
ORDER BY id
"""


def x2_normalize_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 whitespace normalization, first 60 chars."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), 1, 60).alias("norm_prefix"),
    ).orderBy("doc_id")


X2_SQL = """
SELECT doc_id, substr(regexp_replace(trim(text), '\\s+', ' ', 'g'), 1, 60) AS norm_prefix
FROM documents ORDER BY doc_id
"""


def x5_first_sentence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 first-sentence summary."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(F.substring_index(F.col("text"), ".", 1), F.lit(".")).alias("summary"),
    ).orderBy("doc_id")


X5_SQL = """
SELECT doc_id, split_part(text, '.', 1) || '.' AS summary FROM documents ORDER BY doc_id
"""


def x6_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 lowercase tokenize + count (exact ints)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.array_remove(F.split(F.lower(F.col("text")), r"[^\w]+"), "")
    return d.select("doc_id", F.size(toks).alias("n_tokens")).orderBy("doc_id")


X6_SQL = """
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                            t -> t <> '')) AS INT) AS n_tokens
FROM documents ORDER BY doc_id
"""


def x7_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 bidirectional substring name score over supplier x nation."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    j = s.crossJoin(F.broadcast(n))
    a, b = F.lower(F.col("s_name")), F.lower(F.col("n_name"))
    score = (
        F.when(a == b, F.lit(1.0))
        .when(a.contains(b) | b.contains(a), F.lit(0.7))
        .otherwise(F.lit(0.0))
    )
    return j.select("s_suppkey", "n_nationkey", score.alias("name_score")).orderBy(
        "s_suppkey", "n_nationkey"
    )


X7_SQL = """
SELECT s_suppkey, n_nationkey,
       CASE WHEN lower(s_name) = lower(n_name) THEN 1.0
            WHEN position(lower(n_name) IN lower(s_name)) > 0
              OR position(lower(s_name) IN lower(n_name)) > 0 THEN 0.7
            ELSE 0.0 END AS name_score
FROM supplier CROSS JOIN nation ORDER BY s_suppkey, n_nationkey
"""


def x8_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 term-frequency: occurrences of 'data' per document."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        (F.size(F.split(F.lower(F.col("text")), "data", -1)) - 1).alias("tf_data"),
    ).orderBy("doc_id")


X8_SQL = """
SELECT doc_id, CAST(len(regexp_split_to_array(lower(text), 'data')) - 1 AS INT) AS tf_data
FROM documents ORDER BY doc_id
"""


def x15_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X15 per-group min-max normalization of order totalprice."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    rng = F.max("o_totalprice").over(w) - F.min("o_totalprice").over(w)
    norm = F.when(rng == 0, F.lit(0.0)).otherwise(
        (F.col("o_totalprice") - F.min("o_totalprice").over(w)) / rng
    )
    return o.select(
        "o_orderkey", "o_orderpriority", _duck_round(norm, 6).alias("norm_price")
    ).orderBy("o_orderkey")


X15_SQL = """
SELECT o_orderkey, o_orderpriority,
       ROUND(CASE WHEN mx = mn THEN 0.0 ELSE (o_totalprice - mn) / (mx - mn) END, 6) AS norm_price
FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         MIN(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mn,
         MAX(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mx
  FROM orders
) ORDER BY o_orderkey
"""


def x17_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17 confidence blend: 0.7*normalized price + 0.3*normalized size."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy(F.lit(1))
    price_n = F.col("p_retailprice") / F.max("p_retailprice").over(w)
    size_n = F.col("p_size") / F.max("p_size").over(w)
    return p.select(
        "p_partkey", _duck_round(0.7 * price_n + 0.3 * size_n, 6).alias("blend")
    ).orderBy("p_partkey")


X17_SQL = """
SELECT p_partkey,
       ROUND(0.7 * p_retailprice / MAX(p_retailprice) OVER ()
           + 0.3 * p_size / MAX(p_size) OVER (), 6) AS blend
FROM part ORDER BY p_partkey
"""


def j6_label_in_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6/A13: candidate-set membership — did supplier 1 supply the part?"""
    li = _t(spark, sf_dir, "lineitem")
    cand = li.groupBy("l_partkey").agg(F.collect_set("l_suppkey").alias("supps"))
    return cand.select(
        F.col("l_partkey").alias("partkey"),
        F.array_contains("supps", F.lit(1)).alias("has_supp1"),
        F.size("supps").alias("n_suppliers"),
    ).orderBy("partkey")


J6_SQL = """
SELECT l_partkey AS partkey,
       list_contains(list(DISTINCT l_suppkey), 1) AS has_supp1,
       CAST(len(list(DISTINCT l_suppkey)) AS INT) AS n_suppliers
FROM lineitem GROUP BY l_partkey ORDER BY partkey
"""


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over documents via md5 grouping (rep = min doc_id)."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.col("text")))
    return d.select(
        "doc_id",
        F.min("doc_id").over(w).alias("rep_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_duplicate"),
    ).orderBy("doc_id")


DEDUP_EXACT_SQL = """
SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep_id,
       doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
FROM documents ORDER BY doc_id
"""


def g3_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 transitive closure, oracle-checked: chain edges within each
    embedding label (consecutive vec_ids) -> REAL large/small-star CC; the
    oracle knows the answer is per-label min(vec_id)."""
    from entitylinking_spark.operators.cc import connected_components

    emb = _t(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    chain = emb.select("vec_id", "label", F.lag("vec_id").over(w).alias("prev"))
    # zero-pad ids so lexicographic string order == numeric order
    sid = lambda c: F.format_string("v%08d", F.col(c))  # noqa: E731
    edges = chain.filter(F.col("prev").isNotNull()).select(
        sid("prev").alias("src"), sid("vec_id").alias("dst")
    )
    all_ids = emb.select(sid("vec_id").alias("row_id"))
    return connected_components(edges, all_ids=all_ids).orderBy("row_id")


G3_SQL = """
SELECT printf('v%08d', vec_id) AS row_id,
       printf('v%08d', MIN(vec_id) OVER (PARTITION BY label)) AS cluster_id
FROM embeddings ORDER BY row_id
"""


def lang_id_stopword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic label (string output only — no float compare)."""
    from entitylinking_spark.operators.textstats import detect_language

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", detect_language("text").alias("detected")).orderBy("doc_id")


_SW = "'the','of','and','to','in','a','is','that','it','for','on','as','with','was','be','by','are','this','have','from','or','an','at','not','but','had','his','they','you','which','one','all','were','her','she','there'"

LANG_ID_SQL = f"""
SELECT doc_id,
       CASE WHEN len(list_intersect(list_distinct(list_filter(
                    regexp_split_to_array(lower(text), '[^a-z0-9_]+'), t -> t <> '')),
                  [{_SW}]))
                 >= 0.08 * len(list_distinct(list_filter(
                    regexp_split_to_array(lower(text), '[^a-z0-9_]+'), t -> t <> '')))
            AND len(list_distinct(list_filter(
                    regexp_split_to_array(lower(text), '[^a-z0-9_]+'), t -> t <> ''))) > 0
            THEN 'en' ELSE 'other' END AS detected
FROM documents ORDER BY doc_id
"""


# 60-bit md5-derived hash of a token/gram string (functions/relhash.md5_hash60)
_H60_SQL = (
    "list_sum(list_transform(range(15), i -> "
    "(strpos('0123456789abcdef', substr(md5({x}), i+1, 1)) - 1)"
    " * (1::BIGINT << (4*(14-i)))))"
)


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline quality scoring (textstats.quality_score): blended
    length / stopword / punctuation heuristic, recomputed exactly by
    DuckDB (token parity proven by x6; stopword parity by lang_id)."""
    from entitylinking_spark.operators.textstats import quality_score

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", _duck_round(quality_score("text"), 4).alias("quality_r")
    ).orderBy("doc_id")


_TOKS_SQL = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), "
             "t -> t <> '')")

DOC_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len({_TOKS_SQL}) AS ntok,
         len(list_distinct({_TOKS_SQL})) AS ndis,
         len(list_intersect(list_distinct({_TOKS_SQL}), [{_SW}])) AS hits,
         length(text) AS nchar,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS npunct
  FROM documents
)
SELECT doc_id,
       ROUND(
         0.4 * least(CAST(ntok AS DOUBLE) / 200.0, 1.0)
       + 0.3 * least((CASE WHEN ndis = 0 THEN 0.0
                           ELSE CAST(hits AS DOUBLE) / ndis END) / 0.3, 1.0)
       + 0.3 * (1.0 - greatest((CASE WHEN nchar = 0 THEN 0.0
                                     ELSE CAST(npunct AS DOUBLE) / nchar END)
                               - 0.15, 0.0) / 0.85)
       , 4) AS quality_r
FROM t ORDER BY doc_id
"""


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline PII audit + scrub (operators/pii.py): the documents
    table is salted with deterministic doc_id-derived PII (an email, a
    phone, an SSN shape, an IPv4) so the masking path is value-checked,
    not vacuous. Both engines run the SAME RE2-safe regexes; DuckDB uses
    the 'g' flag to match Spark's replace-all semantics."""
    from entitylinking_spark.operators.pii import pii_report

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com call +1415555"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
            F.lit(" ssn 123-45-6789 ip 10.0."),
            F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
            F.lit(".7 done"),
        ).alias("text"),
    )
    return pii_report(d).orderBy("doc_id")


PII_SCRUB_SQL = """
WITH d AS (
  SELECT doc_id,
         substr(text, 1, 40)
         || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com call +1415555'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         || ' ssn 123-45-6789 ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         || '.7 done' AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS INT) AS n_ssn,
       CAST(len(regexp_extract_all(text,
         '\\+\\d{9,15}\\b|\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS INT) AS n_phone,
       CAST(len(regexp_extract_all(text,
         '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INT) AS n_ipv4,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
         '\\+\\d{9,15}\\b|\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g'),
         '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) +
        len(regexp_extract_all(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) +
        len(regexp_extract_all(text, '\\+\\d{9,15}\\b|\\b\\d{3}-\\d{3}-\\d{4}\\b')) +
        len(regexp_extract_all(text,
         '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INT) AS n_pii
FROM d ORDER BY doc_id
"""


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline Gopher-style repetition signals (textstats.
    repetition_stats, Rae et al. 2021 Table A1 token variant): per-doc
    top-bigram and duplicate-bigram occurrence fractions. Fractions are
    one IEEE double division of two exact integers in both engines, so
    4-dp rounding is deterministic."""
    from entitylinking_spark.operators.textstats import repetition_stats

    d = _t(spark, sf_dir, "documents")
    out = repetition_stats(d, n=2)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("top_gram_count").cast("long").alias("top_gram_count"),
        _duck_round(F.col("top_gram_frac"), 4).alias("top_gram_frac_r"),
        _duck_round(F.col("dup_gram_frac"), 4).alias("dup_gram_frac_r"),
    ).orderBy("doc_id")


DOC_REPETITION_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])) AS gram
  FROM toks
),
per_gram AS (SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id, sum(c) AS n_grams, max(c) AS top_gram_count,
         CAST(max(c) AS DOUBLE) / sum(c) AS topf,
         CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dupf
  FROM per_gram GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(p.n_grams, 0) AS n_grams,
       COALESCE(p.top_gram_count, 0) AS top_gram_count,
       ROUND(COALESCE(p.topf, 0.0), 4) AS top_gram_frac_r,
       ROUND(COALESCE(p.dupf, 0.0), 4) AS dup_gram_frac_r
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


def dup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline duplicate-line stats (textstats.duplicate_line_stats):
    the documents table is reshaped into 3 lines per doc (the first 40
    chars repeated twice + the next 40), so every doc has a known
    duplicate line and the char-weighted fraction is exercised."""
    from entitylinking_spark.operators.textstats import duplicate_line_stats

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.substring("text", 1, 40),
            F.substring("text", 1, 40),
            F.substring("text", 41, 40),
        ).alias("text"),
    )
    out = duplicate_line_stats(d)
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        _duck_round(F.col("dup_line_frac"), 4).alias("dup_line_frac_r"),
        _duck_round(F.col("dup_line_char_frac"), 4).alias("dup_line_char_frac_r"),
    ).orderBy("doc_id")


DUP_LINES_SQL = """
WITH d AS (
  SELECT doc_id,
         substr(text, 1, 40) || chr(10) || substr(text, 1, 40)
         || chr(10) || substr(text, 41, 40) AS text
  FROM documents
),
ln AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM d
),
nz AS (SELECT doc_id, line FROM ln WHERE trim(line) <> ''),
per_line AS (SELECT doc_id, line, count(*) AS c FROM nz GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id, sum(c) AS n_lines,
         CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dupf,
         CAST(sum((c - 1) * length(line)) AS DOUBLE)
           / sum(c * length(line)) AS dupcf
  FROM per_line GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(p.n_lines, 0) AS n_lines,
       ROUND(COALESCE(p.dupf, 0.0), 4) AS dup_line_frac_r,
       ROUND(COALESCE(p.dupcf, 0.0), 4) AS dup_line_char_frac_r
FROM d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


def decontam_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline benchmark decontamination (decontam.decontaminate,
    GPT-3 Appendix C n-gram collision rule at n=5): the benchmark is the
    first 200 chars of every 37th document, so contamination is planted by
    construction and the flag is value-checked. Spark matches gram
    xxhash64 values; DuckDB matches the gram STRINGS — identical results
    absent a 64-bit collision (none at this scale)."""
    from entitylinking_spark.operators.decontam import decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.substring("text", 1, 200).alias("text"),
    )
    return decontaminate(d, bench, n=5).orderBy("doc_id")


# 5-gram list over the shared tokenizer; empty when < 5 tokens
# (generate_series(1, n) is empty for n < 1, matching ngram_tokens)
_G5_SQL = ("list_transform(generate_series(1, len({t}) - 4), "
           "i -> array_to_string({t}[i:i+4], ' '))")

DECONTAM_SQL = f"""
WITH bt AS (
  SELECT {_TOKS_SQL.replace('text', 'substr(text, 1, 200)')} AS t
  FROM documents WHERE doc_id % 37 = 0
),
bg AS (SELECT DISTINCT unnest({_G5_SQL.format(t='t')}) AS gram FROM bt),
dt AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
dg AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, unnest({_G5_SQL.format(t='t')}) AS gram FROM dt
  )
),
hits AS (
  SELECT doc_id, count(*) AS bench_hits
  FROM dg JOIN bg USING (gram) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(h.bench_hits, 0) AS bench_hits,
       COALESCE(h.bench_hits, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
ORDER BY d.doc_id
"""


def split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline deterministic split assignment (decontam.split_assign):
    seeded md5-bucket train/val/test bands. Weights are binary-exact
    (0.75/0.125/0.125) so the cumulative thresholds are the same doubles
    in both engines; the bucket is an exact power-of-two division of the
    60-bit md5 hash (relhash.md5_hash60 twin)."""
    from entitylinking_spark.operators.decontam import split_assign

    d = _t(spark, sf_dir, "documents")
    return split_assign(
        d, weights={"train": 0.75, "val": 0.125, "test": 0.125}, seed="v1"
    ).orderBy("doc_id")


SPLIT_DOCS_SQL = f"""
WITH b AS (
  SELECT doc_id,
         CAST({_H60_SQL.format(x="'v1:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)
           / 1152921504606846976.0 AS bucket
  FROM documents
)
SELECT doc_id,
       CASE WHEN bucket < 0.75 THEN 'train'
            WHEN bucket < 0.875 THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY doc_id
"""


def curate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED curation plan (plans/curation.py): PII scrub ->
    quality + lang annotation -> exact dedup (sha256 window) ->
    benchmark decontamination -> deterministic split, one verdict row per
    document. Every stage's arithmetic is the same double expression in
    both engines (op order preserved), so even the unrounded
    quality >= 0.25 keep-gate compares bit-identically."""
    from entitylinking_spark.plans.curation import CurationConfig, curate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.substring("text", 1, 200).alias("text"),
    )
    cfg = CurationConfig(
        min_quality=0.25, languages=("en",), scrub=True, decontam_n=5,
        split_weights={"train": 0.75, "val": 0.125, "test": 0.125},
        split_seed="v1",
    )
    out = curate(d, bench, cfg)
    return out.select(
        "doc_id", "lang", _duck_round(F.col("quality"), 4).alias("quality_r"),
        "is_duplicate", "contaminated", "split", "keep",
    ).orderBy("doc_id")


_SCRUB_SQL = """regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
         '\\+\\d{9,15}\\b|\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g'),
         '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g')"""

CURATE_SQL = f"""
WITH scrub AS (
  SELECT doc_id, {_SCRUB_SQL} AS text FROM documents
),
q AS (
  SELECT doc_id, text,
         len({_TOKS_SQL}) AS ntok,
         len(list_distinct({_TOKS_SQL})) AS ndis,
         len(list_intersect(list_distinct({_TOKS_SQL}), [{_SW}])) AS hits,
         length(text) AS nchar,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS npunct
  FROM scrub
),
ann AS (
  SELECT doc_id, text,
         CASE WHEN ndis > 0
                   AND CAST(hits AS DOUBLE) / CAST(ndis AS DOUBLE) >= 0.08
              THEN 'en' ELSE 'other' END AS lang,
         0.4 * least(CAST(ntok AS DOUBLE) / 200.0, 1.0)
       + 0.3 * least((CASE WHEN ndis = 0 THEN 0.0
                           ELSE CAST(hits AS DOUBLE) / CAST(ndis AS DOUBLE)
                      END) / 0.3, 1.0)
       + 0.3 * (1.0 - greatest((CASE WHEN nchar = 0 THEN 0.0
                                     ELSE CAST(npunct AS DOUBLE)
                                          / CAST(nchar AS DOUBLE) END)
                               - 0.15, 0.0) / 0.85) AS quality,
         doc_id <> MIN(doc_id) OVER (PARTITION BY sha256(text))
           AS is_duplicate,
         CAST({_H60_SQL.format(x="'v1:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)
           / 1152921504606846976.0 AS bucket
  FROM q
),
bt AS (
  SELECT {_TOKS_SQL.replace('text', 'substr(text, 1, 200)')} AS t
  FROM documents WHERE doc_id % 37 = 0
),
bg AS (SELECT DISTINCT unnest({_G5_SQL.format(t='t')}) AS gram FROM bt),
dt AS (SELECT doc_id, {_TOKS_SQL} AS t FROM scrub),
dg AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, unnest({_G5_SQL.format(t='t')}) AS gram FROM dt
  )
),
cont AS (SELECT DISTINCT doc_id FROM dg JOIN bg USING (gram))
SELECT a.doc_id, a.lang, ROUND(a.quality, 4) AS quality_r,
       a.is_duplicate,
       (c.doc_id IS NOT NULL) AS contaminated,
       CASE WHEN a.bucket < 0.75 THEN 'train'
            WHEN a.bucket < 0.875 THEN 'val'
            ELSE 'test' END AS split,
       (a.lang = 'en' AND a.quality >= 0.25 AND NOT a.is_duplicate
        AND c.doc_id IS NULL) AS keep
FROM ann a LEFT JOIN cont c ON a.doc_id = c.doc_id
ORDER BY a.doc_id
"""


def mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-assembly temperature mixing (mixing.domain_mix_weights,
    alpha=0.3): per-source sampling weights w_d = n_d^a / sum n^a and the
    oversample factor vs natural share. Both engines evaluate the same
    pow/sum doubles; outputs rounded to 6."""
    from entitylinking_spark.operators.mixing import domain_mix_weights

    d = _t(spark, sf_dir, "documents")
    out = domain_mix_weights(d, domain_col="source", alpha=0.3)
    return out.select(
        "domain", "n_docs", "size",
        _duck_round(F.col("weight"), 6).alias("weight_r"),
        _duck_round(F.col("oversample"), 6).alias("oversample_r"),
    ).orderBy("domain")


MIX_WEIGHTS_SQL = """
WITH d AS (
  SELECT source AS domain, count(*) AS n_docs,
         CAST(count(*) AS DOUBLE) AS size
  FROM documents GROUP BY 1
),
t AS (SELECT sum(pow(size, 0.3)) AS tp, sum(size) AS ts FROM d)
SELECT domain, n_docs, size,
       ROUND(pow(size, 0.3) / tp, 6) AS weight_r,
       ROUND((pow(size, 0.3) / tp) / (size / ts), 6) AS oversample_r
FROM d, t ORDER BY domain
"""


def sample_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (mixing.stratified_sample): keep
    iff the seeded 60-bit md5 band falls under the stratum's rate — the
    same exact-double band construction split_docs proves, per-stratum.
    Map-side only; zero shuffle; stable under appends."""
    from entitylinking_spark.operators.mixing import stratified_sample

    d = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        d, strata_col="lang",
        fractions={"en": 1.0, "de": 0.5, "zh": 0.25},
        default_fraction=0.1, seed="s1",
    )
    return out.select("doc_id", "lang", "source").orderBy("doc_id")


SAMPLE_STRATA_SQL = f"""
SELECT doc_id, lang, source FROM documents
WHERE CAST({_H60_SQL.format(x="'s1:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)
        / 1152921504606846976.0
      < CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5
                  WHEN 'zh' THEN 0.25 ELSE 0.1 END
ORDER BY doc_id
"""


def pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing (mixing.pack_sequences): every doc's
    (shard, window index, start offset, straddle flag) in 4 sharded
    128-token streams. All-integer arithmetic (60-bit md5 order hash,
    long cumsum window, integer div) — bit-exact across engines."""
    from entitylinking_spark.operators.mixing import pack_sequences

    d = _t(spark, sf_dir, "documents")
    return pack_sequences(d, budget=128, n_shards=4, seed="p1").orderBy("doc_id")


PACK_DOCS_SQL = f"""
WITH s AS (
  SELECT doc_id,
         {_H60_SQL.format(x="'p1:' || CAST(doc_id AS VARCHAR)")} AS h,
         len({_TOKS_SQL}) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, CAST(h % 4 AS INT) AS shard, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY h % 4 ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM s
)
SELECT doc_id, shard,
       off // 128 AS pack_id,
       off % 128 AS pack_pos,
       n_tokens,
       (n_tokens > 0 AND
        (off + greatest(n_tokens, 1) - 1) // 128 <> off // 128) AS straddles
FROM o ORDER BY doc_id
"""


def dup_ngram_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-document duplication audit (mixing.duplicated_ngram_stats,
    n=5, min_docs=2): per doc, the share of its distinct 5-grams appearing
    in >= 2 docs. Spark counts gram xxhash64 values; DuckDB counts the
    gram STRINGS — identical absent a 64-bit collision (none at sf0.01)."""
    from entitylinking_spark.operators.mixing import duplicated_ngram_stats

    d = _t(spark, sf_dir, "documents")
    out = duplicated_ngram_stats(d, n=5, min_docs=2)
    return out.select(
        "doc_id", "n_grams", "n_dup_grams",
        _duck_round(F.col("dup_fraction"), 6).alias("dup_fraction_r"),
    ).orderBy("doc_id")


DUP_NGRAM_SQL = f"""
WITH dt AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
dg AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, unnest({_G5_SQL.format(t='t')}) AS gram FROM dt
  )
),
freq AS (SELECT gram FROM dg GROUP BY gram HAVING count(*) >= 2),
per AS (
  SELECT dg.doc_id, count(*) AS n_grams,
         sum(CASE WHEN f.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
  FROM dg LEFT JOIN freq f ON dg.gram = f.gram GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(p.n_grams, 0) AS n_grams,
       COALESCE(p.n_dup, 0) AS n_dup_grams,
       ROUND(CASE WHEN COALESCE(p.n_grams, 0) = 0 THEN 0.0
                  ELSE CAST(p.n_dup AS DOUBLE) / p.n_grams END, 6)
         AS dup_fraction_r
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


def c4_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document line dedup (cleaning.remove_duplicated_lines,
    min_docs=3): a shared footer line planted on every 7th doc must be
    dropped everywhere while unique lines and blank lines survive, each
    doc's text rebuilt in original line order. Spark counts line
    xxhash64 values; DuckDB counts the line STRINGS."""
    from entitylinking_spark.operators.cleaning import remove_duplicated_lines

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit("\nshared footer line")))
        .otherwise(F.col("text")).alias("text"),
    )
    return remove_duplicated_lines(d, min_docs=3).orderBy("doc_id")


C4_LINE_DEDUP_SQL = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || chr(10) || 'shared footer line'
              ELSE text END AS text
  FROM documents
),
l AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM d
),
fr AS (
  SELECT line, count(DISTINCT doc_id) AS df
  FROM l WHERE length(line) > 0 GROUP BY 1
),
fl AS (
  SELECT l.doc_id, l.pos, l.line,
         (length(l.line) > 0 AND COALESCE(f.df, 0) >= 3) AS dropped
  FROM l LEFT JOIN fr f ON l.line = f.line
)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN NOT dropped THEN line END,
                           chr(10) ORDER BY pos), '') AS text_clean,
       count(*) AS n_lines,
       sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS n_dropped
FROM fl GROUP BY doc_id ORDER BY doc_id
"""


def gopher_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher §A1.1 quality gate (cleaning.gopher_rules): per-rule boolean
    verdicts + the AND, every rule recomputed by DuckDB from the same
    whitespace-word and line definitions."""
    from entitylinking_spark.operators.cleaning import (
        GopherConfig, gopher_rules,
    )

    # the synthetic corpus contains none of Gopher's stop set — plant it
    # on every 3rd doc so the gate discriminates (both verdicts occur)
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"),
                        F.lit(" the stock that we have to be of and with")))
        .otherwise(F.col("text")).alias("text"),
    )
    return gopher_rules(d, GopherConfig(min_words=10)).orderBy("doc_id")


_GW = "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')"
_GL = "list_filter(string_split(text, chr(10)), l -> l <> '')"

GOPHER_DOCS_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' the stock that we have to be of and with'
              ELSE text END AS text
  FROM documents
),
t AS (
  SELECT doc_id, text,
         len({_GW}) AS n_words,
         len({_GL}) AS n_lines,
         CAST(list_sum(list_transform({_GW}, w -> length(w))) AS DOUBLE)
           / greatest(len({_GW}), 1) AS mean_wl,
         len(string_split(text, '#')) - 1
           + len(string_split(text, '...')) - 1
           + len(string_split(text, '…')) - 1 AS n_sym,
         len(list_filter({_GL}, l -> regexp_matches(l, '^\\s*[-*•]')))
           AS bullet_lines,
         len(list_filter({_GL}, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
           AS ellipsis_lines,
         len(list_filter({_GW}, w -> regexp_matches(w, '[A-Za-z]')))
           AS alpha_words,
         CAST(regexp_matches(lower(text), '\\bthe\\b') AS INT)
       + CAST(regexp_matches(lower(text), '\\bbe\\b') AS INT)
       + CAST(regexp_matches(lower(text), '\\bto\\b') AS INT)
       + CAST(regexp_matches(lower(text), '\\bof\\b') AS INT)
       + CAST(regexp_matches(lower(text), '\\band\\b') AS INT)
       + CAST(regexp_matches(lower(text), '\\bthat\\b') AS INT)
       + CAST(regexp_matches(lower(text), '\\bhave\\b') AS INT)
       + CAST(regexp_matches(lower(text), '\\bwith\\b') AS INT) AS stop_hits
  FROM d
)
SELECT doc_id, n_words,
       (n_words >= 10 AND n_words <= 100000) AS rule_word_count,
       (mean_wl >= 3.0 AND mean_wl <= 10.0) AS rule_mean_word_len,
       (n_sym <= 0.1 * greatest(n_words, 1)) AS rule_symbol_ratio,
       (bullet_lines <= 0.9 * greatest(n_lines, 1)) AS rule_bullet_lines,
       (ellipsis_lines <= 0.3 * greatest(n_lines, 1)) AS rule_ellipsis_lines,
       (alpha_words >= 0.8 * greatest(n_words, 1)) AS rule_alpha_words,
       (stop_hits >= 2) AS rule_stop_words,
       ((n_words >= 10 AND n_words <= 100000)
        AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
        AND (n_sym <= 0.1 * greatest(n_words, 1))
        AND (bullet_lines <= 0.9 * greatest(n_lines, 1))
        AND (ellipsis_lines <= 0.3 * greatest(n_lines, 1))
        AND (alpha_words >= 0.8 * greatest(n_words, 1))
        AND (stop_hits >= 2)) AS passes_gopher
FROM t ORDER BY doc_id
"""


def dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-substring spans (cleaning.duplicate_spans, n=5,
    min_count=2 — Lee et al. 2022 ExactSubstr relational form): an 8-token
    passage planted on every 5th doc must come back as a merged span
    (4 dup grams, 8 covered tokens) wherever its context is unique; the
    natural corpus duplication rides along. Spark counts gram xxhash64
    values; DuckDB counts the gram STRINGS."""
    from entitylinking_spark.operators.cleaning import duplicate_spans

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(_SPAN_PLANT)))
        .otherwise(F.col("text")).alias("text"),
    )
    out = duplicate_spans(d, n=5, min_count=2)
    # raw double (not ROUND): one division of exact longs is bit-equal in
    # both engines; ROUND diverges on exact .5 ties (see quality_scores)
    return out.select(
        "doc_id", "n_tokens", "n_grams", "n_dup_grams", "n_spans",
        "covered_tokens", "max_span_tokens", "dup_token_frac",
    ).orderBy("doc_id")


_SPAN_PLANT = " alpha beta gamma delta epsilon zeta eta theta"

# 5-gram strings with 0-based positions (matches Spark's posexplode)
_G5_POS_SQL = _G5_SQL.format(t="t")

DUP_SPANS_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || '{_SPAN_PLANT}'
              ELSE text END AS text
  FROM documents
),
dt AS (SELECT doc_id, {_TOKS_SQL} AS t FROM d),
g AS (
  SELECT doc_id,
         unnest({_G5_POS_SQL}) AS gram,
         unnest(range(0, len({_G5_POS_SQL}))) AS pos
  FROM dt
),
fr AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
dup AS (SELECT g.doc_id, g.pos FROM g JOIN fr USING (gram)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 5
              THEN 1 ELSE 0 END AS b
  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grp AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
  FROM brk
),
spans AS (
  SELECT doc_id, gid, max(pos) - min(pos) + 5 AS toks, count(*) AS ng
  FROM grp GROUP BY 1, 2
),
per AS (
  SELECT doc_id, count(*) AS n_spans, sum(ng) AS n_dup,
         sum(toks) AS covered, max(toks) AS mx
  FROM spans GROUP BY 1
)
SELECT dt.doc_id,
       len(t) AS n_tokens,
       greatest(len(t) - 4, 0) AS n_grams,
       COALESCE(per.n_dup, 0) AS n_dup_grams,
       COALESCE(per.n_spans, 0) AS n_spans,
       COALESCE(per.covered, 0) AS covered_tokens,
       COALESCE(per.mx, 0) AS max_span_tokens,
       (CASE WHEN len(t) > 0
             THEN CAST(COALESCE(per.covered, 0) AS DOUBLE) / len(t)
             ELSE 0.0 END) AS dup_token_frac
FROM dt LEFT JOIN per USING (doc_id) ORDER BY doc_id
"""


def nfc_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (cleaning.normalize_unicode): decomposed
    accent sequences planted on every 4th doc (e + U+0301, A + U+0308)
    must compose; DuckDB recomputes with nfc_normalize (both engines
    implement UAX #15)."""
    from entitylinking_spark.operators.cleaning import normalize_unicode

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.col("text"),
                        F.lit(" cafe\u0301 A\u0308B na\u00efve")))
        .otherwise(F.col("text")).alias("text"),
    )
    return normalize_unicode(d, form="NFC").orderBy("doc_id")


NFC_DOCS_SQL = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN text || ' cafe' || chr(769) || ' A' || chr(776) ||
                   'B na' || chr(239) || 've'
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       nfc_normalize(text) AS text_norm,
       (nfc_normalize(text) <> text) AS changed
FROM d ORDER BY doc_id
"""


def domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (mixing.cap_per_domain, cap=30 over the 5
    `source` domains of ~100 docs each at sf0.01): the two-level top-K
    must equal DuckDB's single global row_number() over (domain, seeded
    md5 order) — keep flag AND exact rank for every kept doc."""
    from entitylinking_spark.operators.mixing import cap_per_domain

    d = _t(spark, sf_dir, "documents")
    return cap_per_domain(d, cap=30, seed="c1", n_buckets=8).orderBy("doc_id")


DOMAIN_CAPS_SQL = f"""
WITH h AS (
  SELECT doc_id, source AS domain,
         {_H60_SQL.format(x="'c1:' || CAST(doc_id AS VARCHAR)")} AS hh
  FROM documents
),
r AS (
  SELECT doc_id, domain,
         row_number() OVER (PARTITION BY domain ORDER BY hh, doc_id) AS rk
  FROM h
)
SELECT doc_id, domain, rk <= 30 AS keep,
       CASE WHEN rk <= 30 THEN rk ELSE -1 END AS rank_in_domain
FROM r ORDER BY doc_id
"""


def snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (cleaning.snapshot_diff): the 'new' snapshot
    drops every 11th doc (removed), appends 20 fresh ids (added), and
    edits every 13th doc's text (changed); everything else must report
    unchanged, with both engines hashing the same sha256."""
    from entitylinking_spark.operators.cleaning import snapshot_diff

    d = _t(spark, sf_dir, "documents")
    old = d.select("doc_id", "text")
    new = (
        d.filter(F.col("doc_id") % 11 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 13 == 0,
                   F.concat(F.col("text"), F.lit(" [edited]")))
            .otherwise(F.col("text")).alias("text"),
        )
        .unionByName(
            # orderBy before limit: a bare LIMIT is partition-order-
            # dependent; the SQL twin also orders
            d.orderBy("doc_id").limit(20).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.lit("brand new doc").alias("text"),
            )
        )
    )
    return snapshot_diff(old, new).orderBy("doc_id")


SNAPSHOT_DELTA_SQL = """
WITH old AS (SELECT doc_id, sha256(text) AS s FROM documents),
new AS (
  SELECT doc_id,
         sha256(CASE WHEN doc_id % 13 = 0 THEN text || ' [edited]'
                     ELSE text END) AS s
  FROM documents WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + 1000000, sha256('brand new doc')
  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20)
)
SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old.s IS NULL THEN 'added'
            WHEN new.s IS NULL THEN 'removed'
            WHEN old.s = new.s THEN 'unchanged'
            ELSE 'changed' END AS status,
       COALESCE(old.s, '') AS old_sha,
       COALESCE(new.s, '') AS new_sha
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
ORDER BY doc_id
"""


def cluster_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-based cluster representatives (dedup.cluster_representatives,
    policy = LONGEST doc, ties min id): clusters are a synthetic
    doc_id % 37 grouping — the operator is cluster-source-agnostic — and
    DuckDB picks each group's rep with a row_number window over
    (n_chars DESC, doc_id)."""
    from entitylinking_spark.operators.dedup import cluster_representatives

    d = _t(spark, sf_dir, "documents")
    assign = d.select("doc_id", (F.col("doc_id") % 37).alias("cluster_id"))
    return cluster_representatives(
        assign, d.select("doc_id", "n_chars"), "n_chars"
    ).orderBy("doc_id")


CLUSTER_REPS_SQL = """
WITH a AS (
  SELECT doc_id, doc_id % 37 AS cluster_id, n_chars FROM documents
),
r AS (
  SELECT cluster_id, doc_id AS rep_id,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM a
)
SELECT a.doc_id, a.cluster_id, r.rep_id,
       (a.doc_id = r.rep_id) AS is_rep
FROM a JOIN r ON a.cluster_id = r.cluster_id AND r.rk = 1
ORDER BY a.doc_id
"""


def budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy data selection under a global token budget
    (mixing.select_under_token_budget, budget=20000, bins=16,
    max_boundary=50 so the histogram-quickselect recursion is exercised,
    not just the final window): keep flags must equal DuckDB's
    single-window cumulative sum over (quality DESC, doc_id). Quality is
    the seeded md5 band (exact double division both sides); tokens are
    the shared tokenizer count."""
    from entitylinking_spark.operators.mixing import (
        sample_hash, select_under_token_budget,
    )
    from entitylinking_spark.operators.textstats import tokenize

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        sample_hash("doc_id", "qb").alias("quality"),
        F.size(tokenize("text")).cast("long").alias("n_tokens"),
    )
    out = select_under_token_budget(
        d, 20_000, bins=16, max_boundary=50, max_rounds=8)
    return out.select("doc_id", "quality", "tokens", "keep").orderBy("doc_id")


BUDGET_SELECT_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST({_H60_SQL.format(x="'qb:' || CAST(doc_id AS VARCHAR)")}
              AS DOUBLE) / 1152921504606846976 AS quality,
         CAST(len({_TOKS_SQL}) AS BIGINT) AS tokens
  FROM documents
),
r AS (
  SELECT doc_id, quality, tokens,
         sum(tokens) OVER (ORDER BY quality DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT doc_id, quality, tokens, (cum <= 20000) AS keep
FROM r ORDER BY doc_id
"""


def embedding_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantized embedding moments (embeddings.quantized_moment_sums,
    first 8 dims): per-dim sums, upper-triangle cross sums, and the row
    count over floor(x*4096) integers — every partial exact int64, so
    DuckDB recomputes the sums bit-for-bit (the PCA-fit input)."""
    from entitylinking_spark.operators.embeddings import (
        quantized_moment_sums,
    )

    e = _t(spark, sf_dir, "embeddings")
    return quantized_moment_sums(e, max_dim=8).orderBy("i", "j")


EMBEDDING_MOMENTS_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding[1:8],
                        e -> CAST(floor(CAST(e AS DOUBLE) * 4096) AS BIGINT))
           AS qv
  FROM embeddings
),
g AS (
  SELECT vec_id, unnest(qv) AS x,
         unnest(range(0, len(qv))) AS i
  FROM q
)
SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j, SUM(a.x * b.x) AS s
FROM g a JOIN g b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
UNION ALL
SELECT CAST(i AS INT), -1, SUM(x) FROM g GROUP BY 1
UNION ALL
SELECT -1, -1, count(*) FROM q
ORDER BY i, j
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality classifier (classify.score_documents with the
    deterministic 256-bucket weight table): integer weight sums, the
    single-division score, and the threshold label all recomputed by
    DuckDB from the same md5-derived buckets and weights."""
    from entitylinking_spark.operators.classify import (
        hashed_weights, score_documents,
    )

    d = _t(spark, sf_dir, "documents")
    out = score_documents(d, hashed_weights(spark, 256, seed="q1"), 256)
    # raw double, not ROUND: the score is ONE division of exact integers,
    # bit-equal in both engines, while ROUND diverges on exact .5 ties
    # (Spark HALF_UP vs DuckDB half-even — seen at sf0.001 doc 147)
    return out.select(
        "doc_id", "n_tokens", "w_sum", "score", "label",
    ).orderBy("doc_id")


QUALITY_SCORES_SQL = f"""
WITH w AS (
  SELECT CAST(b AS INT) AS bucket,
         {_H60_SQL.format(x="'q1:' || CAST(b AS VARCHAR)")} % 2001 - 1000
           AS wv
  FROM range(256) t(b)
),
tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
bk AS (SELECT doc_id, {_H60_SQL.format(x="tok")} % 256 AS bucket FROM tok),
per AS (
  SELECT doc_id, count(*) AS n_tokens, sum(wv) AS w_sum
  FROM bk JOIN w USING (bucket) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(per.n_tokens, 0) AS n_tokens,
       COALESCE(per.w_sum, 0) AS w_sum,
       (CASE WHEN COALESCE(per.n_tokens, 0) > 0
             THEN CAST(per.w_sum AS DOUBLE) / (1000.0 * per.n_tokens)
             ELSE 0.0 END) AS score,
       (CASE WHEN COALESCE(per.n_tokens, 0) > 0
             THEN CAST(per.w_sum AS DOUBLE) / (1000.0 * per.n_tokens)
             ELSE 0.0 END) >= 0.0 AS label
FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id
"""


def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build (vocab.vocabulary): token dictionary with
    tf/df and smoothed idf, min_df=2 pruned, top-50 by (tf desc, token) —
    a deterministic total order, so the LIMIT sets agree."""
    from entitylinking_spark.operators.vocab import vocabulary

    d = _t(spark, sf_dir, "documents")
    out = vocabulary(d, min_df=2, max_vocab=50)
    return out.select(
        "token", "tf", "df", F.round("idf", 6).alias("idf_r")
    )


VOCAB_TOPK_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
),
v AS (
  SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
  FROM toks GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
n AS (SELECT count(*) AS n FROM documents)
SELECT token, tf, df,
       ROUND(ln((n + 1.0) / (df + 1.0)) + 1.0, 6) AS idf_r
FROM v, n ORDER BY tf DESC, token ASC LIMIT 50
"""


def pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-bigram PMI (vocab.bigram_pmi, min_count=8): collocation
    score ln(p12/(p1 p2)) with occurrence-count probabilities; the same
    division/log order in both engines, rounded to 6."""
    from entitylinking_spark.operators.vocab import bigram_pmi

    d = _t(spark, sf_dir, "documents")
    out = bigram_pmi(d, min_count=8)
    return out.select(
        "w1", "w2", "n_pair", F.round("pmi", 6).alias("pmi_r")
    ).orderBy("w1", "w2")


PMI_BIGRAMS_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
uni AS (SELECT unnest(t) AS token FROM toks),
ucnt AS (SELECT token, count(*) AS n_tok FROM uni GROUP BY 1),
big AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> array_to_string(t[i:i+1], ' '))) AS bigram
  FROM toks
),
bcnt AS (
  SELECT bigram, count(*) AS n_pair FROM big GROUP BY 1
  HAVING count(*) >= 8
),
tot AS (SELECT (SELECT count(*) FROM uni) AS t_uni,
               (SELECT count(*) FROM big) AS t_bi)
SELECT split_part(bigram, ' ', 1) AS w1,
       split_part(bigram, ' ', 2) AS w2,
       n_pair,
       ROUND(ln((n_pair / t_bi) /
                ((u1.n_tok / t_uni) * (u2.n_tok / t_uni))), 6) AS pmi_r
FROM bcnt
JOIN ucnt u1 ON u1.token = split_part(bigram, ' ', 1)
JOIN ucnt u2 ON u2.token = split_part(bigram, ' ', 2), tot
ORDER BY w1, w2
"""


def corpus_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact length percentiles (vocab.length_profile):
    Spark percentile() and DuckDB quantile_cont share the linear-
    interpolation definition, so the values match to rounding."""
    from entitylinking_spark.operators.vocab import length_profile

    d = _t(spark, sf_dir, "documents")
    out = length_profile(d, group_col="lang", length_col="n_chars",
                         percentiles=(0.5, 0.9, 0.99))
    return out.select(
        "group", "n_docs",
        _duck_round(F.col("mean_len"), 6).alias("mean_len_r"),
        _duck_round(F.col("p50"), 6).alias("p50_r"),
        _duck_round(F.col("p90"), 6).alias("p90_r"),
        _duck_round(F.col("p99"), 6).alias("p99_r"),
    ).orderBy("group")


LENGTH_PROFILE_SQL = """
SELECT lang AS "group", count(*) AS n_docs,
       ROUND(avg(n_chars), 6) AS mean_len_r,
       ROUND(quantile_cont(n_chars, 0.5), 6) AS p50_r,
       ROUND(quantile_cont(n_chars, 0.9), 6) AS p90_r,
       ROUND(quantile_cont(n_chars, 0.99), 6) AS p99_r
FROM documents GROUP BY lang ORDER BY "group"
"""


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline embedding near-dup pairs: integer-SRP bucketed cosine
    pairs >= 0.35 (4 planes). The bucket assignment is exact int64
    arithmetic (ann_topk machinery) so DuckDB recomputes the candidate
    set bit-for-bit; nearest value to the threshold on this data is
    2.5e-4 away, far beyond cross-engine double noise."""
    from entitylinking_spark.operators.dedup import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    out = embedding_near_dup_pairs(emb, threshold=0.35, n_planes=4, dim=64)
    # candidate_pairs orders STRING row_ids lexicographically ("100" < "99");
    # normalize to numeric (min, max) so the pair identity matches the oracle
    l = F.col("id_l").cast("long")
    r = F.col("id_r").cast("long")
    return out.select(
        F.least(l, r).alias("id_l"),
        F.greatest(l, r).alias("id_r"),
        F.round("cosine", 4).alias("cosine_r"),
    ).orderBy("id_l", "id_r")


EMB_NEAR_DUP_SQL = f"""
WITH planes AS (
  SELECT p, d,
         ({_H60_SQL.format(x="'srp:' || CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)")})
           % 4096 - 2048 AS w
  FROM range(4) tp(p) CROSS JOIN range(64) td(d)
),
qe AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 4096) AS BIGINT)) AS e
  FROM embeddings
),
dots AS (
  SELECT q.vec_id, pl.p, SUM(q.e[pl.d + 1] * pl.w) AS dot
  FROM qe q CROSS JOIN planes pl GROUP BY 1, 2
),
buckets AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY 1
)
SELECT a.vec_id AS id_l, b.vec_id AS id_r,
       ROUND(list_cosine_similarity(CAST(ae.embedding AS DOUBLE[]),
                                    CAST(be.embedding AS DOUBLE[])), 4) AS cosine_r
FROM buckets a
JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
JOIN embeddings ae ON ae.vec_id = a.vec_id
JOIN embeddings be ON be.vec_id = b.vec_id
WHERE list_cosine_similarity(CAST(ae.embedding AS DOUBLE[]),
                             CAST(be.embedding AS DOUBLE[])) >= 0.35
ORDER BY id_l, id_r
"""


def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding channel's pairs->clusters composition: the SAME
    near-dup pairs as `embedding_near_dup`, closed under transitivity by
    connected_components (cluster id = min member), singletons included —
    DuckDB recomputes the pairs bit-for-bit and closes them with a
    recursive CTE."""
    from entitylinking_spark.operators.cc import connected_components
    from entitylinking_spark.operators.dedup import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    pairs = embedding_near_dup_pairs(emb, threshold=0.35, n_planes=4, dim=64)
    edges = pairs.select(
        F.col("id_l").cast("long").alias("src"),
        F.col("id_r").cast("long").alias("dst"),
    )
    clusters = connected_components(
        edges, all_ids=emb.select(F.col("vec_id").alias("row_id"))
    )
    return clusters.select(
        F.col("row_id").alias("vec_id"), "cluster_id"
    ).orderBy("vec_id")


_EMB_EDGES_SQL = EMB_NEAR_DUP_SQL.strip().removeprefix("WITH").rsplit(
    "SELECT a.vec_id", 1
)[0]

EMB_DUP_CLUSTERS_SQL = (
    "WITH RECURSIVE "
    + _EMB_EDGES_SQL.strip().rstrip(")").rstrip()
    + """),
edges AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM buckets a
  JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  JOIN embeddings ae ON ae.vec_id = a.vec_id
  JOIN embeddings be ON be.vec_id = b.vec_id
  WHERE list_cosine_similarity(CAST(ae.embedding AS DOUBLE[]),
                               CAST(be.embedding AS DOUBLE[])) >= 0.35
),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach AS (
  SELECT vec_id AS id, vec_id AS comp FROM embeddings
  UNION
  SELECT s.b AS id, r.comp FROM reach r JOIN sym s ON s.a = r.id
)
SELECT id AS vec_id, MIN(comp) AS cluster_id FROM reach GROUP BY id
ORDER BY vec_id
"""
)

HARD_NEG_SQL = (
    "WITH RECURSIVE "
    + _EMB_EDGES_SQL.strip().rstrip(")").rstrip()
    + """),
edges AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM buckets a
  JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  JOIN embeddings ae ON ae.vec_id = a.vec_id
  JOIN embeddings be ON be.vec_id = b.vec_id
  WHERE list_cosine_similarity(CAST(ae.embedding AS DOUBLE[]),
                               CAST(be.embedding AS DOUBLE[])) >= 0.35
),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach AS (
  SELECT vec_id AS id, vec_id AS comp FROM embeddings
  UNION
  SELECT s.b AS id, r.comp FROM reach r JOIN sym s ON s.a = r.id
),
comp AS (SELECT id AS vec_id, MIN(comp) AS cluster_id FROM reach GROUP BY id),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id,
         list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                CAST(ee.embedding AS DOUBLE[])) AS cosine
  FROM comp q
  JOIN embeddings eq ON eq.vec_id = q.vec_id
  JOIN comp e ON e.cluster_id <> q.cluster_id AND e.vec_id <> q.vec_id
  JOIN embeddings ee ON ee.vec_id = e.vec_id
  WHERE q.vec_id < 20
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS neg_rank
  FROM scored
)
SELECT query_id, vec_id, CAST(neg_rank AS INT) AS neg_rank,
       ROUND(cosine, 4) AS cosine_r
FROM ranked WHERE neg_rank <= 3 ORDER BY query_id, neg_rank
"""
)


def hard_negatives_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mined hard negatives (similarity.hard_negatives): for anchors
    vec_id < 20, the exact top-3 most-similar vectors OUTSIDE the
    anchor's SRP near-dup cluster (the embedding_dup_clusters
    composition — dedup output as the positive set, its complement
    ranked for contrastive training). DuckDB recomputes the clusters
    bit-for-bit and the exclusion-then-rank exactly."""
    from entitylinking_spark.operators.cc import connected_components
    from entitylinking_spark.operators.dedup import embedding_near_dup_pairs
    from entitylinking_spark.operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    pairs = embedding_near_dup_pairs(emb, threshold=0.35, n_planes=4, dim=64)
    edges = pairs.select(
        F.col("id_l").cast("long").alias("src"),
        F.col("id_r").cast("long").alias("dst"),
    )
    clusters = connected_components(
        edges, all_ids=emb.select(F.col("vec_id").alias("row_id"))
    )
    asg = clusters.select(F.col("row_id").alias("vec_id"), "cluster_id")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = hard_negatives(emb, asg, queries=q, k=3)
    return out.select(
        "query_id", "vec_id", "neg_rank",
        F.round("cosine", 4).alias("cosine_r"),
    ).orderBy("query_id", "neg_rank")


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/X14 embedding top-k: exact cosine top-5 for vec_id < 3 queries."""
    from entitylinking_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        # full-double cosine (same 4-dp boundary guard as ann_topk_shuffle)
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, q, k=5)
    return out.select(
        "query_id", "vec_id", "rank", F.round("cosine", 4).alias("cosine_r")
    ).orderBy("query_id", "rank")


SIM_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])) AS cosine
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, CAST(rank AS INT) AS rank, ROUND(cosine, 4) AS cosine_r
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


def ivf_topk_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 scale path, IVF variant (operators/ivf.py): corpus partitioned
    into 16 Voronoi cells around data-seeded quantized centroids (vec_id <
    16), queries vec_id < 3 probe their 2 nearest cells, exact cosine
    top-5 inside. Cell assignment is pure integer arithmetic (floor(x *
    2**12), a power-of-two scale — exact in double), so DuckDB recomputes
    every cell id bit-for-bit; the final cosine uses the same full-double
    4-dp guard as similarity_topk."""
    from entitylinking_spark.operators.ivf import ivf_topk, seed_centroids

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    cents = seed_centroids(emb, 16)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, q, k=5, centroids=cents, nprobe=2)
    return out.select(
        "query_id", "vec_id", "rank", F.round("cosine", 4).alias("cosine_r")
    ).orderBy("query_id", "rank")


IVF_TOPK_SQL = """
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 4096.0)) AS qvec,
         CAST(embedding AS DOUBLE[]) AS dvec
  FROM embeddings
),
cent AS (
  SELECT vec_id AS cid, qvec AS cvec FROM qv ORDER BY vec_id LIMIT 16
),
assigned AS (
  SELECT e.vec_id, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_inner_product(c.cvec, c.cvec)
                    - 2 * list_inner_product(e.qvec, c.cvec), c.cid
         ) AS rnk
  FROM qv e CROSS JOIN cent c
),
cells AS (SELECT vec_id, cid AS cell FROM assigned WHERE rnk = 1),
probes AS (
  SELECT vec_id AS query_id, cid AS cell FROM assigned
  WHERE vec_id < 3 AND rnk <= 2
),
scored AS (
  SELECT p.query_id, ce.vec_id,
         list_cosine_similarity(ec.dvec, eq.dvec) AS cosine
  FROM probes p
  JOIN cells ce ON ce.cell = p.cell
  JOIN qv ec ON ec.vec_id = ce.vec_id
  JOIN qv eq ON eq.vec_id = p.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, CAST(rank AS INT) AS rank, ROUND(cosine, 4) AS cosine_r
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


def semdedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/dedup.py::semdedup, Abbas et al. 2023): k-means
    cells (16 seeded centroids, the ivf_topk_probe init so DuckDB can
    recompute them), within-cell cosine edges >= 0.38 (nearest value
    >= 1.0e-3 away at sf0.001/sf0.01 — beyond cross-engine double noise),
    transitive closure, and the paper's keep-farthest-from-centroid
    representative. cdist is exact integer arithmetic; cluster labels are
    re-emitted as each component's min NUMERIC member id (the operator's
    internal label is the min STRING id, engine-order-dependent)."""
    from entitylinking_spark.operators.dedup import semdedup
    from entitylinking_spark.operators.ivf import seed_centroids

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    cents = seed_centroids(emb, 16)
    out = semdedup(emb, eps=0.38, centroids=cents, keep="far")
    relabel = out.groupBy("cluster_id").agg(
        F.min(F.col("row_id").cast("long")).alias("cluster_num")
    )
    return (
        out.join(relabel, "cluster_id")
        .select(
            F.col("row_id").cast("long").alias("vec_id"),
            "cell", "cdist",
            F.col("cluster_num").alias("cluster_id"),
            F.col("rep_id").cast("long").alias("rep_id"),
            "is_kept",
        )
        .orderBy("vec_id")
    )


SEMDEDUP_SQL = """
WITH RECURSIVE qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 4096.0)) AS qvec,
         CAST(embedding AS DOUBLE[]) AS dvec
  FROM embeddings
),
cent AS (SELECT vec_id AS cid, qvec AS cvec FROM qv ORDER BY vec_id LIMIT 16),
assigned AS (
  SELECT e.vec_id, c.cid,
         CAST(list_inner_product(c.cvec, c.cvec)
              - 2 * list_inner_product(e.qvec, c.cvec) AS BIGINT) AS d,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_inner_product(c.cvec, c.cvec)
                    - 2 * list_inner_product(e.qvec, c.cvec), c.cid
         ) AS rnk
  FROM qv e CROSS JOIN cent c
),
cells AS (SELECT vec_id, cid AS cell, d FROM assigned WHERE rnk = 1),
edges AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN qv ea ON ea.vec_id = a.vec_id
  JOIN qv eb ON eb.vec_id = b.vec_id
  WHERE list_cosine_similarity(ea.dvec, eb.dvec) >= 0.38
),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach AS (
  SELECT vec_id AS id, vec_id AS comp FROM cells
  UNION
  SELECT s.b AS id, r.comp FROM reach r JOIN sym s ON s.a = r.id
),
comp AS (SELECT id AS vec_id, MIN(comp) AS cluster_id FROM reach GROUP BY id),
ranked AS (
  SELECT co.vec_id, ce.cell, ce.d, co.cluster_id,
         ROW_NUMBER() OVER (
           PARTITION BY co.cluster_id
           ORDER BY ce.d DESC, CAST(co.vec_id AS VARCHAR)
         ) AS rr
  FROM comp co JOIN cells ce ON ce.vec_id = co.vec_id
)
SELECT r.vec_id, r.cell, r.d AS cdist, r.cluster_id,
       rep.vec_id AS rep_id, r.vec_id = rep.vec_id AS is_kept
FROM ranked r
JOIN ranked rep ON rep.cluster_id = r.cluster_id AND rep.rr = 1
ORDER BY r.vec_id
"""


def g5_overlapping_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 overlapping tournament groups (size 3, overlap 2) over per-nation
    supplier rankings — the named operator for the reference's
    _create_overlapping_groups (graph_system.py:702-752). The coverage
    repair path (unreachable at stride 1) has its own oracle at stride 2
    (`g5_stride2_repair`) and is parity-tested in
    tests/test_overlapping_groups.py against a port of the reference loop.

    The member list is emitted as a comma-joined string (not array<string>):
    the driver's canonicalizer sorts output columns with pandas, which
    cannot hash list-typed cells (the a2_collect_sorted pattern)."""
    from entitylinking_spark.operators.ranking import overlapping_groups

    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("mention_id"),
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_acctbal").alias("score"),
    )
    return (
        overlapping_groups(s, group_size=3, overlap=2)
        .select(
            "mention_id", "group_id",
            F.array_join(F.col("entity_ids").cast("array<string>"), ",")
            .alias("entity_ids"),
        )
        .orderBy("mention_id", "group_id")
    )


G5_SQL = """
WITH ranked AS (
  SELECT s_nationkey AS mention_id, s_suppkey AS entity_id,
         ROW_NUMBER() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal DESC, s_suppkey) - 1 AS pos,
         COUNT(*) OVER (PARTITION BY s_nationkey) AS n
  FROM supplier
),
meta AS (SELECT mention_id, MAX(n) AS n FROM ranked GROUP BY mention_id),
small AS (
  SELECT mention_id, 0 AS start, n AS win FROM meta WHERE n <= 3
),
big AS (
  SELECT mention_id, unnest(range(0, n - 2)) AS start, 3 AS win
  FROM meta WHERE n > 3
),
groups AS (
  SELECT mention_id, start, win,
         ROW_NUMBER() OVER (PARTITION BY mention_id ORDER BY start) - 1 AS group_id
  FROM (SELECT * FROM small UNION ALL SELECT * FROM big)
)
SELECT r.mention_id, g.group_id,
       array_to_string(list(CAST(r.entity_id AS VARCHAR) ORDER BY r.pos), ',')
         AS entity_ids
FROM ranked r JOIN groups g
  ON r.mention_id = g.mention_id
 AND r.pos >= g.start AND r.pos < g.start + g.win
GROUP BY r.mention_id, g.group_id
ORDER BY r.mention_id, g.group_id
"""


def g5_repair_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 coverage-repair path under oracle: group_size=3, overlap=0 over
    the top-13 docs per lang (13 = 1 mod 3), so the tail window has one
    member, is skipped (reference graph_system.py:713-714 "at least 2
    candidates"), and the uncovered doc is repaired into the group with
    the best word-overlap similarity (graph_system.py:735-752). The
    DuckDB oracle recomputes the whole flow including the similarity
    argmax. Members emitted as a comma-joined string (driver canon)."""
    from entitylinking_spark.operators.ranking import overlapping_groups

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    capped = (
        d.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 13)
        .select(
            F.col("lang").alias("mention_id"),
            F.col("doc_id").alias("entity_id"),
            F.col("n_chars").alias("score"),
            "text",
        )
    )
    return (
        overlapping_groups(capped, group_size=3, overlap=0, text_col="text")
        .select(
            "mention_id", "group_id",
            F.array_join(F.col("entity_ids").cast("array<string>"), ",")
            .alias("entity_ids"),
        )
        .orderBy("mention_id", "group_id")
    )


G5_REPAIR_SQL = r"""
WITH ranked AS (
  SELECT * FROM (
    SELECT lang AS mention_id, doc_id AS entity_id, text,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY n_chars DESC, doc_id) - 1 AS pos
    FROM documents
  ) WHERE pos < 13
),
meta AS (SELECT mention_id, COUNT(*) AS n FROM ranked GROUP BY mention_id),
small AS (
  SELECT mention_id, 0 AS start, n AS win FROM meta WHERE n <= 3
),
big AS (
  SELECT mention_id, start, 3 AS win FROM (
    SELECT mention_id, n, unnest(range(0, n + 1, 3)) AS start
    FROM meta WHERE n > 3
  ) WHERE (start = 0 OR start - 3 + 3 < n) AND n - start >= 2
),
groups AS (
  SELECT mention_id, start, win,
         ROW_NUMBER() OVER (PARTITION BY mention_id ORDER BY start) - 1 AS group_id
  FROM (SELECT * FROM small UNION ALL SELECT * FROM big)
),
members AS (
  SELECT r.mention_id, r.entity_id, r.pos, r.text, g.group_id
  FROM ranked r JOIN groups g
    ON r.mention_id = g.mention_id
   AND r.pos >= g.start AND r.pos < g.start + g.win
),
gtext AS (
  SELECT mention_id, group_id,
         list_distinct(list_filter(
           string_split_regex(lower(string_agg(text, ' ')), '\s+'),
           x -> x <> '')) AS gw
  FROM members GROUP BY mention_id, group_id
),
missing AS (
  SELECT r.mention_id, r.entity_id, r.pos,
         list_distinct(list_filter(
           string_split_regex(lower(r.text), '\s+'), x -> x <> '')) AS cw
  FROM ranked r
  LEFT JOIN (SELECT DISTINCT mention_id, pos FROM members) m
    ON r.mention_id = m.mention_id AND r.pos = m.pos
  WHERE m.pos IS NULL
),
repair AS (
  SELECT mention_id, entity_id, group_id, pos FROM (
    SELECT mi.mention_id, mi.entity_id, g.group_id,
           mi.pos + 1000000 AS pos,
           CAST(len(list_intersect(mi.cw, g.gw)) AS DOUBLE)
             / greatest(len(mi.cw), len(g.gw), 1) AS sim,
           ROW_NUMBER() OVER (
             PARTITION BY mi.mention_id, mi.pos
             ORDER BY CAST(len(list_intersect(mi.cw, g.gw)) AS DOUBLE)
                        / greatest(len(mi.cw), len(g.gw), 1) DESC,
                      g.group_id) AS rk
    FROM missing mi JOIN gtext g ON mi.mention_id = g.mention_id
    WHERE CAST(len(list_intersect(mi.cw, g.gw)) AS DOUBLE)
            / greatest(len(mi.cw), len(g.gw), 1) > 0.1
  ) WHERE rk = 1
),
allm AS (
  SELECT mention_id, entity_id, group_id, pos FROM members
  UNION ALL
  SELECT mention_id, entity_id, group_id, pos FROM repair
)
SELECT mention_id, group_id,
       array_to_string(list(CAST(entity_id AS VARCHAR) ORDER BY pos), ',')
         AS entity_ids
FROM allm GROUP BY mention_id, group_id
ORDER BY mention_id, group_id
"""




def ann_topk_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale ANN top-k (round-3): EVERY embedding row queries the
    index — the reference's per-mention probe shape
    (/root/reference/Sparkle/database.py:165-183) with a corpus-sized query
    side, so nothing is broadcast: SRP bucket shuffle join + 1-bit
    multi-probe + hot-bucket salting. The SRP planes are integer-quantized
    md5-derived weights and the embedding components are floor(x*4096), so
    every bucket bit is pure BIGINT arithmetic that DuckDB recomputes
    bit-for-bit (candidate sets match exactly; cosine ranking follows the
    SIM_TOPK precedent)."""
    from entitylinking_spark.operators.similarity import lsh_topk_shuffle

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        # full-double cosine arithmetic (float32 products shift ~1e-7 and
        # can land on a 4-dp rounding boundary vs DuckDB's DOUBLE[] math)
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    out = lsh_topk_shuffle(emb, q, k=3, n_planes=8, probe_bits=1, dim=64)
    return out.select(
        "query_id", "vec_id", "rank", F.round("cosine", 4).alias("cosine_r")
    ).orderBy("query_id", "rank")


ANN_TOPK_SQL = f"""
WITH planes AS (
  SELECT p, d,
         ({_H60_SQL.format(x="'srp:' || CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)")})
           % 4096 - 2048 AS w
  FROM range(8) tp(p) CROSS JOIN range(64) td(d)
),
qe AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 4096) AS BIGINT)) AS e
  FROM embeddings
),
dots AS (
  SELECT q.vec_id, pl.p, SUM(q.e[pl.d + 1] * pl.w) AS dot
  FROM qe q CROSS JOIN planes pl
  GROUP BY 1, 2
),
buckets AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY 1
),
probes AS (
  SELECT vec_id AS query_id, bucket AS pbucket FROM buckets
  UNION
  SELECT b.vec_id, xor(b.bucket, (1::BIGINT << f.j))
  FROM buckets b CROSS JOIN range(8) f(j)
),
cand AS (
  SELECT pr.query_id, cb.vec_id
  FROM probes pr JOIN buckets cb ON cb.bucket = pr.pbucket
),
scored AS (
  SELECT c.query_id, c.vec_id,
         list_cosine_similarity(CAST(ce.embedding AS DOUBLE[]),
                                CAST(qv.embedding AS DOUBLE[])) AS cosine
  FROM cand c
  JOIN embeddings ce ON ce.vec_id = c.vec_id
  JOIN embeddings qv ON qv.vec_id = c.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, CAST(rank AS INT) AS rank, ROUND(cosine, 4) AS cosine_r
FROM ranked WHERE rank <= 3 ORDER BY query_id, rank
"""


def u1_union_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 union of id sources + dedupe."""
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    return (
        e.select(F.col("user_id").alias("id"))
        .unionByName(o.select(F.col("o_custkey").alias("id")))
        .distinct()
        .orderBy("id")
    )


U1_SQL = """
SELECT DISTINCT id FROM (
  SELECT user_id AS id FROM events UNION ALL SELECT o_custkey AS id FROM orders
) ORDER BY id
"""


def f2_filter_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 NIL-style sentinel filter: drop a source bucket, count remainder."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter(~F.col("source").isin("synthetic_a"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .orderBy("source")
    )


F2_SQL = """
SELECT source, COUNT(*) AS n FROM documents
WHERE source NOT IN ('synthetic_a') GROUP BY source ORDER BY source
"""


def a2_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 point2list-style regroup: deterministic sorted collect per group.

    The collected set is emitted as a joined string (not array<string>): the
    driver's canonicalizer sorts output columns with pandas, which cannot
    hash list-typed cells (round-1 red row)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("lang")
    )


A2_SQL = """
SELECT lang, array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A6 multi-granularity: per-type x overall in one pass (cube)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.cube("event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("user_id")).alias("sum_users"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("(all)")).alias("bucket"),
            "n", "sum_users",
        )
        .orderBy("bucket")
    )


CUBE_SQL = """
SELECT COALESCE(event_type, '(all)') AS bucket, COUNT(*) AS n,
       CAST(SUM(user_id) AS BIGINT) AS sum_users
FROM events GROUP BY CUBE(event_type) ORDER BY bucket
"""


def j3_channel_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 merge-context-and-prior: two independently-derived per-user
    channels joined on the key, with an agreement flag."""
    e = _t(spark, sf_dir, "events")
    ctx = (
        e.groupBy("user_id")
        .agg(F.max_by("event_type", F.struct(F.col("value"), F.col("event_id"))).alias("ctx_pick"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prior = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("prior_pick"))
    )
    return (
        ctx.join(prior, "user_id")
        .withColumn("agree", F.col("ctx_pick") == F.col("prior_pick"))
        .orderBy("user_id")
    )


J3_SQL = """
WITH ctx AS (
  SELECT user_id, event_type AS ctx_pick FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY value DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1
), prior AS (
  SELECT user_id, event_type AS prior_pick FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events) WHERE rn = 1
)
SELECT ctx.user_id, ctx_pick, prior_pick, ctx_pick = prior_pick AS agree
FROM ctx JOIN prior ON ctx.user_id = prior.user_id ORDER BY ctx.user_id
"""


def t2_boosted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 BM25-style top-k with boosts: base score + exact-match bonus."""
    d = _t(spark, sf_dir, "documents")
    score = (
        F.col("n_chars").cast("double")
        + F.when(F.col("source") == "web", F.lit(10000.0)).otherwise(F.lit(0.0))
        + F.when(F.col("source").contains("wiki"), F.lit(5000.0)).otherwise(F.lit(0.0))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("boosted"), F.col("doc_id"))
    return (
        d.withColumn("boosted", score)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "doc_id", "rnk", F.round("boosted", 2).alias("boosted_r"))
        .orderBy("lang", "rnk")
    )


T2_SQL = """
SELECT lang, doc_id, rnk, boosted_r FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY boosted DESC, doc_id) AS rnk,
         ROUND(boosted, 2) AS boosted_r
  FROM (
    SELECT lang, doc_id,
           CAST(n_chars AS DOUBLE)
           + CASE WHEN source = 'web' THEN 10000.0 ELSE 0.0 END
           + CASE WHEN position('wiki' IN source) > 0 THEN 5000.0 ELSE 0.0 END AS boosted
    FROM documents)
) WHERE rnk <= 5 ORDER BY lang, rnk
"""


def x4_cut_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 sentence cut: tail after the last '.' + first sentence."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.element_at(F.split(F.col("text"), r"\.", -1), -1).alias("cut_left"),
        F.concat(F.substring_index(F.col("text"), ".", 1), F.lit(".")).alias("cut_right"),
    ).orderBy("doc_id")


X4_SQL = """
SELECT doc_id,
       regexp_split_to_array(text, '\\.')[-1] AS cut_left,
       split_part(text, '.', 1) || '.' AS cut_right
FROM documents ORDER BY doc_id
"""


def dedup_ngram_jaccard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-gram Jaccard near-dup pairs within lang blocks (dedup op)."""
    from entitylinking_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(d, block_cols=["lang"], n=2, threshold=0.2)
    return out.select(
        "id_l", "id_r", _duck_round(F.col("jaccard"), 6).alias("jaccard_r")
    ).orderBy("id_l", "id_r")


NGRAM_SQL = """
WITH g AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang,
         CASE WHEN len(toks) >= 2
              THEN list_distinct(list_transform(range(1, len(toks)),
                                                i -> toks[i] || ' ' || toks[i+1]))
              ELSE list_distinct(toks) END AS grams
  FROM (SELECT doc_id, lang,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                           t -> t <> '') AS toks
        FROM documents)
)
SELECT l.doc_id AS id_l, r.doc_id AS id_r,
       ROUND(CASE WHEN len(list_distinct(l.grams || r.grams)) = 0 THEN 1.0
                  ELSE CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE)
                       / len(list_distinct(l.grams || r.grams)) END, 6) AS jaccard_r
FROM g l JOIN g r ON l.lang = r.lang AND l.doc_id < r.doc_id
WHERE CASE WHEN len(list_distinct(l.grams || r.grams)) = 0 THEN 1.0
           ELSE CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE)
                / len(list_distinct(l.grams || r.grams)) END >= 0.2
ORDER BY id_l, id_r
"""


# ---------------------------------------------------------------------------
# sketch / EM / pipeline queries with constructed-duplicate oracles
#
# The raw `documents` table has no near-duplicates, so the dedup/ER queries
# run over an AUGMENTED corpus both engines construct identically: each
# doc_id % 3 == 0 gets a near-copy (+3 tokens), % 6 == 0 a second-degree
# copy (+5 tokens, chained similarity), % 5 == 0 a copy whose DISTINCT
# token set is unchanged (first token repeated). Ids are zero-padded so
# string MIN == numeric MIN. Cluster oracles are exact-similarity edges +
# a recursive-CTE transitive closure in DuckDB.
# ---------------------------------------------------------------------------

_AUG_SQL = """
aug AS (
  SELECT printf('d%08d', doc_id) AS doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT printf('d%08d', doc_id + 100000), text || ' quality metric signal', lang, source
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT printf('d%08d', doc_id + 200000), text || ' quality metric signal extra margin', lang, source
  FROM documents WHERE doc_id % 6 = 0
  UNION ALL
  SELECT printf('d%08d', doc_id + 300000), text || ' ' || split_part(text, ' ', 1), lang, source
  FROM documents WHERE doc_id % 5 = 0
)
"""

# token trigram list per augmented doc (matches functions/strings.ngram_set)
_GRAMS_SQL = """
grams AS (
  SELECT doc_id, lang,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
              ELSE list_distinct(toks) END AS g
  FROM (SELECT doc_id, lang,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                           t -> t <> '') AS toks
        FROM aug)
)
"""

# recursive min-label propagation over symmetric `edges(a,b)` + node set
_CC_SQL = """
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach AS (
  SELECT doc_id AS id, doc_id AS comp FROM aug
  UNION
  SELECT s.b AS id, r.comp FROM reach r JOIN sym s ON s.a = r.id
)
SELECT id AS {id_name}, MIN(comp) AS cluster_id FROM reach GROUP BY id
ORDER BY {id_name}
"""

_JACCARD_SQL = (
    "CASE WHEN len(list_distinct(l.g || r.g)) = 0 THEN 1.0 "
    "ELSE CAST(len(list_intersect(l.g, r.g)) AS DOUBLE) "
    "/ len(list_distinct(l.g || r.g)) END"
)


def _augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _AUG_SQL."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    pid = lambda shift: F.format_string("d%08d", F.col("doc_id") + F.lit(shift))  # noqa: E731
    base = d.select(pid(0).alias("doc_id"), "text", "lang", "source")
    c1 = d.filter(F.col("doc_id") % 3 == 0).select(
        pid(100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" quality metric signal")).alias("text"),
        "lang", "source",
    )
    c2 = d.filter(F.col("doc_id") % 6 == 0).select(
        pid(200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" quality metric signal extra margin")).alias("text"),
        "lang", "source",
    )
    c3 = d.filter(F.col("doc_id") % 5 == 0).select(
        pid(300000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" "), F.element_at(F.split(F.col("text"), " "), 1)).alias("text"),
        "lang", "source",
    )
    return base.unionByName(c1).unionByName(c2).unionByName(c3)


def er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship ER pipeline (blocking -> salted pairs -> prescreen -> exact
    trigram-Jaccard verify -> CC) over repo_files shaped from the augmented
    documents. Config pins the decision to pure content similarity
    (w_name=0, verify_ngram=3), which the DuckDB oracle recomputes exactly.
    Candidate recall: all docs share the path stem, so every pair gets both
    the fine (16x4) and coarse (16x2) band channels; oracle edges sit at
    trigram J >= 0.6875 (measured; largest NON-edge pair is J=0.086), where
    the combined per-pair miss probability is ~6e-7."""
    from entitylinking_spark.operators.blocking import ERConfig
    from entitylinking_spark.plans.pipeline import resolve
    from entitylinking_spark.synthdata import repo_files_from_documents

    aug = _augmented_docs(spark, sf_dir).withColumn(
        "doc_id", F.regexp_replace("doc_id", "^d", "").cast("long")
    )
    repo_files = repo_files_from_documents(aug)
    cfg = ERConfig(w_name=0.0, w_content=1.0, verify_ngram=3)
    res = resolve(repo_files, cfg, id_col="row_id", collect_metrics=False)
    return res.clusters.orderBy("row_id")


ER_CLUSTERS_SQL = (
    "WITH RECURSIVE "
    + _AUG_SQL.strip().rstrip()
    + ", "
    + _GRAMS_SQL.strip()
    + f""",
edges AS (
  SELECT l.doc_id AS a, r.doc_id AS b
  FROM grams l JOIN grams r ON l.lang = r.lang AND l.doc_id < r.doc_id
  WHERE {_JACCARD_SQL} >= 0.6
),
"""
    + _CC_SQL.format(id_name="row_id")
)


def dedup_minhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH dedup in VERIFIED mode: LSH (32 bands x 2 rows) generates
    candidates, the keep decision is exact token-trigram Jaccard >= 0.6 —
    so the DuckDB all-pairs oracle is exact given candidate recall (planted
    pairs sit at J >= 0.8: per-pair miss probability < 1e-14)."""
    from entitylinking_spark.operators.dedup import dedup_minhash_lsh

    return dedup_minhash_lsh(
        _augmented_docs(spark, sf_dir), threshold=0.6, num_bands=32,
        verify_ngram=3,
    ).orderBy("doc_id")


DEDUP_MINHASH_SQL = (
    "WITH RECURSIVE "
    + _AUG_SQL.strip()
    + ", "
    + _GRAMS_SQL.strip()
    + f""",
edges AS (
  SELECT l.doc_id AS a, r.doc_id AS b
  FROM grams l JOIN grams r ON l.doc_id < r.doc_id
  WHERE {_JACCARD_SQL} >= 0.6
),
"""
    + _CC_SQL.format(id_name="doc_id")
)


def a7_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 recall@1/5 + avg candidate count through operators/evaluation.
    Candidate list per part = suppliers ordered by shipped quantity (desc,
    suppkey); label = min suppkey (a member whose rank varies)."""
    from entitylinking_spark.operators.evaluation import recall_at_k

    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q")
    )
    cands = per.groupBy("l_partkey").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct((-F.col("q")).alias("nq"),
                                                 F.col("l_suppkey").alias("s")))),
            lambda x: x["s"].cast("string"),
        ).alias("candidates"),
        F.min("l_suppkey").cast("string").alias("label_id"),
    )
    out = recall_at_k(cands, ks=[1, 5])
    return out.select(
        _duck_round(F.col("recall_at_1"), 6).alias("recall_at_1"),
        _duck_round(F.col("recall_at_5"), 6).alias("recall_at_5"),
        _duck_round(F.col("avg_candidates"), 6).alias("avg_candidates"),
    )


A7_SQL = """
WITH per AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
c AS (
  SELECT l_partkey,
         list(CAST(l_suppkey AS VARCHAR) ORDER BY q DESC, l_suppkey) AS cands,
         CAST(MIN(l_suppkey) AS VARCHAR) AS label
  FROM per GROUP BY l_partkey
),
h AS (SELECT len(cands) AS n, COALESCE(list_position(cands, label), 0) AS fh FROM c)
SELECT ROUND(AVG(CASE WHEN fh BETWEEN 1 AND 1 THEN 1.0 ELSE 0.0 END), 6) AS recall_at_1,
       ROUND(AVG(CASE WHEN fh BETWEEN 1 AND 5 THEN 1.0 ELSE 0.0 END), 6) AS recall_at_5,
       ROUND(AVG(CAST(n AS DOUBLE)), 6) AS avg_candidates
FROM h
"""


def x9_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 full BM25 (tf/df/avgdl Okapi scoring, operators/bm25.py) top-10
    for a fixed query over the documents corpus."""
    from entitylinking_spark.operators.bm25 import bm25_topk

    d = _t(spark, sf_dir, "documents")
    out = bm25_topk(d, ["spark", "table", "scan", "data"], top_k=10)
    return out.select(
        "doc_id", "rank", F.round("score", 6).alias("score_r")
    ).orderBy("rank")


X9_BM25_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                             x -> x <> '') AS toks
  FROM documents
),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM dl),
posts AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
  WHERE tok IN ('data', 'scan', 'spark', 'table')
  GROUP BY doc_id, tok
),
dfreq AS (SELECT tok, COUNT(*) AS df FROM posts GROUP BY tok),
scored AS (
  SELECT p.doc_id,
         SUM(ln(1.0 + (n_docs - df + 0.5)/(df + 0.5))
             * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS score
  FROM posts p JOIN dfreq USING (tok) JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN stats
  GROUP BY p.doc_id
)
SELECT doc_id, CAST(rank AS INT) AS rank, ROUND(score, 6) AS score_r FROM (
  SELECT doc_id, score, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= 10 ORDER BY rank
"""


def dedup_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash dedup with the md5-derived RELATIONAL fingerprint
    (functions/relhash.py): DuckDB recomputes the exact same 60-bit
    fingerprints, and the pigeonhole segment blocking has guaranteed recall
    for hamming <= radius, so cluster parity is exact by construction."""
    from entitylinking_spark.functions.relhash import simhash_relational
    from entitylinking_spark.operators.dedup import dedup_simhash

    aug = _augmented_docs(spark, sf_dir)
    fps = simhash_relational(aug, id_col="doc_id", text_col="text")
    return dedup_simhash(aug, radius=3, fingerprints=fps, bits=60).orderBy("doc_id")


DEDUP_SIMHASH_SQL = (
    "WITH RECURSIVE "
    + _AUG_SQL.strip()
    + f""",
toks AS (
  SELECT doc_id, unnest(list_distinct(list_filter(
      regexp_split_to_array(lower(text), '[^a-z0-9_]+'), t -> t <> ''))) AS tok
  FROM aug
),
h AS (SELECT doc_id, {_H60_SQL.format(x='tok')} AS th FROM toks),
bits AS (
  SELECT doc_id, b, SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM h CROSS JOIN range(60) r(b) GROUP BY doc_id, b
),
fp0 AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS fp
  FROM bits GROUP BY doc_id
),
fp AS (
  SELECT a.doc_id, COALESCE(fp0.fp, 0) AS fp FROM aug a LEFT JOIN fp0 USING (doc_id)
),
edges AS (
  SELECT l.doc_id AS a, r.doc_id AS b
  FROM fp l JOIN fp r ON l.doc_id < r.doc_id
  WHERE bit_count(xor(l.fp, r.fp)) <= 3
),
"""
    + _CC_SQL.format(id_name="doc_id")
)


def bt_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 Bradley-Terry EM, oracle-checked via a balanced design: per
    customer, DISTINCT order priorities form a strict dominance order (by
    max order price, tie-broken by priority name) and every ordered pair
    plays exactly once. For a balanced round-robin the BT maximum-likelihood
    ORDERING equals the win-count ordering, so the EM-fitted ranks must
    reproduce the dominance order — which DuckDB computes directly."""
    from entitylinking_spark.operators.ranking import rank_experiments

    o = _t(spark, sf_dir, "orders")
    pr = o.groupBy("o_custkey", "o_orderpriority").agg(F.max("o_totalprice").alias("mx"))
    w = Window.partitionBy("o_custkey").orderBy(F.desc("mx"), "o_orderpriority")
    ranked = pr.withColumn("pos", F.row_number().over(w))
    l = ranked.select(
        F.col("o_custkey").alias("cust"), F.col("o_orderpriority").alias("win_p"),
        F.col("pos").alias("pos_l"),
    )
    r = ranked.select(
        F.col("o_custkey").alias("cust"), F.col("o_orderpriority").alias("lose_p"),
        F.col("pos").alias("pos_r"),
    )
    exps = (
        l.join(r, "cust")
        .filter(F.col("pos_l") < F.col("pos_r"))
        .select(
            F.concat(F.lit("c"), F.col("cust")).alias("mention_id"),
            (F.col("pos_l") * 10 + F.col("pos_r")).cast("int").alias("exp_id"),
            F.array(F.col("win_p")).alias("winners"),
            F.array(F.col("lose_p")).alias("losers"),
        )
    )
    return (
        rank_experiments(exps, "bradley_terry")
        .select("mention_id", "entity_id", "rank")
        .orderBy("mention_id", "rank")
    )


BT_RANK_SQL = """
WITH pr AS (
  SELECT o_custkey, o_orderpriority, MAX(o_totalprice) AS mx
  FROM orders GROUP BY o_custkey, o_orderpriority
),
eligible AS (
  SELECT o_custkey FROM pr GROUP BY o_custkey HAVING COUNT(*) >= 2
),
rk AS (
  SELECT o_custkey, o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY mx DESC, o_orderpriority) AS rank
  FROM pr JOIN eligible USING (o_custkey)
)
SELECT 'c' || CAST(o_custkey AS VARCHAR) AS mention_id,
       o_orderpriority AS entity_id, CAST(rank AS INT) AS rank
FROM rk ORDER BY mention_id, rank
"""


def _priority_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared base for the three tournament-model oracles: per customer,
    DISTINCT order priorities in strict dominance order (max order price
    desc, priority name tie-break)."""
    o = _t(spark, sf_dir, "orders")
    pr = o.groupBy("o_custkey", "o_orderpriority").agg(F.max("o_totalprice").alias("mx"))
    w = Window.partitionBy("o_custkey").orderBy(F.desc("mx"), "o_orderpriority")
    return pr.withColumn("pos", F.row_number().over(w))


def pl_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 Plackett-Luce EM (Hunter 2004 MM, reference
    /root/reference/Sparkle/algorithms.py:91-178), oracle-checked via a
    single-full-ranking design: each customer contributes ONE experiment
    whose winners array is their complete priority dominance order. For a
    single observed ranking the PL MM fit is strictly decreasing along the
    ranking (verified exhaustively for group sizes 2..5 in
    tests/test_ranking.py — priorities have exactly 5 levels, so every
    group the data can produce is covered), so the fitted rank column must
    reproduce the dominance order, which DuckDB computes directly."""
    from entitylinking_spark.operators.ranking import rank_experiments

    ranked = _priority_dominance(spark, sf_dir)
    exps = (
        ranked.groupBy("o_custkey")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("pos", F.col("o_orderpriority").alias("p"))
                    )
                ),
                lambda s: s["p"],
            ).alias("winners")
        )
        .filter(F.size("winners") >= 2)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("mention_id"),
            F.lit(0).alias("exp_id"),
            "winners",
            F.array().cast("array<string>").alias("losers"),
        )
    )
    return (
        rank_experiments(exps, "plackett_luce")
        .select("mention_id", "entity_id", "rank")
        .orderBy("mention_id", "rank")
    )


def davidson_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 Davidson (1970) tie model, oracle-checked via a balanced design
    with ties: per customer every ordered dominance pair plays one decisive
    game (as in bt_rank_orders) and each ADJACENT pair additionally plays
    one tie (winners=[a,b], losers=[b] — b on both sides marks the tie).
    Ties are symmetric evidence, so the ML ordering still equals the
    dominance order (verified exhaustively for group sizes 2..5 in
    tests/test_ranking.py), which DuckDB computes directly."""
    from entitylinking_spark.operators.ranking import rank_experiments

    ranked = _priority_dominance(spark, sf_dir)
    l = ranked.select(
        F.col("o_custkey").alias("cust"), F.col("o_orderpriority").alias("win_p"),
        F.col("pos").alias("pos_l"),
    )
    r = ranked.select(
        F.col("o_custkey").alias("cust"), F.col("o_orderpriority").alias("lose_p"),
        F.col("pos").alias("pos_r"),
    )
    joined = l.join(r, "cust").filter(F.col("pos_l") < F.col("pos_r"))
    wins = joined.select(
        F.concat(F.lit("c"), F.col("cust")).alias("mention_id"),
        (F.col("pos_l") * 10 + F.col("pos_r")).cast("int").alias("exp_id"),
        F.array(F.col("win_p")).alias("winners"),
        F.array(F.col("lose_p")).alias("losers"),
    )
    ties = joined.filter(F.col("pos_r") == F.col("pos_l") + 1).select(
        F.concat(F.lit("c"), F.col("cust")).alias("mention_id"),
        (F.lit(100) + F.col("pos_l")).cast("int").alias("exp_id"),
        F.array(F.col("win_p"), F.col("lose_p")).alias("winners"),
        F.array(F.col("lose_p")).alias("losers"),
    )
    return (
        rank_experiments(wins.unionByName(ties), "davidson")
        .select("mention_id", "entity_id", "rank")
        .orderBy("mention_id", "rank")
    )


# both designs provably reproduce the same per-customer dominance order the
# Bradley-Terry oracle checks — the SQL twin is shared
PL_RANK_SQL = BT_RANK_SQL
DAVIDSON_RANK_SQL = BT_RANK_SQL


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents bytes shaped as fake media payloads (shared by the two
    media queries; the SQL twin is _MEDIA_CTE)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.concat(F.lit("m"), F.col("doc_id")).alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image")).otherwise(F.lit("audio")).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast(
            "struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>"
        ).alias("meta"),
        F.col("doc_id"),
    )


def media_features_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing incl. the stub decode, oracle-checked end to end:
    the stub feature grid (multimodal._stub_decode, md5-derived k/4096) is
    re-quantized to its integer grid so DuckDB can recompute the exact
    values — no float formatting ambiguity (round-1 red row was
    `unhashable type: 'list'`; round-2 makes it value-exact)."""
    from entitylinking_spark.operators.multimodal import extract_features

    media = _media_table(spark, sf_dir).filter(F.col("doc_id") < 200).drop("doc_id")
    feats = extract_features(media, dim=8, use_stub_decoder=True)
    return feats.select(
        "media_id", "kind", "n_bytes", "payload_sha",
        F.array_join(
            F.transform(
                "feature",
                lambda x: F.round(x * 4096).cast("int").cast("string"),
            ),
            ",",
        ).alias("feature_str"),
    ).orderBy("media_id")


# inner lambda variable must differ from the outer list_transform's `i`
# (DuckDB lambda scoping: the inner variable would shadow the feature index
# referenced inside the md5 argument)
_H60_MEDIA = (
    "list_sum(list_transform(range(15), j -> "
    "(strpos('0123456789abcdef', substr(md5({x}), j+1, 1)) - 1)"
    " * (1::BIGINT << (4*(14-j)))))"
)

MEDIA_FEATURES_SQL = f"""
WITH m AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         sha256(text) AS payload_sha
  FROM documents WHERE doc_id < 200
)
SELECT media_id, kind, n_bytes, payload_sha,
       array_to_string(list_transform(range(8), i ->
         CAST({_H60_MEDIA.format(x="payload_sha || ':' || kind || ':' || CAST(i AS VARCHAR)")} % 4096 AS VARCHAR)
       ), ',') AS feature_str
FROM m ORDER BY media_id
"""


def tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF featurization (vocab.tfidf_vectors) in sparse row form:
    every document's nonzero components over the top-50 vocabulary,
    re-labeled with their tokens. DuckDB recomputes vocab, tf, idf, the
    per-doc l2 norm and each component (6dp — transcendental tail)."""
    from entitylinking_spark.operators.vocab import tfidf_vectors, vocabulary

    d = _t(spark, sf_dir, "documents")
    v = vocabulary(d, max_vocab=50)
    toks = sorted(r["token"] for r in v.select("token").collect())
    out = tfidf_vectors(d, v)
    names = F.array(*[F.lit(t) for t in toks])
    return (
        out.select(
            "doc_id", F.posexplode("tfidf").alias("_p", "val")
        )
        .filter(F.col("val") != 0.0)
        .select(
            "doc_id",
            F.element_at(names, F.col("_p") + 1).alias("token"),
            F.round("val", 6).alias("val_r"),
        )
        .orderBy("doc_id", "token")
    )


TFIDF_TERMS_SQL = """
WITH toks AS (
  SELECT doc_id, t AS token
  FROM documents,
       UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                          x -> x <> '')) u(t)
),
vc AS (
  SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
  FROM toks GROUP BY token
),
nn AS (SELECT COUNT(*) AS n FROM documents),
vocab AS (
  SELECT token, ln((n + 1.0) / (df + 1.0)) + 1.0 AS idf
  FROM vc, nn ORDER BY tf DESC, token LIMIT 50
),
dt AS (
  SELECT tk.doc_id, tk.token, COUNT(*) AS tf, ANY_VALUE(v.idf) AS idf
  FROM toks tk JOIN vocab v ON v.token = tk.token
  GROUP BY tk.doc_id, tk.token
),
nrm AS (
  SELECT doc_id, sqrt(SUM(tf * idf * tf * idf)) AS l2 FROM dt GROUP BY doc_id
)
SELECT dt.doc_id, dt.token,
       ROUND(dt.tf * dt.idf / nrm.l2, 6) AS val_r
FROM dt JOIN nrm USING (doc_id)
ORDER BY dt.doc_id, dt.token
"""


def heavy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (vocab.heavy_hitters): tokens with
    >= 80 corpus occurrences and their EXACT counts. The sketch only
    prunes (CMS never underestimates -> no false negatives), so the
    output equals the plain GROUP BY ... HAVING answer DuckDB computes —
    the 10^12-row win is the shuffle carrying candidate occurrences,
    not the vocabulary."""
    from entitylinking_spark.operators.vocab import heavy_hitters

    d = _t(spark, sf_dir, "documents")
    return heavy_hitters(d, min_count=80).orderBy("token")


HEAVY_TOKENS_SQL = """
SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS n
FROM documents,
     UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                        x -> x <> '')) u(t)
GROUP BY t HAVING COUNT(*) >= 80 ORDER BY token
"""


def doc_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation (cleaning.split_sentences): RE2-safe greedy
    terminator runs, trimmed, empties dropped — DuckDB runs the identical
    pattern and trim. The adapter that lets remove_duplicated_lines run
    at C4's true (sentence) unit."""
    from entitylinking_spark.operators.cleaning import split_sentences

    d = _t(spark, sf_dir, "documents")
    return split_sentences(d).orderBy("doc_id", "sent_id")


DOC_SENTENCES_SQL = """
WITH s AS (
  SELECT doc_id,
         list_filter(
           list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'),
                          x -> trim(x)),
           x -> x <> '') AS sents
  FROM documents
)
SELECT doc_id, CAST(i AS INT) AS sent_id, sents[i + 1] AS sentence
FROM s, UNNEST(list_transform(range(len(sents)), x -> CAST(x AS INT))) u(i)
ORDER BY doc_id, sent_id
"""


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (cleaning.chunk_documents): 24-token windows
    every 16 tokens with the tail window always emitted — the context-
    window prep for trainers/retrieval. Pure codegen expressions; DuckDB
    recomputes every window (starts grid + off-grid tail, slices, space-
    joined rebuild) verbatim."""
    from entitylinking_spark.operators.cleaning import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, size=24, stride=16).orderBy(
        "doc_id", "chunk_id"
    )


DOC_CHUNKS_SQL = """
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                                           '[^a-z0-9_]+'),
                     t -> t <> '') AS ts
  FROM documents
),
st AS (
  SELECT doc_id, ts,
         CASE
           WHEN len(ts) <= 24 THEN [0]
           WHEN (len(ts) - 24) % 16 = 0 THEN
             list_transform(range(0, len(ts) - 24 + 1, 16),
                            x -> CAST(x AS INT))
           ELSE list_append(
             list_transform(range(0, len(ts) - 24 + 1, 16),
                            x -> CAST(x AS INT)),
             CAST(len(ts) - 24 AS INT))
         END AS starts
  FROM tok
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_id,
       starts[i + 1] AS chunk_start,
       CAST(len(list_slice(ts, starts[i + 1] + 1, starts[i + 1] + 24))
            AS INT) AS n_chunk_tokens,
       array_to_string(list_slice(ts, starts[i + 1] + 1,
                                  starts[i + 1] + 24), ' ') AS chunk_text
FROM st, UNNEST(list_transform(range(len(starts)), x -> CAST(x AS INT))) u(i)
ORDER BY doc_id, chunk_id
"""


def oov_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage check (vocab.oov_rate): per-doc OOV token share
    against the corpus's own top-200 vocabulary (total-ordered tf DESC,
    token ASC so the cut is deterministic). oov_rate is one division of
    exact longs — bit-equal across engines; NULL (token-less docs)
    coalesces to the -1.0 sentinel."""
    from entitylinking_spark.operators.vocab import oov_rate, vocabulary

    d = _t(spark, sf_dir, "documents")
    v = vocabulary(d)
    top = (
        v.withColumn(
            "_r",
            F.row_number().over(Window.orderBy(F.desc("tf"), "token")),
        )
        .filter(F.col("_r") <= 200)
        .select("token")
    )
    return (
        oov_rate(d, top)
        .select(
            "doc_id", "n_tokens", "n_oov",
            F.coalesce("oov_rate", F.lit(-1.0)).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


OOV_DOCS_SQL = """
WITH toks AS (
  SELECT doc_id, t
  FROM documents,
       UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                          x -> x <> '')) u(t)
),
vocab AS (
  SELECT t AS token, COUNT(*) AS tf FROM toks GROUP BY t
),
top AS (
  SELECT token FROM (
    SELECT token, ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS r
    FROM vocab
  ) WHERE r <= 200
),
per AS (
  SELECT tk.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN tp.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov
  FROM toks tk LEFT JOIN top tp ON tp.token = tk.t
  GROUP BY tk.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.n_oov, 0) AS n_oov,
       COALESCE(CAST(p.n_oov AS DOUBLE) / p.n_tokens, -1.0) AS oov_rate
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter (operators/lm.py): a trigram add-1
    model fit on the EVEN documents scores the ODD ones. Counts are exact
    integers; avg_logp is a mean of ln() of exact rationals, rounded to
    6dp (the ROUND-vs-raw convention: engine-divergent transcendentals,
    ties measure-zero). NULL scores (docs under n tokens) coalesce to the
    999.0 sentinel because the driver canon cannot sort None cells."""
    from entitylinking_spark.operators.lm import ngram_lm_fit, ngram_lm_score

    d = _t(spark, sf_dir, "documents")
    lm = ngram_lm_fit(d.filter(F.col("doc_id") % 2 == 0), n=3, k=1.0)
    out = ngram_lm_score(d.filter(F.col("doc_id") % 2 == 1), lm)
    return out.select(
        "doc_id", "n_grams", "n_hits",
        F.coalesce(F.round("avg_logp", 6), F.lit(999.0)).alias("avg_logp_r"),
    ).orderBy("doc_id")


LM_PERPLEXITY_SQL = """
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                     t -> t <> '') AS ts
  FROM documents
),
refg AS (
  SELECT array_to_string(list_slice(ts, i, i + 2), chr(31)) AS gram,
         array_to_string(list_slice(ts, i, i + 1), chr(31)) AS ctx
  FROM tok,
       UNNEST(list_transform(range(1, len(ts) - 1),
                             x -> CAST(x AS INT))) u(i)
  WHERE doc_id % 2 = 0
),
gc AS (SELECT gram, COUNT(*) AS c_gram FROM refg GROUP BY gram),
cc AS (SELECT ctx, COUNT(*) AS c_ctx FROM refg GROUP BY ctx),
vv AS (
  SELECT COUNT(DISTINCT t) AS v
  FROM tok, UNNEST(ts) w(t) WHERE doc_id % 2 = 0
),
crawl AS (
  SELECT doc_id,
         array_to_string(list_slice(ts, i, i + 2), chr(31)) AS gram,
         array_to_string(list_slice(ts, i, i + 1), chr(31)) AS ctx
  FROM tok,
       UNNEST(list_transform(range(1, len(ts) - 1),
                             x -> CAST(x AS INT))) u(i)
  WHERE doc_id % 2 = 1
),
scored AS (
  SELECT c.doc_id,
         CASE WHEN g.c_gram IS NOT NULL THEN 1 ELSE 0 END AS hit,
         ln((COALESCE(g.c_gram, 0) + 1.0)
            / (COALESCE(x.c_ctx, 0) + 1.0 * (SELECT v FROM vv))) AS logp
  FROM crawl c
  LEFT JOIN gc g ON g.gram = c.gram
  LEFT JOIN cc x ON x.ctx = c.ctx
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(hit) AS BIGINT) AS n_hits,
         AVG(logp) AS avg_logp
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_grams, 0) AS n_grams,
       COALESCE(a.n_hits, 0) AS n_hits,
       COALESCE(ROUND(a.avg_logp, 6), 999.0) AS avg_logp_r
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
WHERE d.doc_id % 2 = 1 ORDER BY d.doc_id
"""


def url_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL filtering features + suffix blocklist (cleaning.url_features /
    filter_blocked_domains) over deterministic synthetic URLs: schemes,
    userinfo, ports, multi-label TLDs, empty paths and queries all occur.
    DuckDB rebuilds the same URLs and re-runs the IDENTICAL RE2 regexes
    and label-group suffix matching."""
    from entitylinking_spark.operators.cleaning import (
        filter_blocked_domains,
        url_features,
    )

    d = _t(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    url = F.concat(
        F.when(doc % 3 == 0, F.lit("https://"))
        .when(doc % 3 == 1, F.lit("http://"))
        .otherwise(F.lit("ftp://")),
        F.when(doc % 5 == 0, F.lit("user:pw@")).otherwise(F.lit("")),
        F.lit("w"), (doc % 50).cast("string"), F.lit(".example."),
        F.when(doc % 4 == 0, F.lit("com")).when(doc % 4 == 1, F.lit("org"))
        .when(doc % 4 == 2, F.lit("co.uk")).otherwise(F.lit("net")),
        F.when(doc % 6 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.expr("repeat('/p', int(doc_id % 4))"),
        F.when(doc % 2 == 0, F.lit("?q=1")).otherwise(F.lit("")),
    )
    base = d.select("doc_id", url.alias("url"))
    bl = spark.createDataFrame(
        [("example.com",), ("example.co.uk",)], "domain string"
    )
    feats = url_features(base)
    blocked = filter_blocked_domains(base, bl).select("doc_id", "url_blocked")
    return (
        feats.join(blocked, "doc_id")
        .select("doc_id", "scheme", "host", "domain", "tld",
                "path_depth", "has_query", "url_blocked")
        .orderBy("doc_id")
    )


URL_STATS_SQL = r"""
WITH u AS (
  SELECT doc_id, lower(trim(
    CASE doc_id % 3 WHEN 0 THEN 'https://' WHEN 1 THEN 'http://'
                    ELSE 'ftp://' END
    || CASE WHEN doc_id % 5 = 0 THEN 'user:pw@' ELSE '' END
    || 'w' || CAST(doc_id % 50 AS VARCHAR) || '.example.'
    || CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                       WHEN 2 THEN 'co.uk' ELSE 'net' END
    || CASE WHEN doc_id % 6 = 0 THEN ':8080' ELSE '' END
    || repeat('/p', CAST(doc_id % 4 AS INT))
    || CASE WHEN doc_id % 2 = 0 THEN '?q=1' ELSE '' END
  )) AS url FROM documents
),
g AS (
  SELECT doc_id, url,
    regexp_extract(url, '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
    regexp_replace(regexp_replace(
      regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
      '^[^@]*@', '', 'g'), ':[0-9]+$', '', 'g') AS host,
    regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path
  FROM u
),
h AS (
  SELECT doc_id, url, scheme, host, path,
         string_split(host, '.') AS sp
  FROM g
)
SELECT doc_id, scheme, host,
  regexp_extract(host, '([a-z0-9-]+\.[a-z0-9-]+)$', 1) AS domain,
  regexp_extract(host, '\.([a-z0-9-]+)$', 1) AS tld,
  CAST(len(list_filter(string_split(path, '/'), x -> x <> '')) AS INT)
    AS path_depth,
  contains(url, '?') AS has_query,
  len(list_filter(
    list_transform([2, 3, 4], k ->
      CASE WHEN len(sp) >= k
           THEN array_to_string(list_slice(sp, len(sp) - k + 1, len(sp)), '.')
      END),
    s -> s IN ('example.com', 'example.co.uk'))) > 0 AS url_blocked
FROM h ORDER BY doc_id
"""


def html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction (cleaning.html_to_text): every document is
    wrapped in deterministic markup (script/style/comment/entities/block
    tags) and stripped back; DuckDB runs the IDENTICAL RE2-safe
    regexp_replace chain (html_passes_sql), so the values are bit-equal.
    The chain is one codegen column expression — zero shuffles."""
    from entitylinking_spark.operators.cleaning import html_to_text

    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><head><style>p{margin:0}</style><script>var id="'),
        F.col("doc_id").cast("string"),
        F.lit('";</script></head><body><h1>Doc '),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p><!-- hidden --><div>tail &amp;lt;x&gt; '
              "&quot;quoted&#39;s&quot;&nbsp;end</div></body></html>"),
    )
    out = html_to_text(d.withColumn("text", html))
    return out.select("doc_id", "text_plain").orderBy("doc_id")


def _html_extract_sql() -> str:
    from entitylinking_spark.operators.cleaning import html_passes_sql

    expr = (
        "'<html><head><style>p{margin:0}</style><script>var id=\"' || "
        "CAST(doc_id AS VARCHAR) || '\";</script></head><body><h1>Doc ' || "
        "CAST(doc_id AS VARCHAR) || '</h1><p>' || text || "
        "'</p><!-- hidden --><div>tail &amp;lt;x&gt; "
        "&quot;quoted&#39;s&quot;&nbsp;end</div></body></html>'"
    )
    return (
        "SELECT doc_id, " + html_passes_sql(expr)
        + " AS text_plain FROM documents ORDER BY doc_id"
    )


HTML_EXTRACT_SQL = _html_extract_sql()


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting heart of BPE tokenizer training (operators/bpe.py):
    weighted adjacent character-pair counts over the corpus word-frequency
    table — step 0 of train_bpe, whose argmax is the first merge. Top 40
    by (count DESC, pair ASC) so the cut is total-ordered; DuckDB
    recomputes words, weights, pairs and ranks exactly."""
    from entitylinking_spark.operators.bpe import _pair_counts, word_counts

    d = _t(spark, sf_dir, "documents")
    words = word_counts(d).select(
        "word", "n", F.split("word", "(?!$)").alias("syms")
    )
    w = Window.orderBy(F.desc("cnt"), "a", "b")
    return (
        _pair_counts(words)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 40)
        .select("rank", "a", "b", "cnt")
        .orderBy("rank")
    )


BPE_PAIR_COUNTS_SQL = """
WITH words AS (
  SELECT w, COUNT(*) AS n
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) t(w)
  WHERE w <> '' GROUP BY w
),
pairs AS (
  SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b,
         CAST(SUM(n) AS BIGINT) AS cnt
  FROM words,
       UNNEST(list_transform(range(1, length(w)), x -> CAST(x AS INT))) u(i)
  GROUP BY 1, 2
),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, a, b) AS rank, a, b, cnt
  FROM pairs
)
SELECT CAST(rank AS INT) AS rank, a, b, cnt
FROM ranked WHERE rank <= 40 ORDER BY rank
"""


def resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL image path oracle-checked end to end (no stub anywhere):
    deterministic 4x4 RGB P6 payloads (pixel = first-60-md5-bits of
    'px:<doc>:<y>:<x>:<c>' % 256) are decoded by the real netpbm decoder,
    nearest-resized to 2x2 (multimodal.resize_image samples rows/cols
    {1,3} at half-pixel centers), re-encoded as P6, decoded AGAIN, and
    reduced to exact integer channel sums — DuckDB recomputes the same
    sums straight from the md5 arithmetic."""
    import hashlib as _hl

    import numpy as _np

    from entitylinking_spark.operators.multimodal import decode_ppm, resize_media

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)

    @F.pandas_udf("binary")
    def make_img(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            px = bytes(
                int(_hl.md5(f"px:{int(i)}:{y}:{x}:{c}".encode())
                    .hexdigest()[:15], 16) % 256
                for y in range(4) for x in range(4) for c in range(3)
            )
            out.append(b"P6\n4 4\n255\n" + px)
        return pd.Series(out)

    media = d.select(
        F.concat(F.lit("m"), F.col("doc_id")).alias("media_id"),
        F.lit("image").alias("kind"),
        make_img(F.col("doc_id")).alias("payload"),
    )
    small = resize_media(media, 2, 2, method="nearest")

    @F.pandas_udf("array<long>")
    def channel_sums(payloads: pd.Series) -> pd.Series:
        res = []
        for p in payloads:
            img = decode_ppm(bytes(p)).astype(_np.int64)
            res.append([int(img[:, :, c].sum()) for c in range(3)])
        return pd.Series(res)

    return (
        small.select(
            "media_id", "src_height", "src_width", "height", "width",
            channel_sums("payload").alias("s"),
        )
        .select(
            "media_id", "src_height", "src_width", "height", "width",
            F.col("s")[0].alias("sum_r"),
            F.col("s")[1].alias("sum_g"),
            F.col("s")[2].alias("sum_b"),
        )
        .orderBy("media_id")
    )


_H60_PX = (
    "list_sum(list_transform(range(15), j -> "
    "(strpos('0123456789abcdef', substr(md5({x}), j+1, 1)) - 1)"
    " * (1::BIGINT << (4*(14-j)))))"
)

RESIZE_THUMBS_SQL = f"""
WITH px AS (
  SELECT doc_id, yy, xx, cc,
         ({_H60_PX.format(x="'px:' || CAST(doc_id AS VARCHAR) || ':' || "
                            "CAST(yy AS VARCHAR) || ':' || CAST(xx AS VARCHAR)"
                            " || ':' || CAST(cc AS VARCHAR)")}) % 256 AS v
  FROM documents
  CROSS JOIN range(4) ty(yy) CROSS JOIN range(4) tx(xx)
  CROSS JOIN range(3) tc(cc)
  WHERE doc_id < 120
)
SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
       CAST(4 AS INT) AS src_height, CAST(4 AS INT) AS src_width,
       CAST(2 AS INT) AS height, CAST(2 AS INT) AS width,
       CAST(SUM(CASE WHEN cc = 0 THEN v END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN cc = 1 THEN v END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN cc = 2 THEN v END) AS BIGINT) AS sum_b
FROM px WHERE yy IN (1, 3) AND xx IN (1, 3)
GROUP BY doc_id ORDER BY media_id
"""


def media_payload_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked half of the multimodal plumbing: byte counts + payload
    sha256 computed THROUGH the mapInPandas decode path (multimodal.py),
    which DuckDB can verify independently from the raw text."""
    from entitylinking_spark.operators.multimodal import extract_features

    media = _media_table(spark, sf_dir).drop("doc_id")
    feats = extract_features(media, dim=4, use_stub_decoder=True)
    return feats.select("media_id", "kind", "n_bytes", "payload_sha").orderBy("media_id")


MEDIA_AUDIT_SQL = """
SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS payload_sha
FROM documents ORDER BY media_id
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer'03) in the relational md5-derived
    form (functions/relhash.py) so DuckDB recomputes the exact values. The
    one-pass Arrow variant (textstats.fingerprint_udf) is the scale path
    and stays pytest-covered."""
    from entitylinking_spark.functions.relhash import winnow_fingerprints

    d = _t(spark, sf_dir, "documents")
    return winnow_fingerprints(d, id_col="doc_id", text_col="text",
                               n=3, window=4).orderBy("doc_id")


DOC_FP_SQL = (
    "WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), "
    "'[^a-z0-9_]+'), x -> x <> '') AS toks FROM documents),\n"
    "g AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN "
    "list_transform(range(1, len(toks)-1), i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]) "
    "ELSE list_filter([array_to_string(toks, ' ')], s -> len(s) > 0) END AS grams FROM t),\n"
    "e AS (SELECT doc_id, len(grams) AS n, generate_subscripts(grams, 1) - 1 AS pos, "
    "unnest(grams) AS gram FROM g),\n"
    f"h AS (SELECT doc_id, n, pos, {_H60_SQL.format(x='gram')} AS gh FROM e),\n"
    "p AS (SELECT doc_id, pos, n, MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos "
    "ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win_min FROM h),\n"
    "f AS (SELECT doc_id, array_to_string(list_sort(list(DISTINCT win_min)), ',') AS fingerprint "
    "FROM p WHERE pos <= greatest(n - 4, 0) GROUP BY doc_id)\n"
    "SELECT d.doc_id, COALESCE(f.fingerprint, '') AS fingerprint "
    "FROM documents d LEFT JOIN f USING (doc_id) ORDER BY d.doc_id"
)


def linking_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-linking candidate generation (operators/linking.py
    candidate_channels — the reference's retrieval fan-out,
    /root/reference/Sparkle/core.py:100-120) driven end to end: mentions
    and entities are shaped deterministically from the documents table
    (corpus = lang; entities = doc_id%5 rows titled by their first 4
    tokens; mentions = doc_id%4 rows whose text is the first 3 tokens),
    and the name + token channels' (mention, entity, score) rows are
    value-checked by DuckDB. The sketch channel is excluded (MinHash —
    not SQL-recomputable; pytest-covered). The DF skew gates stay inactive
    at driver scale by their floors (df_min=50 > any per-corpus DF here);
    the gates themselves are pytest-covered (test_linking)."""
    from entitylinking_spark.operators.linking import candidate_channels

    d = _t(spark, sf_dir, "documents")
    toks = F.array_remove(F.split(F.lower(F.col("text")), r"[^\w]+"), "")
    ents = d.filter(F.col("doc_id") % 5 == 0).select(
        F.col("lang").alias("corpus"),
        F.format_string("e%08d", F.col("doc_id")).alias("document_id"),
        F.array_join(F.slice(toks, 1, 4), " ").alias("title"),
        F.col("text"),
    )
    ments = d.filter(F.col("doc_id") % 4 == 0).select(
        F.col("lang").alias("corpus"),
        F.format_string("m%08d", F.col("doc_id")).alias("mention_id"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("text"),
    )
    return (
        candidate_channels(ments, ents)
        .filter(F.col("channel") != "sketch")
        .orderBy("mention_id", "document_id", "channel")
    )


_LINK_TOKS = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),"
              " t -> t <> '')")

LINKING_CHANNELS_SQL = f"""
WITH src AS (
  SELECT doc_id, lang, {_LINK_TOKS} AS tk FROM documents
),
m AS (
  SELECT lang AS corpus, printf('m%08d', doc_id) AS mention_id,
         array_to_string(tk[1:3], ' ') AS m_name,
         list_distinct(list_filter(tk[1:3], t -> length(t) >= 2)) AS m_tk,
         tk[1] AS nb
  FROM src WHERE doc_id % 4 = 0
),
e AS (
  SELECT lang AS corpus, printf('e%08d', doc_id) AS document_id,
         array_to_string(tk[1:4], ' ') AS e_name,
         list_distinct(list_filter(tk, t -> length(t) >= 2)) AS e_tk,
         tk[1] AS nb
  FROM src WHERE doc_id % 5 = 0
),
name_ch AS (
  SELECT mention_id, document_id, 'name' AS channel,
         CASE WHEN m_name = e_name THEN 1.0
              WHEN position(e_name IN m_name) > 0
                OR position(m_name IN e_name) > 0 THEN 0.7
              ELSE 0.0 END AS ch_score
  FROM m JOIN e ON m.corpus = e.corpus AND m.nb = e.nb
  WHERE length(m.nb) >= 2
),
mt AS (SELECT corpus, mention_id, unnest(m_tk) AS tok FROM m),
et AS (SELECT corpus, document_id, unnest(e_tk) AS tok FROM e),
tok_ch AS (
  SELECT mention_id, document_id, 'token' AS channel,
         CAST(COUNT(*) AS DOUBLE) AS ch_score
  FROM mt JOIN et ON mt.corpus = et.corpus AND mt.tok = et.tok
  GROUP BY mention_id, document_id
)
SELECT * FROM (
  SELECT * FROM name_ch WHERE ch_score > 0
  UNION ALL SELECT * FROM tok_ch
) ORDER BY mention_id, document_id, channel
"""


def parse_responses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The response-parsing family (functions/parsing.py — X10 yes/no with
    negative-beats-yes, X11 first-occurring category, X13 JSON-in-string;
    reference OneNet/data_process.py:115-156, Sparkle/eval.py:80-93)
    driver-checked per row: deterministic response strings are built from
    the documents table (the _media_table pattern — same construction on
    both sides, the PARSE is what's under test) covering every branch —
    explicit yes, yes overridden by a negative, empty -> null,
    unparseable -> null — and DuckDB recomputes category positions and the
    embedded-JSON fields."""
    from entitylinking_spark.functions.parsing import (
        extract_embedded_json,
        extract_first_category,
        parse_yes_no,
    )

    d = _t(spark, sf_dir, "documents")
    resp = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("Yes, the answer involves "), F.col("lang")))
        .when(F.col("doc_id") % 4 == 1, F.lit("Yes, but actually not correct"))
        .when(F.col("doc_id") % 4 == 2, F.lit(""))
        .otherwise(F.concat(F.lit("hmm "), F.col("lang")))
    )
    marked = F.concat(
        F.lit('resp: {"lang": "'), F.col("lang"), F.lit('", "n": '),
        (F.col("doc_id") % 7).cast("string"), F.lit("} end"),
    )
    j = extract_embedded_json(marked, "lang string, n int")
    return d.select(
        "doc_id",
        # nulls (unparseable / no category) -> sentinels: the driver canon
        # sorts row tuples, which None cells break
        F.coalesce(parse_yes_no(resp).cast("int"), F.lit(-1)).alias("ans"),
        F.coalesce(
            extract_first_category(
                F.col("text"), ["table", "window", "vector", "customer"]
            ),
            F.lit("none"),
        ).alias("category"),
        j["lang"].alias("json_lang"),
        j["n"].alias("json_n"),
    ).orderBy("doc_id")


PARSE_RESPONSES_SQL = r"""
WITH base AS (
  SELECT doc_id, lang, lower(text) AS s,
    CASE doc_id % 4
      WHEN 0 THEN 'Yes, the answer involves ' || lang
      WHEN 1 THEN 'Yes, but actually not correct'
      WHEN 2 THEN ''
      ELSE 'hmm ' || lang END AS resp,
    'resp: {"lang": "' || lang || '", "n": ' || CAST(doc_id % 7 AS VARCHAR)
      || '} end' AS marked
  FROM documents
),
pos AS (
  SELECT doc_id, lower(trim(resp)) AS r, marked,
    CASE WHEN instr(s,'table')>0 THEN instr(s,'table') ELSE 2147483647 END AS p1,
    CASE WHEN instr(s,'window')>0 THEN instr(s,'window') ELSE 2147483647 END AS p2,
    CASE WHEN instr(s,'vector')>0 THEN instr(s,'vector') ELSE 2147483647 END AS p3,
    CASE WHEN instr(s,'customer')>0 THEN instr(s,'customer') ELSE 2147483647 END AS p4
  FROM base
)
SELECT doc_id,
  CASE WHEN length(r) = 0 THEN -1
       WHEN regexp_matches(r, '\b(no|not|cannot|n''t|incorrect|wrong|false)\b')
         THEN 0
       WHEN regexp_matches(r, '\byes\b') OR r LIKE 'y%' THEN 1
       ELSE -1 END AS ans,
  CASE WHEN least(p1,p2,p3,p4) = 2147483647 THEN 'none'
       WHEN p1 = least(p1,p2,p3,p4) THEN 'table'
       WHEN p2 = least(p1,p2,p3,p4) THEN 'window'
       WHEN p3 = least(p1,p2,p3,p4) THEN 'vector'
       ELSE 'customer' END AS category,
  regexp_extract(marked, '(\{.*\})', 1)->>'$.lang' AS json_lang,
  CAST(regexp_extract(marked, '(\{.*\})', 1)->>'$.n' AS INTEGER) AS json_n
FROM pos ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

_ORACLE_CHECKED: dict[str, tuple[Callable, str]] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "j1_enrichment_join": (j1_enrichment_join, J1_SQL),
    "j2_composite_key_join": (j2_composite_key_join, J2_SQL),
    "f4_semi_join": (f4_semi_join, F4_SQL),
    "f5_anti_join": (f5_anti_join, F5_SQL),
    "j5_explode_regroup": (j5_explode_regroup, J5_SQL),
    "t1_topk_window": (t1_topk_window, T1_SQL),
    "t4_tiebreak": (t4_tiebreak, T4_SQL),
    "t5_first_seen": (t5_first_seen, T5_SQL),
    "a3_share_by_group": (a3_share_by_group, A3_SQL),
    "a5_corpus_stats": (a5_corpus_stats, A5_SQL),
    "a6_micro_prf": (a6_micro_prf, A6_SQL),
    "u3_intersect": (u3_intersect, U3_SQL),
    "u1_union_dedupe": (u1_union_dedupe, U1_SQL),
    "f2_filter_notin": (f2_filter_notin, F2_SQL),
    "x2_normalize_ws": (x2_normalize_ws, X2_SQL),
    "x5_first_sentence": (x5_first_sentence, X5_SQL),
    "x6_token_count": (x6_token_count, X6_SQL),
    "x7_name_match": (x7_name_match, X7_SQL),
    "x8_term_frequency": (x8_term_frequency, X8_SQL),
    "x15_minmax_normalize": (x15_minmax_normalize, X15_SQL),
    "x17_blend": (x17_blend, X17_SQL),
    "j6_label_in_candidates": (j6_label_in_candidates, J6_SQL),
    "dedup_exact_docs": (dedup_exact_docs, DEDUP_EXACT_SQL),
    "g3_connected_components": (g3_connected_components, G3_SQL),
    "lang_id_stopword": (lang_id_stopword, LANG_ID_SQL),
    "similarity_topk": (similarity_topk, SIM_TOPK_SQL),
    "ivf_topk_probe": (ivf_topk_probe, IVF_TOPK_SQL),
    "a2_collect_sorted": (a2_collect_sorted, A2_SQL),
    "q_cube_counts": (q_cube_counts, CUBE_SQL),
    "j3_channel_merge": (j3_channel_merge, J3_SQL),
    "t2_boosted_topk": (t2_boosted_topk, T2_SQL),
    "x4_cut_context": (x4_cut_context, X4_SQL),
    "dedup_ngram_jaccard_docs": (dedup_ngram_jaccard_docs, NGRAM_SQL),
    "media_payload_audit": (media_payload_audit, MEDIA_AUDIT_SQL),
    "x9_bm25_topk": (x9_bm25_topk, X9_BM25_SQL),
    "a7_recall_at_k": (a7_recall_at_k, A7_SQL),
    "ann_topk_shuffle": (ann_topk_shuffle, ANN_TOPK_SQL),
    "doc_quality": (doc_quality, DOC_QUALITY_SQL),
    "pii_scrub": (pii_scrub, PII_SCRUB_SQL),
    "doc_repetition": (doc_repetition, DOC_REPETITION_SQL),
    "dup_lines": (dup_lines, DUP_LINES_SQL),
    "embedding_near_dup": (embedding_near_dup, EMB_NEAR_DUP_SQL),
    "embedding_dup_clusters": (embedding_dup_clusters, EMB_DUP_CLUSTERS_SQL),
    "g5_overlapping_groups": (g5_overlapping_groups, G5_SQL),
    "g5_repair_oracle": (g5_repair_oracle, G5_REPAIR_SQL),
    "er_clusters": (er_clusters, ER_CLUSTERS_SQL),
    "dedup_minhash_docs": (dedup_minhash_docs, DEDUP_MINHASH_SQL),
    "dedup_simhash_docs": (dedup_simhash_docs, DEDUP_SIMHASH_SQL),
    "bt_rank_orders": (bt_rank_orders, BT_RANK_SQL),
    "pl_rank_orders": (pl_rank_orders, PL_RANK_SQL),
    "davidson_rank_orders": (davidson_rank_orders, DAVIDSON_RANK_SQL),
    "doc_fingerprints": (doc_fingerprints, DOC_FP_SQL),
    "parse_responses": (parse_responses, PARSE_RESPONSES_SQL),
    # the decode itself is a declared stub (multimodal._stub_decode), but
    # its md5-derived grid is recomputable by DuckDB, so even this query is
    # value-checked end to end through the mapInPandas plumbing
    "media_features_demo": (media_features_demo, MEDIA_FEATURES_SQL),
    "linking_channels": (linking_channels, LINKING_CHANNELS_SQL),
    "decontam_docs": (decontam_docs, DECONTAM_SQL),
    "split_docs": (split_docs, SPLIT_DOCS_SQL),
    "curate_docs": (curate_docs, CURATE_SQL),
    "mix_weights": (mix_weights, MIX_WEIGHTS_SQL),
    "sample_strata": (sample_strata, SAMPLE_STRATA_SQL),
    "pack_docs": (pack_docs, PACK_DOCS_SQL),
    "dup_ngram_audit": (dup_ngram_audit, DUP_NGRAM_SQL),
    "vocab_topk": (vocab_topk, VOCAB_TOPK_SQL),
    "pmi_bigrams": (pmi_bigrams, PMI_BIGRAMS_SQL),
    "corpus_length_profile": (corpus_length_profile, LENGTH_PROFILE_SQL),
    "c4_line_dedup": (c4_line_dedup, C4_LINE_DEDUP_SQL),
    "gopher_docs": (gopher_docs, GOPHER_DOCS_SQL),
    "dup_spans": (dup_spans, DUP_SPANS_SQL),
    "nfc_docs": (nfc_docs, NFC_DOCS_SQL),
    "embedding_moments": (embedding_moments, EMBEDDING_MOMENTS_SQL),
    "budget_select": (budget_select, BUDGET_SELECT_SQL),
    "cluster_reps": (cluster_reps, CLUSTER_REPS_SQL),
    "snapshot_delta": (snapshot_delta, SNAPSHOT_DELTA_SQL),
    "domain_caps": (domain_caps, DOMAIN_CAPS_SQL),
    "quality_scores": (quality_scores, QUALITY_SCORES_SQL),
    "semdedup_docs": (semdedup_docs, SEMDEDUP_SQL),
    "resize_thumbs": (resize_thumbs, RESIZE_THUMBS_SQL),
    "bpe_pair_counts": (bpe_pair_counts, BPE_PAIR_COUNTS_SQL),
    "html_extract": (html_extract, HTML_EXTRACT_SQL),
    "url_stats": (url_stats, URL_STATS_SQL),
    "lm_perplexity": (lm_perplexity, LM_PERPLEXITY_SQL),
    "oov_docs": (oov_docs, OOV_DOCS_SQL),
    "hard_negatives_probe": (hard_negatives_probe, HARD_NEG_SQL),
    "doc_chunks": (doc_chunks, DOC_CHUNKS_SQL),
    "doc_sentences": (doc_sentences, DOC_SENTENCES_SQL),
    "heavy_tokens": (heavy_tokens, HEAVY_TOKENS_SQL),
    "tfidf_terms": (tfidf_terms, TFIDF_TERMS_SQL),
}

_ROWS_ONLY: dict[str, Callable] = {}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (fn, _) in _ORACLE_CHECKED.items():
        out[name] = fn
    out.update(_ROWS_ONLY)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql.strip() for name, (_, sql) in _ORACLE_CHECKED.items()}
