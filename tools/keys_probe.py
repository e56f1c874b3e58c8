"""Keys-stage experiment harness (round-4 verdict #3).

The 500k stage profile showed the keys stage (Arrow MinHash over content)
at 290.5 s executor run vs 88.1 s executor CPU on local[8] — a 3.3x
run-vs-CPU gap attributed to Python-worker/Arrow transfer and the VM's
single memory bus. This probe isolates JUST that stage and measures the
prescribed code-side levers:

  --batch N        spark.sql.execution.arrow.maxRecordsPerBatch override
  --mode baseline  content string -> Arrow UDF (production path)
  --mode jvm-tok   tokenize JVM-side (split+lower), ship array<string>
  --mode jvm-hash  tokenize AND hash JVM-side (xxhash64 per token), ship
                   array<long>; Python does only the rolling combine + min

Prints one JSON line per invocation: wall seconds per rep plus the
python-worker-reuse confirmation read from the live conf.

Usage: python tools/keys_probe.py --cpus 8 --rows 200000 --mode baseline
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def _minhash_from_token_lists(num_perm: int = 64, shingle_k: int = 3):
    """Variant kernel: signature from PRE-TOKENIZED rows (array<string>)."""
    from pyspark.sql import functions as F, types as T

    from entitylinking_spark.functions.hashing import _PERM_A, _PERM_B

    a, b = _PERM_A[:num_perm], _PERM_B[:num_perm]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_tok(tokens: pd.Series) -> pd.Series:
        n_rows = len(tokens)
        if n_rows == 0:
            return pd.Series([], dtype=object)
        counts = np.empty(n_rows, dtype=np.int64)
        flat: list = []
        for i, t in enumerate(tokens):
            tl = list(t) if t is not None and len(t) else ["\x00empty"]
            counts[i] = len(tl)
            flat.extend(tl)
        th = pd.util.hash_array(np.array(flat, dtype=object))
        return _combine_and_min(th, counts, num_perm, shingle_k, a, b)

    return minhash_tok


def _minhash_from_token_hashes(num_perm: int = 64, shingle_k: int = 3):
    """Variant kernel: signature from JVM-hashed tokens (array<long>) —
    the Python side never touches a string."""
    from pyspark.sql import functions as F, types as T

    from entitylinking_spark.functions.hashing import _PERM_A, _PERM_B

    a, b = _PERM_A[:num_perm], _PERM_B[:num_perm]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_hashed(hashes: pd.Series) -> pd.Series:
        n_rows = len(hashes)
        if n_rows == 0:
            return pd.Series([], dtype=object)
        counts = np.empty(n_rows, dtype=np.int64)
        parts = []
        for i, hh in enumerate(hashes):
            arr = (np.asarray(hh, dtype=np.int64).view(np.uint64)
                   if hh is not None and len(hh)
                   else np.array([0], dtype=np.uint64))
            counts[i] = len(arr)
            parts.append(arr)
        th = np.concatenate(parts)
        return _combine_and_min(th, counts, num_perm, shingle_k, a, b)

    return minhash_hashed


def _combine_and_min(th, counts, num_perm, k, a, b):
    """Shared tail of the variant kernels: rolling k-gram combine over the
    flat token-hash array, then per-permutation minima (mirrors
    functions/hashing._shingle_hashes + make_minhash_udf)."""
    from entitylinking_spark.functions.hashing import _COMBINE

    n_rows = len(counts)
    tok_offsets = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(counts[:-1], out=tok_offsets[1:])
    total = int(counts.sum())
    if total >= k:
        sh = th[: total - k + 1] * _COMBINE[0]
        for j in range(1, k):
            sh = sh ^ (th[j: total - k + 1 + j] * _COMBINE[j % len(_COMBINE)])
    else:
        sh = np.zeros(0, dtype=np.uint64)
    valid_cnt = np.maximum(counts - k + 1, 0)
    use_tokens = counts < k
    src_cnt = np.where(use_tokens, counts, valid_cnt)
    out_offsets = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(src_cnt[:-1], out=out_offsets[1:])
    total_out = int(src_cnt.sum())
    row_of = np.repeat(np.arange(n_rows), src_cnt)
    pos_in_row = np.arange(total_out) - np.repeat(out_offsets, src_cnt)
    src_idx = tok_offsets[row_of] + pos_in_row
    from_tokens = use_tokens[row_of]
    vals = np.empty(total_out, dtype=np.uint64)
    if sh.size:
        vals[~from_tokens] = sh[src_idx[~from_tokens]]
    vals[from_tokens] = th[src_idx[from_tokens]]
    sig = np.empty((n_rows, num_perm), dtype=np.uint64)
    for p in range(num_perm):
        hashed = vals * a[p] + b[p]
        sig[:, p] = np.minimum.reduceat(hashed, out_offsets)
    return pd.Series(list(sig.view(np.int64)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=10_000)
    ap.add_argument("--mode", default="baseline",
                    choices=["baseline", "jvm-tok", "jvm-hash"])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from entitylinking_spark.functions.hashing import make_minhash_udf
    from entitylinking_spark.functions.strings import ngram_set
    from entitylinking_spark.session import get_spark
    from tools.scaling_run import gen

    path = gen(args.rows)
    spark = get_spark(
        app_name=f"keys-probe-{args.mode}-{args.batch}", cores=args.cpus,
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": str(args.batch)
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    reuse = spark.conf.get("spark.python.worker.reuse", "true")
    df = spark.read.parquet(path)

    # the production keys projection (sha + fname + n_units + signature)
    tokens = F.array_remove(
        F.split(F.lower(F.col("content")), "[^a-z0-9_]+"), ""
    )
    if args.mode == "baseline":
        sig = make_minhash_udf(64)(F.col("content"))
    elif args.mode == "jvm-tok":
        sig = _minhash_from_token_lists()(tokens)
    else:
        sig = _minhash_from_token_hashes()(
            F.transform(tokens, lambda t: F.xxhash64(t))
        )
    keyed = (
        df.withColumn("content_sha", F.sha2(F.col("content"), 256))
        .withColumn("fname", F.element_at(F.split(F.col("path"), "/"), -1))
        .withColumn("n_units", F.size(ngram_set(F.col("content"), 1)))
        .withColumn("minhash", sig)
        .drop("content")
    )

    def one():
        t0 = time.time()
        keyed.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    warm = one()
    walls = [round(one(), 2) for _ in range(args.reps)]
    print(json.dumps({
        "mode": args.mode, "cpus": args.cpus, "rows": args.rows,
        "arrow_batch": args.batch, "worker_reuse": reuse,
        "warmup_s": round(warm, 2), "wall_s_reps": walls,
        "wall_s": sorted(walls)[len(walls) // 2],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
