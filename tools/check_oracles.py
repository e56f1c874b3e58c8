"""Local stand-in for the driver's DuckDB cross-check.

Runs every oracle-checked query from __spark_entry__ on Spark AND DuckDB
over the same parquet, compares row count, column names, and
order-insensitive values. Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod  # noqa: E402
from entitylinking_spark.session import get_spark  # noqa: E402


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def reject_complex_columns(spark_df):
    """The driver's canonicalizer sorts output columns with pandas, which
    cannot factorize list/dict cells — an array/map/struct output column is
    a guaranteed driver red row (rounds 1 and 3) even when values match.
    Fail loudly here so local green implies driver green."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if bad:
        return (
            f"COMPLEX-TYPE output columns {bad}: driver canon cannot sort "
            "array/map/struct cells — emit array_join(...) / explode instead"
        )
    return None


def compare(spark_df, duck_rows, duck_cols):
    err = reject_complex_columns(spark_df)
    if err:
        return err
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        return f"SCHEMA spark={s_cols} duck={d_cols}"
    s_rows = spark_df.collect()
    if len(s_rows) != len(duck_rows):
        return f"ROWCOUNT spark={len(s_rows)} duck={len(duck_rows)}"
    s_vals = sorted(
        tuple(_norm(r[c]) for c in s_cols) for r in s_rows
    )
    col_idx = {c: i for i, c in enumerate(duck_cols)}
    d_vals = sorted(
        tuple(_norm(r[col_idx[c]]) for c in s_cols) for r in duck_rows
    )
    if s_vals != d_vals:
        for i, (a, b) in enumerate(zip(s_vals, d_vals)):
            if a != b:
                return f"VALUES first diff at sorted row {i}: spark={a} duck={b}"
        return "VALUES diff (tail)"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(cores=4)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            cur = con.execute(sql)
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
            err = compare(sdf, duck_rows, duck_cols)
        except Exception as e:  # noqa: BLE001
            err = f"EXCEPTION {type(e).__name__}: {e}"
        if err:
            n_fail += 1
            print(f"FAIL {name}: {err}"[:400])
        else:
            n_pass += 1
            print(f"ok   {name}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
