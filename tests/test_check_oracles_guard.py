"""The local oracle checker must reject complex-typed output columns.

The driver's canonicalizer sorts query output with pandas, which cannot
factorize list cells — array<...> output columns are a guaranteed driver
red row (rounds 1 and 3: a2_collect_sorted, g5_overlapping_groups) even
when values match. tools/check_oracles.py now fails such queries locally
so local green implies driver green.
"""

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from check_oracles import reject_complex_columns  # noqa: E402


def test_array_column_rejected(spark):
    df = spark.range(3).withColumn("ids", F.array(F.lit("a"), F.lit("b")))
    err = reject_complex_columns(df)
    assert err is not None and "ids" in err


def test_map_and_struct_rejected(spark):
    df = spark.range(2).select(
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit(1).alias("x")).alias("s"),
    )
    err = reject_complex_columns(df)
    assert err is not None and "m" in err and "s" in err


def test_scalar_columns_pass(spark):
    df = spark.range(3).withColumn(
        "joined", F.array_join(F.array(F.lit("a"), F.lit("b")), ",")
    )
    assert reject_complex_columns(df) is None


def test_no_registered_query_emits_complex_types(spark, tmp_path):
    """Every registered oracle query must produce a driver-sortable schema.

    Schema-only check: run each query lazily at sf0.001 and inspect the
    schema without collecting."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as entry_mod

    sf_dir = "/root/testdata/sf0.001"
    bad = {}
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        err = reject_complex_columns(df)
        if err:
            bad[name] = err
    assert not bad, f"queries with driver-incompatible schemas: {bad}"
