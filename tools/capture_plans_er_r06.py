"""Capture .explain("formatted") for the ER resolve path and the two
rounding-touched textstats queries. Standalone (works in any checkout):

    python tools/capture_plans_er_r06.py <tag> <out_dir>
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    tag, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from entitylinking_spark.operators.blocking import (
        ERConfig, block_candidates, block_census, with_keys,
    )
    from entitylinking_spark.operators.pairs import candidate_pairs
    from entitylinking_spark.operators.scoring import score_pairs
    from entitylinking_spark.session import get_spark
    from entitylinking_spark.synthdata import generate_repo_files

    spark = get_spark(app_name=f"plans-er-{tag}", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = ERConfig()
    fx = generate_repo_files(2000, seed=42)
    df = spark.createDataFrame(fx.rows)
    keyed = with_keys(df, cfg, id_col="row_id")
    blocks = block_candidates(keyed, cfg)
    census = block_census(blocks)
    pairs = candidate_pairs(blocks, cfg, census=census)
    scored = score_pairs(pairs, keyed, cfg)

    qs = entry_mod.queries()
    sections = {
        "er_pairs": pairs,
        "er_scored": scored,
        "doc_repetition": qs["doc_repetition"](spark, "/root/testdata/sf0.001"),
        "dup_lines": qs["dup_lines"](spark, "/root/testdata/sf0.001"),
    }
    for name, d in sections.items():
        txt = capture(d)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
